"""Port of TestCrawlDbStates.java — the updatedb state-machine matrix.

Drives the vectorized merge kernel (coherencebot_ray.functions.updatedb)
through every {schedule} × {db status incl. absent} × {fetch status incl.
links-only} × {0..2 inlinks} combination and asserts the resulting db
status, exactly as TestCrawlDbStates.testCrawlDbStateTransitionMatrix
(reference: src/test/org/apache/nutch/crawl/TestCrawlDbStates.java:101-199).
"""

import hashlib

import numpy as np
import pandas as pd
import pytest

from coherencebot_ray.config import CrawlConfig
from coherencebot_ray.functions.updatedb import merge_partition
from coherencebot_ray.model import CrawlStatus as CS

CUR = 1_700_000_000_000  # deterministic "now" (ms)
URL = "http://www.example.com/"
DEFAULT_INTERVAL = 2_592_000


def datum(status, fetch_time=CUR, retries=0, interval=DEFAULT_INTERVAL, score=1.0,
          signature=None, modified=0, gen_time=0, fixed=0, meta=None, url=URL):
    return {
        "url": url,
        "host": "www.example.com",
        "part": 0,
        "status": status,
        "fetch_time": fetch_time,
        "retries": retries,
        "fetch_interval": interval,
        "score": score,
        "signature": signature,
        "modified_time": modified,
        "gen_time": gen_time,
        "repr_url": None,
        "fixed_interval": fixed,
        "metadata": meta,
    }


def run(rows, schedule="default", **cfg_kw):
    cfg = CrawlConfig(schedule=schedule, **cfg_kw)
    df = pd.DataFrame(rows)
    return merge_partition(df, cfg, CUR)


LINKED_DATUM = dict(status=CS.LINKED, interval=DEFAULT_INTERVAL, score=0.1)

# fetchDbStatusPairs (TestCrawlDbStates.java:69-79); None = absent
FETCH_DB_PAIRS = [
    (None, CS.DB_UNFETCHED),
    (CS.FETCH_SUCCESS, CS.DB_FETCHED),
    (CS.FETCH_GONE, CS.DB_GONE),
    (CS.FETCH_REDIR_TEMP, CS.DB_REDIR_TEMP),
    (CS.FETCH_REDIR_PERM, CS.DB_REDIR_PERM),
    (CS.FETCH_NOTMODIFIED, CS.DB_NOTMODIFIED),
    (CS.FETCH_RETRY, None),
    (None, CS.DB_DUPLICATE),
    (None, CS.DB_ORPHAN),
]
DB_STATUSES = [p[1] for p in FETCH_DB_PAIRS]  # includes None (not in db)
DB_FROM = [None] + [s for s in DB_STATUSES if s is not None]


@pytest.mark.parametrize("schedule", ["default", "adaptive"])
def test_state_transition_matrix(schedule):
    retry_max = 3
    for from_db in DB_FROM:
        for fetch_status, to_db in FETCH_DB_PAIRS:
            if fetch_status is None and to_db is not None and from_db != to_db:
                # the (None, DB_X) rows only enumerate db statuses; the
                # links-only case is driven by fetch_status=None below
                pass
            expected = to_db
            if fetch_status is None:
                expected = CS.DB_UNFETCHED if from_db is None else from_db
            elif fetch_status == CS.FETCH_RETRY:
                expected = CS.DB_UNFETCHED  # retries start at 0 < retryMax
            for n_links in (0, 1, 2):
                if fetch_status is None and n_links == 0:
                    continue  # nothing fetched needs >= 1 inlink
                rows = []
                if from_db is not None:
                    rows.append(datum(from_db))
                if fetch_status is not None:
                    rows.append(datum(fetch_status, retries=0))
                for _ in range(n_links):
                    rows.append(datum(**LINKED_DATUM))
                if not rows:
                    continue
                out = run(rows, schedule=schedule, retry_max=retry_max)
                assert len(out) == 1, (
                    f"{from_db}+{fetch_status}+{n_links} links -> {len(out)} rows"
                )
                got = out["status"].iloc[0]
                assert got == expected, (
                    f"schedule={schedule} db={CS.name(from_db) if from_db else '<absent>'} "
                    f"fetch={CS.name(fetch_status) if fetch_status else '<links only>'} "
                    f"links={n_links}: got {CS.name(got)} expected {CS.name(expected)}"
                )


def test_retry_counter_exhaustion():
    """retry accumulates; at retryMax the URL goes GONE with gone schedule."""
    out = run([datum(CS.DB_UNFETCHED, retries=2), datum(CS.FETCH_RETRY, retries=2)])
    assert out["status"].iloc[0] == CS.DB_GONE
    assert out["retries"].iloc[0] == 3
    out = run([datum(CS.DB_UNFETCHED, retries=1), datum(CS.FETCH_RETRY, retries=1)])
    assert out["status"].iloc[0] == CS.DB_UNFETCHED
    assert out["retries"].iloc[0] == 2
    # retry pushes next fetch 1 day out (AbstractFetchSchedule.java:146-151)
    assert out["fetch_time"].iloc[0] == CUR + 86_400_000


def test_signature_notmodified_detection():
    """TestCrawlDbStates notModified analogue: same signature => DB_NOTMODIFIED,
    different => DB_FETCHED (CrawlDbReducer.java:236-252)."""
    sig = hashlib.md5(b"page").digest()
    old = datum(CS.DB_FETCHED, signature=sig, modified=CUR - 1000)
    fetch = datum(CS.FETCH_SUCCESS)
    parse_sig = datum(CS.SIGNATURE, signature=sig)
    out = run([old, fetch, parse_sig])
    assert out["status"].iloc[0] == CS.DB_NOTMODIFIED
    # NUTCH-1341: modifiedTime reset to previous
    assert out["modified_time"].iloc[0] == CUR - 1000
    assert out["signature"].iloc[0] == sig

    sig2 = hashlib.md5(b"changed").digest()
    out = run([old, fetch, datum(CS.SIGNATURE, signature=sig2)])
    assert out["status"].iloc[0] == CS.DB_FETCHED
    assert out["signature"].iloc[0] == sig2


def test_adaptive_interval_shrinks_on_modified():
    sig = hashlib.md5(b"v1").digest()
    sig2 = hashlib.md5(b"v2").digest()
    old = datum(CS.DB_FETCHED, signature=sig, interval=1000, modified=CUR)
    fetch = datum(CS.FETCH_SUCCESS, interval=1000)
    out = run([old, fetch, datum(CS.SIGNATURE, signature=sig2)], schedule="adaptive")
    assert out["status"].iloc[0] == CS.DB_FETCHED
    assert out["fetch_interval"].iloc[0] == 800  # 1000 * (1 - 0.2)


def test_gone_schedule_applied():
    old = datum(CS.DB_UNFETCHED, interval=1000)
    out = run([old, datum(CS.FETCH_GONE, interval=1000)])
    assert out["status"].iloc[0] == CS.DB_GONE
    assert out["fetch_interval"].iloc[0] == 1500
    assert out["fetch_time"].iloc[0] == CUR + 1500 * 1000


def test_orphan_row_kept_unchanged():
    old = datum(CS.DB_FETCHED, gen_time=123, score=2.5)
    out = run([old])
    assert len(out) == 1
    assert out["status"].iloc[0] == CS.DB_FETCHED
    assert out["gen_time"].iloc[0] == 123  # orphan path keeps _ngt_
    assert out["score"].iloc[0] == pytest.approx(2.5)


def test_additions_not_allowed_drops_new():
    """db.update.additions.allowed=false (CrawlDbReducer.java:145-146)."""
    out = run([datum(**LINKED_DATUM)], additions_allowed=False)
    assert len(out) == 0
    # existing rows still processed
    out = run(
        [datum(CS.DB_UNFETCHED), datum(CS.FETCH_SUCCESS)], additions_allowed=False
    )
    assert out["status"].iloc[0] == CS.DB_FETCHED


def test_opic_score_accumulation():
    """OPICScoringFilter.updateDbScore: score = old.score + Σ link scores."""
    old = datum(CS.DB_FETCHED, score=1.0)
    fetch = datum(CS.FETCH_SUCCESS, score=1.0)
    links = [datum(CS.LINKED, score=0.25), datum(CS.LINKED, score=0.5)]
    out = run([old, fetch] + links)
    assert out["score"].iloc[0] == pytest.approx(1.75)
    # new page discovered only via links: initialScore 0 + contributions
    out = run(links)
    assert out["status"].iloc[0] == CS.DB_UNFETCHED
    assert out["score"].iloc[0] == pytest.approx(0.75)
    assert out["fetch_time"].iloc[0] == CUR  # initializeSchedule sets "now"


def test_inlink_cap_top_k():
    """db.update.max.inlinks: only top-k scores counted (CrawlDbReducer.java:328-341)."""
    links = [datum(CS.LINKED, score=s) for s in (0.5, 0.1, 0.4, 0.3, 0.2)]
    out = run([datum(CS.DB_FETCHED, score=0.0), datum(CS.FETCH_SUCCESS)] + links, max_inlinks=3)
    assert out["score"].iloc[0] == pytest.approx(0.5 + 0.4 + 0.3)


def test_latest_fetch_wins():
    f1 = datum(CS.FETCH_GONE, fetch_time=CUR - 10_000)
    f2 = datum(CS.FETCH_SUCCESS, fetch_time=CUR)
    out = run([datum(CS.DB_UNFETCHED), f1, f2])
    assert out["status"].iloc[0] == CS.DB_FETCHED


def test_force_refetch_on_excessive_interval():
    """interval > db.fetch.interval.max triggers forceRefetch (CrawlDbReducer.java:280-281)."""
    old = datum(CS.DB_FETCHED, interval=8_000_000)
    fetch = datum(CS.FETCH_SUCCESS, interval=8_000_000)
    out = run([old, fetch])
    assert out["status"].iloc[0] == CS.DB_UNFETCHED
    assert out["fetch_interval"].iloc[0] == round(7_776_000 * 0.9)
    assert out["signature"].iloc[0] is None


def test_gen_time_stripped():
    out = run([datum(CS.DB_UNFETCHED, gen_time=555), datum(CS.FETCH_SUCCESS, gen_time=555)])
    assert out["gen_time"].iloc[0] == 0


def test_multiple_urls_in_partition():
    rows = (
        [datum(CS.DB_UNFETCHED, url="http://a.com/1"), datum(CS.FETCH_SUCCESS, url="http://a.com/1")]
        + [datum(CS.DB_FETCHED, url="http://a.com/2")]
        + [datum(CS.LINKED, url="http://b.com/new", score=0.1)]
    )
    out = run(rows).set_index("url")
    assert out.loc["http://a.com/1", "status"] == CS.DB_FETCHED
    assert out.loc["http://a.com/2", "status"] == CS.DB_FETCHED
    assert out.loc["http://b.com/new", "status"] == CS.DB_UNFETCHED
    assert len(out) == 3


# ---------------------------------------------------------------------------
# TestCrawlDbStates.testCrawlDbStatTransitionInject port (:206-260):
# injecting over any existing db status keeps the existing status;
# injecting a new URL yields DB_UNFETCHED.
# ---------------------------------------------------------------------------


def test_inject_transition_matrix():
    from coherencebot_ray.functions.inject import inject_merge

    db_statuses = [s for s in DB_FROM if s is not None]
    for from_db in [None] + db_statuses:
        rows = []
        injected = datum(CS.INJECTED, score=0.1)
        if from_db is not None:
            rows.append(datum(from_db))
        rows.append(injected)
        out = inject_merge(pd.DataFrame(rows), CrawlConfig())
        assert len(out) == 1
        expected = CS.DB_UNFETCHED if from_db is None else from_db
        got = out["status"].iloc[0]
        assert got == expected, (
            f"inject over {CS.name(from_db) if from_db else '<absent>'}: "
            f"got {CS.name(got)} expected {CS.name(expected)}"
        )


def test_signature_reset_on_retry_and_gone():
    """TestCrawlDbStates signature handling: retry/gone keep the OLD
    signature (CrawlDbReducer.java:288,303)."""
    sig = hashlib.md5(b"old").digest()
    for fstatus in (CS.FETCH_RETRY, CS.FETCH_GONE):
        out = run([datum(CS.DB_FETCHED, signature=sig), datum(fstatus)])
        assert out["signature"].iloc[0] == sig, CS.name(fstatus)


def test_notmodified_continuous_refetches():
    """testCrawlDbReducerNotModified analogue: repeated refetches of an
    unchanged page stay DB_NOTMODIFIED and (adaptive) back off the
    interval; forceRefetch kicks in when interval exceeds the max."""
    sig = hashlib.md5(b"stable page").digest()
    row = datum(CS.DB_FETCHED, signature=sig, interval=1000, modified=CUR - 5000)
    cur = CUR
    interval = 1000
    for i in range(6):
        fetch = datum(CS.FETCH_SUCCESS, fetch_time=cur, interval=interval)
        out = run([row, fetch, datum(CS.SIGNATURE, signature=sig)], schedule="adaptive")
        status = out["status"].iloc[0]
        assert status == CS.DB_NOTMODIFIED
        new_interval = int(out["fetch_interval"].iloc[0])
        assert new_interval >= interval  # adaptive backoff grows
        interval = new_interval
        row = datum(
            CS.DB_NOTMODIFIED,
            signature=sig,
            interval=interval,
            fetch_time=int(out["fetch_time"].iloc[0]),
            modified=int(out["modified_time"].iloc[0]),
        )
        cur = int(out["fetch_time"].iloc[0])
    # eventually interval growth is capped by the schedule max
    assert interval <= 31_536_000


def test_adaptive_sync_delta_never_schedules_in_past():
    """NUTCH-1564 port (TODOTestCrawlDbStates.testAdaptiveFetchScheduleSyncDelta):
    with SYNC_DELTA on, a long-unmodified page's next fetch time must
    never land in the past (which would force a refetch every cycle).
    Continuous crawl, fetches every interval/3, 100 rounds."""
    sig = hashlib.md5(b"never changes").digest()
    day = 86_400
    row = datum(CS.DB_FETCHED, signature=sig, interval=2 * day, modified=CUR - 10_000)
    cur = CUR
    n_notmodified = 0
    # ContinuousCrawlTestUtil shape: the CRAWL cycle ticks every 8 hours
    # (SECONDS_PER_DAY / 3); the page is fetched only when due. 1000
    # cycles ≈ 333 days — with the adaptive backoff capped at 7 days
    # that yields ~45 not-modified refetches
    for i in range(1000):
        cur += (day // 3) * 1000
        if int(row["fetch_time"]) > cur:
            continue  # not due this cycle
        fetch = datum(
            CS.FETCH_SUCCESS,
            fetch_time=cur,
            interval=int(row["fetch_interval"]),
            retries=int(row["retries"]),
            modified=int(row["modified_time"]),
        )
        out = run(
            [row, fetch, datum(CS.SIGNATURE, signature=sig)],
            schedule="adaptive",
            adaptive_sync_delta=True,
            # reference test config: adaptive cap == system max == 7 days
            # (with the stock adaptive cap of 365 d, interval growth
            # crosses db.fetch.interval.max and forceRefetch oscillates —
            # faithful to the reference, but not what this test targets)
            adaptive_min_interval=float(day),
            adaptive_max_interval=float(7 * day),
            interval_max=7 * day,
        )
        st = int(out["status"].iloc[0])
        next_ft = int(out["fetch_time"].iloc[0])
        if st == CS.DB_NOTMODIFIED:
            n_notmodified += 1
            until_next_s = (next_ft - cur) / 1000.0
            assert until_next_s >= -1, (
                f"round {i}: next fetch scheduled in the past "
                f"({until_next_s}s; NUTCH-1564)"
            )
        row = datum(
            st,
            signature=sig,
            retries=int(out["retries"].iloc[0]),
            interval=int(out["fetch_interval"].iloc[0]),
            fetch_time=next_ft,
            modified=int(out["modified_time"].iloc[0]),
        )
    assert n_notmodified >= 10, "sync-delta branch must actually be exercised"


def test_fetch_retry_goes_gone_and_counter_resets():
    """NUTCH-578 port (TODOTestCrawlDbStates.testCrawlDbReducerPageRetrySchedule
    — a KNOWN GAP in the reference's own suite): a long continuous crawl
    of nothing but fetch_retry must (a) keep the retry counter bounded
    by db.fetch.retry.max (no overflow), (b) settle at db_gone once the
    max is exceeded, and (c) reset the counter so a later successful
    fetch starts clean."""
    retry_max = 3
    row = datum(CS.DB_UNFETCHED, interval=1000)
    cur = CUR
    max_seen_retries = 0
    statuses = []
    for i in range(150):
        fetch = datum(
            CS.FETCH_RETRY,
            fetch_time=cur,
            retries=int(row["retries"]),
            interval=int(row["fetch_interval"]),
        )
        out = run([row, fetch], retry_max=retry_max)
        st = int(out["status"].iloc[0])
        rt = int(out["retries"].iloc[0])
        statuses.append(st)
        max_seen_retries = max(max_seen_retries, rt)
        assert rt <= retry_max + 1, f"round {i}: retry counter overflow ({rt})"
        row = datum(
            st,
            retries=rt,
            interval=int(out["fetch_interval"].iloc[0]),
            fetch_time=int(out["fetch_time"].iloc[0]),
        )
        cur = int(out["fetch_time"].iloc[0]) + 1000
    # early rounds retry as db_unfetched, then the page goes gone
    assert CS.DB_UNFETCHED in statuses[:retry_max]
    assert statuses[-1] == CS.DB_GONE
    # (c) a successful fetch after the gone phase resets the counter
    fetch_ok = datum(CS.FETCH_SUCCESS, fetch_time=cur, retries=int(row["retries"]))
    out = run([row, fetch_ok], retry_max=retry_max)
    assert int(out["status"].iloc[0]) == CS.DB_FETCHED
    assert int(out["retries"].iloc[0]) == 0, "retry counter must reset on success"


def test_url_404_purging():
    """TestCrawlDbFilter.testUrl404Purging port: with db.update.purge.404
    a DB_GONE row is dropped from the updated CrawlDb while fetched and
    unfetched rows survive (CrawlDbFilter.java:76-125)."""
    from coherencebot_ray.stages.updatedb import apply_purges

    rows = [
        datum(CS.DB_GONE, url="http://www.example.com/"),
        datum(CS.DB_FETCHED, url="http://www.example1.com/"),
        datum(CS.DB_UNFETCHED, url="http://www.example2.com/"),
    ]
    merged = run(rows)
    assert len(merged) == 3
    out = apply_purges(merged, CrawlConfig(purge_404=True))
    assert len(out) == 2
    assert set(out["url"]) == {"http://www.example1.com/", "http://www.example2.com/"}
    # purge off: everything survives
    assert len(apply_purges(merged, CrawlConfig())) == 3
    # orphan purge is independent
    rows.append(datum(CS.DB_ORPHAN, url="http://www.example3.com/"))
    merged = run(rows)
    out = apply_purges(merged, CrawlConfig(purge_orphans=True))
    assert "http://www.example3.com/" not in set(out["url"])
    assert "http://www.example.com/" in set(out["url"])


def test_mime_adaptive_in_merge():
    """MimeAdaptive rates apply per fetch datum's content_type through
    the updatedb kernel (Content-Type rides the datum; unknown/missing
    mime uses the stock 0.4/0.2 adaptive defaults — nutch-default.xml
    sets db.fetch.schedule.adaptive.inc_rate=0.4, which
    MimeAdaptiveFetchSchedule.setConf inherits)."""
    sig = hashlib.md5(b"same").digest()
    rows = []
    for i, (u, ct) in enumerate(
        [("http://h.com/html", "text/html"), ("http://h.com/pdf", "application/pdf"),
         ("http://h.com/none", None)]
    ):
        rows.append(datum(CS.DB_FETCHED, url=u, interval=1000, signature=sig, fetch_time=CUR - 10_000))
        d = datum(CS.FETCH_SUCCESS, url=u, interval=1000, signature=sig, fetch_time=CUR)
        d["content_type"] = ct
        rows.append(d)
    out = run(
        rows,
        schedule="mime_adaptive",
        mime_rates=(("text/html", 0.5, 0.1), ("application/pdf", 0.1, 0.4)),
        adaptive_sync_delta=False,
    ).set_index("url")
    # same signature -> NOTMODIFIED -> interval * (1 + inc)
    assert out.loc["http://h.com/html", "fetch_interval"] == 1500
    assert out.loc["http://h.com/pdf", "fetch_interval"] == 1100
    assert out.loc["http://h.com/none", "fetch_interval"] == 1400


def test_crawldb_filter_purge_and_normalize():
    """TestCrawlDbFilter.testUrl404Purging port: 404/gone rows purged
    and urls re-normalized during the update; plus the orphan/withdrawn
    purges and the re-filter drop (CrawlDbFilter.java:52-125)."""
    from coherencebot_ray.stages.updatedb import apply_purges

    rows = pd.DataFrame([
        datum(CS.DB_GONE, url="http://www.example.com/"),
        datum(CS.DB_FETCHED, url="http://www.example1.com/"),
        datum(CS.DB_UNFETCHED, url="http://www.example2.com/"),
        datum(CS.DB_ORPHAN, url="http://www.example3.com/"),
        datum(CS.DB_WITHDRAWN, url="http://www.example4.com/"),
    ])
    cfg = CrawlConfig(purge_404=True, purge_orphans=True, purge_withdrawn=True,
                      update_url_normalize=True)
    out = apply_purges(rows, cfg)
    assert sorted(out["url"]) == ["http://www.example1.com/", "http://www.example2.com/"]

    # normalization applies (uppercase host folds; basic normalizer)
    rows2 = pd.DataFrame([datum(CS.DB_FETCHED, url="http://WWW.Example5.com/")])
    out2 = apply_purges(rows2, CrawlConfig(update_url_normalize=True))
    assert out2.iloc[0]["url"] == "http://www.example5.com/"

    # re-filter drops rejected urls
    cfg3 = CrawlConfig(update_url_filter=True,
                       filter_rules=(("-", r".*example6.*"),))
    rows3 = pd.DataFrame([
        datum(CS.DB_FETCHED, url="http://www.example6.com/"),
        datum(CS.DB_FETCHED, url="http://www.example7.com/"),
    ])
    out3 = apply_purges(rows3, cfg3)
    assert list(out3["url"]) == ["http://www.example7.com/"]


# ---------------------------------------------------------------------------
# Property-based invariants (hypothesis): ANY datum soup keeps the
# CrawlDbReducer contract — the matrix port above pins exact
# transitions; this pins that no input ordering/combination can
# produce an out-of-domain row.
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _DB_SET = (CS.DB_UNFETCHED, CS.DB_FETCHED, CS.DB_GONE, CS.DB_REDIR_TEMP,
               CS.DB_REDIR_PERM, CS.DB_NOTMODIFIED, CS.DB_DUPLICATE)
    _FETCH_SET = (CS.FETCH_SUCCESS, CS.FETCH_GONE, CS.FETCH_REDIR_TEMP,
                  CS.FETCH_REDIR_PERM, CS.FETCH_RETRY, CS.FETCH_NOTMODIFIED)

    _datum_st = st.builds(
        lambda kind, ft, retries, score: datum(
            kind, fetch_time=CUR - ft, retries=retries, score=score,
            signature=hashlib.md5(b"x").digest()
            if kind in (CS.FETCH_SUCCESS, CS.DB_FETCHED) else None),
        kind=st.sampled_from(_DB_SET + _FETCH_SET + (CS.LINKED, CS.SIGNATURE)),
        ft=st.integers(0, 90 * 86400 * 1000),
        retries=st.integers(0, 5),
        score=st.floats(0.0, 10.0, allow_nan=False, width=32),
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(_datum_st, min_size=1, max_size=8),
           st.sampled_from(["default", "adaptive"]))
    def test_updatedb_invariants_property(rows, schedule):
        """CrawlDbReducer domain invariants under arbitrary datum soups:
        (1) at most one output row per url, (2) output status is a DB
        status, (3) retries bounded by retry_max + 1, (4) fetch_interval
        positive and <= max-interval forceRefetch ceiling, (5) rows with
        neither an old datum nor a fetch/link signal produce nothing,
        (6) the merge is permutation-invariant."""
        out = run(rows, schedule=schedule)
        assert len(out) <= 1
        if len(out):
            r = out.iloc[0]
            assert CS.has_db_status(int(r["status"]))
            # retries grow by at most 1 per merge over any input datum
            # (the reference never clamps pre-existing counters either)
            assert 0 <= int(r["retries"]) <= max(d["retries"] for d in rows) + 1
            assert int(r["fetch_interval"]) > 0
        out2 = run(list(reversed(rows)), schedule=schedule)
        pd.testing.assert_frame_equal(
            out.reset_index(drop=True), out2.reset_index(drop=True))
except ImportError:  # pragma: no cover
    pass
