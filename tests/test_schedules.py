"""TestAdaptiveFetchSchedule.java:55-116 port + Default/Abstract schedule
behaviors (AbstractFetchSchedule.java:109-233)."""

import numpy as np

from coherencebot_ray.config import CrawlConfig
from coherencebot_ray.functions import schedules as sch

CFG = CrawlConfig()


def arr(*vals, dtype=np.int64):
    return np.array(vals, dtype=dtype)


def test_adaptive_interval_updates():
    """Port of TestAdaptiveFetchSchedule: UNKNOWN keeps interval, MODIFIED
    scales by (1-dec_rate), NOTMODIFIED by (1+inc_rate)."""
    s = sch.AdaptiveSchedule(
        inc_rate=0.4, dec_rate=0.2, min_interval=60.0, max_interval=31536000.0
    )
    interval = 100
    # UNKNOWN: unchanged (sync-delta no-op when modified<=0)
    r = s.set_fetch_schedule(arr(0), arr(interval), arr(0), arr(sch.STATUS_UNKNOWN))
    assert r.fetch_interval[0] == interval
    # MODIFIED: 100 * 0.8 = 80
    r = s.set_fetch_schedule(arr(0), arr(interval), arr(0), arr(sch.STATUS_MODIFIED))
    assert r.fetch_interval[0] == int(interval - interval * 0.2)
    # NOTMODIFIED: 100 * 1.4 = 140
    r = s.set_fetch_schedule(arr(0), arr(interval), arr(0), arr(sch.STATUS_NOTMODIFIED))
    assert r.fetch_interval[0] == int(interval + interval * 0.4)


def test_adaptive_min_max_clamp():
    s = sch.AdaptiveSchedule(min_interval=60.0, max_interval=1000.0)
    r = s.set_fetch_schedule(arr(0), arr(10), arr(0), arr(sch.STATUS_MODIFIED))
    assert r.fetch_interval[0] == 60
    r = s.set_fetch_schedule(arr(0), arr(5000), arr(0), arr(sch.STATUS_NOTMODIFIED))
    assert r.fetch_interval[0] == 1000


def test_adaptive_sync_delta():
    """SYNC_DELTA shifts ref time toward the modification time."""
    s = sch.AdaptiveSchedule(sync_delta=True, sync_delta_rate=0.3)
    fetch_time = 1_000_000_000  # ms
    modified = fetch_time - 500_000 * 1000  # modified 500k s ago > interval
    r = s.set_fetch_schedule(arr(fetch_time), arr(100_000), arr(modified), arr(sch.STATUS_UNKNOWN))
    # delta = 500000s > interval 100000 => interval := delta
    assert r.fetch_interval[0] == 500_000
    # refTime = fetchTime - round(delta*0.3*1000)
    expected_ft = (fetch_time - round(500_000 * 0.3 * 1000)) + 500_000 * 1000
    assert r.fetch_time[0] == expected_ft


def test_adaptive_fixed_interval_override():
    s = sch.AdaptiveSchedule()
    r = s.set_fetch_schedule(
        arr(0), arr(100), arr(0), arr(sch.STATUS_MODIFIED), fixed_interval=arr(777)
    )
    assert r.fetch_interval[0] == 777
    assert r.fetch_time[0] == 777 * 1000


def test_default_schedule():
    s = sch.DefaultSchedule(default_interval=2_592_000)
    r = s.set_fetch_schedule(arr(5_000), arr(0), arr(0), arr(sch.STATUS_UNKNOWN))
    assert r.fetch_interval[0] == 2_592_000
    assert r.fetch_time[0] == 5_000 + 2_592_000 * 1000
    assert r.modified_time[0] == 5_000  # first fetch: modified := fetchTime
    r2 = s.set_fetch_schedule(arr(5_000), arr(3600), arr(1_000), arr(sch.STATUS_UNKNOWN))
    assert r2.fetch_interval[0] == 3600
    assert r2.modified_time[0] == 1_000


def test_gone_schedule():
    """interval *1.5 capped at 0.9*max (AbstractFetchSchedule.java:109-119)."""
    ft, itv = sch.set_page_gone_schedule(arr(0), arr(1000), max_interval=7_776_000)
    assert itv[0] == 1500
    assert ft[0] == 1500 * 1000
    ft, itv = sch.set_page_gone_schedule(arr(0), arr(7_000_000), max_interval=7_776_000)
    assert itv[0] == round(7_776_000 * 0.9)


def test_retry_schedule():
    ft, retries = sch.set_page_retry_schedule(arr(0), np.array([1], dtype=np.uint8))
    assert ft[0] == 86_400_000
    assert retries[0] == 2


def test_should_fetch():
    cur = 1_000_000
    eligible, ft, itv = sch.should_fetch(arr(cur - 1, cur + 1), arr(3600, 3600), cur, 7_776_000)
    assert eligible.tolist() == [True, False]
    # far-future fetch times are clamped to now => eligible
    far = cur + 8_000_000 * 1000
    eligible, ft, itv = sch.should_fetch(arr(far), arr(9_000_000), cur, 7_776_000)
    assert eligible[0]
    assert ft[0] == cur
    assert itv[0] == round(7_776_000 * 0.9)


def test_calculate_last_fetch_time():
    out = sch.calculate_last_fetch_time(
        arr(0x01, 0x02), arr(10_000_000, 10_000_000), arr(3600, 3600), unfetched_code=0x01
    )
    assert out[0] == 0
    assert out[1] == 10_000_000 - 3600 * 1000


def test_factory():
    assert isinstance(sch.make_schedule("default", CFG), sch.DefaultSchedule)
    assert isinstance(sch.make_schedule("adaptive", CFG), sch.AdaptiveSchedule)


def test_mime_adaptive_schedule():
    """MimeAdaptiveFetchSchedule (MimeAdaptiveFetchSchedule.java:52-163):
    per-mime inc/dec rates override the defaults; unknown mimes and
    missing Content-Type fall back to the default rates — 0.4/0.2, the
    stock db.fetch.schedule.adaptive.inc_rate/dec_rate values
    (nutch-default.xml:506-519) that setConf (:87-88) reads."""
    import numpy as np

    from coherencebot_ray.functions import schedules as sch

    s = sch.MimeAdaptiveSchedule(
        mime_rates=(("text/html", 0.5, 0.1), ("application/pdf", 0.1, 0.4)),
    )
    ft = np.array([1_000_000] * 4, dtype=np.int64)
    itv = np.array([1000, 1000, 1000, 1000], dtype=np.int64)
    mod = np.zeros(4, dtype=np.int64)
    state = np.array([sch.STATUS_NOTMODIFIED] * 4, dtype=np.int64)
    mime = np.array(
        ["text/html; charset=utf-8", "application/pdf", "image/png", None], dtype=object
    )
    res = s.set_fetch_schedule(ft, itv, mod, state, mime=mime)
    # NOTMODIFIED -> interval * (1 + inc): html 1.5x, pdf 1.1x, default 1.4x
    assert list(res.fetch_interval) == [1500, 1100, 1400, 1400]

    state_m = np.array([sch.STATUS_MODIFIED] * 4, dtype=np.int64)
    res2 = s.set_fetch_schedule(ft, itv, mod, state_m, mime=mime)
    # MODIFIED -> interval * (1 - dec): html 0.9x, pdf 0.6x, default 0.8x
    assert list(res2.fetch_interval) == [900, 600, 800, 800]

    # factory wiring
    from coherencebot_ray.config import CrawlConfig

    cfg = CrawlConfig(schedule="mime_adaptive", mime_rates=(("text/html", 0.5, 0.1),))
    made = sch.make_schedule("mime_adaptive", cfg)
    assert made.wants_mime and made.rate_map["text/html"]
