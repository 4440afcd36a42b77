"""Core data model: crawl-state codes and Arrow schemas.

Re-expresses the reference's record types (see SURVEY.md §1) on Arrow:

- ``CrawlStatus``   ~ CrawlDatum status byte space
  (reference: src/java/org/apache/nutch/crawl/CrawlDatum.java:62-107)
- ``FRONTIER_SCHEMA`` ~ CrawlDb row (CrawlDatum.java:141-148)
- ``DOCS_SCHEMA``     ~ parse output as interleaved text+media spans
  (BASELINE.json input_hint; ParseData/ParseText analogue)
- ``OUTLINKS_SCHEMA`` ~ Outlink records (parse/Outlink.java:30-34)
- ``CRAWL_PARSE_SCHEMA`` ~ the segment crawl_parse stream
  (parse/ParseOutputFormat.java:236-366)

All state lives in columnar tables; the hot CrawlDatum.metaData keys are
promoted to typed columns (gen_time, repr_url, fixed_interval) and the
residual map is a JSON string column (Arrow map<> round-trips poorly
through pandas, and the residual map is cold).
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Status byte space (CrawlDatum.java:62-107). Same numeric values as the
# reference so status-transition equality is directly comparable.
# ---------------------------------------------------------------------------


class CrawlStatus:
    # DB statuses (stored in the frontier)
    DB_UNFETCHED = 0x01
    DB_FETCHED = 0x02
    DB_GONE = 0x03
    DB_REDIR_TEMP = 0x04
    DB_REDIR_PERM = 0x05
    DB_NOTMODIFIED = 0x06
    DB_DUPLICATE = 0x07
    DB_ORPHAN = 0x08
    DB_WITHDRAWN = 0x09  # coherencebot addition (CrawlDatum.java:79)

    # Fetch statuses (transient, produced by the fetcher)
    FETCH_SUCCESS = 0x21
    FETCH_GONE = 0x22
    FETCH_REDIR_TEMP = 0x23
    FETCH_REDIR_PERM = 0x24
    FETCH_RETRY = 0x25
    FETCH_NOTMODIFIED = 0x26

    # Transient statuses used in the crawl_parse stream
    SIGNATURE = 0x41
    INJECTED = 0x42
    LINKED = 0x43
    PARSE_META = 0x44

    _DB = {
        DB_UNFETCHED,
        DB_FETCHED,
        DB_GONE,
        DB_REDIR_TEMP,
        DB_REDIR_PERM,
        DB_NOTMODIFIED,
        DB_DUPLICATE,
        DB_ORPHAN,
        DB_WITHDRAWN,
    }
    _FETCH = {
        FETCH_SUCCESS,
        FETCH_GONE,
        FETCH_REDIR_TEMP,
        FETCH_REDIR_PERM,
        FETCH_RETRY,
        FETCH_NOTMODIFIED,
    }

    NAMES = {
        DB_UNFETCHED: "db_unfetched",
        DB_FETCHED: "db_fetched",
        DB_GONE: "db_gone",
        DB_REDIR_TEMP: "db_redir_temp",
        DB_REDIR_PERM: "db_redir_perm",
        DB_NOTMODIFIED: "db_notmodified",
        DB_DUPLICATE: "db_duplicate",
        DB_ORPHAN: "db_orphan",
        DB_WITHDRAWN: "db_withdrawn",
        FETCH_SUCCESS: "fetch_success",
        FETCH_GONE: "fetch_gone",
        FETCH_REDIR_TEMP: "fetch_redir_temp",
        FETCH_REDIR_PERM: "fetch_redir_perm",
        FETCH_RETRY: "fetch_retry",
        FETCH_NOTMODIFIED: "fetch_notmodified",
        SIGNATURE: "signature",
        INJECTED: "injected",
        LINKED: "linked",
        PARSE_META: "parse_meta",
    }

    @classmethod
    def has_db_status(cls, s: int) -> bool:
        return s in cls._DB

    @classmethod
    def has_fetch_status(cls, s: int) -> bool:
        return s in cls._FETCH

    @classmethod
    def name(cls, s: int) -> str:
        return cls.NAMES.get(s, f"unknown({s})")


# Mapping fetch status -> db status used when a fetch outcome directly
# implies a db state (CrawlDbReducer.java:196-312 state machine).
FETCH_TO_DB = {
    CrawlStatus.FETCH_SUCCESS: CrawlStatus.DB_FETCHED,
    CrawlStatus.FETCH_GONE: CrawlStatus.DB_GONE,
    CrawlStatus.FETCH_REDIR_TEMP: CrawlStatus.DB_REDIR_TEMP,
    CrawlStatus.FETCH_REDIR_PERM: CrawlStatus.DB_REDIR_PERM,
    CrawlStatus.FETCH_NOTMODIFIED: CrawlStatus.DB_NOTMODIFIED,
}


# ---------------------------------------------------------------------------
# Arrow schemas
# ---------------------------------------------------------------------------

# The frontier (CrawlDb analogue). `part` is the hash(host) % P partition id,
# persisted so generate/fetch/updatedb all reuse ONE partitioning and the
# politeness invariant (a host never spans partitions) holds end-to-end.
FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("domain", pa.string()),
        ("part", pa.int32()),
        ("status", pa.uint8()),
        ("fetch_time", pa.int64()),  # epoch ms, next/last scheduled fetch
        ("retries", pa.uint8()),
        ("fetch_interval", pa.int32()),  # seconds
        ("score", pa.float32()),
        ("signature", pa.binary()),
        ("modified_time", pa.int64()),
        ("gen_time", pa.int64()),  # _ngt_ metadata hot key (0 = never)
        ("repr_url", pa.string()),
        ("fixed_interval", pa.int32()),  # 0 = none
        ("metadata", pa.string()),  # residual JSON map
        # _pst_ hot key promoted to a typed column (SURVEY §1.3): the
        # fetcher stamps protocol status on every fetch datum
        # (FetcherThread.java:650 WRITABLE_PROTO_STATUS_KEY) and stats
        # tools read it per row — a typed column avoids scanning the
        # JSON metadata string at 10^10 rows. None = never fetched.
        ("pst", pa.string()),
    ]
)

SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

# Interleaved text+media docs (input_hint shape).
DOCS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_TYPE)),
    ]
)

OUTLINKS_SCHEMA = pa.schema(
    [
        ("src", pa.string()),
        ("dst", pa.string()),
        ("anchor", pa.string()),
    ]
)

# crawl_parse stream rows (ParseOutputFormat.java:236-366): per parsed page a
# SIGNATURE datum, a PARSE_META datum, and one LINKED datum per kept outlink
# carrying the OPIC score contribution.
CRAWL_PARSE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("part", pa.int32()),
        ("status", pa.uint8()),
        ("score", pa.float32()),  # LINKED: score contribution
        ("signature", pa.binary()),  # SIGNATURE rows
        ("fetch_interval", pa.int32()),
        ("metadata", pa.string()),
    ]
)

# Fetch output datums (segment crawl_fetch analogue).
FETCH_OUT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("part", pa.int32()),
        ("status", pa.uint8()),
        ("fetch_time", pa.int64()),
        ("retries", pa.uint8()),
        ("fetch_interval", pa.int32()),
        ("score", pa.float32()),
        ("signature", pa.binary()),
        ("modified_time", pa.int64()),
        ("gen_time", pa.int64()),
        ("repr_url", pa.string()),
        ("fixed_interval", pa.int32()),
        ("metadata", pa.string()),
        ("content", pa.binary()),
        ("content_type", pa.string()),
        ("fetch_order", pa.int64()),  # global deterministic crawl-order index
    ]
)

def table_from_pandas(df, schema: pa.Schema) -> pa.Table:
    """pandas -> Arrow with an EXACT schema (all-None object columns
    otherwise infer as null type and break parquet schema merge; pandas
    NaN sentinels in string/binary columns become Arrow nulls)."""
    import math

    cols = {}
    for field in schema:
        name = field.name
        if name in df.columns:
            vals = df[name].tolist()
            if field.type in (pa.string(), pa.binary()):
                vals = [None if (isinstance(v, float) and math.isnan(v)) else v for v in vals]
            cols[name] = pa.array(vals, type=field.type)
        else:
            cols[name] = pa.nulls(len(df), type=field.type)
    return pa.table(cols, schema=schema)


def frontier_table_from_pandas(df) -> pa.Table:
    return table_from_pandas(df, FRONTIER_SCHEMA)


HOSTDB_SCHEMA = pa.schema(
    [
        ("host", pa.string()),
        ("unfetched", pa.int64()),
        ("fetched", pa.int64()),
        ("not_modified", pa.int64()),
        ("redir_temp", pa.int64()),
        ("redir_perm", pa.int64()),
        ("gone", pa.int64()),
        ("duplicate", pa.int64()),
        ("n_urls", pa.int64()),
        ("score", pa.float64()),
    ]
)
