"""Crawl configuration.

One flat dataclass mirroring the knobs the reference reads from
``conf/nutch-default.xml`` (values cited per field). Everything is plain
data so a config broadcast (``ray.put``) ships once per job, not per
batch.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace


@dataclass
class CrawlConfig:
    # --- partitioning ------------------------------------------------------
    num_partitions: int = 16  # hash(host) % P; P = fetch-actor parallelism
    partition_mode: str = "byHost"  # partition.url.mode (byHost|byDomain)
    partition_seed: int = 42  # Generator passes a per-run seed (Generator.java:1034)

    # --- inject (Injector.java:209-348, conf defaults) ---------------------
    score_injected: float = 1.0  # db.score.injected
    interval_default: int = 2_592_000  # db.fetch.interval.default (30 d)
    interval_max: int = 7_776_000  # db.fetch.interval.max (90 d)
    inject_overwrite: bool = False
    inject_update: bool = False

    # --- generate (Generator.java) ----------------------------------------
    topn: int = 50_000  # --size-fetchlist (src/bin/crawl:132)
    gen_count_mode: str = "host"  # generate.count.mode (host|domain)
    gen_max_count: int = -1  # generate.max.count (-1 = unlimited)
    gen_min_score: float = 0.0  # generate.min.score
    gen_delay_ms: int = 7 * 24 * 3600 * 1000  # crawl.gen.delay (7 d, Generator.java:238-244)
    gen_update_crawldb: bool = False  # generate.update.crawldb
    gen_max_interval: int = -1  # generate.max.fetch.interval override filter

    # --- fetch (Fetcher*, conf) -------------------------------------------
    server_delay_s: float = 5.0  # fetcher.server.delay
    min_crawl_delay_s: float = 0.0  # fetcher.server.min.delay
    max_crawl_delay_s: float = 30.0  # fetcher.max.crawl.delay (robots delay > this => skip)
    max_redirects: int = 0  # http.redirect.max (0 = record redirect, don't follow)
    retry_max: int = 3  # db.fetch.retry.max
    content_limit: int = 1_048_576  # http.content.limit
    max_exceptions_per_queue: int = -1  # fetcher.max.exceptions.per.queue
    timelimit_mins: float = -1.0  # fetcher.timelimit.mins
    store_content: bool = True
    real_sleep: bool = False  # tests only: actually sleep the politeness delay
    # NutchPublisher hook (fetcher.publisher / publisher/NutchPublisher.java):
    # when set, fetch tasks append START/REPORTING/END events as JSONL
    # under this dir (functions/publisher.JsonlPublisher)
    publisher_dir: str | None = None

    # --- parse / outlinks (ParseOutputFormat.java) -------------------------
    max_outlinks_per_page: int = 100  # db.max.outlinks.per.page
    ignore_internal_links: bool = False  # db.ignore.internal.links
    ignore_external_links: bool = False  # db.ignore.external.links
    score_internal_factor: float = 1.0  # db.score.link.internal
    score_external_factor: float = 1.0  # db.score.link.external
    interval_parse_md: bool = False

    # --- execution sizing --------------------------------------------------
    # cpus reserved per partition task (map_batches num_cpus): raise to 2
    # on hosts where logical cpus overcommit physical cores so heavy
    # pandas tasks don't thrash (concurrency = session_cpus / this)
    task_num_cpus: int = 1

    # persistent fused-round worker actors: robots cache + parser chain
    # survive across rounds (the reference's RobotRulesParser.CACHE is a
    # static per-JVM Hashtable alive for the whole crawl). False falls
    # back to per-round task-pool execution (fresh state every round).
    persistent_workers: bool = True

    # above this partition count the fetch+parse tasks stop scattering
    # crawl_parse files per TARGET partition (P^2 small files) and write
    # one file per SOURCE partition instead; a Ray Data groupby("part")
    # exchange then produces the per-target files (P total)
    scatter_direct_max_parts: int = 256

    # --- skew handling -----------------------------------------------------
    # a partition whose frontier exceeds this row count has its updatedb
    # merge split into hash(url) subshards (mega-host partitions would
    # otherwise be stragglers; politeness only constrains FETCH, and the
    # updatedb merge keys by url, so url-splitting is safe)
    skew_split_rows: int = 100_000

    # --- updatedb (CrawlDbReducer.java) ------------------------------------
    additions_allowed: bool = True  # db.update.additions.allowed
    max_inlinks: int = 10_000  # db.update.max.inlinks
    schedule: str = "default"  # db.fetch.schedule.class (default|adaptive)
    purge_404: bool = False  # db.update.purge.404
    purge_orphans: bool = False
    purge_withdrawn: bool = False  # db.update.purge.withdrawn (coherencebot)
    # CrawlDbFilter.java:28-30 — re-normalize / re-filter urls during
    # the crawldb update (scope crawldb); renamed urls merge by min
    # status precedence at the next round's groupby
    update_url_normalize: bool = False  # crawldb.url.normalizers
    update_url_filter: bool = False  # crawldb.url.filters
    # extra RegexNormalizer rules applied ONLY in the crawldb scope —
    # the per-scope rule-file analogue (regex-normalize.xml.crawldb,
    # URLNormalizers.java:152-310): ((pattern, sub), ...). Host-renaming
    # rules are supported: updatedb recomputes host/part and routes
    # moved rows to their new partition (stray pass)
    crawldb_regex_rules: tuple = ()

    # --- adaptive schedule (AdaptiveFetchSchedule.java:82-146) -------------
    adaptive_inc_rate: float = 0.4  # db.fetch.schedule.adaptive.inc_rate
    adaptive_dec_rate: float = 0.2  # db.fetch.schedule.adaptive.dec_rate
    adaptive_min_interval: float = 60.0
    adaptive_max_interval: float = 31_536_000.0  # 365 d
    adaptive_sync_delta: bool = True
    adaptive_sync_delta_rate: float = 0.3

    # --- mime-adaptive schedule (MimeAdaptiveFetchSchedule.java:52-163) ----
    mime_rates: tuple = ()  # (mime, inc_rate, dec_rate) rows; db.fetch.schedule.mime.file
    mime_default_inc_rate: float = 0.4  # db.fetch.schedule.adaptive.inc_rate (:87; stock value nutch-default.xml:506)
    mime_default_dec_rate: float = 0.2  # db.fetch.schedule.adaptive.dec_rate (:88)

    # --- signatures (SignatureFactory, TextProfileSignature.java) ----------
    signature_impl: str = "md5"  # md5 | text_md5 | text_profile
    tp_min_token_len: int = 2  # db.signature.text_profile.min_token_len
    tp_quant_rate: float = 0.01  # db.signature.text_profile.quant_rate

    # --- dedup (DeduplicationJob.java:278) ---------------------------------
    dedup_compare_order: tuple = ("httpsOverHttp", "score", "fetchTime", "urlLength")
    dedup_group_mode: str = "none"  # none|host|domain

    # --- linkdb ------------------------------------------------------------
    linkdb_max_inlinks: int = 10_000  # linkdb.max.inlinks
    linkdb_ignore_internal: bool = True  # linkdb.ignore.internal.links (LinkDb default)
    linkdb_ignore_external: bool = False

    # --- indexing filter chain (indexer/IndexingFilter.java) ---------------
    indexing_filters: tuple = ()  # e.g. ("basic","anchor","more","metadata",
    # "static","criteria"); empty = raw join output (index-* plugins)
    # IndexingJob -addBinaryContent + indexer.binary.base64
    # (IndexerMapReduce.java:86,412-425): thread the segment's raw
    # content through the join into a 'binaryContent' field, added
    # AFTER the indexing-filter chain (filters never see it). The
    # non-base64 mode decodes utf-8/replace (the reference uses the
    # JVM platform charset, utf-8 on any modern deployment).
    indexer_add_binary_content: bool = False
    indexer_binary_base64: bool = False
    # indexer.skip.notmodified (IndexerMapReduce.java:332-336): leave
    # DB_NOTMODIFIED pages out of the index entirely
    indexer_skip_notmodified: bool = False
    # indexer.delete.robots.noindex (NUTCH-1434, :277-289): purge pages
    # whose robots metatag contains 'noindex'. Reads the frontier's
    # merged metadata (metatag.robots, stamped by parse when
    # metatags_names captures it) — the reference reads the segment's
    # ParseData directly; same signal, one updatedb later.
    indexer_delete_robots_noindex: bool = False
    # indexer.url.normalizers / indexer.url.filters (:84-85,183-195):
    # map-side indexer-scope renormalize + refilter of every join key
    indexer_url_normalize: bool = False
    indexer_url_filter: bool = False

    # --- scoring filter chain (scoring/ScoringFilter.java:42-246) ----------
    scoring_filters: tuple = ("opic",)  # ordered plugin names; "withdrawn"
    # reads extra["live_seeds"] ({seed_url: {metadata}}) when registered
    # scoring-orphan (OrphanScoringFilter.java:42-60): seconds without
    # inlinks before a page is marked gone / orphaned
    orphan_mark_gone_after: int = 30 * 24 * 3600  # scoring.orphan.mark.gone.after
    orphan_mark_orphan_after: int = 40 * 24 * 3600  # scoring.orphan.mark.orphan.after
    # scoring-metadata (MetadataScoringFilter.java:46-48): metadata keys
    # propagated datum->content->parse->outlinks
    scoring_db_md: tuple = ()       # scoring.db.md
    scoring_content_md: tuple = ()  # scoring.content.md
    scoring_parse_md: tuple = ()    # scoring.parse.md
    # parsefilter-outlinks (OutlinkParseFilter.java:64-225)
    db_descendant_links: bool = False  # db.descendant.links
    db_approve_anchors: bool = False   # db.approve.anchors
    anchor_reject_rules: tuple = ()    # urlfilter.anchor.file lines
    # language-identifier markup detection (HTMLLanguageParser.java:
    # 92-260): html lang attr > dc.language > http-equiv
    # content-language -> parse meta 'language' (the statistical
    # identify path is ops/text.langid)
    lang_html_detect: bool = False
    # microformats-reltag (RelTagParser.java:59-136): collect rel="tag"
    # anchor targets' last path segment into parse meta 'Rel-Tag'
    microformats_reltag: bool = False
    # parsefilter-naivebayes: training lines ('<0|1>\ttext') and the
    # second-chance wordlist ride extra['nb_train_lines'] /
    # extra['nb_wordlist'] (the reference reads trainfile/wordlist files)

    # parsefilter-archive (ArchiveParseFilter.java:165-180): archive
    # fetched PDFs to an object store; the client rides
    # extra['archive_store_factory'] (S3 SDK absent in env)
    archive_s3_bucket: str = ""            # parsefilter.archive.s3bucket
    archive_s3_prefix: str = "file/coherencebot-archive/"  # .s3prefix

    # mimetype-filter (MimeTypeIndexingFilter.java:160-185): rule lines
    # from mimetype.filter.file — '+'/'-' switch accept/block mode,
    # other lines are MIME prefixes
    mimetype_filter_rules: tuple = ()

    # --- hostdb DNS check (hostdb/ResolverThread.java + UpdateHostDbReducer
    # shouldCheck/isEligibleForCheck :361-400) --------------------------------
    hostdb_check_new: bool = False      # hostdb.check.new
    hostdb_check_known: bool = False    # hostdb.check.known
    hostdb_check_failed: bool = False   # hostdb.check.failed
    hostdb_force_check: bool = False    # hostdb.force.check
    hostdb_recheck_interval_s: int = 86400  # hostdb.recheck.interval
    # purge a failed host once dns_failures EXCEEDS this (-1 = never)
    hostdb_purge_failed_threshold: int = -1  # hostdb.purge.failed.hosts.threshold
    hostdb_resolver_threads: int = 4    # actor-pool size for the check stage

    # urlmeta (URLMetaScoringFilter.java:44-120): one tag list riding
    # seed datum -> content -> parse -> every outlink's LINKED datum
    urlmeta_tags: tuple = ()        # urlmeta.tags
    # scoring-depth (DepthScoringFilter.java:62-65): default max hops
    # from a seed; 0 = plugin default (1000)
    scoring_depth_max: int = 0      # scoring.depth.max
    # scoring-link (LinkAnalysisScoringFilter.java:52-60): indexer-score
    # normalization factor applied to the LinkRank-written db score
    link_normalize_score: float = 1.0  # link.analyze.normalize.score
    # scoring-similarity (cosine/Model.retrieveNgrams): (mingram,
    # maxgram) shingles; gold-standard text rides
    # extra['cosine_goldstandard_text'] (cosine.goldstandard.file)
    scoring_similarity_ngrams: tuple = (1, 1)

    # --- parse filter plugins ----------------------------------------------
    # parse-metatags (MetaTagsParser.java:46-52): meta tag names to copy
    # into parse metadata as metatag.<name>; ("*",) = all, () = disabled
    # (the reference defaults to "*"; off here keeps the parse hot path
    # metadata-free unless asked for — enable with ("*",))
    metatags_names: tuple = ()
    # parsefilter-regex (RegexParseFilter.java:42-66): ((field,
    # "html"|"text", regex), ...); field set "true"/"false" in parse
    # metadata by regex find over raw html / extracted text
    parsefilter_regex_rules: tuple = ()
    # parser.skip.truncated (ParseSegment.java:67,113,176-209; reference
    # default true): don't parse pages whose content was cut short —
    # either by http.content.limit or a declared Content-Length larger
    # than the received bytes (fetch marks them with metadata _tr_)
    parser_skip_truncated: bool = True
    # creativecommons CCParseFilter: detect CC license anchors/RDF and
    # record License-Url/License-Location/Work-Type parse metadata
    # (one extra HTML pass per doc when enabled)
    cc_license: bool = False
    # parse-js JSParseFilter: extract string-literal outlinks from
    # embedded <script> bodies (pure .js documents always parse)
    parse_js: bool = False
    # parse-ext ExtParser: ((content_type, command, timeout_s), ...) —
    # content piped through the command, stdout = parse text
    ext_parsers: tuple = ()
    # ParserFactory routing (conf/parse-plugins.xml.template +
    # parse/ParserFactory.java): ((mimeType, (parser ids...)), ...) —
    # exact mime match wins, '*' is the fallback entry, ids are tried
    # IN ORDER until one parses (a failing parser falls through to the
    # next, like ParseUtil's parser iteration). Reference plugin ids
    # map onto the built-ins: parse-html/parse-tika -> html,
    # parse-zip -> zip, parse-js -> js, feed -> feed, parse-ext -> ext,
    # plus this engine's pdf and media parsers. Empty = the built-in
    # heuristic table (the template's effective routing).
    parse_plugins: tuple = ()
    # DOMContentUtils non-anchor outlink tags to SKIP
    # (parser.html.outlinks.ignore_tags). DELIBERATE DIVERGENCE from the
    # reference: nutch-default.xml:1669 ships an EMPTY list (img/script/
    # link/form ARE outlinks out of the box) and merely *recommends*
    # "img,script,link"; this engine adopts that recommended set (+form)
    # as its default. Set to () for strict reference-default behavior.
    # area/frame/iframe/source are outlinks either way.
    html_ignore_outlink_tags: tuple = ("img", "script", "link", "form")

    # --- url filter / normalizer chains ------------------------------------
    normalizers: tuple = ("basic", "regex")
    filters: tuple = ("regex",)
    filter_rules: tuple = ()  # extra (sign, regex) rules
    extra: dict = field(default_factory=dict)

    def with_(self, **kw) -> "CrawlConfig":
        return replace(self, **kw)


DEFAULT_CONFIG = CrawlConfig()
