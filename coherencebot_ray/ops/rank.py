"""BM25 ranking over a documents table — the classic text-retrieval
scorer as a two-pass Ray Data pipeline.

Pass 1 projects each doc to integer stats (doc length in tokens, per
query-term tf) — a ~1% projection of the input that is materialized
once so the corpus text is read exactly once; corpus-level stats
(N, Σdl, per-term df) come from per-block partial sums folded on the
driver (one row per block, bounded). Pass 2 scores the projection
against the broadcast idf table and keeps a per-block partial top-k, so
the driver merges at most k × blocks rows.

Determinism across engines (the DuckDB oracle mirror): token = one
``[a-z0-9]+`` run of lower(text); dl/tf/df/N are exact integers, so
avgdl = Σdl/N is the same IEEE double everywhere; the score expression
is written with one fixed operation order on both sides and compared in
integer micro-units (floor(x*1e6 + 0.5)).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

TOKEN_RE = r"[a-z0-9]+"


def _doc_stats(df: pd.DataFrame, terms: list[str], text_col: str) -> pd.DataFrame:
    toks = df[text_col].fillna("").str.lower().str.findall(TOKEN_RE)
    out = {
        "doc_id": df["doc_id"].to_numpy(),
        "dl": toks.str.len().to_numpy(dtype=np.int64),
    }
    ex = toks.explode()
    idx = ex.index.to_numpy()
    vals = ex.to_numpy()
    n = len(df)
    pos = np.arange(n)
    remap = pd.Series(pos, index=df.index)
    row = remap.reindex(idx).to_numpy() if len(idx) else np.array([], dtype=np.int64)
    for j, t in enumerate(terms):
        tf = np.zeros(n, dtype=np.int64)
        if len(vals):
            hit = vals == t
            np.add.at(tf, row[hit].astype(np.int64), 1)
        out[f"tf{j}"] = tf
    return pd.DataFrame(out)


def bm25_topk(
    docs_ds,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
):
    """Top-k docs by BM25 (positive Lucene idf variant) for a bag of
    query terms. Returns a pandas DataFrame (doc_id, score_micro) —
    bounded at k rows, so a driver-side result is the contract.
    Ties sort by (score_micro desc, doc_id asc)."""
    terms = list(terms)
    proj = docs_ds.map_batches(
        lambda df: _doc_stats(df, terms, text_col), batch_format="pandas"
    ).materialize()  # ~1% of input: read the corpus text once, score from ints

    tf_cols = [f"tf{j}" for j in range(len(terms))]

    def partial_stats(df: pd.DataFrame) -> pd.DataFrame:
        row = {"n_docs": np.int64(len(df)), "dl_sum": df["dl"].to_numpy().sum()}
        for c in tf_cols:
            row[f"df_{c}"] = np.int64((df[c].to_numpy() > 0).sum())
        return pd.DataFrame([row])

    stats = proj.map_batches(partial_stats, batch_format="pandas").to_pandas().sum()
    n = int(stats["n_docs"])
    if n == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "score_micro": pd.Series(dtype="int64")})
    avgdl = float(stats["dl_sum"]) / float(n)  # exact ints -> same double
    idf = np.array(
        [
            math.log((n - float(stats[f"df_{c}"]) + 0.5) / (float(stats[f"df_{c}"]) + 0.5) + 1.0)
            for c in tf_cols
        ],
        dtype=np.float64,
    )

    def score_topk(df: pd.DataFrame) -> pd.DataFrame:
        dl = df["dl"].to_numpy(dtype=np.float64)
        norm = k1 * (1.0 - b + b * (dl / avgdl))
        s = np.zeros(len(df), dtype=np.float64)
        for j in range(len(terms)):  # fixed-order sum, mirrored in SQL
            tf = df[tf_cols[j]].to_numpy(dtype=np.float64)
            s = s + idf[j] * (tf * (k1 + 1.0)) / (tf + norm)
        micro = np.floor(s * 1e6 + 0.5).astype(np.int64)
        out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(), "score_micro": micro})
        return out.sort_values(
            ["score_micro", "doc_id"], ascending=[False, True]
        ).head(k)

    cand = proj.map_batches(score_topk, batch_format="pandas").to_pandas()
    return (
        cand.sort_values(["score_micro", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def tfidf_topk_terms(docs_ds, n_docs: int, k: int = 3,
                     text_col: str = "text", n_buckets: int = 32):
    """Per-document top-k keywords by smoothed TF-IDF
    (idf = ln((N+1)/(df+1)) + 1) — keyword extraction as a two-exchange
    pipeline that never re-reads the corpus:

      1. ONE scan projects each batch to (doc_id, term, tf) rows PLUS
         tagged per-batch df partials (doc_id = -1, tf = docs-in-batch
         containing the term; exact because a doc lives in one batch).
      2. Exchange on hash(term): fold df partials, inner-join tf rows
         to their term's global df — a tagged-union co-group, not a
         sort-merge join.
      3. Exchange on hash(doc_id): score and keep k rows per doc
         (score_micro desc, term asc — micro-unit floats, same fixed
         operation order as the DuckDB oracle).

    Exchange volume is bounded by the (doc,term) projection, never the
    text. ``n_docs`` is the corpus doc count (parquet metadata — don't
    scan for it). Returns a Dataset (doc_id, term, tf, df, score_micro).
    """
    from .agg import bucketed_group_apply

    def project(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        toks = df[text_col].fillna("").str.lower().str.findall(TOKEN_RE)
        ex = toks.explode().dropna()
        if not len(ex):
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                 "term": pd.Series(dtype=object),
                                 "tf": pd.Series(dtype=np.int64)})
        t = pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy()[ex.index.to_numpy()],
            "term": ex.to_numpy(),
        })
        tf = t.groupby(["doc_id", "term"], sort=False).size().reset_index(name="tf")
        dfp = tf.groupby("term", sort=False).size().reset_index(name="tf")
        dfp["doc_id"] = np.int64(-1)
        tf["tf"] = tf["tf"].astype(np.int64)
        dfp["tf"] = dfp["tf"].astype(np.int64)
        return pd.concat([tf, dfp[["doc_id", "term", "tf"]]], ignore_index=True)

    proj = docs_ds.map_batches(project, batch_format="pandas")

    def join_df(g: pd.DataFrame) -> pd.DataFrame:
        tag = g["doc_id"].to_numpy() == -1
        dfreq = g[tag].groupby("term", sort=False)["tf"].sum().rename("df")
        rows = g[~tag]
        return rows.merge(dfreq, left_on="term", right_index=True, how="inner")

    joined = bucketed_group_apply(proj, "term", join_df, n_buckets=n_buckets)

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        dfv = g["df"].to_numpy(dtype=np.float64)
        idf = np.log((n_docs + 1.0) / (dfv + 1.0)) + 1.0
        s = g["tf"].to_numpy(dtype=np.float64) * idf
        g = g.assign(score_micro=np.floor(s * 1e6 + 0.5).astype(np.int64))
        g = g.sort_values(["doc_id", "score_micro", "term"],
                          ascending=[True, False, True])
        top = g.groupby("doc_id", sort=False).head(k)
        top = top.copy()
        top["df"] = top["df"].astype(np.int64)
        return top[["doc_id", "term", "tf", "df", "score_micro"]]

    return bucketed_group_apply(joined, "doc_id", topk, n_buckets=n_buckets)


def hits_scores(edges_ds, n_buckets: int = 64):
    """Two-iteration UNNORMALIZED HITS (Kleinberg 1999) over (src, dst)
    edges — the hub/authority complement of stages/tools.linkrank's
    PageRank-style power iteration, and deliberately the other
    implementation strategy: linkrank holds node state in Pregel-style
    rank actors, HITS stays Dataset-native because dropping the
    normalization step makes every iterate an INTEGER (a1 = indeg,
    h1 = sum of a1 over out-edges, a2 = sum of h1 over in-edges), so
    each half-iteration is one bucketed co-group + one bucketed sum and
    the result is bit-exact against SQL with no float-order caveats
    (relative ranking equals normalized HITS at iteration 2 — the
    normalizer is a global positive constant per half-step).

    Multigraph semantics: duplicate (src, dst) rows each contribute
    (same as linkrank / LinkRank.java). Returns a Dataset
    (url, hub, auth) with one row per node; pure sources have auth 0,
    pure sinks hub 0. Exchange volume is bounded by edge rows; driver
    holds nothing.
    """
    from .agg import bucketed_group_apply, bucketed_sum

    def hub_parts(g: pd.DataFrame) -> pd.DataFrame:
        # all edges of a dst share this bucket -> indeg (= a1) is exact
        indeg = g.groupby("dst", sort=False)["dst"].transform("size")
        part = pd.DataFrame({"url": g["src"].to_numpy(),
                             "hub": indeg.to_numpy(np.int64)})
        return part.groupby("url", sort=False, as_index=False).sum()

    h1 = bucketed_sum(
        bucketed_group_apply(edges_ds, "dst", hub_parts, n_buckets=n_buckets),
        "url", ["hub"], n_buckets=n_buckets)

    # int8 union tags (the dedup.py / stages/jobs.py convention — a
    # 1-byte tag, not a per-row object string, through the exchange)
    _T_EDGE, _T_HUB = np.int8(0), np.int8(1)

    def tag_e(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"key": df["src"].to_numpy(dtype=object),
                             "dst": df["dst"].to_numpy(dtype=object),
                             "hub": np.zeros(len(df), dtype=np.int64),
                             "__t": np.full(len(df), _T_EDGE, dtype=np.int8)})

    def tag_h(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"key": df["url"].to_numpy(dtype=object),
                             "dst": pd.Series([""] * len(df), dtype=object),
                             "hub": df["hub"].to_numpy(np.int64),
                             "__t": np.full(len(df), _T_HUB, dtype=np.int8)})

    tagged = (edges_ds.map_batches(tag_e, batch_format="pandas")
              .union(h1.map_batches(tag_h, batch_format="pandas")))

    def auth_parts(g: pd.DataFrame) -> pd.DataFrame:
        tags = g["__t"].to_numpy()
        hmap = g.loc[tags == _T_HUB].groupby("key", sort=False)["hub"].sum()
        e = g[tags == _T_EDGE]
        if not len(e):
            return pd.DataFrame({"url": pd.Series(dtype="object"),
                                 "auth": pd.Series(dtype="int64")})
        part = pd.DataFrame({
            "url": e["dst"].to_numpy(dtype=object),
            "auth": e["key"].map(hmap).to_numpy(np.int64)})
        return part.groupby("url", sort=False, as_index=False).sum()

    a2 = bucketed_sum(
        bucketed_group_apply(tagged, "key", auth_parts, n_buckets=n_buckets),
        "url", ["auth"], n_buckets=n_buckets)

    hub_rows = h1.map_batches(
        lambda df: df.assign(auth=np.zeros(len(df), dtype=np.int64))[
            ["url", "hub", "auth"]],
        batch_format="pandas")
    auth_rows = a2.map_batches(
        lambda df: df.assign(hub=np.zeros(len(df), dtype=np.int64))[
            ["url", "hub", "auth"]],
        batch_format="pandas")
    return bucketed_sum(hub_rows.union(auth_rows), "url", ["hub", "auth"],
                        n_buckets=n_buckets)
