"""Document-corpus deduplication: exact, MinHash+LSH, SimHash, n-gram
Jaccard — the training-data dedup family (SURVEY.md build mandate;
public algorithms: Broder 1997 shingling/minhash, Charikar 2002 simhash,
Leskovec et al. MMDS ch.3 LSH banding).

Scale shape (100 TB): everything is map_batches (per-doc sketches) +
ONE groupby on the bucket key; candidate verification joins doc shingles
back by id-bucket instead of broadcasting the corpus. At test scale the
verify side is collected because candidate sets are tiny.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

_MERSENNE = (1 << 61) - 1


def _token_shingles(text: str, k: int = 3) -> set:
    from .text import ascii_tokens

    toks = ascii_tokens(text)
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    sh = _token_shingles(text, k)
    if not sh:
        return np.zeros(0, dtype=np.uint64)
    return np.array(
        [int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big") for s in sh],
        dtype=np.uint64,
    )


class MinHasher:
    """n_perm universal-hash minhash signatures (built once per actor)."""

    def __init__(self, n_perm: int = 64, seed: int = 42, shingle_k: int = 3):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.uint64)
        self.n_perm = n_perm
        self.k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        h = _shingle_hashes(text, self.k)
        if len(h) == 0:
            return np.full(self.n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (a*h + b) mod p, rowwise min — vectorized (n_perm × n_shingles)
        v = (self.a[:, None] * (h[None, :] % _MERSENNE) + self.b[:, None]) % _MERSENNE
        return v.min(axis=1).astype(np.uint64)

    def band_rows(self, df: pd.DataFrame, n_bands: int = 8, text_col: str = "text", with_text: bool = False) -> pd.DataFrame:
        """doc rows -> (band_id, band_hash, doc_id[, text]) LSH rows.

        ``with_text`` ships the document text with every band row so the
        Jaccard verify can run INSIDE the band bucket (n_bands x text
        volume through one exchange instead of a second corpus-wide
        id-join exchange — faster until documents are very large)."""
        rows_per_band = self.n_perm // n_bands
        out_doc, out_band, out_hash, out_text = [], [], [], []
        for doc_id, text in zip(df["doc_id"], df[text_col]):
            text = text if isinstance(text, str) else ""
            sig = self.signature(text)
            for b in range(n_bands):
                band = sig[b * rows_per_band : (b + 1) * rows_per_band]
                out_doc.append(doc_id)
                out_band.append(b)
                out_hash.append(hashlib.md5(band.tobytes()).hexdigest()[:16])
                if with_text:
                    out_text.append(text)
        cols = {"doc_id": out_doc, "band_id": out_band, "band_hash": out_hash}
        if with_text:
            cols["text"] = out_text
        return pd.DataFrame(cols)


def candidate_pairs_from_band_group(g: pd.DataFrame, max_bucket: int = 200) -> pd.DataFrame:
    """All pairs within one (band_id, band_hash) bucket, capped to defuse
    degenerate buckets (cap logged by caller — no silent truncation)."""
    ids = sorted(set(g["doc_id"]))[:max_bucket]
    if len(ids) < 2:
        return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pd.DataFrame({"a": a, "b": b})


def candidate_pairs_whole_bucket(
    b: pd.DataFrame,
    max_bucket: int = 200,
    band_col: str = "band_id",
    hash_col: str = "band_hash",
) -> tuple[np.ndarray, np.ndarray]:
    """Distinct within-(band_id, band_hash) doc_id pairs for an ENTIRE
    bucket frame at once, as two int64 arrays (a < b).

    Replaces the per-group ``groupby -> candidate_pairs_from_band_group``
    loop in the verify stage: profiling at sf0.1 showed ~90% of the
    verify UDF's CPU was pandas DataFrame construction for ~40k mostly
    singleton groups (38k calls, 39s of a 43s bucket pass), not pair
    work. Here group boundaries come from one lexsort; the only Python
    loop is over groups with >=2 members (candidate-bearing groups, a
    tiny fraction). Semantics identical: per-group all-pairs capped at
    ``max_bucket`` ids, then distinct (a, b) across the bucket's bands.
    """
    if len(b) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    bi = b[band_col].to_numpy()
    bh = b[hash_col].to_numpy()
    did = b["doc_id"].to_numpy(dtype=np.int64)
    order = np.lexsort((did, bh, bi))
    bi, bh, did = bi[order], bh[order], did[order]
    new = np.empty(len(bi), dtype=bool)
    new[0] = True
    new[1:] = (bi[1:] != bi[:-1]) | (bh[1:] != bh[:-1])
    starts = np.flatnonzero(new)
    ends = np.r_[starts[1:], len(bi)]
    sizes = ends - starts
    a_out, b_out = [], []
    for s, e in zip(starts[sizes >= 2], ends[sizes >= 2]):
        ids = did[s:e]
        ids = ids[np.r_[True, ids[1:] != ids[:-1]]]  # defensive in-group dedup
        m = len(ids)
        if m < 2:
            continue
        if m > max_bucket:
            ids = ids[:max_bucket]
            m = max_bucket
        iu, ju = np.triu_indices(m, k=1)
        a_out.append(ids[iu])
        b_out.append(ids[ju])
    if not a_out:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    pairs = np.unique(
        np.stack([np.concatenate(a_out), np.concatenate(b_out)], axis=1), axis=0
    )
    return pairs[:, 0], pairs[:, 1]


def _jaccard_sets(sa: set, sb: set) -> float:
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    return _jaccard_sets(_token_shingles(text_a, k), _token_shingles(text_b, k))


def simhash64(text: str) -> np.uint64:
    """Charikar simhash over whitespace tokens with count weights."""
    from .text import ascii_tokens

    toks = ascii_tokens(text)
    if not toks:
        return np.uint64(0)
    counts: dict[str, int] = {}
    for t in toks:
        counts[t] = counts.get(t, 0) + 1
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for t, w in counts.items():
        h = np.uint64(int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big"))
        bits = (h >> shifts) & np.uint64(1)
        acc += np.where(bits == 1, w, -w)
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return out


def simhash_bands(h: np.uint64, n_bands: int = 4) -> list[int]:
    """Split 64-bit simhash into n_bands exact-match blocking keys; two
    hashes within hamming distance (n_bands-1) share >=1 band."""
    width = 64 // n_bands
    mask = (1 << width) - 1
    return [(int(h) >> (i * width)) & mask for i in range(n_bands)]


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# ---------------------------------------------------------------------------
# Ray pipelines
# ---------------------------------------------------------------------------


def _exact_dedup_losers(docs_ds, text_col: str, normalize: bool,
                        keep: str):
    """Shared exact-dedup machinery: md5 signature map -> one sig-hash
    exchange -> vectorized winner fold. ``keep`` picks the winner
    policy: 'first' = min doc_id (the reference's DeduplicationJob
    order), 'best' = longest ORIGINAL text, tie min doc_id (production
    keep-best). Returns (doc_id, dup_of) loser rows."""

    def sig(df: pd.DataFrame) -> pd.DataFrame:
        texts = df[text_col].fillna("")
        out = {"doc_id": df["doc_id"].to_numpy()}
        if keep == "best":
            out["n"] = texts.str.len().to_numpy(np.int64)
        if normalize:
            texts = texts.str.lower().str.replace(r"\s+", " ", regex=True)
        out["sig"] = texts.map(
            lambda s: hashlib.md5(s.encode()).hexdigest())
        return pd.DataFrame(out)

    sort_cols = (["sig", "n", "doc_id"] if keep == "best"
                 else ["sig", "doc_id"])
    ascending = [True, False, True] if keep == "best" else [True, True]

    def winners_bucket(b: pd.DataFrame) -> pd.DataFrame:
        # vectorized: sort so each sig group's WINNER is its first row;
        # every later row is a duplicate of that group-start doc_id
        b = b.sort_values(sort_cols, ascending=ascending, kind="stable")
        sig_v = b["sig"].to_numpy()
        ids = b["doc_id"].to_numpy()
        first = np.r_[True, sig_v[1:] != sig_v[:-1]]
        group_start = np.maximum.accumulate(np.where(first, np.arange(len(ids)), 0))
        dup = ~first
        return pd.DataFrame({"doc_id": ids[dup], "dup_of": ids[group_start[dup]]})

    from .agg import bucketed_group_apply

    sigs = docs_ds.map_batches(sig, batch_format="pandas")
    return bucketed_group_apply(sigs, "sig", winners_bucket)


def exact_dedup(docs_ds, text_col: str = "text", normalize: bool = False):
    """Exact dedup by md5(text): returns (doc_id, dup_of) loser rows
    with the KEEP-FIRST (min doc_id) winner policy.

    ``normalize=True`` collapses case and whitespace runs first
    (md5(lower + single-space)), catching reformatted copies — the
    standard first pass of a training-data dedup stack."""
    return _exact_dedup_losers(docs_ds, text_col, normalize, keep="first")


def exact_dedup_keep_best(docs_ds, text_col: str = "text",
                          normalize: bool = True):
    """Exact dedup, KEEP-BEST winner policy: within a (normalized)
    signature group the surviving copy is the one with the LONGEST
    original text (quality proxy — production dedup stacks keep the
    best-formatted duplicate, not the first-seen), tie-break min
    doc_id. Returns (doc_id, dup_of) loser rows."""
    return _exact_dedup_losers(docs_ds, text_col, normalize, keep="best")



def minhash_lsh_pairs(
    docs_ds,
    threshold: float = 0.8,
    n_perm: int = 64,
    n_bands: int = 8,
    text_col: str = "text",
    with_text: bool = True,
):
    """MinHash+LSH near-dup pairs verified by true Jaccard >= threshold.

    Returns Dataset of (a, b, jaccard). Fully distributed — the verify
    never collects candidates or scans the corpus on the driver. Two
    verify layouts, same results:

    ``with_text=True`` (default — small/medium documents):
      1. map_batches: doc -> (band_id, band_hash, doc_id, text) LSH rows
         (text rides the band row: n_bands x text volume through ONE
         exchange, so the Jaccard verify runs inside the band bucket)
      2. bucketed groupby on the band key -> candidate pairs verified
         in place against the bucket's texts
      3. small bucketed dedup on (a, b) (a pair can collide in several
         bands)

    ``with_text=False`` (large documents): band rows carry only ids, so
    the band exchange moves ~40 bytes/row regardless of document size;
    candidate pairs are verified by hash-joining each half back to the
    docs table (two more bucketed exchanges, each moving the corpus text
    ONCE plus pair-cardinality rows). Exchange-volume accounting:
    text layout ships n_bands*T text bytes through one exchange; this
    layout ships ~2*T (one per join side) through two — a 4x reduction
    at n_bands=8, growing with n_bands. Measured single-node walls are
    within host noise of each other at 0.5-18 KB mean doc size (three
    extra local sorts offset the volume saved; BASELINE.md round-3
    note), so the flag matters when exchanges cross a real network or
    when n_bands*corpus_text_bytes exceeds cluster exchange capacity —
    flip it at multi-node scale for corpora above a few KB/doc.
    """
    hasher = MinHasher(n_perm=n_perm)

    def _empty_pairs() -> pd.DataFrame:
        return pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
             "jaccard": pd.Series(dtype="float64")}
        )

    from .agg import bucketed_group_apply

    if with_text:
        def bands(df: pd.DataFrame) -> pd.DataFrame:
            return hasher.band_rows(df, n_bands=n_bands, text_col=text_col, with_text=True)

        def pairs_bucket(b: pd.DataFrame) -> pd.DataFrame:
            # whole-bucket vectorized candidate generation + shingle each
            # doc once per bucket: the per-group pandas loop this replaces
            # spent ~90% of the verify stage's CPU building mini-frames
            # (profile in candidate_pairs_whole_bucket docstring)
            cand_a, cand_b = candidate_pairs_whole_bucket(b)
            if not len(cand_a):
                return _empty_pairs()
            texts = dict(zip(b["doc_id"], b["text"]))
            sh_cache: dict = {}

            def sh(doc_id):
                s = sh_cache.get(doc_id)
                if s is None:
                    t = texts.get(doc_id, "")
                    s = _token_shingles(t if isinstance(t, str) else "")
                    sh_cache[doc_id] = s
                return s

            out = {"a": [], "b": [], "jaccard": []}
            for pa, pb in zip(cand_a, cand_b):
                j = _jaccard_sets(sh(pa), sh(pb))
                if j >= threshold:
                    out["a"].append(int(pa))
                    out["b"].append(int(pb))
                    out["jaccard"].append(j)
            if not out["a"]:
                return _empty_pairs()
            return pd.DataFrame(
                {"a": pd.Series(out["a"], dtype="int64"),
                 "b": pd.Series(out["b"], dtype="int64"),
                 "jaccard": pd.Series(out["jaccard"], dtype="float64")}
            )

        band_ds = docs_ds.map_batches(bands, batch_format="pandas")
        verified = bucketed_group_apply(band_ds, ["band_id", "band_hash"], pairs_bucket)
        return bucketed_group_apply(
            verified, ["a", "b"], lambda g: g.drop_duplicates(subset=["a", "b"])
        )

    # ---- id-join layout: band rows carry no text -------------------------
    def bands_ids(df: pd.DataFrame) -> pd.DataFrame:
        return hasher.band_rows(df, n_bands=n_bands, text_col=text_col, with_text=False)

    def cand_bucket(b: pd.DataFrame) -> pd.DataFrame:
        cand_a, cand_b = candidate_pairs_whole_bucket(b)
        return pd.DataFrame(
            {"a": pd.Series(cand_a, dtype="int64"), "b": pd.Series(cand_b, dtype="int64")}
        )

    band_ds = docs_ds.map_batches(bands_ids, batch_format="pandas")
    cands = bucketed_group_apply(band_ds, ["band_id", "band_hash"], cand_bucket)
    # distinct (a, b) happens inside verify's first bucket (free: all
    # copies of a pair share `a`) — no separate dedup exchange
    return verify_pairs_idjoin(docs_ds, cands, threshold, text_col)


def verify_pairs_idjoin(docs_ds, cands, threshold: float, text_col: str = "text",
                        metric=None, metric_col: str = "jaccard"):
    """Exact set-similarity verify of candidate (a, b) pairs by
    hash-joining each half back to the docs table (the large-document
    layout shared by minhash_lsh_pairs, ngram_jaccard_pairs and
    containment_pairs): two bucketed exchanges, each moving the corpus
    text ONCE plus pair-cardinality rows. Candidate (a, b) dedup is
    performed INSIDE the first bucket (all copies of a pair share
    ``a``), so callers pass raw possibly-duplicated candidates and pay
    no dedup exchange. ``metric(set_a, set_b) -> float`` defaults to
    Jaccard; ``metric_col`` names the output column (asymmetric
    metrics like containment keep (a, b) order)."""
    if metric is None:
        metric = _jaccard_sets

    def _empty_pairs() -> pd.DataFrame:
        return pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
             metric_col: pd.Series(dtype="float64")}
        )

    from .agg import bucketed_group_apply

    # Tagged-union hash join, one side at a time. Union schemas are
    # aligned and typed on EVERY path (the round-2 simhash lesson:
    # mismatched union schemas let Ray promote columns via nulls).
    def doc_side(stage: int):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            n = len(df)
            out = pd.DataFrame(
                {"key": df["doc_id"].to_numpy(dtype=np.int64) if n else np.array([], dtype=np.int64),
                 "__t": np.zeros(n, dtype=np.int8),
                 "other": np.zeros(n, dtype=np.int64),
                 "txt": df[text_col].astype(object).to_numpy() if n else np.array([], dtype=object)}
            )
            if stage == 2:
                out["txt_a"] = np.array([None] * n, dtype=object)
            return out
        return f

    def pair_side_a(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        return pd.DataFrame(
            {"key": df["a"].to_numpy(dtype=np.int64) if n else np.array([], dtype=np.int64),
             "__t": np.ones(n, dtype=np.int8),
             "other": df["b"].to_numpy(dtype=np.int64) if n else np.array([], dtype=np.int64),
             "txt": np.array([None] * n, dtype=object)}
        )

    def join_a_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g[g["__t"] == 0]
        p = g[g["__t"] == 1]
        if len(p) == 0:
            return pd.DataFrame(
                {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
                 "txt_a": pd.Series(dtype="object")}
            )
        # candidate (a, b) dedup folds in HERE for free: every copy of a
        # pair shares its `a`, so this bucket holds them all — callers
        # must NOT spend a separate exchange on drop_duplicates
        p = p.drop_duplicates(subset=["key", "other"])
        texts = dict(zip(d["key"], d["txt"]))
        return pd.DataFrame(
            {"a": p["key"].to_numpy(dtype=np.int64),
             "b": p["other"].to_numpy(dtype=np.int64),
             "txt_a": np.array([texts.get(k) for k in p["key"]], dtype=object)}
        )

    def pair_side_b(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        return pd.DataFrame(
            {"key": df["b"].to_numpy(dtype=np.int64) if n else np.array([], dtype=np.int64),
             "__t": np.ones(n, dtype=np.int8),
             "other": df["a"].to_numpy(dtype=np.int64) if n else np.array([], dtype=np.int64),
             "txt": np.array([None] * n, dtype=object),
             "txt_a": df["txt_a"].astype(object).to_numpy() if n else np.array([], dtype=object)}
        )

    def join_b_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g[g["__t"] == 0]
        p = g[g["__t"] == 1]
        if len(p) == 0:
            return _empty_pairs()
        texts = dict(zip(d["key"], d["txt"]))
        out = {"a": [], "b": [], metric_col: []}
        sh_cache: dict = {}

        def sh(doc_id, txt):
            s = sh_cache.get(doc_id)
            if s is None:
                s = _token_shingles(txt if isinstance(txt, str) else "")
                sh_cache[doc_id] = s
            return s

        for pa, pb, ta in zip(p["other"], p["key"], p["txt_a"]):
            j = metric(sh(pa, ta), sh(pb, texts.get(pb)))
            if j >= threshold:
                out["a"].append(int(pa))
                out["b"].append(int(pb))
                out[metric_col].append(j)
        if not out["a"]:
            return _empty_pairs()
        return pd.DataFrame(
            {"a": pd.Series(out["a"], dtype="int64"),
             "b": pd.Series(out["b"], dtype="int64"),
             metric_col: pd.Series(out[metric_col], dtype="float64")}
        )

    docs_kv = docs_ds.map_batches(doc_side(1), batch_format="pandas")
    with_a = bucketed_group_apply(
        docs_kv.union(cands.map_batches(pair_side_a, batch_format="pandas")),
        "key", join_a_bucket,
    )
    docs_kv2 = docs_ds.map_batches(doc_side(2), batch_format="pandas")
    return bucketed_group_apply(
        docs_kv2.union(with_a.map_batches(pair_side_b, batch_format="pandas")),
        "key", join_b_bucket,
    )


def ngram_jaccard_pairs(
    docs_ds,
    threshold: float = 0.8,
    text_col: str = "text",
    with_text: bool = True,
    max_bucket: int = 0,
):
    """EXACT n-gram Jaccard similarity self-join via AllPairs prefix
    filtering (Bayardo, Ma & Srikant, WWW 2007; Chaudhuri et al. SSJoin).

    Unlike ``minhash_lsh_pairs`` there is no LSH recall loss: every pair
    of documents whose 3-token-shingle Jaccard >= ``threshold`` is
    returned. Candidate generation uses the prefix-filtering principle —
    under ANY fixed total order of the shingle universe (here: ascending
    64-bit shingle hash), two sets A, B with J(A,B) >= t must share an
    element inside their (|S| - ceil(t*|S|) + 1)-prefixes — so only
    ~(1-t) of each document's shingles are emitted as index keys, and
    ONE groupby on the shingle hash yields a complete candidate set.
    A pairwise size filter (min_sz >= t*max_sz, a necessary condition
    for J >= t) prunes inside the bucket before the exact verify.

    Scale shape (100 TB): map_batches (per-doc sorted shingle prefixes)
    + one bucketed exchange on the 8-byte hash key + exact verify.
    ``with_text=True`` ships the text on each prefix row so the verify
    runs inside the bucket (prefix_len x text volume through one
    exchange — fine for small/medium docs); ``with_text=False`` ships
    ids only and verifies through ``verify_pairs_idjoin`` (~2x corpus
    text through two exchanges — the multi-node/large-doc path, same
    rule as minhash_lsh_pairs). ``max_bucket=0`` means uncapped
    (exactness); at real corpus scale set a cap or a document-frequency
    stoplist for degenerate hot shingles — drops are the caller's to
    log, never silent.

    64-bit hash collisions could in principle merge two distinct
    shingles during candidate generation (verify is on true string
    shingles, so no false positives); at 2^-64 per pair this is
    ignored, as in minhash banding.
    """
    import math

    def _empty_pairs() -> pd.DataFrame:
        return pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
             "jaccard": pd.Series(dtype="float64")}
        )

    from .agg import bucketed_group_apply

    cap = max_bucket if max_bucket > 0 else (1 << 31)

    def prefix_rows(df: pd.DataFrame) -> pd.DataFrame:
        out_h, out_doc, out_sz, out_txt = [], [], [], []
        for doc_id, text in zip(df["doc_id"], df[text_col]):
            text = text if isinstance(text, str) else ""
            h = np.unique(_shingle_hashes(text))  # sorted distinct
            sz = int(h.size)
            if sz == 0:
                continue
            # epsilon guards the float ceil: t*sz that is exactly an
            # integer must NOT round up a ulp (p too small = missed
            # pairs); erring toward a longer prefix only adds candidates
            plen = sz - int(math.ceil(threshold * sz - 1e-9)) + 1
            out_h.append(h[:plen])
            out_doc.append(np.full(plen, int(doc_id), dtype=np.int64))
            out_sz.append(np.full(plen, sz, dtype=np.int64))
            if with_text:
                out_txt.extend([text] * plen)
        if not out_h:
            cols = {"h": pd.Series(dtype="int64"),
                    "doc_id": pd.Series(dtype="int64"),
                    "sz": pd.Series(dtype="int64")}
            if with_text:
                cols["text"] = pd.Series(dtype="object")
            return pd.DataFrame(cols)
        cols = {"h": np.concatenate(out_h).view(np.int64),
                "doc_id": np.concatenate(out_doc),
                "sz": np.concatenate(out_sz)}
        if with_text:
            cols["text"] = np.array(out_txt, dtype=object)
        return pd.DataFrame(cols)

    def _candidates(b: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
        cand_a, cand_b = candidate_pairs_whole_bucket(
            b, max_bucket=cap, band_col="h", hash_col="h"
        )
        if not len(cand_a):
            return cand_a, cand_b
        szmap = pd.Series(b["sz"].to_numpy(), index=b["doc_id"].to_numpy())
        szmap = szmap[~szmap.index.duplicated()]
        sa = szmap.loc[cand_a].to_numpy(dtype=np.float64)
        sb = szmap.loc[cand_b].to_numpy(dtype=np.float64)
        keep = np.minimum(sa, sb) >= threshold * np.maximum(sa, sb) - 1e-9
        return cand_a[keep], cand_b[keep]

    pre_ds = docs_ds.map_batches(prefix_rows, batch_format="pandas")

    if not with_text:
        def cand_bucket(b: pd.DataFrame) -> pd.DataFrame:
            cand_a, cand_b = _candidates(b)
            return pd.DataFrame(
                {"a": pd.Series(cand_a, dtype="int64"),
                 "b": pd.Series(cand_b, dtype="int64")}
            )

        cands = bucketed_group_apply(pre_ds, "h", cand_bucket)
        # pair dedup folds into verify's a-side bucket (no exchange)
        return verify_pairs_idjoin(docs_ds, cands, threshold, text_col)

    def pairs_bucket(b: pd.DataFrame) -> pd.DataFrame:
        cand_a, cand_b = _candidates(b)
        if not len(cand_a):
            return _empty_pairs()
        texts = dict(zip(b["doc_id"], b["text"]))
        sh_cache: dict = {}

        def sh(doc_id):
            s = sh_cache.get(doc_id)
            if s is None:
                t = texts.get(doc_id, "")
                s = _token_shingles(t if isinstance(t, str) else "")
                sh_cache[doc_id] = s
            return s

        out = {"a": [], "b": [], "jaccard": []}
        for pa, pb in zip(cand_a, cand_b):
            j = _jaccard_sets(sh(pa), sh(pb))
            if j >= threshold:
                out["a"].append(int(pa))
                out["b"].append(int(pb))
                out["jaccard"].append(j)
        if not out["a"]:
            return _empty_pairs()
        return pd.DataFrame(
            {"a": pd.Series(out["a"], dtype="int64"),
             "b": pd.Series(out["b"], dtype="int64"),
             "jaccard": pd.Series(out["jaccard"], dtype="float64")}
        )

    verified = bucketed_group_apply(pre_ds, "h", pairs_bucket)
    return bucketed_group_apply(
        verified, ["a", "b"], lambda g: g.drop_duplicates(subset=["a", "b"])
    )


def containment_pairs(docs_ds, threshold: float = 0.8,
                      text_col: str = "text", n_buckets: int = 64):
    """EXACT n-gram containment join: DIRECTED pairs (a, b), a != b,
    with C(a,b) = |S(a) ∩ S(b)| / |S(a)| >= ``threshold`` (S = distinct
    3-token shingles) — documents mostly CONTAINED in another one
    (boilerplate inclusion, quote pages, near-supersets), the asymmetric
    complement of :func:`ngram_jaccard_pairs`. Note C >= J always, so
    every Jaccard hit appears here in both directions plus the
    asymmetric extras Jaccard misses.

    Asymmetric prefix filter (SSJoin adapted to containment): if
    C(a,b) >= t then a shares >= ceil(t*|a|) shingles with b, so a's
    (|a| - ceil(t*|a|) + 1)-prefix under the ascending shingle-hash
    order must intersect b's FULL set (all shared shingles cannot fit
    in the shorter suffix). One bucketed exchange on the shingle hash
    carries a's prefix rows plus b's full rows — ids and sizes only
    (O(tokens), the dup_spans shape; text never rides). Candidates =
    (prefix-role x full-role) per hash, size-filtered
    (min(|a|,|b|) >= t*|a|), then verified exactly through the id-join
    layout (:func:`verify_pairs_idjoin` with the containment metric).

    Scale note: a degenerate hot shingle (present in a large corpus
    fraction) makes its hash group quadratic — at real corpus scale put
    a document-frequency stoplist in front (same caveat as the Jaccard
    join's ``max_bucket``); drops are the caller's to log.
    """
    import math

    from .agg import bucketed_group_apply

    def rows(df: pd.DataFrame) -> pd.DataFrame:
        out_h, out_doc, out_sz, out_role = [], [], [], []
        for doc_id, text in zip(df["doc_id"], df[text_col]):
            text = text if isinstance(text, str) else ""
            h = np.unique(_shingle_hashes(text))
            sz = int(h.size)
            if sz == 0:
                continue
            plen = sz - int(math.ceil(threshold * sz - 1e-9)) + 1
            out_h.append(h[:plen])
            out_doc.append(np.full(plen, int(doc_id), dtype=np.int64))
            out_sz.append(np.full(plen, sz, dtype=np.int64))
            out_role.append(np.zeros(plen, dtype=np.int8))  # contained
            out_h.append(h)
            out_doc.append(np.full(sz, int(doc_id), dtype=np.int64))
            out_sz.append(np.full(sz, sz, dtype=np.int64))
            out_role.append(np.ones(sz, dtype=np.int8))  # container
        if not out_h:
            return pd.DataFrame({"h": pd.Series(dtype="int64"),
                                 "doc_id": pd.Series(dtype="int64"),
                                 "sz": pd.Series(dtype="int64"),
                                 "role": pd.Series(dtype="int8")})
        return pd.DataFrame({"h": np.concatenate(out_h).view(np.int64),
                             "doc_id": np.concatenate(out_doc),
                             "sz": np.concatenate(out_sz),
                             "role": np.concatenate(out_role)})

    def cand_bucket(b: pd.DataFrame) -> pd.DataFrame:
        """Fully vectorized (prefix-role x full-role) expansion per hash
        group — no Python loop over groups (a bucket holds 10^5+ mostly
        barren shingle-hash groups; loop overhead dominated the wall)."""
        empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                              "b": pd.Series(dtype="int64")})
        if len(b) == 0:
            return empty
        h = b["h"].to_numpy()
        role = b["role"].to_numpy()
        did = b["doc_id"].to_numpy(dtype=np.int64)
        sz = b["sz"].to_numpy(dtype=np.int64)
        order = np.lexsort((did, role, h))
        h, role, did, sz = h[order], role[order], did[order], sz[order]
        new = np.empty(len(h), dtype=bool)
        new[0] = True
        new[1:] = h[1:] != h[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.r_[starts, len(h)])
        # per-group role split: rows are (role asc) within a group, so
        # group i has na_i = count of role-0 rows, first B row at
        # starts_i + na_i
        cnt0 = np.add.reduceat((role == 0).astype(np.int64), starts)
        na, nb = cnt0, sizes - cnt0
        live = (na > 0) & (nb > 0)
        if not live.any():
            return empty
        gs = starts[live]
        gna = na[live]
        gnb = nb[live]
        # A-row positions of live groups: concatenated aranges
        a_tot = int(gna.sum())
        a_pos = (np.arange(a_tot)
                 - np.repeat(np.cumsum(gna) - gna, gna)
                 + np.repeat(gs, gna))
        # each A row expands to its group's full B slice
        nb_per_a = np.repeat(gnb, gna)
        b_base = np.repeat(gs + gna, gna)  # B slice start per A row
        tot = int(nb_per_a.sum())
        if tot == 0:
            return empty
        within = (np.arange(tot)
                  - np.repeat(np.cumsum(nb_per_a) - nb_per_a, nb_per_a))
        b_pos = np.repeat(b_base, nb_per_a) + within
        a_pos_x = np.repeat(a_pos, nb_per_a)
        A, As = did[a_pos_x], sz[a_pos_x]
        B, Bs = did[b_pos], sz[b_pos]
        m = (A != B) & (np.minimum(As, Bs) >= threshold * As - 1e-9)
        if not m.any():
            return empty
        # bucket-local dedup before the exchange (a doc pair can share
        # many shingles in one bucket)
        packed = np.unique(np.stack([A[m], B[m]], axis=1), axis=0)
        return pd.DataFrame({"a": packed[:, 0], "b": packed[:, 1]})

    pre_ds = docs_ds.map_batches(rows, batch_format="pandas")
    cands = bucketed_group_apply(pre_ds, "h", cand_bucket,
                                 n_buckets=n_buckets)
    # pair dedup folds into verify's a-side bucket (no exchange)

    def containment(sa: set, sb: set) -> float:
        return len(sa & sb) / len(sa) if sa else 0.0

    return verify_pairs_idjoin(docs_ds, cands, threshold, text_col,
                               metric=containment, metric_col="containment")


def simhash_pairs(docs_ds, max_hamming: int = 3, text_col: str = "text"):
    """SimHash near-dup pairs via 4-band blocking + hamming verify."""

    N_BANDS = 4
    WIDTH = 64 // N_BANDS

    def hashes(df: pd.DataFrame) -> pd.DataFrame:
        # Typed throughout: `h` must stay uint64 on EVERY path — an
        # untyped empty frame here once promoted the column to float64
        # under Ray schema unification, silently destroying low-order
        # hash bits at high parallelism (round-2 correctness failure).
        n = len(df)
        if n == 0:
            return pd.DataFrame(
                {"doc_id": pd.Series(dtype="int64"), "h": pd.Series(dtype="uint64"),
                 "band_id": pd.Series(dtype="int64"), "key": pd.Series(dtype="int64")}
            )
        hs = np.fromiter(
            (simhash64(t if isinstance(t, str) else "") for t in df[text_col]),
            dtype=np.uint64, count=n,
        )
        doc_ids = df["doc_id"].to_numpy(dtype=np.int64)
        band = np.tile(np.arange(N_BANDS, dtype=np.int64), n)
        h_rep = np.repeat(hs, N_BANDS)
        keys = (
            (h_rep >> (band.astype(np.uint64) * np.uint64(WIDTH)))
            & np.uint64((1 << WIDTH) - 1)
        ).astype(np.int64)
        return pd.DataFrame(
            {"doc_id": np.repeat(doc_ids, N_BANDS), "h": h_rep,
             "band_id": band, "key": keys}
        )

    def _empty_pairs() -> pd.DataFrame:
        return pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
             "hamming": pd.Series(dtype="int64")}
        )

    def pairs_bucket(bk: pd.DataFrame) -> pd.DataFrame:
        # whole-bucket vectorized: candidates via one lexsort (same
        # machinery as minhash), hamming via XOR + unpackbits popcount
        # over all candidate pairs at once — no per-group pandas objects
        # no group cap: the 4-band pigeonhole argument needs EVERY pair
        # in a colliding band checked for hamming <= 3 to stay lossless
        cand_a, cand_b = candidate_pairs_whole_bucket(
            bk, max_bucket=1 << 31, hash_col="key"
        )
        if not len(cand_a):
            return _empty_pairs()
        d = bk.drop_duplicates("doc_id")
        ids = d["doc_id"].to_numpy(np.int64)
        hs = d["h"].to_numpy(np.uint64)
        order = np.argsort(ids)
        ids, hs = ids[order], hs[order]
        ha = hs[np.searchsorted(ids, cand_a)]
        hb = hs[np.searchsorted(ids, cand_b)]
        x = (ha ^ hb).copy()
        dist = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1).astype(np.int64)
        m = dist <= max_hamming
        if not m.any():
            return _empty_pairs()
        return pd.DataFrame(
            {"a": pd.Series(cand_a[m], dtype="int64"),
             "b": pd.Series(cand_b[m], dtype="int64"),
             "hamming": pd.Series(dist[m], dtype="int64")}
        )

    from .agg import bucketed_group_apply

    hash_ds = docs_ds.map_batches(hashes, batch_format="pandas")
    out = bucketed_group_apply(hash_ds, ["band_id", "key"], pairs_bucket)
    # same pair can match in several bands -> distinct (a, b), bucketed
    # (pair-cardinality, never collected on the driver)
    return bucketed_group_apply(
        out, ["a", "b"], lambda g: g.drop_duplicates(subset=["a", "b"])
    )


# ---------------------------------------------------------------------------
# Dedup clustering: near-dup pairs -> connected components -> canonical rep
# ---------------------------------------------------------------------------


def _cc_single_task(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized min-label union over one in-memory symmetric edge
    frame: numpy min-propagation with pointer jumping (O(E) per pass,
    O(log n) passes). Runs inside a WORKER task (not the driver) when
    the dup graph fits one task's memory."""
    u = df["u"].to_numpy(np.int64)
    v = df["v"].to_numpy(np.int64)
    if len(u) == 0:
        return pd.DataFrame({"id": np.array([], dtype=np.int64),
                             "rep": np.array([], dtype=np.int64)})
    ids, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    iu, iv = inv[: len(u)], inv[len(u):]
    lab = np.arange(len(ids), dtype=np.int64)
    while True:
        prev = lab
        m = np.minimum(lab[iu], lab[iv])
        lab = lab.copy()
        np.minimum.at(lab, iu, m)
        np.minimum.at(lab, iv, m)
        nxt = lab[lab]  # pointer jumping: compress chains to roots
        while not np.array_equal(nxt, lab):
            lab = nxt
            nxt = lab[lab]
        if np.array_equal(lab, prev):
            break
    # ids is sorted asc, so the min label index maps to the min id
    return pd.DataFrame({"id": ids, "rep": ids[lab]})


def connected_components(pairs_ds, a_col: str = "a", b_col: str = "b",
                         max_iters: int = 30, n_buckets: int = 64,
                         small_graph_edges: int = 4_000_000):
    """Distributed min-label connected components over a pair Dataset:
    the dedup-clustering step that turns pairwise near-dup hits
    (minhash / simhash / embedding) into KEEP-ONE groups. Returns a
    Dataset (id, rep) for every node that appears in a pair, rep = the
    component's minimum id.

    Two-tier execution (the edge set is materialized either way):

    - **small graph** (≤ ``small_graph_edges`` symmetric edges, ~100 MB
      at the 4M default): one worker TASK runs a vectorized numpy
      min-propagation + pointer-jumping union over the whole edge
      frame. Near-dup graphs are normally ≪ corpus (only the dup hits
      appear), so at any scale this is the common path — and it costs
      one task instead of O(diameter) shuffle rounds.
    - **large graph**: min-label propagation — each iteration
      hash-joins the current labels onto the symmetric edge set (one
      tagged-union bucketed co-group, the indexer-join machinery) and
      folds per-node minima (one bucketed min). Iterations needed =
      component diameter — near-dup clusters are shallow (pairs come
      from a shared bucket), so a handful of rounds converges; the
      per-iteration label-sum (a monotonically decreasing integer)
      gives an exact distributed convergence check with no driver-side
      labels. Pass ``small_graph_edges=0`` to force this path.
    """
    from .agg import bucketed_group_apply

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        u = np.concatenate([df[a_col].to_numpy(np.int64), df[b_col].to_numpy(np.int64)])
        v = np.concatenate([df[b_col].to_numpy(np.int64), df[a_col].to_numpy(np.int64)])
        return pd.DataFrame({"u": u, "v": v})

    edges = pairs_ds.map_batches(sym, batch_format="pandas")

    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"u": df["u"].to_numpy(np.int64),
                             "label": df["u"].to_numpy(np.int64)}).drop_duplicates("u")

    def _label_checksum(lab_ds) -> int:
        # exact arbitrary-precision sum: int64 would overflow at
        # 10^10-scale ids x 10^10 nodes; per-block partial sums are
        # Python ints serialized as strings (one tiny row per block)
        parts = lab_ds.map_batches(
            lambda df: pd.DataFrame(
                {"s": [str(int(df["label"].astype(object).sum())) if len(df) else "0"]}
            ),
            batch_format="pandas",
        ).take_all()
        return sum(int(r["s"]) for r in parts)

    def tag_edge(df: pd.DataFrame) -> pd.DataFrame:
        # join key = u (the label owner); v = the neighbor to notify
        return pd.DataFrame({"u": df["u"].to_numpy(np.int64),
                             "v": df["v"].to_numpy(np.int64),
                             "label": np.int64(-1)})

    def tag_label(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"u": df["u"].to_numpy(np.int64),
                             "v": np.int64(-1),
                             "label": df["label"].to_numpy(np.int64)})

    def propagate(g: pd.DataFrame) -> pd.DataFrame:
        # one bucket: edges (u, v) + labels (u, label) co-grouped on u;
        # emit (v, label_of_u) candidates + the existing (u, label)
        lab = g[g["v"] < 0][["u", "label"]]
        e = g[g["label"] < 0][["u", "v"]]
        if len(e) and len(lab):
            m = e.merge(lab, on="u", how="inner")
            cand = pd.DataFrame({"u": m["v"].to_numpy(np.int64),
                                 "label": m["label"].to_numpy(np.int64)})
            out = pd.concat([lab, cand], ignore_index=True)
        else:
            out = lab
        # partial min inside the bucket before the fold exchange
        return out.groupby("u", sort=False, as_index=False)["label"].min()

    # materialize the symmetric edge set ONCE: it is unioned into every
    # iteration (and seeds the initial labels), so a lazy Dataset would
    # re-execute the entire upstream pair-generation pipeline (minhash
    # banding / embedding matmuls) per iteration. Edge cardinality is
    # pair-scale (2x the near-dup hits), not corpus-scale, so holding it
    # in the object store is bounded.
    # repartition before materializing: the pair pipeline leaves many
    # near-empty blocks (one per chunk-pair/band task) and every
    # iteration's sort exchange pays per-block overhead on the union
    tagged_edges = (
        edges.map_batches(tag_edge, batch_format="pandas")
        .repartition(n_buckets)
        .materialize()
    )
    if tagged_edges.count() <= small_graph_edges:
        return tagged_edges.repartition(1).map_batches(
            _cc_single_task, batch_format="pandas", batch_size=None)
    labels = bucketed_group_apply(
        tagged_edges.map_batches(init_labels, batch_format="pandas"), "u",
        lambda g: g.drop_duplicates("u"), n_buckets=n_buckets,
    ).materialize()
    prev_sum = _label_checksum(labels)

    for _ in range(max_iters):
        tagged = labels.map_batches(tag_label, batch_format="pandas").union(tagged_edges)
        cand = bucketed_group_apply(tagged, "u", propagate, n_buckets=n_buckets)
        labels = bucketed_group_apply(
            cand, "u",
            lambda g: g.groupby("u", sort=False, as_index=False)["label"].min(),
            n_buckets=n_buckets,
        ).materialize()
        s = _label_checksum(labels)
        if s == prev_sum:
            break  # fixpoint: min-labels are monotone non-increasing ints
        prev_sum = s

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"id": df["u"].to_numpy(np.int64),
                             "rep": df["label"].to_numpy(np.int64)})

    return labels.map_batches(finish, batch_format="pandas")



def explode_spans(df: pd.DataFrame, k: int, text_col: str = "text",
                  id_col: str = "doc_id", with_pos: bool = False,
                  hash_spans: bool = False) -> pd.DataFrame:
    """Shared k-gram span explode (used by dup_span_counts below and by
    ops/linededup.span_dedup): one row per k-token window, columns
    (id_col, span[, pos]). The span strings build in k-1 object-array
    add passes (str concat in a C loop, no per-row Python bytecode);
    ``hash_spans`` swaps the string for a packed 128-bit hash (the
    100-TB exchange layout, see dup_span_counts); ``with_pos`` adds the
    0-based in-doc window position (needed by removal, not by counts)."""
    from .text import ascii_tokens

    ids = df[id_col].to_numpy()
    words_per_doc = [ascii_tokens(str(t)) if t is not None else [] for t in df[text_col]]
    lens = np.fromiter((len(w) for w in words_per_doc), dtype=np.int64,
                       count=len(words_per_doc))
    nspans = np.maximum(lens - k + 1, 0)
    total = int(nspans.sum())
    if total == 0:
        out = pd.DataFrame({id_col: np.array([], dtype=ids.dtype),
                            "span": pd.Series(dtype="object")})
        if with_pos:
            out["pos"] = pd.Series(dtype="int64")
        return out
    flat = np.empty(int(lens.sum()), dtype=object)
    o = 0
    for w in words_per_doc:
        flat[o:o + len(w)] = w
        o += len(w)
    starts = np.cumsum(lens) - lens
    # flat start index of every span: starts[d] + 0..nspans[d]-1
    pos = np.arange(total) - np.repeat(np.cumsum(nspans) - nspans, nspans)
    idx = np.repeat(starts, nspans) + pos
    acc = flat[idx]
    for j in range(1, k):
        acc = np.add(np.add(acc, " "), flat[idx + j])
    if hash_spans:
        h1 = pd.util.hash_array(acc, hash_key="0123456789123456")
        h2 = pd.util.hash_array(acc, hash_key="6543210987654321")
        acc = (h1.astype(object) << np.uint64(64)) | h2.astype(object)
    out = pd.DataFrame({id_col: np.repeat(ids, nspans), "span": acc})
    if with_pos:
        out["pos"] = pos.astype(np.int64)
    return out


def dup_span_counts(docs_ds, k: int = 8, text_col: str = "text",
                    id_col: str = "doc_id", n_buckets: int = 64,
                    hash_spans: bool = False):
    """Cross-document duplicate k-gram span statistics — the detection
    half of exact substring dedup (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better": repeated ~50-token
    spans across a corpus are memorization fuel; pipelines first measure
    per-doc duplicated-span mass, then cut).

    Returns one row per document: ``(doc_id, n_spans, n_dup)`` where
    n_spans = max(len(words)-k+1, 0) and n_dup counts spans whose exact
    k-word string occurs >1 time anywhere in the corpus (including
    other positions of the same document).

    Scale shape (100 TB): the exchange moves (doc_id, span) pairs —
    O(tokens) like every shingle op here. All occurrences of a span
    hash to one bucket, so global span counts are exact per bucket with
    no second pass; per-doc partial sums leave each bucket (rows ≤
    docs-touched-per-bucket) and one small bucketed sum folds them. No
    stage holds more than a bucket. A suffix-array would find variable-
    length maximal repeats; fixed-k spans are the standard streaming
    approximation and are SQL-oracle-able.

    ``hash_spans=True`` is the 100-TB layout: the exchange carries a
    128-bit span hash (two independent 64-bit pandas hashes packed into
    one Python int, ~16 bytes/span) instead of the k-word string
    (~50-100 bytes/span) — same bucketing, same counts, collision odds
    ~n^2/2^129 (≪1 even at 10^13 spans). Default False so the query
    layout stays exactly equal to the string-comparing SQL oracle.
    """
    from .agg import bucketed_group_apply, bucketed_sum

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        return explode_spans(df, k, text_col=text_col, id_col=id_col,
                             hash_spans=hash_spans)

    def mark_bucket(b: pd.DataFrame) -> pd.DataFrame:
        sizes = b.groupby("span", sort=False)["span"].transform("size").to_numpy()
        part = pd.DataFrame({
            id_col: b[id_col].to_numpy(),
            "n_spans": np.ones(len(b), dtype=np.int64),
            "n_dup": (sizes > 1).astype(np.int64),
        })
        return part.groupby(id_col, sort=False, as_index=False).sum()

    def zero_rows(df: pd.DataFrame) -> pd.DataFrame:
        # every doc appears in the output, spans or not
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "n_spans": np.zeros(len(df), dtype=np.int64),
            "n_dup": np.zeros(len(df), dtype=np.int64),
        })

    spans = docs_ds.map_batches(explode, batch_format="pandas")
    partials = bucketed_group_apply(spans, "span", mark_bucket, n_buckets=n_buckets)
    base = docs_ds.map_batches(zero_rows, batch_format="pandas")
    return bucketed_sum(partials.union(base), id_col, ["n_spans", "n_dup"])


def novel_span_counts(docs_ds, k: int = 3, text_col: str = "text",
                      id_col: str = "doc_id", n_buckets: int = 64,
                      hash_spans: bool = False):
    """Order-aware n-gram NOVELTY statistics: one row per document,
    ``(doc_id, n_spans, n_novel)`` where a k-gram window is *novel* iff
    it is the globally FIRST occurrence of that exact k-token string in
    corpus order (doc_id asc, window position asc). The per-doc novelty
    fraction n_novel/n_spans is the standard "novelty curve" used to
    audit how much genuinely new text each shard of a training corpus
    contributes (a corpus of near-copies has a novelty curve that decays
    to ~0), and it is the order-aware complement of
    :func:`dup_span_counts` (which counts a window as duplicated no
    matter where its twin lives).

    Scale shape: identical to dup_span_counts — ONE (doc_id, pos, span)
    exchange bucketed by span hash; all occurrences of a span land in
    one bucket, so the global first-occurrence rank is exact per bucket
    with no second pass (an idxmin over the packed (doc_id, pos) key,
    not a sort); per-doc partials leave each bucket and one small
    bucketed per-doc sum folds them. ``hash_spans=True`` is the 128-bit
    hashed exchange layout (see dup_span_counts).
    """
    from .agg import bucketed_group_apply, bucketed_sum

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        return explode_spans(df, k, text_col=text_col, id_col=id_col,
                             with_pos=True, hash_spans=hash_spans)

    def mark_bucket(b: pd.DataFrame) -> pd.DataFrame:
        # global first occurrence per span = min over the packed
        # (doc_id, pos) order key; ids/pos are int64 and pos < 2^20 in
        # any real document batch is NOT guaranteed, so compare
        # lexicographically via two-pass idxmin: min doc_id per span,
        # then min pos within that doc.
        d = pd.DataFrame({
            id_col: b[id_col].to_numpy(),
            "pos": b["pos"].to_numpy(),
            "span": b["span"].to_numpy(),
        })
        g = d.groupby("span", sort=False)
        min_doc = g[id_col].transform("min").to_numpy()
        in_min_doc = d[id_col].to_numpy() == min_doc
        # min pos restricted to rows of the span's minimal doc
        pos_masked = np.where(in_min_doc, d["pos"].to_numpy(), np.iinfo(np.int64).max)
        min_pos = (d.assign(_pm=pos_masked).groupby("span", sort=False)["_pm"]
                   .transform("min").to_numpy())
        novel = in_min_doc & (d["pos"].to_numpy() == min_pos)
        part = pd.DataFrame({
            id_col: d[id_col].to_numpy(),
            "n_spans": np.ones(len(d), dtype=np.int64),
            "n_novel": novel.astype(np.int64),
        })
        return part.groupby(id_col, sort=False, as_index=False).sum()

    def zero_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "n_spans": np.zeros(len(df), dtype=np.int64),
            "n_novel": np.zeros(len(df), dtype=np.int64),
        })

    spans = docs_ds.map_batches(explode, batch_format="pandas")
    partials = bucketed_group_apply(spans, "span", mark_bucket, n_buckets=n_buckets)
    base = docs_ds.map_batches(zero_rows, batch_format="pandas")
    return bucketed_sum(partials.union(base), id_col, ["n_spans", "n_novel"])
