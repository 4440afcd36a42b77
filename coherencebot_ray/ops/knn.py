"""Similarity search over an embedding column (list<float>).

- ``knn_brute``: exact cosine top-k — per-batch numpy matmul against a
  broadcast query matrix (``ray.put`` once), per-batch partial top-k,
  final top-k merge per query. The canonical scale shape: the corpus
  streams, only k×queries candidate rows shuffle.
- ``knn_ivf``: IVF-style bucketed ANN — coarse centroids (sampled +
  refined), per-batch assignment, probe nprobe nearest centroids.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _batch_matrix(df: pd.DataFrame, col: str) -> np.ndarray:
    return np.stack(df[col].to_numpy()).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _typed_partial(out: dict) -> pd.DataFrame:
    """Typed (query_id, neighbor_id, sim) frame — the dtypes must hold on
    the empty path too, or Ray schema unification promotes int/uint
    columns to float64 (round-2 simhash lesson)."""
    return pd.DataFrame(
        {"query_id": pd.Series(out["query_id"], dtype="int64"),
         "neighbor_id": pd.Series(out["neighbor_id"], dtype="int64"),
         "sim": pd.Series(out["sim"], dtype="float64")}
    )


def _prune_topk(cids: np.ndarray, csims: np.ndarray, k: int):
    """Batch-local candidate prune in the FINAL order (sim desc,
    neighbor_id asc) so ties straddling the k-th value keep the same
    winners regardless of batch partitioning."""
    if len(cids) > k:
        order = np.lexsort((cids, -csims))[:k]
        return cids[order], csims[order]
    return cids, csims


def pick_query_vectors(embeddings_ds, query_ids, id_col: str = "vec_id", vec_col: str = "embedding") -> pd.DataFrame:
    """Distributed id-pruned pick of query vectors: an Arrow filter runs
    inside map_batches and only the (tiny) hit set reaches the driver —
    never a full-corpus driver scan (same pattern as first_centroids)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    qarr = pa.array(sorted(set(int(q) for q in query_ids)), type=pa.int64())

    def pick(t: pa.Table) -> pa.Table:
        ids = pc.cast(t[id_col], pa.int64())
        return t.select([id_col, vec_col]).filter(pc.is_in(ids, value_set=qarr))

    qdf = embeddings_ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    return qdf.drop_duplicates(id_col).sort_values(id_col)


def knn_brute(embeddings_ds, query_ids: list[int], k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Exact cosine top-k for each query id (queries are rows of the same
    table). Returns Dataset (query_id, neighbor_id, sim, rank); self
    excluded; ties broken by (sim desc, neighbor_id asc) on sims rounded
    to 6 dp (float-stable across engines)."""
    import ray
    import ray.data as rd

    qdf = pick_query_vectors(embeddings_ds, query_ids, id_col, vec_col)
    Q = _normalize(_batch_matrix(qdf, vec_col))  # (nq, d)
    qids = qdf[id_col].to_numpy()
    q_ref = ray.put((qids, Q))

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        qids_, Q_ = ray.get(q_ref)
        X = _normalize(_batch_matrix(df, vec_col))  # (n, d)
        ids = df[id_col].to_numpy()
        sims = X @ Q_.T  # (n, nq)
        out = {"query_id": [], "neighbor_id": [], "sim": []}
        for j, q in enumerate(qids_):
            col = np.round(sims[:, j], 6)
            mask = ids != q  # exclude self
            cids, csims = _prune_topk(ids[mask], col[mask], k)
            out["query_id"].extend([int(q)] * len(cids))
            out["neighbor_id"].extend(cids.tolist())
            out["sim"].extend(csims.tolist())
        return _typed_partial(out)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True], kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (
        embeddings_ds.map_batches(partial_topk, batch_format="pandas")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pandas")
    )


def build_centroids(embeddings_ds, n_centroids: int = 16, iters: int = 3, vec_col: str = "embedding", sample_n: int = 2048, seed: int = 42):
    """Mini k-means on a driver-side sample (centroid set is tiny; the
    corpus itself never materializes)."""
    sample = embeddings_ds.random_sample(1.0, seed=seed).limit(sample_n).to_pandas()
    X = _normalize(_batch_matrix(sample, vec_col))
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            pts = X[assign == c]
            if len(pts):
                v = pts.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    C[c] = v / n
    return C


def first_centroids(embeddings_ds, n_centroids: int = 16, id_col: str = "vec_id", vec_col: str = "embedding") -> np.ndarray:
    """Deterministic IVF seeding: the n_centroids lowest-id vectors,
    normalized, no refinement — exactly mirrorable in SQL for the
    correctness oracle (id-pruned read; the centroid set is tiny)."""

    import pyarrow as pa
    import pyarrow.compute as pc

    def pick(t: pa.Table) -> pa.Table:
        return t.select([id_col, vec_col]).filter(pc.less(t[id_col], pa.scalar(n_centroids)))

    sm = embeddings_ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    sm = sm.drop_duplicates(id_col).sort_values(id_col)
    return _normalize(_batch_matrix(sm, vec_col))


def knn_ivf(embeddings_ds, query_ids: list[int], k: int = 10, n_centroids: int = 16, nprobe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding", centroid_mode: str = "kmeans"):
    """IVF ANN: restrict the scan to vectors whose centroid is among the
    query's nprobe nearest centroids. Same output shape as knn_brute.

    ``centroid_mode``: "kmeans" (sampled mini-kmeans, default) or
    "first" (deterministic lowest-id seeding, SQL-mirrorable). Centroid
    similarities are rounded to 6 dp with ties broken by centroid index
    so assignment/probing is float-stable across engines.
    """
    import ray

    if centroid_mode == "first":
        C = first_centroids(embeddings_ds, n_centroids, id_col=id_col, vec_col=vec_col)
    else:
        C = build_centroids(embeddings_ds, n_centroids, vec_col=vec_col)
    c_ref = ray.put(C)

    qdf = pick_query_vectors(embeddings_ds, query_ids, id_col, vec_col)
    Q = _normalize(_batch_matrix(qdf, vec_col))
    qids = qdf[id_col].to_numpy()
    # rounded sims + stable sort: ties broken by centroid index (matches
    # the SQL oracle's ORDER BY round(sim,6) DESC, cid ASC)
    q_probe = np.argsort(-np.round(Q @ C.T, 6), axis=1, kind="stable")[:, :nprobe]
    q_ref = ray.put((qids, Q, q_probe))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        qids_, Q_, probes = ray.get(q_ref)
        C_ = ray.get(c_ref)
        X = _normalize(_batch_matrix(df, vec_col))
        ids = df[id_col].to_numpy()
        assign = np.argmax(np.round(X @ C_.T, 6), axis=1)  # first max = lowest cid
        sims = X @ Q_.T
        out = {"query_id": [], "neighbor_id": [], "sim": []}
        for j, q in enumerate(qids_):
            in_probe = np.isin(assign, probes[j])
            mask = in_probe & (ids != q)
            cids, csims = _prune_topk(ids[mask], np.round(sims[mask, j], 6), k)
            out["query_id"].extend([int(q)] * len(cids))
            out["neighbor_id"].extend(cids.tolist())
            out["sim"].extend(csims.tolist())
        return _typed_partial(out)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True], kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (
        embeddings_ds.map_batches(partial, batch_format="pandas")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pandas")
    )


def knn_lsh(embeddings_ds, query_ids: list[int], k: int = 10, n_tables: int = 8,
            n_bits: int = 8, id_col: str = "vec_id", vec_col: str = "embedding",
            seed: int = 42, dim: int | None = None):
    """LSH-bucketed ANN (the third similarity-search flavor, next to
    brute force and IVF): candidates = vectors sharing at least one
    random-hyperplane (table, signature) bucket with the query; exact
    cosine re-rank among candidates only. Same pruned-scan shape as
    :func:`knn_ivf` — one broadcast of the queries + their signatures,
    one map_batches scan with per-query partial top-k, one tiny final
    groupby — so the full corpus streams once and no row leaves a task
    un-pruned. Approximate by construction: recall for a neighbor at
    cosine s is 1-(1-p^n_bits)^n_tables, p = 1 - arccos(s)/pi.
    Deterministic: 6-dp rounded sims, ties break by neighbor id."""
    import ray

    if dim is None:
        dim = len(embeddings_ds.take(1)[0][vec_col])
    rng = np.random.default_rng(seed)
    H = rng.standard_normal((n_tables * n_bits, dim))
    weights = (1 << np.arange(n_bits, dtype=np.int64))

    def table_sigs(M: np.ndarray) -> np.ndarray:
        bits = (M @ H.T) > 0
        return np.stack(
            [bits[:, t * n_bits:(t + 1) * n_bits] @ weights
             for t in range(n_tables)], axis=1)

    qdf = pick_query_vectors(embeddings_ds, query_ids, id_col, vec_col)
    Q = _normalize(_batch_matrix(qdf, vec_col))
    qids = qdf[id_col].to_numpy()
    q_ref = ray.put((qids, Q, table_sigs(Q)))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        qids_, Q_, qsigs = ray.get(q_ref)
        X = _normalize(_batch_matrix(df, vec_col))
        ids = df[id_col].to_numpy()
        sigs = table_sigs(X)  # (n, n_tables)
        sims = X @ Q_.T
        out = {"query_id": [], "neighbor_id": [], "sim": []}
        for j, q in enumerate(qids_):
            cand = (sigs == qsigs[j]).any(axis=1) & (ids != q)
            cids, csims = _prune_topk(ids[cand], np.round(sims[cand, j], 6), k)
            out["query_id"].extend([int(q)] * len(cids))
            out["neighbor_id"].extend(cids.tolist())
            out["sim"].extend(csims.tolist())
        return _typed_partial(out)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True], kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (
        embeddings_ds.map_batches(partial, batch_format="pandas")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pandas")
    )


def embedding_neardup_pairs(
    embeddings_ds,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_chunks: int = 8,
    scratch: str | None = None,
):
    """EXACT embedding-cosine near-dup pairs (a<b, sim>=threshold) as a
    distributed block cross-join — no driver-side materialization and no
    full-corpus broadcast.

    Shape: (1) one pass chunks the corpus by stable hash(id) into
    ``n_chunks`` normalized matrices persisted to scratch storage (a task
    per chunk); (2) one task per chunk PAIR (i<=j) loads exactly two
    chunks and matmuls them. Per-task memory is 2 chunks; total compute
    is the O(N^2) inherent to an exact all-pairs threshold scan, spread
    over n_chunks*(n_chunks+1)/2 independent tasks. At 100 TB, scratch is
    the shared object store / filesystem and n_chunks grows ~sqrt(N).

    For an approximate sub-quadratic scan use
    :func:`embedding_neardup_lsh` (hyperplane signatures + banding).
    """
    import os
    import tempfile

    import ray
    import ray.data as rd

    from .agg import stable_bucket

    if scratch is None:
        # chunk writers and pair readers are separate Ray tasks: a
        # node-local /tmp default only works single-node. Fail fast on a
        # multi-node cluster instead of FileNotFoundError mid-job.
        alive = [n for n in ray.nodes() if n.get("Alive")] if ray.is_initialized() else []
        if len(alive) > 1:
            raise ValueError(
                "embedding_neardup_pairs on a multi-node cluster needs an "
                "explicit shared-filesystem scratch= path (node-local /tmp "
                "is invisible to pair tasks on other nodes)"
            )
        scratch = tempfile.mkdtemp(prefix="neardup_", dir="/tmp")
    os.makedirs(scratch, exist_ok=True)

    def add_chunk(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[id_col, vec_col]].copy()
        out["__chunk"] = stable_bucket(df[id_col], n_chunks)
        return out

    def write_chunk(g: pd.DataFrame) -> pd.DataFrame:
        c = int(g["__chunk"].iloc[0])
        g = g.sort_values(id_col, kind="stable")
        ids = g[id_col].to_numpy(dtype=np.int64)
        M = _normalize(_batch_matrix(g, vec_col))
        np.savez(os.path.join(scratch, f"chunk-{c}.npz"), ids=ids, m=M)
        return pd.DataFrame({"chunk": [c], "rows": [len(g)]})

    present = (
        embeddings_ds.map_batches(add_chunk, batch_format="pandas")
        .groupby("__chunk")
        .map_groups(write_chunk, batch_format="pandas")
        .to_pandas()
    )
    chunks = sorted(int(c) for c in present["chunk"])

    def pair_task(batch: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for ci, cj in zip(batch["ci"], batch["cj"]):
            zi = np.load(os.path.join(scratch, f"chunk-{int(ci)}.npz"))
            ids_i, Mi = zi["ids"], zi["m"]
            if ci == cj:
                ids_j, Mj = ids_i, Mi
            else:
                zj = np.load(os.path.join(scratch, f"chunk-{int(cj)}.npz"))
                ids_j, Mj = zj["ids"], zj["m"]
            sims = Mi @ Mj.T
            hit = sims >= threshold
            if ci == cj:
                # within-chunk: upper triangle only (no self, no mirror)
                ii, jj = np.nonzero(np.triu(hit, k=1))
            else:
                # cross-chunk: each unordered pair appears exactly once
                # (every id lives in exactly one chunk)
                ii, jj = np.nonzero(hit)
            a_ids, b_ids = ids_i[ii], ids_j[jj]
            # orient a<b (chunking is by hash, not id range); direct
            # array construction — hits are sparse but never row-looped
            frames.append(pd.DataFrame({
                "a": np.minimum(a_ids, b_ids).astype(np.int64),
                "b": np.maximum(a_ids, b_ids).astype(np.int64),
                "sim": np.round(sims[ii, jj].astype(np.float64), 6),
            }))
        if not frames:
            return pd.DataFrame(
                {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
                 "sim": pd.Series(dtype="float64")})
        return pd.concat(frames, ignore_index=True)

    pairs = [{"ci": i, "cj": j} for i in chunks for j in chunks if i <= j]
    return rd.from_items(pairs, override_num_blocks=max(1, len(pairs))).map_batches(
        pair_task, batch_format="pandas", batch_size=1
    )


def embedding_neardup_lsh(
    embeddings_ds,
    threshold: float = 0.9,
    n_tables: int = 16,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    dim: int | None = None,
):
    """APPROXIMATE near-dup pairs via random-hyperplane LSH: per vector,
    ``n_tables`` sign-signatures of ``n_bits`` hyperplanes each; vectors
    sharing a (table, signature) bucket are candidates; candidates are
    verified exactly (cosine >= threshold) inside the bucket task.

    Sub-quadratic scale path of :func:`embedding_neardup_pairs`: one
    map_batches (signatures) + one bucketed groupby + within-bucket
    matmul. Recall for a pair at cosine s is 1-(1-p^n_bits)^n_tables with
    p = 1 - arccos(s)/pi — tune (n_tables, n_bits) to the threshold
    (defaults give >0.999 at s>=0.95). Output may miss pairs below that;
    precision is exact (every emitted pair is verified).
    """
    from .agg import bucketed_group_apply

    if dim is None:
        first = embeddings_ds.take(1)[0]
        dim = len(first[vec_col])
    rng = np.random.default_rng(seed)
    H = rng.standard_normal((n_tables * n_bits, dim))  # rows = hyperplanes
    weights = (1 << np.arange(n_bits, dtype=np.int64))

    def signatures(df: pd.DataFrame) -> pd.DataFrame:
        X = _normalize(_batch_matrix(df, vec_col))
        bits = (X @ H.T) > 0  # (n, n_tables*n_bits)
        ids = df[id_col].to_numpy()
        frames = []
        for t in range(n_tables):
            sig = bits[:, t * n_bits : (t + 1) * n_bits] @ weights
            frames.append(
                pd.DataFrame({id_col: ids, "table": t, "sig": sig.astype(np.int64), vec_col: df[vec_col].to_numpy()})
            )
        return pd.concat(frames, ignore_index=True)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for (_, _), grp in g.groupby(["table", "sig"], sort=False):
            d = grp.drop_duplicates(id_col).sort_values(id_col)
            if len(d) < 2:
                continue
            ids = d[id_col].to_numpy()
            M = _normalize(_batch_matrix(d, vec_col))
            sims = M @ M.T
            ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
            if len(ii):
                outs.append(
                    pd.DataFrame(
                        {"a": ids[ii], "b": ids[jj], "sim": np.round(sims[ii, jj], 6)}
                    )
                )
        if not outs:
            return pd.DataFrame(
                {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"), "sim": pd.Series(dtype="float64")}
            )
        return pd.concat(outs, ignore_index=True)

    sig_ds = embeddings_ds.map_batches(signatures, batch_format="pandas")
    cand = bucketed_group_apply(sig_ds, ["table", "sig"], bucket_pairs)

    # same pair can collide in several tables -> distinct (a,b), bucketed
    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=["a", "b"])

    return bucketed_group_apply(cand, ["a", "b"], dedup_bucket)


def knn_pq(embeddings_ds, query_ids: list[int], k: int = 10, m: int = 4,
           ksub: int = 16, iters: int = 2, id_col: str = "vec_id",
           vec_col: str = "embedding"):
    """Product-quantization ANN (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): split each vector into
    ``m`` subspaces, vector-quantize every subspace against its own
    ``ksub``-centroid codebook (deterministic lowest-id seed + ``iters``
    Lloyd updates, the ops/cluster.kmeans recipe per subspace), and
    answer queries with asymmetric distance computation (ADC): per
    query, a (m x ksub) table of exact query-sub-to-centroid squared
    distances is precomputed, and a corpus vector's approximate L2
    distance is the sum of m table lookups on its codes.

    Why this is THE memory scale path: a 10^10 x 64-float32 embedding
    table is ~2.5 TB; PQ codes at m=4 bytes/vector are ~40 GB — the
    difference between "the scan re-reads storage every query batch"
    and "codes pinned hot in the object store". The codebook fit is
    ``iters`` streaming passes emitting (subspace, centroid) partial
    sums (m x ksub rows per block, driver-folded — same shape as
    kmeans); the query scan is ONE pass doing encode + ADC per batch
    with a broadcast LUT; only k x queries candidate rows leave each
    batch (the knn_brute prune). Nothing shuffles.

    Approximation contract: neighbors are ranked by round(ADC, 6) asc
    with neighbor-id tie-break; ADC error vs true L2 is bounded by
    quantization error, and the SQL oracle replicates fit + encode +
    ADC exactly (same seeds, same tie-breaks), so the output is
    deterministic and hash-verifiable even though recall < 1 vs exact
    search. Returns Dataset (query_id, neighbor_id, rank); self
    excluded.
    """
    import ray

    from .cluster import _assign

    # ---- fit per-subspace codebooks: iters streaming passes ----
    seed = (embeddings_ds.filter(expr=f"{id_col} < {ksub}")
            .to_pandas().sort_values(id_col))
    S = _batch_matrix(seed, vec_col)
    dim = S.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    cents = [S[:, j * dsub:(j + 1) * dsub].copy() for j in range(m)]

    for _ in range(iters):
        snap = [c.copy() for c in cents]
        ncs = [len(c) for c in cents]

        def partial(df: pd.DataFrame, _snap=snap, _ncs=ncs) -> pd.DataFrame:
            X = _batch_matrix(df, vec_col)
            frames = []
            for j in range(m):
                Xj = X[:, j * dsub:(j + 1) * dsub]
                a = _assign(Xj, _snap[j])
                cnt = np.bincount(a, minlength=_ncs[j]).astype(np.int64)
                sums = np.zeros((_ncs[j], dsub), dtype=np.float64)
                np.add.at(sums, a, Xj)
                f = pd.DataFrame({"j": np.full(_ncs[j], j, dtype=np.int64),
                                  "c": np.arange(_ncs[j], dtype=np.int64),
                                  "n": cnt})
                for d in range(dsub):
                    f[f"s{d}"] = sums[:, d]
                frames.append(f[f["n"] > 0])
            return pd.concat(frames, ignore_index=True)

        agg = (embeddings_ds.map_batches(partial, batch_format="pandas")
               .to_pandas()  # m x ksub rows per block: bounded driver fold
               .groupby(["j", "c"], sort=True).sum())
        dims = [c for c in agg.columns if c.startswith("s")]
        # empty subspace clusters drop out of the groupby (the SQL
        # oracle's inner-join regroup does the same); codes are plain
        # row indices into the surviving centroid array, no id tracking
        cents = []
        for j in range(m):
            gj = agg.xs(j, level="j")
            cnts = gj["n"].to_numpy(dtype=np.float64)
            cents.append(gj[dims].to_numpy(dtype=np.float64) / cnts[:, None])

    # ---- queries + per-subspace ADC lookup tables ----
    qdf = pick_query_vectors(embeddings_ds, query_ids, id_col, vec_col)
    Qm = _batch_matrix(qdf, vec_col)
    qids = qdf[id_col].to_numpy(np.int64)
    luts = []
    for j in range(m):
        Qj = Qm[:, j * dsub:(j + 1) * dsub]
        luts.append(((Qj[:, None, :] - cents[j][None, :, :]) ** 2).sum(axis=2))
    ref = ray.put((qids, luts, cents))

    # ---- one encode + ADC scan with the knn partial-top-k prune ----
    def scan(df: pd.DataFrame) -> pd.DataFrame:
        qids_, luts_, cents_ = ray.get(ref)
        X = _batch_matrix(df, vec_col)
        ids = df[id_col].to_numpy(np.int64)
        codes = [_assign(X[:, j * dsub:(j + 1) * dsub], cents_[j])
                 for j in range(m)]
        adc = luts_[0][:, codes[0]]
        for j in range(1, m):
            adc = adc + luts_[j][:, codes[j]]
        adc = np.round(adc, 6)  # float-stable rank key (knn_brute recipe)
        out = {"query_id": [], "neighbor_id": [], "sim": []}
        for qi, q in enumerate(qids_):
            mask = ids != q
            nids, col = ids[mask], adc[qi][mask]
            if len(nids) > k:
                order = np.lexsort((nids, col))[:k]
                nids, col = nids[order], col[order]
            out["query_id"].extend([int(q)] * len(nids))
            out["neighbor_id"].extend(nids.tolist())
            out["sim"].extend(col.tolist())
        return _typed_partial(out)  # 'sim' column carries the ADC distance

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"], ascending=[True, True],
                          kind="stable").head(k).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank"]]

    return (embeddings_ds.map_batches(scan, batch_format="pandas")
            .groupby("query_id").map_groups(final_topk, batch_format="pandas"))
