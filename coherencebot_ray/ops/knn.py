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


def knn_brute(embeddings_ds, query_ids: list[int], k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Exact cosine top-k for each query id (queries are rows of the same
    table). Returns Dataset (query_id, neighbor_id, sim, rank); self
    excluded; ties broken by (sim desc, neighbor_id asc) on sims rounded
    to 6 dp (float-stable across engines)."""
    import ray
    import ray.data as rd

    qset = set(int(q) for q in query_ids)

    qrows = []
    for batch in embeddings_ds.iter_batches(batch_format="pandas"):
        hit = batch[batch[id_col].isin(qset)]
        if len(hit):
            qrows.append(hit[[id_col, vec_col]])
    qdf = pd.concat(qrows).drop_duplicates(id_col).sort_values(id_col)
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
            cids, csims = ids[mask], col[mask]
            if len(cids) > k:
                idx = np.argpartition(-csims, k)[:k]
                cids, csims = cids[idx], csims[idx]
            out["query_id"].extend([q] * len(cids))
            out["neighbor_id"].extend(cids.tolist())
            out["sim"].extend(csims.tolist())
        return pd.DataFrame(out)

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


def knn_ivf(embeddings_ds, query_ids: list[int], k: int = 10, n_centroids: int = 16, nprobe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding"):
    """IVF ANN: restrict the scan to vectors whose centroid is among the
    query's nprobe nearest centroids. Same output shape as knn_brute."""
    import ray

    C = build_centroids(embeddings_ds, n_centroids, vec_col=vec_col)
    c_ref = ray.put(C)

    qset = set(int(q) for q in query_ids)
    qrows = []
    for batch in embeddings_ds.iter_batches(batch_format="pandas"):
        hit = batch[batch[id_col].isin(qset)]
        if len(hit):
            qrows.append(hit[[id_col, vec_col]])
    qdf = pd.concat(qrows).drop_duplicates(id_col).sort_values(id_col)
    Q = _normalize(_batch_matrix(qdf, vec_col))
    qids = qdf[id_col].to_numpy()
    q_probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    q_ref = ray.put((qids, Q, q_probe))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        qids_, Q_, probes = ray.get(q_ref)
        C_ = ray.get(c_ref)
        X = _normalize(_batch_matrix(df, vec_col))
        ids = df[id_col].to_numpy()
        assign = np.argmax(X @ C_.T, axis=1)
        sims = X @ Q_.T
        out = {"query_id": [], "neighbor_id": [], "sim": []}
        for j, q in enumerate(qids_):
            in_probe = np.isin(assign, probes[j])
            mask = in_probe & (ids != q)
            cids = ids[mask]
            csims = np.round(sims[mask, j], 6)
            if len(cids) > k:
                idx = np.argpartition(-csims, k)[:k]
                cids, csims = cids[idx], csims[idx]
            out["query_id"].extend([q] * len(cids))
            out["neighbor_id"].extend(cids.tolist())
            out["sim"].extend(csims.tolist())
        return pd.DataFrame(out)

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


def embedding_neardup_pairs(embeddings_ds, threshold: float = 0.95, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Embedding-cosine near-dup pairs (a<b, sim>=threshold).

    Test-scale implementation: blocked matmul of the corpus against a
    broadcast copy of itself (fits for <=1e5 rows); scale path is LSH
    bucketing on random hyperplane signs + within-bucket matmul."""
    import ray
    import ray.data as rd

    all_pd = embeddings_ds.to_pandas()
    ids = all_pd[id_col].to_numpy()
    M = _normalize(_batch_matrix(all_pd, vec_col))
    ref = ray.put((ids, M))

    def block(df: pd.DataFrame) -> pd.DataFrame:
        ids_all, M_all = ray.get(ref)
        X = _normalize(_batch_matrix(df, vec_col))
        bids = df[id_col].to_numpy()
        sims = X @ M_all.T
        out = {"a": [], "b": [], "sim": []}
        for i in range(len(bids)):
            mask = (sims[i] >= threshold) & (ids_all > bids[i])
            for j in np.flatnonzero(mask):
                out["a"].append(bids[i])
                out["b"].append(ids_all[j])
                out["sim"].append(round(float(sims[i, j]), 6))
        return pd.DataFrame(out)

    return embeddings_ds.map_batches(block, batch_format="pandas")
