"""Distributed k-means (Lloyd) over an embedding column.

The iterative-algorithm shape Ray Data can't express as one lazy plan:
each iteration is a single streaming pass that emits per-block partial
per-cluster (count, dim-sums); the driver folds k × blocks tiny rows
into new centroids and broadcasts them into the next pass's closure
(centroids are k×d doubles — ray.put-sized, never a shuffle). Documents
never move: the only exchange-free all-data work is the assignment map,
so the pipeline scales as pure map passes regardless of corpus size.

Determinism: init centroids are the embeddings of the k smallest ids
(pruned id filter, no sampling); assignment argmin tie-breaks on the
lowest cluster id (np.argmin first-hit == ROW_NUMBER ORDER BY dist,
cid). Clusters that end an update empty are dropped (surviving ids keep
their labels), mirroring the SQL oracle's inner-join regroup. Float
caveat, documented: centroid means differ from any SQL mirror by
summation order (~1e-15 relative); output is integer cluster ids, whose
argmin decisions are insensitive at that scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _assign(X: np.ndarray, cents: np.ndarray) -> np.ndarray:
    # squared euclidean via expansion; argmin row-wise, first hit wins
    d2 = (
        (X * X).sum(axis=1, keepdims=True)
        - 2.0 * (X @ cents.T)
        + (cents * cents).sum(axis=1)
    )
    return np.argmin(d2, axis=1)


def _fit_centroids(
    embeddings_ds,
    k: int,
    iters: int,
    id_col: str,
    vec_col: str,
):
    """Run ``iters`` streaming Lloyd updates from the deterministic seed
    (vectors with the k smallest ids); return (centroids, cluster_ids).
    Shared by :func:`kmeans_assign` and :func:`semdedup`."""
    seed = (
        embeddings_ds.filter(expr=f"{id_col} < {k}")
        .to_pandas()
        .sort_values(id_col)
    )
    cents = np.stack(
        [np.asarray(v, dtype=np.float64) for v in seed[vec_col]]
    )
    cids = seed[id_col].to_numpy(dtype=np.int64)  # surviving cluster labels

    for _ in range(iters):
        nc = len(cids)
        c_now = cents

        def partial(df: pd.DataFrame, _c=c_now, _nc=nc) -> pd.DataFrame:
            X = np.stack([np.asarray(v, dtype=np.float64) for v in df[vec_col]])
            a = _assign(X, _c)
            cnt = np.bincount(a, minlength=_nc).astype(np.int64)
            sums = np.zeros((_nc, X.shape[1]), dtype=np.float64)
            np.add.at(sums, a, X)
            out = pd.DataFrame({"c": np.arange(_nc, dtype=np.int64), "n": cnt})
            for d in range(X.shape[1]):
                out[f"s{d}"] = sums[:, d]
            return out[out["n"] > 0]

        agg = (
            embeddings_ds.map_batches(partial, batch_format="pandas")
            .to_pandas()  # k rows per block: bounded driver fold
            .groupby("c", sort=True)
            .sum()
        )
        keep = agg.index.to_numpy(dtype=np.int64)
        cnts = agg["n"].to_numpy(dtype=np.float64)
        dims = [c for c in agg.columns if c.startswith("s")]
        cents = agg[dims].to_numpy(dtype=np.float64) / cnts[:, None]
        cids = cids[keep]

    return cents, cids


def kmeans_assign(
    embeddings_ds,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Run ``iters`` Lloyd updates from the deterministic seed (vectors
    with the k smallest ids) and return a Dataset (id_col, cluster) —
    the assignment under the final centroids."""
    c_fin, ids_fin = _fit_centroids(embeddings_ds, k, iters, id_col, vec_col)

    def assign_final(df: pd.DataFrame) -> pd.DataFrame:
        X = np.stack([np.asarray(v, dtype=np.float64) for v in df[vec_col]])
        a = _assign(X, c_fin)
        return pd.DataFrame(
            {id_col: df[id_col].to_numpy(), "cluster": ids_fin[a].astype(np.int64)}
        )

    return embeddings_ds.map_batches(assign_final, batch_format="pandas")


def semdedup(
    embeddings_ds,
    k: int = 8,
    iters: int = 2,
    tau: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_buckets: int = 16,
    chunk_rows: int = 4096,
):
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): k-means the embedding
    space, then run exact cosine near-dup detection only WITHIN each
    cluster — clustering turns the corpus-quadratic all-pairs scan into
    k independent (N/k)^2 problems. Within a cluster, pairs with
    cosine >= ``tau`` form components; the minimum-id member of each
    component is kept (deterministic stand-in for the paper's
    keep-farthest-from-centroid, which is tie-unstable under float
    summation). Returns a Dataset (id_col, cluster, kept) covering every
    input vector, kept in {0, 1}.

    Scale shape (100 TB): centroids fit in a broadcast closure; the one
    exchange moves each embedding ONCE to its cluster's bucket (SemDeDup
    partitions the embedding store by cluster the same way); per-bucket
    work is chunked matmuls (``chunk_rows`` bounds the similarity-matrix
    slab). The premise — and the paper's — is that k grows with N so a
    cluster fits one task; a mega-cluster needs a larger k upstream.
    """
    from .agg import bucketed_group_apply
    from .dedup import _cc_single_task

    cents, cids = _fit_centroids(embeddings_ds, k, iters, id_col, vec_col)

    def assign_with_vec(df: pd.DataFrame) -> pd.DataFrame:
        X = np.stack([np.asarray(v, dtype=np.float64) for v in df[vec_col]])
        a = _assign(X, cents)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "cluster": cids[a].astype(np.int64),
            vec_col: df[vec_col].to_numpy(),
        })

    assigned = embeddings_ds.map_batches(assign_with_vec, batch_format="pandas")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for cl, gg in g.groupby("cluster", sort=False):
            gg = gg.sort_values(id_col, kind="stable")
            ids = gg[id_col].to_numpy(dtype=np.int64)
            M = np.stack([np.asarray(v, dtype=np.float64) for v in gg[vec_col]])
            nrm = np.linalg.norm(M, axis=1, keepdims=True)
            nrm[nrm == 0] = 1.0
            Mn = M / nrm
            us, vs = [], []
            for i0 in range(0, len(ids), chunk_rows):
                S = Mn[i0:i0 + chunk_rows] @ Mn.T
                ii, jj = np.nonzero(S >= tau)
                gi = ii + i0
                m = gi < jj  # upper triangle in GLOBAL cluster indices
                us.append(ids[gi[m]])
                vs.append(ids[jj[m]])
            u = np.concatenate(us) if us else np.array([], dtype=np.int64)
            v = np.concatenate(vs) if vs else np.array([], dtype=np.int64)
            kept = np.ones(len(ids), dtype=np.int64)
            if len(u):
                comp = _cc_single_task(pd.DataFrame({"u": u, "v": v}))
                losers = comp.loc[comp["id"] != comp["rep"], "id"].to_numpy()
                kept[np.isin(ids, losers)] = 0
            outs.append(pd.DataFrame(
                {id_col: ids, "cluster": np.int64(cl), "kept": kept}))
        return pd.concat(outs, ignore_index=True) if outs else pd.DataFrame(
            {id_col: pd.Series(dtype="int64"),
             "cluster": pd.Series(dtype="int64"),
             "kept": pd.Series(dtype="int64")})

    return bucketed_group_apply(assigned, "cluster", per_bucket,
                                n_buckets=n_buckets)
