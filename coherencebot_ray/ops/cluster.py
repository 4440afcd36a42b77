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

    c_fin, ids_fin = cents, cids

    def assign_final(df: pd.DataFrame) -> pd.DataFrame:
        X = np.stack([np.asarray(v, dtype=np.float64) for v in df[vec_col]])
        a = _assign(X, c_fin)
        return pd.DataFrame(
            {id_col: df[id_col].to_numpy(), "cluster": ids_fin[a].astype(np.int64)}
        )

    return embeddings_ds.map_batches(assign_final, batch_format="pandas")
