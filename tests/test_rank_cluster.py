"""BM25 ranking (ops/rank.py) and k-means (ops/cluster.py) vs naive
single-process reference implementations."""

import math
import re

import numpy as np
import pandas as pd

from coherencebot_ray.ops.cluster import kmeans_assign
from coherencebot_ray.ops.rank import bm25_topk


def _mk(df, blocks=4):
    import ray.data as rd

    return rd.from_pandas([d for d in np.array_split(df, blocks) if len(d)])


def _naive_bm25(docs, terms, k1=1.2, b=0.75):
    toks = [re.findall(r"[a-z0-9]+", (t or "").lower()) for t in docs["text"]]
    n = len(toks)
    dl = np.array([len(t) for t in toks], dtype=float)
    avgdl = dl.sum() / n
    scores = np.zeros(n)
    for term in terms:
        tf = np.array([t.count(term) for t in toks], dtype=float)
        df = float((tf > 0).sum())
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        scores += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (dl / avgdl)))
    return scores


def test_bm25_matches_naive(ray_session):
    rng = np.random.default_rng(11)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(60, dtype=np.int64),
            "text": [
                " ".join(rng.choice(vocab, size=rng.integers(3, 40)))
                for _ in range(60)
            ],
        }
    )
    got = bm25_topk(_mk(docs), ["alpha", "gamma"], k=10)
    s = _naive_bm25(docs, ["alpha", "gamma"])
    micro = np.floor(s * 1e6 + 0.5).astype(np.int64)
    exp = (
        pd.DataFrame({"doc_id": docs["doc_id"], "score_micro": micro})
        .sort_values(["score_micro", "doc_id"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_bm25_empty_and_missing_terms(ray_session):
    docs = pd.DataFrame({"doc_id": [0, 1], "text": ["foo bar", ""]})
    out = bm25_topk(_mk(docs, blocks=1), ["nosuchterm"], k=5)
    assert len(out) == 2 and (out["score_micro"] == 0).all()


def _naive_lloyd(X, k, iters):
    cents = X[:k].astype(np.float64)
    labels = np.arange(k)
    for _ in range(iters):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        keep = np.unique(a)
        cents = np.stack([X[a == c].mean(axis=0) for c in keep])
        labels = labels[keep]
    d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return labels[d.argmin(axis=1)]


def test_kmeans_matches_naive(ray_session):
    rng = np.random.default_rng(5)
    X = rng.normal(size=(120, 8)).astype(np.float32)
    # three well-separated blobs
    X[:40] += 8.0
    X[40:80] -= 8.0
    df = pd.DataFrame(
        {"vec_id": np.arange(120, dtype=np.int64), "embedding": list(X)}
    )
    got = (
        kmeans_assign(_mk(df), k=4, iters=3)
        .to_pandas()
        .sort_values("vec_id")["cluster"]
        .to_numpy()
    )
    exp = _naive_lloyd(X.astype(np.float64), 4, 3)
    assert (got == exp).all()


def test_kmeans_empty_cluster_dropped(ray_session):
    # seed vec 1 is a duplicate of vec 0: its cluster empties on the
    # first tie-broken assignment and must disappear from the labels
    X = np.array([[0.0, 0.0], [0.0, 0.0], [10.0, 10.0], [10.1, 10.0]], dtype=np.float32)
    df = pd.DataFrame({"vec_id": np.arange(4, dtype=np.int64), "embedding": list(X)})
    out = kmeans_assign(_mk(df, blocks=1), k=2, iters=2).to_pandas()
    # both seeds are identical, so every vector tie-breaks to cid 0;
    # cluster 1 empties after the first update and its label vanishes
    assert set(out["cluster"]) == {0}


def test_hits_scores_hand_graph(ray_session):
    """2-iteration unnormalized HITS on a hand-computable graph,
    multigraph + pure-source/sink edge cases."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from coherencebot_ray.ops.rank import hits_scores

    # u1 -> {v1, v2}; u2 -> {v1}; u2 -> v1 DUPLICATE edge; u3 -> v3
    edges = pd.DataFrame({
        "src": ["u1", "u1", "u2", "u2", "u3"],
        "dst": ["v1", "v2", "v1", "v1", "v3"],
    })
    # a1 = indeg: v1=3, v2=1, v3=1
    # h1(u1) = a1(v1)+a1(v2) = 4; h1(u2) = 3+3 (two edges) = 6; h1(u3)=1
    # a2(v1) = h1(u1) + 2*h1(u2) = 4+12 = 16; a2(v2) = 4; a2(v3) = 1
    out = (hits_scores(rd.from_pandas(edges).repartition(3), n_buckets=4)
           .to_pandas().sort_values("url").reset_index(drop=True))
    exp = pd.DataFrame({
        "url": ["u1", "u2", "u3", "v1", "v2", "v3"],
        "hub": [4, 6, 1, 0, 0, 0],
        "auth": [0, 0, 0, 16, 4, 1],
    })
    for c in ("hub", "auth"):
        out[c] = out[c].astype(np.int64)
        exp[c] = exp[c].astype(np.int64)
    pd.testing.assert_frame_equal(out, exp)
