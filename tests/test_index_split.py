"""Inverted index (ops/index_text.py) and deterministic hash split
(ops/sample.hash_split)."""

import re

import numpy as np
import pandas as pd

from coherencebot_ray.ops.index_text import build_inverted_index
from coherencebot_ray.ops.sample import _md5_bucket, hash_split


def _mk(df, blocks=3):
    import ray.data as rd

    return rd.from_pandas([d for d in np.array_split(df, blocks) if len(d)])


def test_inverted_index_matches_naive(ray_session):
    docs = pd.DataFrame(
        {
            "doc_id": np.array([3, 1, 7, 2], dtype=np.int64),
            "text": [
                "the cat sat on the mat",
                "a cat and a dog",
                "",
                "Dog DOG dog!",
            ],
        }
    )
    got = (
        build_inverted_index(_mk(docs), n_buckets=4)
        .to_pandas()
        .sort_values("term")
        .reset_index(drop=True)
    )
    naive = {}
    for _, r in docs.iterrows():
        for t in set(re.findall(r"[a-z0-9]+", r["text"].lower())):
            naive.setdefault(t, []).append(int(r["doc_id"]))
    exp = pd.DataFrame(
        sorted(
            (t, len(ids), ",".join(map(str, sorted(ids))))
            for t, ids in naive.items()
        ),
        columns=["term", "df", "postings"],
    )
    exp["df"] = exp["df"].astype(np.int64)
    pd.testing.assert_frame_equal(got, exp)


def test_inverted_index_dedups_within_doc(ray_session):
    docs = pd.DataFrame({"doc_id": np.array([5], dtype=np.int64),
                         "text": ["go go go"]})
    got = build_inverted_index(_mk(docs, blocks=1)).to_pandas()
    assert got["df"].tolist() == [1] and got["postings"].tolist() == ["5"]


def test_hash_split_stable_and_partitioned(ray_session):
    ids = np.arange(2000, dtype=np.int64)
    df = pd.DataFrame({"doc_id": ids, "lang": np.where(ids % 3 == 0, "en", "de")})
    out = hash_split(_mk(df, blocks=5)).to_pandas().sort_values("doc_id")
    # split depends only on the id: re-running over a different
    # partitioning / appended corpus never reassigns a doc
    out2 = hash_split(_mk(df.iloc[:500], blocks=2)).to_pandas().sort_values("doc_id")
    merged = out.merge(out2, on="doc_id", suffixes=("", "_2"))
    assert (merged["split"] == merged["split_2"]).all()
    # proportions near 80/10/10 overall and within each stratum
    frac = out["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.05
    for lang in ("en", "de"):
        f = out[out["lang"] == lang]["split"].value_counts(normalize=True)
        assert abs(f["train"] - 0.8) < 0.08
    # the rule is exactly the md5 bucket rule (SQL mirror)
    b = _md5_bucket(ids)
    exp = np.where(b < 80, "train", np.where(b < 90, "val", "test"))
    assert (out["split"].to_numpy() == exp).all()
