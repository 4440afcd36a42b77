"""Global line-level deduplication (the C4 cross-document span rule,
Raffel et al. 2020 §2.2: "we removed any duplicated spans", applied
here at line granularity like CCNet's paragraph dedup): every
occurrence of a non-empty line AFTER its global first occurrence —
ordered by (doc_id, line_idx) — is removed from its document.

Scale shape, two exchanges:

1. **ids-only winner fold** — the flag pass emits
   (sig = md5(line), doc_id, line_idx) for non-empty lines ONLY (~40
   bytes/line; the line text never enters this exchange); a bucketed
   fold on sig keeps the global minimum (doc_id, line_idx) per sig and
   emits the REST as drop marks. Duplicate-free corpora move marks
   proportional to the duplication rate, not the corpus.
2. **doc-side co-group** — docs (tagged 0, with text) union the drop
   marks (tagged 1) through one bucketed exchange on doc_id; per
   bucket the texts split, marked idxs drop (vectorized anti-join on
   (doc_id, idx)) and lines reassemble by boundary scan. Text moves
   exactly once.

Empty lines never dedup (they are structure, not content) and ride
through reassembly untouched.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def line_dedup(docs_ds, text_col: str = "text", n_buckets: int = 64):
    """Returns a Dataset of (doc_id, text_clean, n_dropped): the corpus
    with every later occurrence of a duplicated non-empty line removed;
    n_dropped = lines removed from that document."""
    from .agg import bucketed_group_apply

    def explode_sigs(df: pd.DataFrame) -> pd.DataFrame:
        """(sig, doc_id, line_idx) for non-empty lines."""
        texts = df[text_col].fillna("")
        lines = texts.str.split("\n")
        counts = lines.str.len().to_numpy(np.int64)
        ids = np.repeat(df["doc_id"].to_numpy(np.int64), counts)
        idx = np.concatenate([np.arange(c, dtype=np.int64) for c in counts]) \
            if counts.sum() else np.empty(0, dtype=np.int64)
        flat = np.concatenate([np.asarray(v, dtype=object) for v in lines]) \
            if counts.sum() else np.empty(0, dtype=object)
        keep = np.fromiter((len(s) > 0 for s in flat), dtype=bool, count=len(flat))
        flat, ids, idx = flat[keep], ids[keep], idx[keep]
        return pd.DataFrame({
            "sig": [hashlib.md5(s.encode()).hexdigest() for s in flat],
            "doc_id": ids,
            "line_idx": idx,
        })

    def drop_marks(b: pd.DataFrame) -> pd.DataFrame:
        """All but the global first (doc_id, line_idx) per sig."""
        if not len(b):
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "line_idx": pd.Series(dtype="int64")})
        b = b.sort_values(["sig", "doc_id", "line_idx"], kind="stable")
        sig_v = b["sig"].to_numpy()
        dup = np.r_[False, sig_v[1:] == sig_v[:-1]]
        d = b[dup]
        return pd.DataFrame({"doc_id": d["doc_id"].to_numpy(np.int64),
                             "line_idx": d["line_idx"].to_numpy(np.int64)})

    marks = bucketed_group_apply(
        docs_ds.map_batches(explode_sigs, batch_format="pandas"),
        "sig", drop_marks, n_buckets=n_buckets,
    )

    def tag_docs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                             "payload": df[text_col].fillna("").to_numpy(object),
                             "line_idx": np.int64(-1), "t": np.int8(0)})

    def tag_marks(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                             "payload": None,
                             "line_idx": df["line_idx"].to_numpy(np.int64),
                             "t": np.int8(1)})

    tagged = docs_ds.map_batches(tag_docs, batch_format="pandas").union(
        marks.map_batches(tag_marks, batch_format="pandas"))

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        docs = g[g["t"] == 0]
        if not len(docs):
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "text_clean": pd.Series(dtype="object"),
                                 "n_dropped": pd.Series(dtype="int64")})
        mk = g[g["t"] == 1]
        lines = docs["payload"].astype(object).str.split("\n")
        counts = lines.str.len().to_numpy(np.int64)
        doc_ids = docs["doc_id"].to_numpy(np.int64)
        ids = np.repeat(doc_ids, counts)
        idx = np.concatenate([np.arange(c, dtype=np.int64) for c in counts]) \
            if counts.sum() else np.empty(0, dtype=np.int64)
        flat = np.concatenate([np.asarray(v, dtype=object) for v in lines]) \
            if counts.sum() else np.empty(0, dtype=object)
        # vectorized 2-column anti-join on (doc_id, line_idx) — no
        # packed-key width limit on lines-per-doc
        if len(mk):
            hit = pd.MultiIndex.from_arrays([ids, idx]).isin(
                pd.MultiIndex.from_arrays(
                    [mk["doc_id"].to_numpy(np.int64),
                     mk["line_idx"].to_numpy(np.int64)]))
        else:
            hit = np.zeros(len(ids), dtype=bool)
        kept, kept_ids = flat[~hit], ids[~hit]
        # boundary-scan reassembly in original order (ids are grouped
        # because the explode preserved doc order)
        bnd = np.r_[0, np.flatnonzero(kept_ids[1:] != kept_ids[:-1]) + 1,
                    len(kept_ids)] if len(kept_ids) else np.array([0])
        texts_by_id = {
            int(kept_ids[s]): "\n".join(kept[s:e])
            for s, e in zip(bnd[:-1], bnd[1:])
        }
        dropped = pd.Series(ids[hit]).value_counts()
        return pd.DataFrame({
            "doc_id": doc_ids,
            "text_clean": [texts_by_id.get(int(i), "") for i in doc_ids],
            "n_dropped": dropped.reindex(doc_ids, fill_value=0)
                                .to_numpy(np.int64),
        })

    return bucketed_group_apply(tagged, "doc_id", rebuild,
                                n_buckets=n_buckets)


def span_dedup(docs_ds, k: int = 8, text_col: str = "text",
               id_col: str = "doc_id", n_buckets: int = 64):
    """Exact duplicate-SPAN removal — the transform half of Lee et al.
    2021 ("Deduplicating Training Data Makes Language Models Better"):
    every k-token span whose exact k-word string occurs anywhere in the
    corpus EARLIER in (doc_id, pos) order marks its k tokens for
    removal; a document's removed region is the UNION of its marked
    windows (overlapping duplicate windows merge, as the paper's
    maximal-substring removal does). The global first occurrence of
    each span always survives. Output text is the kept tokens joined
    by single spaces — token-stream normalization, appropriate for the
    LM-training corpora this op targets. The paper cuts maximal
    repeats >= 50 tokens from a suffix array; fixed-k window coverage
    is the standard streaming approximation (same one as
    ops/dedup.dup_span_counts, whose docstring records the 128-bit
    hashed-exchange deployment layout).

    Returns a Dataset of (doc_id, text_clean, n_removed).

    Scale shape, two exchanges (the span-granular twin of line_dedup
    above): (1) an ids-only winner fold — (span, doc_id, pos) rows
    exchange once on span-hash (O(tokens) rows, like every shingle op);
    all occurrences of a span co-locate, so the global minimum
    (doc_id, pos) is exact in-bucket and only LOSER occurrences leave
    as (doc_id, pos) marks (volume ~ duplication rate, not corpus);
    (2) a doc_id co-group where text moves exactly once and coverage
    resolves vectorized (difference-array over global token offsets,
    cumsum > 0 = covered; no per-token Python)."""
    from .agg import bucketed_group_apply

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        from .dedup import explode_spans

        out = explode_spans(df, k, text_col=text_col, id_col=id_col,
                            with_pos=True)
        out[id_col] = out[id_col].astype(np.int64) if len(out) else \
            out[id_col].astype("int64")
        return out[["span", id_col, "pos"]]

    def loser_marks(b: pd.DataFrame) -> pd.DataFrame:
        """All but the global first (doc_id, pos) per span string."""
        if not len(b):
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "pos": pd.Series(dtype="int64")})
        b = b.sort_values(["span", id_col, "pos"], kind="stable")
        sv = b["span"].to_numpy()
        dup = np.r_[False, sv[1:] == sv[:-1]]
        d = b[dup]
        return pd.DataFrame({id_col: d[id_col].to_numpy(np.int64),
                             "pos": d["pos"].to_numpy(np.int64)})

    marks = bucketed_group_apply(
        docs_ds.map_batches(explode, batch_format="pandas"),
        "span", loser_marks, n_buckets=n_buckets,
    )

    def tag_docs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({id_col: df[id_col].to_numpy(np.int64),
                             "payload": df[text_col].to_numpy(object),
                             "pos": np.int64(-1), "t": np.int8(0)})

    def tag_marks(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({id_col: df[id_col].to_numpy(np.int64),
                             "payload": None,
                             "pos": df["pos"].to_numpy(np.int64),
                             "t": np.int8(1)})

    tagged = docs_ds.map_batches(tag_docs, batch_format="pandas").union(
        marks.map_batches(tag_marks, batch_format="pandas"))

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        docs = g[g["t"] == 0]
        if not len(docs):
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "text_clean": pd.Series(dtype="object"),
                                 "n_removed": pd.Series(dtype="int64")})
        mk = g[g["t"] == 1]
        from .text import ascii_tokens

        words = [ascii_tokens(str(x)) if x is not None else []
                 for x in docs["payload"]]
        lens = np.fromiter((len(w) for w in words), np.int64,
                           count=len(words))
        doc_ids = docs[id_col].to_numpy(np.int64)
        total = int(lens.sum())
        flat = np.empty(total, dtype=object)
        o = 0
        for w in words:
            flat[o:o + len(w)] = w
            o += len(w)
        starts = np.cumsum(lens) - lens
        # coverage union via difference array over global token offsets;
        # every mark window [pos, pos+k) is in-doc by construction
        diff = np.zeros(total + 1, dtype=np.int64)
        if len(mk):
            doc_start = pd.Series(starts, index=doc_ids)
            m0 = (doc_start.reindex(mk[id_col].to_numpy(np.int64))
                  .to_numpy(np.int64) + mk["pos"].to_numpy(np.int64))
            np.add.at(diff, m0, 1)
            np.add.at(diff, m0 + k, -1)
        covered = np.cumsum(diff[:total]) > 0
        ids_flat = np.repeat(doc_ids, lens)
        kept, kept_ids = flat[~covered], ids_flat[~covered]
        bnd = np.r_[0, np.flatnonzero(kept_ids[1:] != kept_ids[:-1]) + 1,
                    len(kept_ids)] if len(kept_ids) else np.array([0])
        texts_by_id = {
            int(kept_ids[s]): " ".join(kept[s:e])
            for s, e in zip(bnd[:-1], bnd[1:])
        }
        removed = pd.Series(ids_flat[covered]).value_counts()
        return pd.DataFrame({
            id_col: doc_ids,
            "text_clean": [texts_by_id.get(int(i), "") for i in doc_ids],
            "n_removed": removed.reindex(doc_ids, fill_value=0)
                                .to_numpy(np.int64),
        })

    return bucketed_group_apply(tagged, id_col, rebuild,
                                n_buckets=n_buckets)
