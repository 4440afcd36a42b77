"""Data-op correctness: dedup family, knn (incl. IVF recall vs brute),
windows, text analysis, media stubs, cuckoo filter, bucketed agg."""

import numpy as np
import pandas as pd
import pytest

from coherencebot_ray.ops import dedup as dd
from coherencebot_ray.ops import text as tx
from coherencebot_ray.ops.agg import bucketed_sum, stable_bucket
from coherencebot_ray.state.cuckoo import CuckooFilter, ShardedSeen


# ---------------- pure kernels (no Ray) ----------------


def test_minhash_similarity_estimate():
    h = dd.MinHasher(n_perm=128)
    a = "the quick brown fox jumps over the lazy dog and runs far away today"
    b = "the quick brown fox jumps over the lazy dog and runs far away now"
    c = "completely different content about database systems and query engines"
    sig_a, sig_b, sig_c = h.signature(a), h.signature(b), h.signature(c)
    est_ab = (sig_a == sig_b).mean()
    est_ac = (sig_a == sig_c).mean()
    true_ab = dd.jaccard(a, b)
    assert abs(est_ab - true_ab) < 0.2
    assert est_ac < 0.1


def test_simhash_properties():
    a = dd.simhash64("policy report about climate change in europe today")
    b = dd.simhash64("policy report about climate change in europe tomorrow")
    c = dd.simhash64("xylophone quantum zebra unrelated words entirely")
    assert dd.hamming64(int(a), int(b)) < dd.hamming64(int(a), int(c))
    # identical text -> identical hash, deterministic
    assert dd.simhash64("same text here") == dd.simhash64("same text here")


def test_simhash_band_blocking():
    h = dd.simhash64("some document body")
    bands = dd.simhash_bands(h)
    assert len(bands) == 4
    # reconstruct
    recon = sum(b << (16 * i) for i, b in enumerate(bands))
    assert recon == int(h)


def test_text_ops():
    s = pd.Series(["hello world  foo", "", "a b"])
    assert tx.token_count(s).tolist() == [3, 0, 2]
    fp = tx.fingerprint(pd.Series(["Hello, World!", "hello world", "other"]))
    assert fp.iloc[0] == fp.iloc[1]
    assert fp.iloc[0] != fp.iloc[2]
    lang = tx.langid(pd.Series(["the cat and the dog of a to", "der hund und die katze ist nicht"]))
    assert lang.tolist() == ["en", "de"]
    rh = tx.rolling_hashes(pd.Series([" ".join("abcdefghij"), "short"]), window=4)
    assert len(rh.iloc[0]) == 10 - 4 + 1
    assert len(rh.iloc[1]) == 1


def test_cuckoo_filter_membership():
    cf = CuckooFilter(capacity=10_000)
    keys = [f"http://h{i}.com/p{i}" for i in range(5_000)]
    assert cf.add_many(keys) == 5_000
    assert cf.contains_many(keys).all()
    other = [f"http://other{i}.net/x" for i in range(5_000)]
    fp_rate = cf.contains_many(other).mean()
    assert fp_rate < 0.02  # 16-bit fingerprints: ~0.1% expected
    # serialization round-trip
    cf2 = CuckooFilter.from_bytes(cf.to_bytes())
    assert cf2.contains_many(keys).all()
    assert "http://h1.com/p1" in cf2


def test_sharded_seen():
    s = ShardedSeen(num_partitions=4, capacity_per_shard=4096)
    parts = np.array([0, 1, 2, 3, 0, 1])
    urls = [f"u{i}" for i in range(6)]
    s.add(parts, urls)
    assert s.contains(parts, urls).all()
    assert not s.contains(np.array([2]), ["u0"]).any()  # wrong shard


def test_stable_bucket_deterministic():
    a = stable_bucket(pd.Series(["x", "y", "z"]), 16)
    b = stable_bucket(pd.Series(["x", "y", "z"]), 16)
    assert (a == b).all()
    assert (a < 16).all()


# ---------------- Ray pipelines ----------------


def test_bucketed_sum_matches_pandas(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {"k": rng.integers(0, 1000, 20_000), "v": rng.integers(0, 100, 20_000)}
    )
    out = bucketed_sum(rd.from_pandas(df), "k", ["v"]).to_pandas().sort_values("k")
    exp = df.groupby("k", as_index=False)["v"].sum().sort_values("k")
    assert (out["k"].to_numpy() == exp["k"].to_numpy()).all()
    assert (out["v"].to_numpy() == exp["v"].to_numpy()).all()


def test_exact_dedup_pipeline(ray_session):
    import ray.data as rd

    docs = pd.DataFrame(
        {"doc_id": [1, 2, 3, 4, 5], "text": ["aa", "bb", "aa", "cc", "bb"]}
    )
    out = dd.exact_dedup(rd.from_pandas(docs)).to_pandas().sort_values("doc_id")
    assert out.set_index("doc_id")["dup_of"].to_dict() == {3: 1, 5: 2}


def test_minhash_lsh_finds_neardups(ray_session):
    import ray.data as rd

    base = "policy analysis report on climate economics with detailed regional data and methods"
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                base,
                base + " appendix",  # near-dup of 1
                "totally different text about biology and oceans with many unique words",
                base,  # exact dup of 1
            ],
        }
    )
    out = dd.minhash_lsh_pairs(rd.from_pandas(docs), threshold=0.5).to_pandas()
    pairs = set(map(tuple, out[["a", "b"]].to_numpy()))
    assert (1, 4) in pairs
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_minhash_lsh_id_join_path_matches_text_path(ray_session):
    """The with_text=False (doc_id hash-join verify) layout must return
    exactly the same pairs as the default text-riding layout."""
    import ray.data as rd

    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(200)]
    texts = []
    for i in range(40):
        base = " ".join(rng.choice(words, size=30, replace=False))
        texts.append(base)
        if i % 4 == 0:  # inject a near-dup of every 4th doc
            texts.append(base + " extra tail words appended")
    docs = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    ds = rd.from_pandas(docs)

    def norm(df):
        return sorted(map(tuple, df[["a", "b"]].to_numpy()))

    out_text = dd.minhash_lsh_pairs(ds, threshold=0.5, with_text=True).to_pandas()
    out_join = dd.minhash_lsh_pairs(ds, threshold=0.5, with_text=False).to_pandas()
    assert norm(out_text) == norm(out_join)
    assert len(out_text) > 0
    jt = dict(zip(map(tuple, out_text[["a", "b"]].to_numpy()), out_text["jaccard"]))
    jj = dict(zip(map(tuple, out_join[["a", "b"]].to_numpy()), out_join["jaccard"]))
    assert jt == jj


def test_ngram_jaccard_exact_vs_bruteforce(ray_session):
    """The prefix-filtered similarity self-join must return EXACTLY the
    brute-force all-pairs Jaccard result (no LSH-style recall loss), in
    both verify layouts, including tie-prone sizes around the threshold."""
    import ray.data as rd

    rng = np.random.default_rng(11)
    words = [f"w{i}" for i in range(150)]
    texts = []
    for i in range(35):
        base_words = list(rng.choice(words, size=25, replace=False))
        texts.append(" ".join(base_words))
        if i % 3 == 0:  # near-dup: drop 2 words, append 1
            texts.append(" ".join(base_words[:-2] + ["tail"]))
        if i % 7 == 0:  # exact dup
            texts.append(" ".join(base_words))
    texts.append("")  # empty doc: no shingles, never a candidate
    texts.append("one two")  # short doc: single whole-text shingle
    texts.append("one two")  # its exact dup (jaccard 1.0)
    docs = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    ds = rd.from_pandas(docs)

    thresh = 0.6
    brute = {}
    for i in range(len(texts)):
        if not texts[i]:
            continue
        for j in range(i + 1, len(texts)):
            if not texts[j]:
                continue
            jac = dd.jaccard(texts[i], texts[j])
            if jac >= thresh:
                brute[(i, j)] = jac  # raw double: op emits the unrounded ratio

    for with_text in (True, False):
        out = dd.ngram_jaccard_pairs(ds, threshold=thresh, with_text=with_text).to_pandas()
        got = dict(zip(map(tuple, out[["a", "b"]].to_numpy()), out["jaccard"]))
        assert got == brute, f"with_text={with_text}"
    assert len(brute) >= 12  # the fixture actually exercises the join


def test_simhash_pipeline(ray_session):
    import ray.data as rd

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["same words here exactly", "same words here exactly", "other thing"],
        }
    )
    out = dd.simhash_pairs(rd.from_pandas(docs)).to_pandas()
    pairs = set(map(tuple, out[["a", "b"]].to_numpy()))
    assert (1, 2) in pairs


def test_knn_ivf_recall_vs_brute(ray_session):
    import ray.data as rd

    from coherencebot_ray.ops.knn import knn_brute, knn_ivf

    rng = np.random.default_rng(3)
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(300),
            "embedding": [rng.standard_normal(32).astype(np.float32) for _ in range(300)],
        }
    )
    ds = rd.from_pandas(emb)
    brute = knn_brute(ds, [0, 1, 2], k=10).to_pandas()
    ivf = knn_ivf(ds, [0, 1, 2], k=10, n_centroids=8, nprobe=4).to_pandas()
    recall = 0.0
    for q in (0, 1, 2):
        b = set(brute[brute["query_id"] == q]["neighbor_id"])
        v = set(ivf[ivf["query_id"] == q]["neighbor_id"])
        recall += len(b & v) / len(b)
    assert recall / 3 >= 0.5  # nprobe=4 of 8 centroids


def test_knn_pq_recall_and_structure(ray_session):
    """PQ-ADC ANN: planted tight clusters must be retrieved first; recall
    vs exact brute force stays usable; dim % m enforced."""
    import ray.data as rd

    from coherencebot_ray.ops.knn import knn_brute, knn_pq

    rng = np.random.default_rng(7)
    # 10 planted cluster centers, 30 members each, tiny jitter
    centers = rng.standard_normal((10, 32)) * 5.0
    emb = pd.DataFrame({
        "vec_id": np.arange(300),
        "embedding": [
            (centers[i % 10] + rng.standard_normal(32) * 0.05).astype(np.float32)
            for i in range(300)
        ],
    })
    ds = rd.from_pandas(emb)
    pq = knn_pq(ds, [0, 1, 2], k=10, m=4, ksub=16, iters=2).to_pandas()
    # self excluded, ranks dense 1..10 per query
    for q in (0, 1, 2):
        g = pq[pq["query_id"] == q]
        assert q not in set(g["neighbor_id"])
        assert sorted(g["rank"]) == list(range(1, 11))
        # planted structure: every retrieved neighbor is a same-cluster
        # member (ids congruent mod 10) — clusters are far apart vs the
        # PQ quantization error
        assert set(g["neighbor_id"] % 10) == {q % 10}
    brute = knn_brute(ds, [0, 1, 2], k=10).to_pandas()
    recall = np.mean([
        len(set(brute[brute["query_id"] == q]["neighbor_id"])
            & set(pq[pq["query_id"] == q]["neighbor_id"])) / 10
        for q in (0, 1, 2)
    ])
    # within a 30-member tight cluster the exact top-10 is ~arbitrary at
    # PQ resolution (random same-cluster pick = 10/29 ≈ 0.34), and brute
    # ranks by cosine while ADC ranks by L2 — the load-bearing check is
    # the cluster-membership assertion above; recall just guards against
    # gross breakage
    assert recall >= 0.3
    with pytest.raises(ValueError):
        knn_pq(ds, [0], k=5, m=5)  # 32 % 5 != 0


def test_sliding_windows(ray_session):
    import ray.data as rd

    from coherencebot_ray.ops.window import sliding_window_counts

    ev = pd.DataFrame(
        {
            "event_id": [1, 2],
            "ts": pd.to_datetime(["2024-01-01 00:10:00", "2024-01-01 00:50:00"]),
            "user_id": [1, 1],
            "value": [1.0, 1.0],
        }
    )
    out = sliding_window_counts(rd.from_pandas(ev), window_s=3600, slide_s=900).to_pandas()
    # each event covers 4 sliding windows
    assert out["n_events"].sum() == 8


def test_media_stub_and_frame_sampler():
    from coherencebot_ray.ops.media import DecodeUnavailable, FrameSampler, MediaFeatureExtractor, real_decode

    df = pd.DataFrame({"doc_id": ["a", "b"], "media": [b"x" * 100, b"y" * 7]})
    feats = MediaFeatureExtractor()(df)
    assert feats["n_bytes"].tolist() == [100, 7]
    assert (feats["width"] == 64 + feats["n_bytes"] % 577).all()
    frames = FrameSampler(stride=2)(feats)
    assert (frames["frame_idx"] % 2 == 0).all()
    with pytest.raises(DecodeUnavailable):
        real_decode(b"payload")


def test_probe_image_headers():
    """Real container-header decode (no codec libs): PNG/GIF/JPEG/BMP
    dimensions from crafted byte headers."""
    from coherencebot_ray.ops.media import probe_image

    png = (b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR"
           + (640).to_bytes(4, "big") + (480).to_bytes(4, "big") + b"\x08\x06" + b"\x00" * 10)
    assert probe_image(png) == ("png", 640, 480)

    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little") + b"\x00" * 6
    assert probe_image(gif) == ("gif", 320, 200)

    bmp = (b"BM" + b"\x00" * 16 + (800).to_bytes(4, "little")
           + (-600).to_bytes(4, "little", signed=True) + b"\x00" * 8)
    assert probe_image(bmp) == ("bmp", 800, 600)

    # JPEG: SOI + APP0 segment + SOF0 frame header
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof0 = (b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
            + (1080).to_bytes(2, "big") + (1920).to_bytes(2, "big") + b"\x03" + b"\x00" * 9)
    assert probe_image(b"\xff\xd8" + app0 + sof0) == ("jpeg", 1920, 1080)

    assert probe_image(b"plain text payload here") is None
    assert probe_image(None) is None


def test_probe_webp_and_audio_headers():
    from coherencebot_ray.ops.media import probe_audio, probe_image

    # WebP VP8X: canvas 24-bit LE minus one at offsets 24/27
    vp8x = (b"RIFF" + (100).to_bytes(4, "little") + b"WEBP" + b"VP8X"
            + (10).to_bytes(4, "little") + b"\x00" * 4
            + (639).to_bytes(3, "little") + (479).to_bytes(3, "little") + b"\x00" * 8)
    assert probe_image(vp8x) == ("webp", 640, 480)
    # WebP lossy VP8: 14-bit dims at +26/+28
    vp8 = (b"RIFF" + (100).to_bytes(4, "little") + b"WEBP" + b"VP8 "
           + (50).to_bytes(4, "little") + b"\x00" * 6
           + (320).to_bytes(2, "little") + (240).to_bytes(2, "little") + b"\x00" * 8)
    assert probe_image(vp8) == ("webp", 320, 240)

    # WAV: fmt chunk -> (wav, sample_rate, channels)
    fmt = (b"fmt " + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")
           + (2).to_bytes(2, "little") + (44100).to_bytes(4, "little") + b"\x00" * 8)
    wav = b"RIFF" + (1000).to_bytes(4, "little") + b"WAVE" + fmt
    assert probe_audio(wav) == ("wav", 44100, 2)

    # MP3: ID3v2 tag (syncsafe length 0) + MPEG-1 Layer III frame sync,
    # 44.1 kHz, stereo
    id3 = b"ID3\x03\x00\x00\x00\x00\x00\x00"
    frame = bytes([0xFF, 0xFB, 0x90, 0x00])  # sync, MPEG-1 L3, sr idx 0, stereo
    assert probe_audio(id3 + frame) == ("mp3", 44100, 2)
    # mono mode (mode bits 11)
    frame_mono = bytes([0xFF, 0xFB, 0x90, 0xC0])
    assert probe_audio(id3 + frame_mono) == ("mp3", 44100, 1)

    assert probe_audio(b"plain text, not audio") is None
    assert probe_audio(None) is None


def test_audio_probe_through_extractor():
    from coherencebot_ray.ops.media import MediaFeatureExtractor

    fmt = (b"fmt " + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")
           + (1).to_bytes(2, "little") + (16000).to_bytes(4, "little") + b"\x00" * 8)
    wav = b"RIFF" + (1000).to_bytes(4, "little") + b"WAVE" + fmt
    df = pd.DataFrame({"doc_id": [1, 2], "media": [wav, b"opaque blob payload"]})
    out = MediaFeatureExtractor()(df).set_index("doc_id")
    assert out.loc[1, "kind"] == "audio"
    assert out.loc[1, "format"] == "wav"
    assert out.loc[1, "sample_rate"] == 16000 and out.loc[1, "channels"] == 1
    assert out.loc[2, "sample_rate"] == 0  # fake-decode path retained


def test_media_probe_through_extractor():
    from coherencebot_ray.ops.media import MediaFeatureExtractor

    png = (b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR"
           + (64).to_bytes(4, "big") + (32).to_bytes(4, "big") + b"\x00" * 12)
    df = pd.DataFrame({"doc_id": [1, 2], "media": [png, b"not-an-image"]})
    out = MediaFeatureExtractor()(df).set_index("doc_id")
    assert out.loc[1, "format"] == "png"
    assert out.loc[1, "width"] == 64 and out.loc[1, "height"] == 32
    assert out.loc[2, "format"] is None  # fake-decode path retained


def test_embedding_neardup_exact_and_lsh(ray_session):
    """Exact block cross-join vs LSH bucketed path: LSH must find every
    engineered high-sim near-dup (recall at the tuned threshold) and
    emit only verified pairs (exact precision)."""
    import ray.data as rd

    from coherencebot_ray.ops.knn import embedding_neardup_lsh, embedding_neardup_pairs

    rng = np.random.default_rng(7)
    base = rng.standard_normal((120, 16))
    # 10 engineered near-dups: tiny perturbations of the first 10 rows
    dups = base[:10] + 0.01 * rng.standard_normal((10, 16))
    M = np.vstack([base, dups])
    df = pd.DataFrame({"vec_id": np.arange(len(M)), "embedding": list(M.astype(np.float32))})
    ds = rd.from_pandas(df)

    exact = embedding_neardup_pairs(ds, threshold=0.98).to_pandas()
    pairs_exact = set(zip(exact["a"], exact["b"]))
    # all 10 engineered pairs found by the exact path
    assert {(i, 120 + i) for i in range(10)} <= pairs_exact

    lsh = embedding_neardup_lsh(ds, threshold=0.98).to_pandas()
    pairs_lsh = set(zip(lsh["a"], lsh["b"]))
    assert pairs_lsh <= pairs_exact                  # exact precision
    recall = len(pairs_lsh & pairs_exact) / len(pairs_exact)
    assert recall >= 0.99                            # tuned for s>=0.95


def test_gopher_quality_rules():
    """Gopher quality rules (Rae et al. 2021 §A2, integer-arithmetic
    form): word-count band, mean-word-length band, alpha-word fraction,
    stopword floor."""
    import pandas as pd

    from coherencebot_ray.ops.text import gopher_quality

    good = "the quick brown fox jumps over that lazy dog of mine " * 5  # 55 words
    too_short = "the cat sat on that mat of his"
    no_stops = "alpha beta gamma delta epsilon zeta " * 10
    numbers = "123 456 789 " * 20 + "the of that be and with have to " * 3
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [good, too_short, no_stops, numbers],
    })
    out = gopher_quality(df).set_index("doc_id")
    assert out.loc[1, "keep"] == 1
    assert out.loc[2, "keep"] == 0          # below min word count
    assert out.loc[3, "keep"] == 0          # no Gopher stopwords
    assert out.loc[4, "keep"] == 0          # alpha fraction too low
    assert out.loc[1, "word_count"] == 55
    assert out.loc[1, "stop_hits"] >= 2
    # empty text never crashes, never keeps
    empty = gopher_quality(pd.DataFrame({"doc_id": [9], "text": [""]}))
    assert empty.iloc[0]["keep"] == 0 and empty.iloc[0]["word_count"] == 0


def test_exact_dedup_normalized(ray_session):
    """normalize=True folds case + whitespace runs before hashing, so
    reformatted copies dedup; the plain pass does not."""
    import pandas as pd
    import ray.data as rd

    from coherencebot_ray.ops.dedup import exact_dedup

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["Hello   World", "hello world", "different text"],
    })
    plain = exact_dedup(rd.from_pandas(docs)).to_pandas()
    assert len(plain) == 0
    norm = exact_dedup(rd.from_pandas(docs), normalize=True).to_pandas()
    assert norm[["doc_id", "dup_of"]].values.tolist() == [[2, 1]]


def test_c4_page_filters():
    """C4 rules (Raffel et al. 2020 §2.2): sentence floor, lorem-ipsum
    and curly-brace rejection."""
    import pandas as pd

    from coherencebot_ray.ops.text import c4_page_filters

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "One. Two. Three! Four? Five. Plenty of sentences here.",
            "Just two. Sentences here.",
            "Lorem Ipsum dolor. Sit. Amet. Consectetur. Adipiscing. Elit.",
            "code { display: none; } one. two. three. four. five.",
        ],
    })
    out = c4_page_filters(df).set_index("doc_id")
    assert out.loc[1, "keep"] == 1 and out.loc[1, "n_sentences"] == 6
    assert out.loc[2, "keep"] == 0          # < 5 sentences
    assert out.loc[3, "keep"] == 0 and out.loc[3, "has_lorem"] == 1
    assert out.loc[4, "keep"] == 0 and out.loc[4, "has_brace"] == 1


def test_image_resize_stage(ray_session):
    """Resize plumbing: real header probes for source dims, aspect-fit
    target dims (never upscaled), deterministic payload sized w*h,
    non-images dropped; runs as an actor-pool map_batches stage."""
    import struct

    import pandas as pd
    import pytest
    import ray.data as rd

    from coherencebot_ray.ops.media import DecodeUnavailable, ImageResizeStage

    def png(w, h):
        return (b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR"
                + struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00" + b"x" * 16)

    docs = pd.DataFrame({
        "doc_id": ["big", "small", "junk"],
        "media": [png(1024, 512), png(100, 50), b"not an image"],
    })
    stage = ImageResizeStage(max_w=256, max_h=256)
    out = (rd.from_pandas(docs)
           .map_batches(stage, batch_format="pandas", concurrency=2)
           .to_pandas().set_index("doc_id"))
    assert list(out.index) == ["big", "small"]          # junk dropped
    assert (out.loc["big", "width"], out.loc["big", "height"]) == (256, 128)
    assert (out.loc["small", "width"], out.loc["small", "height"]) == (100, 50)  # no upscale
    raster = out.loc["big", "resized"]
    assert bytes(raster[:4]) == b"RAW0" and len(raster) == 12 + 256 * 128
    # determinism: same payload -> same bytes
    out2 = stage(docs)
    assert bytes(out2.set_index("doc_id").loc["big", "resized"]) == bytes(raster)
    with pytest.raises(DecodeUnavailable):
        ImageResizeStage(use_real_decoder=True)(docs)


def test_bpe_token_count():
    """BPE-ish pre-tokenizer (GPT-2 pattern, ASCII classes): pieces for
    contractions, letter runs, digit runs, punctuation runs."""
    import pandas as pd

    from coherencebot_ray.ops.text import bpe_token_count, token_count

    s = pd.Series(["I'll pay $42.50 today!", "", "hello world"])
    # I |'ll| pay| $|42|.|50| today|!  -> 9 pieces
    assert bpe_token_count(s).tolist() == [9, 0, 2]
    assert token_count(s).tolist() == [4, 0, 2]


def test_pack_shuffled_matches_sequential(ray_session):
    """Hash-shuffled packing equals the sequential cumsum over docs
    sorted by (md5(id), id), and differs from id-order packing."""
    import hashlib

    import ray.data as rd

    from coherencebot_ray.ops.pack import pack_shuffled

    n = 64
    docs = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": [" ".join(["w"] * (1 + (i * 13) % 37)) for i in range(n)],
    })
    budget = 50
    rows = []
    for i, t in zip(docs["doc_id"], docs["text"]):
        key = int(hashlib.md5(str(int(i)).encode()).hexdigest()[:16], 16)
        rows.append((key, int(i), len(t.split())))
    rows.sort()
    run = 0
    want = {}
    for _, i, tok in rows:
        want[i] = run // budget
        run += tok
    out = (pack_shuffled(rd.from_pandas(docs).repartition(8), budget=budget,
                         range_shift=58)
           .to_pandas().sort_values("doc_id"))
    assert dict(zip(out["doc_id"], out["shard"])) == want
    # the shuffle actually reorders: shard sequence is not monotone in id
    assert not (np.diff(out["shard"].to_numpy()) >= 0).all()


def test_curriculum_bins_quartiles(ray_session):
    """Quantile binning: PERCENTILE_DISC cut points over the exact
    value histogram; values EQUAL to a cut stay in the lower bin."""
    import ray.data as rd

    from coherencebot_ray.ops.sample import curriculum_bins

    # values 1..8: cuts = percentile_disc(.25/.5/.75) = 2, 4, 6
    df = pd.DataFrame({"doc_id": np.arange(8, dtype=np.int64),
                       "value": np.arange(1, 9, dtype=np.int64)})

    def value_pre(d):
        return d[["doc_id", "value"]]

    out = (curriculum_bins(rd.from_pandas(df).repartition(3), value_pre)
           .to_pandas().sort_values("doc_id"))
    # 1,2 -> bin0 ; 3,4 -> bin1 ; 5,6 -> bin2 ; 7,8 -> bin3
    assert out["bin"].tolist() == [0, 0, 1, 1, 2, 2, 3, 3]


def test_token_kl_drift_matches_naive(ray_session):
    """Integer-layout KL(slice || corpus) equals the naive per-token
    computation; an identical-distribution slice scores ~0 and a skewed
    slice scores higher."""
    import math
    from collections import Counter

    import ray.data as rd

    from coherencebot_ray.ops.vocab import token_kl_drift

    docs = pd.DataFrame({
        "source": ["a"] * 4 + ["b"] * 4 + [None],
        "text": ["x y", "x z", "x y", "x z",     # a: x4 y2 z2
                 "x x", "x x", "x x", "q q",     # b: x6 q2 (skewed)
                 "x r"],                          # null source: kept as a
                                                  # group (SQL NULL parity)
    })
    out = token_kl_drift(rd.from_pandas(docs).repartition(3),
                         group_col="source").set_index("source")
    assert None in out.index  # null slice reported, not dropped

    L = lambda x: int(math.floor(math.log(x) * 1e6 + 0.5))
    corpus = Counter()
    slices = {}
    for g, sub in docs.groupby("source", dropna=False):
        c = Counter(" ".join(sub["text"]).split())
        slices[None if pd.isna(g) else g] = c
        corpus.update(c)
    n_tot = sum(corpus.values())
    for g, c in slices.items():
        n_g = sum(c.values())
        want = sum(n * (L(n) - L(n_g) - L(corpus[t]) + L(n_tot))
                   for t, n in c.items())
        assert out.loc[g, "kl_num"] == want
        assert out.loc[g, "n_tokens"] == n_g
    assert out.loc["b", "kl"] > out.loc["a", "kl"] > 0


def test_char_entropy_matches_naive():
    """Vectorized char-histogram entropy equals the per-doc Counter
    computation (including empty docs and the integer ent_num layout)."""
    import math
    from collections import Counter

    from coherencebot_ray.ops.text import char_entropy

    texts = ["aab", "", "zzzz", "abcd", "héllo héllo"]
    out = char_entropy(pd.DataFrame({"text": texts}))
    for i, t in enumerate(texts):
        c = Counter(t)
        ent_num = sum(n * int(math.floor(math.log(n) * 1e6 + 0.5))
                      for n in c.values())
        assert out.loc[i, "n_chars"] == len(t)
        assert out.loc[i, "distinct_chars"] == len(c)
        assert out.loc[i, "ent_num"] == ent_num
        if len(t):
            want = math.log(len(t)) - ent_num / (len(t) * 1e6)
            assert abs(out.loc[i, "entropy"] - want) < 1e-12


def test_containment_pairs_asymmetric(ray_session):
    """Directed containment: a short doc fully inside a long one hits
    (short -> long) but NOT the reverse (low C(long, short)), a pair of
    near-identical docs hits both directions, unrelated docs none."""
    import ray.data as rd

    from coherencebot_ray.ops.dedup import containment_pairs

    base = " ".join(f"tok{i}" for i in range(40))
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            " ".join(f"tok{i}" for i in range(10)),      # 1: prefix of 2
            base,                                         # 2: superset
            base,                                         # 3: exact twin of 2
            " ".join(f"other{i}" for i in range(30)),     # 4: unrelated
            "",                                           # 5: empty
        ],
    })
    out = (
        containment_pairs(rd.from_pandas(docs), threshold=0.9)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    got = set(zip(out["a"], out["b"]))
    # doc1 has 8 shingles, all in doc2/doc3 -> C=1.0 directed
    assert got == {(1, 2), (1, 3), (2, 3), (3, 2)}
    assert (out.loc[(out["a"] == 1) & (out["b"] == 2),
                    "containment"] == 1.0).all()


def test_interleaved_costs_pack_and_media_groups(ray_session):
    """Zero-copy span ops over a hand-built list<struct> table: token
    accounting (media = flat 256), prefix-sum shards, and cross-doc
    media-ref groups (same ref twice in one doc counts once)."""
    import pyarrow as pa
    import ray.data as rd

    from coherencebot_ray.model import SPAN_TYPE
    from coherencebot_ray.ops.interleaved import (
        interleaved_costs, interleaved_pack, media_ref_groups)

    def mk(doc_id, spans):
        return {"doc_id": doc_id, "spans": [
            {"kind": k, "text": t, "media_ref": r, "offset": j}
            for j, (k, t, r) in enumerate(spans)]}

    rows = [
        mk(1, [("text", "a b c", ""), ("media", "", "img1"),
               ("text", "d e", "")]),
        mk(2, [("media", "", "img1"), ("media", "", "img2")]),
        mk(3, [("text", "x", "")]),
        mk(4, [("media", "", "img2"), ("media", "", "img2")]),
    ]
    schema = pa.schema([("doc_id", pa.int64()),
                        ("spans", pa.list_(SPAN_TYPE))])
    ds = rd.from_arrow(pa.Table.from_pylist(rows, schema=schema))

    c = interleaved_costs(ds).to_pandas().sort_values("doc_id")
    assert c["text_tokens"].tolist() == [5, 0, 1, 0]
    assert c["media_spans"].tolist() == [1, 2, 0, 2]
    assert c["cost"].tolist() == [261, 512, 1, 512]

    ds2 = rd.from_arrow(pa.Table.from_pylist(rows, schema=schema))
    p = (interleaved_pack(ds2, budget=300, range_size=2)
         .to_pandas().sort_values("doc_id"))
    # starts: 0, 261, 773, 774 -> // 300 = 0, 0, 2, 2
    assert p["shard"].tolist() == [0, 0, 2, 2]

    ds3 = rd.from_arrow(pa.Table.from_pylist(rows, schema=schema))
    m = (media_ref_groups(ds3).to_pandas()
         .sort_values("media_ref").reset_index(drop=True))
    assert m["media_ref"].tolist() == ["img1", "img2"]
    assert m["n_docs"].tolist() == [2, 2]
    assert m["canonical"].tolist() == [1, 2]


def test_weighted_sample_topk_matches_sequential(ray_session):
    """E-S weighted top-k over many blocks equals the sequential
    computation (block-local partial top-k never drops a winner)."""
    import hashlib
    import math

    import ray.data as rd

    from coherencebot_ray.ops.sample import weighted_sample_topk

    n = 200
    docs = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": ["x" * (1 + (i * 37) % 500) for i in range(n)],
    })
    expect = []
    for i, t in zip(docs["doc_id"], docs["text"]):
        w = len(t) + 1
        h = int(hashlib.md5(str(int(i)).encode()).hexdigest()[:16], 16)
        u = max(h, 1) / 2.0 ** 64
        expect.append((math.log(u) / w, int(i), w))
    expect.sort(key=lambda r: (-r[0], r[1]))
    want = sorted((i, w) for _, i, w in expect[:25])

    ds = rd.from_pandas(docs).repartition(16)
    out = weighted_sample_topk(ds, k=25).sort_values("doc_id")
    assert list(zip(out["doc_id"], out["w"])) == want


def test_semdedup_within_cluster_keep_min(ray_session):
    """SemDeDup: two separated k-means clusters; exact-direction twins
    inside a cluster collapse to the min id, cross-cluster and
    below-threshold cosines survive."""
    import ray.data as rd

    from coherencebot_ray.ops.cluster import semdedup

    emb = pd.DataFrame({
        "vec_id": [0, 1, 2, 3, 4],
        "embedding": [[10.0, 0.0], [0.0, 10.0], [11.0, 0.0],
                      [0.0, 11.0], [7.0, 7.5]],
    })
    out = (
        semdedup(rd.from_pandas(emb), k=2, iters=1, tau=0.99, n_buckets=4)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert out["vec_id"].tolist() == [0, 1, 2, 3, 4]
    assert out["cluster"].tolist() == [0, 1, 0, 1, 1]
    # 2 dups 0 (cos=1), 3 dups 1 (cos=1); 4 is ~0.73 to its cluster-mates
    assert out["kept"].tolist() == [1, 1, 0, 0, 1]


def test_connected_components_clusters(ray_session):
    """Distributed min-label components over near-dup pairs: a 4-chain,
    a triangle and a 2-pair resolve to their min-id representative; the
    checksum fixpoint stops before max_iters."""
    import ray.data as rd

    from coherencebot_ray.ops.dedup import connected_components

    pairs = pd.DataFrame({
        # chain 7-3-9-12 (diameter 3), triangle 20-21-22, pair 40-41
        "a": [7, 3, 9, 20, 21, 20, 40],
        "b": [3, 9, 12, 21, 22, 22, 41],
    })
    expect = {7: 3, 3: 3, 9: 3, 12: 3,
              20: 20, 21: 20, 22: 20,
              40: 40, 41: 40}
    # small-graph fast path (single-task numpy union)
    out = (
        connected_components(rd.from_pandas(pairs), n_buckets=4)
        .to_pandas().set_index("id")["rep"].to_dict()
    )
    assert out == expect
    # large-graph iterative path forced via small_graph_edges=0
    out_loop = (
        connected_components(rd.from_pandas(pairs), n_buckets=4,
                             small_graph_edges=0)
        .to_pandas().set_index("id")["rep"].to_dict()
    )
    assert out_loop == expect


def test_pack_by_token_budget_prefix_sum(ray_session):
    """Distributed two-pass range prefix sum: shard boundaries match the
    sequential cumsum exactly, including docs straddling a boundary
    (shard decided by START offset) and sparse/non-contiguous ids."""
    import ray.data as rd

    from coherencebot_ray.ops.pack import pack_by_token_budget

    ids = [1, 5, 9, 100, 101, 300]       # sparse across ranges (size 4)
    texts = ["a b c", "d e", "f", "g h i j", "k", "l m"]  # 3,2,1,4,1,2
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids, "text": texts}))
    out = (
        pack_by_token_budget(ds, budget=4, range_size=4, n_buckets=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # cumsum starts: 0,3,5,6,10,11 -> //4 = 0,0,1,1,2,2
    assert out["tokens"].tolist() == [3, 2, 1, 4, 1, 2]
    assert out["shard"].tolist() == [0, 0, 1, 1, 2, 2]


def test_vocab_topk_crosses_buckets(ray_session):
    """Global top-k is exact even when candidate tokens hash to
    different buckets; ties break on token asc at the k boundary."""
    import ray.data as rd

    from coherencebot_ray.ops.vocab import vocab_topk

    docs = pd.DataFrame({
        "text": ["alpha alpha alpha beta beta gamma",
                 "beta delta delta delta delta GAMMA gamma",
                 "epsilon zeta zeta"],
    })
    out = vocab_topk(rd.from_pandas(docs), k=3, n_buckets=4)
    assert list(out["token"]) == ["delta", "alpha", "beta"]
    assert list(out["cnt"]) == [4, 3, 3]  # beta beats gamma (3) on tie? no:
    # alpha=3, beta=3, gamma=3 (case-folded), delta=4 -> tie at k=3
    # breaks alphabetically: alpha then beta win, gamma drops


def test_grouped_int_quantiles_exact(ray_session):
    """percentile_disc parity with a brute-force reference on a skewed
    multimodal distribution, grouped and ungrouped."""
    import ray.data as rd

    from coherencebot_ray.ops.vocab import grouped_int_quantiles

    rng = np.random.RandomState(7)
    vals = np.concatenate([rng.randint(0, 10, 500),
                           rng.randint(100, 1000, 499), [10_000]])
    langs = np.where(np.arange(1000) % 3 == 0, "en", "fr")
    df = pd.DataFrame({"lang": langs, "v": vals})

    def pre(b):
        return pd.DataFrame({"lang": b["lang"].to_numpy(),
                             "value": b["v"].to_numpy(dtype=np.int64)})

    ps = (0.25, 0.5, 0.9, 0.99)
    out = grouped_int_quantiles(
        rd.from_pandas(df), pre, ps=ps, group_col="lang"
    ).set_index(["lang", "p"])

    import math

    for lang in ("en", "fr"):
        s = np.sort(df[df["lang"] == lang]["v"].to_numpy())
        for p in ps:
            expect = s[max(1, math.ceil(p * len(s) - 1e-9)) - 1]
            assert out.loc[(lang, p), "value"] == expect, (lang, p)


def test_knn_lsh_recall_vs_brute(ray_session):
    """knn_lsh: every returned neighbor is a true candidate re-ranked
    exactly; with enough tables the top-1 matches brute force for most
    queries (recall property, seeded)."""
    import ray.data as rd

    from coherencebot_ray.ops.knn import knn_brute, knn_lsh

    rng = np.random.RandomState(3)
    base = rng.randn(8, 16)
    # 200 vectors clustered around 8 anchors -> high-sim neighbors exist
    X = np.repeat(base, 25, axis=0) + 0.1 * rng.randn(200, 16)
    df = pd.DataFrame({"vec_id": np.arange(200),
                       "embedding": [r.astype(np.float64) for r in X]})
    ds = rd.from_pandas(df)
    qids = [0, 25, 50, 75]
    lsh = knn_lsh(ds, qids, k=5, n_tables=12, n_bits=6, dim=16).to_pandas()
    brute = knn_brute(ds, qids, k=5).to_pandas()
    b1 = brute[brute["rank"] == 1].set_index("query_id")["neighbor_id"]
    l1 = lsh[lsh["rank"] == 1].set_index("query_id")["neighbor_id"]
    hits = sum(int(l1.get(q, -1) == b1[q]) for q in qids)
    assert hits >= 3  # high-sim top-1 survives bucketing
    # determinism across runs
    lsh2 = knn_lsh(ds, qids, k=5, n_tables=12, n_bits=6, dim=16).to_pandas()
    pd.testing.assert_frame_equal(
        lsh.sort_values(["query_id", "rank"]).reset_index(drop=True),
        lsh2.sort_values(["query_id", "rank"]).reset_index(drop=True))


def test_decontaminate(ray_session):
    """n-gram decontamination: a train doc sharing an n-gram with eval
    flags; disjoint docs don't; short docs (< n tokens) never flag."""
    import ray.data as rd

    from coherencebot_ray.ops.decontaminate import decontaminate

    ev = rd.from_pandas(pd.DataFrame({
        "doc_id": [100],
        "text": ["the quick brown fox jumps over the lazy dog tonight"]}))
    tr = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            "prefix words the quick brown fox jumps over the end",  # shares 7-gram
            "completely different content with no overlap at all here",
            "short doc",
        ]}))
    out = decontaminate(tr, ev, n=7).to_pandas().set_index("doc_id")
    assert out.loc[1, "contaminated"] == 1
    assert out.loc[2, "contaminated"] == 0
    assert out.loc[3, "contaminated"] == 0


def test_decontaminate_frac(ray_session):
    """Graded decontamination: hit counts are exact window counts, the
    fraction is the floor micro-ratio, and short docs report 0/0/0."""
    import ray.data as rd

    from coherencebot_ray.ops.decontaminate import decontaminate_frac

    ev = rd.from_pandas(pd.DataFrame({
        "doc_id": [100],
        "text": ["a b c d e f g h"]}))  # grams (n=3): 6 windows
    tr = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            # 8 tokens -> 6 windows; 'a b c','b c d' hit (2/6)
            "a b c d x y z w",
            "q r s t u v w x",  # 6 windows, 0 hits
            "a b",              # < n tokens -> 0 windows
        ]}))
    out = (decontaminate_frac(tr, ev, n=3).to_pandas()
           .set_index("doc_id"))
    assert out.loc[1, "n_grams"] == 6 and out.loc[1, "n_hits"] == 2
    assert out.loc[1, "frac_micro"] == 2 * 1_000_000 // 6
    assert out.loc[2, "n_hits"] == 0 and out.loc[2, "frac_micro"] == 0
    assert (out.loc[3, ["n_grams", "n_hits", "frac_micro"]] == 0).all()


def test_dup_span_counts(ray_session):
    """Cross-doc duplicate k-gram spans vs a brute-force reference."""
    import ray.data

    k = 3
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4, 5],
        "text": [
            "a b c d e",          # shares "a b c"/"b c d" with doc 1
            "x a b c d y",        # shares with doc 0
            "one two",            # < k words -> 0 spans
            "",                   # empty -> 0 spans
            "p q r p q r p q",    # self-repeat: "p q r" twice, "q r p" twice
            "unique words only here",
        ],
    })

    def brute(df):
        from collections import Counter
        spans = []
        for _, r in df.iterrows():
            w = r["text"].split()
            spans.append([(r["doc_id"], " ".join(w[i:i + k]))
                          for i in range(max(len(w) - k + 1, 0))])
        cnt = Counter(s for doc in spans for _, s in doc)
        rows = []
        for doc_id, doc in zip(df["doc_id"], spans):
            rows.append({"doc_id": doc_id, "n_spans": len(doc),
                         "n_dup": sum(1 for _, s in doc if cnt[s] > 1)})
        return pd.DataFrame(rows)

    expect = brute(docs).sort_values("doc_id").reset_index(drop=True)
    got = (
        dd.dup_span_counts(ray.data.from_pandas(docs), k=k, n_buckets=4)
        .to_pandas()[["doc_id", "n_spans", "n_dup"]]
        .astype(np.int64)
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, expect.astype(np.int64))
    # self-repeat doc: every span duplicated except the lone "r p q"
    row4 = got[got.doc_id == 4].iloc[0]
    assert row4.n_spans == 6 and row4.n_dup > 0

    # the 128-bit-hash exchange layout must produce identical counts
    hashed = (
        dd.dup_span_counts(ray.data.from_pandas(docs), k=k, n_buckets=4,
                           hash_spans=True)
        .to_pandas()[["doc_id", "n_spans", "n_dup"]]
        .astype(np.int64)
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(hashed, expect.astype(np.int64))


def test_novel_span_counts(ray_session):
    """Order-aware novelty vs a brute-force corpus-order scan."""
    import ray.data

    k = 3
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": [
            "a b c d e",           # all novel (first doc)
            "x a b c d y",         # "a b c"/"b c d" seen in doc 0
            "one two",             # < k tokens -> zeros
            "p q r p q r p q",     # self-repeats: later windows not novel
            "a b c d e",           # exact twin -> nothing novel
        ],
    })

    def brute(df):
        seen, rows = set(), []
        for _, r in df.sort_values("doc_id").iterrows():
            w = r["text"].split()
            n_spans = max(len(w) - k + 1, 0)
            novel = 0
            for i in range(n_spans):
                g = " ".join(w[i:i + k])
                if g not in seen:
                    seen.add(g)
                    novel += 1
            rows.append({"doc_id": r["doc_id"], "n_spans": n_spans,
                         "n_novel": novel})
        return pd.DataFrame(rows).astype(np.int64)

    expect = brute(docs).sort_values("doc_id").reset_index(drop=True)
    cols = ["doc_id", "n_spans", "n_novel"]
    for hashed in (False, True):
        got = (dd.novel_span_counts(ray.data.from_pandas(docs), k=k,
                                    n_buckets=4, hash_spans=hashed)
               .to_pandas()[cols].astype(np.int64)
               .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, expect)
    e = expect.set_index("doc_id")
    assert e.loc[0, "n_novel"] == 3          # all first occurrences
    assert e.loc[1, "n_novel"] == 2          # only the x/y edges
    assert e.loc[3, "n_novel"] == 3          # p q r / q r p / r p q once each
    assert e.loc[4, "n_novel"] == 0          # exact twin


def test_softdedup_commonness(ray_session):
    """SoftDeDup reweighting vs a brute-force reference, both layouts."""
    import ray.data

    from coherencebot_ray.ops.softdedup import softdedup_commonness

    n = 3
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": [
            "a b c d e",           # shares "a b c"/"b c d" with doc 1
            "x a b c d y",
            "one two",             # < n tokens -> zeros
            "p q r p q r p q",     # self-repeated grams
            "a b c d e",           # exact twin of doc 0
        ],
    })

    def brute(df):
        from collections import Counter
        per_doc = []
        for _, r in df.iterrows():
            w = r["text"].split()
            per_doc.append([" ".join(w[i:i + n])
                            for i in range(max(len(w) - n + 1, 0))])
        cnt = Counter(g for doc in per_doc for g in doc)
        rows = []
        for doc_id, grams in zip(df["doc_id"], per_doc):
            cm = sum(cnt[g] for g in grams)
            rows.append({"doc_id": doc_id, "n_grams": len(grams),
                         "commonness": cm,
                         "weight_micro": len(grams) * 1_000_000 // cm if cm else 0})
        return pd.DataFrame(rows).astype(np.int64)

    expect = brute(docs).sort_values("doc_id").reset_index(drop=True)
    cols = ["doc_id", "n_grams", "commonness", "weight_micro"]
    for hashed in (False, True):
        got = (softdedup_commonness(ray.data.from_pandas(docs), n=n,
                                    n_buckets=4, hash_spans=hashed)
               .to_pandas()[cols].astype(np.int64)
               .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, expect)
    # twin docs down-weighted vs the all-unique doc
    w = expect.set_index("doc_id")["weight_micro"]
    assert w[0] == w[4] and w[0] < 1_000_000
    # doc 1 shares grams but also has unique ones -> strictly between
    assert w[0] < w[1] < 1_000_000
    # zero-gram doc present with zeros
    assert (expect.set_index("doc_id").loc[2] == 0).all()


def test_hll_distinct_accuracy_and_merge(ray_session):
    """HLL sketch: estimate within theoretical error at real cardinality,
    register merge across batches exact, small-range correction lands."""
    import ray.data
    from coherencebot_ray.ops import sketch as sk

    rng = np.random.RandomState(3)
    # group A: 30k distinct values (raw-estimator regime at m=1024),
    # group B: 200 distinct repeated 15x (small-range / correction regime)
    a_vals = [f"value-{i}" for i in range(30_000)]
    b_vals = [f"dup-{i % 200}" for i in range(3_000)]
    df = pd.DataFrame({
        "grp": ["A"] * len(a_vals) + ["B"] * len(b_vals),
        "v": a_vals + b_vals,
    }).sample(frac=1.0, random_state=rng).reset_index(drop=True)

    ds = ray.data.from_pandas(df).repartition(8)  # force cross-batch merge
    out = sk.hll_distinct(ds, "grp", "v").to_pandas().set_index("grp")
    est_a = out.loc["A", "hll_raw_est"]
    assert abs(est_a - 30_000) / 30_000 < 0.12  # ~3 sigma at m=1024

    regs = sk.hll_registers(ds, "grp", "v").to_pandas()
    rb = regs[regs["grp"] == "B"]["rho"].to_numpy()
    corr = sk.corrected_estimate(rb)
    assert abs(corr - 200) / 200 < 0.12

    # single-batch registers == multi-batch registers (merge is exact)
    regs1 = sk.hll_registers(ray.data.from_pandas(df), "grp", "v").to_pandas()
    key = lambda r: r.sort_values(["grp", "idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(key(regs), key(regs1))


def test_countmin_sketch(ray_session):
    """CMS: estimates are exact for our counts when no collision, always
    >= truth, and merge correctly across batches."""
    import ray.data as rd

    from coherencebot_ray.ops.sketch import cms_cells, cms_estimate

    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(40)]
    freqs = {w: int(rng.integers(1, 50)) for w in words}
    rows = []
    for w, f in freqs.items():
        rows.extend({"text": w} for _ in range(f))
    rng.shuffle(rows)
    df = pd.DataFrame(rows)
    ds = rd.from_pandas([d for d in np.array_split(df, 5) if len(d)])

    def vc(b):
        c = b["text"].value_counts()
        return pd.DataFrame({"value": c.index.to_numpy(), "cnt": c.to_numpy()})

    cells = cms_cells(ds, vc).to_pandas()
    est = cms_estimate(cells, words).set_index("term")["est_cnt"]
    for w, f in freqs.items():
        assert est[w] >= f  # CMS never underestimates
    # cells hold the full mass once per row
    per_row = cells.groupby("row")["cnt"].sum()
    assert (per_row == len(df)).all()
    # absent term estimates 0 unless a bucket collides (allow either,
    # but it must still be <= the heaviest colliding mass)
    ghost = cms_estimate(cells, ["neverseen"])["est_cnt"][0]
    assert 0 <= ghost <= per_row.iloc[0]


def test_bloom_filter(ray_session):
    """Bloom: no false negatives ever; build is batch-order invariant;
    probe flags match a single-process reference filter."""
    import ray.data as rd

    from coherencebot_ray.ops.sketch import (
        BLOOM_K, BLOOM_M, _bloom_positions, bloom_build, bloom_probe)

    rng = np.random.default_rng(7)
    members = rng.choice(100_000, size=400, replace=False).astype(np.int64)
    df = pd.DataFrame({"v": np.repeat(members, 3)})  # dups across batches
    ds = rd.from_pandas([d for d in np.array_split(df.sample(frac=1, random_state=1), 6) if len(d)])

    bits = bloom_build(ds, "v")
    # reference: single-pass bit set
    ref_bits = np.unique(_bloom_positions(members))
    assert np.array_equal(bits, np.sort(ref_bits))

    probe_vals = np.concatenate([members[:50], rng.choice(100_000, size=200).astype(np.int64) + 100_000])
    pds = rd.from_pandas(pd.DataFrame({"v": probe_vals}))
    out = bloom_probe(pds, "v", bits).to_pandas().set_index("v")["bloom_hit"]
    # every member hits (no false negatives)
    assert (out.loc[members[:50]] == 1).all()
    # non-members (disjoint range) mostly miss; any hit is a legal FP
    mask = np.zeros(BLOOM_M, dtype=bool)
    mask[bits] = True
    expect = mask[_bloom_positions(probe_vals)].all(axis=1).astype(np.int64)
    assert np.array_equal(out.to_numpy(), expect) or np.array_equal(
        out.sort_index().to_numpy(),
        pd.Series(expect, index=probe_vals).sort_index().to_numpy())


def test_tfidf_topk_vs_naive(ray_session):
    """Distributed TF-IDF top-k matches a single-process reference,
    including df merging across batches and tie-breaks."""
    import math
    import re
    from collections import Counter

    import ray.data as rd

    from coherencebot_ray.ops.rank import tfidf_topk_terms

    rng = np.random.default_rng(11)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    docs = [" ".join(rng.choice(vocab, size=rng.integers(3, 30)))
            for _ in range(60)] + ["", "alpha alpha alpha"]
    df = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    n_docs = len(df)
    ds = rd.from_pandas([d for d in np.array_split(df, 7) if len(d)])

    out = tfidf_topk_terms(ds, n_docs=n_docs, k=2).to_pandas()
    out = out.sort_values(["doc_id", "score_micro", "term"],
                          ascending=[True, False, True]).reset_index(drop=True)

    # naive reference
    tok = {i: re.findall(r"[a-z0-9]+", t.lower()) for i, t in zip(df["doc_id"], df["text"])}
    dfreq = Counter()
    for i, ts in tok.items():
        dfreq.update(set(ts))
    rows = []
    for i, ts in tok.items():
        tf = Counter(ts)
        scored = []
        for term, f in tf.items():
            idf = math.log((n_docs + 1.0) / (dfreq[term] + 1.0)) + 1.0
            scored.append((math.floor(f * idf * 1e6 + 0.5), term, f, dfreq[term]))
        scored.sort(key=lambda x: (-x[0], x[1]))
        for s, term, f, d in scored[:2]:
            rows.append({"doc_id": i, "term": term, "tf": f, "df": d, "score_micro": s})
    ref = pd.DataFrame(rows).sort_values(
        ["doc_id", "score_micro", "term"], ascending=[True, False, True]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out.astype({"tf": "int64", "df": "int64", "score_micro": "int64"}),
        ref.astype({"tf": "int64", "df": "int64", "score_micro": "int64"}))


def test_curate_corpus_composed_semantics(ray_session):
    """The composed curation pipeline (ops/corpus.curate_corpus) applies
    every stage: eval-slice exclusion, langid, Gopher quality,
    8-gram decontamination vs the eval slice, exact-dedup keep-first,
    and prefix-sum shard packing over the survivors."""
    import ray.data as rd

    from coherencebot_ray.ops.corpus import curate_corpus

    en_base = "the cat and the dog have been with us to show that all of " * 5
    eval_text = "zebra quokka lemur walrus otter badger ferret stoat mink vole"
    docs = {
        0: eval_text,                       # eval slice (0 % 37 == 0)
        1: en_base + "uniqueone",           # survivor
        2: en_base + "uniquetwo",           # survivor
        3: en_base + "uniqueone",           # exact dup of 1 -> dropped
        4: en_base + "zebra quokka lemur walrus otter badger ferret stoat",
        #  ^ shares an 8-gram with the eval doc -> contaminated
        5: "le chat et la tortue est dans les jardins un une des",  # fr
        6: "short text",                    # Gopher fail (wc < 50)
        7: en_base + "uniqueseven",         # survivor
    }
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    ds = rd.from_pandas([d for d in np.array_split(df, 3) if len(d)])

    out = (curate_corpus(ds, lang="en", gram_n=8, budget=100,
                         range_size=4, n_buckets=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    assert out["doc_id"].tolist() == [1, 2, 7]
    assert out["tokens"].tolist() == [71, 71, 71]
    # start offsets 0, 71, 142 -> // 100 = 0, 0, 1
    assert out["shard"].tolist() == [0, 0, 1]


def test_line_dedup_global_first_wins(ray_session):
    """C4-style global line dedup: first occurrence by (doc_id,
    line_idx) survives, later copies drop (cross-doc AND in-doc),
    empty lines never dedup, fully-deduped docs stay as rows."""
    import ray.data as rd

    from coherencebot_ray.ops.linededup import line_dedup

    docs = pd.DataFrame({"doc_id": [0, 1, 2, 3, 4], "text": [
        "alpha\nbeta\ngamma",
        "beta\ndelta\n\nepsilon",    # beta lost to doc 0; empty kept
        "alpha\nalpha\nzeta",        # cross-doc and in-doc dup
        "",                          # single empty line -> unchanged
        "gamma\nbeta",               # every line a later dup
    ]})
    ds = rd.from_pandas([d for d in np.array_split(docs, 2) if len(d)])
    out = (line_dedup(ds, n_buckets=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["text_clean"].tolist() == [
        "alpha\nbeta\ngamma", "delta\n\nepsilon", "zeta", "", ""]
    assert out["n_dropped"].tolist() == [0, 1, 2, 0, 2]


def test_chunk_docs_line_boundaries(ray_session):
    """Doc-local line-boundary chunking: chunk = start offset // budget
    (a line straddling the boundary stays in its start chunk); empty
    docs yield one zero-token chunk row."""
    import ray.data as rd

    from coherencebot_ray.ops.pack import chunk_docs

    docs = pd.DataFrame({"doc_id": [7, 8],
                         "text": ["a b c\nd e\nf g h i\nj", ""]})
    out = (chunk_docs(rd.from_pandas(docs), budget=5)
           .to_pandas().sort_values(["doc_id", "chunk"])
           .reset_index(drop=True))
    # doc 7 line tokens 3,2,4,1 -> starts 0,3,5,9 -> chunks 0,0,1,1
    assert out.to_dict("records") == [
        {"doc_id": 7, "chunk": 0, "n_lines": 2, "tokens": 5},
        {"doc_id": 7, "chunk": 1, "n_lines": 2, "tokens": 5},
        {"doc_id": 8, "chunk": 0, "n_lines": 1, "tokens": 0},
    ]


def test_mixture_sample_rates(ray_session):
    """Mixture resampling: rate//100 guaranteed copies plus a
    deterministic hash-chosen extra for the remainder; 0 drops the
    source; copies are stable under repartitioning."""
    import ray.data as rd

    from coherencebot_ray.ops.sample import _md5_bucket, mixture_sample

    df = pd.DataFrame({"doc_id": range(20),
                       "source": ["a"] * 10 + ["b"] * 5 + ["c"] * 5})
    rates = {"a": 250, "b": 0}
    out = (mixture_sample(rd.from_pandas([p for p in np.array_split(df, 3)]),
                          rates, default_pct=100)
           .to_pandas().sort_values(["doc_id", "copy"]).reset_index(drop=True))
    assert not (out["source"] == "b").any()
    c_rows = out[out["source"] == "c"]
    assert c_rows["doc_id"].tolist() == list(range(15, 20))  # 100% = 1 copy
    a_counts = out[out["source"] == "a"].groupby("doc_id")["copy"].count()
    expect = 2 + (_md5_bucket(np.arange(10)) < 50)
    assert a_counts.reindex(range(10), fill_value=0).tolist() == expect.tolist()
    # copy indices are 0..n-1 per doc
    assert (out.groupby("doc_id")["copy"].max() + 1
            == out.groupby("doc_id")["copy"].count()).all()


def test_bigram_nll_brute_force(ray_session):
    """Integer-exact add-one bigram NLL vs a naive reference (train on
    all docs, keep all bigrams): term = L(cb+1) - L(cu+V), docs with
    <2 tokens score 0."""
    import math
    from collections import Counter

    import ray.data as rd

    from coherencebot_ray.ops.lm import bigram_nll

    texts = ["the cat sat on the mat",
             "the cat ran",
             "a dog sat on the mat",
             "x"]
    df = pd.DataFrame({"doc_id": range(4), "text": texts})
    out = (bigram_nll(rd.from_pandas([p for p in np.array_split(df, 2)]),
                      sample_pct=100, min_count=1, n_buckets=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    toks = [t.split() for t in texts]
    uni = Counter(w for t in toks for w in t)
    bi = Counter((t[i], t[i + 1]) for t in toks for i in range(len(t) - 1))
    V = len(uni)
    L = lambda x: math.floor(math.log(x) * 1e6 + 0.5)
    exp = []
    for t in toks:
        pairs = [(t[i], t[i + 1]) for i in range(len(t) - 1)]
        exp.append((len(pairs),
                    sum(L(uni[a] + V) - L(bi[(a, b)] + 1) for a, b in pairs)))
    assert list(zip(out["n_bigrams"], out["nll_micro"])) == exp
    assert out.loc[3, "n_bigrams"] == 0 and out.loc[3, "nll_micro"] == 0


def test_curation_ops_degenerate_inputs(ray_session):
    """Review-found edge cases stay fixed: an empty LM model (no bigram
    survives sampling/pruning), an eval slice with no full n-gram, and
    a document with more lines than the old packed-key width."""
    import ray.data as rd

    from coherencebot_ray.ops.corpus import curate_corpus
    from coherencebot_ray.ops.linededup import line_dedup
    from coherencebot_ray.ops.lm import bigram_nll

    # every doc is 1 token -> zero bigrams anywhere -> all-zero scores
    out = bigram_nll(
        rd.from_pandas(pd.DataFrame({"doc_id": range(4),
                                     "text": ["x", "y", "z", "w"]})),
        sample_pct=100, n_buckets=2).to_pandas()
    assert out["n_bigrams"].tolist() == [0, 0, 0, 0]
    assert out["nll_micro"].tolist() == [0, 0, 0, 0]

    # eval doc shorter than gram_n -> empty gram set, nothing flagged
    en = "the cat and the dog have been with us to show that all of " * 5
    out = curate_corpus(
        rd.from_pandas(pd.DataFrame({"doc_id": [0, 1],
                                     "text": ["tiny eval", en + "uno"]})),
        lang="en", gram_n=8, budget=100, range_size=4, n_buckets=4
    ).to_pandas()
    assert out["doc_id"].tolist() == [1]

    # > 2^20 lines in one doc: capless (doc_id, line_idx) anti-join
    n = (1 << 20) + 64
    big = "\n".join(f"l{i % 3}" for i in range(n))
    out = line_dedup(
        rd.from_pandas(pd.DataFrame({"doc_id": [5], "text": [big]})),
        n_buckets=2).to_pandas()
    assert int(out["n_dropped"][0]) == n - 3


def test_pair_topk_respects_doc_boundaries(ray_session):
    """Adjacent-pair counts (BPE merge statistic): pairs never cross
    document boundaries; global top-k exact across buckets with the
    cnt-desc/pair-asc tie-break."""
    import ray.data as rd

    from coherencebot_ray.ops.vocab import pair_topk

    docs = pd.DataFrame({
        "text": ["a b a b a", "b A b", "", None, "c", "a b"],
    })
    # pairs: doc0 -> a b, b a, a b, b a; doc1 -> b a, a b; doc5 -> a b
    # totals: 'a b' = 4, 'b a' = 3. No 'a b' pair crossing doc4->doc5
    # ('c' then 'a') and none from the 1-token / empty docs.
    out = pair_topk(rd.from_pandas(docs).repartition(3), k=5, n_buckets=4)
    assert list(out["pair"]) == ["a b", "b a"]
    assert list(out["cnt"]) == [4, 3]


def test_pmi_topk_matches_brute(ray_session):
    """PMI collocations vs a brute-force reference: marginals joined
    across two bucketed exchanges, min_count filter, exact float order."""
    import math

    import ray.data as rd

    from coherencebot_ray.ops.vocab import pmi_topk

    docs = pd.DataFrame({
        "text": ["new york new york city", "new york is big", "",
                 "the cat sat on the mat", "the cat ran", None,
                 "new york new jersey", "cat sat here"],
    })

    def brute(texts, k, min_count):
        from collections import Counter
        uni, pairs = Counter(), Counter()
        for t in texts:
            toks = (t or "").lower().split()
            uni.update(toks)
            pairs.update(zip(toks, toks[1:]))
        W, T = sum(uni.values()), sum(pairs.values())
        rows = []
        for (a, b), cnt in pairs.items():
            if cnt < min_count:
                continue
            pmi = (((math.log(cnt) + 2.0 * math.log(W)) - math.log(T))
                   - math.log(uni[a])) - math.log(uni[b])
            rows.append({"a": a, "b": b, "cnt": cnt, "ca": uni[a],
                         "cb": uni[b],
                         "pmi_micro": math.floor(pmi * 1e6 + 0.5)})
        df = pd.DataFrame(rows)
        return (df.sort_values(["pmi_micro", "a", "b"],
                               ascending=[False, True, True])
                .head(k).reset_index(drop=True))

    expect = brute(docs["text"], k=5, min_count=2)
    got = pmi_topk(rd.from_pandas(docs).repartition(3), k=5,
                   min_count=2, n_buckets=4)
    for c in ("cnt", "ca", "cb", "pmi_micro"):
        expect[c] = expect[c].astype(np.int64)
    pd.testing.assert_frame_equal(got, expect)
    # the tight pair ("cat sat": 2 of cat's 3 occurrences) outranks the
    # loose one ("new york": 4 pairings but 5x4 marginal mass)
    pairs = list(zip(got["a"], got["b"]))
    assert pairs.index(("cat", "sat")) < pairs.index(("new", "york"))
    nyrow = got[(got["a"] == "new") & (got["b"] == "york")].iloc[0]
    assert (nyrow["cnt"], nyrow["ca"], nyrow["cb"]) == (4, 5, 4)
    # min_count filters singletons like ("york", "city")
    assert not ((got["a"] == "york") & (got["b"] == "city")).any()


def test_hashed_classifier_matches_naive():
    """Per-token md5 -> bucket -> Knuth weight sum, vs a per-row
    reference computation; empty/null docs score 0 with label 1."""
    import hashlib as _hl

    from coherencebot_ray.ops.text import HASHED_DIM, hashed_classifier

    docs = pd.DataFrame({
        "text": ["The quick Brown fox", "over over over", "", None,
                 "punct! 123 mixed-CASE tokens here"],
    })
    out = hashed_classifier(docs)

    def wt(tok: str) -> int:
        h = int.from_bytes(_hl.md5(tok.encode()).digest()[:8], "big")
        return ((h % HASHED_DIM) * 2654435761) % (1 << 32) % 2001 - 1000

    for i, t in enumerate(docs["text"]):
        toks = (t or "").lower().split()
        assert out["score"][i] == sum(wt(x) for x in toks)
        assert out["n_tokens"][i] == len(toks)
        assert out["label"][i] == (1 if out["score"][i] >= 0 else 0)


def test_span_dedup_union_and_first_survival(ray_session):
    """Duplicate k-span removal: global first occurrence survives,
    later windows remove with coverage UNION (overlapping duplicate
    windows merge), same-doc internal repeats drop, and the output is
    space-joined kept tokens."""
    import ray.data as rd

    from coherencebot_ray.ops.linededup import span_dedup

    # k=3. doc0 holds the firsts. doc1 repeats "a b c" twice with an
    # overlap-adjacent "b c d" (union covers positions 2..6 of doc1).
    # doc2 repeats its own span internally (first in-doc occurrence
    # survives). doc3 is clean. doc4 empty.
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": ["a b c d e",
                 "x y a b c a b c d z",
                 "p q r s p q r",
                 "m n o",
                 None],
    })
    out = (span_dedup(rd.from_pandas(docs).repartition(2), k=3,
                      n_buckets=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # doc0: all spans are global firsts -> untouched (space-joined)
    assert out["text_clean"][0] == "a b c d e"
    assert out["n_removed"][0] == 0
    # doc1: marks at pos 2 ("a b c"), 5 ("a b c"), 6 ("b c d") ->
    # covered union = [2,5) + [5,8) + [6,9) = positions 2..8
    assert out["text_clean"][1] == "x y z"
    assert out["n_removed"][1] == 7
    # doc2: "p q r" repeats at pos 4 (first at pos 0 in the same doc)
    assert out["text_clean"][2] == "p q r s"
    assert out["n_removed"][2] == 3
    assert out["text_clean"][3] == "m n o"
    assert out["text_clean"][4] == "" and out["n_removed"][4] == 0


def test_dsir_weights_match_naive(ray_session):
    """DSIR log importance ratio vs a brute-force per-doc reference:
    same md5 bucketing, same add-one integer-L terms; target docs
    excluded from the output."""
    import hashlib as _hl
    import math

    import ray.data as rd

    from coherencebot_ray.ops.lm import DSIR_DIM, dsir_weights

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 37, 75, 5],
        "text": ["the target like text", "the raw like text",
                 "completely different words here", None,
                 "the target like text", ""],
    })
    out = (dsir_weights(rd.from_pandas(docs).repartition(3))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(out["doc_id"]) == [1, 2, 5, 75]  # 0 and 37 are target

    def feats(t):
        toks = (t or "").lower().split()
        return toks + [a + " " + b for a, b in zip(toks, toks[1:])]

    def bucket(f):
        return int.from_bytes(_hl.md5(f.encode()).digest()[:8], "big") % DSIR_DIM

    def L(x):
        return math.floor(math.log(x) * 1e6 + 0.5)

    t_b, r_b = {}, {}
    for _, row in docs.iterrows():
        side = t_b if row["doc_id"] % 37 == 0 else r_b
        for f in feats(row["text"]):
            b = bucket(f)
            side[b] = side.get(b, 0) + 1
    shift = L(sum(r_b.values()) + DSIR_DIM) - L(sum(t_b.values()) + DSIR_DIM)
    for _, row in out.iterrows():
        fs = feats(docs.set_index("doc_id")["text"][row["doc_id"]])
        want = sum(L(t_b.get(bucket(f), 0) + 1) - L(r_b.get(bucket(f), 0) + 1)
                   for f in fs) + len(fs) * shift
        assert row["logw_micro"] == want and row["n_features"] == len(fs)
    # the target-like raw doc must outscore the dissimilar one
    s = out.set_index("doc_id")["logw_micro"]
    assert s[75] > s[2]


def test_resumable_map_shards(ray_session, tmp_path):
    """Kill-and-resume semantics: a failing first run commits only the
    shards that succeeded; the re-run processes ONLY the missing ones;
    the combined output equals a clean full run."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from coherencebot_ray.ops.shards import (read_shards,
                                             resumable_map_shards)

    ind = tmp_path / "in"
    ind.mkdir()
    files = []
    for k in range(4):
        p = str(ind / f"shard-{k}.parquet")
        pq.write_table(pa.table({
            "doc_id": list(range(k * 10, k * 10 + 10)),
            "text": [f"doc {i} text" for i in range(k * 10, k * 10 + 10)],
        }), p)
        files.append(p)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": df["doc_id"],
                             "n_tokens": df["text"].str.count(r"\S+")})

    def flaky(df: pd.DataFrame) -> pd.DataFrame:
        if int(df["doc_id"].iloc[0]) // 10 in (1, 3):
            raise RuntimeError("injected shard failure")
        return score(df)

    out = str(tmp_path / "out")
    try:
        resumable_map_shards(files, out, flaky, concurrency=1)
    except Exception:
        pass  # the failing shards abort the first run
    first = resumable_map_shards(files, out, score, concurrency=1)
    assert first["skipped"] == 2 and first["processed"] == 2
    again = resumable_map_shards(files, out, score, concurrency=1)
    assert again["skipped"] == 4 and again["processed"] == 0
    got = read_shards(out).to_pandas().sort_values("doc_id")
    assert list(got["doc_id"]) == list(range(40))
    assert (got["n_tokens"] == 3).all()


def test_dsir_select_quantile_cutoff(ray_session):
    """Selection keeps exactly the docs at/above the PERCENTILE_DISC(p)
    cutoff of their own weight distribution (ties keep)."""
    import ray.data as rd

    from coherencebot_ray.ops.lm import dsir_select, dsir_weights

    docs = pd.DataFrame({
        "doc_id": list(range(12)),
        "text": [f"target text alpha w{i % 4}" for i in range(12)],
    })
    # doc 0 is target (0 % 37 == 0); 11 raw docs in 4 weight classes
    w = (dsir_weights(rd.from_pandas(docs)).to_pandas()
         .sort_values("doc_id"))
    sel = (dsir_select(rd.from_pandas(docs), p=0.5).to_pandas()
           .sort_values("doc_id"))
    vals = np.sort(w["logw_micro"].to_numpy(np.int64))
    import math
    cutoff = vals[math.ceil(0.5 * len(vals)) - 1]  # PERCENTILE_DISC
    want = set(w[w["logw_micro"] >= cutoff]["doc_id"])
    assert set(sel["doc_id"]) == want and len(want) >= len(vals) // 2


def test_datacard_ops(ray_session):
    """distinct-n diversity and cross-source overlap vs hand counts;
    null-source rows group in diversity but never pair in overlap."""
    import ray.data as rd

    from coherencebot_ray.ops.datacard import distinct_ngrams, source_overlap

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "source": ["a", "a", "b", None],
        "text": ["x y z x y z",     # trigrams: xyz yzx zxy xyz -> 4 grams 3 distinct
                 "x y z",           # xyz -> 1 gram
                 "p q r s t u v w x y z",  # shares no trigram with a? 'x y z' yes!
                 "x y z"],
    })
    div = distinct_ngrams(rd.from_pandas(docs).repartition(2), n=3)
    d = {r["source"]: (r["n_grams"], r["n_distinct"]) for _, r in div.iterrows()}
    assert d["a"] == (5, 3)      # doc0: 4 grams {xyz,yzx,zxy}; doc1: xyz
    assert d["b"] == (9, 9)
    assert d[None] == (1, 1)
    # overlap at n=3: sources a and b share exactly {x y z}; None never pairs
    ov = source_overlap(rd.from_pandas(docs).repartition(2), n=3)
    assert len(ov) == 1
    assert ov.iloc[0]["src_a"] == "a" and ov.iloc[0]["src_b"] == "b"
    assert ov.iloc[0]["shared"] == 1


def test_exact_dedup_keep_best_policy(ray_session):
    """Keep-best keeps the LONGEST original (not the first-seen): doc 2
    ('A  B', 4 chars) beats doc 1 ('a b', 3 chars) in the same
    normalized group; keep-first would keep doc 1."""
    import ray.data as rd

    from coherencebot_ray.ops.dedup import exact_dedup, exact_dedup_keep_best

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["a b", "A  B", "unique", "a b"],
    })
    best = (exact_dedup_keep_best(rd.from_pandas(docs).repartition(2))
            .to_pandas().sort_values("doc_id"))
    assert list(best["doc_id"]) == [1, 4]
    assert list(best["dup_of"]) == [2, 2]
    first = (exact_dedup(rd.from_pandas(docs).repartition(2), normalize=True)
             .to_pandas().sort_values("doc_id"))
    assert list(first["doc_id"]) == [2, 4]
    assert list(first["dup_of"]) == [1, 1]


def test_props_stats_missing_key_total(ray_session, tmp_path):
    """Semi-structured extraction is total: rows whose props JSON lacks
    a parseable "k" (or is null) are excluded, not a crash; Ray result
    equals the TRY_CAST oracle."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from coherencebot_ray.pipelines.queries import (_PROPS_STATS_SQL,
                                                    q_props_stats)

    t = pa.table({
        "event_type": ["a", "a", "a", "b", "b", "c"],
        "props": ['{"k": 5}', '{"x": 1}', '{"k": -3}', None,
                  '{"k": 7}', 'not json'],
    })
    pq.write_table(t, tmp_path / "events.parquet")
    got = q_props_stats(str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    exp = con.execute(_PROPS_STATS_SQL).df()
    for c in ("n", "k_sum", "k_min", "k_max"):
        exp[c] = exp[c].astype(np.int64)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)
    # type 'c' has no parseable k -> absent; 'a' aggregates only its 2 hits
    assert list(got["event_type"]) == ["a", "b"]
    assert got.set_index("event_type").loc["a"].tolist() == [2, 2, -3, 5]


def test_rank_normalize_cume_dist(ray_session):
    """Exact cume_dist percentiles vs a hand computation, ties share the
    cumulative count of their value."""
    import ray.data as rd

    from coherencebot_ray.ops.vocab import rank_normalize

    docs = pd.DataFrame({"doc_id": [0, 1, 2, 3, 4],
                         "value_src": [10, 20, 20, 30, 5]})

    def value_pre(df):
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                             "value": df["value_src"].to_numpy(np.int64)})

    out = (rank_normalize(rd.from_pandas(docs).repartition(2), value_pre,
                          n_buckets=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # cume_dist: 5 -> 1/5, 10 -> 2/5, 20 -> 4/5 (both ties), 30 -> 5/5
    assert out["pct_micro"].tolist() == [
        2 * 10**6 // 5, 4 * 10**6 // 5, 4 * 10**6 // 5, 10**6, 10**6 // 5]


def test_latest_per_key_compaction(ray_session):
    """Latest-record-per-key: timestamp tie broken by id, partials
    across block boundaries fold correctly."""
    import ray.data as rd

    from coherencebot_ray.ops.window import latest_per_key

    ev = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2, 3],
        "ts": pd.to_datetime(["2024-01-02", "2024-01-03", "2024-01-03",
                              "2024-01-01", "2024-01-05", "2024-01-04"]),
        "event_id": [10, 11, 12, 20, 21, 30],
        "event_type": ["a", "b", "c", "d", "e", "f"],
    })
    out = (latest_per_key(rd.from_pandas(ev).repartition(3),
                          n_buckets=4).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    # user 1: ts tie between event 11/12 -> higher event_id (12) wins
    assert out["event_id"].tolist() == [12, 21, 30]
    assert out["event_type"].tolist() == ["c", "e", "f"]


def test_funnel_stages_ordering(ray_session):
    """Funnel: strict ordering (a click BEFORE the first view doesn't
    count), cascading sentinels, multi-block fold."""
    import ray.data as rd

    from coherencebot_ray.ops.window import funnel_stages

    ts = pd.to_datetime
    ev = pd.DataFrame({
        "user_id":    [1, 1, 1, 1,   2, 2,   3, 3, 3,   4],
        "ts": ts(["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04",
                  "2024-01-02", "2024-01-01",          # click BEFORE view
                  "2024-01-01", "2024-01-02", "2024-01-01",  # purchase before click
                  "2024-01-05"]),
        "event_type": ["view", "click", "click", "purchase",
                       "view", "click",
                       "view", "click", "purchase",
                       "purchase"],
    })
    out = (funnel_stages(rd.from_pandas(ev).repartition(3), n_buckets=4)
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    d = ts("2024-01-01").value // 1000
    day = 86_400_000_000
    # user 1: full funnel, first click after view (01-02) wins
    assert out.loc[0].tolist() == [1, d, d + day, d + 3 * day, 1]
    # user 2: only a pre-view click -> click/purchase unreached
    assert out.loc[1].tolist() == [2, d + day, -1, -1, 0]
    # user 3: purchase at 01-01 precedes the click -> not converted
    assert out.loc[2].tolist() == [3, d, d + day, -1, 0]
    # user 4: no view at all -> everything -1
    assert out.loc[3].tolist() == [4, -1, -1, -1, 0]
