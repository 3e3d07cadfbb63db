"""Dedup family + similarity search + textstats + multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xlink_spark.operators import dedup as DD
from xlink_spark.operators import similarity as SIM
from xlink_spark.operators import textstats as TS


@pytest.fixture(scope="module")
def toy_docs(spark):
    rows = [
        ("a", "the quick brown fox jumps over the lazy dog"),
        ("b", "the quick brown fox jumps over the lazy dog"),          # exact dup of a
        ("c", "the quick brown fox jumps over the lazy cat"),          # near dup
        ("d", "completely different content about spark engines"),
        ("e", "short"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string").cache()


def test_exact_duplicates(toy_docs):
    groups = {tuple(r["doc_ids"]): r["keeper"] for r in DD.exact_duplicates(toy_docs).collect()}
    assert groups[("a", "b")] == "a"
    assert sum(len(k) for k in groups) == 5


def test_minhash_dedup_finds_near_dup(toy_docs):
    pairs = DD.minhash_dedup(toy_docs, threshold=0.5, num_hashes=24, bands=8)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert ("a", "b") in got          # identical
    assert ("a", "c") in got or ("b", "c") in got  # near dup shares most shingles
    assert all("d" not in p and "e" not in p for p in got)


def test_lsh_bucket_cap_drops_degenerate_bucket(spark):
    """A boilerplate bucket wider than max_bucket is dropped from the
    candidate join AND surfaced via lsh_dropped_buckets (no silent loss)."""
    boiler = [(f"b{i}", "same boilerplate text everywhere") for i in range(6)]
    pair = [("x1", "a genuine near duplicate document body"),
            ("x2", "a genuine near duplicate document body")]
    docs = spark.createDataFrame(boiler + pair, "doc_id string, text string")
    sh = DD.shingles(docs, n=3)
    sig = DD.minhash_signatures(sh, num_hashes=8)
    # uncapped: the 6-doc boilerplate bucket yields 15 pairs + the x pair
    uncapped = DD.lsh_candidate_pairs(sig, bands=4)
    assert uncapped.count() == 15 + 1
    # capped at 4: the boilerplate bucket is dropped, x pair survives
    capped = DD.lsh_candidate_pairs(sig, bands=4, max_bucket=4)
    got = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    assert got == {("x1", "x2")}
    # the drop is observable: every band reports the width-6 bucket
    dropped = DD.lsh_dropped_buckets(sig, bands=4, max_bucket=4).collect()
    assert len(dropped) == 4 and all(r["width"] == 6 for r in dropped)
    # and the composed pipeline applies the cap end-to-end
    full = DD.minhash_dedup(docs, num_hashes=8, bands=4, threshold=0.5, max_bucket=4)
    assert {(r["doc_a"], r["doc_b"]) for r in full.collect()} == {("x1", "x2")}


def test_jaccard_values_exact(spark):
    sh = spark.createDataFrame(
        [("x", "s1"), ("x", "s2"), ("x", "s3"), ("y", "s2"), ("y", "s3"), ("y", "s4")],
        "doc_id string, shingle string",
    )
    pairs = spark.createDataFrame([("x", "y")], "doc_a string, doc_b string")
    got = DD.jaccard_verify(pairs, sh, threshold=0.0).collect()[0]
    assert got["jaccard"] == pytest.approx(2 / 4)


def test_simhash_identical_and_different(toy_docs):
    fp = {r["doc_id"]: r["simhash"] for r in DD.simhash(toy_docs).collect()}
    assert fp["a"] == fp["b"]
    assert fp["a"] != fp["d"]
    dups = DD.simhash_duplicates(toy_docs).collect()
    assert any(set(r["doc_ids"]) >= {"a", "b"} for r in dups)
    # the windowed drop path agrees with the group view's non-keepers
    via_window = {r["doc_id"] for r in DD.simhash_dup_drops(toy_docs).collect()}
    via_groups = {
        d for r in dups for d in r["doc_ids"] if d != min(r["doc_ids"])
    }
    assert via_window == via_groups


def test_embedding_near_duplicates(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),   # near dup of 1
        (3, [0.0, 1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    got = {(r["id_a"], r["id_b"]) for r in DD.embedding_near_duplicates(emb, threshold=0.99).collect()}
    assert got == {(1, 2)}


def test_brute_force_topk(spark):
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
        (3, [0.0, 1.0]),
        (4, [-1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    topk = SIM.brute_force_topk(emb.filter("vec_id = 1"), emb, k=2)
    got = [(r["neighbor_id"], r["rank"]) for r in topk.collect()]
    assert got == [(2, 1), (3, 2)]


def test_bucketed_topk_matches_brute_force_for_close_pairs(spark):
    import numpy as np

    rng = np.random.RandomState(0)
    base = rng.normal(size=(20, 8))
    rows = []
    for i, v in enumerate(base):
        v = v / np.linalg.norm(v)
        rows.append((i, v.tolist()))
        rows.append((100 + i, (v + rng.normal(scale=0.01, size=8)).tolist()))  # twin
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    approx = SIM.bucketed_topk(emb, dim=8, k=1, bits=4)
    got = {r["query_id"]: r["neighbor_id"] for r in approx.collect()}
    # twins are nearly identical ⇒ same SRP bucket ⇒ found as top-1
    hits = sum(1 for i in range(20) if got.get(i) == 100 + i or got.get(100 + i) == i)
    assert hits >= 15  # high recall for near-identical pairs


def test_knn_label_vote(spark):
    topk = spark.createDataFrame(
        [(1, 10, 0.9, 1), (1, 11, 0.8, 2), (1, 12, 0.7, 3)],
        "query_id int, neighbor_id int, cos double, rank int",
    )
    labels = spark.createDataFrame(
        [(10, 7), (11, 7), (12, 3)], "vec_id int, label int"
    )
    got = SIM.knn_label_vote(topk, labels).collect()[0]
    assert (got["pred_label"], got["votes"]) == (7, 2)


def test_text_stats_columns(toy_docs):
    r = {x["doc_id"]: x for x in TS.text_stats(toy_docs).collect()}
    assert r["a"]["n_tokens"] == 9
    assert r["e"]["n_tokens"] == 1
    assert r["a"]["fingerprint"] == r["b"]["fingerprint"]
    assert 0 <= r["a"]["quality"] <= 1
    assert r["a"]["stopword_ratio_en"] > 0  # 'the' twice + 'over'


def test_language_id(spark):
    rows = [
        ("e1", "the cat is in the house and it is warm"),
        ("d1", "der hund ist nicht in der schule und ich bin da"),
        ("f1", "le chat est dans la maison et il est pour les"),
        ("s1", "el perro es una mascota en la casa que es grande por"),
        ("z1", "这是一个测试文档我们在这里写了一些中文的句子"),
        ("u1", "xyzzy plugh qwerty"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: r["pred_lang"] for r in TS.language_id(df).collect()}
    assert got == {"e1": "en", "d1": "de", "f1": "fr", "s1": "es", "z1": "zh", "u1": "und"}


def test_multimodal_plumbing(spark, sdfs):
    from xlink_spark.operators import multimodal as MM

    docs, *_ = sdfs
    refs = MM.media_refs(docs)
    assert refs.count() > 0
    assets = MM.synthesize_assets(docs)
    assert assets.filter(F.col("payload").isNull()).count() == 0
    assert assets.filter(F.col("meta.width").isNull()).count() == 0
    # stubbed decoder: errors recorded, features null
    feats = MM.extract_features(assets, fake=False)
    assert feats.filter(F.col("decode_error").isNotNull()).count() == assets.count()
    # fake decoder: deterministic unit features
    f1 = MM.extract_features(assets, fake=True).orderBy("media_ref").collect()
    f2 = MM.extract_features(assets, fake=True).orderBy("media_ref").collect()
    assert [r["feature"] for r in f1] == [r["feature"] for r in f2]
    import numpy as np

    assert abs(np.linalg.norm(f1[0]["feature"]) - 1.0) < 1e-5


def test_multimodal_feature_neardup_end_to_end(spark, sdfs):
    """Media pipeline: spans → refs → assets → fake features → SRP near-dup.

    Decoders are stubbed (no media libs in env) but every Spark-side hop —
    binary payloads, Arrow batching, feature schema, bucketed ANN — is real.
    """
    from xlink_spark.operators import multimodal as MM

    docs, *_ = sdfs
    assets = MM.synthesize_assets(docs)
    feats = MM.extract_features(assets, dim=8, fake=True).filter(
        F.col("feature").isNotNull()
    )
    n = feats.count()
    assert n == assets.count()
    emb = feats.select(
        F.col("media_ref").alias("vec_id"), F.col("feature").alias("embedding")
    )
    # union with itself → guaranteed near-dups; SRP buckets must find them
    twin = emb.select(F.concat(F.col("vec_id"), F.lit("#t")).alias("vec_id"), "embedding")
    both = emb.unionByName(twin)
    topk = SIM.bucketed_topk(both, dim=8, k=1, bits=4)
    got = {r["query_id"]: (r["neighbor_id"], r["cos"]) for r in topk.collect()}
    hits = sum(
        1 for r, (nb, cos) in got.items()
        if (nb == r + "#t" or r == nb + "#t") and cos >= 0.999999
    )
    assert hits >= n  # every asset finds its twin (in at least one direction)


def test_simhash_near_pairs_matches_brute_force(spark):
    """Banded Hamming LSH over 64-bit SimHash: for k < bands the pigeonhole
    guarantee makes the blocked join EXACTLY equal to brute-force Hamming
    search; identical docs pair at hamming 0."""
    from xlink_spark.operators import dedup as DD

    docs = spark.createDataFrame(
        [("d%02d" % i, ("tok%d " % (i % 6)) * 10 + ("x%d " % i) * (i % 3)) for i in range(18)]
        + [("twin_a", "alpha beta gamma delta"), ("twin_b", "alpha beta gamma delta")],
        "doc_id string, text string",
    )
    fp = DD.simhash(docs).cache()
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in DD.simhash_near_pairs(fp, k=3, bands=4).collect()
    }
    a = fp.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"))
    b = fp.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"))
    brute = {
        (r["doc_a"], r["doc_b"], r["h"])
        for r in a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("h", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
        .filter(F.col("h") <= 3)
        .collect()
    }
    assert got == brute
    assert ("twin_a", "twin_b", 0) in got
    fp.unpersist()


def test_contamination_hits(spark):
    """Decontamination: a doc sharing ≥min_hits distinct n-grams with the
    eval set is flagged with the exact overlap count; others are not."""
    from xlink_spark.operators import dedup as DD

    corpus = spark.createDataFrame(
        [
            ("c1", "the quick brown fox jumps over the lazy dog today"),
            ("c2", "entirely different words with no benchmark overlap here"),
            ("c3", "quick brown fox appears once"),  # 2 shared 3-grams
        ],
        "doc_id string, text string",
    )
    eval_docs = spark.createDataFrame(
        [("e1", "the quick brown fox jumps")], "doc_id string, text string"
    )
    got = {
        r["doc_id"]: r["hits"]
        for r in DD.contamination_hits(corpus, eval_docs, ngram=3, min_hits=2).collect()
    }
    # eval 3-grams: {the quick brown, quick brown fox, brown fox jumps};
    # c1 contains all 3; c3 shares only 'quick brown fox' (1 < min_hits)
    assert got == {"c1": 3}
    got1 = {
        r["doc_id"]: r["hits"]
        for r in DD.contamination_hits(corpus, eval_docs, ngram=3, min_hits=1).collect()
    }
    assert got1 == {"c1": 3, "c3": 1}


def test_semantic_dedup(spark):
    """SemDeDup: twins in the same cluster collapse to the min-id survivor;
    distinct-cluster vectors survive untouched."""
    from xlink_spark.operators import dedup as DD

    cents = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])]
    rows = [
        (10, [0.9, 0.1, 0.0]),   # cluster 0
        (11, [0.9, 0.1, 0.0]),   # exact twin of 10 → dropped
        (12, [0.95, 0.05, 0.0]), # cluster 0, but cos(10,12) < 0.999? close...
        (20, [0.1, 0.9, 0.0]),   # cluster 1
        (21, [0.1, 0.9, 0.0]),   # twin of 20 → dropped
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: (r["cluster"], r["kept"])
        for r in DD.semantic_dedup(emb, cents, threshold=0.9999).collect()
    }
    assert got[10] == (0, True) and got[11] == (0, False)
    assert got[20] == (1, True) and got[21] == (1, False)
    assert got[12][0] == 0 and got[12][1]  # near but below threshold: kept


def test_real_bmp_wav_decode_to_srp_neardup(spark):
    """REAL media decode, no fake path: hand-built BMP and WAV payloads
    decode to pixel/sample histogram features (verified against a driver-side
    recomputation), corrupt payloads yield typed error rows, and the decoded
    image features run through SRP near-dup finding the perturbed twin."""
    import numpy as np

    from xlink_spark.operators import multimodal as MM

    rng = np.random.RandomState(3)
    img_a = rng.randint(0, 256, size=(8, 6, 3)).astype(np.uint8)
    img_b = img_a.copy()
    img_b[0, 0] = [255, 255, 255]  # 2-pixel perturbation → near-dup twin
    img_b[1, 1] = [0, 0, 0]
    img_c = rng.randint(0, 256, size=(8, 6, 3)).astype(np.uint8)
    wave = np.sin(np.linspace(0, 40 * np.pi, 4000)) * 0.7
    rows = [
        ("bmp_a", "image", bytearray(MM.make_bmp(img_a))),
        ("bmp_b", "image", bytearray(MM.make_bmp(img_b))),
        ("bmp_c", "image", bytearray(MM.make_bmp(img_c))),
        ("wav_a", "audio", bytearray(MM.make_wav(wave))),
        ("bad_bmp", "image", bytearray(b"BM" + b"\x01" * 20)),  # truncated header
    ]
    assets = spark.createDataFrame(rows, "media_ref string, kind string, payload binary")
    feats = {
        r["media_ref"]: (r["feature"], r["decode_error"])
        for r in MM.extract_features(assets, dim=16, fake=False).collect()
    }
    # corrupt payload: typed error row, no task failure
    assert feats["bad_bmp"][0] is None and "truncated" in feats["bad_bmp"][1]
    for ref in ("bmp_a", "bmp_b", "bmp_c", "wav_a"):
        f, err = feats[ref]
        assert err is None and f is not None and len(f) == 16
        assert abs(np.linalg.norm(f) - 1.0) < 1e-5
    # the decoded feature IS the pixel histogram (real decode, not a hash):
    gray = img_a.mean(axis=2)
    h, _ = np.histogram(gray.ravel(), bins=16, range=(0.0, 256.0))
    expected = h / np.linalg.norm(h)
    assert np.allclose(feats["bmp_a"][0], expected, atol=1e-6)
    # expected amplitudes go through the same int16 PCM quantization the
    # encoder applies and the decoder reverses
    q = (np.clip(wave, -1, 1) * 32767.0).astype(np.int16).astype(np.float64) / 32768.0
    hw, _ = np.histogram(q, bins=16, range=(-1.0, 1.0))
    assert np.allclose(feats["wav_a"][0], hw / np.linalg.norm(hw), atol=1e-6)
    # decoded image features through the SRP near-dup path: a's nearest
    # neighbor among the images is its perturbed twin b
    emb = spark.createDataFrame(
        [(k, [float(x) for x in feats[k][0]]) for k in ("bmp_a", "bmp_b", "bmp_c")],
        "vec_id string, embedding array<float>",
    )
    top = {
        r["query_id"]: r["neighbor_id"]
        for r in SIM.bucketed_topk(emb, dim=16, k=1, bits=2).collect()
    }
    assert top.get("bmp_a") == "bmp_b" and top.get("bmp_b") == "bmp_a"


def test_resize_images_nearest_neighbor(spark):
    """resize_images: real BMP decode → integer nearest-neighbor map →
    real BMP re-encode. Identity resize is byte-stable, downscale picks the
    exact floor(i·src/dst) pixels, non-BMP payloads get typed errors, and
    the resized table chains into extract_features."""
    import numpy as np

    from xlink_spark.operators import multimodal as MM

    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, size=(4, 4, 3)).astype(np.uint8)
    rows = [
        ("img", "image", bytearray(MM.make_bmp(px))),
        ("bad", "image", bytearray(b"not an image at all")),
    ]
    assets = spark.createDataFrame(rows, "media_ref string, kind string, payload binary")

    same = {r["media_ref"]: r for r in MM.resize_images(assets, 4, 4).collect()}
    assert bytes(same["img"]["payload"]) == MM.make_bmp(px)  # identity round-trip
    assert same["bad"]["payload"] is None and same["bad"]["decode_error"]

    small = {r["media_ref"]: r for r in MM.resize_images(assets, 2, 2).collect()}
    assert (small["img"]["width"], small["img"]["height"]) == (2, 2)
    expected = px[[0, 2]][:, [0, 2]]  # floor(i*4/2) index map
    assert bytes(small["img"]["payload"]) == MM.make_bmp(expected)

    # chains into the feature extractor as a normal asset table
    resized_assets = spark.createDataFrame(
        [("img", "image", small["img"]["payload"])],
        "media_ref string, kind string, payload binary",
    )
    feats = {r["media_ref"]: r for r in MM.extract_features(resized_assets, dim=8).collect()}
    assert feats["img"]["decode_error"] is None and len(feats["img"]["feature"]) == 8


def test_sample_frames_every_ms(spark):
    """Frame sampling over the XLV1 test container: first frame at/after
    each every_ms boundary is emitted with its index and timestamp; frames
    are real BMP payloads; real video formats yield a typed decode_error
    (no demuxer in this environment — the documented stub)."""
    import numpy as np

    from xlink_spark.operators import multimodal as MM

    rng = np.random.RandomState(9)
    frames = []
    for t in (0, 400, 800, 1200, 2000):
        img = rng.randint(0, 256, size=(2, 2, 3)).astype(np.uint8)
        frames.append((t, MM.make_bmp(img)))
    rows = [
        ("vid", "video", bytearray(MM.make_video(frames))),
        ("mp4", "video", bytearray(b"\x00\x00\x00 ftypisom rest-of-an-mp4")),
    ]
    assets = spark.createDataFrame(rows, "media_ref string, kind string, payload binary")
    got = MM.sample_frames(assets, every_ms=1000).collect()
    vid = sorted(
        ((r["frame_idx"], r["t_ms"]) for r in got if r["media_ref"] == "vid"),
    )
    assert vid == [(0, 0), (3, 1200), (4, 2000)]  # one per 1000ms window
    sampled = {r["frame_idx"]: r for r in got if r["media_ref"] == "vid"}
    assert bytes(sampled[3]["frame"]) == frames[3][1]  # the real BMP bytes
    mp4 = [r for r in got if r["media_ref"] == "mp4"]
    assert len(mp4) == 1 and mp4[0]["decode_error"] and mp4[0]["frame"] is None
    # sampled frames chain into the image feature extractor
    fa = spark.createDataFrame(
        [(f"vid#{r}", "image", sampled[r]["frame"]) for r in sampled],
        "media_ref string, kind string, payload binary",
    )
    feats = MM.extract_features(fa, dim=8).collect()
    assert all(r["decode_error"] is None for r in feats)
    # output flushing (batch_rows) never loses rows: every frame qualifies
    # at every_ms=1 and a 2-row flush cap still emits all five
    allf = MM.sample_frames(assets, every_ms=1, batch_rows=2).collect()
    assert sorted(r["frame_idx"] for r in allf if r["media_ref"] == "vid") == [0, 1, 2, 3, 4]


def test_bucketed_topk_multiprobe_improves_recall(spark):
    """Multi-probe searches Hamming-1 buckets: recall@1 vs brute force is
    monotone in probes, and full 1-bit probing recovers boundary-split
    neighbors that single-bucket search misses."""
    import numpy as np

    rng = np.random.RandomState(3)
    base = rng.normal(size=(60, 16))
    rows = []
    for i, v in enumerate(base):
        v = v / np.linalg.norm(v)
        rows.append((i, v.tolist()))
        # twin with enough noise that SOME twins cross one hyperplane —
        # exactly the boundary case multi-probe exists for
        rows.append((1000 + i, (v + rng.normal(scale=0.1, size=16)).tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def twin_recall(probes):
        got = {
            r["query_id"]: r["neighbor_id"]
            for r in SIM.bucketed_topk(emb, dim=16, k=1, bits=6, probes=probes)
            .filter(F.col("rank") == 1)
            .collect()
        }
        return sum(1 for i in range(60) if got.get(i) == 1000 + i) / 60

    r0, r6 = twin_recall(0), twin_recall(6)
    assert r6 > r0  # strictly better: this seed has boundary-split twins
    assert r6 >= 0.8  # 1-bit probing recovers the boundary-split twins
    # probing must never invent pairs outside Hamming<=1 buckets: top-1 from
    # probes=0 is always still reachable at probes=6 (superset property)
    pairs0 = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.bucketed_topk(emb, dim=16, k=3, bits=6, probes=0).collect()
    }
    got6 = SIM.bucketed_topk(emb, dim=16, k=200, bits=6, probes=6)
    pairs6 = {(r["query_id"], r["neighbor_id"]) for r in got6.collect()}
    assert pairs0 <= pairs6


def test_ivf_topk_recall_and_probe_monotonicity(spark):
    """IVF ANN (k-means coarse quantizer): planted twins are recovered at
    high recall, more probes never lose pairs, and nprobe=n_clusters equals
    brute force exactly."""
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.normal(size=(50, 12))
    rows = []
    for i, v in enumerate(base):
        v = v / np.linalg.norm(v)
        rows.append((i, v.tolist()))
        rows.append((1000 + i, (v + rng.normal(scale=0.05, size=12)).tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def twin_recall(nprobe):
        got = {
            r["query_id"]: r["neighbor_id"]
            for r in SIM.ivf_topk(emb, k=1, n_clusters=8, nprobe=nprobe)
            .filter(F.col("rank") == 1)
            .collect()
        }
        return sum(1 for i in range(50) if got.get(i) == 1000 + i) / 50

    r1, r2 = twin_recall(1), twin_recall(2)
    assert r2 >= r1 >= 0.9  # tight twins share a cluster almost always
    # probing ALL clusters reproduces brute force exactly
    brute = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in SIM.brute_force_topk(emb, emb, k=3).collect()
    }
    full = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in SIM.ivf_topk(emb, k=3, n_clusters=8, nprobe=8).collect()
    }
    assert full == brute


@pytest.fixture(scope="module")
def quantizer_emb(spark):
    """60 vectors + a 24-centroid quantizer derived from the first rows."""
    import numpy as np

    rng = np.random.RandomState(11)
    rows = [
        (i, (v / np.linalg.norm(v)).tolist())
        for i, v in enumerate(rng.normal(size=(60, 10)))
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()
    cents = [(i, rows[i][1]) for i in range(24)]
    return emb, cents


def test_quantizer_assignment_literal_equals_join(spark, quantizer_emb):
    """The broadcast-join assignment path produces BIT-IDENTICAL probe
    lists to the literal-expression path on the same quantizer (same d²
    arithmetic, same tie-break), for nprobe 1 and 3."""
    emb, cents = quantizer_emb
    for nprobe in (1, 3):
        lit = {
            r["vec_id"]: list(r["_probes"])
            for r in SIM.assign_probe_clusters(
                emb, cents, nprobe, literal_centroid_max=100
            ).collect()
        }
        join = {
            r["vec_id"]: list(r["_probes"])
            for r in SIM.assign_probe_clusters(
                emb, cents, nprobe, literal_centroid_max=1
            ).collect()
        }
        assert lit == join
        assert all(len(p) == nprobe for p in lit.values())


def test_quantizer_assignment_plan_shapes(spark, quantizer_emb):
    """Above literal_centroid_max the assignment plan is a broadcast
    nested-loop fanout + narrow window — NOT a C-struct literal projection;
    below it there is no join at all. The join path must project vectors
    away before the ranking exchange (no array column rides the shuffle)."""
    emb, cents = quantizer_emb
    lit_plan = SIM.assign_probe_clusters(
        emb, cents, 2, literal_centroid_max=100
    )._jdf.queryExecution().optimizedPlan().toString()
    join_plan = SIM.assign_probe_clusters(
        emb, cents, 2, literal_centroid_max=1
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in lit_plan  # pure per-row expression
    assert "BroadcastNestedLoopJoin" in join_plan
    assert "row_number" in join_plan
    # the exchange feeding the ranking window carries (id, cluster, d2) only
    import re as _re

    m = _re.search(r"Exchange hashpartitioning\(vec_id[^\n]*\n[^\n]*", join_plan)
    assert m and "cvec" not in m.group(0) and "embedding" not in m.group(0)


def test_hier_quantizer_full_probe_equals_flat(spark, quantizer_emb):
    """Two-level assignment with ALL coarse cells probed reproduces the
    flat join assignment EXACTLY (every centroid scored, same d², same
    tie-break); and with centroids placed on the data points, the top-1
    probe under partial coarse probing is always the vector's own centroid
    (its nearest coarse cell is by construction its centroid's cell)."""
    emb, cents = quantizer_emb
    flat = {
        r["vec_id"]: list(r["_probes"])
        for r in SIM.assign_probe_clusters(
            emb, cents, 2, literal_centroid_max=1
        ).collect()
    }
    full = {
        r["vec_id"]: list(r["_probes"])
        for r in SIM.assign_probe_clusters_hier(
            emb, cents, 2, n_coarse=5, nprobe_coarse=5
        ).collect()
    }
    assert flat == full
    # centroids == first 24 data vectors: those vectors' top-1 probe must be
    # their own centroid even under partial probing (nprobe_coarse=1)
    part = {
        r["vec_id"]: list(r["_probes"])
        for r in SIM.assign_probe_clusters_hier(
            emb, cents, 1, n_coarse=5, nprobe_coarse=1
        ).collect()
    }
    for cid, _ in cents:
        assert part[cid][0] == cid
    # growing the coarse probe set never worsens the best distance found:
    # the full-probe top-1 equals the flat top-1 for every vector
    assert all(full[v][0] == flat[v][0] for v in flat)


def test_hier_quantizer_exact_on_clustered_data(spark):
    """The operator's target setting: on well-separated blob-structured
    embeddings, partial coarse probing (2 of 8 cells) agrees with the flat
    assignment EXACTLY — coarse cells capture the real neighborhoods.
    (On unstructured Gaussian data agreement drops to ~0.35-0.40, the
    textbook IVF behavior; the docstring records that measurement.)"""
    import numpy as np

    rng = np.random.RandomState(0)
    blobs = rng.normal(scale=0.05, size=(8, 1, 16)) + rng.normal(
        scale=10, size=(8, 1, 16)
    )
    cents = [
        (i, (blobs[i % 8, 0] + rng.normal(scale=0.05, size=16)).tolist())
        for i in range(96)
    ]
    vecs = [
        (i, (blobs[i % 8, 0] + rng.normal(scale=0.05, size=16)).tolist())
        for i in range(200)
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    flat = {
        r["vec_id"]: r["_probes"][0]
        for r in SIM.assign_probe_clusters(
            emb, cents, 1, literal_centroid_max=1
        ).collect()
    }
    hier = {
        r["vec_id"]: r["_probes"][0]
        for r in SIM.assign_probe_clusters_hier(
            emb, cents, 1, n_coarse=8, nprobe_coarse=2
        ).collect()
    }
    assert flat == hier


def test_ivf_and_semantic_dedup_identical_through_join_quantizer(spark, quantizer_emb):
    """ivf_topk and semantic_dedup give the same answers whichever
    assignment path the quantizer size selects."""
    emb, cents = quantizer_emb
    a = sorted(
        map(tuple, SIM.ivf_topk(emb, k=3, nprobe=2, centroids=cents,
                                literal_centroid_max=100).collect())
    )
    b = sorted(
        map(tuple, SIM.ivf_topk(emb, k=3, nprobe=2, centroids=cents,
                                literal_centroid_max=1).collect())
    )
    assert a == b and len(a) > 0
    sa = sorted(
        map(tuple, DD.semantic_dedup(emb, cents, threshold=0.9,
                                     literal_centroid_max=100).collect())
    )
    sb = sorted(
        map(tuple, DD.semantic_dedup(emb, cents, threshold=0.9,
                                     literal_centroid_max=1).collect())
    )
    assert sa == sb and len(sa) == 60


def test_curate_corpus_end_to_end(spark):
    """The full curation plan: exact dup, junk, near-dup, and contaminated
    docs each fall to their stage; the audit counts every drop."""
    from xlink_spark.plans.curation import curate_corpus

    base = "the quick brown fox jumps over the lazy dog and it is very happy today in the sun"
    rows = [
        ("d1", base),                      # kept
        ("d2", base),                      # exact dup of d1 -> dropped
        ("d3", base + " extra"),           # near-dup of d1 (J=15/16) -> dropped
        ("d4", "!!! ??? ,,, !!! ???"),     # junk -> low_quality
        ("d5", "alpha beta gamma delta epsilon zeta eta theta"),  # contaminated
        ("d6", "some other completely different sentence with the usual and common words in it"),  # kept
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    eval_docs = spark.createDataFrame(
        [("e1", "report contains alpha beta gamma delta verbatim")],
        "doc_id string, text string",
    )
    held: list = []
    kept, audit, drops = curate_corpus(
        docs, eval_docs, contamination_ngram=3, persisted_out=held
    )
    kept_rows = kept.collect()
    kept_ids = sorted(r["doc_id"] for r in kept_rows)
    counts = {r["stage"]: r["n_dropped"] for r in audit.collect()}
    fates = {r["doc_id"]: r["stage"] for r in drops.collect()}
    # release only after every output is consumed: the drops/survivor
    # frames are lineage-truncated, so a released handle is gone for good
    # (unlike a persist, which would silently recompute)
    for h in held:
        h.unpersist()
    assert kept_ids == ["d1", "d6"]
    assert counts == {
        "exact_dup": 1, "low_quality": 1, "near_dup": 1, "contaminated": 1
    }
    assert fates == {
        "d2": "exact_dup", "d4": "low_quality", "d3": "near_dup",
        "d5": "contaminated",
    }
    # kept rows carry the quality column
    assert all(r["quality"] >= 0.2 for r in kept_rows)


def test_curate_corpus_audit_reads_cached_drops(spark):
    """With persisted_out passed, kept materializes the (persisted) drop
    list once and the audit plan READS THE CACHE — the LSH band join and
    contamination join never execute a second time. Pinned on the audit's
    executed plan: it scans the in-memory relation and contains none of the
    drop-chain's signature hashing."""
    from xlink_spark.plans.curation import curate_corpus

    rows = [(f"d{i}", f"document number {i} with some shared filler words "
            + ("x " * (i % 7))) for i in range(30)]
    rows += [("dup1", rows[0][1]), ("dup2", rows[0][1])]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    held: list = []
    kept, audit, drops = curate_corpus(docs, None, persisted_out=held)
    kept.count()  # materializes the chain; drops is now cached
    audit.collect()
    sc = spark.sparkContext

    def stages_run(action):
        st = sc.statusTracker()
        before = set(st.getJobIdsForGroup(None))
        action()
        new = [j for j in st.getJobIdsForGroup(None) if j not in before]
        return sum(len(st.getJobInfo(j).stageIds) for j in new)

    cached_stages = stages_run(lambda: audit.collect())
    plan = audit._jdf.queryExecution().executedPlan().toString()
    # drops is lineage-TRUNCATED (localCheckpoint): the audit legs scan the
    # stored blocks through a flat ExistingRDD — none of the drop chain's
    # operators (window, LSH hashing, quality scan) appear in its plan,
    # which is also how the nested-cache planning blowup is kept out
    assert "ExistingRDD" in plan
    for marker in ("row_number", "md5", "Window"):
        assert marker not in plan
    for h in held:
        h.unpersist()
    # ...and the executed work proves it: an audit over the checkpointed
    # drop list runs only tiny block-scan + single-partition-agg stages per
    # leg, while recomputing the drop chain per leg runs the exact-dup
    # window / LSH / quality scan again (measured ~30)
    _k2, audit2, _d2 = curate_corpus(docs, None)  # no persist → recompute
    uncached_stages = stages_run(lambda: audit2.collect())
    assert cached_stages < uncached_stages
    assert cached_stages <= 18  # ~5 AQE stages per leg over stored blocks


def test_exact_dup_drops_matches_group_view(spark):
    """The windowed drop path (scale-safe) drops exactly the non-keepers
    the collect_list report view identifies."""
    rows = [("a", "t1"), ("b", "t1"), ("c", "t1"), ("d", "t2"), ("e", "t3"),
            ("f", "t3")]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    via_window = {r["doc_id"] for r in DD.exact_dup_drops(docs).collect()}
    via_groups = {
        d
        for r in DD.exact_duplicates(docs).collect()
        for d in r["doc_ids"]
        if d != r["keeper"]
    }
    assert via_window == via_groups == {"b", "c", "f"}


def test_lsh_plan_construction_runs_no_job(spark):
    """lsh_candidate_pairs with num_hashes given must not trigger a Spark
    job during PLAN CONSTRUCTION (the old first() width probe re-ran the
    whole signature aggregation once per call)."""
    sc = spark.sparkContext
    docs = spark.createDataFrame(
        [("a", "one two three four five"), ("b", "one two three four six")],
        "doc_id string, text string",
    )
    sig = DD.minhash_signatures(DD.shingles(docs), num_hashes=8)
    before = len(sc.statusTracker().getJobIdsForGroup(None))
    cand = DD.lsh_candidate_pairs(sig, num_hashes=8, bands=4, max_bucket=10)
    dropped = DD.lsh_dropped_buckets(sig, num_hashes=8, bands=4, max_bucket=10)
    after = len(sc.statusTracker().getJobIdsForGroup(None))
    assert after == before  # plan construction is action-free
    # and the built plans still compute the same candidates as the probe path
    probe = DD.lsh_candidate_pairs(sig, bands=4, max_bucket=10)
    assert sorted(map(tuple, cand.collect())) == sorted(map(tuple, probe.collect()))
    assert dropped.count() == 0


def test_repetition_stats(spark):
    """Gopher repetition signals: duplicate lines and degenerate bigrams."""
    rows = [
        ("r1", "nav bar\ncontent one\nnav bar\ncontent two\nnav bar"),  # 5 lines, 3 distinct
        ("r2", "spam spam spam spam spam"),                             # one bigram 4/4
        ("r3", "each line here\nis quite different\nno repeats at all"),
        ("r4", ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: r for r in TS.repetition_stats(docs).collect()}
    assert got["r1"]["n_lines"] == 5
    assert got["r1"]["dup_line_frac_u"] == 400000      # 1 - 3/5
    assert got["r2"]["top_bigram_frac_u"] == 1000000   # 'spam spam' is all bigrams
    assert got["r3"]["dup_line_frac_u"] == 0
    assert got["r4"]["n_lines"] == 0 and got["r4"]["top_bigram_frac_u"] == 0


def test_redact_pii(spark):
    """Emails and phone-shaped runs are replaced with typed tags; counts
    agree with the replacements; clean text is untouched."""
    rows = [
        ("p1", "write to alice.smith+x@mail.example.org or bob@ex.co today"),
        ("p2", "call +1 (555) 010-7788 or 555-010-9944 now"),
        ("p3", "no pii in this perfectly ordinary sentence"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: r for r in TS.redact_pii(docs).collect()}
    assert got["p1"]["n_emails"] == 2 and got["p1"]["n_phones"] == 0
    assert got["p1"]["redacted"] == "write to <EMAIL> or <EMAIL> today"
    assert got["p2"]["n_phones"] == 2
    assert got["p2"]["redacted"] == "call <PHONE> or <PHONE> now"
    assert got["p3"]["redacted"] == rows[2][1]
    assert got["p3"]["n_emails"] == 0 and got["p3"]["n_phones"] == 0


def test_redact_pii_leaves_numeric_prose_alone(spark):
    """Benign numeric text — year lists, scores, ISBNs, dates, version
    strings, id lists — must NOT be redacted as phones; phone-shaped spans
    (international +, parenthesized area code, hyphen groups ending in four
    digits) still are."""
    neg = [
        ("n1", "in 2020 2021 2022 the scores were 10 20 30 and 40 50 60"),
        ("n2", "ISBN 978-3-16-148410-0 was printed on 2026-08-17"),
        ("n3", "versions 1.2.3 and 10.20.30 shipped on 17.08.2026"),
        ("n4", "a list 1234 5678 9012 3456 of account ids"),
    ]
    pos = [
        ("y1", "reach us at +86 10 1234 5678 during office hours"),
        ("y2", "or (212) 555 0188 in new york"),
        ("y3", "fax 0171-555-0123 still works"),
    ]
    docs = spark.createDataFrame(neg + pos, "doc_id string, text string")
    got = {r["doc_id"]: r for r in TS.redact_pii(docs).collect()}
    for d, text in neg:
        assert got[d]["n_phones"] == 0, (d, got[d]["redacted"])
        assert got[d]["redacted"] == text
    for d, _ in pos:
        assert got[d]["n_phones"] == 1, (d, got[d]["redacted"])
        assert "<PHONE>" in got[d]["redacted"]


def test_curate_corpus_repetition_and_pii(spark):
    """Optional curation stages: Gopher repetition gate drops boilerplate,
    redact=True scrubs survivors' PII in place."""
    from xlink_spark.plans.curation import curate_corpus

    rows = [
        ("d1", "the cat is in the house and it is warm write bob@x.org today"),
        ("d2", "nav\nreal content line with the usual words here\nnav\nnav\nnav\nnav"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    kept, audit, _drops = curate_corpus(
        docs, None, min_quality=0.0, max_dup_line_frac=0.5, redact=True
    )
    rows_kept = {r["doc_id"]: r for r in kept.collect()}
    counts = {r["stage"]: r["n_dropped"] for r in audit.collect()}
    assert set(rows_kept) == {"d1"}
    assert counts["repetitive"] == 1
    assert "<EMAIL>" in rows_kept["d1"]["text"]
    assert rows_kept["d1"]["n_emails"] == 1


def test_jsonl_corpus_roundtrip_and_quarantine(spark, tmp_path):
    """JSONL source: good rows parse against the declared contract, broken
    lines/contract violations land on the quarantine side with reasons."""
    from xlink_spark.sources.jsonl import read_jsonl_corpus, write_jsonl_corpus

    p = tmp_path / "corpus.jsonl"
    p.write_text(
        '{"doc_id": "a", "text": "hello world", "source": "web", "lang": "en"}\n'
        '{"doc_id": "b", "text": "zweite zeile", "meta": {"crawl": "2026-01"}}\n'
        'this is not json at all\n'
        '{"text": "orphan text without id"}\n'
        '{"doc_id": "c"}\n'
    )
    docs, quar = read_jsonl_corpus(spark, str(p))
    got = {r["doc_id"]: r for r in docs.collect()}
    assert set(got) == {"a", "b"}
    assert got["a"]["lang"] == "en"
    assert "crawl" in (got["b"]["meta"] or "")  # nested object kept as raw JSON
    reasons = sorted(r["reason"] for r in quar.collect())
    assert reasons == ["missing_id", "missing_text", "not_json"]
    # round-trip: write back out and re-read
    out = tmp_path / "out"
    write_jsonl_corpus(docs, str(out))
    docs2, quar2 = read_jsonl_corpus(spark, str(out))
    assert docs2.count() == 2 and quar2.count() == 0


def test_pack_sequences_invariants(spark):
    """Packing: every doc packed exactly once, no pack over capacity except
    single oversized docs, deterministic across runs."""
    from xlink_spark.operators.packing import pack_sequences, pack_summary

    rows = [(f"d{i:03d}", (i * 37) % 900 + 50) for i in range(200)]
    rows.append(("dbig", 5000))  # oversized: must get its own pack
    docs = spark.createDataFrame(rows, "doc_id string, n_tokens long")
    packed = pack_sequences(docs, capacity=2048, num_partitions=64)
    a = sorted(map(tuple, packed.collect()))
    b = sorted(map(tuple, pack_sequences(docs, capacity=2048, num_partitions=64).collect()))
    assert a == b  # deterministic
    assert len(a) == 201 and len({r[1] for r in a}) == 201  # each doc once
    summ = pack_summary(packed).collect()
    for r in summ:
        assert r["total_tokens"] <= 2048 or r["n_docs"] == 1
    total = sum(r["total_tokens"] for r in summ)
    assert total == sum(n for _, n in rows)
    # the oversized doc is alone in its pack
    big_pack = [r[0] for r in a if r[1] == "dbig"][0]
    assert sum(1 for r in a if r[0] == big_pack) == 1


def test_pack_sequences_deterministic_across_sessions_and_layouts(spark, tmp_path):
    """Pack ids depend only on (doc_id, capacity, num_partitions): the same
    parquet input packed under a different physical layout, a different
    shuffle-partition setting, and a SEPARATE Spark session yields
    bit-identical assignments (hash partitioning is a pure function of the
    id — range boundaries sampled from layout are not)."""
    from xlink_spark.operators.packing import pack_sequences

    rows = [(f"d{i:03d}", (i * 53) % 700 + 40) for i in range(150)]
    docs = spark.createDataFrame(rows, "doc_id string, n_tokens long")
    path = str(tmp_path / "toks.parquet")
    docs.write.parquet(path)

    base = spark.read.parquet(path)
    a = sorted(map(tuple, pack_sequences(base, capacity=1024, num_partitions=64).collect()))
    # different upstream layout: scrambled partitioning and order
    scrambled = base.repartition(7).sortWithinPartitions(F.col("doc_id").desc())
    b = sorted(map(tuple, pack_sequences(scrambled, capacity=1024, num_partitions=64).collect()))
    assert a == b
    # separate session (fresh session state / different shuffle config)
    s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "5")
    c = sorted(map(tuple, pack_sequences(s2.read.parquet(path), capacity=1024, num_partitions=64).collect()))
    assert a == c


def test_coarse_cells_never_empty_and_hier_loses_no_rows(spark):
    """Row-loss guard: Lloyd over a duplicate-heavy quantizer leaves coarse
    cells with ZERO member centroids (ties all resolve to the smallest cell
    id); a vector whose probed cells were all empty would silently vanish
    through the hier path's final inner join. coarse_cells must therefore
    never return an empty cell — and hier assignment must preserve row
    count for every vector."""
    # 8 duplicate centroids + 2 off to the side: seeds 0,2,4,6,8 collapse —
    # every [10,10] centroid ties to the smallest duplicate cell, leaving
    # the other duplicate-seeded cells memberless
    cents = [(i, [10.0, 10.0]) for i in range(8)] + [
        (8, [0.0, 0.0]), (9, [0.1, 0.0])
    ]
    coarse, cell_of = SIM.coarse_cells(cents, 5)
    member_cells = set(cell_of.values())
    assert {c for c, _ in coarse} == member_cells  # no empty cell survives
    assert set(cell_of) == {i for i in range(10)}  # every centroid assigned
    # end-to-end: every input vector appears in the hier assignment output,
    # wherever its probes land
    import numpy as np

    rng = np.random.RandomState(11)
    vecs = [(i, (rng.normal(scale=8, size=2)).tolist()) for i in range(40)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = SIM.assign_probe_clusters_hier(
        emb, cents, nprobe=1, n_coarse=5, nprobe_coarse=1
    )
    assert out.count() == 40


def test_ivf_hier_opt_in_matches_flat_on_full_probe(spark, quantizer_emb):
    """ivf_topk(hier=True) with all coarse cells probed returns exactly the
    flat-path answers (the ergonomic wrapper adds no drift), and
    hier_agreement_rate reads 1.0 in that regime."""
    emb, cents = quantizer_emb
    flat = sorted(
        map(tuple, SIM.ivf_topk(emb, k=3, nprobe=2, centroids=cents).collect())
    )
    hier = sorted(
        map(tuple, SIM.ivf_topk(
            emb, k=3, nprobe=2, centroids=cents,
            hier=True, n_coarse=5, nprobe_coarse=5,
        ).collect())
    )
    assert flat == hier and len(flat) > 0
    rate = SIM.hier_agreement_rate(
        emb, cents, nprobe=1, n_coarse=5, nprobe_coarse=5, sample_rows=500
    )
    assert rate == 1.0


def test_hier_agreement_rate_blob_data(spark):
    """The go/no-go gauge on the operator's target setting: on separated
    blob-structured embeddings, partial coarse probing (2 of 8 cells)
    agrees with the flat assignment for every sampled vector."""
    import numpy as np

    rng = np.random.RandomState(0)
    blobs = rng.normal(scale=0.05, size=(8, 1, 16)) + rng.normal(
        scale=10, size=(8, 1, 16)
    )
    cents = [
        (i, (blobs[i % 8, 0] + rng.normal(scale=0.05, size=16)).tolist())
        for i in range(96)
    ]
    vecs = [
        (i, (blobs[i % 8, 0] + rng.normal(scale=0.05, size=16)).tolist())
        for i in range(200)
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    rate = SIM.hier_agreement_rate(
        emb, cents, nprobe=1, n_coarse=8, nprobe_coarse=2, sample_rows=100
    )
    assert rate == 1.0
    # and semantic_dedup's opt-in hier path agrees with its flat path here
    flat = sorted(map(tuple, DD.semantic_dedup(emb, cents, threshold=0.95).collect()))
    hier = sorted(map(tuple, DD.semantic_dedup(
        emb, cents, threshold=0.95, hier=True, n_coarse=8, nprobe_coarse=2
    ).collect()))
    assert flat == hier


def test_ivf_default_training_is_bounded_sample(spark):
    """The convenience KMeans training path samples by DEFAULT once the
    input exceeds the row cap (no accidental full-corpus iterative ML job),
    trains full only when the input is under the cap, and an explicit
    sample_fraction=1.0 opts back into the full fit."""
    import numpy as np

    rng = np.random.RandomState(2)
    emb = spark.createDataFrame(
        [(i, rng.normal(size=8).tolist()) for i in range(300)],
        "vec_id long, embedding array<double>",
    )

    def plan(df):
        return df._jdf.queryExecution().optimizedPlan().toString()

    capped = SIM.quantizer_training_frame(emb, train_row_cap=50)
    assert "Sample" in plan(capped)
    under = SIM.quantizer_training_frame(emb, train_row_cap=1000)
    assert "Sample" not in plan(under)
    full = SIM.quantizer_training_frame(emb, sample_fraction=1.0)
    assert "Sample" not in plan(full)
    # sampled training still yields a working quantizer end-to-end, and the
    # frozen-centroid path (all oracles) is unaffected by the default change
    got = SIM.ivf_topk(emb, k=2, n_clusters=4, nprobe=2, train_row_cap=50)
    assert got.count() > 0


def test_resize_images_hostile_header_is_data_error(spark):
    """A BMP header declaring huge dimensions over a tiny payload must land
    on the typed decode_error path BEFORE any allocation — never an OOM-risk
    np.zeros from untrusted header fields."""
    import struct

    from xlink_spark.operators import multimodal as MM

    def fake_bmp(w, h):
        off = 54
        header = struct.pack("<2sIHHI", b"BM", off + 16, 0, 0, off)
        info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, 16, 2835, 2835, 0, 0)
        return header + info + b"\x00" * 16  # 16 bytes of "pixels"

    rows = [
        ("huge", "image", bytearray(fake_bmp(30000, 30000))),     # payload-size lie
        ("absurd", "image", bytearray(fake_bmp(1 << 20, 4))),     # dimension cap
        ("negw", "image", bytearray(fake_bmp(-5, 4))),
    ]
    assets = spark.createDataFrame(rows, "media_ref string, kind string, payload binary")
    got = {r["media_ref"]: r for r in MM.resize_images(assets, 2, 2).collect()}
    for ref in ("huge", "absurd", "negw"):
        assert got[ref]["payload"] is None
        assert got[ref]["decode_error"] and "ValueError" in got[ref]["decode_error"]


def test_sample_frames_truncated_container_is_data_error(spark):
    """A frame length field overrunning the XLV1 buffer must yield a typed
    decode_error row — never silently-truncated garbage frame bytes with
    decode_error=None (Python slicing does not raise on overrun)."""
    import struct

    import numpy as np

    from xlink_spark.operators import multimodal as MM

    img = np.zeros((2, 2, 3), dtype=np.uint8)
    good = MM.make_bmp(img)
    # frame 0 intact, frame 1 declares 10_000 bytes but the buffer ends
    lying = (
        MM.VIDEO_MAGIC + struct.pack("<I", 2)
        + struct.pack("<II", 0, len(good)) + good
        + struct.pack("<II", 1000, 10_000) + b"\x01\x02\x03"
    )
    assets = spark.createDataFrame(
        [("trunc", "video", bytearray(lying))],
        "media_ref string, kind string, payload binary",
    )
    got = MM.sample_frames(assets, every_ms=1).collect()
    errs = [r for r in got if r["decode_error"]]
    assert len(errs) == 1 and "truncated XLV1" in errs[0]["decode_error"]
    # no garbage frame row was emitted for the overrunning frame
    assert all(r["t_ms"] != 1000 for r in got if r["decode_error"] is None)


def test_winnow_fingerprint_guarantee_and_discrimination(spark):
    """Winnowing's contract: any shared run of k+w-1 tokens yields a shared
    fingerprint; disjoint-vocabulary docs share none; identical docs share
    all. k=5, w=4 ⇒ guaranteed detection of ≥8-token shared passages."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        ("a", f"one two three four five six {shared} seven eight nine ten"),
        ("b", f"uno dos tres cuatro cinco seis {shared} siete ocho nueve"),
        ("c", "red orange yellow green blue indigo violet magenta cyan teal"),
        ("d", f"one two three four five six {shared} seven eight nine ten"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    fps = DD.winnow_fingerprints(docs, k=5, w=4)
    by_doc = {
        r["doc_id"]: set(r["f"])
        for r in fps.groupBy("doc_id").agg(F.collect_set("fp").alias("f")).collect()
    }
    assert by_doc["a"] & by_doc["b"], "shared 8-token passage must share a fingerprint"
    assert by_doc["a"] == by_doc["d"], "identical docs share the whole set"
    assert not (by_doc["a"] & by_doc["c"]) and not (by_doc["b"] & by_doc["c"])

    pairs = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in DD.winnow_overlap_pairs(docs, k=5, w=4, min_shared=1).collect()
    }
    assert ("a", "d") in pairs and pairs[("a", "d")] == len(by_doc["a"])
    assert ("a", "b") in pairs
    assert not any("c" in p for p in pairs)


def test_winnow_short_doc_and_bucket_cap(spark):
    """Docs shorter than k tokens fingerprint their whole token array (so
    byte-identical short docs still collide), and max_bucket drops a
    fingerprint shared by more docs than the cap BEFORE pair generation."""
    rows = [("s1", "tiny doc"), ("s2", "tiny doc"), ("s3", "other text")]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in DD.winnow_overlap_pairs(docs, k=5, w=4, min_shared=1).collect()
    }
    assert pairs == {("s1", "s2")}

    # 5 identical docs → one 5-wide fingerprint bucket; cap at 4 kills it
    wide = spark.createDataFrame(
        [(f"w{i}", "alpha beta gamma delta epsilon zeta") for i in range(5)],
        "doc_id string, text string",
    )
    capped = DD.winnow_overlap_pairs(wide, k=5, w=4, min_shared=1, max_bucket=4)
    assert capped.count() == 0
    uncapped = DD.winnow_overlap_pairs(wide, k=5, w=4, min_shared=1)
    assert uncapped.count() == 10  # C(5,2)


def test_boilerplate_lines_thresholds(spark):
    """Footer on 4/4 docs and promo on 2/4 (exactly the 50% threshold) are
    boilerplate; a note on 1/4 and ANY line of a single-doc source are not
    (min_docs=2 guards tiny groups); empty lines never count."""
    rows = [
        ("a", 1, "alpha body one\nFOOTER A\npromo line"),
        ("a", 2, "alpha body two\nFOOTER A\npromo line"),
        ("a", 3, "alpha body three\n\nFOOTER A\nrare note"),
        ("a", 4, "alpha body four\nFOOTER A"),
        ("b", 5, "solo doc\nFOOTER B"),
    ]
    docs = spark.createDataFrame(rows, "source string, doc_id long, text string")
    bp = {(r["source"], r["line"]): r["n_docs_line"] for r in
          DD.boilerplate_lines(docs, min_docs=2, min_frac_u=500_000).collect()}
    assert bp == {("a", "FOOTER A"): 4, ("a", "promo line"): 2}


def test_boilerplate_counts_once_per_doc(spark):
    """A line repeated INSIDE one doc counts once: 'echo' appears 3x in one
    doc and 1x in another of 4 docs — 2/4 = 50%, boilerplate; without the
    per-doc distinct it would be overcounted but with it a 1-doc spam line
    ('selfspam', 5x in one doc) stays below min_docs."""
    rows = [
        ("a", 1, "echo\necho\necho\nselfspam\nselfspam\nselfspam\nselfspam\nselfspam\nu1"),
        ("a", 2, "echo\nu2"),
        ("a", 3, "u3"),
        ("a", 4, "u4"),
    ]
    docs = spark.createDataFrame(rows, "source string, doc_id long, text string")
    bp = {r["line"]: r["n_docs_line"] for r in
          DD.boilerplate_lines(docs, min_docs=2, min_frac_u=500_000).collect()}
    assert bp == {"echo": 2}


def test_strip_boilerplate_order_survival_and_structure(spark):
    """Stripping keeps line order and empty lines, and a doc whose every
    line is boilerplate survives with empty text instead of vanishing."""
    rows = [
        ("a", 1, "first\nFOOTER\nmiddle\n\nlast"),
        ("a", 2, "FOOTER"),
        ("a", 3, "other\nFOOTER"),
    ]
    docs = spark.createDataFrame(rows, "source string, doc_id long, text string")
    bp = DD.boilerplate_lines(docs, min_docs=2, min_frac_u=500_000)
    out = {r["doc_id"]: r["text"]
           for r in DD.strip_boilerplate(docs, bp).collect()}
    assert out == {1: "first\nmiddle\n\nlast", 2: "", 3: "other"}


def test_strip_boilerplate_null_text_survives(spark):
    """split(NULL) is NULL and posexplode(NULL) emits zero rows — without
    the coalesce a NULL-text doc would vanish, violating the 'every
    document survives' contract. It must come back as empty text."""
    rows = [("a", 1, "keep\nFOOTER"), ("a", 2, None), ("a", 3, "FOOTER")]
    docs = spark.createDataFrame(
        rows, "source string, doc_id long, text string"
    )
    bp = DD.boilerplate_lines(docs, min_docs=2, min_frac_u=500_000)
    out = {r["doc_id"]: r["text"]
           for r in DD.strip_boilerplate(docs, bp).collect()}
    assert set(out) == {1, 2, 3} and out[2] == ""


def test_strip_boilerplate_is_group_scoped(spark):
    """The same line is boilerplate in one source and content in another —
    decisions must not leak across groups."""
    rows = [
        ("a", 1, "shared line\nx1"),
        ("a", 2, "shared line\nx2"),
        ("b", 3, "shared line\ny1"),
        ("b", 4, "unrelated\ny2"),
    ]
    docs = spark.createDataFrame(rows, "source string, doc_id long, text string")
    bp = DD.boilerplate_lines(docs, min_docs=2, min_frac_u=500_000)
    out = {r["doc_id"]: r["text"]
           for r in DD.strip_boilerplate(docs, bp).collect()}
    assert out[1] == "x1" and out[2] == "x2"
    assert out[3] == "shared line\ny1" and out[4] == "unrelated\ny2"


def test_top_ngrams_counts_and_tiebreak(spark):
    """Known corpus: exact counts, (count desc, ngram asc) total order at
    the k boundary, short docs contribute nothing, n=1 degenerates to
    token counts."""
    docs = spark.createDataFrame(
        [
            (1, "a b c a b c a b"),   # "a b c"x2, "b c a"x2, "c a b"x2
            (2, "a b c d"),           # +1 "a b c", "b c d"
            (3, "x y"),               # too short for trigrams
        ],
        "doc_id long, text string",
    )
    top = TS.top_ngrams(docs, n=3, k=3).collect()
    assert [(r["ngram"], r["n_occurrences"]) for r in top] == [
        ("a b c", 3),
        ("b c a", 2),
        ("c a b", 2),  # ties with "b c a"; ngram asc decides — and "b c d"
    ]                  # (count 1) falls outside k deterministically
    uni = {r["ngram"]: r["n_occurrences"]
           for r in TS.top_ngrams(docs, n=1, k=10).collect()}
    assert uni["a"] == 4 and uni["b"] == 4 and uni["x"] == 1
    plan = TS.top_ngrams(docs, n=3, k=3)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_chunk_documents_hand_values(spark):
    """Window arithmetic pinned: 10 tokens, max 4, stride 3 → 3 chunks with
    exact texts and char offsets; short docs → one chunk; empty → none."""
    from xlink_spark.operators.packing import chunk_documents

    df = spark.createDataFrame(
        [("d1", "a bb ccc dd e ff g hh i jj"), ("d2", "one two"), ("d3", "")],
        "doc_id string, text string",
    )
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["char_start"], r["chunk_text"])
        for r in chunk_documents(df, max_tokens=4, stride=3).collect()
    )
    assert got == [
        ("d1", 0, 0, "a bb ccc dd"),
        ("d1", 1, 9, "dd e ff g"),
        ("d1", 2, 17, "g hh i jj"),
        ("d2", 0, 0, "one two"),
    ]
    # char offsets index into the original text
    text = "a bb ccc dd e ff g hh i jj"
    for _, _, start, chunk in got[:3]:
        assert text[start : start + len(chunk)] == chunk

    import pytest as _pt

    with _pt.raises(ValueError):
        chunk_documents(df, max_tokens=0, stride=3)


def test_chunk_documents_plan_is_pure_jvm_no_shuffle(spark):
    """Chunking is one projection: no Python eval nodes, no exchange."""
    from xlink_spark.operators.packing import chunk_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        chunk_documents(docs, 40, 30)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "Exchange"):
        assert marker not in plan


def test_neardup_clusters_chain_closure_and_survivor(spark):
    """A~B, B~C closes to ONE cluster (A~C never observed); min-id
    survivor keeps exactly one doc per cluster; disjoint pairs stay
    separate clusters; pair order (doc_a > doc_b) doesn't matter."""
    from xlink_spark.operators.dedup import neardup_clusters

    pairs = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("x", "y")], ["doc_a", "doc_b"]
    )
    out = sorted(map(tuple, neardup_clusters(pairs).collect()))
    assert out == [
        ("a", "a", True),
        ("b", "a", False),
        ("c", "a", False),
        ("x", "x", True),
        ("y", "x", False),
    ]
    # exactly one survivor per cluster
    kept = [d for d, _, k in out if k]
    assert kept == ["a", "x"]


def test_histogram_quantiles_hand_values(spark):
    """Quantile p = lower bucket edge of the first cumulative bucket
    reaching ceil(p·n); NULLs excluded from n; duplicates counted."""
    from xlink_spark.operators.textstats import histogram_quantiles

    rows = [(v,) for v in [0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]]
    rows.append((None,))
    df = spark.createDataFrame(rows, "v double")
    out = {
        r["p_micro"]: (r["rank"], r["bucket"], r["q"])
        for r in histogram_quantiles(df, "v", [500000, 900000, 1000000]).collect()
    }
    # n = 10 (NULL excluded): p50 → rank 5 → 5th sorted value 0.4;
    # p90 → rank 9 → 0.8; p100 → rank 10 → 0.9
    assert out[500000] == (5, 400000, 0.4)
    assert out[900000] == (9, 800000, 0.8)
    assert out[1000000] == (10, 900000, 0.9)

    # duplicate mass: 7×0.2 and 3×0.8 → p50 lands inside the 0.2 bucket
    dup = spark.createDataFrame([(0.2,)] * 7 + [(0.8,)] * 3, "v double")
    d = {
        r["p_micro"]: r["q"]
        for r in histogram_quantiles(dup, "v", [500000, 800000]).collect()
    }
    assert d[500000] == 0.2 and d[800000] == 0.8


def test_paragraph_dedup_hand_values(spark):
    """Keep-first paragraph dedup: cross-doc repeats keep the min
    (doc_id, pos) copy, within-doc repeats keep the earliest, all-repeat
    docs and NULL-text docs SURVIVE as empty text, empty paragraphs are
    structural (never deduped), and reassembly preserves order."""
    from xlink_spark.operators.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [
            (1, "alpha\n\nshared one\n\nbeta"),
            (2, "shared one\n\ngamma\n\nshared one"),
            (3, "shared one"),
            (4, "delta\n\n\n\nepsilon"),
            (5, None),
            (6, "zeta\n\nzeta"),
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r["text"] for r in paragraph_dedup(docs).collect()}
    assert out == {
        1: "alpha\n\nshared one\n\nbeta",
        2: "gamma",
        3: "",
        4: "delta\n\n\n\nepsilon",
        5: "",
        6: "zeta",
    }


def test_paragraph_dedup_min_chars_floor(spark):
    """Paragraphs under min_chars are structural — repeated short headers
    stay in every doc; longer repeats still dedup."""
    from xlink_spark.operators.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [(1, "hi\n\nlong shared paragraph"), (2, "hi\n\nlong shared paragraph")],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in paragraph_dedup(docs, min_chars=5).collect()
    }
    assert out == {1: "hi\n\nlong shared paragraph", 2: "hi"}


def test_histogram_drift_hand_values_and_invariants(spark):
    """PSI drift on hand-checkable histograms: identical snapshots give
    zero everywhere; a moved bucket yields the textbook (rc-rp)*ln(rc/rp)
    contribution in floored micro-units; missing buckets clamp to the
    integer epsilon instead of ln(0)."""
    import math

    from xlink_spark.operators.textstats import histogram_drift

    mk = lambda buckets: spark.createDataFrame([(b,) for b in buckets], "bucket long")

    # identical distributions -> psi_micro == 0 on every row
    same = [1] * 60 + [2] * 40
    out = histogram_drift(mk(same), mk(same)).collect()
    assert all(r["psi_micro"] == 0 for r in out)

    # 60/40 -> 50/50: per-bucket contribution floor((rc-rp)*ln(rc/rp))
    prev, cur = mk([1] * 60 + [2] * 40), mk([1] * 50 + [2] * 50)
    rows = {r["bucket"]: r for r in histogram_drift(prev, cur).collect()}
    assert rows[1]["prev_ppm"] == 600000 and rows[1]["cur_ppm"] == 500000
    exp1 = math.floor((500000 - 600000) * math.log(500000 / 600000))
    assert rows[1]["psi_micro"] == exp1 and exp1 > 0
    exp2 = math.floor((500000 - 400000) * math.log(500000 / 400000))
    assert rows[2]["psi_micro"] == exp2
    # total PSI for a 10-point two-bucket swing ~ 0.0405*1e6 of micro units
    total = sum(r["psi_micro"] for r in rows.values()) / 1e6
    assert 0.03 < total < 0.05

    # bucket present only on one side: the other side clamps to floor_ppm,
    # never ln(0)/division-by-zero
    rows2 = {
        r["bucket"]: r
        for r in histogram_drift(mk([1] * 10), mk([1] * 9 + [9])).collect()
    }
    assert rows2[9]["prev_ppm"] == 100  # clamped epsilon
    assert rows2[9]["psi_micro"] > 0


def test_image_info_header_sniffing_all_formats(spark):
    """Header-only dimension extraction for JPEG/PNG/GIF/BMP from
    hand-built minimal containers — JPEG requires walking past non-frame
    markers to SOF0; truncated and foreign payloads become typed
    decode_error DATA rows."""
    import struct

    from xlink_spark.operators.multimodal import image_info

    def jpeg(w, h):
        # SOI + APP0 + a DHT segment (must be SKIPPED) + SOF0 + EOI
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        dht = b"\xff\xc4" + struct.pack(">H", 5) + b"\x00\x00\x00"
        sof = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(
            ">HH", h, w
        ) + b"\x03\x01\x11\x00"
        return b"\xff\xd8" + app0 + dht + sof + b"\xff\xd9"

    def png(w, h):
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13)
            + b"IHDR"
            + struct.pack(">II", w, h)
            + b"\x08\x02\x00\x00\x00"
        )

    def gif(w, h):
        return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 6

    def bmp(w, h):
        # "BM" + 12 header bytes + DIB size 40 (BITMAPINFOHEADER) + i32 dims
        return (
            b"BM" + b"\x00" * 12 + struct.pack("<I", 40)
            + struct.pack("<ii", w, h) + b"\x00" * 8
        )

    def bmp_core(w, h):
        # BITMAPCOREHEADER: DIB size 12 at offset 14, u16 dims at 18/20,
        # then u16 planes=1 / u16 bpp=8 — the bytes that would misparse as
        # garbage i32 dims if the DIB size were not dispatched on
        return (
            b"BM" + b"\x00" * 12
            + struct.pack("<I", 12)
            + struct.pack("<HHHH", w, h, 1, 8)
        )

    def jpeg_fill(w, h):
        # spec-valid: 0xFF fill byte padding before the SOF marker
        sof = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(
            ">HH", h, w
        ) + b"\x03\x01\x11\x00"
        return b"\xff\xd8" + b"\xff" + sof + b"\xff\xd9"

    rows = [
        ("j", jpeg(640, 480)), ("p", png(320, 200)), ("g", gif(16, 8)),
        ("b", bmp(32, 24)), ("bneg", bmp(10, -20)),  # top-down BMP: |h|
        ("bcore", bmp_core(100, 10)),                # OS/2 core header
        ("jfill", jpeg_fill(12, 34)),                # 0xFF fill padding
        ("bdib16", b"BM" + b"\x00" * 12 + struct.pack("<I", 16) + b"\x00" * 10),
        ("trunc", b"\x89PNG\r\n\x1a\n\x00\x00"), ("alien", b"RIFFxxxxWEBP"),
        ("null", None),
    ]
    media = spark.createDataFrame(rows, "media_ref string, payload binary")
    out = {r["media_ref"]: r for r in image_info(media).collect()}
    assert (out["j"]["format"], out["j"]["width"], out["j"]["height"]) == ("jpeg", 640, 480)
    assert (out["p"]["format"], out["p"]["width"], out["p"]["height"]) == ("png", 320, 200)
    assert (out["g"]["format"], out["g"]["width"], out["g"]["height"]) == ("gif", 16, 8)
    assert (out["b"]["format"], out["b"]["width"], out["b"]["height"]) == ("bmp", 32, 24)
    assert out["bneg"]["height"] == 20
    assert (out["bcore"]["format"], out["bcore"]["width"], out["bcore"]["height"]) == ("bmp", 100, 10)
    assert (out["jfill"]["format"], out["jfill"]["width"], out["jfill"]["height"]) == ("jpeg", 12, 34)
    assert out["bdib16"]["decode_error"] is not None  # unsupported DIB size
    for bad in ("trunc", "alien", "null"):
        assert out[bad]["decode_error"] is not None and out[bad]["format"] is None
    assert out["j"]["n_bytes"] == len(jpeg(640, 480))
