"""Similarity search + geometry operator tests."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from stateful_spark_streaming_spark.operators import geometry as GEO
from stateful_spark_streaming_spark.operators import similarity as SIM
from stateful_spark_streaming_spark.sources.tables import load_table


def test_cosine_topk_exact(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # closest to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [0.5, 0.5, 0.0]),
        (4, [-1.0, 0.0, 0.0]),  # opposite
    ]
    df = spark.createDataFrame([Row(vec_id=i, embedding=v) for i, v in vecs])
    out = SIM.cosine_topk_bruteforce(df, df.filter("vec_id = 0"), k=3).collect()
    order = [r.neighbor_id for r in sorted(out, key=lambda r: r.rank)]
    assert order == [1, 3, 2]
    assert out[0].cosine <= 1.0


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = SIM.cosine_topk_bruteforce(emb, queries, k=5).collect()
    approx = SIM.ivf_topk(emb, queries, k=5, n_centroids=8, nprobe=3).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    hit = tot = 0
    for r in approx:
        tot += 1
        if r.neighbor_id in exact_sets.get(r.query_id, set()):
            hit += 1
    assert tot > 0
    assert hit / tot >= 0.5, f"IVF recall degraded: {hit}/{tot}"


def test_lsh_pairs_subset_of_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    exact = {(r.id_a, r.id_b) for r in SIM.cosine_near_pairs(emb, 0.4).collect()}
    lsh = {
        (r.id_a, r.id_b)
        for r in SIM.cosine_near_pairs_lsh(emb, 0.4, n_planes=4, n_tables=8).collect()
    }
    assert lsh <= exact, "LSH output is exact-verified → subset of brute force"


def test_srp_plane_count_sizing_rule():
    # clamp floor below/at target, log2 growth above, int64-safe cap
    assert SIM.srp_plane_count(0) == 4
    assert SIM.srp_plane_count(8) == 4
    assert SIM.srp_plane_count(500) == 6  # sf0.01 gate corpus
    assert SIM.srp_plane_count(2_000) == 8  # sf0.1 gate corpus
    assert SIM.srp_plane_count(200_000) == 15  # ann_probe 100× tier
    assert SIM.srp_plane_count(2_000_000) == 18  # ann_probe 1000× tier
    assert SIM.srp_plane_count(8 << 40) == 32  # cap: shifts stay in int64
    # exact power-of-two boundary: 8·2^k → exactly k planes (IEEE log2
    # of a power of two is exact, so ceil cannot jump engines)
    assert SIM.srp_plane_count(8 * 1024) == 10
    # the verify-budget invariant: expected bucket never exceeds 2×target
    for n in (10, 1_000, 123_456, 10**7, 10**9):
        p = SIM.srp_plane_count(n)
        if p < 32:  # below the cap the rule must hold
            assert n / (1 << p) <= 8, (n, p)


def test_lsh_auto_sizing_planted_duplicate_recall(spark):
    """The r10 verdict's cliff, as a regression net — updated for the r13
    exact-duplicate decomposition, which SPLIT the planted population in
    two: byte-identical duplicates expand in-group and are now immune to
    the hot-bucket cap at ANY depth, while NEAR-duplicates (distinct
    vectors) still live or die by their banded buckets surviving the cap
    — so the pinned-depth run finds exactly the exact-dup pairs and
    misses the planted near-dup, and the self-sized default finds both."""
    import numpy as np

    rng = np.random.default_rng(7)
    n_base, n_dup, dim = 6_000, 50, 16
    base = rng.standard_normal((n_base, dim))
    near = base[0] + 1e-4 * rng.standard_normal(dim)  # cosine ≈ 1 − 1e-8
    rows = [
        Row(vec_id=i, embedding=[float(x) for x in base[i]]) for i in range(n_base)
    ] + [
        Row(vec_id=n_base + j, embedding=[float(x) for x in base[j]])
        for j in range(n_dup)
    ] + [Row(vec_id=n_base + n_dup, embedding=[float(x) for x in near])]
    emb = spark.createDataFrame(rows).repartition(8)
    planted = {(j, n_base + j) for j in range(n_dup)}
    near_pair = (0, n_base + n_dup)
    # tight cap makes the banded cliff reproducible at test scale: pinned
    # 4 planes → 16 buckets/table for ~6 000 DISTINCT vectors → every
    # bucket ~378 rows, all dropped (the measured 2 M-vector behavior) —
    # but the r13 in-group expand keeps every EXACT duplicate regardless
    pinned = SIM.cosine_near_pairs_lsh(
        emb, threshold=0.999, n_planes=4, n_tables=4, max_bucket_size=100
    )
    got_pinned = {(r.id_a, r.id_b) for r in pinned.collect()}
    assert got_pinned == planted, (
        "pinned tiny-SF depth must keep exact duplicates (in-group expand) "
        "and lose every banded candidate to the cap"
    )
    # self-sized with the operator-default verify budget
    # (target_bucket_rows=8, cap 100 ≈ 12× headroom):
    # ceil(log2(6000/8)) = 10 planes → 1024 buckets/table, expected
    # bucket ~6 rows ≪ cap → the near-dup's buckets survive.  An EXPECTED
    # bucket near the cap would still drop the fat tail of the sign-
    # bucket distribution — headroom is part of the sizing rule.
    auto = SIM.cosine_near_pairs_lsh(
        emb, threshold=0.999, n_tables=4, max_bucket_size=100, target_bucket_rows=8
    )
    found = {
        (r.id_a, r.id_b) for r in auto.filter(F.col("cosine") >= 0.999999).collect()
    }
    assert planted <= found, (
        f"auto-sizing missed {len(planted - found)}/{n_dup} planted duplicates"
    )
    assert near_pair in found, "auto-sizing must find the planted NEAR-dup"


def test_ivf_index_persist_roundtrip(spark, sf_dir, tmp_path):
    """Persisted index probes must return exactly what the inline-built
    index returns (same seed/determinism), and loading must not retrain."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    idx_path = str(tmp_path / "ivf")
    index = SIM.ivf_build_or_load(emb, idx_path, n_centroids=8)
    assert (tmp_path / "ivf" / "centroids.json").exists()
    got = SIM.ivf_topk(emb, queries, k=5, nprobe=3, index=index).collect()
    index2 = SIM.ivf_build_or_load(emb, idx_path, n_centroids=8)  # load path
    got2 = SIM.ivf_topk(emb, queries, k=5, nprobe=3, index=index2).collect()
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    assert sorted(got, key=key) == sorted(got2, key=key)
    inline = SIM.ivf_topk(emb, queries, k=5, nprobe=3).collect()
    assert sorted(got, key=key) == sorted(inline, key=key)


def test_cosine_near_pairs_size_guard(spark, sf_dir):
    """Over the broadcast budget the exact baseline must neither OOM nor
    raise: it switches to the distributed blocked tier (no driver funnel)
    and says so via last_tier."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = SIM.cosine_near_pairs(emb, 0.4, max_broadcast_vectors=10)
    assert SIM.cosine_near_pairs.last_tier == "blocked"
    assert out.count() > 0


def test_unit_vectors(spark):
    df = spark.createDataFrame([Row(vec_id=1, embedding=[3.0, 4.0])])
    out = SIM.with_unit_vectors(df).collect()[0]
    assert abs(out.unit_vec[0] - 0.6) < 1e-12
    assert abs(out.unit_vec[1] - 0.8) < 1e-12


def test_web_mercator_known_points(spark):
    df = spark.createDataFrame([Row(longitude=0.0, latitude=0.0),
                                Row(longitude=180.0, latitude=0.0)])
    out = GEO.project_web_mercator(df).collect()
    assert abs(out[0].geometry.x) < 1e-9 and abs(out[0].geometry.y) < 1e-9
    assert abs(out[1].geometry.x - 20037508.34) < 0.01  # half circumference


def test_null_geometry_and_registry(spark):
    df = spark.createDataFrame([Row(longitude=1.0, latitude=2.0)])
    pts = GEO.apply_tool(df, "MakePoint")
    assert pts.collect()[0].geometry.x == 1.0
    nulled = GEO.apply_tool(pts, "NullGeometry")
    assert nulled.collect()[0].geometry is None
    with pytest.raises(KeyError):
        GEO.apply_tool(df, "NoSuchTool")


def test_geodesic_buffer_radius(spark):
    df = spark.createDataFrame([Row(longitude=-79.5857, latitude=34.2655)])
    out = GEO.geodesic_buffer(df, distance_m=100.0, n_points=16).collect()[0]
    ring = out.buffer_ring
    assert len(ring) == 16
    # haversine check: every ring point ~100 m from center
    R = 6371008.8
    for p in ring:
        dlat = math.radians(p.y - 34.2655)
        dlon = math.radians(p.x + 79.5857)
        a = (math.sin(dlat / 2) ** 2
             + math.cos(math.radians(34.2655)) * math.cos(math.radians(p.y))
             * math.sin(dlon / 2) ** 2)
        d = 2 * R * math.asin(math.sqrt(a))
        assert abs(d - 100.0) < 1.0, f"ring point {d} m from center"


def test_multimodal_real_decode_roundtrip():
    """The PPM codec is real: encode → decode reproduces exact pixels."""
    import numpy as np

    from stateful_spark_streaming_spark.operators import multimodal as MM

    px = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    assert (MM.decode_ppm(MM.encode_ppm(px)) == px).all()
    feats = MM._image_features(MM.encode_ppm(np.full((2, 2, 3), 255, np.uint8)))
    # an all-white image: channel means 1.0, stds 0.0, top histogram bin 1.0
    assert feats[0] == feats[1] == feats[2] == 1.0
    assert feats[3] == feats[4] == feats[5] == 0.0
    assert feats[-1] == 1.0


def test_multimodal_features_deterministic(spark, sf_dir):
    from stateful_spark_streaming_spark.operators import multimodal as MM

    docs = load_table(spark, sf_dir, "documents").limit(20)
    images = MM.synthesize_image_table(spark, docs)
    a = {r.image_id: r.features for r in MM.extract_image_features(images).collect()}
    b = {r.image_id: r.features for r in MM.extract_image_features(images).collect()}
    assert a == b, "decode kernel is deterministic"
    assert all(len(v) == MM.FEATURE_DIM for v in a.values())


def test_multimodal_resize_and_video_frames(spark, sf_dir):
    import numpy as np

    from stateful_spark_streaming_spark.operators import multimodal as MM

    docs = load_table(spark, sf_dir, "documents").limit(8)
    images = MM.synthesize_image_table(spark, docs)
    small = MM.resize_nearest(images, 16, 12).collect()
    assert all(r.width == 16 and r.height == 12 for r in small)
    for r in small:
        assert MM.decode_ppm(r.data).shape == (12, 16, 3)

    # "video" = 5 concatenated PPM frames; sample every 2nd → frames 0,2,4
    frames = [
        MM.encode_ppm(np.full((3, 4, 3), i * 10, np.uint8)) for i in range(5)
    ]
    vids = spark.createDataFrame(
        [(1, b"".join(frames))], ["video_id", "data"]
    )
    got = MM.sample_video_frames(vids, every_n=2).collect()
    assert [r.frame_idx for r in got] == [0, 2, 4]
    assert MM.decode_ppm(got[1].frame)[0, 0, 0] == 20

    # honest boundary: a JPEG-ish blob must refuse, not pretend
    jpeg = spark.createDataFrame([(2, b"\xff\xd8\xff\xe0fakejpeg")],
                                 ["image_id", "data"])
    with pytest.raises(Exception, match="PPM|imaging"):
        MM.extract_image_features(jpeg).collect()


def test_ivf_recall_at_catalog_defaults_sf01(spark):
    """Evidence for the catalog's IVF defaults (C=8, nprobe=2, k=5) at the
    bench SF: recall@5 vs brute force on the same 20-query probe set the
    cosine_topk_ivf catalog entry uses.  Measured 0.65 at nprobe=2 (0.72 at
    nprobe=3) on sf0.1 — the floor asserts the defaults never silently
    degrade, and nprobe monotonicity shows the knob works."""
    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = SIM.cosine_topk_bruteforce(emb, queries, k=5).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)

    def recall(nprobe):
        rows = SIM.ivf_topk(emb, queries, k=5, n_centroids=8, nprobe=nprobe).collect()
        hit = sum(1 for r in rows if r.neighbor_id in exact_sets.get(r.query_id, set()))
        return hit / len(rows)

    r2, r3 = recall(2), recall(3)
    assert r2 >= 0.55, f"IVF recall@5 at catalog defaults degraded: {r2:.3f}"
    assert r3 >= r2, f"nprobe=3 recall {r3:.3f} below nprobe=2 {r2:.3f}"


def test_cosine_near_pairs_blocked_tier_matches_broadcast(spark, sf_dir):
    """The distributed blocked tier (forced via a tiny broadcast bound)
    must produce the exact same pair set as the broadcast tier — including
    cross-block pairs where the side-0 id is larger (hash blocking gives
    no id order across blocks), and each run must report its tier."""
    emb = load_table(spark, sf_dir, "embeddings")
    want = {(r.id_a, r.id_b, r.cosine) for r in SIM.cosine_near_pairs(emb, 0.4).collect()}
    assert SIM.cosine_near_pairs.last_tier == "broadcast"
    got = {
        (r.id_a, r.id_b, r.cosine)
        for r in SIM.cosine_near_pairs(emb, 0.4, max_broadcast_vectors=100).collect()
    }
    assert SIM.cosine_near_pairs.last_tier == "blocked"
    assert got == want
    assert len(got) > 0


def test_pq_codes_shape_and_range(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    books = SIM.pq_train(emb, m=8, ks=16)
    assert len(books) == 8 and len(books[0]) == 16 and len(books[0][0]) == 8
    codes = SIM.pq_encode(emb, books).collect()
    assert len(codes) == emb.count()
    for r in codes[:50]:
        assert len(r.codes) == 8
        assert all(0 <= c < 16 for c in r.codes)


def test_pq_reconstruction_mse_decreases_with_codebook_size(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    mses = []
    for ks in (4, 16, 64):
        books = SIM.pq_train(emb, m=8, ks=ks)
        mses.append(
            SIM.pq_reconstruction_mse(emb, books).agg(F.avg("mse")).first()[0]
        )
    assert mses[0] > mses[1] > mses[2], f"MSE must fall with ks: {mses}"


def test_pq_topk_recall_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter("vec_id < 20")
    truth: dict = {}
    for r in SIM.cosine_topk_bruteforce(emb, q, k=5).collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    out = SIM.pq_topk(emb, q, k=5, m=8, ks=64).collect()
    got: dict = {}
    for r in out:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
        assert r.neighbor_id != r.query_id
    recall = sum(len(truth[i] & got.get(i, set())) for i in truth) / sum(
        len(v) for v in truth.values()
    )
    # random baseline is ~5/500 = 0.01 on these synthetic unstructured
    # vectors; measured 0.34 with m=8/ks=64 — assert well clear of chance
    # with headroom for box-to-box numeric drift
    assert recall >= 0.2, f"recall@5 {recall}"
    # per-query contract: exactly k ranked rows, ranks 1..k
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())


def test_ivfpq_equals_pq_at_full_probe(spark, sf_dir):
    """IVFADC with nprobe = n_centroids and shared codebooks must equal
    plain PQ-ADC exactly (ranks and scores) — the exactness anchor that
    pins the composition's plumbing (cell masks, LUTs, tie-breaks)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter("vec_id < 20")
    books = SIM.pq_train(emb, m=8, ks=64)
    pq = {
        (r.query_id, r.rank, r.neighbor_id, r.approx_cosine)
        for r in SIM.pq_topk(emb, q, k=5, m=8, ks=64, codebooks=books).collect()
    }
    full = {
        (r.query_id, r.rank, r.neighbor_id, r.approx_cosine)
        for r in SIM.ivfpq_topk(
            emb, q, k=5, n_centroids=8, nprobe=8, m=8, ks=64, codebooks=books
        ).collect()
    }
    assert pq == full and len(pq) == 100


def test_ivfpq_recall_above_chance(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter("vec_id < 20")
    truth: dict = {}
    for r in SIM.cosine_topk_bruteforce(emb, q, k=5).collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    out = SIM.ivfpq_topk(emb, q, k=5, n_centroids=8, nprobe=2, m=8, ks=64).collect()
    got: dict = {}
    for r in out:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    recall = sum(len(truth[i] & got.get(i, set())) for i in truth) / sum(
        len(v) for v in truth.values()
    )
    # measured 0.31 (vs ~0.01 chance); nprobe=2/8 costs little over pure
    # PQ's 0.34 on these unstructured vectors
    assert recall >= 0.15, f"recall@5 {recall}"


def test_cosine_near_pairs_blocked_handles_empty_blocks(spark):
    """A hash block with zero ids must neither crash the cross-block
    kernel (1-D empty matrix) nor duplicate the populated block's internal
    pairs via the diagonal branch (regression: the branch was chosen by
    side-emptiness, not the group key)."""
    from pyspark.sql import functions as F

    from stateful_spark_streaming_spark.operators.similarity import (
        _cosine_near_pairs_blocked,
        cosine_near_pairs,
    )

    n_blocks = 4
    probe = spark.createDataFrame([(i,) for i in range(60)], ["vec_id"])
    residues = {
        r.vec_id: r.blk
        for r in probe.select(
            "vec_id",
            F.pmod(F.xxhash64("vec_id"), F.lit(n_blocks)).cast("int").alias("blk"),
        ).collect()
    }
    target = residues[0]
    ids = [i for i, b in residues.items() if b == target][:6]
    assert len(ids) >= 3, "need a few ids in one block"
    # near-identical vectors (pairwise cosine ~1) all in ONE block -> the
    # other 3 blocks are empty
    rows = [(i, [1.0, 0.001 * k, 0.0]) for k, i in enumerate(ids)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = sorted(
        (r.id_a, r.id_b)
        for r in _cosine_near_pairs_blocked(
            df, 0.99, "vec_id", "embedding", n_blocks=n_blocks
        ).collect()
    )
    want = sorted(
        (r.id_a, r.id_b)
        for r in cosine_near_pairs(df, threshold=0.99).collect()
    )
    assert cosine_near_pairs.last_tier == "broadcast"
    assert got == want and len(got) == len(set(got)), "no dups, no misses"


def test_pq_and_ivfpq_empty_query_set(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    none = emb.filter("vec_id < 0")
    assert SIM.pq_topk(emb, none, k=5, m=8, ks=16).count() == 0
    assert SIM.ivfpq_topk(emb, none, k=5, m=8, ks=16).count() == 0


def test_sq8_encode_bounds_and_reconstruction(spark, sf_dir):
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    out = SIM.sq8_encode(emb).collect()
    assert len(out) == emb.count()
    raw = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    X = np.array(list(raw.values()))
    mn, mx = X.min(0), X.max(0)
    for r in out[:50]:
        c = np.array([int(x) for x in r.codes.split(",")])
        assert c.min() >= 0 and c.max() <= 255 and len(c) == X.shape[1]
        # dequantize: each value within half a cell of the original
        width = (mx - mn) / 255.0
        deq = mn + c * width
        assert np.all(np.abs(deq - raw[r.vec_id]) <= width * 0.5 + 1e-9)


def test_fixture_tag_invalidates_on_data_change(spark, tmp_path):
    """Derived per-corpus fixtures (IVF index, image table) are cached
    under a tag of (path, mtime, size) — regenerating data at the SAME
    path must change the tag, or a stale index would silently serve
    results for the old corpus."""
    import os
    import shutil
    import time

    from stateful_spark_streaming_spark.queries_catalog import _fixture_tag

    src = "/root/testdata/sf0.001/embeddings.parquet"
    d = str(tmp_path / "sfX")
    os.makedirs(d)
    dst = os.path.join(d, "embeddings.parquet")
    shutil.copy(src, dst)
    t1 = _fixture_tag(d, "embeddings")
    assert t1 == _fixture_tag(d, "embeddings"), "tag is stable"
    # regenerate at the same path: same bytes, new mtime -> NEW tag
    os.utime(dst, (time.time() + 1000, time.time() + 1000))
    t2 = _fixture_tag(d, "embeddings")
    assert t2 != t1, "mtime change must invalidate the fixture tag"
    # missing file degrades to the path (no crash)
    assert _fixture_tag(str(tmp_path / "nope"), "embeddings")


def test_multimodal_golden_checksum():
    """Golden pin of the decode→featurize kernel on a FIXED synthetic image
    (id=42, 8×6, the catalog synth pattern): any change to the pixel
    arithmetic, the luma weights, the histogram binning, or the channel
    order breaks this before it can drift the (pytest-only) float feature
    path — the oracle-less half of the multimodal surface (the integer
    half is gate-checked via the image_stats oracle)."""
    import numpy as np

    from stateful_spark_streaming_spark.operators import multimodal as MM

    y, x, c = np.ogrid[0:6, 0:8, 0:3]
    px = ((42 * 7 + x * 3 + y * 5 + c * 11) % 256).astype(np.uint8)
    blob = MM.encode_ppm(px)
    got = MM._image_features(blob)
    golden = [
        0.2392156863, 0.2823529412, 0.3254901961,       # channel means
        0.042988454, 0.042988454, 0.042988454,          # channel stds
        0.2762964706, 0.042988454,                      # luma mean/std
        0.0, 0.2916666667, 0.7083333333, 0.0, 0.0, 0.0, 0.0, 0.0,  # histogram
    ]
    assert np.allclose(got, golden, atol=1e-9)


def test_multimodal_image_stats_exact(spark):
    """image_stats emits EXACT integers from the real decode — checked
    against an independent numpy derivation for hand-built images,
    including the null-blob row (all-zero stats)."""
    import numpy as np

    from stateful_spark_streaming_spark.operators import multimodal as MM

    imgs = []
    for iid, (w, h) in ((1, (8, 6)), (2, (33, 25))):
        y, x, c = np.ogrid[0:h, 0:w, 0:3]
        px = ((iid * 7 + x * 3 + y * 5 + c * 11) % 256).astype(np.uint8)
        imgs.append((iid, bytearray(MM.encode_ppm(px)), px))
    df = spark.createDataFrame(
        [(i, bytes(b)) for i, b, _ in imgs] + [(3, None)],
        "image_id long, data binary",
    )
    got = {r.image_id: r.asDict() for r in MM.image_stats(df).collect()}
    for iid, blob, px in imgs:
        h, w, _ = px.shape
        sums = px.sum(axis=(0, 1), dtype=np.int64)
        row = got[iid]
        assert (row["width"], row["height"]) == (w, h)
        assert row["n_bytes"] == len(blob)
        assert (row["r_sum"], row["g_sum"], row["b_sum"]) == tuple(map(int, sums))
    assert got[3] == {"image_id": 3, "width": 0, "height": 0, "n_bytes": 0,
                      "r_sum": 0, "g_sum": 0, "b_sum": 0}


def test_ivf_append_equals_rebuild_assignment(spark, sf_dir, tmp_path):
    """Incremental append under frozen centroids: (a) appended vectors
    land in exactly the cells a fresh assignment with the same centroids
    gives them (set-equality of the whole index), and (b) a probe whose
    query IS an appended vector finds it at rank 1."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 0)
    new = emb.filter(F.col("vec_id") % 5 == 0)
    idx = str(tmp_path / "ivf_app")
    SIM.ivf_build_or_load(base, idx, n_centroids=8)
    assigned, cents = SIM.ivf_append(new, idx)

    want = {
        (r.vec_id, r.cell)
        for r in SIM._assign_cells(emb, np.asarray(cents), "vec_id", "embedding")
        .select("vec_id", "cell")
        .collect()
    }
    got = {(r.vec_id, r.cell) for r in assigned.select("vec_id", "cell").collect()}
    assert got == want

    probe = new.filter(F.col("vec_id") == new.agg(F.min("vec_id")).first()[0])
    top = SIM.ivf_topk(emb, probe, k=3, nprobe=2, index=(assigned, cents)).collect()
    qid = probe.first()["vec_id"]
    # self-match is excluded by ivf_topk; instead assert the appended
    # vector is probe-REACHABLE: it appears as a neighbor of some base
    # query probing its cell
    base_q = base.limit(50)
    hits = SIM.ivf_topk(emb, base_q, k=5, nprobe=8, index=(assigned, cents))
    appended_ids = {r.vec_id for r in new.select("vec_id").collect()}
    assert appended_ids & {r.neighbor_id for r in hits.collect()}, (
        "appended vectors must be reachable by probes"
    )
    assert len(top) > 0


def test_streaming_ivf_ingest_equals_batch_append(spark, sf_dir, tmp_path):
    """Streamed appends across 2 micro-batches produce the same index an
    offline append produces, and the returned frame id-dedupes replayed
    appends (crash between append and checkpoint commit)."""
    import glob
    import os
    import shutil

    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_ivf_ingest,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 0)
    new = emb.filter(F.col("vec_id") % 5 == 0)
    idx = str(tmp_path / "ivf_stream")
    SIM.ivf_build_or_load(base, idx, n_centroids=8)

    src = str(tmp_path / "vec_stream")
    os.makedirs(src, exist_ok=True)
    mt = os.stat(src).st_mtime
    for i, cond in enumerate([F.col("vec_id") % 10 == 0, F.col("vec_id") % 10 == 5]):
        seg = str(tmp_path / f"vseg{i}")
        new.filter(cond).coalesce(1).write.mode("overwrite").parquet(seg)
        f = glob.glob(os.path.join(seg, "part-*.parquet"))[0]
        dst = os.path.join(src, f"{i:03d}.parquet")
        shutil.copy(f, dst)
        os.utime(dst, (mt + i * 10, mt + i * 10))

    assigned, cents = run_streaming_ivf_ingest(
        spark, src, idx, checkpoint_dir=str(tmp_path / "ckpt_ing"),
        max_files_per_trigger=1,
    )
    import numpy as np

    want = {
        (r.vec_id, r.cell)
        for r in SIM._assign_cells(emb, np.asarray(cents), "vec_id", "embedding")
        .select("vec_id", "cell")
        .collect()
    }
    got = {(r.vec_id, r.cell) for r in assigned.select("vec_id", "cell").collect()}
    assert got == want

    # simulate a replayed append: duplicate one cell file, reload via the
    # ingest entry (zero new micro-batches) — id-dedupe must hold
    cells_dir = os.path.join(idx, "cells")
    dup_src = glob.glob(os.path.join(cells_dir, "cell=*", "part-*.parquet"))[0]
    shutil.copy(dup_src, dup_src.replace("part-", "replay-part-"))
    assigned2, _ = run_streaming_ivf_ingest(
        spark, src, idx, checkpoint_dir=str(tmp_path / "ckpt_ing"),
        max_files_per_trigger=1,
    )
    got2 = {(r.vec_id, r.cell) for r in assigned2.select("vec_id", "cell").collect()}
    assert got2 == want
    assert assigned2.groupBy("vec_id").count().filter("count > 1").count() == 0


def test_ivf_retrain_folds_appends_and_holds_recall(spark, sf_dir, tmp_path):
    """The append-then-retrain lifecycle closed (VERDICT r5 #7): after N
    appends under frozen centroids — including a replayed (duplicate)
    append — ivf_retrain rebuilds centroids from the GROWN corpus,
    physically folds duplicate ids, swaps generations atomically, and
    recall@5 under retrained centroids does not degrade vs frozen."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 3 == 0)  # skewed bootstrap corpus
    new = emb.filter(F.col("vec_id") % 3 != 0)
    idx = str(tmp_path / "ivf_rt")
    SIM.ivf_build_or_load(base, idx, n_centroids=8)
    SIM.ivf_append(new, idx)
    SIM.ivf_append(new, idx)  # replayed append: duplicate ids in the log

    queries = emb.filter(F.col("vec_id") < 10)
    exact = {}
    for r in SIM.cosine_topk_bruteforce(emb, queries, k=5).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)

    def recall(index):
        # probe frame id-deduped, as the ingest path's contract states
        assigned, cents = index
        deduped = (assigned.dropDuplicates(["vec_id"]), cents)
        hit = tot = 0
        for r in SIM.ivf_topk(emb, queries, k=5, nprobe=3, index=deduped).collect():
            tot += 1
            hit += r.neighbor_id in exact.get(r.query_id, set())
        return hit / tot

    frozen = recall(SIM.ivf_load_index(spark, idx))
    n_total = emb.count()
    retrained_index = SIM.ivf_retrain(spark, idx)
    assigned_rt, cents_rt = retrained_index

    # physical fold: one row per id, no .old/.retrain generations left
    assert assigned_rt.count() == n_total
    assert assigned_rt.groupBy("vec_id").count().filter("count > 1").count() == 0
    import os

    assert not os.path.exists(idx + ".retrain") and not os.path.exists(idx + ".old")
    # retrained assignments are exactly a fresh assignment under the new
    # centroids (generation is internally consistent)
    want = {
        (r.vec_id, r.cell)
        for r in SIM._assign_cells(emb, np.asarray(cents_rt), "vec_id", "embedding")
        .select("vec_id", "cell")
        .collect()
    }
    got = {(r.vec_id, r.cell) for r in assigned_rt.select("vec_id", "cell").collect()}
    assert got == want

    retrained = recall(retrained_index)
    # measured drift: centroids trained on the skewed third must not beat
    # centroids retrained on the full corpus by more than noise
    assert retrained >= frozen - 0.1, (
        f"recall drifted the wrong way: frozen={frozen:.3f} "
        f"retrained={retrained:.3f}"
    )
    assert retrained >= 0.4, f"retrained recall floor: {retrained:.3f}"


def test_ivf_append_rejects_schema_drift(spark, sf_dir, tmp_path):
    """A frame with extra or missing columns must raise — mixed-schema
    cell files would silently drop or null columns on read depending on
    which file wins schema inference (ADVICE r5)."""
    import pytest

    emb = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivf_schema")
    SIM.ivf_build_or_load(emb.filter(F.col("vec_id") % 2 == 0), idx, n_centroids=4)
    bad = emb.filter(F.col("vec_id") % 2 == 1).withColumn("extra", F.lit(1))
    with pytest.raises(ValueError, match="schema mismatch"):
        SIM.ivf_append(bad, idx)
    missing = emb.filter(F.col("vec_id") % 2 == 1).drop("label")
    with pytest.raises(ValueError, match="schema mismatch"):
        SIM.ivf_append(missing, idx)


def test_streaming_ivf_ingest_requires_existing_index(spark, sf_dir, tmp_path):
    """A missing index is a clear precondition error BEFORE the stream
    starts — not an exception buried inside a StreamingQuery (ADVICE r5)."""
    import pytest

    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_ivf_ingest,
    )

    src = str(tmp_path / "vecs")
    load_table(spark, sf_dir, "embeddings").limit(5).write.parquet(src)
    with pytest.raises(FileNotFoundError, match="bootstrap"):
        run_streaming_ivf_ingest(
            spark, src, str(tmp_path / "no_such_index"),
            checkpoint_dir=str(tmp_path / "ck"),
        )


def test_streaming_ivf_ingest_recovers_parked_index(spark, sf_dir, tmp_path):
    """ADVICE r6 (medium): a prior ivf_retrain crash mid-swap parks the
    index at .old (live dir missing).  The ingest entry point must run
    generation recovery BEFORE its centroids.json existence check —
    otherwise it tells the caller to re-bootstrap, which would silently
    discard every previously streamed append that recovery restores."""
    import glob
    import os
    import shutil

    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_ivf_ingest,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 0)
    new = emb.filter(F.col("vec_id") % 5 == 0)
    idx = str(tmp_path / "ivf_parked")
    SIM.ivf_build_or_load(base, idx, n_centroids=8)

    # crash state: retrain died after moving live -> .old, before promote
    os.rename(idx, idx + ".old")
    assert not os.path.exists(os.path.join(idx, "centroids.json"))

    src = str(tmp_path / "vsrc")
    os.makedirs(src)
    seg = str(tmp_path / "vseg")
    new.coalesce(1).write.mode("overwrite").parquet(seg)
    shutil.copy(
        glob.glob(os.path.join(seg, "part-*.parquet"))[0],
        os.path.join(src, "000.parquet"),
    )

    assigned, _ = run_streaming_ivf_ingest(
        spark, src, idx, checkpoint_dir=str(tmp_path / "ck_parked")
    )
    got = {r.vec_id for r in assigned.select("vec_id").collect()}
    want = {r.vec_id for r in emb.select("vec_id").collect()}
    assert got == want, "recovery must restore the parked index, then append"
    # reader-grade recovery: roll-forward only, no sibling cleanup needed
    assert os.path.exists(os.path.join(idx, "centroids.json"))


def test_image_ahash_upscale_invariant_and_edges(spark):
    """image_ahash claims: (1) nearest 8x8 downsample makes the hash
    invariant under integer nearest-upscale (floor((j*k*h)/8)//k ==
    floor(j*h/8) -- nested-floor identity), (2) a constant image hashes
    to all zeros (strict > mean), (3) the bit string is row-major."""
    import numpy as np

    from stateful_spark_streaming_spark.operators import multimodal as MM

    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    up = np.kron(base, np.ones((3, 3, 1), dtype=np.uint8))  # 3x nearest upscale
    flat = np.full((8, 8, 3), 77, np.uint8)
    # row-major check: top half bright, bottom half dark -> bits 1 in rows 0-3
    split = np.zeros((8, 8, 3), np.uint8)
    split[:4, :, :] = 255
    df = spark.createDataFrame(
        [(1, bytearray(MM.encode_ppm(base))),
         (2, bytearray(MM.encode_ppm(up))),
         (3, bytearray(MM.encode_ppm(flat))),
         (4, bytearray(MM.encode_ppm(split)))],
        "image_id long, data binary",
    )
    got = {r.image_id: (r.ahash_bits, r.n_set) for r in MM.image_ahash(df).collect()}
    assert got[1] == got[2]
    assert got[3] == ("0" * 64, 0)
    assert got[4] == ("1" * 32 + "0" * 32, 32)


def test_hard_negatives_excludes_same_label(spark):
    """Every mined negative has a different label than its anchor, ranks
    are dense 1..k, and the nearest same-label vector (a positive) never
    appears even when it is the global nearest neighbor."""
    rows = [
        (1, [1.0, 0.0], 0),   # anchor
        (2, [0.999, 0.01], 0),  # nearest overall but SAME label -> excluded
        (3, [0.9, 0.1], 1),
        (4, [0.5, 0.5], 1),
        (5, [0.0, 1.0], 2),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = SIM.hard_negatives(df, df.filter(F.col("vec_id") == 1), k=2).collect()
    assert [(r["rank"], r["negative_id"], r["neg_label"]) for r in got] == [
        (1, 3, 1), (2, 4, 1)
    ]

def test_cosine_near_pairs_slabbed_kernels_exact(spark, sf_dir, monkeypatch):
    """The exact kernels matmul in row slabs so transient score memory is
    bounded by _SCORE_BUDGET_FLOATS regardless of corpus size — the
    unbounded form materialized batch × corpus scores and OOM-killed every
    worker at the 200 k-vector probe (tools/ann_probe.py).  Force a budget
    so small every batch needs MANY slabs (slab = 1–2 rows) and assert
    both tiers still produce the exact pair set."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 400)
    want = sorted(
        map(tuple, SIM.cosine_near_pairs(emb, 0.4).select("id_a", "id_b").collect())
    )
    assert want, "fixture must produce pairs"
    monkeypatch.setattr(SIM, "_SCORE_BUDGET_FLOATS", 500)
    got_b = sorted(
        map(tuple, SIM.cosine_near_pairs(emb, 0.4).select("id_a", "id_b").collect())
    )
    assert SIM.cosine_near_pairs.last_tier == "broadcast"
    got_d = sorted(
        map(
            tuple,
            SIM._cosine_near_pairs_blocked(emb, 0.4, "vec_id", "embedding",
                                           block_rows=150)
            .select("id_a", "id_b").collect(),
        )
    )
    assert got_b == want
    assert got_d == want


def test_srp_table_count_inversion_consistency():
    """The table-count derivation is the exact S-curve inverse: the
    derived L meets the recall target analytically, L−1 misses it
    (unless a floor/cap bound is the binding constraint), and the
    weak-similarity divergence hits the cap — the documented regime
    boundary where sign-LSH hands off to IVF blocking."""
    for n_planes in (6, 8, 10, 14, 18):
        for sim in (0.92, 0.95, 0.99):
            for target in (0.8, 0.9):
                L = SIM.srp_table_count(n_planes, sim=sim, recall_target=target)
                if L < 16:  # not cap-bound
                    assert SIM.srp_table_recall(L, n_planes, sim) >= target
                    if L > 2:  # not floor-bound
                        assert SIM.srp_table_recall(L - 1, n_planes, sim) < target
    # weak-τ divergence: τ=0.4 at the 2 M-vector depth needs hundreds of
    # tables — the derivation must clamp to the cap, never return them
    assert SIM.srp_table_count(18, sim=0.4, recall_target=0.9) == 16


def test_srp_table_count_underflow_clamps_to_cap():
    """Below p ≈ 1.1e-16 (deep hashes at strongly negative sim) log(1-p)
    underflows to 0.0 — the docstring promises the cap absorbs the
    weak-similarity divergence, so this regime must return the cap, not
    raise ZeroDivisionError (ADVICE r12).  Covers both the p == 0
    endpoint (sim = -1) and the subnormal-p underflow band."""
    assert SIM.srp_table_count(32, sim=-1.0) == 16   # p == 0 exactly
    assert SIM.srp_table_count(32, sim=-0.6) == 16   # p underflows log(1-p)
    assert SIM.srp_table_count(32, sim=-0.99) == 16
    # and small-but-representable p still inverts (log1p precision path)
    L = SIM.srp_table_count(18, sim=0.7, recall_target=0.9)
    assert 2 <= L <= 16


def test_srp_table_count_names_the_benched_guarantee():
    """The catalog query pins n_tables=8 (explicit recall/cost trade at
    τ=0.4 widening); this test is the 'test naming its guarantee' the
    r11 verdict required: analytic recall at the duplicate similarity
    (0.95) for every depth the gate/bench/probe actually runs."""
    assert SIM.srp_plane_count(600) == 7       # ~sf0.01
    assert SIM.srp_plane_count(6_000) == 10    # ~sf0.1
    assert SIM.srp_plane_count(2_000_000) == 18  # probe shape
    assert SIM.srp_table_recall(8, 7, 0.95) > 0.97
    assert SIM.srp_table_recall(8, 10, 0.95) > 0.93
    assert SIM.srp_table_recall(8, 18, 0.95) > 0.71
    # and the self-sized default would restore >=0.9 at the probe depth
    L = SIM.srp_table_count(18, sim=0.95, recall_target=0.9)
    assert SIM.srp_table_recall(L, 18, 0.95) >= 0.9


def test_lsh_table_sizing_planted_near_duplicate_recall(spark):
    """Empirical floor for the analytic claim: plant NEAR-duplicates
    (cos ≈ 0.95 — the n_tables knob's regime; exact duplicates collide
    at any L) and assert the self-sized default recovers at least
    (analytic recall − sampling margin) of them.  Deterministic: seeded
    corpus, md5-derived planes."""
    import numpy as np

    rng = np.random.default_rng(11)
    n_base, n_dup, dim = 6_000, 50, 16
    base = rng.standard_normal((n_base, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    planted = []
    for j in range(n_dup):
        v = base[j]
        # orthogonal perturbation sized for cos(v, dup) ≈ 0.95 exactly
        r = rng.standard_normal(dim)
        r -= (r @ v) * v
        r /= np.linalg.norm(r)
        dup = 0.95 * v + np.sqrt(1 - 0.95**2) * r
        planted.append(dup)
    rows = [
        Row(vec_id=i, embedding=[float(x) for x in base[i]]) for i in range(n_base)
    ] + [
        Row(vec_id=n_base + j, embedding=[float(x) for x in planted[j]])
        for j in range(n_dup)
    ]
    emb = spark.createDataFrame(rows).repartition(8)
    # n_planes self-sizes to 10; n_tables self-sizes at sim=0.95,
    # target 0.9 → analytic recall ≥ 0.9 for the planted pairs
    out = SIM.cosine_near_pairs_lsh(emb, threshold=0.9)
    found = {(r.id_a, r.id_b) for r in out.collect()}
    hits = sum(
        1 for j in range(n_dup)
        if (j, n_base + j) in found or (n_base + j, j) in found
    )
    n_planes = SIM.srp_plane_count(n_base + n_dup)
    L = SIM.srp_table_count(n_planes, sim=0.95, recall_target=0.9)
    analytic = SIM.srp_table_recall(L, n_planes, 0.95)
    # 3-sigma sampling margin on 50 planted pairs
    margin = 3 * (analytic * (1 - analytic) / n_dup) ** 0.5
    assert hits / n_dup >= analytic - margin - 0.05, (
        f"recall {hits}/{n_dup} below analytic {analytic:.3f} − margin"
    )


def test_audio_codec_roundtrip_and_refusals():
    """WAV-PCM16 encode→decode is lossless; non-RIFF containers and
    non-mono-16-bit PCM refuse with NotImplementedError — the loud codec
    boundary, same contract as decode_ppm's non-P6 refusal."""
    import struct

    import numpy as np

    from stateful_spark_streaming_spark.operators import multimodal as MM

    t = np.arange(3000, dtype=np.int64)
    s = (99 * 7 + t * 13) % 4096 - 2048
    got, rate = MM.decode_wav_pcm16(MM.encode_wav_pcm16(s, rate=16000))
    assert rate == 16000 and (got.astype(np.int64) == s).all()
    # int16 extremes survive
    edge = np.array([-32768, 32767, 0, -1, 1], dtype=np.int64)
    got2, _ = MM.decode_wav_pcm16(MM.encode_wav_pcm16(edge))
    assert (got2.astype(np.int64) == edge).all()
    with pytest.raises(NotImplementedError, match="RIFF"):
        MM.decode_wav_pcm16(b"ID3\x03mp3-ish" + b"\x00" * 64)
    stereo = struct.pack(
        "<4sI4s4sIHHIIHH4sI", b"RIFF", 44, b"WAVE", b"fmt ", 16,
        1, 2, 8000, 32000, 4, 16, b"data", 8,
    ) + b"\x00" * 8
    with pytest.raises(NotImplementedError, match="mono 16-bit"):
        MM.decode_wav_pcm16(stereo)


def test_audio_stats_and_frames_match_numpy_reference(spark, sf_dir):
    """The Spark audio kernels, checked against a plain-numpy re-derivation
    over the same synthesized clips: stats exactly, frames exactly
    (trailing partial frame dropped)."""
    import numpy as np

    from stateful_spark_streaming_spark.operators import multimodal as MM
    from stateful_spark_streaming_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(40)
    audio = MM.synthesize_audio_table(spark, docs)
    stats = {r.audio_id: r for r in MM.audio_stats(audio).collect()}
    frames = {}
    for r in MM.audio_frame_energy(audio, frame_len=256).collect():
        frames[(r.audio_id, r.frame_idx)] = (r.energy, r.peak_abs)

    meta = {r.doc_id: r.n_chars % 2000 + 400 for r in docs.collect()}
    assert set(stats) == set(meta)
    n_frames_seen = 0
    for aid, n in meta.items():
        t = np.arange(n, dtype=np.int64)
        s = (aid * 7 + t * 13) % 4096 - 2048
        row = stats[aid]
        assert row.sample_rate == 8000 and row.n_samples == n
        assert row.n_bytes == 44 + 2 * n
        assert row.sum_samples == int(s.sum())
        assert row.sum_abs == int(np.abs(s).sum())
        assert row.peak_abs == int(np.abs(s).max())
        neg = s < 0
        assert row.n_zero_cross == int((neg[1:] != neg[:-1]).sum())
        nf = n // 256
        for f in range(nf):
            fr = s[f * 256 : (f + 1) * 256]
            assert frames[(aid, f)] == (int((fr * fr).sum()), int(np.abs(fr).max()))
            n_frames_seen += 1
    assert n_frames_seen == len(frames)  # no frames beyond full ones


def test_materialized_fixture_atomic_build_and_torn_recovery(spark, tmp_path):
    """The r12 fixture protocol: (1) a build lands via rename so the live
    path is only ever COMPLETE-or-absent; (2) a pre-existing legacy torn
    dir (no _SUCCESS — the shape the old overwrite path could leave) is
    cleared and rebuilt; (3) a second call serves the cache (build runs
    once)."""
    import os
    import shutil

    from stateful_spark_streaming_spark.queries_catalog import (
        _fixture_tag,
        _materialized_fixture,
    )

    d = str(tmp_path / "sf")
    os.makedirs(d)
    spark.createDataFrame(
        [(i, f"t{i}") for i in range(20)], "doc_id long, text string"
    ).write.parquet(os.path.join(d, "documents.parquet"))

    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.read.parquet(os.path.join(d, "documents.parquet"))

    import tempfile as _tf
    prefix = f"test_fx_{os.path.basename(str(tmp_path))}"
    key = _fixture_tag(d, "documents")
    live = os.path.join(_tf.gettempdir(), f"{prefix}_{key}.parquet")
    try:
        # plant a legacy torn dir: files but no _SUCCESS
        os.makedirs(live)
        with open(os.path.join(live, "part-junk.parquet"), "w") as fh:
            fh.write("torn")
        out = _materialized_fixture(spark, d, "documents", prefix, build)
        assert out.count() == 20
        assert calls["n"] == 1
        assert os.path.exists(os.path.join(live, "_SUCCESS"))
        assert not os.path.exists(os.path.join(live, "part-junk.parquet"))
        # cache hit: no rebuild
        out2 = _materialized_fixture(spark, d, "documents", prefix, build)
        assert out2.count() == 20 and calls["n"] == 1
        # no stray build dirs left behind
        strays = [
            p for p in os.listdir(_tf.gettempdir())
            if p.startswith(f"{prefix}_{key}.build_")
        ]
        assert strays == []
    finally:
        shutil.rmtree(live, ignore_errors=True)


def test_video_frame_stats_matches_composed_ops(spark, sf_dir):
    """The fused parse+sample+stats kernel must equal the composition of
    the building blocks it fuses (sample_video_frames → decode_ppm →
    sums) — the performance fusion cannot change semantics."""
    import numpy as np

    from stateful_spark_streaming_spark.operators import multimodal as MM
    from stateful_spark_streaming_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(25)
    videos = MM.synthesize_video_table(spark, docs)
    fused = {
        (r.video_id, r.frame_idx): (r.width, r.height, r.rgb_sum)
        for r in MM.video_frame_stats(videos, every_n=2).collect()
    }
    composed = {}
    for r in MM.sample_video_frames(videos, every_n=2).collect():
        px = MM.decode_ppm(r.frame)
        composed[(r.video_id, r.frame_idx)] = (
            px.shape[1], px.shape[0], int(px.sum(dtype=np.int64))
        )
    assert fused == composed
    # frame-count sanity: every video contributes ceil(n_frames / 2) rows
    nf = {r.doc_id: r.n_chars % 8 + 2 for r in docs.collect()}
    per_vid = {}
    for vid, _ in fused:
        per_vid[vid] = per_vid.get(vid, 0) + 1
    assert per_vid == {v: -(-n // 2) for v, n in nf.items()}


def test_ivf_n_centroids_names_the_benched_guarantee(spark):
    """The last explicit ANN tuning now carries evidence, not only prose
    (r12 verdict #6).  The catalog pins n_centroids=8, nprobe=2; the
    measurable guarantees behind that value (re-measured at 2 k and 2 M
    vectors by the r13 probe — SCALE.md — this test pins them at the
    deterministic small shape):

    1. LAYOUT HEALTH: sample-trained k-means cells are balanced (every
       cell non-empty, max ≤ 2.5× the mean), so nprobe/C = 25% is a REAL
       read fraction, not a skew illusion;
    2. RECALL FLOOR ABOVE THE RANDOM-CELL BASELINE: even on the
       isotropic corpus, angular proximity correlates with cell
       membership, so recall@10 at (C=8, nprobe=2) clears 0.6 — well
       above the nprobe/C = 0.25 a structureless cell assignment would
       give (probe: 0.84 here, 0.65 at the 2 k catalog corpus).
       Deterministic seed, so the band also catches probe-path
       regressions;
    3. EXACTNESS FALLBACK: nprobe = C scans everything and must return
       the brute-force result exactly (same scoring kernel, same ties).
    """
    import numpy as np

    rng = np.random.RandomState(7)
    N, dim, k = 4000, 16, 10
    X = rng.randn(N, dim)
    emb = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(N)],
        "vec_id long, embedding array<double>",
    ).repartition(8)
    queries = emb.filter(F.col("vec_id") < 24)

    # 1. layout health at the benched C
    assigned, _cents = SIM.ivf_build(emb, n_centroids=8)
    occ = {r.cell: r.n for r in assigned.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert len(occ) == 8, f"empty IVF cells at the benched C: {sorted(occ)}"
    assert max(occ.values()) <= 2.5 * N / 8, f"skewed cells: {occ}"

    # 2. recall floor at the benched (C=8, nprobe=2)
    exact = {(r.query_id, r.neighbor_id) for r in
             SIM.cosine_topk_bruteforce(emb, queries, k=k).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in
              SIM.ivf_topk(emb, queries, k=k, n_centroids=8, nprobe=2).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, (
        f"recall@{k} at (C=8, nprobe=2) = {recall:.3f} — below the floor "
        "the benched value carries (measured 0.84 at this seed)"
    )

    # 3. nprobe = C is exact
    full = {(r.query_id, r.neighbor_id) for r in
            SIM.ivf_topk(emb, queries, k=k, n_centroids=8, nprobe=8).collect()}
    assert full == exact


def test_srp_heavy_duplicate_group_is_complete(spark):
    """r13 decomposition regression (embedding twin of the text tests):
    byte-identical vectors share the sign pattern in EVERY table — the
    old row-level form made m-row buckets in all tables and past the
    hot-bucket cap (2000) the whole group emitted ZERO pairs, with no
    n_planes depth able to split an identical-pattern bucket.  2,050
    copies of one vector must emit all 2050·2049/2 cosine-1.0 pairs (the
    in-group expand), a scaled copy (cosine 1.0 up to rounding) must
    pair with every copy, and an all-zero duplicate group must emit
    nothing (NaN cosine, matching the verify kernel)."""
    from stateful_spark_streaming_spark.operators.similarity import (
        cosine_near_pairs_lsh,
    )

    m = 2050
    base = [1.0, 2.0, -0.5, 3.0, 0.25, -1.5, 2.5, 0.75]
    rows = [(i, base) for i in range(m)]
    rows.append((m, [x * 2.0 for x in base]))  # same direction
    rows += [(m + 1 + j, [0.0] * 8) for j in range(2)]  # zero-vector dups
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = cosine_near_pairs_lsh(emb, threshold=0.9, n_tables=2)
    ones = out.filter("id_a < %d and id_b < %d" % (m, m)).count()
    assert ones == m * (m - 1) // 2
    scaled = out.filter("id_b = %d" % m)
    assert scaled.count() == m, "the scaled copy pairs with every copy"
    assert out.filter("id_a > %d or id_b > %d" % (m, m)).count() == 0
    assert out.filter("cosine < 0.999999").count() == 0
