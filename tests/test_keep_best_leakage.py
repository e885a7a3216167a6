"""keep_best (canonical selection) and split_leakage (cross-split
near-dup audit) — crafted-graph tests where the right answer is
hand-checkable, plus the edge cases the catalog oracles can't isolate
(quality tie-break, multi-way splits, empty pair graphs)."""

from __future__ import annotations

from stateful_spark_streaming_spark.operators.dedup import keep_best, split_leakage


def _pairs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_a long, doc_b long, jaccard double"
    )


def _quality(spark, qmap):
    return spark.createDataFrame(
        list(qmap.items()), "doc_id long, quality_score double"
    )


def _docs(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id long")


# ---------------------------------------------------------------------------
# keep_best
# ---------------------------------------------------------------------------


def test_keep_best_picks_highest_quality_not_min_id(spark):
    # cluster {1,2,3} via 1-2, 2-3; best quality is doc 3 (NOT the min id);
    # docs 4 (unpaired) and 5 (pair partner 4? no — unique) stay
    pairs = _pairs(spark, [(1, 2, 0.9), (2, 3, 0.8)])
    q = _quality(spark, {1: 0.5, 2: 0.7, 3: 0.9, 4: 0.1})
    out = {
        r["doc_id"]: (r["cluster_size"], r["reason"])
        for r in keep_best(_docs(spark, [1, 2, 3, 4]), pairs, q).collect()
    }
    assert out == {3: (3, "best_of_cluster"), 4: (1, "unique")}


def test_keep_best_tie_breaks_to_lowest_id(spark):
    pairs = _pairs(spark, [(10, 20, 0.9)])
    q = _quality(spark, {10: 0.8, 20: 0.8})
    out = {r["doc_id"] for r in keep_best(_docs(spark, [10, 20]), pairs, q).collect()}
    assert out == {10}


def test_keep_best_quality_rounding_is_bp_exact(spark):
    # 0.7001 beats 0.7000 — the scaled-integer key must not collapse them
    pairs = _pairs(spark, [(1, 2, 0.9)])
    q = _quality(spark, {1: 0.7000, 2: 0.7001})
    out = {r["doc_id"] for r in keep_best(_docs(spark, [1, 2]), pairs, q).collect()}
    assert out == {2}


def test_keep_best_empty_pair_graph_keeps_everything(spark):
    pairs = _pairs(spark, [])
    q = _quality(spark, {1: 0.5, 2: 0.6})
    out = {
        r["doc_id"]: r["reason"]
        for r in keep_best(_docs(spark, [1, 2]), pairs, q).collect()
    }
    assert out == {1: "unique", 2: "unique"}


def test_keep_best_two_clusters_independent_winners(spark):
    pairs = _pairs(spark, [(1, 2, 0.9), (7, 8, 0.7)])
    q = _quality(spark, {1: 0.2, 2: 0.9, 7: 0.9, 8: 0.2})
    out = {
        r["doc_id"]: r["cluster_size"]
        for r in keep_best(_docs(spark, [1, 2, 7, 8]), pairs, q).collect()
    }
    assert out == {2: 2, 7: 2}


# ---------------------------------------------------------------------------
# split_leakage
# ---------------------------------------------------------------------------


def _split(spark, smap):
    return spark.createDataFrame(
        [(k, v) for k, v in smap.items()], "doc_id long, split string"
    )


def test_split_leakage_both_orientations(spark):
    # eval doc 5 leaks via two train dups (one as doc_a? no — pairs are
    # a<b, so 5 appears as doc_b of (1,5) and doc_a of (5,9))
    pairs = _pairs(spark, [(1, 5, 0.8), (5, 9, 0.7), (1, 9, 0.9)])
    split = _split(spark, {1: "train", 5: "eval", 9: "train"})
    [r] = split_leakage(pairs, split).collect()
    assert (r["doc_id"], r["n_train_dups"], r["max_jaccard"]) == (5, 2, 0.8)


def test_split_leakage_multiway_ignores_train_val_crossings(spark):
    # train-val crossing (1,2) has no eval side and must NOT be reported;
    # val-eval crossing (2,3) IS a leak for eval doc 3
    pairs = _pairs(spark, [(1, 2, 0.9), (2, 3, 0.8)])
    split = _split(spark, {1: "train", 2: "val", 3: "eval"})
    [r] = split_leakage(pairs, split).collect()
    assert (r["doc_id"], r["n_train_dups"]) == (3, 1)


def test_split_leakage_clean_split_is_empty(spark):
    pairs = _pairs(spark, [(1, 2, 0.9)])
    split = _split(spark, {1: "train", 2: "train"})
    assert split_leakage(pairs, split).count() == 0


def test_keep_best_missing_quality_and_string_ids(spark):
    """Two review-found edge cases pinned: (1) a cluster whose members are
    MISSING from the quality frame must not vanish — unscored members rank
    worst but still form a cluster and one wins; (2) ids can be STRINGS:
    the quality tie still breaks to the LOWEST id (a -id struct key would
    cast strings to null and pick arbitrarily)."""
    from stateful_spark_streaming_spark.operators.dedup import keep_best

    docs = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",), ("e",)], "doc_id string"
    )
    pairs = spark.createDataFrame(
        [("a", "b"), ("c", "d")], "doc_a string, doc_b string"
    )
    # cluster {a,b}: equal quality -> tie -> lowest id 'a' wins
    # cluster {c,d}: NEITHER scored -> must still survive, 'c' wins
    # 'e': unique, scored
    quality = spark.createDataFrame(
        [("a", 0.5), ("b", 0.5), ("e", 0.9)], "doc_id string, quality_score double"
    )
    got = {
        r["doc_id"]: (r["cluster_size"], r["reason"])
        for r in keep_best(docs, pairs, quality).collect()
    }
    assert got == {
        "a": (2, "best_of_cluster"),
        "c": (2, "best_of_cluster"),
        "e": (1, "unique"),
    }


# ---------------------------------------------------------------------------
# hamming_keep_best (image-family canonical selection, r12 verdict #3)
# ---------------------------------------------------------------------------


def test_hamming_keep_best_crafted_graph(spark):
    """Hand-checkable: H-0 copies + an H-1 bridge form one cluster whose
    winner is the best-quality member (tie -> lowest id); an isolated
    hash is 'unique'; a NULL hash cannot be compared and stays."""
    from stateful_spark_streaming_spark.operators.dedup import hamming_keep_best

    hashed = spark.createDataFrame(
        [(1, "00000000"), (2, "00000000"), (3, "00000000"),
         (4, "00000001"), (5, "11110000"), (6, None)],
        "img long, bits string",
    )
    qual = spark.createDataFrame(
        [(1, 10.0), (2, 50.0), (3, 50.0), (4, 20.0), (5, 1.0)],
        "img long, q double",
    )
    got = sorted(
        (r.img, r.cluster_size, r.reason)
        for r in hamming_keep_best(
            hashed, "img", "bits", qual, "q", max_ham=2, n_bands=4, nbits=8
        ).collect()
    )
    assert got == [
        (2, 4, "best_of_cluster"),  # {1,2,3,4}; q-tie 2/3 -> min id 2
        (5, 1, "unique"),
        (6, 1, "unique"),           # NULL hash: kept, uncomparable
    ]


def test_hamming_keep_best_equals_pair_composition(spark):
    """The exactness pin the operator's docstring names: on a seeded
    duplicate-heavy corpus, hamming_keep_best == composing the audit
    pair table (hamming_near_pairs) with keep_best — identical retained
    ids, cluster sizes, and reasons — while never building id lists."""
    import random

    from pyspark.sql import functions as F

    from stateful_spark_streaming_spark.operators.dedup import (
        hamming_keep_best,
        hamming_near_pairs,
        keep_best,
    )

    rng = random.Random(13)
    # pool of 8-bit hashes with deliberate near-collisions; heavy reuse
    pool = ["00000000", "00000001", "00010001", "11110000", "11110011",
            "10101010", "01010101", "11111111"]
    rows = [(i, rng.choice(pool)) for i in range(1, 61)]
    hashed = spark.createDataFrame(rows, "doc_id long, bits string")
    qual = spark.createDataFrame(
        [(i, (i * 7 % 5) * 0.25) for i in range(1, 61)],
        "doc_id long, quality_score double",
    )

    direct = sorted(
        (r.doc_id, r.cluster_size, r.reason)
        for r in hamming_keep_best(
            hashed, "doc_id", "bits", qual, "quality_score",
            max_ham=2, n_bands=3, nbits=8,
        ).collect()
    )

    pairs = hamming_near_pairs(
        hashed, "doc_id", "bits", max_ham=2, n_bands=3, nbits=8
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    composed = sorted(
        (r.doc_id, r.cluster_size, r.reason)
        for r in keep_best(
            hashed.select("doc_id"), pairs, qual
        ).collect()
    )
    assert direct == composed
    assert len(direct) < 60, "fixture produced no duplicate clusters"


def test_hamming_keep_best_percolation_guard(spark):
    """max_cluster_frac operationalizes the r13 probe rule: a Hamming
    closure whose largest cluster swallows more than the stated corpus
    fraction must RAISE (the sf10 state: one 'representative' for 98.5%
    of the corpus), while a healthy graph passes under the same bound."""
    import pytest

    from stateful_spark_streaming_spark.operators.dedup import hamming_keep_best

    # chain 0000→0001→0011→0111→1111 percolates at radius 1: one cluster
    # of all 10 images across 5 hashes
    chain = spark.createDataFrame(
        [(i, h) for i, h in enumerate(
            ["0000", "0000", "0001", "0001", "0011", "0011",
             "0111", "0111", "1111", "1111"])],
        "img long, bits string",
    )
    q = spark.createDataFrame([(i, 1.0) for i in range(10)], "img long, q double")
    with pytest.raises(ValueError, match="percolated"):
        hamming_keep_best(chain, "img", "bits", q, "q",
                          max_ham=1, n_bands=2, nbits=4,
                          max_cluster_frac=0.5).collect()
    # same guard, healthy graph: two well-separated hash groups pass
    ok = spark.createDataFrame(
        [(0, "0000"), (1, "0000"), (2, "1111"), (3, "1111")],
        "img long, bits string",
    )
    out = hamming_keep_best(ok, "img", "bits", q, "q",
                            max_ham=1, n_bands=2, nbits=4,
                            max_cluster_frac=0.5).collect()
    assert len(out) == 2


def test_streaming_image_keep_best_guard_on_by_default(spark, tmp_path):
    """r14 (VERDICT r13 #2): the ingest runner's percolation guard is ON
    by default — a corpus whose Hamming closure collapses more than half
    the images into one cluster RAISES instead of publishing a fiction
    representative, and max_cluster_frac=None is the explicit opt-out
    that returns the (degenerate but exact) clustering."""
    import pytest
    from pyspark.sql import functions as F

    from stateful_spark_streaming_spark.operators import multimodal as MM
    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_image_keep_best,
    )
    from tests.conftest import land_batches

    # the synth pixel pattern is (id·7 + 3x + 5y + 11c) mod 256, so ids
    # congruent mod 256 with equal n_chars are pixel-identical: 6 of 8
    # images share ONE hash (75% > the 0.5 default), the other two are
    # distinct singletons
    batches_docs = [
        [(1, 40), (257, 40), (513, 40), (2, 47)],
        [(769, 40), (1025, 40), (1281, 40), (3, 54)],
    ]
    cols = ("image_id", "data", "format", "width", "height")
    batches = []
    for bdocs in batches_docs:
        d = spark.createDataFrame(bdocs, "doc_id long, n_chars long")
        batches.append(
            [tuple(r) for r in MM.synthesize_image_table(spark, d).collect()]
        )
    src = land_batches(spark, tmp_path, "imgkb_perc", batches, cols)

    with pytest.raises(ValueError, match="percolated"):
        run_streaming_image_keep_best(
            spark, src, checkpoint_dir=str(tmp_path / "ck_perc"),
            max_ham=1, max_files_per_trigger=1,
        ).collect()
    # explicit opt-out: same staged log, degenerate-but-exact result
    out = run_streaming_image_keep_best(
        spark, src, checkpoint_dir=str(tmp_path / "ck_perc"),
        max_ham=1, max_files_per_trigger=1, max_cluster_frac=None,
    ).collect()
    assert sum(r.cluster_size for r in out) == 8
    assert max(r.cluster_size for r in out) == 6


def test_hamming_keep_best_rejects_mismatched_hash_width(spark):
    """r13 review: the percolation error itself tells users to widen the
    hash (image_ahash grid=16 → 256-bit), and a user who does that but
    leaves nbits at 64 would have had bands and the packed bit_count
    verify computed over only the first 64 chars — two images identical
    in their first 64 bits scored Hamming-0, merged, and one silently
    dropped as a "duplicate".  The banded core now enforces the declared
    width on every caller's path."""
    import pytest

    from stateful_spark_streaming_spark.operators.dedup import (
        hamming_keep_best,
    )

    wide = [("a", "0" * 256, 1.0), ("b", "1" * 256, 2.0)]
    hashed = spark.createDataFrame(
        [(i, b) for i, b, _ in wide], ["img", "bits"]
    )
    qual = spark.createDataFrame([(i, q) for i, _, q in wide], ["img", "q"])
    # the raise fires during construction already: dup_clusters' tier
    # probe eagerly evaluates the (guarded) edge plan
    with pytest.raises(Exception, match="expected 64-char"):
        hamming_keep_best(
            hashed, "img", "bits", qual, "q", max_ham=1
        ).collect()
    # declaring the true width works
    ok = hamming_keep_best(
        hashed, "img", "bits", qual, "q", max_ham=1, nbits=256
    )
    assert sorted(r.img for r in ok.collect()) == ["a", "b"]
