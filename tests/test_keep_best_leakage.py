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
