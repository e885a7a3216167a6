"""Operator-internal persist lifetime (ADVICE r6): operators that pin
intermediates for their returned lazy plan register them in the caching
module, and one release call drops ALL of them — closing the
grows-forever cache footprint of a long-lived session without giving up
the measured persist wins."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from stateful_spark_streaming_spark import caching
from stateful_spark_streaming_spark.operators import dedup as DD
from stateful_spark_streaming_spark.operators import text as TXT


def _cached_rdd_count(spark) -> int:
    jsc = spark.sparkContext._jsc.sc()
    return jsc.getPersistentRDDs().size()


def _load_docs(spark):
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    return spark.read.parquet(os.path.join(sf, "documents.parquet"))


def test_track_persist_registers_and_releases(spark):
    caching.release_operator_caches()  # isolate from earlier tests
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    out = caching.track_persist(df)
    assert out.storageLevel.useMemory
    out.count()
    assert caching.release_operator_caches() == 1
    assert not out.storageLevel.useMemory
    # idempotent: nothing left to release
    assert caching.release_operator_caches() == 0


def test_span_and_lm_operators_release_their_pins(spark):
    """The ADVICE-named leaks: dup_ngram_spans' gram index, the
    sptext persist in remove_dup_spans (the former cut persist is gone —
    the r14 array-reassembly tail consumes the cut frame exactly once),
    and unigram/bigram_logprob's count frames all drain through ONE
    release call — block-manager storage returns to its pre-call level."""
    caching.release_operator_caches()
    spark.catalog.clearCache()
    docs = _load_docs(spark).limit(60)
    base = _cached_rdd_count(spark)

    DD.remove_dup_spans(docs).count()  # pins index + sptext
    TXT.unigram_logprob(docs).count()
    TXT.bigram_logprob(docs).count()
    assert _cached_rdd_count(spark) > base, "fixture pinned nothing"

    released = caching.release_operator_caches()
    assert released >= 4
    assert _cached_rdd_count(spark) == base, (
        "release_operator_caches left operator-internal blocks behind"
    )


def test_release_mid_plan_degrades_to_recompute(spark):
    """Releasing before a result is materialized must only cost recompute,
    never correctness — the registry is safe to drain at any point."""
    caching.release_operator_caches()
    docs = _load_docs(spark).limit(40)
    lazy = DD.remove_dup_spans(docs)  # persists registered, nothing run yet
    caching.release_operator_caches()
    assert lazy.count() == 40
