"""Second, independent adversarial checks for the rows-only query class
(VERDICT r8 #6): the queries with no DuckDB oracle BY CONSTRUCTION
(trained ANN, iterative BPE, deflate — SIX after r11 retired
approx_distinct_stats and r12 moved the distinct-count catalog pair to
the oracle-exact KMV sketch) each already carry one
equivalence/recall/byte-parity pytest — these add a check from a
DIFFERENT angle, so the weakest evidence class in the gate has two
independent anchors per query.  The two HLL sketch invariance tests
below now pin ENGINE-SURFACE operators (approx_distinct_stats /
distinct_sketch_stats stay exported for binary-sketch storage) rather
than catalog queries.

Angles used here:
- partition/order invariance (sketch aggregates, ANN probes): a
  distributed implementation that accidentally depends on row order or
  partition count produces different answers under repartition — the
  classic silent-wrongness mode of sketch/ANN code.
- a SECOND pure-Python reference implementation (BPE: sequential
  merge-order application vs the existing lowest-rank-first reference;
  equivalent for any valid BPE merge table because a merge's parts can
  never be produced by a later merge).
- adversarial input classes at exact parity (deflate: empty, unicode,
  highly repetitive, incompressible, 200KB+ int32-overflow shapes).
- index retrain between serving runs sharing one checkpoint (streaming
  ANN): resumed batches must probe the RETRAINED generation and earlier
  appended results must survive.
"""

from __future__ import annotations

import os
import zlib

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- sketches


def test_approx_distinct_partition_invariance(spark):
    """approx_count_distinct (HLL++) is register-max under the hood: the
    estimate must be IDENTICAL under any partitioning of the same rows.
    (The t-digest percentile columns are excluded: Spark documents
    percentile_approx accuracy, not merge-order determinism.)"""
    from stateful_spark_streaming_spark.operators.relational import (
        approx_distinct_stats,
    )

    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    outs = []
    for parts in (1, 7, 32):
        df = approx_distinct_stats(
            events.repartition(parts),
            key="event_type",
            value_col="value",
            count_col="user_id",
        ).select("event_type", "n_rows", "approx_distinct")
        outs.append({r["event_type"]: (r["n_rows"], r["approx_distinct"]) for r in df.collect()})
    assert outs[0] == outs[1] == outs[2]


def test_datasketches_hll_partition_invariance(spark):
    """DataSketches HLL estimates must be identical under repartition —
    the public-sketch sibling of the test above, covering
    distinct_sketch_stats and (through the same union) its streaming twin."""
    from stateful_spark_streaming_spark.operators.relational import (
        distinct_sketch_stats,
    )

    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    outs = []
    for parts in (1, 5, 17):
        df = distinct_sketch_stats(
            events.repartition(parts), key="event_type", count_col="user_id"
        )
        outs.append({r[0]: tuple(r[1:]) for r in df.collect()})
    assert outs[0] == outs[1] == outs[2]


# ---------------------------------------------------------------- ANN


def _topk_map(df):
    score = "cosine" if "cosine" in df.columns else "approx_cosine"
    return {
        (r["query_id"], r["neighbor_id"]): round(r[score], 9) for r in df.collect()
    }


def test_pq_topk_partition_order_invariance(spark):
    """PQ trains its codebooks on a DETERMINISTIC sample (first N by id)
    and scores via per-query lookup tables — so the full result set must
    not change when the corpus arrives in a different partitioning."""
    from stateful_spark_streaming_spark.operators.similarity import pq_topk

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    queries = emb.filter(F.col("vec_id") < 10)
    a = pq_topk(emb, queries, k=5, m=8, ks=16)
    b = pq_topk(emb.repartition(11), queries.repartition(3), k=5, m=8, ks=16)
    assert _topk_map(a) == _topk_map(b)


def test_ivf_topk_partition_order_invariance(spark, tmp_path):
    """Same property for the IVF probe path (cosine_topk_ivf's engine):
    centroids from the deterministic sample, cell join, per-query top-k —
    repartitioning the corpus or the queries must not change the answer."""
    from stateful_spark_streaming_spark.operators.similarity import (
        ivf_build_or_load,
        ivf_topk,
    )

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    queries = emb.filter(F.col("vec_id") < 10)
    index = ivf_build_or_load(emb, str(tmp_path / "idx"), n_centroids=4)
    a = ivf_topk(emb, queries, k=5, n_centroids=4, nprobe=2, index=index)
    b = ivf_topk(
        emb.repartition(13), queries.repartition(2), k=5, n_centroids=4,
        nprobe=2, index=index,
    )
    assert _topk_map(a) == _topk_map(b)


def test_streaming_ivf_topk_retrain_between_runs(spark, tmp_path):
    """Serving resumes from its checkpoint AFTER the index was retrained:
    batch 2 must probe the retrained generation (equal to the batch-mode
    probe against it), and batch 1's earlier results must survive in the
    output — the retrain-mid-stream lifecycle the verdict asked pinned."""
    import shutil

    from stateful_spark_streaming_spark.operators.similarity import (
        ivf_build_or_load,
        ivf_load_index,
        ivf_topk,
    )
    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_ivf_topk,
    )

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    idx_path = str(tmp_path / "idx")
    index1 = ivf_build_or_load(emb, idx_path, n_centroids=4)

    qdir = str(tmp_path / "queries")
    os.makedirs(qdir)

    def feed(lo, hi, name, mtime):
        seg = str(tmp_path / f"seg_{name}")
        emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)).coalesce(
            1
        ).write.parquet(seg)
        part = [f for f in os.listdir(seg) if f.endswith(".parquet")][0]
        dst = os.path.join(qdir, f"{name}.parquet")
        shutil.move(os.path.join(seg, part), dst)
        os.utime(dst, (mtime, mtime))

    feed(0, 5, "a", 1_000_000_000)
    ckpt = str(tmp_path / "ckpt")
    out1 = run_streaming_ivf_topk(spark, qdir, idx_path, k=3, nprobe=2, checkpoint_dir=ckpt)
    want_a = _topk_map(
        ivf_topk(emb, emb.filter(F.col("vec_id") < 5), k=3, nprobe=2, index=index1)
    )
    assert _topk_map(out1) == want_a

    # retrain with a different centroid count: a new generation, new cells
    from stateful_spark_streaming_spark.operators.similarity import ivf_retrain

    index2 = ivf_retrain(spark, idx_path, n_centroids=8)
    feed(5, 10, "b", 1_000_000_100)
    out2 = run_streaming_ivf_topk(spark, qdir, idx_path, k=3, nprobe=2, checkpoint_dir=ckpt)
    want_b = _topk_map(
        ivf_topk(
            emb,
            emb.filter((F.col("vec_id") >= 5) & (F.col("vec_id") < 10)),
            k=3, nprobe=2, index=index2,
        )
    )
    got = _topk_map(out2)
    # batch 1's rows survived, batch 2 probed the retrained generation
    assert {k: v for k, v in got.items() if k[0] < 5} == want_a
    assert {k: v for k, v in got.items() if k[0] >= 5} == want_b


# ---------------------------------------------------------------- BPE


def _ref_encode_sequential(word: str, merges) -> int:
    """SECOND independent BPE apply: one full left-to-right pass per merge,
    in merge-creation order (the existing reference is lowest-rank-first).
    Equivalent on any valid merge table: a merge's parts cannot be
    produced by a later merge, so all lower-rank pairs are exhausted
    before rank r either way."""
    syms = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return len(syms)


def test_bpe_encode_second_reference_on_real_corpus(spark):
    """bpe_encode_stats on REAL document text vs the sequential-pass
    reference — a different algorithmic formulation than the rank-greedy
    reference in test_bpe.py, trained and applied on the actual corpus
    the gate query runs over (punctuation, digits, long docs)."""
    from stateful_spark_streaming_spark.operators.dedup import _py_tokens
    from stateful_spark_streaming_spark.operators.text import bpe_encode, bpe_train

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).limit(200)
    merges = bpe_train(docs, n_merges=30)
    assert len(merges) == 30
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_encode(docs, merges).collect()
    }
    rows = docs.select("doc_id", "text").collect()
    checked = 0
    for r in rows:
        words = [w for w in (_py_tokens(r["text"]) or []) if w]
        if not words:
            assert r["doc_id"] not in got
            continue
        n_tokens = sum(_ref_encode_sequential(w, merges) for w in words)
        assert got[r["doc_id"]] == (len(words), n_tokens)
        checked += 1
    assert checked >= 100  # the corpus slice really exercised the kernel


# ---------------------------------------------------------------- deflate


def test_compression_stats_adversarial_inputs(spark):
    """Exact zlib parity on the nasty input classes: unicode multi-byte,
    single repeated char (maximum compressibility), md5-chain
    incompressible text, 250 KB blob (the int32 ratio_bp overflow shape
    fixed in r8), and 1-byte docs; empty and NULL emit nothing."""
    import hashlib

    incompressible = " ".join(
        hashlib.md5(str(i).encode()).hexdigest() for i in range(200)
    )
    cases = [
        (0, "héllo wörld é中文 \U0001f600" * 3),
        (1, "a" * 10_000),
        (2, incompressible),
        (3, "xy" * 125_000),  # 250 KB: 10000 * n_compressed needs bigint
        (4, "z"),
        (5, ""),
        (6, None),
    ]
    from stateful_spark_streaming_spark.operators.text import compression_stats

    df = spark.createDataFrame(cases, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bytes"], r["n_compressed"], r["ratio_bp"])
        for r in compression_stats(df).collect()
    }
    assert set(got) == {0, 1, 2, 3, 4}  # empty + NULL emit nothing
    for doc_id, text in cases[:5]:
        raw = text.encode("utf-8")
        comp = len(zlib.compress(raw, 6))
        assert got[doc_id] == (len(raw), comp, (10000 * comp) // len(raw))
    # the signal orders as the theory says: repetitive < unicode-prose <
    # hex noise (hex is ~4 bits/char, so it still compresses ~2x — no
    # ASCII text reaches 10000bp; assert the entropy floor instead)
    assert got[1][2] < got[0][2] < got[2][2]
    assert got[2][2] > 4000 and got[1][2] < 200


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
