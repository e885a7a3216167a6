"""Known-value and property tests for the training-pipeline additions:
repetition metrics, stratified sampling, shuffle-shard."""

from __future__ import annotations

from pyspark.sql import functions as F

from stateful_spark_streaming_spark.operators.sampling import (
    shuffle_shard,
    stratified_sample,
)
from stateful_spark_streaming_spark.operators.text import repetition_stats
from stateful_spark_streaming_spark.sources.tables import load_table


def test_repetition_known_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b c"),          # bigrams: ab,ba,ab,bc → dup=1/4, top=2
            (2, "x x x y"),            # runs: xxx → max_word_run 3
            (3, "unique words only"),  # no repetition
            (4, ""),                   # empty text edge
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert got[1]["n_bigrams"] == 4
    assert got[1]["n_unique_bigrams"] == 3
    assert got[1]["dup_bigram_frac"] == 0.25
    assert got[1]["top_bigram_count"] == 2
    assert got[2]["max_word_run"] == 3
    assert got[3]["dup_bigram_frac"] == 0.0
    assert got[3]["max_word_run"] == 1
    assert got[4]["n_bigrams"] == 0
    assert got[4]["top_bigram_count"] == 0


def test_stratified_sample_deterministic_and_rate(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    s1 = stratified_sample(docs, rates={"en": 0.25}, default_rate=1.0)
    s2 = stratified_sample(docs, rates={"en": 0.25}, default_rate=1.0)
    ids1 = sorted(r["doc_id"] for r in s1.select("doc_id").collect())
    ids2 = sorted(r["doc_id"] for r in s2.select("doc_id").collect())
    assert ids1 == ids2  # identical sample every run
    n_en_all = docs.filter(F.col("lang") == "en").count()
    n_en_kept = s1.filter(F.col("lang") == "en").count()
    assert 0 < n_en_kept < n_en_all  # actually downsampled
    # non-en strata kept whole
    assert (
        s1.filter(F.col("lang") != "en").count()
        == docs.filter(F.col("lang") != "en").count()
    )


def test_shuffle_shard_is_a_permutation(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    out = shuffle_shard(docs, n_shards=4)
    assert out.count() == n
    assert out.select("doc_id").distinct().count() == n
    # (shard, pos) is a dense unique index within each shard
    per = out.groupBy("shard").agg(F.max("pos").alias("mx"), F.count("*").alias("c"))
    for r in per.collect():
        assert r["mx"] == r["c"]
    # deterministic across runs
    a = sorted(tuple(r) for r in out.select("doc_id", "shard", "pos").collect())
    b = sorted(
        tuple(r)
        for r in shuffle_shard(docs, n_shards=4).select("doc_id", "shard", "pos").collect()
    )
    assert a == b


def test_decontaminate_known_values(spark):
    from stateful_spark_streaming_spark.operators.dedup import decontaminate

    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),   # shares 3-gram "alpha beta gamma"
            (2, "totally different words"),  # clean
        ],
        ["doc_id", "text"],
    )
    eval_df = spark.createDataFrame(
        [(100, "alpha beta gamma epsilon")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r["contaminated"] for r in decontaminate(train, eval_df, k=3).collect()}
    assert got == {1: True, 2: False}


def test_token_budget_mix_greedy(spark):
    from stateful_spark_streaming_spark.operators.sampling import token_budget_mix

    df = spark.createDataFrame(
        [
            # (doc_id, source, quality, tokens)
            (1, "a", 0.9, 40),
            (2, "a", 0.8, 50),
            (3, "a", 0.7, 30),   # cum would be 120 > 100 → dropped
            (4, "b", 0.5, 100),  # exactly the budget → kept
            (5, "b", 0.4, 1),    # cum 101 → dropped
        ],
        ["doc_id", "source", "q", "t"],
    )
    got = token_budget_mix(
        df, quality_col=F.col("q"), tokens_col=F.col("t"),
        budget_tokens=100, group_col="source",
    )
    kept = sorted(r["doc_id"] for r in got.collect())
    assert kept == [1, 2, 4]
    cums = {r["doc_id"]: r["cum_tokens"] for r in got.collect()}
    assert cums == {1: 40, 2: 90, 4: 100}


def test_pack_sequences_layout(spark):
    """Contiguous concat packing: within each stream the start offsets are
    the exact running sum of token counts, packs cut every seq_len tokens,
    and pack_offset = start_offset mod seq_len."""
    from stateful_spark_streaming_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(
        [(i, 7 + (i * 13) % 23) for i in range(200)], ["doc_id", "n_tokens"]
    )
    rows = pack_sequences(
        df, tokens_col="n_tokens", seq_len=64, n_streams=4
    ).collect()
    assert len(rows) == 200
    by_stream: dict[int, list] = {}
    for r in rows:
        by_stream.setdefault(r.stream, []).append(r)
    assert set(by_stream) == {0, 1, 2, 3}
    for stream_rows in by_stream.values():
        stream_rows.sort(key=lambda r: r.start_offset)
        cum = 0
        for r in stream_rows:
            assert r.start_offset == cum, (r.doc_id, r.start_offset, cum)
            assert r.pack_id == r.start_offset // 64
            assert r.pack_offset == r.start_offset % 64
            cum += r.n_tokens


def test_pack_sequences_deterministic(spark):
    from stateful_spark_streaming_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(
        [(i, 10 + i % 5) for i in range(50)], ["doc_id", "n_tokens"]
    )
    a = sorted(map(tuple, pack_sequences(df, "n_tokens", 32, 2).collect()))
    b = sorted(
        map(tuple, pack_sequences(df.repartition(7), "n_tokens", 32, 2).collect())
    )
    assert a == b


def test_sample_n_per_group_exact_and_stable(spark):
    from stateful_spark_streaming_spark.operators.sampling import sample_n_per_group

    df = spark.createDataFrame(
        [(i, "big" if i < 90 else "small") for i in range(100)],
        ["doc_id", "source"],
    )
    got = sample_n_per_group(df, group_col="source", n=20).collect()
    by_group: dict[str, list] = {}
    for r in got:
        by_group.setdefault(r.source, []).append(r)
    # exactly n from the big group, the whole small group otherwise
    assert len(by_group["big"]) == 20
    assert len(by_group["small"]) == 10
    assert {r.sample_rank for r in by_group["big"]} == set(range(1, 21))
    # deterministic under re-partitioning, and n=10 is a prefix of n=20
    again = sample_n_per_group(df.repartition(13), group_col="source", n=20)
    assert sorted(map(tuple, got)) == sorted(map(tuple, again.collect()))
    ten = sample_n_per_group(df, group_col="source", n=10).collect()
    twenty_ids = {(r.source, r.sample_rank, r.doc_id) for r in got}
    assert all((r.source, r.sample_rank, r.doc_id) in twenty_ids for r in ten)


def test_pack_sequences_emit_materializes_windows(spark):
    """Every pack except a stream's last holds exactly seq_len tokens, the
    concatenation of a stream's packs equals the concatenation of its docs
    in layout order, and doc text survives byte-for-byte."""
    from pyspark.sql import functions as F

    from stateful_spark_streaming_spark.operators.sampling import (
        pack_sequences,
        pack_sequences_emit,
    )

    docs = [(i, " ".join(f"d{i}t{j}" for j in range((i * 7) % 19 + 3))) for i in range(60)]
    df = spark.createDataFrame(docs, ["doc_id", "text"]).withColumn(
        "toks", F.split(F.col("text"), " ")
    )
    out = pack_sequences_emit(
        df, tokens_array_col="toks", seq_len=16, n_streams=3
    ).collect()
    layout = pack_sequences(
        df.withColumn("_n", F.size("toks")),
        tokens_col="_n", seq_len=16, n_streams=3,
    ).collect()
    by_stream_packs: dict[int, list] = {}
    for r in out:
        by_stream_packs.setdefault(r.stream, []).append(r)
    for stream, packs in by_stream_packs.items():
        packs.sort(key=lambda r: r.pack_id)
        # contiguous pack ids from 0; all but the last exactly full
        assert [p.pack_id for p in packs] == list(range(len(packs)))
        for p in packs[:-1]:
            assert p.seq_filled == 16
        # stream reassembly == docs concatenated in layout order
        stream_docs = sorted(
            (r for r in layout if r.stream == stream), key=lambda r: r.start_offset
        )
        want = " ".join(
            " ".join(f"d{r.doc_id}t{j}" for j in range((r.doc_id * 7) % 19 + 3))
            for r in stream_docs
        )
        got = " ".join(p.seq_text for p in packs)
        assert got == want


def test_pack_sequences_emit_zero_token_docs(spark):
    """Zero-token and null-token docs must emit NO pack rows and must not
    corrupt neighbors: F.sequence(start, stop) with stop < start generates
    a DESCENDING array (sequence(0,-1) = [0,-1]), which used to fabricate
    negative pack_ids and inflate n_docs (ADVICE r3)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

    from stateful_spark_streaming_spark.operators.sampling import pack_sequences_emit

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("toks", ArrayType(StringType())),
    ])
    rows = [
        (1, ["a", "b", "c"]),
        (2, []),            # zero tokens
        (3, None),          # null array (F.size = -1)
        (4, ["d", "e"]),
    ]
    out = pack_sequences_emit(
        spark.createDataFrame(rows, schema),
        tokens_array_col="toks", seq_len=4, n_streams=1,
    ).collect()
    assert all(r.pack_id >= 0 for r in out)
    # 5 real tokens -> packs hold exactly those, nothing fabricated
    assert sum(r.seq_filled for r in out) == 5
    # n_docs counts doc-pack incidences: 5 tokens over seq_len=4 => 2 packs,
    # one non-empty doc spans the boundary => 3 incidences; the empty/null
    # docs contribute none
    assert sum(r.n_docs for r in out) == 3
    toks = " ".join(r.seq_text for r in sorted(out, key=lambda r: r.pack_id)).split()
    assert sorted(toks) == ["a", "b", "c", "d", "e"]
