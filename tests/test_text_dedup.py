"""Text analysis + dedup operator semantics on crafted fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from stateful_spark_streaming_spark.operators import dedup as DD
from stateful_spark_streaming_spark.operators import text as TXT


@pytest.fixture()
def docs(spark):
    corpus = [
        (1, "The quick brown fox jumps over the lazy dog near the old river bank today"),
        (2, "The quick brown fox jumps over the lazy dog near the old river bank today"),  # exact dup of 1
        (3, "The quick brown fox jumps over the lazy dog near the old river bank tonight"),  # near dup of 1
        (4, "completely different content about database query optimization and join ordering"),
        (5, "el perro y el gato en la casa de que los por la noche"),
    ]
    return spark.createDataFrame([Row(doc_id=i, text=t, lang="x") for i, t in corpus])


def test_token_stats(docs):
    out = {r.doc_id: r for r in TXT.token_stats(docs).collect()}
    assert out[1].n_tokens == 15
    assert out[1].n_unique_tokens == 13  # 'the' x3
    assert out[4].n_tokens == 10


def test_exact_dedup(docs):
    out = DD.exact_dedup(docs).collect()
    groups = {r.survivor_doc_id: r.n_copies for r in out}
    assert groups[1] == 2  # docs 1+2 collapse, survivor = min id
    assert groups.get(3) == 1 and groups.get(4) == 1


def test_fingerprint_bag_invariance(spark):
    a = spark.createDataFrame([Row(doc_id=1, text="alpha beta gamma"),
                               Row(doc_id=2, text="gamma alpha beta"),
                               Row(doc_id=3, text="alpha beta delta")])
    fp = {r.doc_id: r for r in TXT.fingerprint(a).collect()}
    assert fp[1].bag_fp == fp[2].bag_fp, "bag fingerprint is order-invariant"
    assert fp[1].content_fp != fp[2].content_fp
    assert fp[1].bag_fp != fp[3].bag_fp


def test_language_id_stopwords(docs):
    out = {r.doc_id: r for r in TXT.language_id(docs).collect()}
    assert out[1].lang_pred == "en"
    assert out[5].lang_pred == "es"


def test_jaccard_pairs_finds_near_dup(docs):
    pairs = DD.jaccard_pairs(docs, threshold=0.5, max_shingle_df=None).collect()
    got = {(r.doc_a, r.doc_b): r.jaccard for r in pairs}
    assert (1, 2) in got and got[(1, 2)] == 1.0
    assert (1, 3) in got and 0.5 <= got[(1, 3)] < 1.0
    assert (2, 3) in got
    assert all(a < b for a, b in got), "pairs are ordered, no self-pairs"
    assert not any(4 in p or 5 in p for p in got)


def test_minhash_lsh_recall_vs_exact(spark, sf_dir):
    from stateful_spark_streaming_spark.sources.tables import load_table

    documents = load_table(spark, sf_dir, "documents")
    exact = {
        (r.doc_a, r.doc_b)
        for r in DD.jaccard_pairs(documents, threshold=0.6).collect()
    }
    approx = {
        (r.doc_a, r.doc_b)
        for r in DD.minhash_lsh_pairs(documents, threshold=0.6).collect()
    }
    assert approx <= exact, "LSH verifies candidates exactly → no false positives"
    if exact:
        recall = len(approx & exact) / len(exact)
        assert recall >= 0.6, f"LSH recall too low: {recall}"


def test_lsh_pairs_contained_in_exact(spark, sf_dir):
    """Test-SF cross-check for the r10 re-plan of dedup_clusters /
    dedup_keep_best onto the LSH candidate generator (VERDICT r9 #2):
    (a) the LSH pair set is CONTAINED in the exact df-capped Jaccard pair
    set the benched queries used through r9 (LSH verifies true Jaccard on
    the full shingle sets, so at a scale where no shingle exceeds the df
    cap the two verification predicates coincide and containment is an
    invariant, not a statistic); (b) the clusters built on LSH pairs are
    a REFINEMENT of the clusters built on exact pairs — every LSH cluster
    sits inside one exact cluster, because a subgraph's connected
    components can only split components, never merge across them."""
    from stateful_spark_streaming_spark.sources.tables import load_table

    documents = load_table(spark, sf_dir, "documents")
    exact_pairs = DD.jaccard_pairs(documents, threshold=0.6, max_shingle_df=1000)
    lsh_pairs = DD.minhash_lsh_pairs(documents, threshold=0.6)
    exact = {(r.doc_a, r.doc_b) for r in exact_pairs.collect()}
    approx = {(r.doc_a, r.doc_b) for r in lsh_pairs.collect()}
    assert approx, "test corpus must produce LSH pairs or the check is vacuous"
    assert approx <= exact, f"LSH emitted pairs the exact generator lacks: " \
        f"{sorted(approx - exact)[:5]}"

    exact_rep = {r.doc_id: r.cluster_rep
                 for r in DD.dup_clusters(exact_pairs).collect()}
    lsh_rep = {r.doc_id: r.cluster_rep
               for r in DD.dup_clusters(lsh_pairs).collect()}
    # refinement: two docs in the same LSH cluster are in the same exact one
    by_lsh: dict = {}
    for doc, rep in lsh_rep.items():
        by_lsh.setdefault(rep, []).append(doc)
    for rep, members in by_lsh.items():
        exact_homes = {exact_rep.get(d) for d in members}
        assert len(exact_homes) == 1 and None not in exact_homes, (
            f"LSH cluster {rep} straddles exact clusters {exact_homes}"
        )


def test_simhash_identical_and_near(docs):
    fps = {r.doc_id: r.simhash64 for r in DD.simhash(docs).collect()}
    assert fps[1] == fps[2], "identical text → identical simhash"
    near = DD.simhash_near_pairs(docs, max_hamming=16).collect()
    got = {(r.doc_a, r.doc_b): r.hamming for r in near}
    assert got.get((1, 2)) == 0
    assert (1, 3) in got, "one-word change stays within small hamming distance"


def test_chunk_documents_overlap(spark):
    from stateful_spark_streaming_spark.operators.text import chunk_documents

    text = " ".join(f"w{i}" for i in range(100))  # 100 tokens
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    chunks = sorted(
        chunk_documents(df, chunk_tokens=64, overlap=16).collect(),
        key=lambda r: r.chunk_id,
    )
    # starts at 1, 49, 97; start=97 gives a pure-tail chunk of 4 tokens
    # (97+16 > 100 → dropped); so chunks at 1 and 49
    assert [r.start for r in chunks] == [1, 49]
    assert chunks[0].chunk_text.split()[:2] == ["w0", "w1"]
    assert chunks[0].chunk_len == 64
    # overlap: chunk 1 begins 16 tokens before chunk 0's end
    assert chunks[1].chunk_text.split()[0] == "w48"
    assert chunks[1].chunk_len == 52  # tokens 49..100

    tiny = spark.createDataFrame([(2, "a b c")], ["doc_id", "text"])
    got = chunk_documents(tiny).collect()
    assert len(got) == 1 and got[0].chunk_len == 3, "short doc → one chunk"


def test_redact_pii_crafted(spark):
    from stateful_spark_streaming_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [(1, "mail bob@example.com or +1 (555) 123-4567, host 10.0.0.1 ok")],
        ["doc_id", "text"],
    )
    r = redact_pii(df).collect()[0]
    assert "<EMAIL>" in r.redacted_text
    assert "<PHONE>" in r.redacted_text
    assert "<IPV4>" in r.redacted_text
    assert "bob@" not in r.redacted_text and "555" not in r.redacted_text
    assert (r.n_email, r.n_phone, r.n_ipv4) == (1, 1, 1)


def test_hash_split_duplicates_cohere(spark):
    from stateful_spark_streaming_spark.operators.text import hash_split

    df = spark.createDataFrame(
        [(1, "Exactly The Same text!"), (2, "exactly the same TEXT"),
         (3, "something different entirely")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in hash_split(df).collect()}
    # normalization makes 1 and 2 identical content → identical split
    assert rows[1].bucket == rows[2].bucket
    assert rows[1].split == rows[2].split
    assert all(r.split in ("train", "eval") for r in rows.values())


def test_dup_clusters_connected_components(spark):
    from pyspark.sql import Row

    from stateful_spark_streaming_spark.operators.dedup import dup_clusters

    # two components: {1,2,3,9} chained 9-1-2-3, {5,7}; singleton pairs none
    pairs = spark.createDataFrame([
        Row(doc_a=1, doc_b=2), Row(doc_a=2, doc_b=3), Row(doc_a=1, doc_b=9),
        Row(doc_a=5, doc_b=7),
    ])
    got = {r.doc_id: r.cluster_rep for r in dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 7: 5}

    # a longer chain exercises multi-round propagation (diameter 5) on the
    # DISTRIBUTED path (max_driver_edges=0 forces label propagation)
    chain = spark.createDataFrame(
        [Row(doc_a=i, doc_b=i + 1) for i in range(10, 15)]
    )
    got2 = {r.doc_id: r.cluster_rep
            for r in dup_clusters(chain, max_driver_edges=0).collect()}
    assert got2 == {i: 10 for i in range(10, 16)}

    # both tiers agree on the same graph, and each run reports its tier
    got3 = {r.doc_id: r.cluster_rep for r in dup_clusters(chain).collect()}
    assert got3 == got2
    assert dup_clusters.last_tier == "driver"
    dup_clusters(chain, max_driver_edges=0).collect()
    assert dup_clusters.last_tier == "distributed"


def test_dup_clusters_tiers_agree_on_skewed_component(spark):
    """Tier equivalence on a SKEWED graph: one hub star (the shape a
    boilerplate near-dup cluster takes) plus a long chain plus singles —
    driver union-find and distributed propagation must produce identical
    clusters."""
    from pyspark.sql import Row

    from stateful_spark_streaming_spark.operators.dedup import dup_clusters

    hub = [Row(doc_a=0, doc_b=i) for i in range(1, 120)]  # star around 0
    chain = [Row(doc_a=200 + i, doc_b=201 + i) for i in range(8)]
    bridge = [Row(doc_a=119, doc_b=200)]  # glue star to chain: one component
    iso = [Row(doc_a=500, doc_b=501)]
    pairs = spark.createDataFrame(hub + chain + bridge + iso)
    a = {r.doc_id: r.cluster_rep for r in dup_clusters(pairs).collect()}
    assert dup_clusters.last_tier == "driver"
    b = {r.doc_id: r.cluster_rep
         for r in dup_clusters(pairs, max_driver_edges=0).collect()}
    assert dup_clusters.last_tier == "distributed"
    assert a == b
    assert all(v == 0 for k, v in a.items() if k < 500)
    assert a[500] == a[501] == 500


def test_banded_candidate_pairs_hot_bucket_cap(spark):
    """A degenerate bucket (every item hashing to one (band_id, band_hash))
    must be DROPPED by the cap, not expanded into m²/2 pairs — the LSH
    mirror of jaccard_pairs' max_shingle_df guard."""
    from pyspark.sql import functions as F

    m = 50
    items = spark.createDataFrame(
        [(0, "hot", i) for i in range(m)] + [(1, f"cold{i % 2}", i) for i in range(6)],
        ["band_id", "band_hash", "id"],
    ).select("band_id", "band_hash", F.struct(F.col("id")).alias("item"))
    # cap below the hot bucket's size: its pairs must vanish, the small
    # cold buckets' pairs must survive
    capped = DD.banded_candidate_pairs(items, max_bucket_size=10).collect()
    assert 0 < len(capped) < m * (m - 1) // 2
    assert all(r["a"]["id"] % 2 == r["b"]["id"] % 2 for r in capped)
    # uncapped: the hot bucket contributes all m²/2 pairs
    full = DD.banded_candidate_pairs(items, max_bucket_size=None).count()
    assert full >= m * (m - 1) // 2
    stats = DD.lsh_bucket_stats(items, max_bucket_size=10)
    assert stats["n_dropped"] == 1
    assert stats["max_size"] == m


def test_minhash_signature_is_duckdb_reproducible(docs):
    """The md5_h60-based MinHash signature must equal DuckDB's re-derivation
    (the property that upgraded dedup_minhash_lsh from rows-only to
    hash-matched)."""
    import duckdb

    sig = DD.minhash_signatures(docs, num_hashes=4).collect()
    pdf = docs.select("doc_id", "text").toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    norm = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
    sh = (
        "list_distinct([t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] "
        "FOR i IN range(len(t)-2)])"
    )
    want = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(
            f"""
        WITH toks AS (SELECT doc_id, string_split({norm}, ' ') AS t FROM documents),
        s AS (SELECT doc_id, {sh} AS s FROM toks WHERE len(t) >= 3),
        ex AS (SELECT doc_id, unnest(s) AS shingle FROM s),
        hx AS (SELECT doc_id,
               ('0x' || substring(md5(shingle), 1, 15))::BIGINT AS h1,
               ('0x' || substring(md5(shingle), 16, 14))::BIGINT AS h2
               FROM ex)
        SELECT doc_id,
               min(h1 + 0 * h2), min(h1 + 1 * h2),
               min(h1 + 2 * h2), min(h1 + 3 * h2)
        FROM hx GROUP BY doc_id
        """
        ).fetchall()
    }
    got = {r["doc"]: (r["h0"], r["h1"], r["h2"], r["h3"]) for r in sig}
    assert got == want


def test_minhash_band_kernels_bit_identical(spark, sf_dir):
    """The Arrow numpy band kernel must produce the EXACT (doc_id,
    band_hash) set the JVM HOF builder produces — including the sentinel
    band for shingle-less docs — since the streaming dedup's oracle is
    derived from the md5 double-hashing contract both implement."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    extra = spark.createDataFrame(
        [(90001, "hi"), (90002, ""), (90003, "one two three four")],
        ["doc_id", "text"],
    )
    both = docs.select("doc_id", "text").unionByName(extra)
    band_arr = DD.minhash_bands_mapside(F.col("text"))
    sentinel = F.array(F.md5(F.concat(F.lit("uniq:"), F.col("doc_id").cast("string"))))
    hof = {
        (r[0], r[1])
        for r in both.select(
            "doc_id",
            F.explode(
                F.when(F.size(band_arr) > 0, band_arr).otherwise(sentinel)
            ).alias("band_hash"),
        ).collect()
    }
    np_rows = {
        (r[0], r[1]) for r in DD.minhash_band_rows_mapinpandas(both).collect()
    }
    assert np_rows == hof
    assert len(np_rows) > 0


def test_dup_clusters_frees_superseded_checkpoints(spark):
    """The distributed tier localCheckpoints every 3rd round; a long chain
    (diameter 12 -> >=4 checkpoint rounds) must leave at most ONE
    checkpoint's blocks in the block manager afterwards — superseded
    checkpoints are freed via the LogicalRDD handle (DataFrame.unpersist
    is a no-op on checkpointed frames in Spark 4, so without the explicit
    free they'd accumulate one label-set per checkpoint round)."""
    from pyspark.sql import Row

    from stateful_spark_streaming_spark.operators.dedup import dup_clusters

    jsc = spark.sparkContext._jsc.sc()

    def n_cached_rdds():
        return len([i for i in jsc.getRDDStorageInfo()])

    before = n_cached_rdds()
    chain = spark.createDataFrame(
        [Row(doc_a=i, doc_b=i + 1) for i in range(100, 112)]
    )
    got = {r.doc_id: r.cluster_rep
           for r in dup_clusters(chain, max_driver_edges=0).collect()}
    assert got == {i: 100 for i in range(100, 113)}
    # allowed residue: the final checkpoint + the returned frame's cache
    # (+ sym was unpersisted); anything more means superseded checkpoint
    # blocks leaked
    after = n_cached_rdds()
    assert after - before <= 2, f"leaked cached RDDs: {before} -> {after}"


def test_simhash_kernels_bit_identical(spark, sf_dir):
    """The numpy fingerprint kernel must equal the JVM explode+aggregate
    simhash exactly — token multiset semantics (duplicates count) and the
    empty-text token included."""
    from pyspark.sql import functions as F  # noqa: F401

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    extra = spark.createDataFrame(
        [(90001, "dup dup dup words"), (90002, ""), (90003, "a b a b a")],
        ["doc_id", "text"],
    )
    both = docs.select("doc_id", "text").unionByName(extra)
    jvm = {(r[0], r[1]) for r in DD.simhash(both).collect()}
    np_ = {(r[0], r[1]) for r in DD.simhash_fingerprints_mapinpandas(both).collect()}
    assert np_ == jvm
    assert len(np_) > 0


def test_shingle_index_kernel_matches_hof(spark, sf_dir):
    """The numpy shingle-index kernel must equal the shingles() HOF +
    explode form exactly: distinct per-doc shingles, set_size = distinct
    count, <k-token docs emit nothing."""
    from pyspark.sql import functions as F

    from stateful_spark_streaming_spark.operators.dedup import _shingle_index
    from stateful_spark_streaming_spark.operators.text import shingles

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    extra = spark.createDataFrame(
        [(90001, "a b"), (90002, ""), (90003, "x y z x y z x y z")],
        ["doc_id", "text"],
    )
    both = docs.select("doc_id", "text").unionByName(extra)
    hof = (
        both.select(F.col("doc_id").alias("doc"), shingles(F.col("text"), 3).alias("sh"))
        .withColumn("set_size", F.size("sh"))
        .select("doc", "set_size", F.explode("sh").alias("shingle"))
    )
    want = {tuple(r) for r in hof.collect()}
    got = {tuple(r) for r in _shingle_index(both, "text", "doc_id", 3).collect()}
    assert got == want
    assert len(got) > 0


def test_vocab_topk_counts_and_rank(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="apple banana apple"),
            Row(doc_id=2, text="banana cherry"),
            Row(doc_id=3, text="apple!"),
            Row(doc_id=4, text=""),  # empty doc contributes nothing
        ]
    )
    out = {r.token: r for r in TXT.vocab_topk(df, top_n=10).collect()}
    assert set(out) == {"apple", "banana", "cherry"}
    assert out["apple"].term_count == 3 and out["apple"].doc_freq == 2
    assert out["banana"].term_count == 2 and out["banana"].doc_freq == 2
    assert out["cherry"].term_count == 1 and out["cherry"].doc_freq == 1
    assert [out[t].rank for t in ("apple", "banana", "cherry")] == [1, 2, 3]
    # top_n truncates deterministically (ties broken by token asc)
    top2 = {r.token for r in TXT.vocab_topk(df, top_n=2).collect()}
    assert top2 == {"apple", "banana"}


def test_unigram_logprob_matches_hand_mle(spark):
    import math

    df = spark.createDataFrame(
        [Row(doc_id=1, text="a a b"), Row(doc_id=2, text="b c")]
    )
    # corpus counts: a=2 b=2 c=1, total=5
    out = {r.doc_id: r for r in TXT.unigram_logprob(df).collect()}
    assert out[1].n_tokens == 3 and out[2].n_tokens == 2
    assert out[1].mean_logprob == round(math.log(2 / 5), 4)
    assert out[2].mean_logprob == round((math.log(2 / 5) + math.log(1 / 5)) / 2, 4)
    assert out[2].min_logprob == round(math.log(1 / 5), 4)
    # rare-token doc scores strictly lower
    assert out[2].mean_logprob < out[1].mean_logprob


def test_tfidf_topterms_rank_and_df_filter(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="common rare rare"),
            Row(doc_id=2, text="common other"),
            Row(doc_id=3, text="common common thing"),
            Row(doc_id=4, text="common word"),
        ]
    )
    # 'common' is in 4/4 docs -> dropped by max_df_frac=0.5; others have df=1
    out = TXT.tfidf_topterms(df, top_k=2, max_df_frac=0.5).collect()
    assert all(r.token != "common" for r in out)
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: 'rare' tf=2 df=1 -> tfidf = 2*4/1 = 8.0, rank 1
    r1 = by_doc[1][0]
    assert (r1.token, r1.tf, r1.df, r1.tfidf, r1.rank) == ("rare", 2, 1, 8.0, 1)
    # every doc's ranks are 1..n with scores non-increasing
    for rows in by_doc.values():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        assert all(a.tfidf >= b.tfidf for a, b in zip(rows, rows[1:]))


def test_dup_ngram_spans_merge_and_cross_doc_only(spark):
    shared = "one two three four five six"  # 6 tokens -> two 5-grams, one span
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"intro words here then {shared} trailing bits"),
            Row(doc_id=2, text=f"{shared} and unrelated suffix content"),
            # within-doc repetition ONLY (no other doc shares it): not flagged
            Row(doc_id=3, text="p q r s t p q r s t p q r s t"),
            Row(doc_id=4, text="totally different text with no overlap at all"),
        ]
    )
    out = DD.dup_ngram_spans(df, k=5, min_docs=2).collect()
    spans = {r.doc_id: r for r in out}
    assert set(spans) == {1, 2}
    # doc 1: shared phrase starts at token 4, covers tokens 4..9
    assert (spans[1].span_start, spans[1].span_end, spans[1].span_len) == (4, 9, 6)
    # two overlapping 5-grams merged into ONE maximal span
    assert spans[1].n_dup_grams == 2
    assert (spans[2].span_start, spans[2].span_end) == (0, 5)


def test_dup_ngram_spans_splits_disjoint_islands(spark):
    a = "alpha beta gamma delta epsilon"  # 5 tokens: exactly one 5-gram
    b = "zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"{a} filler1 filler2 filler3 {b}"),
            Row(doc_id=2, text=f"{a} completely other words then {b} again"),
        ]
    )
    out = DD.dup_ngram_spans(df, k=5, min_docs=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    # both docs have TWO disjoint spans (the gap breaks the island)
    assert len(by_doc[1]) == 2 and len(by_doc[2]) == 2
    assert sorted(by_doc[1])[0] == (0, 4)


def test_dup_ngram_spans_hot_gram_no_skewed_window(spark):
    """A boilerplate gram present in EVERY doc (license header / common
    sentence) — the pre-r6 dense_rank/max window over the gram key would
    land every occurrence on ONE task, and window partitions are exempt
    from AQE skew mitigation (VERDICT r5 "what's wrong" #1).  The r6
    shape counts cross-doc occurrence via partial-aggregatable groupBys
    (map-side combine absorbs the hot key) + an AQE-skew-handled semi
    join, so: no dense_rank anywhere, the only window is the per-doc
    island merge, and the answer is unchanged."""
    import re

    boiler = "this license header is boilerplate"
    df = spark.createDataFrame(
        [
            Row(doc_id=i, text=f"{boiler} unique{i} alone{i} word{i} tail{i}")
            for i in range(40)
        ]
    )
    out = DD.dup_ngram_spans(df, k=5, min_docs=2)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "dense_rank" not in plan
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1, (
        "the only window must be the per-doc island merge — never one "
        "partitioned by the gram key"
    )
    rows = out.collect()
    # every doc flags exactly the boilerplate span (tokens 0..4); the
    # per-doc unique tails are never flagged
    assert len(rows) == 40
    assert all((r.span_start, r.span_end) == (0, 4) for r in rows)


def test_span_ops_tokens_col_and_persist_equivalence(spark):
    """Threading a pre-computed token array (tokens_col) and/or pinning
    the __toks frame (persist_tokens) must be pure plan knobs: byte-equal
    results to the default text path."""
    shared = "one two three four five six"
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"intro words here then {shared} trailing bits"),
            Row(doc_id=2, text=f"{shared} and unrelated suffix content"),
            Row(doc_id=3, text="totally different text with no overlap at all"),
        ]
    )
    from pyspark.sql import functions as F

    with_toks = df.withColumn("toks", TXT.tokens(F.col("text")))
    base_spans = sorted(map(tuple, DD.dup_ngram_spans(df, k=5).collect()))
    assert (
        sorted(
            map(
                tuple,
                DD.dup_ngram_spans(with_toks, k=5, tokens_col="toks").collect(),
            )
        )
        == base_spans
    )
    base_clean = sorted(map(tuple, DD.remove_dup_spans(df, k=5).collect()))
    assert (
        sorted(
            map(
                tuple,
                DD.remove_dup_spans(
                    with_toks, k=5, tokens_col="toks", persist_tokens=True
                ).collect(),
            )
        )
        == base_clean
    )
    spark.catalog.clearCache()


def test_containment_pairs_catches_subset_jaccard_misses(spark):
    short = "alpha beta gamma delta epsilon zeta"
    long_doc = (
        short
        + " plus many additional unique tokens stretching this document "
        + " ".join(f"filler{i} pad{i} extra{i}" for i in range(12))
    )
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=short),
            Row(doc_id=2, text=long_doc),
            Row(doc_id=3, text="entirely unrelated content about query planning"),
        ]
    )
    cont = {(r.doc_a, r.doc_b): r for r in DD.containment_pairs(df, threshold=0.9).collect()}
    assert (1, 2) in cont, "short doc embedded in long doc must be flagged"
    assert cont[(1, 2)].containment == 1.0
    assert cont[(1, 2)].size_a < cont[(1, 2)].size_b
    # the same pair is INVISIBLE to jaccard at its usual threshold
    jac = {(r.doc_a, r.doc_b) for r in
           DD.jaccard_pairs(df, threshold=0.6, max_shingle_df=None).collect()}
    assert (1, 2) not in jac
    assert all(a < b for a, b in cont)


def test_containment_and_jaccard_agree_on_exact_dup(spark):
    t = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame([Row(doc_id=1, text=t), Row(doc_id=2, text=t)])
    cont = DD.containment_pairs(df, threshold=0.9).collect()
    assert len(cont) == 1 and cont[0].containment == 1.0
    assert cont[0].n_common == cont[0].size_a == cont[0].size_b


def test_kernels_null_text_semantics(spark):
    """Null-text rows must behave exactly like the JVM forms: dropped by
    the explode-based kernels (shingles / grams / simhash — str(None)
    would otherwise fabricate the token 'none' and pair two null docs as
    hamming-0 near-dups), sentinel-banded by the minhash ingest kernel
    (its contract covers every input doc)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from stateful_spark_streaming_spark.operators.dedup import (
        _gram_positions,
        _shingle_index,
        minhash_band_rows_mapinpandas,
        simhash_fingerprints_mapinpandas,
    )

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "real words appear here often")], schema
    )
    # JVM batch form drops null-text docs entirely
    jvm = {r.doc_id for r in DD.simhash(df).collect()}
    np_ = {r.doc_id for r in simhash_fingerprints_mapinpandas(df).collect()}
    assert jvm == np_ == {3}
    assert {r.doc for r in _shingle_index(df, "text", "doc_id", 3).collect()} == {3}
    assert {r.doc for r in _gram_positions(df, "text", "doc_id", 3).collect()} == {3}
    bands = minhash_band_rows_mapinpandas(df).collect()
    per_doc = {}
    for r in bands:
        per_doc.setdefault(r.doc_id, []).append(r.band_hash)
    assert set(per_doc) == {1, 2, 3}
    assert len(per_doc[1]) == 1 and per_doc[1] != per_doc[2], "unique sentinels"


def test_remove_dup_spans_keeps_first_occurrence_only(spark):
    shared = "one two three four five six"  # one maximal span in each doc
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"{shared} unique tail for doc one"),
            Row(doc_id=2, text=f"prefix words go here {shared} and more"),
            Row(doc_id=3, text=f"{shared}"),  # exactly the span
            Row(doc_id=4, text="no shared content at all in this document"),
        ]
    )
    out = {r.doc_id: r for r in DD.remove_dup_spans(df, k=5).collect()}
    # owner = (min doc_id, min start) -> doc 1 keeps the phrase
    assert out[1].clean_text.startswith("one two three four five six")
    assert out[1].n_removed == 0
    # docs 2 and 3 lose exactly the 6 shared tokens
    assert out[2].clean_text == "prefix words go here and more"
    assert out[2].n_removed == 6
    assert out[3].clean_text == "" and out[3].n_removed == 6
    # untouched doc rides through verbatim (normalized tokens)
    assert out[4].n_removed == 0
    assert out[4].clean_text == "no shared content at all in this document"


def test_remove_dup_spans_partial_overlap_groups_by_exact_text(spark):
    # doc 5/6 share "a b c d e f"; doc 7 shares only "a b c d e" with them
    # -> doc 7's span text differs, so it is its own group's first
    # occurrence ONLY IF no identical span precedes it; here the 5-token
    # span "a b c d e" also occurs (as a distinct maximal span) nowhere
    # else, so doc 7 keeps its text
    df = spark.createDataFrame(
        [
            Row(doc_id=5, text="a b c d e f xx yy zz qq"),
            Row(doc_id=6, text="ll mm nn oo a b c d e f"),
            Row(doc_id=7, text="a b c d e pp rr ss tt uu"),
        ]
    )
    out = {r.doc_id: r for r in DD.remove_dup_spans(df, k=5).collect()}
    assert out[5].n_removed == 0
    assert out[6].n_removed == 6 and out[6].clean_text == "ll mm nn oo"
    # doc 7's maximal span is "a b c d e" (5 tokens) - a different exact
    # text, first occurrence by (doc_id, start) among equal texts...
    # but "a b c d e" ALSO appears inside docs 5's span region; its
    # maximal spans there are the 6-token ones, so the 5-token text group
    # contains only doc 7 -> kept
    assert out[7].n_removed == 0


def test_remove_dup_spans_reassembly_never_explodes_corpus_tokens(spark):
    """Pins the r14 reassembly tail (guide-§8 shape): cut decisions apply
    to the UN-exploded token arrays, so the physical plan must carry no
    posexplode-based positional re-assembly and no collect_list rebuild —
    the only generator left is the span→position sequence explode on the
    dup-mass-sized side.  Semantics pin alongside: overlapping duplicated
    spans count each covered position once (the former ``.distinct()``,
    now ``collect_set``)."""
    shared = "one two three four five six seven"
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"{shared} unique closing words here"),
            # back-to-back occurrences: doc 2's duplicated grams merge into
            # ONE maximal span covering both copies (14 tokens)
            Row(doc_id=2, text=f"lead in filler {shared} {shared} ending"),
            Row(doc_id=3, text=shared),
        ]
    )
    out_df = DD.remove_dup_spans(df, k=5)
    plan = out_df._sc._jvm.PythonSQLUtils.explainString(
        out_df._jdf.queryExecution(), "formatted"
    )
    assert "PosExplode" not in plan, "corpus tokens must not be exploded"
    assert "collect_list" not in plan, "no exploded-token re-assembly"
    assert "collect_set" in plan, "cut positions aggregate to per-doc sets"
    out = {r.doc_id: r for r in out_df.collect()}
    # doc 1 owns the span (min doc_id); docs 2 and 3 lose every covered
    # position exactly once despite gram-level overlap inside doc 2
    assert out[1].n_removed == 0
    assert out[2].n_removed == 14
    assert out[2].clean_text == "lead in filler ending"
    assert out[3].n_removed == 7 and out[3].clean_text == ""
    spark.catalog.clearCache()


def test_corpus_report_hand_computed(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox is here", lang="en", source="a"),
            Row(doc_id=2, text="the quick brown fox is here", lang="en", source="a"),  # dup of 1
            Row(doc_id=3, text="totally different words now", lang="de", source="a"),
            Row(doc_id=4, text="short text", lang="en", source="b"),
        ]
    )
    out = {r.source: r for r in TXT.corpus_report(df).collect()}
    assert out["a"].n_docs == 3 and out["b"].n_docs == 1
    assert out["a"].n_exact_dup == 1, "doc 2 duplicates doc 1"
    assert out["b"].n_exact_dup == 0
    assert out["a"].n_en == 2 and out["b"].n_en == 1
    assert out["a"].total_tokens == 6 + 6 + 4
    assert 0.0 < out["a"].avg_quality <= 1.0


def test_kernels_accept_string_doc_ids(spark):
    """The id_col contract is generic — string ids (URLs, hashes) are
    legitimate document keys, and the Arrow kernels must type their
    output id from the INPUT schema instead of hardcoding long."""
    df = spark.createDataFrame(
        [
            ("url/a", "the quick brown fox jumps over the lazy dog"),
            ("url/b", "the quick brown fox jumps over the lazy dog"),
            ("url/c", "completely different content about query planning"),
        ],
        ["doc_id", "text"],
    )
    pairs = DD.jaccard_pairs(df, threshold=0.9, max_shingle_df=None).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == {("url/a", "url/b")}
    fps = {r.doc_id: r.simhash64 for r in
           DD.simhash_fingerprints_mapinpandas(df).collect()}
    assert fps["url/a"] == fps["url/b"] != fps["url/c"]
    spans = DD.dup_ngram_spans(df, k=5).collect()
    assert {r.doc_id for r in spans} == {"url/a", "url/b"}
    bands = DD.minhash_band_rows_mapinpandas(df).collect()
    assert {type(r.doc_id) for r in bands} == {str}


def test_tokens_col_paths_bit_identical(spark, sf_dir):
    """Every operator that accepts a pre-tokenized ``tokens_col`` must
    produce BIT-IDENTICAL results to its text path — the tokenize-once
    pipeline contract (array_join round-trip + JVM≡_py_tokens), including
    null-text docs (null token array) and empty text ([''])."""
    from pyspark.sql import functions as F

    from stateful_spark_streaming_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(200)
    extra = spark.createDataFrame(
        [(100001, None), (100002, ""), (100003, "one two")],
        ["doc_id", "text"],
    )
    df = docs.select("doc_id", "text").unionByName(extra)
    tok = df.withColumn("__toks", TXT.tokens(F.col("text")))

    def rows(x):
        return sorted((tuple(r) for r in x.collect()), key=repr)

    assert rows(DD._shingle_index(tok, "text", "doc_id", 3)) == rows(
        DD._shingle_index(tok, "text", "doc_id", 3, tokens_col="__toks")
    )
    assert rows(DD.exact_dedup(tok)) == rows(DD.exact_dedup(tok, tokens_col="__toks"))
    assert rows(DD.jaccard_pairs(tok, threshold=0.6)) == rows(
        DD.jaccard_pairs(tok, threshold=0.6, tokens_col="__toks")
    )
    assert rows(TXT.quality_score(tok)) == rows(
        TXT.quality_score(tok, tokens_col="__toks")
    )
    assert rows(TXT.chunk_documents(tok, chunk_tokens=8, overlap=2)) == rows(
        TXT.chunk_documents(tok, chunk_tokens=8, overlap=2, tokens_col="__toks")
    )
    assert rows(TXT.hash_split(tok)) == rows(TXT.hash_split(tok, tokens_col="__toks"))
    ev = docs.limit(5)
    assert rows(DD.decontaminate(tok, ev, k=5)) == rows(
        DD.decontaminate(tok, ev, k=5, tokens_col="__toks")
    )


def test_training_pipeline_chain_persisted_equals_default(spark, sf_dir):
    """persist_tokens=True (the 100 TB knob: kernels read the cached token
    arrays) must not change a single output row."""
    from pyspark.sql import functions as F

    from stateful_spark_streaming_spark.queries_catalog import (
        _training_pipeline_chain,
    )
    from stateful_spark_streaming_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    tr = docs.filter(F.col("doc_id") % 97 != 0)
    a = sorted(tuple(r) for r in _training_pipeline_chain(tr, ev).collect())
    b = sorted(
        tuple(r)
        for r in _training_pipeline_chain(tr, ev, persist_tokens=True).collect()
    )
    spark.catalog.clearCache()
    assert a == b and len(a) > 0
    # persist_quality=False (the pre-r14 plan: every downstream branch
    # re-derives the quality tree in a pushed filter) must also be
    # row-identical — the cache changes the plan, never the rows
    c = sorted(
        tuple(r)
        for r in _training_pipeline_chain(tr, ev, persist_quality=False).collect()
    )
    spark.catalog.clearCache()
    assert a == c


def test_training_chain_quality_tree_not_rederived_in_filters(spark, sf_dir):
    """r14 optimization pin (session 4): the chain caches the NARROW
    (doc_id, quality_score) frame, so no downstream branch's pushed
    ``quality_score >= 0.55`` filter re-derives the scoring regex tree —
    the pre-fix plans carried it in 4 (training_pipeline) / 12
    (training_pipeline_full) Filter conditions, each paired with a
    Project re-computation (plans/r14/training_pipeline*_{before,after}).
    Same pin for bigram_occurrence_counts: the < 2-token drop moved from
    a pushed filter into the slice length, so no Filter condition
    tokenizes."""
    from pyspark.sql import functions as F

    from stateful_spark_streaming_spark.operators.text import (
        bigram_occurrence_counts,
    )
    from stateful_spark_streaming_spark.queries_catalog import (
        _training_pipeline_chain,
    )
    from stateful_spark_streaming_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    tr = docs.filter(F.col("doc_id") % 97 != 0)
    # build each frame INSIDE the loop: the chains persist at build time,
    # and the per-iteration clearCache would evict a pre-built sibling's
    # cache before its explain (cache substitution then silently skips)
    for builder in (
        lambda: _training_pipeline_chain(docs),
        lambda: _training_pipeline_chain(tr, eval_df=ev),
        lambda: bigram_occurrence_counts(docs),
    ):
        out = builder()
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        conditions = [
            line
            for line in plan.splitlines()
            if line.strip().startswith("Condition :")
        ]
        assert not any("regexp_replace" in c for c in conditions), plan
        spark.catalog.clearCache()


def test_bigram_logprob_hand_mle(spark):
    """Hand-checked bigram MLE: corpus 'a b a b' + 'a b c' — history 'a'
    is followed by b 3×/3 (lp 0), 'b' by a 1× and c 1× of 2 (lp ln .5)."""
    import math

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "solo"), (4, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in TXT.bigram_logprob(df).collect()}
    assert set(got) == {1, 2}, "sub-2-token and null docs emit nothing"
    # doc 1: bigrams ab, ba, ab -> lp(ab)=ln(3/3)=0 (x2), lp(ba)=ln(1/2)
    l_half = math.log(0.5)
    assert got[1].n_bigrams == 3
    assert got[1].mean_logprob == round(l_half / 3, 4)
    assert got[1].min_logprob == round(l_half, 4)
    # doc 2: ab (0), bc ln(1/2)
    assert got[2].n_bigrams == 2
    assert got[2].mean_logprob == round(l_half / 2, 4)


def test_gopher_quality_filter_rules(spark):
    """Each Gopher rule trips on its crafted violator and the composed
    keep is the conjunction (Rae et al. 2021 §A1.1 semantics)."""
    good = "the quick brown foxes jumped over many lazy dogs " * 4  # 36 words
    rows = [
        (1, good),                                  # keeps
        (2, "the short doc"),                       # too few words
        (3, ("a " * 40).strip()),                   # mean word len 1 < 3
        (4, good.replace(" ", "!!! ", 12)),         # symbol ratio > 0.1
        (5, ("42 " * 40 + "the").strip()),          # alpha frac < 0.8
        (6, ("quick brown foxes jumped " * 9).strip()),  # no stopword
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in TXT.gopher_quality_filter(df).collect()}
    assert got[1].keep
    assert not got[2].ok_words and not got[2].keep
    assert not got[3].ok_word_len and not got[3].keep
    assert not got[4].ok_symbols and not got[4].keep
    assert not got[5].ok_alpha and not got[5].keep
    assert not got[6].ok_stopwords and not got[6].keep
    # the corpus-facing mix check lives in the oracle gate; here assert the
    # flags are genuinely independent: every violator passes ≥3 other rules
    for d in (2, 3, 4, 5, 6):
        r = got[d]
        assert sum([r.ok_words, r.ok_word_len, r.ok_symbols,
                    r.ok_alpha, r.ok_stopwords]) >= 3

def test_banded_candidate_pairs_cap_prefilters_before_collect(spark):
    """The hot-bucket guard must remove over-cap buckets BEFORE the
    collect_list — a post-collect size filter still materializes the
    m-element array in one aggregation buffer just to drop it (the same
    executor-OOM the cap exists to prevent).  Structural pin: with a cap
    the physical plan carries the broadcast LEFT ANTI join on the hot
    keys below the list aggregate; with cap=None it must not."""
    from pyspark.sql import functions as F

    items = spark.createDataFrame(
        [(0, "h", i) for i in range(8)],
        ["band_id", "band_hash", "id"],
    ).select("band_id", "band_hash", F.struct(F.col("id")).alias("item"))
    capped_plan = (
        DD.banded_candidate_pairs(items, max_bucket_size=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftAnti" in capped_plan, "hot-key anti join missing from plan"
    assert "BroadcastHashJoin" in capped_plan or "BroadcastExchange" in capped_plan
    open_plan = (
        DD.banded_candidate_pairs(items, max_bucket_size=None)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftAnti" not in open_plan


def test_dup_clusters_pointer_jumping_converges_logarithmically(spark):
    """The distributed tier's r13 pointer-jumping step: a diameter-40
    chain must converge within max_iter=12 (plain min-label propagation
    needs ~40 rounds and would trip the non-convergence raise) and the
    reported round count must be logarithmic, not linear, in diameter.
    The fixpoint is unchanged: every node labels to the chain minimum."""
    from pyspark.sql import Row

    from stateful_spark_streaming_spark.operators.dedup import dup_clusters

    chain = spark.createDataFrame(
        [Row(doc_a=i, doc_b=i + 1) for i in range(1000, 1040)]
    )
    got = {r.doc_id: r.cluster_rep
           for r in dup_clusters(chain, max_driver_edges=0, max_iter=12).collect()}
    assert got == {i: 1000 for i in range(1000, 1041)}
    assert dup_clusters.last_tier == "distributed"
    assert dup_clusters.last_rounds <= 10, (
        f"pointer jumping should finish a diameter-40 chain in ~log2(40)+2 "
        f"rounds, took {dup_clusters.last_rounds}"
    )


def test_simhash_heavy_duplicate_group_is_complete(spark):
    """r13 rework regression: the old row-level banding pushed every
    duplicate COPY into its chunk buckets, and past the hot-bucket cap
    (2000) the whole identical-text group was silently DROPPED — zero
    pairs exactly where duplicate mass is densest.  The distinct-
    fingerprint decomposition expands Hamming-0 pairs in-group and is
    cap-free: 2,050 identical docs must emit all 2050·2049/2 pairs, plus
    the near pair to a one-word variant."""
    m = 2050
    rows = [(i, "the same exact boilerplate sentence repeated") for i in range(m)]
    rows.append((m, "the same exact boilerplate sentence repeatedly"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = DD.simhash_near_pairs(docs, max_hamming=16)
    zero = out.filter("hamming = 0").count()
    assert zero == m * (m - 1) // 2
    near = out.filter("hamming > 0")
    # the variant doc pairs with EVERY copy of the boilerplate group
    assert near.count() == m
    assert near.filter(f"doc_b = {m}").count() == m


def test_minhash_heavy_duplicate_group_is_complete(spark):
    """r13 decomposition regression (MinHash twin of the simhash test
    above): the old row-level banding put all m copies of an identical
    text into every band bucket — past the hot-bucket cap (2000) the
    whole group emitted ZERO pairs.  With exact-duplicate mass factored
    out, 2,050 identical docs collapse to one LSH representative: all
    2050·2049/2 jaccard-1.0 pairs come from the in-group expand, and a
    near-dup variant's verified rep pair expands to every copy."""
    m = 2050
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, base) for i in range(m)]
    rows.append((m, base.replace("lazy", "sleepy")))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = DD.minhash_lsh_pairs(docs, threshold=0.6)
    exact = out.filter("jaccard = 1.0")
    assert exact.count() == m * (m - 1) // 2
    near = out.filter("jaccard < 1.0")
    got_near = near.count()
    if got_near:  # banding recall is probabilistic at jaccard ~0.7
        assert got_near == m, "a rep pair must expand to EVERY copy"
        assert near.filter(f"doc_b = {m}").count() == m


def test_jaccard_and_containment_heavy_duplicate_group(spark):
    """r13 decomposition regression for the shingle-index family: with m
    copies of one page past max_shingle_df, EVERY shingle of the group
    went over the cap, the filtered sets emptied, and the group emitted
    zero pairs — identical docs no longer scored 1.0, they scored
    nothing.  With distinct-content df counting, 1,050 copies (cap
    1,000) emit all C(1050,2) jaccard/containment-1.0 pairs, and a
    containing superset page still pairs with every copy."""
    m = 1050
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(i, base) for i in range(m)]
    rows.append((m, base + " iota kappa lambda mu nu xi omicron pi rho"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    jp = DD.jaccard_pairs(docs, threshold=0.6, max_shingle_df=1000)
    assert jp.filter("jaccard = 1.0").count() == m * (m - 1) // 2

    cp = DD.containment_pairs(docs, threshold=0.9, max_shingle_df=1000)
    ones = cp.filter("containment = 1.0")
    # every copy-copy pair, plus the superset containing every copy
    assert ones.count() == m * (m - 1) // 2 + m
    sup = ones.filter(f"doc_b = {m}")
    assert sup.count() == m
    r = sup.first()
    # the contained side (the copies) is the smaller set: sizes must
    # track the ids through the least/greatest normalization
    assert r.size_a < r.size_b and r.n_common == r.size_a


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_three_regime_decomposition_identical_output(spark, monkeypatch):
    """r14 rework pin: the pair generators self-decide between three
    plans — duplicate-free skip, nearly-distinct HYBRID (group only the
    duplicated rows via literal hash filters), and the full r13 content
    grouping — and all three must emit byte-identical pairs.  The
    corpus has duplicate mass (hybrid fires by default), the full plan
    is pinned via ``content_distinct=False``, and the probe's
    over-cap fallback (``_dup_content_hashes`` → None) is forced by
    shrinking ``_HYBRID_DUP_CAP`` to 0 so the None branch is the one
    exercised end to end, not just the pinned bool."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),
        (3, "alpha beta gamma delta epsilon zeta eta theta"),
        (4, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (5, "one two three four five six seven eight nine ten"),
        (6, "one two three four five six seven eight nine ten"),
        (7, "totally unrelated words about parquet file compaction sizes"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    for fn, kw in (
        (DD.jaccard_pairs, {"threshold": 0.5}),
        (DD.containment_pairs, {"threshold": 0.9}),
        (DD.minhash_lsh_pairs, {"threshold": 0.5}),
    ):
        hybrid = _sorted_rows(fn(docs, **kw))
        full = _sorted_rows(fn(docs, content_distinct=False, **kw))
        assert hybrid == full, f"{fn.__name__}: hybrid != full"
        assert hybrid, f"{fn.__name__}: duplicate corpus must emit pairs"
        monkeypatch.setattr(DD, "_HYBRID_DUP_CAP", 0)
        over_cap = _sorted_rows(fn(docs, **kw))
        monkeypatch.undo()
        assert over_cap == full, f"{fn.__name__}: over-cap probe != full"


def test_probe_regimes_and_collision_safety(spark, monkeypatch):
    """The probe itself: [] on a distinct corpus (skip regime), the
    duplicated hashes on a mixed corpus, None past the cap; and the
    hybrid grouping separates hash-colliding DIFFERENT contents by the
    real content key (forced by routing ALL rows through the grouped
    side with a fake all-hashes dup list)."""
    distinct = spark.createDataFrame(
        [(1, "aa"), (2, "bb"), (3, "cc")], ["doc_id", "text"]
    )
    assert DD._dup_content_hashes(distinct, "text") == []

    mixed = spark.createDataFrame(
        [(1, "aa"), (2, "aa"), (3, "bb"), (4, "cc"), (5, "cc")],
        ["doc_id", "text"],
    )
    got = DD._dup_content_hashes(mixed, "text")
    assert got is not None and len(got) == 2

    monkeypatch.setattr(DD, "_HYBRID_DUP_CAP", 1)
    assert DD._dup_content_hashes(mixed, "text") is None
    monkeypatch.undo()

    # collision safety: pretend EVERY hash is duplicated — unrelated
    # contents all enter the grouped side and must come out as separate
    # singleton reps (mg carries only the true duplicate groups)
    all_hashes = [
        r[0]
        for r in mixed.select(
            DD.F.xxhash64(DD.F.col("text")).alias("h")
        ).collect()
    ]
    reps, mg = DD._content_groups(mixed, "text", "doc_id", all_hashes)
    rep_rows = sorted(tuple(r) for r in reps.collect())
    assert rep_rows == [(1, "aa"), (3, "bb"), (4, "cc")]
    mg_rows = sorted((r["__rep"], sorted(r["__ids"])) for r in mg.collect())
    assert mg_rows == [(1, [1, 2]), (4, [4, 5])]
