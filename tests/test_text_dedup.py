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

    # both tiers agree on the same graph
    got3 = {r.doc_id: r.cluster_rep for r in dup_clusters(chain).collect()}
    assert got3 == got2
