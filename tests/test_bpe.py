"""BPE tokenizer-training operators: distributed pair counting asserted
against a pure-Python weighted reference, and the bounded driver-side
merge loop against the classic hand-computable Sennrich corpus."""

from __future__ import annotations

from collections import Counter

import pytest

from stateful_spark_streaming_spark.operators.text import (
    bpe_pair_counts,
    bpe_train,
)

# the canonical BPE walkthrough corpus (Sennrich et al. 2016 §3.2 shape):
# low×5 lower×2 newest×6 widest×3
_WORDS = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3


def _corpus(spark):
    # split across docs to prove counts aggregate across rows
    return spark.createDataFrame(
        [(0, " ".join(_WORDS[:8])), (1, " ".join(_WORDS[8:]))],
        "doc_id long, text string",
    )


def _ref_pairs() -> Counter:
    c: Counter = Counter()
    for w in _WORDS:
        for i in range(len(w) - 1):
            c[w[i : i + 2]] += 1
    return c


def test_bpe_pair_counts_weighted_reference(spark):
    got = {
        r["pair"]: (r["pair_count"], r["n_words"])
        for r in bpe_pair_counts(_corpus(spark), top_n=100).collect()
    }
    ref = _ref_pairs()
    nw = {
        p: len({w for w in set(_WORDS) if p in [w[i : i + 2] for i in range(len(w) - 1)]})
        for p in ref
    }
    assert got == {p: (n, nw[p]) for p, n in ref.items()}


def test_bpe_pair_counts_within_word_repeats(spark):
    # "aaa" contributes the pair "aa" TWICE per occurrence — the Sennrich
    # counting rule the distinct-pair shortcut would get wrong
    df = spark.createDataFrame([(0, "aaa aaa ab")], "doc_id long, text string")
    got = {r["pair"]: r["pair_count"] for r in bpe_pair_counts(df).collect()}
    assert got == {"aa": 4, "ab": 1}


def test_bpe_pair_counts_rank_deterministic(spark):
    rows = bpe_pair_counts(_corpus(spark), top_n=4).collect()
    # es/st tie at 9 → lexicographic; lo/ow tie at 8? (lo=7, ow=7, we=8)
    assert [(r["pair"], r["rank"]) for r in rows] == [
        ("es", 1),
        ("st", 2),
        ("we", 3),
        ("lo", 4),
    ]


def test_bpe_train_classic_merge_sequence(spark):
    # hand-computed: es/st tie at 9 → 'e s' first; then 'es t' at 9;
    # then the lo/ow tie at 7 → 'l o'
    merges = bpe_train(_corpus(spark), n_merges=3)
    assert merges == [("e", "s"), ("es", "t"), ("l", "o")]


def test_bpe_train_terminates_when_no_pairs(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    assert bpe_train(df, n_merges=10) == []


def test_bpe_train_overflow_guard(spark):
    df = spark.createDataFrame(
        [(0, "one two three four five")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="distinct words"):
        bpe_train(df, n_merges=1, max_driver_words=2)


# ---------------------------------------------------------------------------
# bpe_encode
# ---------------------------------------------------------------------------


def _ref_encode(word: str, merges: list[tuple[str, str]]) -> int:
    ranks = {p: i for i, p in enumerate(merges)}
    syms = list(word)
    while len(syms) > 1:
        ranked = [
            (ranks[(syms[i], syms[i + 1])], i)
            for i in range(len(syms) - 1)
            if (syms[i], syms[i + 1]) in ranks
        ]
        if not ranked:
            break
        _, i = min(ranked)
        syms[i : i + 2] = [syms[i] + syms[i + 1]]
    return len(syms)


def test_bpe_encode_matches_reference(spark):
    from stateful_spark_streaming_spark.operators.text import bpe_encode

    merges = bpe_train(_corpus(spark), n_merges=4)
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"], r["fertility_bp"])
        for r in bpe_encode(_corpus(spark), merges).collect()
    }
    docs = {0: _WORDS[:8], 1: _WORDS[8:]}
    want = {}
    for d, ws in docs.items():
        nb = sum(_ref_encode(w, merges) for w in ws)
        want[d] = (len(ws), nb, (10000 * nb) // len(ws))
    assert got == want
    # merges actually compress: fertility strictly below chars-per-word
    for d, (nw, nb, _) in got.items():
        assert nb < sum(len(w) for w in docs[d])


def test_bpe_encode_null_and_empty_docs_emit_nothing(spark):
    from stateful_spark_streaming_spark.operators.text import bpe_encode

    df = spark.createDataFrame(
        [(0, "low low"), (1, None), (2, "   ")], "doc_id long, text string"
    )
    got = {r["doc_id"] for r in bpe_encode(df, [("l", "o")]).collect()}
    assert got == {0}


def test_bpe_encode_no_merges_counts_chars(spark):
    from stateful_spark_streaming_spark.operators.text import bpe_encode

    df = spark.createDataFrame([(0, "ab cde")], "doc_id long, text string")
    [r] = bpe_encode(df, []).collect()
    assert (r["n_words"], r["n_bpe_tokens"], r["fertility_bp"]) == (2, 5, 25000)


# ---------------------------------------------------------------------------
# compression_stats
# ---------------------------------------------------------------------------


def test_compression_stats_exact_zlib(spark):
    import zlib

    from stateful_spark_streaming_spark.operators.text import compression_stats

    texts = {
        0: "the quick brown fox jumps over the lazy dog",
        1: "spam spam spam spam spam spam spam spam spam spam",
        2: "x",
    }
    df = spark.createDataFrame(
        list(texts.items()) + [(3, None), (4, "")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_bytes"], r["n_compressed"], r["ratio_bp"])
        for r in compression_stats(df).collect()
    }
    want = {}
    for d, t in texts.items():
        raw = t.encode()
        c = len(zlib.compress(raw, 6))
        want[d] = (len(raw), c, (10000 * c) // len(raw))
    assert got == want  # null + empty docs absent
    # the repetitive doc compresses far better than the natural one
    assert got[1][2] < got[0][2]
