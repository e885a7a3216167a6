"""Property-based equivalence of the Arrow kernels vs their JVM forms.

The r4 perf work moved shingle/MinHash/SimHash computation into Python
kernels that re-implement normalize→tokenize→hash by hand; the synthetic
corpus is ASCII-ish, so these hypothesis tests drive adversarial text
(unicode, punctuation runs, digits, whitespace shapes) through BOTH
implementations and require exact equality — the property the DuckDB
oracles stand on."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

TEXT = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Cs",), max_codepoint=0x2FFF
    ),
    max_size=80,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_shingle_index_kernel_property(spark, texts):
    from stateful_spark_streaming_spark.operators.dedup import _shingle_index
    from stateful_spark_streaming_spark.operators.text import shingles

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    hof = (
        df.select(F.col("doc_id").alias("doc"), shingles(F.col("text"), 3).alias("sh"))
        .withColumn("set_size", F.size("sh"))
        .select("doc", "set_size", F.explode("sh").alias("shingle"))
    )
    want = {tuple(r) for r in hof.collect()}
    got = {tuple(r) for r in _shingle_index(df, "text", "doc_id", 3).collect()}
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(TEXT, min_size=1, max_size=6))
def test_simhash_kernel_property(spark, texts):
    from stateful_spark_streaming_spark.operators import dedup as DD

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    jvm = {(r[0], r[1]) for r in DD.simhash(df).collect()}
    np_ = {(r[0], r[1]) for r in DD.simhash_fingerprints_mapinpandas(df).collect()}
    assert np_ == jvm


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(TEXT, min_size=1, max_size=6))
def test_minhash_band_kernel_property(spark, texts):
    from stateful_spark_streaming_spark.operators import dedup as DD

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    band_arr = DD.minhash_bands_mapside(F.col("text"))
    sentinel = F.array(F.md5(F.concat(F.lit("uniq:"), F.col("doc_id").cast("string"))))
    hof = {
        (r[0], r[1])
        for r in df.select(
            "doc_id",
            F.explode(
                F.when(F.size(band_arr) > 0, band_arr).otherwise(sentinel)
            ).alias("band_hash"),
        ).collect()
    }
    np_ = {(r[0], r[1]) for r in DD.minhash_band_rows_mapinpandas(df).collect()}
    assert np_ == hof


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(TEXT, min_size=1, max_size=6))
def test_gram_positions_kernel_property(spark, texts):
    """_gram_positions (multiset WITH positions) must equal the JVM HOF
    form: posexplode of the non-deduped k-gram array over normalized
    tokens, empty/<k-token docs emitting nothing."""
    from stateful_spark_streaming_spark.operators.dedup import _gram_positions
    from stateful_spark_streaming_spark.operators.text import _ngrams_raw, tokens

    k = 3
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    hof = df.select(
        F.col("doc_id").alias("doc"),
        F.posexplode(_ngrams_raw(tokens(F.col("text")), k)).alias("pos", "gram"),
    )
    want = {tuple(r) for r in hof.collect()}
    got = {tuple(r) for r in _gram_positions(df, "text", "doc_id", k).collect()}
    assert got == want


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1023),
            st.integers(min_value=0, max_value=1023),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_zorder_key_property(spark, pairs):
    """The JVM bit-interleave must equal the reference python interleave
    for arbitrary 10-bit inputs."""
    from stateful_spark_streaming_spark.operators import layout as LAY

    from tests.conftest import ref_interleave as ref

    df = spark.createDataFrame(pairs, ["a", "b"])
    got = df.select(
        "a", "b", LAY.zorder_key(F.col("a"), F.col("b"), 10).alias("z")
    ).collect()
    for r in got:
        assert r.z == ref(r.a, r.b)


# ---------------------------------------------------------------------------
# Lossless-blocking properties (round 8): the three blocked joins claim
# candidate generation loses NOTHING vs the brute-force definition.  The
# catalog oracles prove it on the fixture corpus; these drive adversarial
# random inputs through the same equivalence.
# ---------------------------------------------------------------------------


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.text(alphabet="abc", min_size=0, max_size=6),
        min_size=2,
        max_size=8,
        unique=True,
    )
)
def test_fuzzy_pairs_property(spark, names):
    """FastSS deletion-neighborhood join == brute force for lev <= 2,
    over a tiny alphabet (maximizes near-collisions and shared variants,
    including the empty string and duplicate deletion variants)."""
    import itertools

    from stateful_spark_streaming_spark.operators.relational import (
        fuzzy_name_pairs,
    )

    df = spark.createDataFrame([(n,) for n in names], "p_name string")
    got = {
        (r["name_a"], r["name_b"], r["lev"])
        for r in fuzzy_name_pairs(df, "p_name", max_dist=2).collect()
    }
    want = {
        (a, b, _lev(a, b))
        for a, b in itertools.combinations(sorted(names), 2)
        if _lev(a, b) <= 2
    }
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 400), st.integers(1, 250)),
        min_size=2,
        max_size=10,
    )
)
def test_interval_overlap_property(spark, spans):
    """Bin-blocked interval join == brute force, intervals landing on and
    straddling bin edges at random (bin width 100, half-open)."""
    import itertools

    from stateful_spark_streaming_spark.operators.temporal import (
        interval_overlap_pairs,
    )

    ivs = [(i, s, s + d) for i, (s, d) in enumerate(spans)]
    df = spark.createDataFrame(ivs, "event_id long, start_ms long, end_ms long")
    got = {
        (r["id_a"], r["id_b"], r["overlap_ms"])
        for r in interval_overlap_pairs(df, bin_ms=100).collect()
    }
    want = set()
    for (ia, sa, ea), (ib, sb, eb) in itertools.combinations(ivs, 2):
        if sa < eb and sb < ea:
            want.add((min(ia, ib), max(ia, ib), min(ea, eb) - max(sa, sb)))
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.integers(0, (1 << 64) - 1), min_size=2, max_size=8, unique=True
    )
)
def test_hamming_pairs_property(spark, hashes):
    """Banded-Hamming join == brute force at the pigeonhole boundary
    (t=4, 5 bands) over random 64-bit hashes."""
    import itertools

    from stateful_spark_streaming_spark.operators.dedup import (
        hamming_near_pairs,
    )

    bits = {i: format(h, "064b") for i, h in enumerate(hashes)}
    df = spark.createDataFrame(
        [(i, b) for i, b in bits.items()], "image_id long, bits string"
    )
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_near_pairs(df, "image_id", "bits", max_ham=4).collect()
    }
    want = {
        (i, j, sum(x != y for x, y in zip(bits[i], bits[j])))
        for i, j in itertools.combinations(sorted(bits), 2)
        if sum(x != y for x, y in zip(bits[i], bits[j])) <= 4
    }
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(  # change stream: (key 0-3, value, seq 1-5, is_delete)
        st.tuples(
            st.integers(0, 3),
            st.integers(0, 99),
            st.integers(1, 5),
            st.booleans(),
        ),
        min_size=1,
        max_size=8,
    ),
    st.randoms(),
)
def test_merge_apply_random_convergence(spark, changes, rnd):
    """merge_apply_batch vs a reference latest-wins-with-tombstones model
    under RANDOM batch splits and application order: the table converges
    to the highest-seq image per key (ties: arrival order within the
    engine's max(struct) is deterministic, so equal seqs are excluded by
    construction here — the contract says give batches unique seqs),
    deletes tombstone rather than forget, and replaying any batch twice
    changes nothing."""
    from stateful_spark_streaming_spark.operators.merge import (
        merge_apply_batch,
        merged_view,
        with_merge_meta,
    )

    # de-duplicate (key, seq) pairs — the operator's stated contract
    seen = set()
    uniq = []
    for k, v, s, d in changes:
        if (k, s) not in seen:
            seen.add((k, s))
            uniq.append((k, v, s, d))
    if not uniq:
        return

    # reference model: per key, the highest-seq change wins
    ref = {}
    for k, v, s, d in uniq:
        if k not in ref or s > ref[k][0]:
            ref[k] = (s, v, d)
    base_rows = [(9, 999)]  # untouched key rides through
    want = sorted(
        [(k, v) for k, (s, v, d) in ref.items() if not d] + base_rows
    )

    cur = with_merge_meta(
        spark.createDataFrame(base_rows, "k long, v long")
    )
    # random split into 1-3 batches, applied in shuffled order, one
    # batch replayed twice
    n_b = rnd.randint(1, 3)
    batches = [[] for _ in range(n_b)]
    for ch in uniq:
        batches[rnd.randrange(n_b)].append(ch)
    batches = [b for b in batches if b]
    rnd.shuffle(batches)
    if batches:
        batches.append(rnd.choice(batches))  # replay
    for b in batches:
        bdf = spark.createDataFrame(
            [(k, v, s, "D" if d else "U") for k, v, s, d in b],
            "k long, v long, __seq int, op string",
        )
        cur = merge_apply_batch(cur, bdf, ("k",), seq_col="__seq")
    got = sorted(
        (r["k"], r["v"]) for r in merged_view(cur).select("k", "v").collect()
    )
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 5),
            st.one_of(st.none(), st.floats(-10, 10, allow_nan=False)),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_expectations_report_property(spark, rows):
    """expectations_report == the Python reference on random frames with
    NULLs: violations = rows where the predicate is false OR NULL;
    uniqueness = rows minus distinct keys."""
    from stateful_spark_streaming_spark.operators.relational import (
        expectations_report,
    )

    df = spark.createDataFrame(rows, "k long, v double")
    got = {
        r["check"]: (r["n_rows"], r["n_violations"], r["passed"])
        for r in expectations_report(
            df, [("v_pos", F.col("v") > 0)], key_col="k"
        ).collect()
    }
    n = len(rows)
    v_viol = sum(1 for _, v in rows if v is None or not (v > 0))
    u_viol = n - len({k for k, _ in rows})
    assert got == {
        "v_pos": (n, v_viol, v_viol == 0),
        "unique(k)": (n, u_viol, u_viol == 0),
    }


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.integers(0, 10_000), min_size=5, max_size=40
    )
)
def test_bucketize_property(spark, bps):
    """bucketize_by_quantile == a pure-integer Python reference that
    replays the exact scaled-integer pipeline (bin -> ceil-edge -> ceil
    ranks -> lower-edge thresholds -> count of reached thresholds)."""
    from stateful_spark_streaming_spark.operators.stats import (
        bucketize_by_quantile,
    )

    n_bins, scale, k = 20, 10_000, 4
    rows = [(i, "s", bp / scale) for i, bp in enumerate(bps)]
    df = spark.createDataFrame(rows, "doc_id long, source string, v double")
    got = {
        r["doc_id"]: r["bucket"]
        for r in bucketize_by_quantile(
            df, "v", ("source",), n_buckets=k, n_bins=n_bins
        ).collect()
    }

    # integer reference
    def bin_of(bp):
        return min(bp * n_bins // scale, n_bins - 1)

    from collections import Counter

    hist = Counter(bin_of(bp) for bp in bps)
    total = len(bps)
    thresholds = []
    for i in range(1, k):
        q = (i * scale) // k
        rank = (total * q + scale - 1) // scale
        cum = 0
        for b in sorted(hist):
            cum += hist[b]
            if cum >= rank:
                lo_bp = (b * scale + n_bins - 1) // n_bins
                thresholds.append(lo_bp / scale)
                break
    want = {
        i: sum(1 for t in thresholds if bp / scale >= t)
        for i, bp in enumerate(bps)
    }
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.sampled_from("abc"), st.integers(0, 400)),
        min_size=1,
        max_size=120,
    ),
    st.sampled_from([4, 16]),
)
def test_kmv_kernel_property(spark, rows, k):
    """KMV sketch kernel properties on arbitrary (key, value) data:
    (1) with k >= distinct values per key the estimate is EXACT;
    (2) the two-level salted bottom-k is invariant in salt_buckets
    (1 vs 16 vs 64 — the decomposition-exactness proof as a test);
    (3) a python re-derivation of the estimator from the same md5
    hashes matches the Spark result exactly."""
    import hashlib
    import math

    from stateful_spark_streaming_spark.operators import relational as REL

    df = spark.createDataFrame(
        [(key, v) for key, v in rows], "k string, v long"
    )
    outs = []
    for sb in (1, 16, 64):
        bottom = REL.kmv_bottom_hashes(df, "k", "v", k=k, salt_buckets=sb)
        counts = df.groupBy("k").agg(F.count(F.lit(1)).alias("n_rows"))
        got = {
            r["k"]: (r["n_rows"], r["kmv_distinct"])
            for r in REL.kmv_finalize(bottom, counts, "k", k).collect()
        }
        outs.append(got)
    assert outs[0] == outs[1] == outs[2], "salt_buckets changed the sketch"

    # python reference: same md5-60bit hashes, same estimator
    by_key: dict = {}
    n_by_key: dict = {}
    for key, v in rows:
        n_by_key[key] = n_by_key.get(key, 0) + 1
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        by_key.setdefault(key, set()).add(h)
    for key, hashes in by_key.items():
        bottom_k = sorted(hashes)[:k]
        m = len(bottom_k)
        if m < k:
            want = m
        else:
            want = math.floor(float(k - 1) * 2.0**60 / float(bottom_k[-1]))
        assert outs[0][key] == (n_by_key[key], want), key
        if len(hashes) < k:  # STRICT: at exactly k the estimator engages
            assert outs[0][key][1] == len(hashes)  # exact branch
