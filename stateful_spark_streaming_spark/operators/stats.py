"""Mergeable fixed-width histograms and histogram-derived quantiles.

The scale problem these solve: exact percentiles over 100 TB need a
global sort (or ``percentile`` on a shuffled group — same thing), and
Spark's ``percentile_approx`` sketch is order-sensitive enough that a
streaming twin can't promise batch parity.  A FIXED-WIDTH histogram is
the boring answer that composes: per-partition bin counts are exact
integers, addition is the merge operator (associative / commutative /
no replay hazard beyond the usual batch-stamp dedupe), and any quantile
is answered from the ~``n_bins`` aggregated rows with integer-rank
arithmetic — resolution is the bin width, stated up front, instead of a
sketch's data-dependent error.  This is the same family as the repo's
DataSketches-HLL pair (``relational.distinct_sketch_stats``): a
mergeable summary whose streaming twin is pytested as EXACT equality
with the batch pass, not a tolerance.

Cross-engine determinism: values are binned through SCALED-INTEGER
arithmetic — ``bp = round(v * scale)`` (exact when ``v`` is already
rounded to ``log10(scale)`` places, as the repo's quality scores are),
then ``bin = bp * n_bins // scale`` — so a score sitting exactly on a
bin edge (0.5500 with 20 bins) lands in the same bin in Spark and in
the DuckDB oracle; raw ``floor((v - lo) / width)`` on doubles flips at
edges between engines.  Bin edges are likewise emitted as integer basis
points first, with the double form derived as ``bp / scale`` (an
IEEE-exact int/int division, identical in both engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scaled_bin(value: Column, n_bins: int, scale: int = 10_000) -> Column:
    """Bin a value in ``[0, 1]`` into ``n_bins`` equal bins via
    scaled-integer arithmetic (NULL in → NULL out).  ``floor`` on the
    double quotient is safe here: the quotient's granularity is
    ``1/scale``, ~11 orders of magnitude above double ulp at these
    magnitudes, so it can never straddle an integer boundary."""
    bp = F.round(value * scale, 0).cast("long")
    # guard the cap explicitly: F.least SKIPS nulls (least(NULL, 19) = 19),
    # so without the when() a NULL value would land in the last bin
    # instead of propagating
    return F.when(
        bp.isNotNull(),
        F.least(F.floor(bp * n_bins / F.lit(scale)), F.lit(n_bins - 1)),
    ).cast("int")


def histogram_finalize(
    counts: DataFrame, n_bins: int, scale: int = 10_000
) -> DataFrame:
    """Attach bin-edge columns to a ``(..., bin, n)`` counts frame — the
    shared tail of the batch operator and the streaming merge-on-read
    (same column set ⇒ the twins share one oracle).  ``bin_lo_bp`` is
    the integer ground truth; ``bin_lo`` is its derived double.

    The true lower edge of bin ``b`` under ``scaled_bin``'s
    ``bp * n_bins // scale`` rule is the smallest bp with that quotient,
    i.e. ``ceil(b * scale / n_bins)`` — computed in integers as
    ``(b * scale + n_bins - 1) div n_bins`` so edges stay exact when
    ``n_bins`` does not divide ``scale`` (3 bins over 10000 bp: bin 2
    starts at 6667, not truncation's 6666)."""
    lo_bp = F.floor(
        (F.col("bin") * F.lit(scale) + F.lit(n_bins - 1)) / F.lit(n_bins)
    )
    return counts.select(
        *[c for c in counts.columns if c not in ("bin", "n")],
        "bin",
        lo_bp.cast("int").alias("bin_lo_bp"),
        (lo_bp / F.lit(float(scale))).alias("bin_lo"),
        F.col("n").cast("long").alias("n"),
    )


def fixed_width_histogram(
    df: DataFrame,
    value: Column,
    group_cols: tuple[str, ...] = (),
    n_bins: int = 20,
    scale: int = 10_000,
) -> DataFrame:
    """Exact sparse histogram of ``value`` (a ``[0, 1]``-ranged column
    expression) per ``group_cols``: one row per non-empty ``(group, bin)``
    with its exact count — the partial-aggregatable shape (map-side
    combine collapses each task to ≤ ``groups × n_bins`` rows before the
    single exchange, so the shuffle is summary-sized regardless of input
    rows).  NULL values are dropped, matching SQL aggregate semantics.

    NULL bins are dropped AFTER the aggregate, from a PERSISTED counts
    frame (r14).  The old pre-agg ``bin IS NOT NULL`` filter was pushed
    below the projection, where Catalyst re-derives the ENTIRE value
    expression inside the Filter and then computes it again in the
    Project — 2× the quality-score regex tree per row for the
    quality_histogram / quality_quantiles callers
    (plans/r14/quality_histogram_{before,after}.txt).  A plain post-agg
    filter does NOT fix it: predicates on grouping keys are pushed back
    through the Aggregate and the alias substitution re-derives the
    expression all the same — the persist is the materialization
    barrier, and it is SUMMARY-sized (≤ ``groups × (n_bins+1)`` rows),
    so the cache cost is nil at any corpus scale.  Cache lifetime: the
    ``track_persist`` contract (one-shot callers ``clearCache()``
    between queries — bench.py does; long-lived callers
    ``caching.release_operator_caches()``)."""
    from stateful_spark_streaming_spark.caching import track_persist

    binned = df.select(*group_cols, scaled_bin(value, n_bins, scale).alias("bin"))
    counts = track_persist(
        binned.groupBy(*group_cols, "bin").agg(F.count(F.lit(1)).alias("n"))
    ).filter(F.col("bin").isNotNull())
    return histogram_finalize(counts, n_bins, scale)


def histogram_quantiles(
    hist: DataFrame,
    group_cols: tuple[str, ...] = (),
    qs_bp: tuple[int, ...] = (2_500, 5_000, 7_500, 9_500),
    scale: int = 10_000,
) -> DataFrame:
    """Quantiles from a :func:`fixed_width_histogram` frame, resolved to
    the LOWER EDGE of the bin where the cumulative count first reaches
    ``ceil(q × total)`` — the classic histogram-quantile estimator, kept
    in pure integer arithmetic (ranks via ``(total × q + scale−1) div
    scale``) so both engines pick the same bin always.

    The window here is NOT the banned hot-key shape: it runs over the
    AGGREGATED histogram (≤ ``n_bins`` rows per group), never over raw
    data, so the largest possible partition is ``n_bins`` rows.  Output:
    one row per group with ``p{q}`` double columns (bin-lower-edge
    values) plus ``total``."""
    w = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tw = Window.partitionBy(*[F.col(c) for c in group_cols])
    cum = hist.select(
        *group_cols,
        "bin",
        "bin_lo_bp",
        F.sum("n").over(w).alias("cum"),
        F.sum("n").over(tw).alias("total"),
    )
    aggs = [F.max("total").cast("long").alias("total")]
    for q in qs_bp:
        # ceil(total * q / scale) in integers; floor() on the double
        # quotient is edge-safe for the same granularity reason as
        # scaled_bin
        rank = F.floor((F.col("total") * q + (scale - 1)) / F.lit(scale))
        name = f"p{q // (scale // 100)}"
        aggs.append(
            F.min(
                F.when(F.col("cum") >= rank, F.col("bin_lo_bp"))
            ).alias(f"__{name}_bp")
        )
    out = cum.groupBy(*group_cols).agg(*aggs)
    for q in qs_bp:
        name = f"p{q // (scale // 100)}"
        out = out.withColumn(name, F.col(f"__{name}_bp") / F.lit(float(scale)))
    return out.select(*group_cols, "total", *[f"p{q // (scale // 100)}" for q in qs_bp])


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters — the third mergeable summary family
# (HLL distincts, fixed-width histograms, and now bounded-memory
# frequency estimation).  Hashes are md5-derived (the repo's MinHash /
# SimHash trick) so even the SKETCH carries an exact cross-engine
# oracle: DuckDB reproduces every counter and every estimate verbatim.
# ---------------------------------------------------------------------------


def _cms_bucket(token: Column, row: int, width: int) -> Column:
    """Counter column for hash row ``row``: md5-derived 60-bit hash of
    ``"cms<row>:" || token`` mod ``width`` — DuckDB form:
    ``('0x' || substring(md5('cms' || r || ':' || token), 1, 15))::BIGINT
    % width``."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"cms{row}:"), token)), 1, 15), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(width)).cast("int")


def _cms_probes(token_col: str, depth: int, width: int) -> Column:
    """The (r, b) probe struct-array for one token — THE shared
    build/probe shape: cms_counters increments exactly the buckets
    cms_estimate reads, so a change here can never desynchronize them."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("r"),
                _cms_bucket(F.col(token_col), i, width).alias("b"),
            )
            for i in range(depth)
        ]
    )


def cms_counters(
    occurrences: DataFrame,
    token_col: str = "token",
    depth: int = 4,
    width: int = 1024,
    precount: bool = True,
) -> DataFrame:
    """The ``depth × width`` count-min counter table as (r, b, n) rows —
    each token OCCURRENCE increments one bucket per hash row.  Fully
    mergeable: counters are sums, so per-partition partials collapse
    map-side and cross-batch/stream merge is addition; the aggregated
    state is ≤ depth·width rows no matter the corpus (the whole point:
    vocabulary-frequency tracking whose memory does not grow with the
    vocabulary).

    ``precount=True`` hashes per DISTINCT token, not per occurrence:
    counter values are bit-identical (Σ occurrences hashing into a
    bucket = Σ_token n_token·[token→bucket]) but the md5 probe work
    drops from depth×occurrences to depth×vocabulary — the sf10 probe
    measured the per-occurrence form at 138 s for 33 M occurrences of a
    130-token vocabulary, vs ~12 s pre-counted (Zipf corpora: distinct ≪
    occurrences).  The tradeoff, stated honestly: the pre-count's
    map-side combine emits distinct-per-task rows into a vocab-keyed
    shuffle, while the direct form's shuffle is always ≤ depth·width
    rows — for an ADVERSARIALLY unique key space (every token distinct,
    the regime the sketch exists for) pass ``precount=False`` to keep
    the shuffle sketch-sized; the hash cost is the same there anyway."""
    if precount:
        per = occurrences.groupBy(token_col).agg(F.count(F.lit(1)).alias("__n"))
        return cms_counters_from_counts(per, token_col, "__n", depth, width)
    return (
        occurrences.select(F.explode(_cms_probes(token_col, depth, width)).alias("p"))
        .groupBy(F.col("p.r").alias("r"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_counters_from_counts(
    counts: DataFrame,
    token_col: str = "token",
    n_col: str = "n",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Counter table from an already-aggregated (token, count) vocabulary
    frame: each token's probes carry its full count in one row — the
    shared tail of ``cms_counters(precount=True)`` and callers that
    already hold a vocabulary frame for other reasons (so the corpus is
    tokenized exactly once)."""
    return (
        counts.select(
            F.explode(_cms_probes(token_col, depth, width)).alias("p"),
            F.col(n_col).alias("__cnt"),
        )
        .groupBy(F.col("p.r").alias("r"), F.col("p.b").alias("b"))
        .agg(F.sum("__cnt").alias("n"))
    )


def cms_estimate(
    counters: DataFrame,
    candidates: DataFrame,
    token_col: str = "token",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point estimates for every candidate token: ``min`` over the
    ``depth`` counters the token hashes into — the classic CMS upper
    bound (never under-counts; over-counts by collision mass).  The
    counter table (≤ depth·width rows) BROADCASTS; the probe is one
    map-side explode + broadcast join + min aggregate."""
    probes = candidates.select(
        F.col(token_col),
        F.explode(_cms_probes(token_col, depth, width)).alias("p"),
    ).select(token_col, F.col("p.r").alias("r"), F.col("p.b").alias("b"))
    return (
        probes.join(F.broadcast(counters), ["r", "b"], "left")
        .groupBy(token_col)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).cast("long").alias("est_count"))
    )


def cms_topk(
    counters: DataFrame,
    candidates: DataFrame,
    k: int = 20,
    token_col: str = "token",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Shared heavy-hitter tail for the batch operator and the streaming
    twin: estimates + deterministic top-k (est DESC, token ASC —
    ``orderBy().limit()`` lowers to TakeOrderedAndProject: per-partition
    heaps, never a global sort)."""
    est = cms_estimate(counters, candidates, token_col, depth, width)
    return est.orderBy(F.col("est_count").desc(), token_col).limit(k)


def heavy_hitters_cms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Top-k most frequent tokens by count-min estimate.  vs the exact
    ``vocab_topk``: the exact path shuffles one row per distinct token —
    fine until the vocabulary itself is huge (web-scale shingle or
    n-gram counting) — while the sketch's aggregated state is a fixed
    depth×width table.  Candidates here are the corpus's distinct
    tokens (exact-equivalent demo form); the production refinement at a
    truly unbounded key space is per-batch candidate heaps.

    ONE corpus pass: the per-token count frame (vocab-sized, pinned —
    it feeds both the counter build and the candidate list) replaces
    the old occurrence-level probe explode + separate distinct, which
    the sf10 probe measured as the family's one super-linear outlier
    (133 s at 100× docs: depth·occurrences md5 probes for a 130-token
    vocabulary, plus a second tokenize for the candidates)."""
    from stateful_spark_streaming_spark.caching import track_persist
    from stateful_spark_streaming_spark.operators.text import _token_occurrences

    occ = _token_occurrences(df, text_col, id_col)
    vocab = track_persist(
        occ.groupBy("token").agg(F.count(F.lit(1)).alias("__n"))
    )
    return cms_topk(
        cms_counters_from_counts(vocab, "token", "__n", depth, width),
        vocab.select("token"),
        k,
        "token",
        depth,
        width,
    )


def trim_by_quantile(
    scored: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...],
    q_bp: int = 2_500,
    n_bins: int = 20,
    scale: int = 10_000,
) -> DataFrame:
    """Drop each group's bottom ``q_bp`` quantile of ``value_col`` — the
    per-source quality floor a mixture build applies (Gopher/C4-style
    pipelines trim the worst slice of every source rather than imposing
    one global threshold, which would empty low-register sources).

    This is WHY the histogram family exists: the threshold derives from
    the ≤ ``n_bins``-row histogram (never a global sort), broadcasts
    (group-cardinality rows), and the trim itself is a map-only filter —
    at 100 TB the whole operation costs one summary-sized aggregate plus
    one pass.  Rows with NULL ``value_col`` are dropped (no quantile
    membership), matching the histogram's NULL policy.

    ``scored`` is PERSISTED here (r14, guide §5/§2.4): it feeds BOTH the
    histogram branch and the trim filter, and Spark re-evaluates an
    unpersisted subtree per branch — for the quality-score caller that
    meant the whole regex-tokenizer expression tree ran FOUR times (the
    pushed ``isnotnull`` filter re-derives the full expression, then the
    projection computes it again — on each of the two document scans).
    The cache is the narrow scored projection, not corpus text; cache
    lifetime follows the ``unigram_logprob`` contract — one-shot callers
    ``clearCache()`` between queries (bench.py does) or
    ``caching.release_operator_caches()``; at 100 TB stage the scored
    frame to storage and trim from the staged copy instead."""
    from stateful_spark_streaming_spark.caching import track_persist

    scored = track_persist(scored)
    hist = fixed_width_histogram(
        scored, F.col(value_col), group_cols, n_bins, scale
    )
    name = f"p{q_bp // (scale // 100)}"
    thr = histogram_quantiles(hist, group_cols, (q_bp,), scale).select(
        *group_cols, F.col(name).alias("__thr")
    )
    return (
        scored.join(F.broadcast(thr), list(group_cols))
        .filter(F.col(value_col) >= F.col("__thr"))
        .drop("__thr")
    )


def bucketize_by_quantile(
    scored: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...],
    n_buckets: int = 10,
    n_bins: int = 20,
    scale: int = 10_000,
) -> DataFrame:
    """Equi-height bucketing WITHOUT a global sort: assign each row its
    per-group quantile bucket (0..n_buckets-1) by counting how many of
    the group's histogram-derived quantile thresholds the value reaches.
    NTILE semantics need a total order (a single-partition sort at
    scale); threshold bucketing needs only the ≤ n_bins-row histogram —
    the thresholds broadcast (group-cardinality rows) and the assignment
    is a map-only pass, the standard feature-bucketing shape for model
    inputs at 100 TB.  Resolution is the bin width: rows within one bin
    share a bucket (bucket POPULATIONS are approximately equal, exactly
    as equal as the histogram can see).  NULL values get NULL buckets.

    ``scored`` is PERSISTED here for the same reason as
    :func:`trim_by_quantile` (r14): it feeds both the histogram branch
    and the bucket-assignment pass, and the unpersisted subtree was
    re-evaluated per branch (4× the quality expression tree for the
    deciles caller).  Same cache-lifetime contract."""
    if n_buckets > 100:
        # threshold columns are named at percent granularity
        # (histogram_quantiles' p{q//(scale//100)}); finer bucketing
        # would collide names — and needs n_bins > 100 to resolve anyway
        raise ValueError("bucketize_by_quantile supports n_buckets <= 100")
    from stateful_spark_streaming_spark.caching import track_persist

    scored = track_persist(scored)
    hist = fixed_width_histogram(
        scored, F.col(value_col), group_cols, n_bins, scale
    )
    qs = tuple((i * scale) // n_buckets for i in range(1, n_buckets))
    names = [f"p{q // (scale // 100)}" for q in qs]
    thr = histogram_quantiles(hist, group_cols, qs, scale).select(
        *group_cols, *names
    )
    bucket = None
    for n in names:
        term = F.when(F.col(value_col) >= F.col(n), 1).otherwise(0)
        bucket = term if bucket is None else bucket + term
    return (
        scored.join(F.broadcast(thr), list(group_cols))
        .withColumn(
            "bucket",
            F.when(F.col(value_col).isNotNull(), bucket).cast("int"),
        )
        .drop(*names)
    )


# ---------------------------------------------------------------------------
# Distribution drift — total-variation distance between each source's token
# distribution and the corpus-wide distribution, in scaled-integer
# arithmetic so the comparison is exact across engines (no float logs, no
# summation-order sensitivity: every probability is an integer basis-point
# value and TV is a sum of integer absolute differences).  The summary the
# drift derives from — (source, token, count) — is additive, so the
# streaming twin stages per-batch count partials and shares this exact tail.
# ---------------------------------------------------------------------------


def unigram_source_counts(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """(group, token, c) occurrence counts — the mergeable summary under
    ``source_drift``.  One partial-aggregatable corpus-wide shuffle on
    (group, token); map-side combine collapses within-partition repeats
    before anything moves."""
    from stateful_spark_streaming_spark.operators.text import tokens

    return (
        df.select(F.col(group_col), F.explode(tokens(F.col(text_col))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy(group_col, "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def source_drift_from_counts(
    counts: DataFrame,
    group_col: str = "source",
    scale: int = 100_000_000,
) -> DataFrame:
    """Total-variation distance of each group's token distribution from
    the corpus-wide distribution, from a (group, token, c) count summary.

    All-integer: with ``p_s = (scale*c_s) div tot_s`` and
    ``p = (scale*c) div tot``, TV splits over tokens present/absent in
    the group —

        ``TV_s = (sum_{t in s} (|p_s - p| - p) + sum_t p) div 2``

    so the per-group sum only touches the group's own vocabulary and the
    global term ``S2 = sum_t p`` is one shared constant.  Every quantity
    is a BIGINT; both engines truncate identically, making the oracle
    hash-exact.  Overflow bound: ``scale * tot`` must fit BIGINT, i.e.
    ``tot <= 9.2e18 / scale`` total tokens (~9e10 at the 1e8 default —
    guarded with ``raise_error``, never a silent wrap; drop ``scale`` to
    1e6/1e4 for larger corpora: TV in bp only needs 4 digits).

    Scale shape: everything after the count summary is vocabulary-sized,
    not corpus-sized — one shuffle join on token between two vocab-sized
    frames, group totals and the two single-row constants broadcast.  The
    count summary feeds FOUR consumers (group totals, global counts, the
    per-group join, and through it the constants), so it is pinned via
    ``track_persist`` — without the pin each consumer would re-run the
    corpus-wide tokenize+shuffle pass.

    Returns (group, total_tokens, n_tokens_distinct, tv_scaled, tv_bp).
    """
    from stateful_spark_streaming_spark.caching import track_persist

    counts = track_persist(counts)
    lim = (1 << 63) // scale - 1
    tot_s = counts.groupBy(group_col).agg(F.sum("c").alias("__tot_s"))
    glob = counts.groupBy("token").agg(F.sum("c").alias("__cg"))
    tot = glob.agg(
        F.when(
            F.sum("__cg") > F.lit(lim),
            F.raise_error(
                F.concat(
                    F.lit(f"source_drift: corpus too large for scale={scale}: "),
                    F.sum("__cg").cast("string"),
                    F.lit(f" tokens > bound {lim}; lower scale"),
                )
            ).cast("long"),
        )
        .otherwise(F.sum("__cg"))
        .alias("__tot")
    )
    glob_p = glob.crossJoin(F.broadcast(tot)).select(
        "token", F.expr(f"(CAST({scale} AS BIGINT) * __cg) div __tot").alias("__pg")
    )
    s2 = glob_p.agg(F.sum("__pg").alias("__s2"))
    per = (
        counts.join(F.broadcast(tot_s), group_col)
        .join(glob_p, "token")
        .withColumn("__ps", F.expr(f"(CAST({scale} AS BIGINT) * c) div __tot_s"))
        .groupBy(group_col)
        .agg(
            F.max("__tot_s").alias("total_tokens"),
            F.count(F.lit(1)).alias("n_tokens_distinct"),
            F.sum(F.abs(F.col("__ps") - F.col("__pg")) - F.col("__pg")).alias("__s1"),
        )
    )
    return per.crossJoin(F.broadcast(s2)).select(
        group_col,
        "total_tokens",
        "n_tokens_distinct",
        F.expr("(__s1 + __s2) div 2").alias("tv_scaled"),
        F.expr(f"((__s1 + __s2) div 2) div {scale // 10_000}").cast("int").alias("tv_bp"),
    )


def source_drift(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    scale: int = 100_000_000,
) -> DataFrame:
    """Corpus composition monitoring: how far each source's token
    distribution sits from the blended corpus distribution (TV distance,
    0 = identical, 10000 bp = disjoint).  The audit every mixture change
    / new-crawl ingest should run — a source whose drift jumps between
    snapshots changed character, not just size.  See
    ``source_drift_from_counts`` for the arithmetic and scale story."""
    return source_drift_from_counts(
        unigram_source_counts(df, text_col, group_col), group_col, scale
    )
