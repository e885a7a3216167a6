"""Deduplication operators — exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup (BASELINE.json north star).

Scale design (the 100 TB story, per operator):

- **exact**: hash-groupBy on a 128-bit content fingerprint — one shuffle of
  (fp, doc_id) pairs only, never the text bodies.
- **n-gram Jaccard**: inverted-index self-join on shingles (explode → join on
  shingle → count per pair).  The classic quadratic blowup is bounded by (a)
  distinct-shingle explode, (b) a size-band prefilter (|A|/|B| must exceed the
  threshold for J(A,B) ≥ τ), and (c) hot-shingle removal (a shingle shared by
  thousands of docs contributes O(n²) candidate pairs but is almost always
  boilerplate — drop shingles with df > max_shingle_df).
- **MinHash+LSH**: signatures via md5-derived 60-bit hashes (fixed-width hex
  substrings — lexicographic min ≡ numeric min, and DuckDB reproduces them
  exactly, so the whole pipeline is oracle-checkable) — JVM-side, no Python;
  banding turns the all-pairs problem into an equi-join on (band_id,
  band_hash); candidates verified with exact Jaccard.
- **SimHash**: 60 conditional-sum aggregates over exploded md5-derived token
  hashes — pure hash-aggregate, one shuffle on doc_id.
- **embedding cosine**: normalized vectors; brute-force pair join at test SF,
  random-hyperplane LSH bucketing as the scale path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from stateful_spark_streaming_spark.caching import track_persist
from stateful_spark_streaming_spark.operators.text import normalize_text, shingles


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
) -> DataFrame:
    """Exact dedup on normalized-text fingerprint; survivor = lowest id
    (deterministic).  Returns one row per distinct content with the survivor
    id and the duplicate count.  ``tokens_col``: pre-computed token array —
    ``array_join(toks, ' ')`` IS the normalized text (split/join
    round-trip), so the fingerprint is bit-identical either way."""
    norm = (
        F.array_join(F.col(tokens_col), " ")
        if tokens_col
        else normalize_text(F.col(text_col))
    )
    fp = F.md5(norm)
    return (
        df.select(F.col(id_col), fp.alias("content_fp"))
        .groupBy("content_fp")
        .agg(
            F.min(id_col).alias("survivor_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


import re as _re

#: the Python mirror of text.normalize_text()'s character class — ONE
#: definition for every Arrow kernel, so the oracle-equality contract the
#: hypothesis tests pin cannot desynchronize across kernels
_NONWORD = _re.compile(r"[^a-z0-9]+")


def _py_tokens(text) -> list | None:
    """Python mirror of ``text.tokens()`` for the Arrow kernels,
    byte-identical to the JVM form INCLUDING null semantics: None/NaN
    text returns None (the JVM null token array — the doc emits nothing
    from explode-based forms), empty text returns [''] (the JVM split
    of '').  ``str(text)`` without the null guard would fabricate the
    token 'none' and, e.g., pair two null-text docs as hamming-0
    near-dups."""
    if text is None or (isinstance(text, float) and text != text):
        return None
    return _NONWORD.sub(" ", str(text).lower()).strip().split(" ")


def _id_typed_schema(df: DataFrame, id_col: str, out_name: str, rest: str):
    """Kernel output schema with the id field TYPED FROM THE INPUT — the
    Arrow kernels must honor the advertised ``id_col`` genericity (string
    ids are legitimate document keys); a hardcoded ``long`` would fail the
    Arrow conversion at runtime."""
    from pyspark.sql.types import StructField, StructType, _parse_datatype_string

    rest_fields = list(_parse_datatype_string(f"struct<{rest}>").fields)
    return StructType(
        [StructField(out_name, df.schema[id_col].dataType)] + rest_fields
    )


#: literal-IN cap for the hybrid decomposition path: past this many
#: duplicated contents the dup-hash set stops being a small driver-side
#: literal (Catalyst IN-trees grow with it; the merge runner caps its
#: bucket predicate at the same order) and the full grouping is the
#: right plan anyway — the corpus is duplicate-heavy, which is the
#: regime the r13 decomposition optimizes.
_HYBRID_DUP_CAP = 1000


def _dup_content_hashes(df: DataFrame, col: str) -> list | None:
    """ONE-action duplicate-mass probe for the pair-generator family's
    decomposition (r14, VERDICT r13 #3): the ``xxhash64`` values of
    ``col`` that occur on MORE than one row, collected only while the
    set stays small.

    Returns ``[]`` (provably duplicate-free — the grouping + expansion
    stages are the identity and can be skipped outright, guide §2.4),
    a list of ≤ ``_HYBRID_DUP_CAP`` hashes (the NEARLY-distinct regime:
    group only the rows carrying those hashes — two map-only literal
    filters instead of a full-content shuffle), or ``None`` (more
    duplicated contents than the cap: duplicate-heavy corpus, take the
    full r13 grouping, whose one content shuffle is then the useful
    work).

    Cost/soundness shape: one aggregation over ``xxhash64(col)`` —
    8 bytes/row cross its exchange with map-side partials, where a
    ``groupBy`` over the content itself shuffles full payloads.  Equal
    contents force equal hashes, so a hash absent from the list PROVES
    its content unduplicated; a collision between two DIFFERENT
    contents only ADDS a hash to the list, and the rows it pulls into
    the grouping are separated there by the real content — never a
    wrong answer, at worst a few extra grouped rows.  NULL contents
    hash to the seed constant (non-NULL), so m NULL rows surface as one
    duplicated hash — matching ``groupBy``'s NULLs-group-together
    semantics.  Every caller's OUTPUT is identical across all three
    regimes (oracle-checked); only the plan changes."""
    rows = (
        df.groupBy(F.xxhash64(F.col(col)).alias("__h"))
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= 2)
        .select("__h")
        .limit(_HYBRID_DUP_CAP + 1)
        .collect()
    )
    if len(rows) > _HYBRID_DUP_CAP:
        return None
    return [r["__h"] for r in rows]


def _content_groups(
    df: DataFrame, content: str, id_col: str, dup_hashes: list | None
):
    """reps/mg builder shared by the text pair generators (r14): returns
    ``reps`` — one row of (``id_col``, ``content``) per DISTINCT content,
    id = min id over the content's rows — and ``mg``, the persisted
    (__rep, __ids) frame for contents with ≥ 2 rows, which is the ONLY
    part of the grouping the output expansion needs (singleton expansion
    is the identity; callers apply it via coalesce-to-self, so the
    corpus-sized singleton tail never enters an expansion join).

    ``dup_hashes=None`` → FULL regime (the r13 decomposition): one
    ``groupBy`` over the whole content column — the content shuffle IS
    the useful work on a duplicate-heavy corpus.  A short list → HYBRID
    regime (nearly-distinct corpus): duplicated rows are isolated with
    two map-only literal-IN filters on ``xxhash64(content)`` — no
    content shuffle at all; only the duplicate mass is grouped, and
    globally-unique rows pass through as their own reps.  A colliding
    unrelated content pulled in by the filter is separated by the real
    content key inside the grouping — output identical in both regimes
    (see :func:`_dup_content_hashes`)."""
    if dup_hashes is None:
        groups = track_persist(
            df.groupBy(F.col(content).alias("__content")).agg(
                F.min(F.col(id_col)).alias("__rep"),
                F.collect_list(F.col(id_col)).alias("__ids"),
            )
        )
        reps = groups.select(
            F.col("__rep").alias(id_col), F.col("__content").alias(content)
        )
        mg = groups.filter(F.size("__ids") >= 2).select("__rep", "__ids")
        return reps, mg
    h = F.xxhash64(F.col(content))
    mg_all = track_persist(
        df.filter(h.isin(dup_hashes))
        .groupBy(F.col(content).alias("__content"))
        .agg(
            F.min(F.col(id_col)).alias("__rep"),
            F.collect_list(F.col(id_col)).alias("__ids"),
        )
    )
    reps = (
        df.filter(~h.isin(dup_hashes))
        .select(F.col(id_col), F.col(content))
        .unionByName(
            mg_all.select(
                F.col("__rep").alias(id_col), F.col("__content").alias(content)
            )
        )
    )
    mg = mg_all.filter(F.size("__ids") >= 2).select("__rep", "__ids")
    return reps, mg


def _spread(df: DataFrame) -> DataFrame:
    """Repartition ahead of heavy per-row compute.  The small test tables
    arrive as a single parquet row group = one task; at production scale the
    scan already has many splits and this is a near-no-op (narrow vs the
    work it precedes)."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism)


def _shingle_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    tokens_col: str | None = None,
) -> DataFrame:
    """(id, shingle) inverted index with per-doc set sizes — via an Arrow
    numpy/python kernel, NOT the ``shingles()`` HOF + explode: the
    interpreted zip_with chain measured 3.4 s ALONE at sf0.1 (the single
    largest cost in the jaccard family: jaccard_pairs, dedup_clusters,
    training_pipeline all sit on this index).  Set semantics preserved
    exactly: normalized whitespace tokens, k-gram join by single space,
    DISTINCT shingles per doc, set_size = distinct count, < k-token docs
    emit nothing — pytested equal to the HOF form.

    ``tokens_col``: pre-computed ``tokens(text)`` array column — a pipeline
    that tokenizes once (persisted frame) skips the per-stage Python regex
    pass; the JVM tokenizer is property-tested ≡ ``_py_tokens``, so the
    shingle sets are identical (a null text arrives as a null array)."""
    import pandas as pd

    in_col = tokens_col or text_col

    def kernel(batches):
        for pdf in batches:
            docs: list = []
            sizes: list = []
            shs: list = []
            for doc_id, cell in zip(pdf[id_col], pdf[in_col]):
                if tokens_col:
                    toks = None if cell is None else list(cell)
                else:
                    toks = _py_tokens(cell)
                if toks is None or len(toks) < k:
                    continue
                uniq = list(
                    dict.fromkeys(
                        " ".join(toks[i : i + k])
                        for i in range(len(toks) - k + 1)
                    )
                )
                n = len(uniq)
                docs.extend([doc_id] * n)
                sizes.extend([n] * n)
                shs.extend(uniq)
            yield pd.DataFrame(
                {"doc": docs, "set_size": sizes, "shingle": shs}
            )

    return (
        _spread(df)
        .select(F.col(id_col), F.col(in_col))
        .mapInPandas(
            kernel, _id_typed_schema(df, id_col, "doc", "set_size int, shingle string")
        )
    )


def _bucketed_pair_counts(
    idx: DataFrame, max_shingle_df: int, with_sizes: bool = False
):
    """Hot-shingle-capped candidate pair counts from a (doc, shingle)
    inverted index: (doc_a, doc_b, size_a, size_b, n_common) with
    doc_a < doc_b.  Shared by ``jaccard_pairs`` (scale path) and
    ``containment_pairs``.

    The bucket aggregation ITSELF is the hot-shingle stoplist — buckets
    larger than max_shingle_df are dropped before pair expansion, which
    bounds the O(df²) blowup per shingle.  Set sizes are then recomputed
    over the surviving index so the scores stay self-consistent (identical
    docs still score 1.0).  The buckets feed two subplans (sizes +
    candidates), so they are persisted — at 100 TB the same role is played
    by writing the bucketed index to parquet and reading it back for both
    passes.

    ``with_sizes=True`` additionally returns the (doc, set_size) frame of
    SURVIVING sizes as a second element — the r13 duplicate-mass
    decomposition needs it for the identical-content tail, and re-deriving
    it outside would duplicate the capped bucket pass."""
    buckets = track_persist(
        idx.groupBy("shingle")
        .agg(F.collect_list("doc").alias("docs"))
        .withColumn("df_", F.size("docs"))
        .filter(F.col("df_") <= max_shingle_df)
    )
    sizes = (
        buckets.select(F.explode("docs").alias("doc"))
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("set_size"))
    )
    cand = (
        buckets.filter(F.col("df_") >= 2)
        .select(F.explode("docs").alias("a"), "docs")
        .select("a", F.explode("docs").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .groupBy(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    pairs = cand.join(
        sizes.select(F.col("doc").alias("doc_a"), F.col("set_size").alias("size_a")),
        "doc_a",
    ).join(
        sizes.select(F.col("doc").alias("doc_b"), F.col("set_size").alias("size_b")),
        "doc_b",
    )
    return (pairs, sizes) if with_sizes else pairs


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.9,
    max_shingle_df: int = 1000,
    content_distinct: bool | None = None,
) -> DataFrame:
    """Sub/superset duplicate detection: pairs where the SMALLER document's
    shingle set is mostly contained in the larger's — containment
    C = |A∩B| / min(|A|, |B|) ≥ τ.  The asymmetric companion to Jaccard:
    a short doc fully embedded in a long one (quoted article, excerpt,
    scraped page inside an aggregator) scores C = 1.0 while its Jaccard is
    tiny — symmetric near-dup passes miss exactly these, which is why
    public pipelines (C4/RefinedWeb family) run a containment check
    alongside MinHash.

    No size-band prefilter — containment deliberately pairs very unequal
    sizes (the band bound only holds for Jaccard).  The hot-shingle cap is
    mandatory here (default 1000): without the band filter, boilerplate
    shingles are the only thing standing between this and an O(df²) pair
    blowup.  Same self-consistency contract as capped Jaccard: sizes are
    recomputed over the surviving index.

    EXACT-DUPLICATE MASS IS FACTORED OUT FIRST (r13, uniform across the
    pair-generator family): ids group by identical text, the index and
    pair counting run over one representative per distinct content, and
    copies re-enter at output expansion — m > max_shingle_df copies of
    one page used to push every one of its shingles over the cap, so the
    group silently emitted zero pairs; ``max_shingle_df`` now counts
    DISTINCT contents per shingle.  Sizes swap with the least/greatest id
    normalization so size_a stays doc_a's size.
    ``content_distinct`` follows the family contract (see
    :func:`jaccard_pairs`): ``None`` self-decides via the
    :func:`_dup_content_hashes` probe into the same three regimes
    (duplicate-free skip / nearly-distinct hybrid / full grouping);
    ``True`` asserts distinctness; ``False`` pins the full
    decomposition.

    Returns (doc_a, doc_b, size_a, size_b, n_common, containment),
    doc_a < doc_b; the contained side is the one with the smaller size."""
    dup_hashes = None
    if content_distinct is None:
        dup_hashes = _dup_content_hashes(df, text_col)
        content_distinct = dup_hashes == []
    if content_distinct:
        mg = None
        reps = df
    else:
        reps, mg = _content_groups(df, text_col, id_col, dup_hashes)
    idx = _shingle_index(reps, text_col, id_col, k)
    pairs, sizes = _bucketed_pair_counts(idx, max_shingle_df, with_sizes=True)
    cont = F.col("n_common") / F.least(F.col("size_a"), F.col("size_b"))
    rep_out = (
        pairs.withColumn("containment", F.round(cont, 4))
        .filter(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "size_a", "size_b", "n_common", "containment")
    )
    if content_distinct:
        # every group is a singleton: the cross expansion is the identity
        # (least/greatest and the size swap are no-ops on rep pairs, which
        # are already doc_a < doc_b) and the intra tail is empty
        return rep_out
    swap = F.col("__ia") > F.col("__ib")
    # LEFT joins against the MULTI-group frame only, coalesce-to-self for
    # singleton reps (their expansion is the identity): the join input
    # tracks duplicate mass, never corpus size (r14)
    cross = (
        rep_out.join(
            mg.select(
                F.col("__rep").alias("doc_a"), F.col("__ids").alias("__ids_a")
            ),
            "doc_a",
            "left",
        )
        .join(
            mg.select(
                F.col("__rep").alias("doc_b"), F.col("__ids").alias("__ids_b")
            ),
            "doc_b",
            "left",
        )
        .select(
            F.explode(F.coalesce("__ids_a", F.array("doc_a"))).alias("__ia"),
            F.coalesce("__ids_b", F.array("doc_b")).alias("__ids_b"),
            "size_a", "size_b", "n_common", "containment",
        )
        .select(
            "__ia", F.explode("__ids_b").alias("__ib"),
            "size_a", "size_b", "n_common", "containment",
        )
        .select(
            F.least("__ia", "__ib").alias("doc_a"),
            F.greatest("__ia", "__ib").alias("doc_b"),
            F.when(swap, F.col("size_b")).otherwise(F.col("size_a")).alias("size_a"),
            F.when(swap, F.col("size_a")).otherwise(F.col("size_b")).alias("size_b"),
            "n_common",
            "containment",
        )
        .filter(F.col("doc_a") != F.col("doc_b"))
    )
    intra = (
        mg.join(sizes.select(F.col("doc").alias("__rep"), "set_size"), "__rep")
        .filter(F.lit(1.0) >= F.lit(threshold))
        .select(F.explode("__ids").alias("doc_a"), "__ids", "set_size")
        .select("doc_a", F.explode("__ids").alias("doc_b"), "set_size")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.col("set_size").alias("size_a"),
            F.col("set_size").alias("size_b"),
            F.col("set_size").alias("n_common"),
            F.round(F.lit(1.0), 4).alias("containment"),
        )
    )
    return cross.unionByName(intra)


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.6,
    max_shingle_df: int | None = None,
    tokens_col: str | None = None,
    content_distinct: bool | None = None,
) -> DataFrame:
    """n-gram Jaccard near-dup pairs: J(A,B) = |A∩B| / (|A|+|B|-|A∩B|) ≥ τ.

    One explode + one bucket aggregation on shingle (map-side pair
    expansion) + one pair aggregation — the shingle/tokenize subplan is
    evaluated exactly once and there is no self-join.  In the default path
    the size-band prefilter (|A| ≥ τ|B|) drops dissimilar-size pairs before
    the aggregate.

    ``max_shingle_df`` is the scale knob (default off = exact Jaccard, the
    oracle-checked form): shingles shared by more than that many docs are
    dropped from BOTH the intersection and the set sizes — i.e. Jaccard is
    computed over the filtered shingle sets, which stays self-consistent
    (a pair of identical docs still scores 1.0) while capping the O(df²)
    candidate blowup that boilerplate shingles cause at 100 TB.

    .. warning:: the default (exact) path has NO hot-shingle guard: a
       shingle shared by d docs builds a d-element bucket array and expands
       d²/2 pairs inside one task — a boilerplate shingle at corpus scale
       is an executor-OOM/skew hazard by construction, because exact
       Jaccard genuinely requires those pairs.  At 100 TB always pass
       ``max_shingle_df`` (the capped form is what the scale bench runs);
       the default exists for oracle-exact verification at test SF.

    EXACT-DUPLICATE MASS IS FACTORED OUT FIRST (r13, uniform across the
    pair-generator family — minhash/simhash/SRP/this): ids group by
    identical content (the token array when ``tokens_col`` is given, else
    the text), the shingle index and all candidate work run over ONE
    representative per distinct content, and copies re-enter at output
    expansion (identical content ⇒ identical filtered shingle set ⇒
    jaccard 1.0 in-group; rep-pair scores carry verbatim).  The old
    row-level form had two duplicate-mass failure shapes: in the exact
    path every shingle of an m-copy content made an ≥m-element bucket
    (the warned O(df²) blowup, with the duplicate factor squared into
    it); in the capped path m > max_shingle_df pushed EVERY shingle of
    the group over the cap, so the filtered sets went empty and the
    group silently emitted zero pairs — identical docs no longer scored
    1.0, they scored nothing.  ``max_shingle_df`` now counts DISTINCT
    contents per shingle — boilerplate means many different pages
    sharing a shingle, not many copies of one page.  MEMORY UNIT: the
    per-distinct-content id-list row (see hamming_near_pairs).

    ``content_distinct=True`` asserts the caller already factored
    duplicate mass — one row per distinct content (e.g. a pipeline that
    ran ``exact_dedup`` immediately upstream, like training_pipeline) —
    and skips the grouping/expansion entirely: on an already-distinct
    corpus the decomposition is the identity, and the extra groupBy +
    expansion stages are pure fixed cost.  With duplicate rows present
    it silently reverts to the OLD duplicate-squaring behavior — only
    set it when distinctness is structurally guaranteed.
    ``content_distinct=None`` (the default, r14) SELF-DECIDES with the
    one-action :func:`_dup_content_hashes` probe into THREE regimes —
    duplicate-free: skip group+expand outright (they are the identity;
    the r13 form paid them as pure fixed cost, the r13 bench
    regression); nearly-distinct (≤ :data:`_HYBRID_DUP_CAP` duplicated
    contents — also a real corpus shape, e.g. a pre-deduped refresh):
    group ONLY the duplicated rows via literal-IN filters on the content
    hash, so no full-content shuffle happens and the expansion joins
    carry only the duplicate mass; duplicate-heavy: the full r13
    grouping, where the content shuffle is the useful work.  The probe
    is one eager 8-byte-per-row aggregation; output is identical in all
    three regimes.  Pass an explicit bool to pin the plan (``False`` =
    full grouping, ``True`` = asserted-distinct skip).

    Cache lifetime: the scale path persists the bucketed index (it feeds
    two subplans) and cannot unpersist it before the caller's action runs;
    long-lived sessions issuing many one-shot calls should
    ``spark.catalog.clearCache()`` between them (bench.py does), or write
    the index to storage and read it back — the 100 TB form.
    """
    content = tokens_col or text_col
    dup_hashes = None
    if content_distinct is None:
        dup_hashes = _dup_content_hashes(df, content)
        content_distinct = dup_hashes == []
    if content_distinct:
        mg = None
        reps = df
    else:
        reps, mg = _content_groups(df, content, id_col, dup_hashes)
    idx = _shingle_index(reps, text_col, id_col, k, tokens_col=tokens_col)
    if max_shingle_df is None:
        # Bucketed candidate generation (the same one-shuffle trick as
        # banded_candidate_pairs): group the index by shingle, expand
        # within-bucket pairs map-side, aggregate per pair.  The shingle
        # subplan is evaluated ONCE — a self-join would scan it twice.
        buckets = (
            idx.groupBy("shingle")
            .agg(F.collect_list(F.struct("doc", "set_size")).alias("items"))
            .filter(F.size("items") >= 2)
        )
        pairs = (
            buckets.select(F.explode("items").alias("a"), "items")
            .select("a", F.explode("items").alias("b"))
            .filter(
                (F.col("a.doc") < F.col("b.doc"))
                # size-band prefilter: J ≥ τ ⇒ min/max set size ratio ≥ τ
                & (F.col("a.set_size") >= F.col("b.set_size") * threshold)
                & (F.col("b.set_size") >= F.col("a.set_size") * threshold)
            )
            .groupBy(
                F.col("a.doc").alias("doc_a"),
                F.col("b.doc").alias("doc_b"),
                F.col("a.set_size").alias("size_a"),
                F.col("b.set_size").alias("size_b"),
            )
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
        sizes = idx.select("doc", "set_size").distinct()
    else:
        pairs, sizes = _bucketed_pair_counts(idx, max_shingle_df, with_sizes=True)
    jac = F.col("n_common") / (F.col("size_a") + F.col("size_b") - F.col("n_common"))
    rep_out = (
        pairs.withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )
    if content_distinct:
        return rep_out
    # expand rep pairs back through both id lists (scores carry verbatim —
    # jaccard/n_common are symmetric, so least/greatest needs no swap).
    # LEFT joins against the MULTI-group frame only, with coalesce-to-self
    # for singleton reps (their expansion is the identity): the join input
    # tracks duplicate mass, never corpus size (r14)
    cross = (
        rep_out.join(
            mg.select(
                F.col("__rep").alias("doc_a"), F.col("__ids").alias("__ids_a")
            ),
            "doc_a",
            "left",
        )
        .join(
            mg.select(
                F.col("__rep").alias("doc_b"), F.col("__ids").alias("__ids_b")
            ),
            "doc_b",
            "left",
        )
        .select(
            F.explode(F.coalesce("__ids_a", F.array("doc_a"))).alias("__ia"),
            F.coalesce("__ids_b", F.array("doc_b")).alias("__ids_b"),
            "n_common",
            "jaccard",
        )
        .select("__ia", F.explode("__ids_b").alias("__ib"), "n_common", "jaccard")
        .select(
            F.least("__ia", "__ib").alias("doc_a"),
            F.greatest("__ia", "__ib").alias("doc_b"),
            "n_common",
            "jaccard",
        )
        .filter(F.col("doc_a") != F.col("doc_b"))
    )
    # identical-content pairs: jaccard 1.0 over the SURVIVING shingle set
    # (the inner join drops reps whose every shingle fell to the cap or
    # who have < k tokens — exactly the old path's no-row outcome)
    intra = (
        mg.join(
            sizes.select(F.col("doc").alias("__rep"), "set_size"), "__rep"
        )
        .filter(F.lit(1.0) >= F.lit(threshold))
        .select(F.explode("__ids").alias("doc_a"), "__ids", "set_size")
        .select("doc_a", F.explode("__ids").alias("doc_b"), "set_size")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.col("set_size").cast("long").alias("n_common"),
            F.round(F.lit(1.0), 4).alias("jaccard"),
        )
    )
    return cross.unionByName(intra)


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    tokens_col: str | None = None,
) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing ANY ``k``-token
    shingle with the eval/benchmark set (the standard n-gram-overlap
    contamination test run before every serious pretraining job).

    Asymmetric by design — the eval side is small (benchmarks are), so its
    distinct shingle set broadcasts and the train side is probed with a
    broadcast LEFT SEMI join: one pass over the train corpus, no shuffle
    of train data at all.  Returns (id, contaminated) for every train doc.
    """
    ev_sh = (
        eval_df.select(F.explode(shingles(F.col(text_col), k)).alias("shingle"))
        .distinct()
    )
    # train side through the Arrow shingle-index kernel (distinct per doc,
    # identical set semantics — see _shingle_index): the train corpus is
    # the big side, and the interpreted HOF chain was its dominant cost
    tr_sh = _shingle_index(train, text_col, id_col, k, tokens_col=tokens_col).select(
        F.col("doc").alias("doc_id"), "shingle"
    )
    hits = (
        tr_sh.join(F.broadcast(ev_sh), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("__hit", F.lit(True))
    )
    return (
        train.select(F.col(id_col).alias("doc_id"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id", F.coalesce(F.col("__hit"), F.lit(False)).alias("contaminated")
        )
    )


def _bloom_probes(shingle, n_bits: int, n_hashes: int):
    """The k probe positions of a shingle: ``xxhash64(i, shingle) mod
    n_bits`` for i in 0..k−1 — the standard k-independent-hash bloom
    construction, with the hash-family index as a leading xxhash64
    input (seeding by prefix).  Returns (word_index, bit_mask) column
    pairs against a LongType-word bitmap."""
    out = []
    for i in range(n_hashes):
        pos = F.pmod(F.xxhash64(F.lit(i), shingle), F.lit(n_bits))
        out.append(
            (
                F.floor(pos / F.lit(64)).cast("int"),
                # the SQL shiftleft via call_function — the Python-API
                # F.shiftleft requires numBits to be a literal int, but
                # the shift here is data-dependent (pos % 64)
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
                ),
            )
        )
    return out


def bloom_size_bits(
    n_items: int, n_hashes: int = 5, target_fp: float = 0.01
) -> int:
    """Bits needed for a ``n_hashes``-hash bloom over ``n_items`` keys to
    hit ``target_fp``, rounded up to a power of two (whole 64-bit words,
    and pmod over a power of two keeps probe positions well-mixed).
    Classic fill-rate algebra with k FIXED: FP = (1 − e^{−kn/m})^k ≤ p
    ⇔ m ≥ k·n / −ln(1 − p^{1/k}).  At the defaults that is ≈ 9.9 bits
    per eval shingle — a 10⁶-shingle eval side sizes to 2^24 bits
    (2 MiB broadcast), still constant per-executor cost where the exact
    dictionary would broadcast the full multi-GB shingle set."""
    import math

    if n_items <= 0:
        return 64
    m = n_hashes * n_items / -math.log(1.0 - target_fp ** (1.0 / n_hashes))
    return max(64, 1 << math.ceil(math.log2(m)))


def bloom_build(
    keys: DataFrame, key_col: str = "shingle", n_bits: int = 1 << 18, n_hashes: int = 5
) -> list[int]:
    """Densified bloom bitmap (``n_bits/64`` longs) over the DISTINCT
    values of ``keys[key_col]``.  Per-key probe words aggregate via
    ``bit_or`` into ≤ ``n_bits/64`` (word, bits) rows — a
    partial-aggregatable shuffle of bitmap-sized data — then one BOUNDED
    driver collect densifies the bitmap (≤ 32 KiB at the default 2^18
    bits, independent of key volume)."""
    probes = _bloom_probes(F.col(key_col), n_bits, n_hashes)
    words = (
        keys.select(
            F.explode(
                F.array(*[F.struct(w.alias("w"), m.alias("m")) for w, m in probes])
            ).alias("p")
        )
        .groupBy(F.col("p.w").alias("w"))
        .agg(F.bit_or("p.m").alias("bits"))
    )
    bitmap = [0] * (n_bits // 64)
    for r in words.collect():  # bounded: ≤ n_bits/64 rows by construction
        bitmap[r.w] = r.bits
    return bitmap


def bloom_maybe_contains(
    key: Column, bitmap: list[int], n_bits: int, n_hashes: int = 5
) -> Column:
    """Boolean column: all ``n_hashes`` probe bits of ``key`` are set in
    ``bitmap`` — true for every member (no false negatives) and for an
    ε of non-members (the bloom FP rate).  The bitmap rides along as one
    array literal; the probe is MAP-ONLY.

    OPT-IN slow path, kept for zero-Python-dependency probing and as
    the independent reference the Arrow path is pytested against.  Two
    measured costs make it lose to :func:`bloom_prune`'s broadcast+
    Arrow probe at every size: Catalyst re-hashes array literals during
    analysis (a 2^24-bit bitmap costs minutes of PLANNING), and the
    higher-order ``forall`` probe is interpreted per row (2.7 s vs
    0.75 s at sf0.1 with the 32 KiB default).  Use :func:`bloom_prune`.

    The probe is a higher-order ``forall`` over the position array so
    the bitmap literal occurs EXACTLY ONCE in the expression tree — the
    unrolled ``element_at(bm, ...) & mask`` conjunction embedded it
    2×n_hashes times, which multiplied the analyzer's literal-hashing
    cost by 10 at the default settings."""
    bm = F.lit(bitmap)
    pos = F.array(
        *[
            F.pmod(F.xxhash64(F.lit(i), key), F.lit(n_bits))
            for i in range(n_hashes)
        ]
    )
    one = F.lit(1).cast("long")
    zero = F.lit(0).cast("long")
    return F.forall(
        pos,
        lambda p: F.element_at(bm, F.floor(p / F.lit(64)).cast("int") + F.lit(1))
        .bitwiseAND(F.call_function("shiftleft", one, (p % 64).cast("int")))
        != zero,
    )


#: bitmaps at most this size may probe via the Catalyst-literal path;
#: 0 = always broadcast+Arrow.  Measured at sf0.1 (248k probe keys,
#: 2^18-bit bitmap): literal+forall 2.7 s vs broadcast+Arrow 0.75 s —
#: the interpreted higher-order probe loses to the vectorized numpy
#: probe even at the smallest useful bitmap, so the literal path is
#: opt-in only (call bloom_maybe_contains directly).
_BLOOM_LITERAL_MAX_BITS = 0


def bloom_prune(
    df: DataFrame,
    key_col: str,
    bitmap: list[int],
    n_bits: int,
    n_hashes: int = 5,
) -> DataFrame:
    """Rows of ``df`` whose ``key_col`` MAY be in the bloom (all members
    survive — no false negatives — plus ε false positives).  Map-only:
    the bitmap broadcasts ONCE per executor (``sc.broadcast`` of a
    numpy uint64 array) and an Arrow-batched pandas UDF checks all
    ``n_hashes`` bits vectorized per batch.  Probe POSITIONS are
    computed JVM-side with the same ``xxhash64(i, key)`` family as
    :func:`bloom_build`, so build and probe can never drift.  Scales to
    any bitmap size (10⁶ shingles ⇒ 2^24 bits = 2 MiB — fine as a
    broadcast, fatal as a plan literal), and is ALSO the fast path at
    the 32 KiB default (see _BLOOM_LITERAL_MAX_BITS)."""
    if n_bits <= _BLOOM_LITERAL_MAX_BITS:
        return df.filter(
            bloom_maybe_contains(F.col(key_col), bitmap, n_bits, n_hashes)
        )

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from stateful_spark_streaming_spark.caching import track_broadcast

    # tracked like operator persists: the lazy plan pins the broadcast,
    # so a long-lived caller drains it via release_operator_broadcasts()
    # after materializing (repeated decontamination passes otherwise
    # accumulate dead MiB-scale broadcasts on every executor)
    words_b = track_broadcast(
        df.sparkSession.sparkContext.broadcast(
            np.array(bitmap, dtype=np.int64).view(np.uint64)
        )
    )

    def _probe_fn(pos):
        w = words_b.value
        if not len(pos):
            return pd.Series([], dtype=bool)
        # each element is the row's n_hashes probe positions (Arrow list →
        # np.ndarray); one (batch × n_hashes) int matrix, probed in 3
        # vectorized ops
        arr = np.array(pos.tolist(), dtype=np.int64).view(np.uint64)
        hits = ((w[arr >> np.uint64(6)] >> (arr & np.uint64(63))) & np.uint64(1)).astype(bool)
        return pd.Series(hits.all(axis=1))

    # real annotation objects (not strings): this module's
    # `from __future__ import annotations` + function-local pandas import
    # would leave inline hints unresolvable for pandas_udf's inference
    _probe_fn.__annotations__ = {"pos": pd.Series, "return": pd.Series}
    # asNondeterministic stops the optimizer COPYING the probe across an
    # equi-join on key_col (InferFiltersFromJoin): decontaminate_bloom's
    # verify semi-join otherwise gains an inferred Python probe pass over
    # the EVAL side — the side the bitmap was built FROM, where every row
    # passes by construction (pure cost, zero selectivity).  The probe is
    # genuinely deterministic; the marker only pins it where it is
    # written, which is already its only useful position (directly above
    # the opaque shingle kernel — nothing can push below that anyway).
    _probe = pandas_udf(_probe_fn, "boolean").asNondeterministic()

    pos_col = F.array(
        *[
            F.pmod(F.xxhash64(F.lit(i), F.col(key_col)), F.lit(n_bits))
            for i in range(n_hashes)
        ]
    )
    return df.filter(_probe(pos_col))


def decontaminate_bloom(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    n_bits: int = 1 << 18,
    n_hashes: int = 5,
    tokens_col: str | None = None,
) -> DataFrame:
    """``decontaminate`` with a BOUNDED broadcast: the exact operator
    ships the eval set's full distinct-shingle dictionary to every
    executor, which is fine for benchmark-sized eval sets but not for
    decontaminating against another large corpus (held-out shards,
    prior training runs).  This variant compresses the eval shingles
    into an ``n_bits`` Bloom bitmap — fixed size no matter how large
    the eval side grows — probes every train shingle against it
    MAP-ONLY (the bitmap rides along as one array literal; no join, no
    shuffle of train data), and then runs the exact semi-join ONLY for
    the bloom-positive survivors.  Blooms have no false negatives, so
    the verify join sees every true hit; its false positives are
    discarded by that join — the returned frame is therefore EXACTLY
    ``decontaminate``'s output (same oracle), the bloom only prunes.

    Build side: per-shingle probe words aggregate via ``bit_or`` into
    ≤ ``n_bits/64`` (word, bits) rows — a partial-aggregatable shuffle
    of bitmap-sized data — then one BOUNDED driver collect (≤ 32 KiB at
    the default 2^18 bits, independent of data volume) densifies the
    bitmap for the literal.  This is the same build/broadcast shape
    Spark's own runtime bloom-join pruning uses.
    """
    ev_sh = (
        eval_df.select(F.explode(shingles(F.col(text_col), k)).alias("shingle"))
        .distinct()
    )
    bitmap = bloom_build(ev_sh, "shingle", n_bits, n_hashes)

    tr_sh = _shingle_index(train, text_col, id_col, k, tokens_col=tokens_col).select(
        F.col("doc").alias("doc_id"), "shingle"
    )
    hits = (
        # map-only probe; survivors ≈ true hits + FP ε.  The exact verify
        # is deliberately NOT a broadcast join — never shipping the full
        # eval dictionary is the point of this variant — it's a shuffle
        # semi-join whose train side the bloom already pruned to ε (AQE
        # is free to downgrade it to a broadcast at test scale, where the
        # eval side happens to be tiny anyway).
        bloom_prune(tr_sh, "shingle", bitmap, n_bits, n_hashes)
        .join(ev_sh, "shingle", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("__hit", F.lit(True))
    )
    return (
        train.select(F.col(id_col).alias("doc_id"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id", F.coalesce(F.col("__hit"), F.lit(False)).alias("contaminated")
        )
    )


def ngram_overlap_score(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    tokens_col: str | None = None,
) -> DataFrame:
    """Graded contamination: for each EVAL doc, the fraction (in basis
    points) of its distinct ``k``-token shingles that occur anywhere in
    the training corpus — the scoring form of ``decontaminate``.  A
    boolean flag treats one shared shingle and total containment the
    same; eval-suite audits want the spectrum (e.g. "drop eval items
    with > 50 % train overlap", the GPT-3-style graded check).

    Scale shape mirrors ``decontaminate`` with the probe inverted: the
    eval side is small, so its distinct shingle dictionary broadcasts;
    the 100 TB train side is probed MAP-ONLY (broadcast left-semi) and
    only the surviving shingles — at most ``|eval dictionary|`` of them
    — are distinct-aggregated.  The train corpus itself never shuffles.
    Per-doc totals come free from ``_shingle_index``'s ``set_size``.
    Eval docs with fewer than ``k`` tokens have no shingles and emit
    nothing (same contract as the rest of the shingle family).

    Returns (doc_id, n_shingles, n_hit, overlap_bp) — all-integer so the
    DuckDB oracle is exact: ``overlap_bp = 10000 * n_hit div n_shingles``.

    The eval shingle index feeds BOTH the broadcast dictionary and the
    final scoring join; without a pin the eval-side Arrow kernel runs
    twice (one logical node, two physical expansions — visible as two
    MapInPandas nodes sharing a result id).  It is persisted because the
    cache is bounded by the SAME assumption that lets ``ev_dict``
    broadcast: the eval side is the small side.  Usual lifetime contract
    (clearCache between queries / release_operator_caches).
    """
    ev = track_persist(_shingle_index(eval_df, text_col, id_col, k))
    ev_dict = ev.select("shingle").distinct()
    tr_hit = (
        _shingle_index(train, text_col, id_col, k, tokens_col=tokens_col)
        .join(F.broadcast(ev_dict), "shingle", "left_semi")
        .select("shingle")
        .distinct()
        .withColumn("__hit", F.lit(1).cast("long"))
    )
    return (
        ev.join(F.broadcast(tr_hit), "shingle", "left")
        .groupBy(F.col("doc").alias("doc_id"))
        .agg(
            F.max("set_size").alias("n_shingles"),
            F.coalesce(F.sum("__hit"), F.lit(0).cast("long")).alias("n_hit"),
        )
        .withColumn(
            "overlap_bp",
            F.expr("(10000 * n_hit) div n_shingles").cast("int"),
        )
    )


def _gram_positions(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    tokens_col: str | None = None,
) -> DataFrame:
    """(doc, pos, gram) — every k-gram occurrence with its 0-based token
    position (the MULTISET-with-positions sibling of ``_shingle_index``).
    Same Arrow-kernel rationale: the interpreted ``zip_with`` chain +
    posexplode re-evaluates the tokenizer per element; one python/numpy
    pass per batch is ~3× cheaper and tokenizes once per row.  Docs with
    fewer than ``k`` tokens (or null text) emit nothing (no k-gram
    exists).

    ``tokens_col``: pre-computed ``tokens(text)`` array column — same
    contract as ``_shingle_index``: the JVM tokenizer is property-tested
    ≡ ``_py_tokens``, so the gram index is identical (null text arrives
    as a null array)."""
    import pandas as pd

    in_col = tokens_col or text_col

    def kernel(batches):
        for pdf in batches:
            docs: list = []
            poss: list = []
            grams: list = []
            for doc_id, cell in zip(pdf[id_col], pdf[in_col]):
                if tokens_col:
                    toks = None if cell is None else list(cell)
                else:
                    toks = _py_tokens(cell)
                if toks is None:
                    continue
                n = len(toks) - k + 1
                if n <= 0:
                    continue
                docs.extend([doc_id] * n)
                poss.extend(range(n))
                grams.extend(" ".join(toks[i : i + k]) for i in range(n))
            yield pd.DataFrame({"doc": docs, "pos": poss, "gram": grams})

    return (
        _spread(df)
        .select(F.col(id_col), F.col(in_col))
        .mapInPandas(
            kernel, _id_typed_schema(df, id_col, "doc", "pos int, gram string")
        )
    )


def dup_ngram_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_docs: int = 2,
    tokens_col: str | None = None,
) -> DataFrame:
    """Span-level duplicate detection: maximal token ranges covered by
    ``k``-grams that also occur in at least ``min_docs - 1`` OTHER
    documents — the token-granular approximation of exact-substring
    training-data dedup (public recipe: Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", which uses suffix arrays;
    k-gram position merging is the standard distributed re-expression).
    Doc-level near-dup (MinHash et al.) misses exactly these: boilerplate
    headers, license blocks, quoted passages inside otherwise-unique docs.

    Returns (doc_id, span_start, span_end, span_len, n_dup_grams) with
    positions in 0-based token indices; adjacent/overlapping duplicated
    grams merge into one maximal span via the gaps-and-islands window
    (pos - row_number is constant within a run of consecutive positions).

    Scale shape: gram occurrences are linear in corpus token count — no
    pair enumeration anywhere, so unlike pair mining this needs no hot-
    bucket cap (a gram in a million docs contributes a million SPAN rows,
    not a million² pair rows).  Gram identity is carried as ``xxhash64``
    (span math needs equality only; 8-byte longs shuffle ~5× lighter than
    5-word strings, and a 64-bit collision merging two unrelated spans has
    odds ~n²/2⁶⁵ — same tradeoff Lee et al. make), and the cross-doc
    document count is partial-aggregatable groupBys + a semi-join (see
    ``dup_spans_from_index``) so no single task ever owns a hot gram."""
    g = _gram_positions(df, text_col, id_col, k, tokens_col=tokens_col).select(
        "doc", "pos", F.xxhash64("gram").alias("gh")
    )
    return dup_spans_from_index(g, "gh", k, min_docs, persist_index=True)


def dup_spans_from_index(
    g: DataFrame,
    gram_col: str,
    k: int,
    min_docs: int,
    persist_index: bool = False,
) -> DataFrame:
    """Shared span-derivation tail over a (doc, pos, <gram identity>) index
    — ONE definition of the cross-doc filter + gaps-and-islands merge for
    batch ``dup_ngram_spans`` and the streaming ingest twin (which stores
    gram HASHES in its staged index), so the two cannot desynchronize from
    their shared oracle.

    The cross-doc count is deliberately NOT a window over the gram key:
    window partitions are exempt from AQE skew mitigation, so a boilerplate
    gram present in millions of docs (license header, common sentence)
    would land its whole partition on ONE task at 100 TB (VERDICT r5
    "what's wrong" #1).  Instead: distinct (gram, doc) → count per gram —
    both partial-aggregatable, so map-side combine absorbs the hot key —
    then a LEFT SEMI join of the index against the qualifying grams, which
    IS covered by AQE skew-join splitting (and broadcasts outright when
    the qualifying-gram set is small).  Same rows, no skewed window.

    ``persist_index=True`` caches the index frame because the semi-join
    evaluates it on both sides — for the batch caller that would re-run
    the tokenizing Arrow kernel (measured: persist of the compact
    (doc, pos, int, long) frame wins, unlike full token-array persists);
    the streaming twin reads its index from staged parquet, where a second
    scan of compact files is cheaper than pinning cache.  Cache lifetime:
    one-shot callers ``clearCache()`` between queries (bench.py does);
    long-lived sessions call ``caching.release_operator_caches()`` after
    materializing each result — every pin here is registered there
    (ADVICE r6: un-released MEMORY_AND_DISK grows with repeated calls)."""
    if persist_index:
        from stateful_spark_streaming_spark.caching import track_persist

        g = track_persist(g)
    qual = (
        g.select(gram_col, "doc")
        .distinct()
        .groupBy(gram_col)
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select(gram_col)
    )
    hit = g.join(qual, gram_col, "left_semi").select("doc", "pos")
    w = Window.partitionBy("doc").orderBy("pos")
    isl = hit.withColumn("grp", F.col("pos") - F.row_number().over(w))
    return (
        isl.groupBy(F.col("doc").alias("doc_id"), "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).alias("span_end"),
            (F.max("pos") - F.min("pos") + F.lit(k)).alias("span_len"),
            F.count("*").alias("n_dup_grams"),
        )
        .drop("grp")
    )


def remove_dup_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_docs: int = 2,
    tokens_col: str | None = None,
    persist_tokens: bool = False,
) -> DataFrame:
    """The ACTION for span-level dedup: cut every maximal duplicated span
    (from ``dup_ngram_spans``) out of every document EXCEPT the first
    occurrence of its exact text — Lee et al.'s remove-all-but-one, at
    token granularity.  "First" is deterministic — the minimum
    (doc_id, span_start) struct over the span's covered text (struct
    ordering is field-lexicographic, identical to ORDER BY doc_id,
    span_start); spans whose covered text differs (partial overlaps with
    different extents) are separate groups and each keeps its own first
    occurrence.

    Returns (doc_id, clean_text, n_removed) for EVERY input document
    (untouched docs ride through with n_removed = 0).

    Scale shape: all stages are linear in corpus tokens — the span list
    (no pair enumeration, see dup_ngram_spans), position explosion
    bounded by removed-span length, and a per-row array reassembly
    against a dup-mass-sized per-doc cut-position array (the corpus
    token arrays are never exploded or shuffled; see the inline guide-§8
    note).  No stage is quadratic in anything.  The
    first-occurrence pick is deliberately NOT a window over ``span_text``
    (window partitions are exempt from AQE skew splitting — a corpus-wide
    boilerplate block would make one hot task; VERDICT r5): it is a
    partial-aggregatable ``min(struct)`` per span_text plus an equi-join
    back, which AQE skew-handles.

    Tokenize-once: the token arrays for span-text slicing and for the
    positional re-assembly derive from ONE ``__toks`` frame (the gram
    kernel still tokenizes in-kernel — Arrow-transferring token arrays
    into it measured ~12 % slower than re-tokenizing).  ``tokens_col``
    passes a pre-computed ``tokens(text)`` array through the whole chain;
    ``persist_tokens=True`` pins the ``__toks`` frame so the two readers
    share one physical tokenizer pass — measured at sf0.1 (ROUND6.md):
    the default recompute wins on this box (full-array persists pay more
    in block-manager serialization than the regex pass costs), the knob
    exists for the 100 TB case where a scan is the expensive part."""
    from stateful_spark_streaming_spark.operators.text import tokens

    spans = dup_ngram_spans(df, text_col, id_col, k, min_docs, tokens_col=tokens_col)
    tok_expr = F.col(tokens_col) if tokens_col else tokens(F.col(text_col))
    toks = df.select(F.col(id_col).alias("doc_id"), tok_expr.alias("__toks"))
    if persist_tokens:
        toks = track_persist(toks)
    # spans-cardinality frame (one row per duplicated span — proportional
    # to DUP content, not the corpus): persisted because it is consumed
    # twice (the min-struct aggregate and the join-back) — without the
    # cache the whole span tail re-evaluates.  The downstream cut-position
    # frame is consumed exactly once (the single reassembly join), so it
    # carries no pin.  Same lifetime contract as the gram index:
    # clearCache between queries, or caching.release_operator_caches() in
    # a long-lived session.
    sptext = (
        spans.join(toks, "doc_id")
        .withColumn(
            "span_text",
            F.array_join(
                F.slice(
                    F.col("__toks"), F.col("span_start") + 1, F.col("span_len")
                ),
                " ",
            ),
        )
        .drop("__toks")
    )
    sptext = track_persist(sptext)
    first = sptext.groupBy("span_text").agg(
        F.min(F.struct("doc_id", "span_start")).alias("__keep")
    )
    # Cut DECISIONS are dup-mass-sized; corpus tokens must not shuffle to
    # apply them (guide-§8 shape: decide with small rows, move big rows
    # once — here the big rows move ZERO times).  The former tail exploded
    # every corpus token and shuffled the explosion TWICE (anti join on
    # (doc_id, pos), then groupBy(doc_id) + collect_list re-assembly);
    # instead the distinct cut positions aggregate to ONE array per
    # affected doc (collect_set: partial-aggregatable ObjectHashAggregate,
    # bounded per group by that doc's token count) and the re-assembly is
    # per-row JVM array math on the un-exploded token array: array_except
    # (hash-set membership, left-operand order preserved, O(n+m)) keeps
    # the surviving positions, element lookup rebuilds the text.  The only
    # corpus-sized join input is `toks` against the dup-mass-sized
    # `cut_arr` — broadcast when small, one array-row shuffle at worst,
    # versus two exploded-token shuffles before.
    cut_arr = (
        sptext.join(first, "span_text")
        .filter(
            (F.col("doc_id") != F.col("__keep.doc_id"))
            | (F.col("span_start") != F.col("__keep.span_start"))
        )
        .select(
            "doc_id",
            F.explode(F.sequence("span_start", "span_end")).alias("pos"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("pos").alias("__cut"))
    )
    # a doc with a non-null __cut has >= 1 gram, hence size(__toks) >= k
    # >= 1 — the sequence below never sees an empty array (whose
    # sequence(0, -1) would be [0, -1], not [])
    kept_pos = F.array_except(
        F.sequence(F.lit(0), F.size("__toks") - F.lit(1)), F.col("__cut")
    )
    rebuilt = F.array_join(
        F.transform(kept_pos, lambda p: F.get(F.col("__toks"), p)), " "
    )
    return toks.join(cut_arr, "doc_id", "left").select(
        "doc_id",
        F.when(F.col("__toks").isNull(), F.lit(""))
        .when(F.col("__cut").isNull(), F.array_join("__toks", " "))
        .otherwise(rebuilt)
        .alias("clean_text"),
        # every cut position IS a valid token position of its doc, so
        # n_removed is just the cut-set size
        F.coalesce(F.size("__cut"), F.lit(0)).cast("int").alias("n_removed"),
    )


def md5_h60(col, seed: int | str | None = None):
    """60-bit hash as a FIXED-WIDTH hex string: first 15 hex chars of
    md5((seed ':')? || col).  Fixed width makes lexicographic order equal
    numeric order (so ``min()`` over it is a valid MinHash), 15 chars keeps
    the numeric form under 2^63 for engines that convert, and — the point —
    DuckDB reproduces it verbatim (``substring(md5(...), 1, 15)``), which
    xxhash64 never could.  Used by SimHash token hashes (MinHash derives
    its families from the same md5 via double hashing — see
    ``minhash_signatures``) so both catalog queries carry exact oracles."""
    base = col if seed is None else F.concat(F.lit(f"{seed}:"), col)
    return F.substring(F.md5(base), 1, 15)


def banded_candidate_pairs(
    items: DataFrame,
    id_field: str = "id",
    max_bucket_size: int | None = 2000,
    distinct: bool = True,
) -> DataFrame:
    """One-shuffle LSH candidate generation, shared by MinHash / SimHash /
    random-hyperplane LSH.

    Input: rows of (band_id, band_hash, item) where ``item`` is a struct
    containing ``id_field`` (plus whatever payload verification needs).
    Output: (a, b) item-struct pairs for every two items sharing a
    (band_id, band_hash) bucket, deduped across bands.

    vs the naive union-of-per-band self-joins: the signature subplan is
    evaluated ONCE (it feeds a single aggregation), there is exactly one
    shuffle (on the bucket key), and the within-bucket pair expansion is
    map-side after the aggregate.

    ``max_bucket_size`` is the hot-bucket guard (the LSH mirror of
    ``jaccard_pairs``'s ``max_shingle_df``): a degenerate (band_id,
    band_hash) value shared by m items would otherwise collect_list an
    m-element array into ONE row and expand m²/2 pairs inside ONE task —
    at corpus scale that bucket is boilerplate hashing together, and it is
    an executor-OOM by construction.  Over-cap buckets are removed BEFORE
    the collect_list, not after: a post-collect size filter still
    materializes the m-element array in one aggregation buffer just to
    drop it, which is the same OOM wearing a different stack trace.  The
    pre-filter is a map-side-combined count + broadcast ANTI-join on the
    hot keys — the hot set is provably ≤ rows/cap keys, so the broadcast
    is always summary-sized.  What gets persisted for the count depends
    on the payload: small-payload mode caches ``items`` whole (signature
    subplan evaluates once); heavy-payload mode (``distinct=False``)
    caches only the projected band columns so the cache never pins
    n_bands copies of the payload — see the inline note.
    ``lsh_bucket_stats`` reports the skew when tuning the cap.  Pass
    ``None`` to disable (exact candidate enumeration).

    ``distinct=False`` skips the cross-band pair dedup.  Use it when the
    item struct carries a LARGE payload (e.g. the embedding vector for
    in-bucket verification, ``cosine_near_pairs_lsh``): dropDuplicates
    shuffles whole (a, b) struct pairs, so with vector payload the dedup
    exchange alone would move pairs × 2 × dim floats — the very join-back
    volume the payload was meant to avoid.  The caller then dedups AFTER
    reducing each pair to scalars (ids + verified score); a pair
    colliding in k bands is verified k times, but k ≤ n_tables and the
    duplicated work is a bounded constant, not a shuffle."""
    src = items
    if max_bucket_size is not None:
        from stateful_spark_streaming_spark.caching import track_persist

        if distinct:
            # small-payload mode: cache the whole frame so the signature
            # subplan feeds both the hot-bucket count and the bucketing
            src = track_persist(items)
            count_src = src
        else:
            # heavy-payload mode (the distinct=False contract above):
            # caching items here would pin n_bands copies of the carried
            # payload (≈8 GB at 2 M vectors × 8 tables × 64 dims —
            # ADVICE r11) solely so a two-long count reuses the
            # signature subplan.  Persist only the projected band
            # columns (~16 B/row) for the count and leave the payload
            # frame un-cached: the signature evaluates once more on the
            # main path, but that is a map-side kernel with no shuffle —
            # the right trade at any corpus size.
            count_src = track_persist(items.select("band_id", "band_hash"))
        hot = (
            count_src.groupBy("band_id", "band_hash")
            .agg(F.count(F.lit(1)).alias("sz"))
            .filter(F.col("sz") > max_bucket_size)
            .select("band_id", "band_hash")
        )
        src = src.join(F.broadcast(hot), ["band_id", "band_hash"], "left_anti")
    buckets = (
        src.groupBy("band_id", "band_hash")
        .agg(F.collect_list("item").alias("bucket"))
        .filter(F.size("bucket") >= 2)
    )
    pairs = (
        buckets.select(F.explode("bucket").alias("a"), "bucket")
        .select("a", F.explode("bucket").alias("b"))
        .filter(F.col(f"a.{id_field}") < F.col(f"b.{id_field}"))
    )
    if not distinct:
        return pairs
    return (
        pairs.withColumn("_ida", F.col(f"a.{id_field}"))
        .withColumn("_idb", F.col(f"b.{id_field}"))
        .dropDuplicates(["_ida", "_idb"])
        .drop("_ida", "_idb")
    )


def lsh_bucket_stats(items: DataFrame, max_bucket_size: int = 2000) -> dict:
    """Bucket-skew diagnostics for an LSH items frame: how many (band_id,
    band_hash) buckets exist, how many exceed ``max_bucket_size`` (those are
    DROPPED by ``banded_candidate_pairs``), and the largest bucket.  One
    aggregate action — call from ops/tests, not from the hot path."""
    sizes = items.groupBy("band_id", "band_hash").agg(
        F.count(F.lit(1)).alias("sz")
    )
    row = sizes.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.when(F.col("sz") > max_bucket_size, 1).otherwise(0)).alias(
            "n_dropped"
        ),
        F.max("sz").alias("max_size"),
    ).collect()[0]
    return {
        "n_buckets": row["n_buckets"],
        "n_dropped": int(row["n_dropped"] or 0),
        "max_size": row["max_size"],
    }


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """MinHash signature per doc via Kirsch-Mitzenmacher double hashing:
    ONE md5 per shingle yields two independent values (h1 = 60 bits from
    hex chars 1-15, h2 = 56 bits from chars 16-29) and hash family i is
    ``h1 + i*h2`` — max < 2^61, so plain int64 arithmetic, no overflow, no
    modulus.  sig[i] = min over shingles of g_i(shingle).

    Why this shape: per-seed md5 (32 digests per shingle) measured 2.6×
    slower end-to-end; per-seed xxhash64 is fast but not reproducible in
    DuckDB.  Double hashing gets both — one md5 plus 32 codegen'd
    multiply-adds, and the oracle re-derives the identical signature with
    the same two-substring split.  num_hashes aggregates over one explode,
    entirely JVM-side (no Python, no UDF)."""
    idx = _shingle_index(df, text_col, id_col, k)
    h1 = F.conv(F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(F.md5(F.col("shingle")), 16, 14), 16, 10).cast("long")
    aggs = [F.min(h1 + F.lit(i) * h2).alias(f"h{i}") for i in range(num_hashes)]
    return idx.groupBy(F.col("doc"), F.col("set_size")).agg(*aggs)


def minhash_bands_mapside(
    text, k: int = 3, num_hashes: int = 32, bands: int = 8
):
    """Per-ROW MinHash band hashes as an ``array<string>`` column — the
    map-side twin of ``minhash_signatures`` + banding, for STREAMING
    pipelines where the explode→groupBy signature aggregation would be a
    stateful shuffle.  Same md5 double-hashing constants, same
    ``md5(band_id | h…)`` band encoding, so the bands are bit-identical to
    the batch path (and to the DuckDB oracles).

    Shape notes: one ``aggregate`` HOF pass over the shingle set folds all
    ``num_hashes`` minima at once (md5 evaluated once per shingle, 32
    multiply-adds per element); the signature array is then bound ONCE via
    a single-element ``transform`` wrapper — referencing it directly from
    the 8 band lambdas would duplicate the whole fold expression per use
    site.  Empty shingle sets (< k tokens) yield an EMPTY band array —
    callers decide the no-shingle policy (the streaming dedup gives those
    docs a per-doc sentinel band so they pass through uniquely).
    Everything is JVM-side HOFs: no UDF, no shuffle, streaming-safe."""
    rows_per_band = num_hashes // bands
    sh = shingles(text, k)
    hp = F.transform(
        sh,
        lambda s: F.struct(
            F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long").alias("h1"),
            F.conv(F.substring(F.md5(s), 16, 14), 16, 10).cast("long").alias("h2"),
        ),
    )
    idxs = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    init = F.array_repeat(F.lit(1 << 62).cast("long"), num_hashes)
    sig = F.aggregate(
        hp,
        init,
        lambda acc, x: F.zip_with(
            acc, idxs, lambda a, i: F.least(a, x["h1"] + i.cast("long") * x["h2"])
        ),
    )
    def _bands_of(s):
        return F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.md5(
                F.concat_ws(
                    "|",
                    b.cast("string"),
                    *[
                        F.element_at(s, b * rows_per_band + r + 1).cast("string")
                        for r in range(rows_per_band)
                    ],
                )
            ),
        )
    banded = F.element_at(F.transform(F.array(sig), _bands_of), 1)
    return F.when(F.size(sh) > 0, banded).otherwise(
        F.array().cast("array<string>")
    )


def minhash_band_rows_mapinpandas(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Exploded (doc_id, band_hash) rows via an Arrow-vectorized numpy
    kernel — BIT-IDENTICAL to ``minhash_bands_mapside`` (tested against it)
    but ~3× faster: the HOF fold interprets 32 multiply-adds per shingle
    per row (≈16 M interpreted ops at sf0.1, measured 4.9 s), while here
    md5 is one hashlib call per shingle and the 32 minima are one
    ``np.minimum.reduceat`` over a (shingles × 32) array.  Docs with no
    shingles (< k tokens) emit their SENTINEL band (md5('uniq:'||id)), so
    the output covers every input doc — this is the streaming ingest
    filter's input contract.  Stateless mapInPandas: streaming-safe."""
    import hashlib

    import numpy as np
    import pandas as pd

    rows_per_band = num_hashes // bands

    def kernel(batches):
        I = np.arange(num_hashes, dtype=np.int64)
        for pdf in batches:
            out_ids: list = []
            out_bands: list = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                # null text = empty shingle set in the JVM twin -> the same
                # sentinel band (the doc passes through uniquely)
                toks = _py_tokens(text) or []
                if len(toks) < k:
                    out_ids.append(doc_id)
                    out_bands.append(
                        hashlib.md5(f"uniq:{doc_id}".encode()).hexdigest()
                    )
                    continue
                # duplicates don't affect min — no distinct needed
                digs = [
                    hashlib.md5(
                        " ".join(toks[i : i + k]).encode()
                    ).hexdigest()
                    for i in range(len(toks) - k + 1)
                ]
                h1 = np.array([int(d[:15], 16) for d in digs], dtype=np.int64)
                h2 = np.array([int(d[15:29], 16) for d in digs], dtype=np.int64)
                sig = (h1[:, None] + I[None, :] * h2[:, None]).min(axis=0)
                for b in range(bands):
                    key = "|".join(
                        [str(b)]
                        + [
                            str(sig[b * rows_per_band + r])
                            for r in range(rows_per_band)
                        ]
                    )
                    out_ids.append(doc_id)
                    out_bands.append(hashlib.md5(key.encode()).hexdigest())
            yield pd.DataFrame({"doc_id": out_ids, "band_hash": out_bands})

    return df.select(F.col(id_col).alias(id_col), F.col(text_col)).mapInPandas(
        kernel, _id_typed_schema(df, id_col, "doc_id", "band_hash string")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.6,
    max_bucket_size: int | None = 2000,
    content_distinct: bool | None = None,
) -> DataFrame:
    """MinHash + LSH banding: candidate pairs collide on ≥1 band, then are
    verified with exact Jaccard (no false positives in the output).

    rows/bands = 4 → collision prob at τ=0.6 per band = τ⁴ ≈ 0.13, across 8
    bands ≈ 67% recall per the standard S-curve; raise num_hashes/bands for
    higher recall at scale.

    EXACT-DUPLICATE MASS IS FACTORED OUT FIRST (r13, the image-family
    distinct-hash decomposition generalized to the MinHash family): ids
    group by identical text, the whole LSH pipeline — shingle, signature
    kernel, banding, bucket join, Jaccard verify — runs over ONE
    representative per distinct text, and duplicate multiplicity
    re-enters only at output expansion (identical text ⇒ identical
    shingle set ⇒ jaccard 1.0 in-group; a rep pair's verified
    n_common/jaccard carries to every copy pair verbatim, because the
    copies' shingle sets ARE the reps').  The old row-level form pushed
    every duplicate copy into all ``bands`` buckets — m identical docs
    made m-row buckets (m² candidate mass), and past the hot-bucket cap
    the whole group was silently DROPPED: zero pairs exactly where
    duplicate mass is densest.  Now bucket sizes track DISTINCT-text
    occupancy, and the cap means what it should: genuine band-hash
    collision across different contents.

    ``max_bucket_size`` passes through to :func:`banded_candidate_pairs`.
    The default (2000, mirrored by every LSH oracle) bounds PER-TASK pair
    expansion, but TOTAL candidate mass is Σ sz(sz−1)/2 over buckets under
    the cap — on a boilerplate-heavy corpus DISTINCT-text bucket sizes
    still grow with the corpus, so mass grows super-linearly (measured:
    73 k → 14.8 M → 867 M candidates at 5 k → 50 k → 500 k docs on the
    replica-marked probe corpus, SCALE.md r10 — that corpus is NEAR-dup
    heavy by construction, cross-replica jaccard ~0.25 and almost zero
    exact-dup mass, so the decomposition leaves its candidate mass
    unchanged; the exact-duplicate win is pinned by the 2,050-copy
    regression pytest instead, the shape real crawls have).  At 100 TB,
    measure the bucket histogram first (``lsh_bucket_stats`` — one
    aggregate) and size this cap to the pair budget, exactly like
    ``jaccard_pairs``'s ``max_shingle_df``.

    MEMORY UNIT (same as :func:`hamming_near_pairs`): the per-distinct-
    text id-list row — ~10⁷ copies of one boilerplate page make one
    multi-GB aggregate row before the expand, at which point the m²/2
    pair OUTPUT is absurd anyway; canonical selection should compose
    ``dup_clusters`` + ``keep_best``.

    Cache lifetime: the text groups and rep shingle sets are persisted
    and stay cached past the caller's action (see jaccard_pairs
    docstring for the clearCache / write-to-storage guidance).

    ``content_distinct`` follows the family contract (see
    :func:`jaccard_pairs`): ``None`` (default) self-decides with the
    one-action :func:`_dup_content_hashes` probe into three regimes —
    duplicate-free (skip group+expand outright: they are provably the
    identity), nearly-distinct (group ONLY the duplicated rows via
    literal-IN hash filters — no full-content shuffle), and
    duplicate-heavy (the full r13 grouping, whose content shuffle
    replaces the ``_spread`` move and shrinks everything downstream by
    the duplicate factor); ``True`` asserts upstream distinctness;
    ``False`` pins the full decomposition.
    """
    dup_hashes = None
    if content_distinct is None:
        dup_hashes = _dup_content_hashes(df, text_col)
        content_distinct = dup_hashes == []
    if content_distinct:
        mg = None
        reps = df.select(F.col(id_col), F.col(text_col))
    else:
        # one id-list row per DISTINCT text; in the FULL regime the group
        # key is the text value itself (the kernel path shuffles every
        # text once through _spread anyway, so the grouping shuffle
        # replaces — not adds to — that move, and everything downstream
        # shrinks by the duplicate factor); the HYBRID regime isolates
        # duplicated rows map-side instead
        reps, mg = _content_groups(df, text_col, id_col, dup_hashes)
    # Band hashes come MAP-SIDE from the Arrow numpy kernel (bit-identical
    # to the explode→groupBy minhash_signatures path — pytested), which
    # ELIMINATES the signature-aggregation shuffle entirely: the only
    # shuffle left before verification is the candidate bucket grouping.
    # The band md5 embeds the band id, so cross-band collisions are
    # impossible and band_id can be constant in the bucket key (the DuckDB
    # oracle joins on band_hash alone and enumerates the SAME candidates).
    # Sentinel rows for < k-token docs are unique per rep — they can never
    # form a bucket of 2, so they contribute no pairs, matching the old
    # path which dropped shingle-less docs before signatures.
    band_rows = minhash_band_rows_mapinpandas(
        _spread(reps), text_col, id_col, k, num_hashes, bands
    )
    items = band_rows.select(
        F.lit(0).alias("band_id"),
        "band_hash",
        F.struct(F.col("doc_id").alias("id")).alias("item"),
    )
    cands = banded_candidate_pairs(items, max_bucket_size=max_bucket_size).select(
        F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b")
    )
    # verify candidates with exact Jaccard (joins back to REP shingle
    # sets); the sets feed BOTH join sides plus the in-group tail, so
    # persist them — one shingle pass, not three
    sets = track_persist(
        _spread(reps)
        .select(F.col(id_col).alias("doc"), shingles(F.col(text_col), k).alias("sh"))
    )
    a = sets.select(F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a"))
    b_ = sets.select(F.col("doc").alias("doc_b"), F.col("sh").alias("sh_b"))
    # MERGE hints on the verification joins: the shingle-set side is
    # O(distinct texts) with array payloads, but Catalyst's LOGICAL size
    # estimate for it shrinks under autoBroadcastJoinThreshold at scale
    # and the STATIC plan then broadcasts it — measured at the 500k-doc
    # probe: driver OOM building a ~GB broadcast (SCALE.md r10).  AQE
    # cannot repair a static broadcast choice (it only demotes on empty
    # partitions), so the join strategy must be pinned: sort-merge on the
    # id scales unconditionally and AQE skew-join still applies.
    rep_pairs = (
        cands.join(a.hint("merge"), "doc_a")
        .join(b_.hint("merge"), "doc_b")
        .withColumn("n_common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.size("sh_a") + F.size("sh_b") - F.col("n_common")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )
    if content_distinct:
        # singleton groups: expansion is the identity, the intra tail empty
        return rep_pairs
    # expand rep pairs back through both id lists (copies share the reps'
    # shingle sets, so n_common/jaccard carry verbatim).  LEFT joins
    # against the MULTI-group frame only, coalesce-to-self for singleton
    # reps: the join input tracks duplicate mass, never corpus size (r14)
    cross = (
        rep_pairs.join(
            mg.select(
                F.col("__rep").alias("doc_a"), F.col("__ids").alias("__ids_a")
            ),
            "doc_a",
            "left",
        )
        .join(
            mg.select(
                F.col("__rep").alias("doc_b"), F.col("__ids").alias("__ids_b")
            ),
            "doc_b",
            "left",
        )
        .select(
            F.explode(F.coalesce("__ids_a", F.array("doc_a"))).alias("__ia"),
            F.coalesce("__ids_b", F.array("doc_b")).alias("__ids_b"),
            "n_common",
            "jaccard",
        )
        .select("__ia", F.explode("__ids_b").alias("__ib"), "n_common", "jaccard")
        .select(
            F.least("__ia", "__ib").alias("doc_a"),
            F.greatest("__ia", "__ib").alias("doc_b"),
            "n_common",
            "jaccard",
        )
        .filter(F.col("doc_a") != F.col("doc_b"))
    )
    # identical-text pairs: jaccard 1.0 by construction, n_common = the
    # rep's shingle-set size; shingle-less reps (< k tokens, NULL text)
    # emit nothing — matching the sentinel semantics above, and the old
    # path's NULL-jaccard filter for empty sets.  Size-prefiltered like
    # the sibling operators: on a mostly-unique corpus almost every group
    # is a singleton, and joining those just to discard them in the
    # doc_a < doc_b filter is a wasted corpus-sized join (review r13).
    intra = (
        mg.join(
            sets.select(F.col("doc").alias("__rep"), F.size("sh").alias("__n")),
            "__rep",
        )
        .filter(F.col("__n") > 0)
        .filter(F.lit(round(1.0, 4)) >= F.lit(threshold))
        .select(F.explode("__ids").alias("doc_a"), "__ids", "__n")
        .select("doc_a", F.explode("__ids").alias("doc_b"), "__n")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.col("__n").cast("int").alias("n_common"),
            F.lit(1.0).cast("double").alias("jaccard"),
        )
    )
    return cross.unionByName(intra)


def dup_clusters(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 20,
    max_driver_edges: int = 2_000_000,
) -> DataFrame:
    """Near-dup pair graph → duplicate clusters: connected components;
    each doc gets its component's minimum id as ``cluster_rep`` (the
    canonical survivor).

    Two tiers by edge count (the pair graph is normally FAR smaller than
    the corpus — it only holds near-duplicates):

    - ≤ ``max_driver_edges``: collect the edge list and run union-find on
      the driver — exact, one pass, no per-round job overhead.  The bound
      keeps driver memory explicit (2M edges ≈ 32 MB of longs).
    - larger: distributed min-label propagation WITH POINTER JUMPING —
      each round one edge equi-join + aggregate plus one label-of-label
      join over (node, label) pairs, edges cached and reused; jumping
      halves chain distances every round, so convergence is
      O(log diameter) rounds (diameter 2^20 fits the default max_iter)
      and only the changed-count reaches the driver.

    The tier probe and the fast-path fetch are ONE action: collect
    ``limit(max_driver_edges + 1)`` rows — if the limit is hit, fall
    through to the distributed tier.  (A separate ``count()`` first would
    evaluate the upstream pair-mining plan twice — the pairs input is
    typically an unmaterialized LSH pipeline, not a table.)

    Which tier ran is VISIBLE, not silent: logged at INFO and recorded in
    ``dup_clusters.last_tier`` (``"driver"`` / ``"distributed"``) — at
    scale the silent switch is exactly the kind of behavior change an
    operator must surface (VERDICT r2 "what's wrong" #2).
    """
    import logging

    from pyspark import StorageLevel

    from pyspark.sql.types import StructField, StructType

    log = logging.getLogger(__name__)

    out_schema = StructType(
        [
            StructField("doc_id", pairs.schema[id_a].dataType, True),
            StructField("cluster_rep", pairs.schema[id_a].dataType, True),
        ]
    )
    # Arrow collect, not Row collect: 2 M Row objects cost ~100 B each
    # (~200 MB of driver boxing for 32 MB of longs); toPandas lands the
    # same bound as two compact int64 columns, so the documented 2M-edge
    # cap really is ~32 MB of driver memory
    probe = pairs.select(id_a, id_b).limit(max_driver_edges + 1).toPandas()
    if len(probe) <= max_driver_edges:
        dup_clusters.last_tier = "driver"
        dup_clusters.last_rounds = None
        log.info(
            "dup_clusters: driver union-find tier (%d edges <= %d)",
            len(probe), max_driver_edges,
        )
        edges = zip(probe[id_a].tolist(), probe[id_b].tolist())
        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]  # path halving
                x = parent[x]
            return x

        for a, b in edges:
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:  # union by smaller id → rep is the component min
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        rows = [(n, find(n)) for n in parent]
        # explicit schema: an empty pair graph (no near-dups) must yield an
        # empty typed DataFrame, not a schema-inference error
        return pairs.sparkSession.createDataFrame(rows, out_schema)

    dup_clusters.last_tier = "distributed"
    log.info(
        "dup_clusters: distributed min-label-propagation tier (> %d edges)",
        max_driver_edges,
    )
    sym = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        sym.select(F.col("src").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels.count()

    def _ckpt_rdd(df: DataFrame):
        """Handle on a localCheckpointed frame's block-backed RDD — the
        ONLY way to free its storage: ``DataFrame.unpersist()`` on a
        checkpointed frame is a no-op in Spark 4 (the blocks belong to the
        LogicalRDD, not the cache manager), verified by probe; without
        this, block-manager storage grows by one full label set per
        checkpoint round (ADVICE r3).  Classic (non-Connect) API only —
        degrade to GC-driven cleanup if the internals move."""
        try:
            return df._jdf.queryExecution().analyzed().rdd()
        except Exception:  # noqa: BLE001
            return None

    changed = -1
    last_ckpt_rdd = None
    for i in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        # POINTER JUMPING: besides the neighbor minimum, adopt
        # label(label(node)) from the previous round — long chains halve
        # every round, so convergence is O(log diameter) rounds instead
        # of O(diameter) (the shortcutting move of the CC-in-MapReduce
        # literature, e.g. Rastogi et al.'s Hash-to-Min).  Cost: one
        # extra equi-join per round against the CACHED label set; the
        # fixpoint is unchanged — labels only decrease, every adopted
        # label is a component member's id, and changed==0 still forces
        # every edge label-equal, which pins the per-component constant
        # to the component minimum.  Without this, a 100 TB-corpus
        # boilerplate chain with diameter in the hundreds needs hundreds
        # of shuffle rounds (and trips max_iter); with it, diameter 2^20
        # converges inside the default max_iter=20.
        jump = labels.select(
            F.col("node").alias("__jn"), F.col("label").alias("__jl")
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .join(jump, labels.label == F.col("__jn"), "left")
            .select(
                "node",
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("nlabel"), F.col("label")),
                    F.coalesce(F.col("__jl"), F.col("label")),
                ).alias("label"),
            )
        )
        # TRUNCATE LINEAGE periodically: each round's plan references the
        # previous round THREE times (neighbor join + left join + the
        # pointer-jump join), so plan size TRIPLES per round — exponential
        # growth that OOMs the driver merely stringifying the plan once
        # the graph diameter passes ~10 (caught by the skewed-component
        # test, pre-jumping, when growth was 2×/round).  Checkpointing
        # EVERY round fixed that but cost an extra eager count()+block
        # write per round (+47 % on dedup_clusters at sf0.1, VERDICT r3);
        # every 3rd round now bounds the un-truncated plan at 3^3 = 27
        # sub-plans over cached blocks — still driver-trivial (the r3
        # failure needed plan depth growing with diameter, not a fixed 27)
        # while keeping per-round cost to one persist + one action.
        # localCheckpoint is deliberate (in-executor blocks, no DFS): on a
        # real cluster an executor loss mid-iteration kills the job — use
        # reliable .checkpoint() + spark.sparkContext.setCheckpointDir for
        # the fault-tolerant variant.
        do_ckpt = (i + 1) % 3 == 0
        if do_ckpt:
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            new_labels = new_labels.persist(StorageLevel.MEMORY_AND_DISK)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if do_ckpt:
            # the new checkpoint cut lineage, so the PREVIOUS checkpoint's
            # blocks are now unreachable — free them explicitly
            if last_ckpt_rdd is not None:
                last_ckpt_rdd.unpersist(False)
            last_ckpt_rdd = _ckpt_rdd(new_labels)
        dup_clusters.last_rounds = i + 1
        if changed == 0:
            break
    sym.unpersist()
    if changed != 0:
        # returning here would silently split one real component into
        # several clusters — wrong dedup decisions, no symptom
        raise RuntimeError(
            f"dup_clusters did not converge in max_iter={max_iter} rounds "
            f"({changed} labels still moving): a component's diameter "
            "exceeds 2^max_iter — raise max_iter (rounds cost one join+agg "
            "+ one pointer-jump join each and converge in O(log diameter))"
        )
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_rep")
    )


#: which tier the most recent dup_clusters call took ("driver"/"distributed")
dup_clusters.last_tier = None
#: rounds the most recent DISTRIBUTED run took (None for driver tier) —
#: pointer jumping keeps this ~log2(largest component diameter)
dup_clusters.last_rounds = None


#: SimHash fingerprint width: 60 bits = the md5_h60 token-hash width.
SIMHASH_BITS = 60


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """60-bit SimHash over md5-derived token hashes: bit b of the
    fingerprint is 1 iff sum over tokens of ±1 (by bit b of the token hash)
    is positive.  The md5_h60 token hash (vs xxhash64) makes the whole
    fingerprint reproducible in DuckDB, so the catalog query carries an
    exact oracle.

    60 conditional-sum aggregates over one token explode — hash-aggregate
    with map-side partials, one shuffle on doc id."""
    toks = _spread(df).select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"),
    ).withColumn("th", F.conv(md5_h60(F.col("tok")), 16, 10).cast("long"))
    aggs = [
        F.sum(
            F.when(F.col("th").bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(SIMHASH_BITS)
    ]
    sums = toks.groupBy("doc").agg(*aggs)
    fp = None
    for b in range(SIMHASH_BITS):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fp = bit if fp is None else fp.bitwiseOR(bit)
    return sums.select(F.col("doc").alias("doc_id"), fp.alias("simhash64"))


def simhash_fingerprints_mapinpandas(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, simhash64) via an Arrow numpy kernel — BIT-IDENTICAL to
    ``simhash`` (pytested) but with NO shuffle: the explode→60-conditional-
    sum aggregation becomes one md5 per token plus a vectorized
    bit-matrix column sum per doc.  Token MULTISET semantics preserved
    (duplicates count; the empty-string token from empty text included),
    matching the exploded batch path and the DuckDB oracle.  Null-text
    docs emit NOTHING — the batch path's explode drops them, and without
    the guard str(None) would fabricate the token 'none' and pair two
    null-text docs as a hamming-0 near-dup."""
    import hashlib

    import numpy as np
    import pandas as pd

    bit_idx = np.arange(SIMHASH_BITS, dtype=np.int64)

    def kernel(batches):
        for pdf in batches:
            ids: list = []
            fps: list = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = _py_tokens(text)
                if toks is None:
                    continue
                hs = np.array(
                    [
                        int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
                        for t in toks
                    ],
                    dtype=np.int64,
                )
                signs = (((hs[:, None] >> bit_idx[None, :]) & 1) * 2 - 1).sum(
                    axis=0
                )
                fp = int(((signs > 0).astype(np.int64) << bit_idx).sum())
                ids.append(doc_id)
                fps.append(fp)
            yield pd.DataFrame({"doc_id": ids, "simhash64": fps})

    return df.select(F.col(id_col).alias(id_col), F.col(text_col)).mapInPandas(
        kernel, _id_typed_schema(df, id_col, "doc_id", "simhash64 long")
    )


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """SimHash near-dup pairs: Hamming distance ≤ max_hamming over the
    60-bit fingerprints — pigeonhole banding (split into max_hamming+1
    chunks; any qualifying pair agrees exactly on ≥1 chunk) + exact
    popcount verify, COMPLETE and cap-free, with the banded join running
    over DISTINCT fingerprints only (the image-family rework of
    :func:`hamming_near_pairs`, generalized to the text family):

    1. ids group by identical fingerprint — exact-duplicate text shares
       the fingerprint exactly, so Hamming-0 pairs expand WITHIN groups,
       never through a join or a bucket;
    2. chunk-equality banding + popcount runs over the distinct
       fingerprints — bucket sizes track distinct-fp occupancy of the
       15-bit chunk space, never duplicate multiplicity;
    3. fingerprint pairs expand back through the two id lists.

    The old row-level form pushed every duplicate COPY into its chunk
    buckets: m identical docs made m-row buckets in all chunks (the m²
    candidate blowup the r12 image probe measured), and past the
    hot-bucket cap the whole group was silently DROPPED — zero pairs
    exactly where duplicate mass is densest, on the corpus shape (a
    duplicate-heavy crawl) this operator exists for.  The decomposition
    is exact, and duplicate mass never needs a cap again.

    ``max_bucket_size`` (default None = complete): the DISTINCT-fp chunk
    buckets are still Ω(D²/2^15)-pair generators once distinct-fp count D
    saturates the 15-bit chunk space — and unlike the image family there
    is no grid knob to widen this fixed 60-bit fingerprint.  At that
    regime set the cap: it now degrades ONLY the cross-content
    hash-collision candidates (a dropped bucket holds many DIFFERENT
    contents colliding on one chunk), never exact-duplicate mass — the
    in-group expand is structurally cap-immune, which is exactly the
    failure the old row-level cap had.

    MEMORY UNIT (same as :func:`hamming_near_pairs`): the per-distinct-fp
    id-list row — a fingerprint carrying ~10⁷ duplicate ids makes one
    multi-GB aggregate row before the expand, at which point the m²/2
    pair OUTPUT is absurd anyway; canonical selection should compose
    ``dup_clusters`` + ``keep_best``, whose per-fp state is O(1)."""
    n_chunks = max_hamming + 1
    chunk_bits = SIMHASH_BITS // n_chunks
    if max_bucket_size is None:
        # loud, zero-cost notice (ADVICE r13): the cap-free default is
        # COMPLETE, but once distinct-fp count D saturates the 15-bit
        # chunk space candidate generation is Ω(D²/2^15) with no
        # backstop — a large-corpus caller on the default should know
        # it opted into unbounded pair generation
        import logging

        logging.getLogger(__name__).info(
            "simhash_near_pairs: max_bucket_size=None — candidate "
            "generation is complete but UNCAPPED; at distinct-"
            "fingerprint saturation of the %d-bit chunk space this is "
            "Ω(D²/2^%d).  Set max_bucket_size to bound it (the cap "
            "degrades only cross-content hash collisions, never "
            "duplicate mass).",
            chunk_bits,
            chunk_bits,
        )
    # map-side numpy fingerprints (bit-identical to simhash(), pytested):
    # removes the 60-conditional-sum aggregation shuffle
    fps = simhash_fingerprints_mapinpandas(_spread(df), text_col, id_col)
    # one id-list row per DISTINCT fingerprint; persisted — feeds the
    # intra expand, the band rows, and both sides of the cross expansion,
    # and its upstream is the per-doc tokenize+hash kernel
    groups = track_persist(
        fps.groupBy(F.col("simhash64").alias("__fp")).agg(
            F.collect_list("doc_id").alias("__ids")
        )
    )
    # Hamming-0: all pairs within an identical-fingerprint group
    intra = (
        groups.select(F.explode("__ids").alias("doc_a"), "__ids")
        .select("doc_a", F.explode("__ids").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.lit(0).cast("int"))
    )
    chunk_vals = F.array(
        *[
            F.shiftrightunsigned(F.col("__fp"), c * chunk_bits).bitwiseAND(
                F.lit((1 << chunk_bits) - 1)
            )
            for c in range(n_chunks)
        ]
    )
    items = groups.select(
        F.struct(F.col("__fp").alias("fp")).alias("item"),
        F.posexplode(chunk_vals).alias("band_id", "band_hash"),
    )
    fp_pairs = (
        banded_candidate_pairs(items, id_field="fp", max_bucket_size=max_bucket_size)
        .select(F.col("a.fp").alias("fp_a"), F.col("b.fp").alias("fp_b"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    cross = (
        fp_pairs.join(
            groups.select(F.col("__fp").alias("fp_a"), F.col("__ids").alias("__ids_a")),
            "fp_a",
        )
        .join(
            groups.select(F.col("__fp").alias("fp_b"), F.col("__ids").alias("__ids_b")),
            "fp_b",
        )
        .select(F.explode("__ids_a").alias("__ia"), "__ids_b", "hamming")
        .select("__ia", F.explode("__ids_b").alias("__ib"), "hamming")
        .select(
            F.least("__ia", "__ib").alias("doc_a"),
            F.greatest("__ia", "__ib").alias("doc_b"),
            "hamming",
        )
        # duplicate doc_id input (outside the contract) would surface as a
        # self-pair here — keep the old a.id < b.id exclusion
        .filter(F.col("doc_a") != F.col("doc_b"))
    )
    return intra.unionByName(cross)


def keep_best(
    docs: DataFrame,
    pairs: DataFrame,
    quality: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "quality_score",
) -> DataFrame:
    """Turn a near-dup pair graph into the CLEANED CORPUS: cluster the
    pairs (connected components) and keep, per cluster, the member with
    the best quality score (tie → lowest id) — plus every unclustered
    doc.  This is the canonical-selection rule production dedup actually
    wants: ``dup_clusters``'s min-id representative is deterministic but
    arbitrary; a pipeline should retain the best COPY of the content,
    not the earliest-crawled one.

    Scale shape: the pair graph holds near-duplicates only, so
    ``clusters`` is tiny relative to the corpus; winner selection is two
    partial-aggregatable aggregates over that summary frame — max quality
    per cluster, then min id among the members achieving it (no window —
    AQE can't skew-split window partitions, and a boilerplate
    mega-cluster is exactly a skewed key; ``min(id)`` keeps the tie rule
    type-agnostic where a ``-id`` struct key would break on string ids).
    The corpus-side anti-join keys on ids only (AQE broadcasts the
    clustered-id set).  Quality rides as a scaled-integer basis-point
    key so the comparison is exact across engines.  Members MISSING from
    ``quality`` rank worst (coalesced below any real score) but still
    count toward cluster_size and can win an all-unscored cluster —
    clusters never vanish because scoring covered a subset.

    Returns (doc_id, cluster_size, reason) — reason is ``'unique'`` for
    docs with no near-dup, ``'best_of_cluster'`` for the retained member
    of each cluster; dropped members simply don't appear.
    """
    clusters = track_persist(dup_clusters(pairs, id_a="doc_a", id_b="doc_b"))
    qbp = F.round(F.col(quality_col) * 10000).cast("long")
    member_q = track_persist(
        clusters.join(
            quality.select(F.col(id_col).alias("doc_id"), qbp.alias("qbp")),
            "doc_id",
            "left",
        ).withColumn("qbp", F.coalesce(F.col("qbp"), F.lit(-1).cast("long")))
    )
    best = member_q.groupBy("cluster_rep").agg(
        F.max("qbp").alias("__best_q"),
        F.count(F.lit(1)).cast("int").alias("cluster_size"),
    )
    winners = (
        member_q.join(best, "cluster_rep")
        .filter(F.col("qbp") == F.col("__best_q"))
        .groupBy("cluster_rep", "cluster_size")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "cluster_size", F.lit("best_of_cluster").alias("reason"))
    )
    unique = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(clusters.select("doc_id"), "doc_id", "left_anti")
        .select(
            "doc_id",
            F.lit(1).cast("int").alias("cluster_size"),
            F.lit("unique").alias("reason"),
        )
    )
    return unique.unionByName(winners)


def split_leakage(
    pairs: DataFrame,
    split: DataFrame,
    id_col: str = "doc_id",
    split_col: str = "split",
    eval_split: str = "eval",
    score_col: str = "jaccard",
) -> DataFrame:
    """Audit a train/eval split for NEAR-dup leakage: which eval docs have
    a near-duplicate on the train side?  Content-hash splitting
    (``hash_split``) already pins EXACT duplicates to one split, but
    near-duplicates hash differently and can straddle the boundary —
    the leak that silently inflates eval scores.  Feed it any pair
    source (``minhash_lsh_pairs``, ``jaccard_pairs``, embedding pairs).

    Scale shape: the pair graph is near-dup-only (small); the split
    frame is (id, split) pairs — both joins key on ids and AQE
    broadcasts whichever side is small.  The corpus text never moves.

    Returns per leaky eval doc: (doc_id, n_train_dups, max_jaccard) —
    the docs to drop from eval (or whose cluster to quarantine).
    """
    sp = split.select(F.col(id_col).alias("doc_id"), F.col(split_col).alias("sp"))
    # orient every cross pair as (eval_doc, score); pairs are doc_a < doc_b
    # so both orientations must be checked
    a = pairs.join(sp.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sp", "sa"), "doc_a")
    ab = a.join(sp.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sp", "sb"), "doc_b")
    # exactly ONE side in the eval split (a train/val crossing in a
    # multi-way split has no eval doc to report)
    cross = ab.filter(
        (F.col("sa") == eval_split) != (F.col("sb") == eval_split)
    )
    oriented = cross.select(
        F.when(F.col("sa") == eval_split, F.col("doc_a"))
        .otherwise(F.col("doc_b"))
        .alias("doc_id"),
        F.col(score_col).alias("score"),
    )
    return oriented.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_train_dups"),
        F.max("score").alias("max_jaccard"),
    )


def _hamming_hash_pairs(
    distinct_bits: DataFrame,
    max_ham: int,
    n_bands: int,
    nbits: int,
) -> DataFrame:
    """Banded-LSH + exact-verify core over DISTINCT bit strings (one
    column ``__bits``): all (bits_a, bits_b, hamming) with 0 < hamming ≤
    ``max_ham``, complete by pigeonhole for ``n_bands > max_ham``.
    Shared by :func:`hamming_near_pairs` (which expands the hash pairs
    back through id lists) and :func:`hamming_keep_best` (which clusters
    the hash graph directly and never builds id lists).  Shuffle volume
    is bounded by distinct-hash occupancy — duplicate mass never enters
    the join.

    The ``nbits`` width is enforced HERE, on every caller's path: bands
    are substring positions and the packed ``bit_count(xor)`` verify
    reads exactly ``nbits`` chars, so a wider hash than declared (e.g.
    a user who widened to ``image_ahash(grid=16)`` per the percolation
    advice but left ``nbits=64``) would silently score two images equal
    on their first 64 bits as Hamming-0 — merged, clustered, one
    dropped as a "duplicate".  Mismatched rows raise loudly instead."""
    width = -(-nbits // n_bands)  # ceil
    mismatch = F.length(F.col("__bits")) != nbits
    distinct_bits = distinct_bits.withColumn(
        "__bits",
        F.when(
            mismatch,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"hamming banded join: expected {nbits}-char bit "
                        "string (nbits), got length "
                    ),
                    F.length(F.col("__bits")).cast("string"),
                )
            ),
        ).otherwise(F.col("__bits")),
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("bi"),
                F.substring(F.col("__bits"), i * width + 1, width).alias("bs"),
            )
            for i in range(n_bands)
        ]
    )
    e = distinct_bits.select(F.col("__bits"), F.explode(bands).alias("__b")).select(
        F.col("__bits"), "__b.bi", "__b.bs"
    )
    a = e.select(F.col("__bits").alias("bits_a"), "bi", "bs")
    b = e.select(F.col("__bits").alias("bits_b"), "bi", "bs")
    # exact verify via packed 32-bit chunks: bit_count(xor) is a JVM
    # intrinsic per chunk — vs the old aggregate(zip_with(split(...)))
    # form, which built two nbits-element string arrays PER CANDIDATE
    # PAIR (the dominant cost when a saturated fingerprint makes band
    # buckets fat; r13 probe).  32-bit chunks keep conv() inside long
    # range with sign intact; a trailing partial chunk compares equal
    # widths on both sides, so the distance is unchanged.
    ham = sum(
        F.bit_count(
            F.coalesce(
                F.conv(F.substring(F.col("bits_a"), i * 32 + 1, 32), 2, 10),
                F.lit("0"),
            ).cast("long")
            .bitwiseXOR(
                F.coalesce(
                    F.conv(F.substring(F.col("bits_b"), i * 32 + 1, 32), 2, 10),
                    F.lit("0"),
                ).cast("long")
            )
        )
        for i in range(-(-nbits // 32))
    )
    return (
        a.join(b, ["bi", "bs"])
        .filter(F.col("bits_a") < F.col("bits_b"))
        .select("bits_a", "bits_b")
        .distinct()  # a hash pair can share several bands
        .withColumn("hamming", ham.cast("long"))
        .filter(F.col("hamming") <= max_ham)
    )


def hamming_near_pairs(
    hashed: DataFrame,
    id_col: str,
    bits_col: str,
    max_ham: int = 4,
    n_bands: int | None = None,
    nbits: int = 64,
) -> DataFrame:
    """All id pairs whose fixed-width bit strings sit within Hamming
    distance ``max_ham`` — banded-LSH candidate generation with an exact
    verify, COMPLETE by pigeonhole: with ``n_bands > max_ham`` bands, any
    pair with ≤ ``max_ham`` differing bits leaves at least one band
    untouched, so every qualifying pair shares at least one
    (band_index, band_substring) bucket.  Default bands = ``max_ham + 1``
    (the minimum that preserves completeness — more bands cost shuffle
    volume without adding recall for this threshold).

    Scale shape (r12 rework — the sf10 probe caught the old one): the
    band join runs over DISTINCT bit strings, never over input rows.  A
    near-dup image corpus is duplicate-heavy BY THE PROBLEM STATEMENT —
    re-encoded copies share a hash exactly — and the old row-level band
    join squared every repeated hash inside its band buckets: at 500 k
    probe images it shuffled 16 GB and did not finish in 35 min.  The
    decomposition is exact and cap-free:

    1. group ids by identical hash (output-bounded: a group of m ids
       emits its m·(m−1)/2 Hamming-0 pairs anyway, so the per-group list
       is ≤ the result the caller asked for);
    2. Hamming-0 pairs expand WITHIN groups — no join at all;
    3. the banded join + exact verify runs over the distinct hashes
       (D ≤ corpus, and duplicate-heavy corpora have D ≪ corpus), then
       hash-pairs expand back through the two id lists.

    Completeness is untouched (pigeonhole on distinct hashes; identical
    hashes are case 2).  Bucket width = bits/n_bands; at billions of
    DISTINCT hashes widen the hash (128-bit SimHash) or band count so
    buckets stay fine-grained — distinct-hash occupancy, not pair
    count, is the knob.

    MEMORY UNIT: the per-distinct-hash group row — ``collect_list`` of
    ids per identical hash — is unbounded in ids-per-hash: a single hash
    carrying ~10⁷ duplicate ids makes one multi-GB aggregate row before
    the expand (at which point the m²/2-pair OUTPUT is absurd anyway).
    When the goal is canonical selection rather than the audit pair
    table, use :func:`hamming_keep_best`, which never builds id lists —
    its per-hash state is O(1) (count + best member) at any duplicate
    multiplicity."""
    n_bands = int(n_bands or (max_ham + 1))
    if n_bands <= max_ham:
        raise ValueError("completeness needs n_bands > max_ham (pigeonhole)")
    # nbits must match the hash width: bands are substring positions, so
    # a wrong width either leaves tail bits unbanded (losing completeness
    # for wider hashes) or makes empty-substring mega-buckets (the
    # all-pairs blowup) for narrower ones.  Rows of any OTHER length are
    # rejected loudly rather than silently mis-banded.
    mismatch = F.length(F.col(bits_col)) != nbits
    hashed = hashed.withColumn(
        bits_col,
        F.when(
            mismatch,
            F.raise_error(
                F.concat(
                    F.lit(f"hamming_near_pairs: expected {nbits}-char bit "
                          "string, got length "),
                    F.length(F.col(bits_col)).cast("string"),
                )
            ),
        ).otherwise(F.col(bits_col)),
    )
    from stateful_spark_streaming_spark.caching import track_persist

    # one id-list row per DISTINCT hash (NULL hashes pair with nothing,
    # matching the old join-on-NULL-never-matches behavior).  PERSISTED:
    # the groups frame feeds THREE consumers (intra expand + both sides
    # of the hash-pair id expansion) and its upstream is typically an
    # expensive decode/hash kernel (image_ahash re-decodes every blob) —
    # the cache is distinct-hash-sized, bounded above by the input.
    groups = track_persist(
        hashed.filter(F.col(bits_col).isNotNull())
        .groupBy(F.col(bits_col).alias("__bits"))
        .agg(F.collect_list(F.col(id_col)).alias("__ids"))
    )

    # Hamming-0: all pairs within an identical-hash group — pure expand
    intra = (
        groups.select(F.explode("__ids").alias("id_a"), "__ids")
        .select("id_a", F.explode("__ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.lit(0).cast("long"))
    )

    # banded join over distinct hashes only
    hash_pairs = _hamming_hash_pairs(
        groups.select("__bits"), max_ham=max_ham, n_bands=n_bands, nbits=nbits
    )

    # expand hash pairs back through the two id lists; order-normalize
    # (ids from different hash groups carry no relative order)
    cross = (
        hash_pairs.join(
            groups.select(
                F.col("__bits").alias("bits_a"), F.col("__ids").alias("__ids_a")
            ),
            "bits_a",
        )
        .join(
            groups.select(
                F.col("__bits").alias("bits_b"), F.col("__ids").alias("__ids_b")
            ),
            "bits_b",
        )
        .select(F.explode("__ids_a").alias("__ia"), "__ids_b", "hamming")
        .select("__ia", F.explode("__ids_b").alias("__ib"), "hamming")
        .select(
            F.least("__ia", "__ib").alias("id_a"),
            F.greatest("__ia", "__ib").alias("id_b"),
            "hamming",
        )
        # an id appearing under TWO hashes (duplicate-id input — outside
        # the contract) would otherwise surface as a self-pair here; the
        # old row-level join's id_a < id_b filter excluded it, keep that
        .filter(F.col("id_a") != F.col("id_b"))
    )
    return intra.unionByName(cross)


def hamming_keep_best(
    hashed: DataFrame,
    id_col: str,
    bits_col: str,
    quality: DataFrame,
    quality_col: str,
    max_ham: int = 4,
    n_bands: int | None = None,
    nbits: int = 64,
    max_cluster_frac: float | None = None,
) -> DataFrame:
    """Canonical selection for a duplicate-heavy HASH-fingerprinted corpus
    (the image-family ``keep_best``): cluster Hamming-≤``max_ham``
    neighborhoods and keep, per cluster, the member with the best
    ``quality`` (tie → lowest id) — WITHOUT ever materializing the id
    pair table ``hamming_near_pairs`` emits (r12 verdict #3: at the sf10
    probe depth that audit table is 835 M rows; the representatives are
    what a training pipeline actually consumes).

    Exactness argument (pinned by test_hamming_keep_best_equals_pair_
    composition): selection ranks members lexicographically by
    (quality desc, id asc), and argmax over a cluster equals argmax over
    the per-hash argmaxes — every cluster member belongs to exactly one
    hash group, each group contributes its best member, and max/min are
    associative — so only per-hash SUMMARIES (count, best quality, best
    id) ever cross a shuffle.

    Scale shape, and why this beats composing the pair table with
    ``keep_best``:
    - per-hash state is O(1) — two aggregates over (id, bits, quality)
      rows; NO ``collect_list`` of ids, so the 10⁷-duplicates-of-one-hash
      corpus that makes ``hamming_near_pairs`` build a multi-GB group row
      costs one summary row here;
    - the banded join + exact verify (shared ``_hamming_hash_pairs``
      core) runs over DISTINCT hashes, and its output — the hash-level
      near-dup graph — is what ``dup_clusters`` clusters: graph size
      tracks distinct-hash adjacency, never duplicate multiplicity;
    - winner selection is two partial-aggregatable aggregates over the
      per-hash summary frame (max quality per cluster, then min id among
      achievers) — the ``keep_best`` no-window shape, AQE-skew-safe.

    ``quality`` is an (id, score) frame; scores are compared in scaled
    basis points (×10⁴, exact cross-engine); ids missing from it rank
    worst but still count toward cluster_size.  NULL-hash ids cannot be
    compared and surface as ``'unique'``.

    Returns (``id_col``, cluster_size, reason): ``'unique'`` for an
    unduplicated image, ``'best_of_cluster'`` for the retained member of
    each near-dup cluster (size counts ALL members, Hamming-0 copies
    included); dropped members don't appear.

    CHOOSE ``max_ham`` BY PROBING — connected components COMPOUND the
    radius: A~B and B~C chain A and C at distance up to 2·max_ham, and
    in a dense hash space the closure percolates into one giant
    component that "retains" a single image for the whole corpus
    (measured on the synthetic corpus at sf0.1: max_ham=4 → 1 cluster of
    all 2 860 distinct hashes, max_ham=2 → a 2 704-hash giant, max_ham=1
    → healthy structure; SCALE.md r13).  The exactness contract holds at
    any radius — percolation is a semantics property of transitive
    closure, not a bug here — so probe the output's ``cluster_size``
    distribution and tighten the radius (or widen the hash) until the
    largest cluster is plausibly one content item.  The audit pair
    table (``hamming_near_pairs``) does not compound: a pair appears
    only at its own distance.

    ``max_cluster_frac`` operationalizes that rule in the operator: when
    set (e.g. 0.5), the call RAISES if any cluster holds more than that
    fraction of the corpus — the percolated regime where "canonical
    selection" silently degenerates into keep-one-image.  One
    summary-sized aggregate; the sf10 probe found exactly this state
    (largest cluster 98.5% of 500 k images at a saturated 64-bit hash),
    and a pipeline should stop there, not publish the output.
    """
    n_bands = int(n_bands or (max_ham + 1))
    if n_bands <= max_ham:
        raise ValueError("completeness needs n_bands > max_ham (pigeonhole)")
    from stateful_spark_streaming_spark.caching import track_persist

    qbp = F.round(F.col(quality_col).cast("double") * 10000).cast("long")
    # PERSISTED: members feeds three consumers (the per-hash count/quality
    # aggregate, the best-id join-back, and the NULL-hash tail) and its
    # upstream is typically an expensive decode/hash kernel (image_ahash
    # re-decodes every blob) — without the pin the kernel runs once PER
    # CONSUMER (measured 3× the decode wall at the sf10 probe depth).
    # The cache is corpus-sized but columnar-narrow: (id, bits, qbp).
    members = track_persist(
        hashed.select(F.col(id_col).alias("__id"), F.col(bits_col).alias("__bits"))
        .join(
            quality.select(F.col(id_col).alias("__id"), qbp.alias("__qbp")),
            "__id",
            "left",
        )
        .withColumn("__qbp", F.coalesce(F.col("__qbp"), F.lit(-1).cast("long")))
    )
    # per-distinct-hash summary: O(1) per hash regardless of duplicate
    # multiplicity (count + best quality), never an id list
    grp = members.filter(F.col("__bits").isNotNull()).groupBy("__bits").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.max("__qbp").alias("__gq"),
    )
    # min id among the hash group's best-quality members — the keep_best
    # two-aggregate shape (no window; min keeps the tie rule type-agnostic)
    gbest = (
        members.join(grp.select("__bits", "__gq"), "__bits")
        .filter(F.col("__qbp") == F.col("__gq"))
        .groupBy("__bits")
        .agg(F.min("__id").alias("__gid"))
    )
    # persisted: feeds the edge generator, the cluster join, and the
    # winner selection — distinct-hash-sized, bounded above by the input
    gsum = track_persist(grp.join(gbest, "__bits"))

    winners = keep_best_from_hash_summaries(
        gsum, id_col=id_col, max_ham=max_ham, n_bands=n_bands, nbits=nbits,
        max_cluster_frac=max_cluster_frac,
    )
    nulls = members.filter(F.col("__bits").isNull()).select(
        F.col("__id").alias(id_col),
        F.lit(1).cast("long").alias("cluster_size"),
        F.lit("unique").alias("reason"),
    )
    return winners.unionByName(nulls)


def keep_best_from_hash_summaries(
    gsum: DataFrame,
    id_col: str,
    max_ham: int = 4,
    n_bands: int | None = None,
    nbits: int = 64,
    max_cluster_frac: float | None = None,
) -> DataFrame:
    """The cluster/winner TAIL of :func:`hamming_keep_best`, taking the
    per-distinct-hash summary frame directly: one row per hash with
    ``__bits`` (the fingerprint), ``__n`` (member count), ``__gq``
    (best member quality, scaled long), ``__gid`` (min id among the
    best-quality members).  Factored out so an INGEST-time log of
    mergeable per-hash partials (the streaming twin: n is additive,
    (gq, gid) folds as max(struct(gq, −gid))) feeds the same graph
    clustering and lexicographic winner rule as the batch operator —
    single-pass ingest ≡ batch, pinned in tests."""
    n_bands = int(n_bands or (max_ham + 1))
    if n_bands <= max_ham:
        raise ValueError("completeness needs n_bands > max_ham (pigeonhole)")
    edges = _hamming_hash_pairs(
        gsum.select("__bits"), max_ham=max_ham, n_bands=n_bands, nbits=nbits
    )
    clusters = dup_clusters(edges, id_a="bits_a", id_b="bits_b")
    full = gsum.join(
        clusters.select(F.col("doc_id").alias("__bits"), "cluster_rep"),
        "__bits",
        "left",
    ).withColumn("__rep", F.coalesce(F.col("cluster_rep"), F.col("__bits")))
    csum = full.groupBy("__rep").agg(
        F.sum("__n").cast("long").alias("cluster_size"),
        F.max("__gq").alias("__cq"),
    )
    if max_cluster_frac is not None:
        # percolation guard (see hamming_keep_best's docstring): one
        # summary-sized aggregate — a cluster swallowing more than the
        # stated corpus fraction means the radius/hash-width is past its
        # discriminative capacity and the "representatives" are fiction
        st = csum.agg(
            F.max("cluster_size").alias("mx"), F.sum("cluster_size").alias("tot")
        ).collect()[0]
        if st.tot and st.mx > max_cluster_frac * st.tot:
            raise ValueError(
                f"hamming keep-best percolated: largest cluster holds "
                f"{st.mx} of {st.tot} members "
                f"({st.mx / st.tot:.1%} > max_cluster_frac="
                f"{max_cluster_frac:.0%}) — the Hamming closure at "
                f"max_ham={max_ham} exceeds the fingerprint's "
                "discriminative capacity for this corpus; tighten the "
                "radius or widen the hash (e.g. image_ahash grid=16)"
            )
    return (
        full.join(csum, "__rep")
        .filter(F.col("__gq") == F.col("__cq"))
        .groupBy("__rep", "cluster_size")
        .agg(F.min("__gid").alias("__id"))
        .select(
            F.col("__id").alias(id_col),
            F.col("cluster_size"),
            F.when(F.col("cluster_size") == 1, F.lit("unique"))
            .otherwise(F.lit("best_of_cluster"))
            .alias("reason"),
        )
    )
