"""Text-analysis operators for LLM-data pipelines (BASELINE.json north star).

All hot-path computation is built-in column expressions (split / regexp /
length / aggregate) — JVM-side, codegen'd, no Python in the scan path.  At
100 TB these run as pure map stages: no shuffle at all until an aggregation
asks for one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from stateful_spark_streaming_spark.caching import track_persist

# Tiny per-language stopword lists for the n-gram/stopword language heuristic.
# Deliberately small + public-common words, so the same lists are trivially
# re-expressible in the DuckDB oracle SQL.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "por"],
    "de": ["der", "die", "und", "das", "nicht", "ist", "von", "mit"],
    "fr": ["le", "la", "les", "des", "est", "dans", "pour", "une"],
}


def normalize_text(col: Column) -> Column:
    """lowercase, collapse non-alphanumerics to single spaces, trim."""
    return F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "))


def tokens(col: Column) -> Column:
    """whitespace tokenization of normalized text."""
    return F.split(normalize_text(col), " ")


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish subword estimate
    (~chars/4, the common public heuristic for byte-pair-encoded tokens)."""
    t = tokens(F.col(text_col))
    return df.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.length(F.col(text_col)).alias("n_chars_raw"),
        (F.length(normalize_text(F.col(text_col))) / F.lit(4.0)).cast("double").alias(
            "bpe_token_estimate"
        ),
        F.size(F.array_distinct(t)).alias("n_unique_tokens"),
    )


def quality_score(
    df: DataFrame,
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
    tokens_col: str | None = None,
) -> DataFrame:
    """Heuristic document quality: length band, punctuation density, stopword
    hit-rate, mean word length, type-token ratio — rounded for cross-engine
    stability.  ``keep_cols`` ride through the projection so downstream
    grouping (e.g. per-source mixture building) needs no self-join.

    ``tokens_col``: name of a pre-computed ``tokens(text)`` array column —
    pipelines that tokenize once into a persisted frame (the
    ``unigram_logprob`` lesson) pass it so the regex tokenizer isn't
    re-evaluated per stage.  ``array_join(toks, ' ')`` reconstructs the
    normalized text exactly (split/join round-trip), so every signal stays
    bit-identical to the text-column path."""
    t = F.col(tokens_col) if tokens_col else tokens(F.col(text_col))
    norm = (
        F.array_join(F.col(tokens_col), " ")
        if tokens_col
        else normalize_text(F.col(text_col))
    )
    n_tok = F.size(t)
    n_char = F.length(F.col(text_col))
    # "punctuation" = any char outside [a-zA-Z0-9 ] (incl. tabs/newlines and
    # non-ASCII) — the same class the DuckDB oracle counts, so the two engines
    # agree on every input, not just ASCII-only text.
    punct = F.length(F.regexp_replace(F.col(text_col), "[a-zA-Z0-9 ]", ""))
    stop_hits = F.size(
        F.array_intersect(F.array_distinct(t), F.array([F.lit(w) for w in STOPWORDS["en"]]))
    )
    mean_word_len = F.round(
        F.length(F.regexp_replace(norm, " ", ""))
        / F.greatest(n_tok, F.lit(1)),
        4,
    )
    ttr = F.round(F.size(F.array_distinct(t)) / F.greatest(n_tok, F.lit(1)), 4)
    score = F.round(
        F.least(n_tok / F.lit(64.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct / F.greatest(n_char, F.lit(1)), F.lit(1.0))) * 0.2
        + F.least(stop_hits / F.lit(4.0), F.lit(1.0)) * 0.2
        + ttr * 0.2,
        4,
    )
    return df.select(
        "doc_id",
        *keep_cols,
        n_tok.alias("n_tokens"),
        punct.alias("n_punct"),
        stop_hits.alias("stopword_hits"),
        mean_word_len.alias("mean_word_len"),
        ttr.alias("type_token_ratio"),
        score.alias("quality_score"),
    )


def _lang_score(text_norm: Column, lang: str) -> Column:
    pat = r"\b(" + "|".join(STOPWORDS[lang]) + r")\b"
    return F.size(F.regexp_extract_all(text_norm, F.lit(pat), 0))


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language identification over {en,es,de,fr} + a CJK-char
    check for zh.  Deterministic argmax with fixed tie order en>es>de>fr>und."""
    norm = normalize_text(F.col(text_col))
    scores = {lang: _lang_score(norm, lang) for lang in STOPWORDS}
    cjk = F.size(F.regexp_extract_all(F.col(text_col), F.lit("[\\x{4e00}-\\x{9fff}]"), 0))
    best = F.greatest(*scores.values())
    pred = (
        F.when(cjk > best, F.lit("zh"))
        .when(best == F.lit(0), F.lit("und"))
        .when(scores["en"] == best, F.lit("en"))
        .when(scores["es"] == best, F.lit("es"))
        .when(scores["de"] == best, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return df.select(
        "doc_id",
        "lang",
        scores["en"].alias("score_en"),
        scores["es"].alias("score_es"),
        scores["de"].alias("score_de"),
        scores["fr"].alias("score_fr"),
        pred.alias("lang_pred"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint: md5 of normalized text (whole-doc), plus a
    locality-insensitive 'sorted-unique-token' fingerprint that survives
    token reordering — the classic near-dup canonicalization."""
    norm = normalize_text(F.col(text_col))
    sorted_toks = F.array_join(F.array_sort(F.array_distinct(F.split(norm, " "))), " ")
    return df.select(
        "doc_id",
        F.md5(norm).alias("content_fp"),
        F.md5(sorted_toks).alias("bag_fp"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
    tokens_col: str | None = None,
) -> DataFrame:
    """Training-data chunking: split each document into ~chunk_tokens-token
    windows with ``overlap`` tokens of context carry-over (the standard LLM
    pretraining/RAG chunker).

    Pure column algebra: token array → slice starts via ``sequence`` with
    step (chunk_tokens - overlap) → posexplode → ``slice`` + rejoin.  Scale
    shape: map-only (no shuffle), output rows ≈ tokens/stride per doc.
    """
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    t = F.col(tokens_col) if tokens_col else tokens(F.col(text_col))
    # start indices 1, 1+stride, ... ≤ n (1-based for slice); always ≥1 chunk
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(t), F.lit(1)), F.lit(stride)
    )
    exploded = df.select(
        F.col(id_col),
        F.size(t).alias("n_tokens"),
        t.alias("__toks"),
        F.posexplode(starts).alias("chunk_id", "start"),
    )
    # drop tail starts that would produce pure-overlap chunks (start > 1 and
    # nothing new past the previous chunk's end)
    kept = exploded.filter(
        (F.col("chunk_id") == 0) | (F.col("start") + overlap <= F.col("n_tokens"))
    )
    return kept.select(
        id_col,
        "chunk_id",
        F.col("start"),
        "n_tokens",
        F.array_join(
            F.slice(F.col("__toks"), F.col("start"), F.lit(chunk_tokens)), " "
        ).alias("chunk_text"),
        F.least(
            F.lit(chunk_tokens), F.col("n_tokens") - F.col("start") + 1
        ).alias("chunk_len"),
    )


#: public-pattern PII regexes (emails / E.164-ish phones / IPv4) — the
#: redaction set every training-data pipeline starts from
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\- ]{7,}[0-9]",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
}


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace emails/phones/IPv4s with typed placeholders and count the
    redactions per doc — map-only column expressions, no Python."""
    red = F.col(text_col)
    counts = {}
    for name, pat in PII_PATTERNS.items():
        counts[name] = F.size(F.regexp_extract_all(red, F.lit(pat), 0))
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return df.select(
        "doc_id",
        red.alias("redacted_text"),
        *[counts[n].alias(f"n_{n}") for n in PII_PATTERNS],
    )


def md5_bucket(hash_col: Column, buckets: int = 100) -> Column:
    """Uniform bucket in [0, buckets) from an md5 hex column: first 8 hex
    chars → int → mod.  md5 (not xxhash64) so DuckDB oracles reproduce it
    exactly.  The single definition behind hash_split / stratified_sample /
    shuffle_shard — change it (and its oracle mirror) in one place."""
    return (F.conv(F.substring(hash_col, 1, 8), 16, 10).cast("long") % buckets).cast(
        "int"
    )


def hash_split(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_pct: int = 90,
    tokens_col: str | None = None,
) -> DataFrame:
    """Deterministic content-hash train/eval split: bucket = first 8 hex
    chars of md5(normalized text) mod 100.  Content-keyed (not row-keyed) so
    exact duplicates always land in the same split — the property that
    prevents train/eval leakage through dup documents."""
    norm = (
        F.array_join(F.col(tokens_col), " ")
        if tokens_col
        else normalize_text(F.col(text_col))
    )
    bucket = md5_bucket(F.md5(norm), 100).cast("long")
    return df.select(
        id_col,
        bucket.alias("bucket"),
        F.when(bucket < train_pct, "train").otherwise("eval").alias("split"),
    )


def _ngrams_raw(t: Column, k: int) -> Column:
    """k-grams from a token array WITHOUT dedup — the multiset form that
    repetition metrics need (shingles() dedups for Jaccard/MinHash)."""
    z = t
    # slice length = the full array size (a constant cap would silently drop
    # n-grams past it for pathologically long documents)
    for j in range(1, k):
        z = F.zip_with(
            z, F.slice(t, j + 1, F.size(t)), lambda x, y: F.concat(x, F.lit(" "), y)
        )
    return F.filter(z, lambda x: x.isNotNull())


def _max_run(arr: Column) -> Column:
    """Longest run of equal ADJACENT elements — one O(n) fold, JVM-side."""
    acc0 = F.struct(
        F.lit(" ").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )
    step = lambda acc, x: F.struct(  # noqa: E731
        x.alias("prev"),
        F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
        F.greatest(
            acc["best"],
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
        ).alias("best"),
    )
    return F.aggregate(arr, acc0, step, lambda acc: acc["best"])


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Repetition-based quality signals (the public Gopher/C4 rules shaped
    for space-delimited text): duplicate word-bigram fraction, most-common
    bigram's share, and the longest same-word run.

    Scale shape: every metric is a per-row column expression — map-only, no
    explode, no shuffle.  The most-common-bigram count uses sort-then-
    max-run (an O(L log L) in-row sort + O(L) fold) instead of a
    doc-keyed explode+groupBy, which at 100 TB would shuffle one row per
    token occurrence."""
    t = tokens(F.col(text_col))
    bi = _ngrams_raw(t, 2)
    n_bi = F.size(bi)
    n_uniq = F.size(F.array_distinct(bi))
    top_c = _max_run(F.array_sort(bi))
    safe = F.greatest(n_bi, F.lit(1))
    return df.select(
        "doc_id",
        n_bi.alias("n_bigrams"),
        n_uniq.alias("n_unique_bigrams"),
        F.round((n_bi - n_uniq) / safe, 4).alias("dup_bigram_frac"),
        top_c.alias("top_bigram_count"),
        F.round(top_c / safe, 4).alias("top_bigram_frac"),
        _max_run(t).alias("max_word_run"),
    )


def _token_occurrences(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, token) with one row per occurrence (multiset), empty tokens
    dropped — the shared input of vocabulary building, unigram-LM scoring
    and TF-IDF.  Map-only explode: no shuffle until the caller aggregates."""
    return (
        df.select(F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("token"))
        .filter(F.col("token") != "")
    )


def vocab_topk(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", top_n: int = 100
) -> DataFrame:
    """Corpus vocabulary building (the tokenizer-training precursor): for the
    ``top_n`` most frequent tokens, total occurrence count, document
    frequency, and a deterministic frequency rank (ties broken by token).

    Scale shape: two partial-aggregatable shuffles — (token, doc) then
    (token) — instead of one ``countDistinct`` pass, so map-side combine
    collapses within-doc repeats before anything moves; the top-N is
    ``orderBy().limit()`` (TakeOrderedAndProject — per-partition heaps + a
    driver merge of top_n rows, never a global sort) and the rank window
    runs over the already-limited ``top_n`` rows only."""
    per_doc = (
        _token_occurrences(df, text_col, id_col)
        .groupBy("token", "doc_id")
        .agg(F.count("*").alias("c"))
    )
    v = per_doc.groupBy("token").agg(
        F.sum("c").alias("term_count"), F.count("*").alias("doc_freq")
    )
    return vocab_rank(v, top_n)


def vocab_rank(merged: DataFrame, top_n: int) -> DataFrame:
    """Shared vocabulary tail: top-N by (term_count DESC, token) with a
    deterministic rank — ONE definition of the ordering/tie-break
    contract for batch ``vocab_topk`` and the streaming twin, so the two
    can never desynchronize from their shared oracle."""
    topped = merged.orderBy(F.col("term_count").desc(), "token").limit(top_n)
    w = Window.orderBy(F.col("term_count").desc(), "token")
    return topped.select(
        "token",
        "term_count",
        "doc_freq",
        F.row_number().over(w).alias("rank"),
    )


def unigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unigram language-model quality scoring: each document's mean (and
    minimum) log-probability under the corpus's own unigram MLE — the
    cheap, classifier-free fluency/surprisal signal every public pretraining
    pipeline variant of "perplexity filtering" reduces to at the unigram
    order.  Low mean ⇒ the doc is built from corpus-rare tokens (gibberish,
    wrong language, binary soup); an unusually low min flags a single
    out-of-place token.

    Scale shape: token occurrences collapse to (doc, token, count) in ONE
    aggregation and that compact frame is PERSISTED — the vocab, the
    corpus total and the scoring join all read the cache, so the corpus is
    scanned and tokenized exactly once (the naive occurrence-row
    formulation re-tokenizes it three times; Spark does not exchange-reuse
    across the differently-shaped aggregate branches — verified on the
    executed plan).  The corpus total rides along as a scalar broadcast
    (no driver collect); the occurrence↔vocab join shuffles by token (AQE
    broadcasts the vocab side when small); the final per-doc aggregation
    is the only other exchange.  Cache lifetime: same contract as
    ``jaccard_pairs`` — one-shot callers should ``clearCache()`` between
    calls (bench.py does) or ``caching.release_operator_caches()`` in a
    long-lived session; at 100 TB write the (doc, token, c) frame to
    storage and read it back."""
    per = track_persist(
        _token_occurrences(df, text_col, id_col)
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("c"))
    )
    return unigram_score_from_counts(per)


def unigram_score_from_counts(per: DataFrame) -> DataFrame:
    """Scoring tail over a compact (doc_id, token, c) count frame — ONE
    definition shared by batch ``unigram_logprob`` (persisted aggregate)
    and the streaming ingest twin (staged parquet partials), so the two
    cannot desynchronize from their shared oracle."""
    vocab = per.groupBy("token").agg(F.sum("c").alias("term_count"))
    total = vocab.agg(F.sum("term_count").alias("corpus_tokens"))
    scored = (
        per.join(vocab, "token")
        .crossJoin(F.broadcast(total))  # scalar broadcast, no driver collect
        .select(
            "doc_id",
            "c",
            F.log(F.col("term_count").cast("double") / F.col("corpus_tokens")).alias(
                "lp"
            ),
        )
    )
    # occurrence-weighted moments over the compact (doc, token) frame are
    # exactly the per-occurrence mean/min the oracle computes row-wise
    return scored.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.round(F.sum(F.col("c") * F.col("lp")) / F.sum("c"), 4).alias(
            "mean_logprob"
        ),
        F.round(F.min("lp"), 4).alias("min_logprob"),
    )


def bigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Bigram language-model quality scoring: per-doc mean/min log
    P(wᵢ | wᵢ₋₁) under the corpus's own bigram MLE — the order-2 sibling
    of ``unigram_logprob``.  Unigram surprisal flags rare WORDS; bigram
    surprisal flags rare TRANSITIONS (shuffled/templated text scores low
    here while its unigram profile looks normal).  MLE over observed
    bigrams needs no smoothing: every scored bigram has count ≥ 1 by
    construction.  Docs with < 2 tokens emit nothing (no bigram exists).

    Scale shape (the ``unigram_logprob`` recipe, order 2): bigram
    occurrences collapse to a compact persisted (doc, w1, w2, c) frame —
    the corpus is scanned and tokenized ONCE; the bigram vocab and the
    per-history totals aggregate off it; the scoring join shuffles the
    compact frame by bigram (AQE broadcasts the vocab side when small);
    occurrence-weighted moments equal the oracle's per-occurrence
    mean/min row-wise.  Cache lifetime: same contract as
    ``unigram_logprob`` — one-shot callers ``clearCache()`` between
    queries (bench.py does); at 100 TB stage the (doc, w1, w2, c) frame
    to storage instead (the streaming ingest twin does exactly that)."""
    per = track_persist(bigram_occurrence_counts(df, text_col, id_col))
    return bigram_score_from_counts(per)


def bigram_occurrence_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Compact (doc_id, w1, w2, c) bigram counts — one tokenizer pass,
    slice/zip bigram expansion, per-doc aggregation.  Docs with < 2
    tokens emit nothing (no bigram exists).

    The < 2-token drop is encoded in the slice LENGTH, not a filter
    (r14): ``greatest(size(t)-1, 0)`` makes short docs yield empty (or
    NULL, for NULL text) zip arrays, which ``explode`` emits nothing
    for — row-for-row the old ``filter(size(t) >= 2)`` semantics.  The
    filter form re-derived the whole tokenizer expression inside the
    pushed Filter and again in the projection (2× per row, the same
    Catalyst duplication class as the r14 histogram fix); the slice
    form evaluates it once, in the projection, where within-operator
    subexpression elimination shares it across all four slice/size
    references."""
    t = tokens(F.col(text_col))
    n1 = F.greatest(F.size(t) - 1, F.lit(0))
    pairs = F.arrays_zip(
        F.slice(t, 1, n1).alias("w1"),
        F.slice(t, 2, n1).alias("w2"),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), F.explode(pairs).alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count("*").alias("c"))
    )


def bigram_score_from_counts(per: DataFrame) -> DataFrame:
    """Scoring tail over a compact (doc_id, w1, w2, c) count frame — ONE
    definition shared by batch ``bigram_logprob`` and the streaming
    ingest twin (same oracle)."""
    vb = per.groupBy("w1", "w2").agg(F.sum("c").alias("cb"))
    vh = vb.groupBy("w1").agg(F.sum("cb").alias("ch"))
    scored = (
        per.join(vb, ["w1", "w2"])
        .join(vh, "w1")
        .select(
            "doc_id",
            "c",
            F.log(F.col("cb").cast("double") / F.col("ch")).alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.round(F.sum(F.col("c") * F.col("lp")) / F.sum("c"), 4).alias(
            "mean_logprob"
        ),
        F.round(F.min("lp"), 4).alias("min_logprob"),
    )


#: the Gopher stop-word list (Rae et al. 2021, §A1.1: "the, be, to, of,
#: and, that, have, with") — the "must contain ≥ N of these" rule
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 30,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 1,
) -> DataFrame:
    """The Gopher rule-based document filter (Rae et al. 2021, §A1.1 —
    the public heuristic suite C4/MassiveText-family pipelines start
    from): word-count band, mean-word-length band, symbol-to-character
    ratio cap, alphabetic-word fraction floor, and the stop-word
    containment rule.  Emits every signal plus the per-rule verdicts so a
    data-card can report WHICH rule dropped a document — the composed
    ``keep`` is their conjunction.

    Threshold defaults are the paper's where the synthetic corpus can
    discriminate (mean-word-length 3–10, symbol ratio ≤ 0.1, alpha ≥ 0.8)
    and adapted where it cannot: ``min_words=30`` (paper: 50; the corpus
    spans 10–99 tokens) and ``min_stop_hits=1`` (paper: 2; corpus docs
    contain 0–1 of the list).  Map-only: one projection, no shuffle."""
    t = tokens(F.col(text_col))
    norm = normalize_text(F.col(text_col))
    n_words = F.size(t)
    safe_n = F.greatest(n_words, F.lit(1))
    mwl = F.round(
        F.length(F.regexp_replace(norm, " ", "")) / safe_n, 4
    )
    n_char = F.greatest(F.length(F.col(text_col)), F.lit(1))
    sym_ratio = F.round(
        F.length(F.regexp_replace(F.col(text_col), "[a-zA-Z0-9 ]", "")) / n_char, 4
    )
    alpha_frac = F.round(
        F.size(F.filter(t, lambda w: w.rlike("[a-z]"))) / safe_n, 4
    )
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(t), F.array([F.lit(w) for w in GOPHER_STOPWORDS])
        )
    )
    ok_words = (n_words >= min_words) & (n_words <= max_words)
    ok_mwl = (mwl >= min_mean_word_len) & (mwl <= max_mean_word_len)
    ok_sym = sym_ratio <= max_symbol_ratio
    ok_alpha = alpha_frac >= min_alpha_frac
    ok_stop = stop_hits >= min_stop_hits
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        mwl.alias("mean_word_len"),
        sym_ratio.alias("symbol_ratio"),
        alpha_frac.alias("alpha_frac"),
        stop_hits.alias("stop_hits"),
        ok_words.alias("ok_words"),
        ok_mwl.alias("ok_word_len"),
        ok_sym.alias("ok_symbols"),
        ok_alpha.alias("ok_alpha"),
        ok_stop.alias("ok_stopwords"),
        (ok_words & ok_mwl & ok_sym & ok_alpha & ok_stop).alias("keep"),
    )


def tfidf_topterms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 3,
    max_df_frac: float = 0.5,
) -> DataFrame:
    """Per-document keyword extraction: the ``top_k`` terms by TF-IDF with
    the RAW inverse document frequency ``tf * N / df`` (no log damping) —
    deliberately rational arithmetic so Spark and the DuckDB oracle compute
    bit-identical doubles and the per-doc ranking can never flip on a last-
    ulp libm difference.  Terms appearing in more than ``max_df_frac`` of
    documents are dropped (the stopword guard raw IDF needs).

    Scale shape: one (token, doc) aggregation shuffle, then document
    frequency via a count window over the token partition (one exchange —
    half the movement of the groupBy+join-back alternative, which shuffles
    the same rows by token twice), then the per-doc rank window.  Three
    exchanges total, all partial-agg or window."""
    per_doc = (
        _token_occurrences(df, text_col, id_col)
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    n_docs = df.select(F.count("*").alias("n_docs"))
    wdf = Window.partitionBy("token")
    scored = (
        per_doc.withColumn("df", F.count("*").over(wdf))
        .crossJoin(F.broadcast(n_docs))  # scalar broadcast, no driver collect
        .filter(F.col("df") <= F.lit(max_df_frac) * F.col("n_docs"))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf").cast("double") * F.col("n_docs") / F.col("df"), 4
            ).alias("tfidf"),
        )
    )
    wr = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= top_k)
    )


def shingles_from_tokens(t: Column, k: int = 3) -> Column:
    """k-word shingles from a token array, via shifted-array zip_with.

    Implementation note: an index-based ``transform(sequence(...), i ->
    element_at(t, i+j))`` re-evaluates the token expression per lambda
    element in interpreted HOF mode (~k×shingle_count regex evaluations per
    row — measured 25 s for 5 000 docs).  Zipping the array against its own
    shifted copies binds ``t`` only at row level: zip_with pads the shorter
    side with nulls, concat propagates them, and the null tail is filtered —
    so the whole shingle set costs O(k) evaluations of the tokenizer."""
    z = t
    for j in range(1, k):
        z = F.zip_with(
            z, F.slice(t, j + 1, F.size(t)), lambda x, y: F.concat(x, F.lit(" "), y)
        )
    return F.array_distinct(F.filter(z, lambda x: x.isNotNull()))


def shingles(col: Column, k: int = 3) -> Column:
    """k-word shingles of normalized text (distinct), the MinHash/Jaccard
    input set.  Pure higher-order functions — no UDF."""
    return shingles_from_tokens(tokens(col), k)


def corpus_report(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-source corpus data card: doc/token volume, mean quality, exact-
    duplicate count (corpus-wide content groups, non-survivors), and
    language mix — the summary table every dataset release ships.

    Composes the existing per-doc signals (quality_score carries source/
    lang through keep_cols; the dup flag is a min-over-content-hash
    window) into ONE per-source aggregate.  Shuffles: the content-hash
    window, the doc_id join, the source aggregate — all keyed, no pair
    enumeration, volume linear in docs."""
    base = quality_score(df, text_col=text_col, keep_cols=("source", "lang"))
    fp = df.select(
        "doc_id", F.md5(normalize_text(F.col(text_col))).alias("fp")
    )
    w = Window.partitionBy("fp")
    dup = fp.withColumn(
        "is_dup", (F.col("doc_id") != F.min("doc_id").over(w)).cast("int")
    ).select("doc_id", "is_dup")
    return (
        base.join(dup, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("quality_score"), 4).alias("avg_quality"),
            F.sum("is_dup").alias("n_exact_dup"),
            F.sum((F.col("lang") == "en").cast("int")).alias("n_en"),
        )
    )


# ---------------------------------------------------------------------------
# BPE tokenizer training: the pair-count workhorse (distributed, exact
# oracle) and the bounded merge loop (driver-side over the collected
# word-frequency table — the shape every production BPE trainer uses,
# because the DISTINCT-WORD table is vocabulary-sized even at 100 TB).
# ---------------------------------------------------------------------------


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(token, n) corpus word-frequency table — the input of BPE training.
    One partial-aggregatable shuffle; everything downstream of it is
    vocabulary-sized, not corpus-sized."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bpe_pair_counts(
    df: DataFrame, text_col: str = "text", top_n: int = 50
) -> DataFrame:
    """One BPE training iteration's candidate scores: adjacent character
    pairs over the distinct-word table, weighted by word frequency —
    ``argmax pair_count`` is the merge a BPE trainer would apply.  Every
    occurrence position counts (the word "aaa" contributes "aa" twice),
    exactly the Sennrich et al. 2016 counting rule.

    JVM-side end to end: the pair explosion is a ``transform(sequence)``
    HOF over the VOCABULARY (post-aggregation), so the corpus is touched
    once by the word-frequency shuffle and the expensive part runs over
    ~1e6 rows regardless of corpus size.  Top-N via ``orderBy().limit()``
    (per-partition heaps, no global sort); rank windows over the already
    limited rows — the ``vocab_rank`` contract.

    Returns (pair, pair_count, n_words, rank): weighted count, distinct
    words containing the pair, deterministic rank (ties break on pair).
    """
    wf = word_freqs(df, text_col)
    pairs = wf.filter(F.length("token") >= 2).select(
        "token",
        "n",
        F.explode(
            F.expr("transform(sequence(1, length(token) - 1), i -> substr(token, i, 2))")
        ).alias("pair"),
    )
    agg = pairs.groupBy("pair").agg(
        F.sum("n").alias("pair_count"),
        F.countDistinct("token").alias("n_words"),
    )
    topped = agg.orderBy(F.col("pair_count").desc(), "pair").limit(top_n)
    w = Window.orderBy(F.col("pair_count").desc(), "pair")
    return topped.select(
        "pair", "pair_count", "n_words", F.row_number().over(w).alias("rank")
    )


def bpe_train(
    df: DataFrame,
    n_merges: int = 100,
    text_col: str = "text",
    max_driver_words: int = 5_000_000,
) -> list[tuple[str, str]]:
    """Byte-pair-encoding merge-rule training (Sennrich et al. 2016): the
    iterative argmax-pair/apply-merge loop, run DRIVER-SIDE over the
    collected word-frequency table.

    Deliberate architecture, not a shortcut: after ``word_freqs`` the
    problem is vocabulary-sized (≤ a few million distinct words at any
    corpus scale), and the merge loop is inherently sequential — one
    merge changes the next iteration's counts — so distributing it would
    cost ``n_merges`` vocabulary-wide shuffles for work a single process
    finishes in seconds.  Every production trainer (SentencePiece, HF
    tokenizers) collects word counts first for the same reason; Spark's
    job here is the corpus-wide counting pass, which stays distributed.

    Bounded like ``dup_clusters``: the collect is probed with
    ``limit(max_driver_words + 1)`` and OVERFLOWS LOUDLY rather than
    OOMing the driver (trim the vocabulary upstream — rare words don't
    influence early merges).  Ties break lexicographically so the merge
    sequence is deterministic across runs and partitionings.

    Returns the ordered merge list [(left, right), ...].
    """
    rows = word_freqs(df, text_col).limit(max_driver_words + 1).collect()
    if len(rows) > max_driver_words:
        raise ValueError(
            f"bpe_train: >{max_driver_words} distinct words; trim the "
            "vocabulary (e.g. min-frequency filter) before training"
        )
    vocab: dict[tuple[str, ...], int] = {
        tuple(r["token"]): r["n"] for r in rows
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        # deterministic argmax: highest count, then lexicographically
        # smallest pair
        top = max(counts.values())
        best = min(p for p, c in counts.items() if c == top)
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, n in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + n
        vocab = new_vocab
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply trained BPE merge rules (``bpe_train``'s output) and report
    per-doc tokenization statistics — the train → apply closure of the
    tokenizer family, and the fertility audit (subword tokens per word)
    every tokenizer change should be measured by before a pretraining
    run re-tokenizes 100 TB.

    Arrow ``mapInPandas`` kernel, no shuffle: merge application is the
    standard greedy lowest-rank loop (the HF/SentencePiece apply rule —
    at each step merge the pair with the smallest training rank).  Each
    DISTINCT word is encoded once per Arrow batch (memoized), so the
    per-row cost is a dict lookup; the merge list rides to executors in
    the task closure (tokenizer-sized, a few hundred KB at worst).

    Returns (doc_id, n_words, n_bpe_tokens, fertility_bp) with
    ``fertility_bp = 10000 * n_bpe_tokens div n_words``; null-text docs
    emit nothing, empty/whitespace docs emit nothing (no words).

    Not SQL-expressible (the merge loop is iterative) — rows-only in the
    oracle gate; exactness is pytested against a pure-Python reference.
    """
    from stateful_spark_streaming_spark.operators.dedup import _id_typed_schema, _py_tokens

    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode_word(word: str) -> int:
        syms = list(word)
        while len(syms) > 1:
            best_rank = None
            best_i = -1
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return len(syms)

    def kernel(batches):
        import pandas as pd

        cache: dict[str, int] = {}
        for pdf in batches:
            ids: list = []
            nw: list = []
            nb: list = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = _py_tokens(text)
                if toks is None:
                    continue
                toks = [t for t in toks if t]
                if not toks:
                    continue
                total = 0
                for t in toks:
                    n = cache.get(t)
                    if n is None:
                        n = cache[t] = encode_word(t)
                    total += n
                ids.append(doc_id)
                nw.append(len(toks))
                nb.append(total)
            yield pd.DataFrame({"doc_id": ids, "n_words": nw, "n_bpe_tokens": nb})

    out = df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        kernel, _id_typed_schema(df, id_col, "doc_id", "n_words int, n_bpe_tokens int")
    )
    return out.withColumn(
        # bigint math: 10000 * an int column wraps int32 past ~220 KB docs
        "fertility_bp",
        F.expr("(10000 * cast(n_bpe_tokens as bigint)) div n_words").cast("int")
    )


def compression_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """Per-doc zlib compression ratio — the classic repetitiveness /
    quality signal (Gopher-family pipelines drop documents that compress
    too well: boilerplate, generated spam, and repeated spans all have
    anomalously low ratios, and the signal is tokenizer-independent).

    Arrow ``mapInPandas`` kernel, map-only (zlib's deflate is C-speed and
    deterministic for a fixed level).  All-integer output:
    (doc_id, n_bytes, n_compressed, ratio_bp) with
    ``ratio_bp = 10000 * n_compressed div n_bytes`` — low ratio_bp =
    highly compressible = repetitive.  Null-text and empty docs emit
    nothing.

    Not SQL-expressible (no deflate in the oracle engine) — rows-only in
    the gate; the kernel is pytested byte-exact against direct zlib.
    """
    import zlib

    from stateful_spark_streaming_spark.operators.dedup import _id_typed_schema

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            ids: list = []
            nraw: list = []
            ncomp: list = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if text is None or (isinstance(text, float) and text != text):
                    continue
                raw = str(text).encode("utf-8")
                if not raw:
                    continue
                ids.append(doc_id)
                nraw.append(len(raw))
                ncomp.append(len(zlib.compress(raw, level)))
            yield pd.DataFrame(
                {"doc_id": ids, "n_bytes": nraw, "n_compressed": ncomp}
            )

    out = df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        kernel, _id_typed_schema(df, id_col, "doc_id", "n_bytes int, n_compressed int")
    )
    return out.withColumn(
        # bigint math: 10000 * an int column wraps int32 past ~220 KB blobs
        "ratio_bp",
        F.expr("(10000 * cast(n_compressed as bigint)) div n_bytes").cast("int")
    )
