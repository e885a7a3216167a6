"""Similarity search over embedding columns (array<float>).

Two tiers, same results contract:

- **brute-force cosine top-k** — exact baseline.  The dot product is a JVM
  higher-order expression (zip_with + aggregate): codegen'd, no Python.  The
  query side is broadcast, so the big side is never shuffled — a map-only
  scan + per-query top-k heap via window.
- **IVF (inverted-file) top-k** — the scale path: vectors are assigned to
  the nearest of C centroids at index time (one pass), queries probe only
  the nprobe nearest cells.  At 100 TB this turns a full scan into reading
  nprobe/C of the data; cells are parquet-partitionable by centroid id.
- **random-hyperplane LSH near-dup** — cosine-similar pair mining without
  the all-pairs join (see dedup.py for the text analogs).
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# Per-worker transient score-matrix budget for the exact-cosine kernels:
# slabs are sized so slab_rows × other_side_rows ≤ this many float64s
# (~64 MB).  With 32 concurrent workers that is ~2 GB of transient score
# memory on this box; on small executors the bound is what keeps the
# blocked/broadcast matmuls alive at any corpus size (see
# cosine_near_pairs — the unbounded form OOM-killed workers at 200 k).
_SCORE_BUDGET_FLOATS = 8_000_000


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def with_unit_vectors(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """L2-normalize once at index time so cosine = plain dot product later."""
    n = _norm(F.col(vec_col))
    return df.withColumn(
        "unit_vec",
        F.transform(F.col(vec_col), lambda x: x.cast("double") / n),
    )


def label_centroids(
    df: DataFrame, vec_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """Per-label centroid as (label, dim, mean_v) rows — the class-prototype
    computation behind semantic dedup buckets / cluster seeding.

    Partial-aggregated in an Arrow kernel: each batch collapses to one
    (label, dim, sum, count) row per label×dim via a numpy column sum, so
    the shuffle carries ~|labels|×dim rows per PARTITION instead of
    rows×dim exploded scalars — at 2 M × 64 that is ~640 rows/partition
    vs 128 M (measured 17 s → the kernel's one scan; at 100 TB the
    exploded shuffle is ~3× the table size and this is ~nothing).  The
    final groupBy merges partials exactly like Spark's own avg (sum and
    count combine exactly; only the float sum ORDER differs, which the
    6-dp round absorbs — same tolerance class as every GEMM kernel here).
    NULL labels form their own group, matching groupBy semantics."""
    import numpy as np

    lt = df.schema[label_col].dataType.simpleString()

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            dims = np.arange(1, X.shape[1] + 1, dtype=np.int32)
            for lv, sub in pdf.groupby(label_col, dropna=False):
                idx = sub.index.to_numpy()
                s = X[pdf.index.get_indexer(idx)].sum(0)
                yield pd.DataFrame(
                    {
                        label_col: [None if pd.isna(lv) else lv] * len(dims),
                        "dim": dims,
                        "sum_v": s,
                        "cnt": np.int64(len(idx)),
                    }
                )

    partial = df.select(label_col, vec_col).mapInPandas(
        kernel, f"{label_col} {lt}, dim int, sum_v double, cnt long"
    )
    return partial.groupBy(label_col, "dim").agg(
        F.round(F.sum("sum_v") / F.sum("cnt"), 6).alias("mean_v")
    )


def embedding_norm_stats(
    df: DataFrame, vec_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """Per-label L2-norm distribution (count/mean/min/max) — the standard
    embedding-table health check (unnormalized rows, dead vectors).  The
    norm is an in-row fold; the aggregate is one label-keyed shuffle."""
    nrm = _norm(F.col(vec_col))
    return (
        df.select(F.col(label_col), nrm.alias("nrm"))
        .groupBy(label_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("nrm"), 6).alias("mean_norm"),
            F.round(F.min("nrm"), 6).alias("min_norm"),
            F.round(F.max("nrm"), 6).alias("max_norm"),
        )
    )


def _brute_topk_scan(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    label_col: str | None = None,
):
    """Shared exact-scan stage for ``cosine_topk_bruteforce`` and
    ``hard_negatives``: broadcast the (bounded) query matrix, ONE
    Arrow-batched GEMM pass over the corpus, per-batch partial top-k —
    the global window then ranks a few hundred survivors instead of
    |corpus| × |queries| scored rows.

    Why not the crossJoin + higher-order-function dot it replaces: HOF
    expressions (zip_with + aggregate) evaluate INTERPRETED per row —
    measured 88 s at 200 k vectors and 507 s at 2 M for 20 queries
    (tools/ann_probe.py); the GEMM form is the same arithmetic in one
    BLAS call per batch.  Exactness is preserved: a global top-k row is
    top-k within every subset containing it, so per-batch top-k by the
    same (rounded-cosine desc, id asc) order loses nothing; the batch
    keeps k + 8 (slack absorbs numpy HALF_EVEN vs Spark HALF_UP rounding
    flips on exact half-ulp boundaries, which real cosines never hit).

    With ``label_col``: rows with the SAME label as the query are masked
    out (plus NULL labels on either side, matching the `<>` predicate);
    without it, the self row (neighbor id == query id) is masked.
    Emits (query_id, neighbor_id[, neg_label], raw_cos)."""
    import numpy as np

    spark = embeddings.sparkSession
    qcols = [id_col, vec_col] + ([label_col] if label_col else [])
    q_rows = queries.select(*qcols).collect()  # bounded query set
    qids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.array([r[1] for r in q_rows], dtype=np.float64)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    qlabels = [r[2] for r in q_rows] if label_col else None
    bc = spark.sparkContext.broadcast((qids, Q, qlabels))
    keep_m = k + 8

    out_fields = "query_id long, neighbor_id long"
    if label_col:
        lt = embeddings.schema[label_col].dataType.simpleString()
        out_fields += f", neg_label {lt}"
    out_fields += ", raw_cos double"

    def kernel(batches):
        import pandas as pd

        ids_q, Qn, labs_q = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            X /= np.linalg.norm(X, axis=1, keepdims=True)
            S = X @ Qn.T  # (batch, n_queries)
            if labs_q is not None:
                labs_b = pdf[label_col].tolist()
                mask = np.array(
                    [
                        [
                            lb is None or lq is None or lb == lq
                            for lq in labs_q
                        ]
                        for lb in labs_b
                    ]
                )
                S = np.where(mask, -np.inf, S)
            else:
                S = np.where(ids[:, None] == ids_q[None, :], -np.inf, S)
            # selection by the FINAL order (6-dp rounded desc, id asc)
            R = np.round(S, 6)
            for qi in range(len(ids_q)):
                sel = np.lexsort((ids, -R[:, qi]))[:keep_m]
                sel = sel[np.isfinite(S[sel, qi])]
                if not len(sel):
                    continue
                row = {
                    "query_id": np.full(len(sel), ids_q[qi]),
                    "neighbor_id": ids[sel],
                }
                if labs_q is not None:
                    row["neg_label"] = pdf[label_col].to_numpy()[sel]
                row["raw_cos"] = S[sel, qi]
                yield pd.DataFrame(row)

    return embeddings.select(*qcols).mapInPandas(kernel, out_fields)


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: broadcast queries × ONE GEMM corpus scan with
    per-batch partial top-k (see ``_brute_topk_scan``); the final window
    ranks only the per-batch survivors.

    Ties at the k-th neighbor break on neighbor id (deterministic)."""
    cand = _brute_topk_scan(embeddings, queries, k, id_col, vec_col)
    scored = cand.withColumn("cosine", F.round("raw_cos", 6))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def ivf_build(
    embeddings: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 3,
    train_sample: int = 10_000,
) -> tuple[DataFrame, list[list[float]]]:
    """Build an IVF index: k-means centroids trained on a BOUNDED sample
    (first ``train_sample`` vectors by id — deterministic, driver memory
    capped at train_sample × dim floats regardless of corpus size), then one
    distributed Arrow-vectorized pass assigns every vector to its nearest
    cell.  Sample-trained k-means is the standard IVF recipe (faiss trains
    on ~max(10k, 39×C) points); exact Lloyd over 100 TB would be pointless.

    SIZING ``n_centroids`` — why the benched/probed value is a pinned 8
    and deliberately NOT a corpus-derived rule (the n_planes/n_tables
    treatment does not transfer here): IVF's recall comes from CLUSTER
    STRUCTURE — a query's true neighbors concentrating in few cells —
    and how much structure a corpus has is a MEASUREMENT, not a formula.
    Even on the isotropic test corpus, angular proximity correlates with
    Euclidean cell membership, so recall at the benched (C=8, nprobe=2)
    measures well ABOVE the random-cell floor nprobe/C: 0.65 at 2 k
    vectors and ~0.7-0.75 at nprobe=3 for a 25-37% scanned fraction,
    re-measured at the 2 M depth with balanced cells (r13 probe,
    SCALE.md; pytest pins the floor and the nprobe=C exactness
    fallback).  Raising C at fixed nprobe cuts the read fraction and
    recall together along a corpus-dependent curve; the production rule
    is the standard C ≈ √N (bounded below by layout health, ~tens of MB
    per cell partition) with nprobe set from a recall probe on held-out
    queries — a data-dependent measurement this synthetic corpus cannot
    stand in for, which is exactly why the knob stays explicit instead
    of self-sizing to a formula the data would falsify.
    """
    import numpy as np

    rows = (
        embeddings.orderBy(id_col).limit(train_sample).select(vec_col).collect()
    )
    X = np.array([r[0] for r in rows], dtype=np.float64)
    cents = X[:n_centroids].copy()  # deterministic init: first C by id
    for _ in range(iters):
        d2 = (
            (X**2).sum(1)[:, None] - 2.0 * X @ cents.T + (cents**2).sum(1)[None, :]
        )
        a = d2.argmin(1)
        for c in range(n_centroids):
            members = X[a == c]
            if len(members):
                cents[c] = members.mean(0)

    assigned = _assign_cells(embeddings, cents, id_col, vec_col)
    return assigned, [list(map(float, c)) for c in cents]


def _assign_cells(df: DataFrame, cents, id_col: str, vec_col: str) -> DataFrame:
    """Nearest-centroid assignment: broadcast the C × dim centroid matrix,
    one map-only mapInPandas stage with a blocked numpy distance argmin —
    Arrow-vectorized, no shuffle, no per-row Python."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import IntegerType, StructField, StructType

    cents = np.asarray(cents, dtype=np.float64)
    bc = df.sparkSession.sparkContext.broadcast(cents)
    # fresh StructType — StructType.add MUTATES the df's cached schema object
    out_schema = StructType(list(df.schema.fields) + [StructField("cell", IntegerType())])

    def kernel(batches):
        C = bc.value
        c_norms = (C**2).sum(1)[None, :]
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            d2 = (X**2).sum(1)[:, None] - 2.0 * X @ C.T + c_norms
            out = pdf.copy()
            out["cell"] = d2.argmin(1).astype("int32")
            yield out

    return df.mapInPandas(kernel, out_schema)


def ivf_write_index(
    assigned: DataFrame, cents: list[list[float]], path: str, vec_col: str = "embedding"
) -> None:
    """Persist an IVF index: cell assignments as cell-partitioned parquet
    (probing then prunes whole partitions at the scan — the 100 TB read
    path reads only nprobe/C of the files) plus a centroid sidecar."""
    import json
    import os

    # repartition on cell first: each task then writes into exactly one cell
    # directory (file hygiene — otherwise every task spills a sliver into
    # every cell and the probe-side scan drowns in tiny files)
    assigned.repartition("cell").write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(path, "cells")
    )
    with open(os.path.join(path, "centroids.json"), "w") as f:
        json.dump(cents, f)


def ivf_load_index(spark, path: str) -> tuple[DataFrame, list[list[float]]]:
    """Load a persisted IVF index written by ``ivf_write_index``.  Runs
    generation recovery first: a crash mid-``ivf_retrain`` leaves the
    index as ``.tmp``/``.old`` generations, which this repairs (forward
    if the new generation committed, rollback otherwise)."""
    import json
    import os

    from stateful_spark_streaming_spark.generations import recover_generation

    # clean=False: loading is a READ — it must repair a missing live dir
    # but never delete a concurrent ivf_retrain's in-progress .tmp
    recover_generation(path, clean=False)
    with open(os.path.join(path, "centroids.json")) as f:
        cents = json.load(f)
    assigned = spark.read.parquet(os.path.join(path, "cells"))
    return assigned, cents


def ivf_build_or_load(
    embeddings: DataFrame,
    path: str,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    """Build-once semantics: load the index at ``path`` if present, else
    train + persist it there.  This is how an IVF index is meant to be used —
    train at ingest time, probe at query time."""
    import os

    if os.path.exists(os.path.join(path, "centroids.json")):
        return ivf_load_index(embeddings.sparkSession, path)
    assigned, cents = ivf_build(embeddings, n_centroids, id_col, vec_col)
    ivf_write_index(assigned, cents, path, vec_col)
    return ivf_load_index(embeddings.sparkSession, path)


def _ivf_assign_and_append(
    new_vectors: DataFrame,
    path: str,
    cents,
    stored_cols: list[str],
    id_col: str,
    vec_col: str,
) -> None:
    """Write half of ``ivf_append``: assign under the given (frozen)
    centroids and append to the cell-partitioned parquet — split out so a
    per-micro-batch streaming caller loads centroids + stored schema ONCE
    instead of re-reading the sidecar and re-inferring the index schema
    every trigger (ADVICE r5).

    The appended frame is PROJECTED to the stored index schema, and a
    column-set mismatch raises: parquet schema inference resolves
    mixed-schema files by whichever file wins, so an extra or missing
    column would silently null out or drop data on read."""
    import numpy as np

    assigned_new = _assign_cells(new_vectors, np.asarray(cents), id_col, vec_col)
    if set(assigned_new.columns) != set(stored_cols):
        raise ValueError(
            f"ivf_append schema mismatch: new vectors produce columns "
            f"{sorted(assigned_new.columns)} but the index at {path} stores "
            f"{sorted(stored_cols)} — project the input to the index schema"
        )
    # same file-hygiene repartition as the build-time write; stored column
    # order so every file in cells/ is layout-identical
    assigned_new.select(*stored_cols).repartition("cell").write.mode(
        "append"
    ).partitionBy("cell").parquet(os.path.join(path, "cells"))


def ivf_append(
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    """Incremental index maintenance: assign NEW vectors to their nearest
    existing cell (centroids FROZEN — the standard faiss ``add`` recipe:
    retraining on every insert would invalidate the whole layout, and
    k-means cells drift slowly, so production IVF appends under frozen
    centroids and retrains on a cadence — ``ivf_retrain``) and append
    them to the cell-partitioned parquet.  Probes immediately see
    old + new vectors; the assignment pass is the same Arrow kernel the
    build uses, so an appended vector lands in exactly the cell a full
    rebuild (with these centroids) would give it — pytested as
    append ≡ rebuild-assignment.

    Caller-side id contract: appends are NOT deduplicated here — a direct
    caller re-appending an id creates a duplicate row in the index
    (the streaming ingest path dedupes on its returned probe frame, and
    ``ivf_retrain`` folds duplicates physically).  The new frame must
    carry exactly the stored index columns (checked; see
    ``_ivf_assign_and_append``).

    Returns the reloaded (assigned, centroids) pair.  Scale shape:
    map-only assignment over the new batch + one cell-partitioned append
    write; nothing rewrites existing cells, nothing collects.  NOT a
    catalog query by design: gate queries must be pure functions of the
    sf_dir fixture, and an appending query would mutate the shared
    per-corpus index across runs."""
    import json
    import os

    with open(os.path.join(path, "centroids.json")) as f:
        cents = json.load(f)
    spark = new_vectors.sparkSession
    stored_cols = list(spark.read.parquet(os.path.join(path, "cells")).columns)
    _ivf_assign_and_append(new_vectors, path, cents, stored_cols, id_col, vec_col)
    return ivf_load_index(spark, path)


def ivf_retrain(
    spark,
    path: str,
    n_centroids: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 3,
    train_sample: int = 10_000,
) -> tuple[DataFrame, list[list[float]]]:
    """The OTHER half of the append-then-retrain lifecycle (faiss recipe:
    ``add`` continuously under frozen centroids, retrain on a cadence):
    rebuild the centroids from the CURRENT grown corpus, reassign every
    vector, and atomically swap in the new index generation.

    Also the physical fold for appended state: vectors are id-deduped
    before retraining, so replayed streaming appends and the append log
    itself collapse into one clean cell-partitioned generation (the
    "offline compaction" the ingest path's docstring defers to).

    Swap protocol: the new generation is fully materialized at
    ``<path>.tmp`` BEFORE the live directory is touched (the rebuild
    reads the live index lazily — overwriting in place would corrupt the
    self-read), stamped with a ``_SUCCESS`` commit marker covering both
    the cells and the centroid sidecar, then promoted through
    ``generations.swap_generation`` — rename-only, with crash recovery
    (forward to a complete new generation, else rollback to the old one)
    on the next retrain or load.

    Recall drift under frozen-vs-retrained centroids is measured in
    pytest (tests/test_similarity_geometry.py) — retraining exists
    precisely because append-only drift degrades cell balance as the
    corpus distribution moves."""
    import shutil

    from stateful_spark_streaming_spark.generations import (
        recover_generation,
        swap_generation,
    )

    recover_generation(path)
    assigned, cents = ivf_load_index(spark, path)
    vectors = assigned.drop("cell").dropDuplicates([id_col])
    n = n_centroids or len(cents)
    new_assigned, new_cents = ivf_build(
        vectors, n, id_col, vec_col, iters=iters, train_sample=train_sample
    )
    tmp = path + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    ivf_write_index(new_assigned, new_cents, tmp, vec_col)  # materializes
    # commit marker LAST, after both the cells parquet and the sidecar:
    # swap_generation refuses to promote a generation without it
    open(os.path.join(tmp, "_SUCCESS"), "w").close()
    swap_generation(path)
    return ivf_load_index(spark, path)


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: tuple[DataFrame, list[list[float]]] | None = None,
) -> DataFrame:
    """Approximate top-k: probe only the nprobe nearest cells per query.

    Pass ``index`` (from ``ivf_build_or_load``) to probe a persisted index;
    without it the index is trained inline (small-corpus convenience).
    Recall is tested against the brute-force baseline in pytest (rows-only
    check for the driver: approximate by construction).

    Probe shape: the bounded query set collects driver-side, its probe
    cells come from one numpy distance matrix, the index scan PRUNES to
    the union of probed cells (static `isin` on the cell partition
    column — the read-prune the cell layout exists for), and scoring is
    the same Arrow GEMM kernel as ``_brute_topk_scan`` with a
    (cell × query) boolean LUT standing in for the cell equi-join — the
    candidate set is identical, but nothing evaluates per row.  The
    cell-join + HOF-dot form this replaces measured 72.7 s at 2 M
    vectors (nprobe 3/8) with the time in the interpreted dot, not IO."""
    import numpy as np

    spark = embeddings.sparkSession
    if index is not None:
        assigned, cents = index
    else:
        assigned, cents = ivf_build(embeddings, n_centroids, id_col, vec_col)
    cents_np = np.asarray(cents, dtype=np.float64)
    n_cells = len(cents_np)

    q_rows = queries.select(id_col, vec_col).collect()  # bounded query set
    qids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Qraw = np.array([r[1] for r in q_rows], dtype=np.float64)
    # probe cells from raw (un-normalized) query vectors — identical to
    # _assign_probe_cells' euclidean argmin semantics
    d2 = (
        (Qraw**2).sum(1)[:, None]
        - 2.0 * Qraw @ cents_np.T
        + (cents_np**2).sum(1)[None, :]
    )
    nprobe = min(nprobe, n_cells)
    probe = np.argsort(d2, axis=1)[:, :nprobe]  # (nq, nprobe)
    lut = np.zeros((n_cells, len(qids)), dtype=bool)
    for qi in range(len(qids)):
        lut[probe[qi], qi] = True
    probed_cells = sorted({int(c) for row in probe for c in row})

    Qn = Qraw / np.linalg.norm(Qraw, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((qids, Qn, lut))
    keep_m = k + 8

    def kernel(batches):
        ids_q, Q, cell_lut = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            cells = pdf["cell"].to_numpy()
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            X /= np.linalg.norm(X, axis=1, keepdims=True)
            S = X @ Q.T
            mask = cell_lut[cells] & (ids[:, None] != ids_q[None, :])
            S = np.where(mask, S, -np.inf)
            R = np.round(S, 6)
            for qi in range(len(ids_q)):
                sel = np.lexsort((ids, -R[:, qi]))[:keep_m]
                sel = sel[np.isfinite(S[sel, qi])]
                if not len(sel):
                    continue
                yield pd.DataFrame(
                    {
                        "query_id": np.full(len(sel), ids_q[qi]),
                        "neighbor_id": ids[sel],
                        "raw_cos": S[sel, qi],
                    }
                )

    cand = (
        assigned.filter(F.col("cell").isin(probed_cells))
        .select(id_col, vec_col, "cell")
        .mapInPandas(kernel, "query_id long, neighbor_id long, raw_cos double")
    )
    scored = cand.withColumn("cosine", F.round("raw_cos", 6))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def _assign_probe_cells(
    queries: DataFrame, cents, id_col: str, vec_col: str, nprobe: int
) -> DataFrame:
    """(query_id, qvec, cell) rows — one per probed cell per query."""
    d2 = [
        F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(float(v)) for v in cents[c]]),
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias(f"d{c}")
        for c in range(len(cents))
    ]
    dist_struct = F.array(
        *[
            F.struct(F.col(f"d{c}").alias("d"), F.lit(c).alias("cell"))
            for c in range(len(cents))
        ]
    )
    return (
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), *d2
        )
        .withColumn("probes", F.slice(F.array_sort(dist_struct), 1, nprobe))
        .select(
            "query_id", "qvec", F.explode(F.col("probes.cell")).alias("cell")
        )
    )


def sq8_encode(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scalar int8 quantization: each dimension scaled to [0, 255] by its
    corpus-wide min/max — the simplest 4× embedding compression (float32 →
    uint8), and unlike PQ it is EXACTLY derivable in SQL, so the catalog
    entry carries a full DuckDB oracle.

    Scale shape: one posexplode aggregation computes the 2·dim stats
    (64-key shuffle with map-side partials — volume is the vectors read
    once), the dim-indexed stats broadcast (driver holds 2·dim doubles,
    bounded by dimensionality not corpus size), then a single map-only
    Arrow kernel quantizes.  The kernel mirrors the engines' arithmetic
    exactly: same (x − mn) / (mx − mn) * 255 evaluation order, and
    floor(v + 0.5) — which equals round-half-up for the non-negative
    scaled values (numpy's own round is banker's and would diverge).

    ``codes`` is emitted as a ','-joined STRING, not array<int>: the
    catalog gate canonicalizes results through pandas, whose hash/sort
    machinery cannot handle list cells — a scalar column is the
    cross-engine-checkable form (split on ',' to recover the vector)."""
    import numpy as np
    import pandas as pd

    from .dedup import _id_typed_schema

    u = embeddings.select(
        F.col(id_col), F.posexplode(vec_col).alias("dim0", "v")
    ).select(id_col, "dim0", F.col("v").cast("double").alias("v"))
    st = (
        u.groupBy("dim0")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .orderBy("dim0")
        .collect()
    )
    mn = np.array([r.mn for r in st])
    mx = np.array([r.mx for r in st])
    bc = embeddings.sparkSession.sparkContext.broadcast((mn, mx))

    def kernel(batches):
        mn_, mx_ = bc.value
        ok = mx_ > mn_
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            # denominator guarded where mx == mn: np.where alone would
            # still evaluate the 0/0 branch and spam RuntimeWarnings
            scaled = np.where(
                ok, (X - mn_) / np.where(ok, mx_ - mn_, 1.0) * 255.0, 0.0
            )
            codes = np.floor(scaled + 0.5).astype(np.int32)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "codes": [",".join(map(str, row)) for row in codes],
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        kernel, _id_typed_schema(embeddings, id_col, id_col, "codes string")
    )


def pq_train(
    embeddings: DataFrame,
    m: int = 8,
    ks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 5,
    train_sample: int = 10_000,
) -> list[list[list[float]]]:
    """Train product-quantization codebooks (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): L2-normalize, split the
    dimension into ``m`` subspaces, k-means with ``ks`` codewords per
    subspace — on the same bounded deterministic sample recipe as
    ``ivf_build`` (first ``train_sample`` by id; driver memory capped
    regardless of corpus size).  Returns ``m`` codebooks of ks × (dim/m).

    PQ is the memory-bound half of the ANN scale story: IVF prunes WHICH
    vectors are read, PQ shrinks WHAT is held — 64 float32 dims (256 B)
    become m=8 nibble-codes (8 B, 32× smaller), so a 10⁹-vector corpus'
    codes fit in cluster memory while the raw vectors never could."""
    import numpy as np

    rows = embeddings.orderBy(id_col).limit(train_sample).select(vec_col).collect()
    X = np.array([r[0] for r in rows], dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = []
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        cents = S[:ks].copy()  # deterministic init, as in ivf_build
        for _ in range(iters):
            d2 = (S**2).sum(1)[:, None] - 2.0 * S @ cents.T + (cents**2).sum(1)[None, :]
            a = d2.argmin(1)
            for c in range(ks):
                members = S[a == c]
                if len(members):
                    cents[c] = members.mean(0)
        books.append([list(map(float, c)) for c in cents])
    return books


def pq_encode(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, codes, *keep_cols) — each vector compressed to ``m`` codebook
    indices.  Broadcast codebooks, one map-only Arrow pass, argmin per
    subspace on the L2-normalized vector: no shuffle, no per-row Python.
    ``keep_cols`` ride through unchanged (e.g. the IVF ``cell`` column for
    the IVFADC composition)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    B = np.asarray(codebooks, dtype=np.float64)  # (m, ks, dsub)
    bc = embeddings.sparkSession.sparkContext.broadcast(B)
    in_fields = {f.name: f for f in embeddings.schema.fields}
    out_schema = StructType(
        [in_fields[id_col], StructField("codes", ArrayType(IntegerType()))]
        + [in_fields[c] for c in keep_cols]
    )

    def kernel(batches):
        cb = bc.value
        m, ks, dsub = cb.shape
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            codes = np.empty((len(X), m), dtype=np.int32)
            for j in range(m):
                S = X[:, j * dsub : (j + 1) * dsub]
                C = cb[j]
                d2 = (S**2).sum(1)[:, None] - 2.0 * S @ C.T + (C**2).sum(1)[None, :]
                codes[:, j] = d2.argmin(1)
            out = {id_col: pdf[id_col], "codes": list(codes)}
            for c in keep_cols:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    return embeddings.select(id_col, vec_col, *keep_cols).mapInPandas(
        kernel, out_schema
    )


def pq_reconstruction_mse(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, mse) — per-vector squared reconstruction error of the PQ code
    against the L2-normalized original.  The quantization-quality metric:
    more/larger codebooks must drive it down (pytested)."""
    import numpy as np
    import pandas as pd

    B = np.asarray(codebooks, dtype=np.float64)
    bc = embeddings.sparkSession.sparkContext.broadcast(B)

    def kernel(batches):
        cb = bc.value
        m, ks, dsub = cb.shape
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            err = np.zeros(len(X))
            for j in range(m):
                S = X[:, j * dsub : (j + 1) * dsub]
                C = cb[j]
                d2 = (S**2).sum(1)[:, None] - 2.0 * S @ C.T + (C**2).sum(1)[None, :]
                err += d2.min(1)
            yield pd.DataFrame({id_col: pdf[id_col], "mse": err / X.shape[1]})

    from .dedup import _id_typed_schema

    return embeddings.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        kernel, _id_typed_schema(embeddings, id_col, id_col, "mse double")
    )


_ADC_EMPTY_SCHEMA = "query_id long, rank int, neighbor_id long, approx_cosine double"


def _adc_lut(q_rows, codebooks_np):
    """(qids, LUT) from collected query rows: L2-normalize, then
    LUT[q, j, c] = ||Q[q] subspace j − codeword c||² — the shared ADC
    preamble of ``pq_topk`` and ``ivfpq_topk`` (and the raw query matrix,
    which IVF additionally needs for cell probing)."""
    import numpy as np

    mm, ks_, dsub = codebooks_np.shape
    qids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Qraw = np.array([r[1] for r in q_rows], dtype=np.float64)
    Q = Qraw / np.maximum(np.linalg.norm(Qraw, axis=1, keepdims=True), 1e-12)
    lut = np.empty((len(Q), mm, ks_))
    for j in range(mm):
        S = Q[:, j * dsub : (j + 1) * dsub]
        C = codebooks_np[j]
        lut[:, j, :] = (
            (S**2).sum(1)[:, None] - 2.0 * S @ C.T + (C**2).sum(1)[None, :]
        )
    return qids, Qraw, lut


def _adc_finish(cand: DataFrame, k: int) -> DataFrame:
    """Shared ADC tail: drop self-matches, per-query rank window with the
    deterministic (d², neighbor_id) tie-break, report approx_cosine =
    1 − d²/2 (valid on unit vectors).  Keeping this in ONE place is what
    the full-probe ≡ pq_topk exactness anchor rests on."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("neighbor_id").asc()
    )
    return (
        cand.filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "neighbor_id",
            F.round(F.lit(1.0) - F.col("d2") / F.lit(2.0), 6).alias("approx_cosine"),
        )
    )


def pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    ks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Approximate top-k by asymmetric distance computation (ADC) over PQ
    codes: each query precomputes an m × ks lookup table of subspace
    distances to every codeword; a corpus vector's distance is then m
    table lookups on its codes — no float vector is ever touched at query
    time.  On unit vectors ‖q−x‖² = 2 − 2·cos, so results are reported as
    ``approx_cosine = 1 − d²/2`` and rank-compatible with the exact
    cosine operators.

    Scale shape: queries (bounded) broadcast as LUT tensors; ONE map-only
    Arrow pass over the codes emits each partition's local top-k per query
    (shuffle volume = partitions × queries × k rows, never the corpus);
    a final per-query window keeps the global top-k.  Composable with IVF
    (probe cells, then ADC inside them); approximate by construction →
    rows-only at the gate, recall pytested against the brute-force exact
    baseline."""
    import numpy as np
    import pandas as pd

    if codebooks is None:
        codebooks = pq_train(embeddings, m=m, ks=ks, id_col=id_col, vec_col=vec_col)
    B = np.asarray(codebooks, dtype=np.float64)  # (m, ks, dsub)

    spark = embeddings.sparkSession
    q_rows = queries.select(id_col, vec_col).collect()  # bounded query set
    if not q_rows:  # empty query set: empty result, not a 1-D numpy crash
        return spark.createDataFrame([], _ADC_EMPTY_SCHEMA)
    qids, _qraw, lut = _adc_lut(q_rows, B)
    bc = spark.sparkContext.broadcast((qids, lut))

    codes = pq_encode(embeddings, codebooks, id_col=id_col, vec_col=vec_col)

    def kernel(batches):
        qids_, lut_ = bc.value
        nq = len(qids_)
        for pdf in batches:
            if not len(pdf):
                continue
            Cd = np.array(pdf["codes"].tolist(), dtype=np.int64)  # (n, m)
            ids = pdf[id_col].to_numpy()
            # D[q, i] = Σ_j LUT[q, j, codes[i, j]]
            D = np.zeros((nq, len(Cd)))
            for j in range(lut_.shape[1]):
                D += lut_[:, j, Cd[:, j]]
            kk = min(k + 1, len(Cd))  # +1: self may be among the candidates
            part = np.argpartition(D, kk - 1, axis=1)[:, :kk]
            out_q, out_i, out_d = [], [], []
            for qi in range(nq):
                out_q.extend([qids_[qi]] * kk)
                out_i.extend(ids[part[qi]])
                out_d.extend(D[qi, part[qi]])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_i, "d2": out_d}
            )

    cand = codes.mapInPandas(kernel, "query_id long, neighbor_id long, d2 double")
    return _adc_finish(cand, k)


def ivfpq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    m: int = 8,
    ks: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: tuple[DataFrame, list[list[float]]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """IVFADC — the faiss-style composition of both index structures:
    IVF decides WHICH vectors to read (queries probe only the ``nprobe``
    nearest cells), PQ-ADC decides HOW they are scored (m lookup-table
    adds per candidate, no float vector touched at query time).  This is
    the standard billion-scale ANN serving shape.

    Scale shape: the cell-partitioned persisted index (``ivf_build_or_
    load``) means the scan reads only the probed partitions at 100 TB;
    here the probe set is applied as a broadcast per-query cell mask
    inside the same single map-only ADC pass as ``pq_topk`` — still no
    join, still no corpus shuffle, one per-query window at the end.
    Exactness anchor (pytested): with ``nprobe = n_centroids`` and shared
    codebooks, IVFADC ≡ plain ``pq_topk``."""
    import numpy as np
    import pandas as pd

    if index is not None:
        assigned, cents = index
    else:
        assigned, cents = ivf_build(embeddings, n_centroids, id_col, vec_col)
    cents_np = np.asarray(cents, dtype=np.float64)
    if codebooks is None:
        codebooks = pq_train(embeddings, m=m, ks=ks, id_col=id_col, vec_col=vec_col)
    B = np.asarray(codebooks, dtype=np.float64)

    spark = embeddings.sparkSession
    q_rows = queries.select(id_col, vec_col).collect()  # bounded query set
    if not q_rows:  # empty query set: empty result, not a 1-D numpy crash
        return spark.createDataFrame([], _ADC_EMPTY_SCHEMA)
    qids, Qraw, lut = _adc_lut(q_rows, B)
    # probe cells on the RAW query vector (the IVF cells were trained on
    # raw vectors — mirrors _assign_probe_cells); the LUT is unit-vector
    d2c = (
        (Qraw**2).sum(1)[:, None]
        - 2.0 * Qraw @ cents_np.T
        + (cents_np**2).sum(1)[None, :]
    )
    probe = np.argsort(d2c, axis=1)[:, :nprobe]  # (nq, nprobe)
    bc = spark.sparkContext.broadcast((qids, lut, probe))

    codes = pq_encode(
        assigned, codebooks, id_col=id_col, vec_col=vec_col, keep_cols=("cell",)
    )

    def kernel(batches):
        qids_, lut_, probe_ = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            Cd = np.array(pdf["codes"].tolist(), dtype=np.int64)
            ids = pdf[id_col].to_numpy()
            cells = pdf["cell"].to_numpy()
            out_q, out_i, out_d = [], [], []
            for qi in range(len(qids_)):
                mask = np.isin(cells, probe_[qi])
                if not mask.any():
                    continue
                sub = Cd[mask]
                d = np.zeros(len(sub))
                for j in range(lut_.shape[1]):
                    d += lut_[qi, j, sub[:, j]]
                kk = min(k + 1, len(sub))
                part = np.argpartition(d, kk - 1)[:kk]
                out_q.extend([qids_[qi]] * kk)
                out_i.extend(ids[mask][part])
                out_d.extend(d[part])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_i, "d2": out_d}
            )

    cand = codes.mapInPandas(kernel, "query_id long, neighbor_id long, d2 double")
    return _adc_finish(cand, k)


def cosine_near_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_broadcast_vectors: int = 2_000_000,
) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ τ, exact all-pairs form.

    Two exact tiers by corpus size (``cosine_near_pairs.last_tier`` records
    which ran, mirroring ``dup_clusters``):

    - ≤ ``max_broadcast_vectors``: the (unit-normalized) corpus matrix is
      broadcast; each partition computes a blocked numpy matmul against it
      (Arrow batches, no per-row Python) — the standard exact-ANN layout.
    - larger: block-partitioned pairwise matmul — the corpus is hashed into
      √-scale blocks, every unordered block pair is co-grouped once, and
      each group multiplies two bounded matrices.  Nothing transits the
      driver and nothing is broadcast, so the former 2 M-vector driver
      funnel is gone; the quadratic FLOP count remains (it is the exact
      problem), so prefer ``cosine_near_pairs_lsh`` when approximate recall
      is acceptable at scale.

    An all-pairs ``join + per-pair aggregate`` formulation measured ~7×
    slower (interpreted HOF dot product per pair).

    Transient-memory bound (the defect tools/ann_probe.py caught at the
    200 k-vector probe): the score matrix is never materialized whole —
    both tiers matmul in row SLABS of ``_SCORE_BUDGET_FLOATS // corpus``
    rows, so per-worker transient memory is ~64 MB regardless of corpus
    size.  Without the slabbing, a 6 k-row Arrow batch × 200 k corpus
    built a 10 GB float64 score per worker and the OS OOM-killed all 32
    workers (measured: every task lost, job dead — not slow, DEAD).
    """
    import numpy as np
    import pandas as pd

    spark = embeddings.sparkSession
    # size probe: a column-pruned limit+1 count — the BROADCAST tier (the
    # common case) must not pay a full evaluation of an expensive upstream
    # plan just to learn the tier; the blocked branch re-counts for
    # n_blocks, where a second pass is negligible next to the quadratic
    # matmul it sizes.
    n = embeddings.select(id_col).limit(max_broadcast_vectors + 1).count()
    if n > max_broadcast_vectors:
        # distributed exact tier: block-partitioned pairwise matmul — no
        # driver funnel, no broadcast of the corpus (VERDICT r3 stretch #8).
        cosine_near_pairs.last_tier = "blocked"
        return _cosine_near_pairs_blocked(
            embeddings, threshold, id_col, vec_col
        )
    cosine_near_pairs.last_tier = "broadcast"
    pdf_all = embeddings.select(id_col, vec_col).toPandas()
    ids_all = pdf_all[id_col].to_numpy()
    m = np.array(pdf_all[vec_col].tolist(), dtype=np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids_all, m))

    # captured as a VALUE so workers (which re-import this module and
    # would otherwise see their own copy of the global) honor the
    # driver-side setting — also what makes the slab path testable
    budget = _SCORE_BUDGET_FLOATS

    def kernel(batches):
        ids_b, mat = bc.value
        slab = max(1, budget // max(1, len(ids_b)))
        for pdf in batches:
            ids_a = pdf[id_col].to_numpy()
            # bulk tolist() → ndarray: one C-level conversion, no per-row map
            a = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            a /= np.linalg.norm(a, axis=1, keepdims=True)
            # slab the matmul: score memory is slab × corpus, never
            # batch × corpus (see docstring — unbounded, this OOM-killed
            # workers at the 200 k probe)
            for lo in range(0, len(a), slab):
                s = a[lo:lo + slab] @ mat.T
                # prefilter margin = half-ulp of the 6-dp rounding plus
                # slack, so raw values that would round UP to the threshold
                # are never dropped before the authoritative post-rounding
                # Spark filter
                ii, jj = np.nonzero(
                    (s >= threshold - 1e-6)
                    & (ids_a[lo:lo + slab, None] < ids_b[None, :])
                )
                yield pd.DataFrame(
                    {
                        "id_a": ids_a[lo + ii],
                        "id_b": ids_b[jj],
                        "raw_cos": s[ii, jj],
                    }
                )

    pairs = (
        embeddings.repartition(spark.sparkContext.defaultParallelism)
        .select(id_col, vec_col)
        .mapInPandas(kernel, "id_a long, id_b long, raw_cos double")
    )
    # rounding via Spark (HALF_UP) so semantics match the non-numpy operators
    return (
        pairs.withColumn("cosine", F.round("raw_cos", 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


#: which exact tier the most recent cosine_near_pairs call took
cosine_near_pairs.last_tier = None


def _cosine_near_pairs_blocked(
    embeddings: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
    block_rows: int = 200_000,
    n_blocks: int | None = None,
) -> DataFrame:
    """Distributed exact all-pairs cosine: hash ids into ``n_blocks``
    blocks, replicate each block once per partner block, and matmul every
    unordered block pair (i ≤ j) in its own ``applyInPandas`` group.

    Scale shape: per-group memory is two ≤ ``block_rows`` × dim matrices
    (the only bound that matters — no broadcast, no driver collect); each
    unordered pair (x, y) lands in exactly ONE group (the sorted block
    pair), so ``id_a < id_b`` inside the kernel dedups globally with no
    post-shuffle distinct.  Shuffle volume is corpus × (n_blocks + 1) rows
    — the replication factor every blocked all-pairs scheme pays.  The
    combos side is a ~n_blocks²-row literal frame, broadcast."""
    import numpy as np
    import pandas as pd

    spark = embeddings.sparkSession
    if n_blocks is None:
        # a full count, NOT the caller's capped limit(max+1) tier probe —
        # that probe undercounts above the cap and would under-block
        n_rows = embeddings.select(id_col).count()
        n_blocks = max(2, -(-n_rows // block_rows))
    base = embeddings.select(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks))
        .cast("int")
        .alias("_blk"),
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
    )
    combos = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)],
        ["ba", "bb"],
    )
    left = base.join(
        F.broadcast(combos), base["_blk"] == combos["ba"]
    ).select("ba", "bb", F.lit(0).alias("_side"), "_id", "_vec")
    off_diag = combos.filter(F.col("ba") != F.col("bb"))
    right = base.join(
        F.broadcast(off_diag), base["_blk"] == off_diag["bb"]
    ).select("ba", "bb", F.lit(1).alias("_side"), "_id", "_vec")
    both = left.unionByName(right)

    thr = threshold
    budget = _SCORE_BUDGET_FLOATS  # closure value — see cosine_near_pairs

    _empty = pd.DataFrame({"id_a": [], "id_b": [], "raw_cos": []})

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        # diagonal vs cross-block MUST come from the group key, never from
        # side emptiness: a hash block with zero ids produces cross-block
        # groups holding only one side, and routing those down the diagonal
        # branch would re-emit the populated block's internal pairs (one
        # duplicate set per empty partner block)
        is_diag = pdf["ba"].iat[0] == pdf["bb"].iat[0]
        a_rows = pdf[pdf["_side"] == 0]
        b_rows = pdf[pdf["_side"] == 1]
        if not len(a_rows) or (not is_diag and not len(b_rows)):
            return _empty  # an empty block pairs with nothing
        ids_a = a_rows["_id"].to_numpy()
        A = np.array(a_rows["_vec"].tolist(), dtype=np.float64)
        A /= np.linalg.norm(A, axis=1, keepdims=True)
        if not is_diag:  # cross-block group: every (a, b) combo is a
            # distinct unordered pair, but hash blocking gives NO id order
            # across blocks — emit all hits as (min, max)
            ids_b = b_rows["_id"].to_numpy()
            B = np.array(b_rows["_vec"].tolist(), dtype=np.float64)
            B /= np.linalg.norm(B, axis=1, keepdims=True)
        else:
            # diagonal group (block vs itself): id order halves the matrix
            ids_b, B = ids_a, A
        # slab the matmul (same transient bound as the broadcast tier —
        # at the default block_rows a whole-block score would be
        # block_rows² floats, far past worker memory)
        slab = max(1, budget // max(1, len(ids_b)))
        outs = []
        for off in range(0, len(A), slab):
            s = A[off:off + slab] @ B.T
            mask = s >= thr - 1e-6
            if is_diag:
                mask &= ids_a[off:off + slab, None] < ids_b[None, :]
            ii, jj = np.nonzero(mask)
            if not len(ii):
                continue
            if is_diag:
                lo, hi = ids_a[off + ii], ids_b[jj]
            else:
                lo = np.minimum(ids_a[off + ii], ids_b[jj])
                hi = np.maximum(ids_a[off + ii], ids_b[jj])
            outs.append(
                pd.DataFrame({"id_a": lo, "id_b": hi, "raw_cos": s[ii, jj]})
            )
        return pd.concat(outs, ignore_index=True) if outs else _empty

    pairs = both.groupBy("ba", "bb").applyInPandas(
        kernel, "id_a long, id_b long, raw_cos double"
    )
    return (
        pairs.withColumn("cosine", F.round("raw_cos", 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def _rademacher_planes(n_planes_total: int, dim: int, seed: int):
    """±1 hyperplane matrix with md5-derived entries: plane p, component d
    is +1 iff the first hex char of md5('hp:<seed>:<p>:<d>') is even.
    Deterministic across processes and re-derivable in SQL (DuckDB:
    ('0x' || substring(md5(...), 1, 1))::INT % 2)."""
    import hashlib

    import numpy as np

    return np.array(
        [
            [
                1.0
                if int(hashlib.md5(f"hp:{seed}:{p}:{d}".encode()).hexdigest()[0], 16)
                % 2
                == 0
                else -1.0
                for d in range(dim)
            ]
            for p in range(n_planes_total)
        ],
        dtype=np.float64,
    )


def srp_plane_count(
    n_vecs: int,
    target_bucket_rows: int = 8,
    floor: int = 4,
    cap: int = 32,
) -> int:
    """The SRP-LSH self-sizing rule: ``n_planes = ceil(log2(n_vecs /
    target_bucket_rows))`` clamped to [floor, cap] — the bucket space
    2^n_planes per table grows with the corpus so the EXPECTED bucket
    stays near ``target_bucket_rows`` and never blows past the hot-bucket
    guard corpus-wide (the zero-recall cliff tools/ann_probe.py measured
    with a fixed plane count at 100×).  Same self-sizing move as
    ``bloom_size_bits`` (dedup.py).

    ``target_bucket_rows`` is really a VERIFY BUDGET: expected exact
    verifications per corpus vector ≈ target_bucket_rows × n_tables / 2,
    at EVERY corpus size.  The default 8 keeps that constant at ~16-32 —
    the near-dup regime the r10 probe validated (its 2 M-vector
    histogram: 16 planes ≈ bucket 30 → 238 M candidates → 240 GB verify
    shuffle, spill death; 20 planes ≈ bucket 2 → 22.4 M, healthy).  A
    target like 128 looks harmless at test SF but costs ~512
    verifications/vector — linear, yet a constant that re-creates the
    probe's spill death at 1000×.  Raise it only with a small
    ``n_tables`` and a real recall requirement at weak τ — and past
    that, weak-similarity mining belongs to IVF blocking, not deeper
    sign hashes (see cosine_near_pairs_lsh's docstring).

    ``cap=32`` keeps band hashes inside an int64 bit-shift with slack;
    2^32 buckets/table is past any corpus where a deeper hash would
    still change bucket occupancy before ``n_tables`` does.
    Deterministic in ``n_vecs`` and re-derivable in ANSI SQL (the
    catalog oracle carries the same formula), so the gate hash-checks
    the sizing rule itself, not just one pinned depth."""
    import math

    if n_vecs <= target_bucket_rows:
        return floor
    return min(cap, max(floor, math.ceil(math.log2(n_vecs / target_bucket_rows))))


def srp_table_recall(n_tables: int, n_planes: int, sim: float) -> float:
    """Analytic SRP-LSH recall for a pair at cosine ``sim``: per-table
    collision p = (1 − arccos(sim)/π)^n_planes (all sign bits agree),
    so recall over L independent tables = 1 − (1 − p)^L — the S-curve.
    Pure math, no data; the inverse is :func:`srp_table_count` and the
    planted-near-duplicate test asserts the empirical recall tracks it."""
    import math

    p = (1.0 - math.acos(max(-1.0, min(1.0, sim))) / math.pi) ** n_planes
    return 1.0 - (1.0 - p) ** n_tables


def srp_table_count(
    n_planes: int,
    sim: float = 0.95,
    recall_target: float = 0.9,
    floor: int = 2,
    cap: int = 16,
) -> int:
    """The SRP-LSH table-count sizing rule — the S-curve INVERSION that
    closes the last pinned LSH tuning (r11 verdict #4): the smallest L
    with analytic recall ≥ ``recall_target`` for a pair at cosine
    ``sim``, i.e. L = ceil(ln(1−R) / ln(1−p)) with p = (1 −
    arccos(sim)/π)^n_planes.  Companion of :func:`srp_plane_count`:
    planes size the BUCKET SPACE to the corpus; tables size RECALL to a
    stated target.

    ``sim`` defaults to 0.95 — the similarity OF THE DUPLICATES near-dup
    mining exists to find (true dups sit at cos ≳ 0.95; the query
    threshold is candidate widening below that) — because inverting at a
    weak τ diverges: p falls geometrically in n_planes, so at τ = 0.4
    and the 2 M-vector depth the formula asks for hundreds of tables.
    That divergence is the REGIME BOUNDARY, which is why ``cap`` exists
    and is small: hitting it means sign-LSH is the wrong tool for the
    similarity you are mining and the answer is IVF/centroid blocking
    (see cosine_near_pairs_lsh's docstring), not more tables — each
    table re-shuffles the full carried corpus payload, so L is a LINEAR
    cost knob and an uncapped derivation would quietly re-create the
    verify-shuffle spill the hot-bucket guard closed.

    Deterministic in its arguments; the planted-near-duplicate
    recall-floor test pins that empirical recall meets the target the
    derivation names."""
    import math

    if recall_target <= 0 or recall_target >= 1:
        raise ValueError(f"recall_target must be in (0, 1), got {recall_target}")
    p = (1.0 - math.acos(max(-1.0, min(1.0, sim))) / math.pi) ** n_planes
    if p >= 1.0:
        return floor
    # log1p(-p), not log(1-p): below p ≈ 1.1e-16 (deep hashes at strongly
    # negative sim) 1.0-p rounds to 1.0 and log(1.0-p) underflows to
    # exactly 0.0 — the promised cap-absorbs-divergence behavior became a
    # ZeroDivisionError (ADVICE r12).  log1p keeps full precision for
    # small p; p == 0 (sim = -1) still needs the explicit cap return.
    denom = math.log1p(-p)
    if denom == 0.0:
        return cap
    need = math.ceil(math.log(1.0 - recall_target) / denom)
    return min(cap, max(floor, need))


def cosine_near_pairs_lsh(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_planes: int | None = None,
    n_tables: int | None = None,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = 2000,
    target_bucket_rows: int = 8,
    recall_target: float = 0.9,
    content_distinct: bool | None = None,
) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign pattern of n_planes projections;
    pairs colliding in ≥1 of n_tables tables are verified exactly.

    SIZING AT SCALE (measured, tools/ann_probe.py): the bucket space is
    2^n_planes per table, so n_planes must GROW with the corpus or every
    bucket blows past ``max_bucket_size`` and is silently dropped —
    recall collapses to zero, not gracefully.  ``n_planes=None`` (the
    default) therefore SELF-SIZES from one corpus ``count()`` via
    :func:`srp_plane_count` — n_planes = ceil(log2(n_vecs /
    target_bucket_rows)), clamped to [4, 32]; pass an explicit int only
    to pin a tuning (probes, regression tests).  ``n_tables=None`` (the
    default) likewise SELF-SIZES via :func:`srp_table_count` — the
    smallest L whose S-curve recall at the duplicate similarity
    (max(threshold, 0.95)) meets ``recall_target``; pass an explicit int
    to trade recall for cost (each table re-shuffles the carried corpus
    payload once — L is linear cost), and name the traded guarantee via
    :func:`srp_table_recall` where you do.  Deep hashes
    only pay off in the NEAR-DUP regime (τ ≳ 0.9, agreement ≳ 0.85/plane)
    — for weak-similarity mining (τ ≈ 0.4) the per-pair signal is too
    faint for sign-LSH at scale; use IVF/centroid blocking instead.
    ``max_bucket_size`` mirrors ``minhash_lsh_pairs``'s hot-bucket guard
    and passes through to :func:`banded_candidate_pairs`.

    Hyperplanes are md5-derived ±1 Rademacher matrices (see
    ``_rademacher_planes``) living in the UDF closure — deterministic
    across processes, re-derivable in DuckDB (the catalog query carries a
    full hash-matched oracle), broadcast cost n_tables × n_planes × dim
    floats, independent of data.

    All n_tables × n_planes sign bits come from ONE Arrow-batched matmul
    per partition (batch × (n_tables·n_planes) GEMM, then bit-packing) —
    not n_tables·n_planes separate column expressions, which would hand
    Catalyst a ~(n_tables·n_planes·dim)-literal tree whose analysis alone
    dwarfs the data work at any corpus size.

    Candidate generation is ONE bucket shuffle: grouped on (table_id,
    pattern), pairs expanded within buckets — the projection subplan is
    never recomputed per table.

    EXACT-DUPLICATE MASS IS FACTORED OUT FIRST (r13, the image/text
    decomposition generalized to embeddings): byte-identical vectors —
    the re-encodes a deterministic encoder emits for duplicate content —
    share the sign pattern in EVERY table, so m copies made m-row
    buckets in all n_tables (m² candidate mass, each candidate carrying
    2·dim floats), and past ``max_bucket_size`` the whole group was
    silently DROPPED: zero pairs exactly where duplicate mass is
    densest, and no amount of ``n_planes`` depth can split an
    identical-pattern bucket.  Ids now group by identical vector, the
    LSH chain runs over one representative per distinct vector (plane
    sizing included — bucket occupancy is DISTINCT-vector occupancy),
    copies re-enter at output expansion, and identical-vector pairs are
    verified by the SAME kernel on (v, v) — bit-exact rounding, and a
    zero vector's NaN cosine drops it, as everywhere else.  MEMORY UNIT
    (same as the text family): the per-distinct-vector id-list row.

    VERIFY-IN-BUCKET (r11): each item carries its vector THROUGH the
    bucket shuffle, and the within-bucket pair expansion feeds the exact
    cosine kernel in the SAME stage — no exchange between candidate
    enumeration and verification.  The alternative (join candidate ids
    back to the corpus for vectors) shuffles pairs × 2 × dim floats: at
    2 M vectors / 8 tables / target-8 buckets that is ~64 M pairs ×
    ~0.5 KB ≈ 30-60 GB through two sort-merge joins, versus
    n_tables × corpus ≈ 8 GB of carried payload here (ratio ≈ expected
    bucket size / 2).  Cross-band dedup moves AFTER verification, where
    a pair is three scalars, and a pair colliding in k ≤ n_tables bands
    just re-verifies k times (identical floats → identical rounded
    cosine → exact dedup).  The hot-bucket cap bounds the carried bucket
    array at max_bucket_size × dim floats ≈ 1 MB per row at the
    defaults."""
    import numpy as np
    from pyspark.sql.types import ArrayType, LongType

    from stateful_spark_streaming_spark.operators.dedup import banded_candidate_pairs

    from stateful_spark_streaming_spark.caching import track_persist

    # content_distinct follows the pair-generator family contract
    # (dedup.jaccard_pairs): None (default) self-decides with dedup's
    # one-aggregate _all_distinct probe — byte-identical re-encodes are
    # what the grouping exists for, and a duplicate-free embedding table
    # (also a real shape) skips the grouping shuffle, the persist and
    # both expansion stages, which are provably the identity there.  The
    # probe's exact total count doubles as the plane-sizing count, so
    # the distinct path spends NO extra action on sizing.
    n_vecs = None
    if content_distinct is None:
        row = embeddings.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.xxhash64(F.col(vec_col))).alias("d"),
        ).first()
        content_distinct = int(row["n"]) == int(row["d"])
        if content_distinct:
            n_vecs = int(row["n"])
    if content_distinct:
        groups = None
        reps = embeddings.select(F.col(id_col), F.col(vec_col))
    else:
        # one id-list row per DISTINCT vector (r13 decomposition, see
        # docstring); persisted — feeds plane sizing, the rep pipeline, the
        # pair expansion (both sides) and the identical-vector tail
        groups = track_persist(
            embeddings.groupBy(F.col(vec_col)).agg(
                F.min(F.col(id_col)).alias("__rep"),
                F.collect_list(F.col(id_col)).alias("__ids"),
            )
        )
        reps = groups.select(F.col("__rep").alias(id_col), F.col(vec_col))
    if n_planes is None:
        # One count() sizes the hash depth to DISTINCT-vector occupancy
        # (what actually fills buckets) — a pinned depth is the measured
        # silent zero-recall config at 100× (SCALE.md, ann_probe
        # srp_demo).  The count materializes the persisted groups frame,
        # which the pipeline needs anyway; callers who must avoid that
        # eager step pass an explicit n_planes.  On the distinct path the
        # probe's exact row count IS the distinct-vector count.
        n_planes = srp_plane_count(
            n_vecs if n_vecs is not None else reps.count(), target_bucket_rows
        )
    if n_tables is None:
        # Recall is stated at the similarity of the DUPLICATES being
        # mined (>= 0.95), not at a weak candidate-widening threshold —
        # see srp_table_count's regime-boundary note.
        n_tables = srp_table_count(
            n_planes, sim=max(threshold, 0.95), recall_target=recall_target
        )
    dim = len(embeddings.select(vec_col).first()[0])
    # (n_tables*n_planes, dim) — one GEMM computes every table's projections.
    # RADEMACHER (±1) planes derived from md5, not numpy Gaussians: sign-of-
    # projection against ±1 planes is the same SRP-LSH family for angular
    # similarity, and md5 derivation makes every plane entry reproducible in
    # DuckDB — which upgrades this query from rows-only to a full
    # hash-matched oracle (signatures → banding → candidates → exact
    # verification), the same move that made MinHash oracle-exact in r3.
    all_planes = _rademacher_planes(n_tables * n_planes, dim, seed)
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    @F.pandas_udf(ArrayType(LongType()))
    def table_keys_udf(vecs: pd.Series) -> pd.Series:
        x = np.array(vecs.tolist(), dtype=np.float64)  # (batch, dim)
        signs = (x @ all_planes.T) > 0  # (batch, n_tables*n_planes)
        keys = signs.reshape(len(x), n_tables, n_planes) @ weights
        return pd.Series(list(keys))

    items = reps.select(
        F.struct(
            F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
        ).alias("item"),
        F.posexplode(table_keys_udf(F.col(vec_col))).alias("band_id", "band_hash"),
    )
    # distinct=False: dedup AFTER verification (see banded_candidate_pairs
    # docstring) — deduping (a, b) struct pairs here would shuffle the
    # carried vectors pairwise, re-creating the join-back volume
    cands = banded_candidate_pairs(
        items, max_bucket_size=max_bucket_size, distinct=False
    ).select(
        F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
        F.col("a.vec").alias("va"), F.col("b.vec").alias("vb"),
    )

    def verify(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            va = np.array(pdf["va"].tolist(), dtype=np.float64)
            vb = np.array(pdf["vb"].tolist(), dtype=np.float64)
            cos = np.einsum("ij,ij->i", va, vb) / (
                np.linalg.norm(va, axis=1) * np.linalg.norm(vb, axis=1)
            )
            keep = cos >= threshold - 1e-6
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"].to_numpy()[keep],
                    "id_b": pdf["id_b"].to_numpy()[keep],
                    "raw_cos": cos[keep],
                }
            )

    verified = cands.mapInPandas(verify, "id_a long, id_b long, raw_cos double")
    rep_pairs = (
        verified.withColumn("cosine", F.round("raw_cos", 6))
        .filter(F.col("cosine") >= threshold)
        # cross-band dedup on three scalars: a pair verified in k bands
        # yields k IDENTICAL rows (same floats in, same rounded value out)
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", "cosine")
    )
    if content_distinct:
        # singleton groups: expansion is the identity, the intra tail empty
        return rep_pairs
    # expand rep pairs back through both id lists (copies ARE the reps'
    # vectors, so the verified cosine carries verbatim)
    cross = (
        rep_pairs.join(
            groups.select(
                F.col("__rep").alias("id_a"), F.col("__ids").alias("__ids_a")
            ),
            "id_a",
        )
        .join(
            groups.select(
                F.col("__rep").alias("id_b"), F.col("__ids").alias("__ids_b")
            ),
            "id_b",
        )
        .select(F.explode("__ids_a").alias("__ia"), "__ids_b", "cosine")
        .select("__ia", F.explode("__ids_b").alias("__ib"), "cosine")
        .select(
            F.least("__ia", "__ib").alias("id_a"),
            F.greatest("__ia", "__ib").alias("id_b"),
            "cosine",
        )
        .filter(F.col("id_a") != F.col("id_b"))
    )
    # identical-vector pairs: self-cosine rounds to exactly 1.0 by
    # construction (|1 − dot/(√dot·√dot)| ≲ a few ulp ≪ the 6-dp
    # rounding), so no second Python verify tier is spent on it — each
    # chained mapInPandas stage costs its own worker tier (measured
    # elsewhere in this repo), and the JVM-side norm guard reproduces
    # the kernel's zero-vector/NaN drop (0-norm or NaN dot² → no row).
    # The isnan() leg is load-bearing (ADVICE r13): under Spark SQL
    # NaN-ordering semantics NaN > 0 is TRUE, so without it a duplicated
    # vector CONTAINING a NaN component would pass the guard and emit
    # fabricated cosine-1.0 intra pairs while the numpy verify kernel
    # (cos >= τ is False for NaN) drops the same content on the rep path.
    norm2 = F.aggregate(
        F.zip_with(F.col(vec_col), F.col(vec_col), lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )
    intra = (
        groups.filter(F.size("__ids") >= 2)
        .filter((~F.isnan(norm2)) & (norm2 > 0))
        .filter(F.lit(1.0) >= F.lit(float(threshold)))
        .select(F.explode("__ids").alias("id_a"), "__ids")
        .select("id_a", F.explode("__ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.lit(1.0).cast("double").alias("cosine"))
    )
    return cross.unionByName(intra)


def hard_negatives(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor, the
    top-k most-similar corpus vectors with a DIFFERENT label — the
    near-misses a trainer learns the most from (random negatives are
    trivially separable; same-label neighbors are positives, not
    negatives).

    Same plan shape as ``cosine_topk_bruteforce`` (broadcast anchors ×
    ONE GEMM corpus scan with per-batch partial top-k, see
    ``_brute_topk_scan``): the label inequality is a mask applied inside
    the kernel, BEFORE the partial top-k, so ranking state never holds
    same-label rows.  The IVF/PQ paths compose the same way when the
    corpus outgrows brute force."""
    cand = _brute_topk_scan(
        embeddings, queries, k, id_col, vec_col, label_col=label_col
    )
    scored = cand.select(
        F.col("query_id").alias("anchor_id"),
        F.col("neighbor_id").alias("negative_id"),
        "neg_label",
        F.round("raw_cos", 6).alias("cosine"),
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cosine").desc(), F.col("negative_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("anchor_id", "rank", "negative_id", "neg_label", "cosine")
    )
