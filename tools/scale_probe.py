"""Reproduce SCALE.md's measured scale probe.

``python tools/scale_probe.py [sf_dir ...]`` — default compares
``/root/testdata/sf0.1`` against ``.scratch/sf1`` (generate the latter
with ``python tools/gen_scale.py /root/testdata/sf0.1 .scratch/sf1 10``).

Runs the probe query list once per SF dir in ONE session (first dir
carries the cold JIT — list it first), prints per-query wall time and
row counts, then the LSH bucket-skew diagnostics and the df-capped
Jaccard candidate-mass histogram that explains the quadratic family.
``--queries a,b,c`` probes a custom catalog-query list instead (skips
the LSH/Jaccard diagnostics, which belong to the dedup family).
Timing discipline: run SOLO (any concurrent Spark JVM invalidates the
numbers — the bench's solo rule applies here too).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

PROBES = [
    "training_pipeline_full",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_keep_best",
    "dup_ngram_spans",
    "remove_dup_spans",
    "streaming_incremental_monthly_revenue",
    "cosine_near_pairs",
    "corpus_report",
    "bigram_logprob",
    "quality_histogram",
    "heavy_hitters_cms",
    "decontaminate_bloom",
    "dedup_exact",
    "bpe_encode_stats",
    "compression_stats",
]


def main() -> int:
    argv = sys.argv[1:]
    probes = list(PROBES)
    diagnostics = True
    if "--queries" in argv:
        i = argv.index("--queries")
        if i + 1 >= len(argv) or not argv[i + 1].strip(","):
            # a trailing/empty --queries must fail with usage, not
            # IndexError or a probe list of [''] (ADVICE r10)
            print("usage: scale_probe.py [sf_dir ...] --queries q1,q2,...",
                  file=sys.stderr)
            return 2
        probes = [q for q in argv[i + 1].split(",") if q]
        del argv[i : i + 2]
        diagnostics = False  # custom lists skip the LSH/Jaccard diagnostics
    sf_dirs = argv or ["/root/testdata/sf0.1", ".scratch/sf1"]
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from stateful_spark_streaming_spark.operators.dedup import (
        _shingle_index,
        lsh_bucket_stats,
        minhash_band_rows_mapinpandas,
    )
    from stateful_spark_streaming_spark.session import get_spark
    from stateful_spark_streaming_spark.sources.tables import load_table

    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    results: dict[str, dict] = {}
    for sf_dir in sf_dirs:
        for name in probes:
            t0 = time.perf_counter()
            try:
                n = qs[name](spark, sf_dir).count()
                row = {"sec": round(time.perf_counter() - t0, 2), "rows": n}
            except Exception as e:  # noqa: BLE001 — a probe error is a datum
                row = {"err": str(e)[:200]}
            results[f"{sf_dir}/{name}"] = row
            print(f"{sf_dir} {name}: {row}", flush=True)
            spark.catalog.clearCache()
        if not diagnostics:
            continue
        docs = load_table(spark, sf_dir, "documents")
        band_rows = minhash_band_rows_mapinpandas(docs, "text", "doc_id", 3, 32, 8)
        items = band_rows.select(
            F.lit(0).alias("band_id"),
            "band_hash",
            F.struct(F.col("doc_id").alias("id")).alias("item"),
        )
        results[f"{sf_dir}/lsh_bucket_stats"] = lsh_bucket_stats(items)
        # candidate mass of the df-capped exact-Jaccard path: Σ d(d−1)/2
        # over shingles with df ≤ 1000 — the quantity that explains
        # dedup_clusters' super-linear probe (O(df²) per shingle)
        hist = (
            _shingle_index(docs, "text", "doc_id", 3)
            .groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") <= 1000)
            .agg(
                F.count(F.lit(1)).alias("n_shingles"),
                F.sum(F.expr("d*(d-1) div 2")).alias("candidate_mass"),
                F.max("d").alias("max_df"),
            )
            .collect()[0]
        )
        results[f"{sf_dir}/jaccard_candidate_mass"] = {
            "n_shingles": hist["n_shingles"],
            "candidate_mass": int(hist["candidate_mass"] or 0),
            "max_df": hist["max_df"],
        }
        print(f"{sf_dir} diagnostics: {results[f'{sf_dir}/lsh_bucket_stats']} "
              f"{results[f'{sf_dir}/jaccard_candidate_mass']}", flush=True)
        spark.catalog.clearCache()
    spark.stop()
    print(json.dumps(results, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
