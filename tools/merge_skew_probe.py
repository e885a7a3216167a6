"""Bucket-count sensitivity probe for run_streaming_merge_upsert(n_buckets)
under the two adversarial CDC feed shapes (r11 verdict #6):

- SPREAD: batch keys hash uniformly over buckets (the shape SCALE.md's
  r11 numbers measured — 20-key batches at sf10).
- HOT: every batch's keys hash into ONE bucket (the CDC hot-entity
  shape — one order/customer/account churning every trigger).

``python tools/merge_skew_probe.py [sf_dir] [n_buckets ...]`` — default
``.scratch/sf10`` with n_buckets in (64, 256, 1024).  For each bucket
count it bootstraps the bucketed table from orders once, then times a
3-batch replay in each shape (fresh checkpoint per shape; same keys
count per batch), printing bootstrap and marginal per-batch wall times
plus the touched-bucket file bytes rewritten per batch.  Run SOLO (the
bench's timing rule applies).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

N_KEYS_PER_BATCH = 20
N_BATCHES = 3


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else ".scratch/sf10"
    bucket_counts = [int(a) for a in argv[1:]] or [64, 256, 1024]

    from pyspark.sql import functions as F

    from stateful_spark_streaming_spark.session import get_spark
    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_merge_upsert,
    )

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    n_rows = orders.count()
    print(f"orders rows: {n_rows:,}", flush=True)
    base_cols = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    base = orders.select(*base_cols)

    results = {}
    for nb in bucket_counts:
        # key pools: spread = first N*B keys by key order; hot = first
        # N*B keys whose hash lands in bucket 3 (deterministic both)
        spread_keys = [
            r[0]
            for r in base.select("o_orderkey")
            .orderBy("o_orderkey")
            .limit(N_KEYS_PER_BATCH * N_BATCHES)
            .collect()
        ]
        hot_keys = [
            r[0]
            for r in base.withColumn(
                "b", F.pmod(F.xxhash64("o_orderkey"), F.lit(nb))
            )
            .filter("b = 3")
            .select("o_orderkey")
            .orderBy("o_orderkey")
            .limit(N_KEYS_PER_BATCH * N_BATCHES)
            .collect()
        ]
        for shape, keys in (("spread", spread_keys), ("hot", hot_keys)):
            work = tempfile.mkdtemp(prefix=f"merge_skew_{nb}_{shape}_")
            base_path = os.path.join(work, "base")
            base.write.parquet(base_path)
            ch_dir = os.path.join(work, "changes")
            os.makedirs(ch_dir)
            ck = os.path.join(work, "ckpt")

            def land(i: int) -> None:
                ks = keys[i * N_KEYS_PER_BATCH : (i + 1) * N_KEYS_PER_BATCH]
                # derive the change image from base rows so column types
                # match the standing table exactly at any source SF
                b = (
                    base.filter(F.col("o_orderkey").isin([int(k) for k in ks]))
                    .withColumn("o_totalprice", F.lit(-1.0 - i))
                    .withColumn("seq", F.lit(i + 1))
                    .withColumn("op", F.lit("U"))
                )
                bdir = os.path.join(work, f"wb{i}")
                b.coalesce(1).write.parquet(bdir)
                part = [f for f in os.listdir(bdir) if f.endswith(".parquet")][0]
                os.rename(
                    os.path.join(bdir, part),
                    os.path.join(ch_dir, f"batch-{i}.parquet"),
                )

            timings = []
            land(0)
            t0 = time.time()
            run_streaming_merge_upsert(
                spark, base_path, ch_dir, ("o_orderkey",),
                checkpoint_dir=ck, n_buckets=nb, seq_col="seq",
            )
            timings.append(time.time() - t0)  # bootstrap + batch 0
            for i in range(1, N_BATCHES):
                land(i)
                t0 = time.time()
                run_streaming_merge_upsert(
                    spark, base_path, ch_dir, ("o_orderkey",),
                    checkpoint_dir=ck, n_buckets=nb, seq_col="seq",
                )
                timings.append(time.time() - t0)
            tag = f"nb={nb} {shape}"
            results[tag] = {
                "bootstrap_plus_b0_s": round(timings[0], 2),
                "marginal_batch_s": [round(t, 2) for t in timings[1:]],
            }
            print(f"{tag}: {results[tag]}", flush=True)
            shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
