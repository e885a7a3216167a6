"""Scale probe for the DISTRIBUTED connected-components tier of
``dup_clusters`` (the pointer-jumping change, round 13).

``python tools/cc_probe.py [n_nodes] [chain_len]`` — default 4,000,000
nodes in chains of length 1,000 (3,996,000 edges, > the 2M driver-tier
bound, so the distributed tier runs).  A chain is the worst case for
min-label propagation: diameter = chain_len, so plain propagation needs
~chain_len shuffle rounds (trips max_iter=20 three orders of magnitude
early at this depth) while pointer jumping converges in O(log2 diameter)
— the probe records the measured round count and wall.

Correctness is checked EXACTLY, not sampled: by construction node i's
component representative is (i // chain_len) * chain_len, so one
aggregate counts mismatches over every node.

Timing discipline: run SOLO (the bench's rule applies here too).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    chain_len = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000

    from pyspark.sql import functions as F

    from stateful_spark_streaming_spark.operators.dedup import dup_clusters
    from stateful_spark_streaming_spark.session import get_spark

    spark = get_spark("cc-probe", master="local[8]", shuffle_partitions=32)

    # chains of length chain_len over 0..n_nodes-1: edge (i, i+1) unless
    # i+1 starts the next chain
    edges = (
        spark.range(n_nodes - 1)
        .filter((F.col("id") + 1) % chain_len != 0)
        .select(F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
    )
    n_edges = edges.count()  # materialize the input before timing

    t0 = time.monotonic()
    labels = dup_clusters(edges)
    wrong = (
        labels.filter(
            F.col("cluster_rep")
            != (F.col("doc_id") - F.col("doc_id") % chain_len)
        ).count()
    )
    n_labeled = labels.count()
    wall = time.monotonic() - t0

    print(
        f"nodes={n_nodes} chain_len={chain_len} edges={n_edges} "
        f"tier={dup_clusters.last_tier} rounds={dup_clusters.last_rounds} "
        f"wall={wall:.2f}s labeled={n_labeled} wrong={wrong}"
    )
    if dup_clusters.last_tier != "distributed":
        print("PROBE INVALID: driver tier ran — raise n_nodes", file=sys.stderr)
        return 2
    if wrong:
        print("PROBE FAILED: wrong representatives", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
