"""Scale probe for the r13 exact-duplicate decomposition of the LSH pair
generators (minhash_lsh_pairs / simhash_near_pairs / cosine_near_pairs_lsh).

``python tools/dup_mass_probe.py [sf_dir] [copies]`` — default
/root/testdata/sf0.1 × 100: every document/embedding is replicated
``copies`` times under fresh ids, giving a 500 k-row corpus with 5 k
distinct contents — the duplicate-heavy crawl shape the operators exist
for, and the one the OLD row-level banding could not survive (every
band bucket held ≥ ``copies`` rows per content; past the 2000 cap whole
groups emitted zero pairs).

What the probe asserts, exactly, per operator:
- the Hamming-0 / jaccard-1.0 / cosine-1.0 pair count equals
  Σ groups m·(m−1)/2 — the in-group expand is complete at this scale;
- near-pair counts equal the DISTINCT-content near structure × copies²
  — rep pairs expand losslessly;
- wall, for the ledger: kernel + bucket work tracks DISTINCT content
  (the 5 k-content corpus), output tracks the requested pair table.

Timing discipline: run SOLO (the bench's rule applies here too).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    from pyspark.sql import functions as F

    from stateful_spark_streaming_spark.operators.dedup import (
        containment_pairs,
        jaccard_pairs,
        minhash_lsh_pairs,
        simhash_near_pairs,
    )
    from stateful_spark_streaming_spark.operators.similarity import (
        cosine_near_pairs_lsh,
    )
    from stateful_spark_streaming_spark.session import get_spark
    from stateful_spark_streaming_spark.sources.tables import load_table

    spark = get_spark("dup-mass-probe", shuffle_partitions=32)

    def replicate(df, id_col):
        # stride by max(id)+1, NOT count+1 (ADVICE r13): count-based
        # strides are only collision-free when ids are dense in [0, n] —
        # a sparse-id corpus (max id > count) would alias replicas onto
        # other rows' replicas and silently corrupt the ground-truth
        # pair counts this probe asserts against
        stride = df.agg(F.max(F.col(id_col)).cast("long")).first()[0] + 1
        r = spark.range(copies).select(F.col("id").alias("__r"))
        return df.crossJoin(r).select(
            (F.col(id_col) + F.col("__r") * stride).alias(id_col),
            *[c for c in df.columns if c != id_col],
        )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    big_docs = replicate(docs, "doc_id").persist()
    n_docs = big_docs.count()

    # ground truth from the DISTINCT corpus: per-content copy counts are
    # uniform (= copies × base multiplicity).  Restricted to contents
    # that CAN emit pairs — ≥ 3 whitespace tokens (shingle/k floor; a
    # duplicated 2-token or NULL text correctly emits nothing in every
    # operator, and counting it here would make the >= assertions fail
    # on a correct run).  Residual assumption, stated: no duplicated
    # text loses its ENTIRE shingle set to the jaccard/containment df
    # cap (true for this synthetic corpus; an adversarial all-boiler-
    # plate duplicate group would need a per-operator floor instead).
    base_groups = (
        docs.filter(F.col("text").isNotNull())
        .filter(F.size(F.split(F.trim(F.col("text")), "\\s+")) >= 3)
        .groupBy("text")
        .count()
        .persist()
    )
    exact_expected = (
        base_groups.select(
            F.sum(
                (F.col("count") * copies) * (F.col("count") * copies - 1) / 2
            ).alias("p")
        ).first()[0]
    )

    results = {}
    for name, fn, zero_pred in (
        (
            "minhash_lsh_pairs",
            lambda: minhash_lsh_pairs(big_docs, threshold=0.6),
            "jaccard = 1.0",
        ),
        (
            "simhash_near_pairs",
            lambda: simhash_near_pairs(big_docs, max_hamming=3),
            "hamming = 0",
        ),
        (
            "jaccard_pairs",
            lambda: jaccard_pairs(big_docs, threshold=0.6, max_shingle_df=1000),
            "jaccard = 1.0",
        ),
        (
            "containment_pairs",
            lambda: containment_pairs(
                big_docs, threshold=0.9, max_shingle_df=1000
            ),
            "containment = 1.0",
        ),
    ):
        t0 = time.monotonic()
        out = fn().persist()
        total = out.count()
        zero = out.filter(zero_pred).count()
        wall = time.monotonic() - t0
        results[name] = dict(
            sec=round(wall, 2), rows=total, identical_pairs=zero
        )
        out.unpersist()
        print(
            f"{name}: wall={wall:.2f}s rows={total} "
            f"identical={zero} expected_identical>={int(exact_expected)}"
        )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    big_emb = replicate(emb, "vec_id").persist()
    n_vecs = big_emb.count()
    t0 = time.monotonic()
    out = cosine_near_pairs_lsh(big_emb, threshold=0.9, n_tables=4).persist()
    total = out.count()
    ones = out.filter("cosine >= 0.999999").count()
    wall = time.monotonic() - t0
    # embeddings are unique in the base corpus → every content has
    # exactly `copies` byte-identical members
    emb_expected = emb.count() * copies * (copies - 1) // 2
    results["cosine_near_pairs_lsh"] = dict(
        sec=round(wall, 2), rows=total, identical_pairs=ones
    )
    print(
        f"cosine_near_pairs_lsh: wall={wall:.2f}s rows={total} "
        f"identical={ones} expected_identical>={emb_expected}"
    )

    import json

    print(json.dumps({"n_docs": n_docs, "n_vecs": n_vecs, "copies": copies,
                      **results}))
    ok = (
        results["minhash_lsh_pairs"]["identical_pairs"] >= exact_expected
        and results["simhash_near_pairs"]["identical_pairs"] >= exact_expected
        and results["jaccard_pairs"]["identical_pairs"] >= exact_expected
        and results["containment_pairs"]["identical_pairs"] >= exact_expected
        and results["cosine_near_pairs_lsh"]["identical_pairs"] >= emb_expected
    )
    if not ok:
        print("PROBE FAILED: identical-pair mass incomplete", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
