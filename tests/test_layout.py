"""Z-order layout: key correctness + the footer-stats pruning property."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from stateful_spark_streaming_spark.operators import layout as LAY
from stateful_spark_streaming_spark.sources.tables import load_table


def test_zorder_key_matches_hand_interleave(spark):
    from tests.conftest import ref_interleave

    rows = [(0b1010, 0b0110), (0, 0), (1023, 1023), (1, 0), (0, 1)]
    df = spark.createDataFrame(rows, ["a", "b"])
    out = df.select(
        "a", "b", LAY.zorder_key(F.col("a"), F.col("b"), 10).alias("z")
    ).collect()
    for r in out:
        assert r.z == ref_interleave(r.a, r.b, 10), (r.a, r.b)


def test_quantize_clamps_and_grids(spark):
    df = spark.createDataFrame([(-5.0,), (0.0,), (255.9,), (512.0,), (9e9,)], ["v"])
    got = [r.q for r in df.select(LAY.quantize(F.col("v"), 0, 512, 10).alias("q")).collect()]
    assert got == [0, 0, 511, 1023, 1023]


def _file_ranges(path: str, col: str) -> list[float]:
    """per-file (max - min) of ``col`` across the parquet part files."""
    import duckdb

    con = duckdb.connect()
    spans = []
    for f in sorted(glob.glob(os.path.join(path, "part-*.parquet"))):
        lo, hi = con.execute(
            f"SELECT min({col}), max({col}) FROM read_parquet('{f}')"
        ).fetchone()
        spans.append(float(hi) - float(lo))
    return spans


def test_zorder_layout_dominates_single_sorts_on_other_column(
    spark, sf_dir, tmp_path
):
    """The point of Z-order: a user-sorted layout leaves each file's VALUE
    range near full-width (and vice versa); the z-curve keeps BOTH
    columns' per-file ranges a fraction of full width, so selective
    predicates on either column prune files.  Asserted from the actual
    parquet footer ranges of three layouts of the same data."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    n_files = 8
    # quantize to the ACTUAL data ranges — grids sized to a far larger
    # domain waste the column's bits and degrade the curve to a single
    # sort on whichever column fills its high bits (the standard Z-order
    # recipe derives grid bounds from column stats)
    lo_u, hi_u, lo_v, hi_v = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()
    qu = LAY.quantize(F.col("user_id"), lo_u, hi_u + 1, 10)
    qv = LAY.quantize(F.col("value"), lo_v, hi_v, 10)

    zdir = str(tmp_path / "z")
    udir = str(tmp_path / "u")
    vdir = str(tmp_path / "v")
    LAY.zorder_layout(ev, LAY.zorder_key(qu, qv, 10), n_files).write.parquet(zdir)
    ev.repartitionByRange(n_files, "user_id").write.parquet(udir)
    ev.repartitionByRange(n_files, "value").write.parquet(vdir)

    def avg(xs):
        return sum(xs) / len(xs)

    z_user, z_val = avg(_file_ranges(zdir, "user_id")), avg(_file_ranges(zdir, "value"))
    u_val = avg(_file_ranges(udir, "value"))
    v_user = avg(_file_ranges(vdir, "user_id"))
    # single sorts: the OTHER column's per-file range is ~full width
    assert v_user > 0.9 * (hi_u - lo_u), "value-sorted layout is blind to user_id"
    # z-order: strictly tighter than the single sorts on their blind axis
    assert z_val < 0.8 * u_val, (z_val, u_val)
    assert z_user < 0.8 * v_user, (z_user, v_user)
