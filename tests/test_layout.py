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


def _rowgroups_must_read(path: str, preds: dict[str, tuple[float, float]]) -> tuple[int, int]:
    """(row groups a min/max-pruning reader must read, total row groups)
    across the part files — the EXACT pruning decision parquet readers
    (Spark's included) make from footer statistics for a conjunctive
    range predicate."""
    import pyarrow.parquet as pq

    must, total = 0, 0
    for f in sorted(glob.glob(os.path.join(path, "part-*.parquet"))):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            total += 1
            overlap = True
            for col, (lo, hi) in preds.items():
                st = md.row_group(rg).column(names[col]).statistics
                if st.min > hi or st.max < lo:
                    overlap = False
                    break
            if overlap:
                must += 1
    return must, total


def test_zorder_measured_rowgroup_skip_sf01(spark, tmp_path):
    """Runtime pruning NUMBER at bench scale (VERDICT r4 stretch #8): lay
    the sf0.1 events table out z-ordered vs linearly sorted, run the same
    range scans, and count the row groups a min/max reader must touch.
    The z-layout must (a) skip ≥50% of row groups for a single-column
    predicate on EITHER axis — where the linear layout is blind on its
    non-sort axis and reads ≥90% — and (b) beat both single sorts on the
    2-predicate box.  Answers are also cross-checked between layouts, so
    the skipping is proven not to drop rows."""
    import os as _os

    import pytest as _pytest

    sf_dir = "/root/testdata/sf0.1"
    if not _os.path.isdir(sf_dir):
        _pytest.skip("sf0.1 testdata not present")
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    n_files = 64
    lo_u, hi_u, lo_v, hi_v = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()
    qu = LAY.quantize(F.col("user_id"), lo_u, hi_u + 1, 10)
    qv = LAY.quantize(F.col("value"), lo_v, hi_v, 10)
    zdir, udir = str(tmp_path / "z"), str(tmp_path / "u")
    LAY.zorder_layout(ev, LAY.zorder_key(qu, qv, 10), n_files).write.parquet(zdir)
    ev.repartitionByRange(n_files, "user_id").sortWithinPartitions(
        "user_id"
    ).write.parquet(udir)

    # ~1/8-width ranges centered mid-domain on each axis
    du, dv = (hi_u - lo_u) / 8, (hi_v - lo_v) / 8
    u_box = (lo_u + 3 * du, lo_u + 4 * du)
    v_box = (lo_v + 3 * dv, lo_v + 4 * dv)

    # (a) single-column predicate on value: user-sorted layout is blind
    z_v, z_tot = _rowgroups_must_read(zdir, {"value": v_box})
    u_v, u_tot = _rowgroups_must_read(udir, {"value": v_box})
    assert u_v >= 0.9 * u_tot, "linear layout should be blind to value"
    assert z_v <= 0.5 * z_tot, f"z-layout skipped only {z_tot - z_v}/{z_tot}"
    # ...and on user_id the z-layout must still skip ≥50% (the linear
    # user-sort of course prunes this one perfectly)
    z_u, _ = _rowgroups_must_read(zdir, {"user_id": u_box})
    assert z_u <= 0.5 * z_tot

    # (b) 2-predicate box: z reads no more than the better single sort
    z_b, _ = _rowgroups_must_read(zdir, {"user_id": u_box, "value": v_box})
    u_b, _ = _rowgroups_must_read(udir, {"user_id": u_box, "value": v_box})
    assert z_b <= u_b, (z_b, u_b)

    # pruning must not change answers: same rows from both layouts
    cond = (
        (F.col("user_id") >= u_box[0]) & (F.col("user_id") <= u_box[1])
        & (F.col("value") >= v_box[0]) & (F.col("value") <= v_box[1])
    )
    a = sorted(r.event_id for r in spark.read.parquet(zdir).filter(cond).collect())
    b = sorted(r.event_id for r in spark.read.parquet(udir).filter(cond).collect())
    assert a == b and len(a) > 0
    print(
        f"rowgroup skip: value-pred z {z_tot - z_v}/{z_tot} vs linear "
        f"{u_tot - u_v}/{u_tot}; box z reads {z_b} vs linear {u_b}"
    )


def test_zorder_compact_restores_pruning_on_grown_table(spark, tmp_path):
    """The OPTIMIZE-ZORDER cadence job: a table grown by arrival-order
    appends is blind to range predicates (every file spans ~the full
    value domain) and full of small files; zorder_compact must rewrite it
    so a mid-domain value box skips >=50% of row groups, bin-pack the
    file count down, and keep the row multiset byte-identical."""
    import os as _os

    import pytest as _pytest

    sf_dir = "/root/testdata/sf0.1"
    if not _os.path.isdir(sf_dir):
        _pytest.skip("sf0.1 testdata not present")
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    tbl = str(tmp_path / "grown")
    # 4 arrival-order appends (by event_id slice): each lands files whose
    # user_id/value footer ranges are ~full-width
    n = ev.count()
    for i in range(4):
        ev.filter((F.col("event_id") % 4) == i).repartition(16).write.mode(
            "append"
        ).parquet(tbl)
    before = spark.read.parquet(tbl)
    lo_v, hi_v = before.agg(F.min("value"), F.max("value")).first()
    dv = (hi_v - lo_v) / 8
    v_box = (lo_v + 3 * dv, lo_v + 4 * dv)
    must0, tot0 = _rowgroups_must_read(tbl, {"value": v_box})
    assert must0 >= 0.9 * tot0, "arrival-order layout should be blind"
    n_files_before = len(glob.glob(os.path.join(tbl, "part-*.parquet")))
    # materialize the content fingerprint BEFORE the swap deletes the old
    # files: order-insensitive row-hash sum + column sums + count
    def fingerprint(df):
        # xor-fold of row hashes: order-insensitive, overflow-free (rows
        # are unique by event_id, so pairwise cancellation can't hide)
        return df.agg(
            F.count("*"),
            F.expr("bit_xor(xxhash64(event_id, user_id, value))"),
            F.sum("event_id"),
            F.round(F.sum("value"), 3),
        ).first()

    checksum = fingerprint(before)

    LAY.zorder_compact(spark, tbl, "user_id", "value", bits=10, n_files=16)

    after = spark.read.parquet(tbl)
    assert fingerprint(after) == checksum, "compaction changed the row multiset"
    must1, tot1 = _rowgroups_must_read(tbl, {"value": v_box})
    assert must1 <= 0.5 * tot1, f"compacted layout skipped only {tot1-must1}/{tot1}"
    n_files_after = len(glob.glob(os.path.join(tbl, "part-*.parquet")))
    assert n_files_after <= 16 < n_files_before
    assert not _os.path.exists(tbl + ".tmp")


def test_zorder_compact_binpacks_by_bytes_and_handles_edge_cases(spark, tmp_path):
    """Default n_files derives from table bytes (small-file compaction in
    the same pass); zero-row tables are a no-op; constant columns degrade
    to a single sort instead of dividing by zero."""
    import os as _os

    rows = [(i, i % 7, float(i % 13)) for i in range(2000)]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "value"])
    tbl = str(tmp_path / "drip")
    for i in range(5):  # 5 drips x 8 partitions = 40 tiny files
        df.filter((F.col("event_id") % 5) == i).repartition(8).write.mode(
            "append"
        ).parquet(tbl)
    assert len(glob.glob(os.path.join(tbl, "part-*.parquet"))) == 40
    LAY.zorder_compact(spark, tbl, "user_id", "value")  # bytes << 128MB -> 1 file
    assert len(glob.glob(os.path.join(tbl, "part-*.parquet"))) == 1
    assert spark.read.parquet(tbl).count() == 2000

    const = str(tmp_path / "const")
    spark.createDataFrame(
        [(i, 1, float(i)) for i in range(100)], ["event_id", "user_id", "value"]
    ).write.parquet(const)
    LAY.zorder_compact(spark, const, "user_id", "value")  # constant user_id
    assert spark.read.parquet(const).count() == 100

    empty = str(tmp_path / "empty")
    spark.createDataFrame([], "event_id long, user_id long, value double").write.parquet(empty)
    LAY.zorder_compact(spark, empty, "user_id", "value")  # no-op, no crash
    assert spark.read.parquet(empty).count() == 0


def test_zorder_compact_both_degenerate_axes_binpacks(spark, tmp_path):
    """BOTH clustered columns constant: no clustering is possible, but the
    bin-packing contract must survive — round-robin into n_files, never a
    single-task single-file collapse (review finding)."""
    p = str(tmp_path / "bothconst")
    spark.createDataFrame(
        [(i, 1, 2.0) for i in range(400)], ["event_id", "user_id", "value"]
    ).write.parquet(p)
    LAY.zorder_compact(spark, p, "user_id", "value", n_files=4)
    assert len(glob.glob(os.path.join(p, "part-*.parquet"))) == 4
    assert spark.read.parquet(p).count() == 400


def test_zorder_layout_rejects_zkey_collision(spark, tmp_path):
    """A stored table that already has a _zkey column must raise — the
    rewrite would silently overwrite then drop the caller's data."""
    import pytest

    p = str(tmp_path / "haskey")
    spark.createDataFrame(
        [(i, i % 5, float(i), i * 10) for i in range(50)],
        ["event_id", "user_id", "value", "_zkey"],
    ).write.parquet(p)
    with pytest.raises(ValueError, match="_zkey"):
        LAY.zorder_compact(spark, p, "user_id", "value")
    # table untouched
    assert spark.read.parquet(p).count() == 50
    assert "_zkey" in spark.read.parquet(p).columns
