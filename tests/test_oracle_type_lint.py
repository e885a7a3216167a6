"""Output-type lint closing the round-4 driver-gate class.

The authoritative gate canonicalizes results through pandas: DuckDB
HUGEINT aggregates (→ float64) hash-mismatch Spark's int64, and
list/struct cells crash its ``sort_values``.  Round 4 shipped four
correct-but-red queries that way.  These tests make the class
unshippable: every declared oracle must DESCRIBE to scalar,
non-HUGEINT columns, every Spark catalog query must emit scalar
columns only, and the repo's replica comparator must actually
reproduce both driver failure modes.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)
from check_oracle import TABLES  # noqa: E402  (one source of truth)

BANNED_DUCK = ("HUGEINT", "STRUCT(", "MAP(", "[]", "UNION(")


def test_every_oracle_describes_to_scalar_non_hugeint_columns():
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    bad = []
    for name, sql in entrymod.oracle_sql().items():
        for r in con.execute(f"DESCRIBE {sql}").fetchall():
            col, typ = r[0], r[1]
            t = typ.upper()
            if any(b in t for b in BANNED_DUCK):
                bad.append((name, col, typ))
    assert not bad, f"driver-unhashable oracle output columns: {bad}"


def test_spark_catalog_queries_emit_scalar_columns_only(spark):
    """Every catalog entry's result schema must be scalar: the driver's
    pandas ``sort_values`` cannot sort list/map/struct cells (the exact
    ``sq8_encode`` round-4 crash).  Streaming entries execute their
    pipelines here too — sf0.001 keeps that cheap."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    import __spark_entry__ as entrymod

    bad = []
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_DIR)
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                bad.append((name, f.name, f.dataType.simpleString()))
    assert not bad, f"non-scalar catalog output columns: {bad}"


def test_replica_comparator_reproduces_driver_failure_modes():
    """tools/check_oracle.py must FAIL where the driver fails — round 4's
    process lesson was a replica whose %.6g formatting masked exactly the
    classes the gate trips on."""
    import pandas as pd

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
        ),
    )
    from check_oracle import canon_pandas

    # (a) int64 vs float64 with equal rendered values → dtype-class split
    n_i, cls_i, h_i = canon_pandas(pd.DataFrame({"a": [2534, 1]}))
    f = pd.DataFrame({"a": [2534.0, 1.0]})
    n_f, cls_f, h_f = canon_pandas(f)
    assert n_i == n_f
    assert cls_i != cls_f, "int-vs-float dtype split must be detected"

    # (b) a list-valued column must raise, like the driver's sort_values
    with pytest.raises(TypeError):
        canon_pandas(pd.DataFrame({"a": [[1, 2], [3]], "b": [1, 2]}))
