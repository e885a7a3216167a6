"""Full-oracle pins for catalog-RETIRED queries (r12 verdict #2).

At 148 queries vs the 150-entry gate rotation capacity (max_stale=3 ×
window=50), one mis-rotated round strands evidence — so seven entries
whose ORACLE evidence a surviving sibling subsumes were retired from the
gate catalog.  Retirement frees rotation capacity, NOT evidence: this
module runs every retired (query, oracle) pair through the SAME
driver-style canonicalized compare the gate uses — pandas column-sorted,
row-sorted, dtype-class-checked, sha256-hashed via
``tools.check_oracle.canon_pandas`` — at sf0.001, so each retired entry
still carries a full cross-engine hash match, just in pytest instead of
a rotation slot.  Each entry's ``subsumed_by`` names the surviving
sibling whose gate evidence covers its machinery.
"""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest

from stateful_spark_streaming_spark.queries_catalog import (
    QUERIES,
    RETIRED_ORACLES,
    RETIRED_QUERIES,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location(
    "check_oracle", os.path.join(REPO, "tools", "check_oracle.py")
)
check_oracle = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_spec and check_oracle)

TABLES = check_oracle.TABLES


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def test_every_retired_query_has_an_oracle_and_a_subsumer():
    """The retirement contract: no entry may be retired rows-only (that
    would DOWNGRADE evidence), and each must name the surviving sibling."""
    assert set(RETIRED_QUERIES) == set(RETIRED_ORACLES)
    for name, fn in RETIRED_QUERIES.items():
        why = getattr(fn, "__retired_subsumed_by__", "")
        assert why, f"{name}: retired without naming its subsuming sibling"
        # at least one surviving catalog query must be named in the rationale
        assert any(q in why for q in QUERIES), (
            f"{name}: subsumed_by does not name a live catalog query: {why}"
        )


def test_retired_names_absent_from_gate_catalog():
    assert not set(RETIRED_QUERIES) & set(QUERIES)


@pytest.mark.parametrize("name", sorted(RETIRED_QUERIES))
def test_retired_query_still_hash_matches_its_oracle(spark, sf_dir, duck, name):
    sdf = RETIRED_QUERIES[name](spark, sf_dir)
    sn, sclass, sh = check_oracle.canon_pandas(sdf.toPandas())
    opdf = duck.execute(RETIRED_ORACLES[name]).df()
    on, oclass, oh = check_oracle.canon_pandas(opdf)
    assert sorted(sdf.columns) == sorted(opdf.columns)
    assert sn == on, f"{name}: rows {sn} != {on}"
    assert sclass == oclass, f"{name}: dtype classes {sclass} != {oclass}"
    assert sh == oh, f"{name}: value hash {sh} != {oh}"
    assert sn > 0, f"{name}: empty result proves nothing"
