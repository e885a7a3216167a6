from __future__ import annotations

import pytest

from stateful_spark_streaming_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "tests",
        master="local[4]",
        shuffle_partitions=4,
        streaming=True,
        extra_conf={"spark.sql.streaming.checkpointLocation.deleteOnStop": "true"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


def ref_interleave(a: int, b: int, bits: int = 10) -> int:
    """Reference Morton interleave (bit b of `a` at position 2b, of `b` at
    2b+1) — the ONE spec both layout tests assert against."""
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out
