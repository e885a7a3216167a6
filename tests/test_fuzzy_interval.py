"""fuzzy_name_pairs (FastSS deletion-neighborhood similarity join) and
interval_overlap_pairs (bin-blocked interval join).

Both operators claim their blocking is LOSSLESS vs the brute-force
all-pairs definition — each test pins that equivalence on crafted data
chosen to stress the blocking (multi-bin overlaps, boundary touches,
distance exactly at the threshold, substitutions vs deletions).
"""

from __future__ import annotations

import itertools

from stateful_spark_streaming_spark.operators.relational import fuzzy_name_pairs
from stateful_spark_streaming_spark.operators.temporal import (
    interval_overlap_pairs,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


NAMES = [
    "widget",        # base
    "widgets",       # 1 insertion
    "wldget",        # 1 substitution
    "wldgets",       # 2 (sub + insert)
    "gizmo",         # far from everything
    "gizmos",        # 1 from gizmo
    "wi",            # short string (variant collapse toward tiny strings)
    "w",             # shares a deletion variant with "wi" at dist 1
    "xidget",        # 1 sub from widget, 2 from wldget
]


def test_fuzzy_pairs_match_bruteforce_k2(spark):
    df = spark.createDataFrame([(n,) for n in NAMES], "p_name string")
    got = {
        (r["name_a"], r["name_b"], r["lev"])
        for r in fuzzy_name_pairs(df, "p_name", max_dist=2).collect()
    }
    want = {
        (a, b, _lev(a, b))
        for a, b in itertools.combinations(sorted(NAMES), 2)
        if _lev(a, b) <= 2
    }
    assert got == want and len(want) >= 6


def test_fuzzy_pairs_match_bruteforce_k1(spark):
    df = spark.createDataFrame([(n,) for n in NAMES], "p_name string")
    got = {
        (r["name_a"], r["name_b"])
        for r in fuzzy_name_pairs(df, "p_name", max_dist=1).collect()
    }
    want = {
        (a, b)
        for a, b in itertools.combinations(sorted(NAMES), 2)
        if _lev(a, b) <= 1
    }
    assert got == want


def test_fuzzy_pairs_duplicate_input_rows_collapse(spark):
    df = spark.createDataFrame(
        [("widget",), ("widget",), ("widgets",)], "p_name string"
    )
    rows = fuzzy_name_pairs(df, "p_name", max_dist=2).collect()
    assert [(r["name_a"], r["name_b"], r["lev"]) for r in rows] == [
        ("widget", "widgets", 1)
    ]


def _brute_overlaps(ivs):
    out = set()
    for (ia, sa, ea), (ib, sb, eb) in itertools.combinations(ivs, 2):
        lo, hi = (ia, ib) if ia < ib else (ib, ia)
        if sa < eb and sb < ea:
            out.add((lo, hi, min(ea, eb) - max(sa, sb)))
    return out


def test_interval_overlap_matches_bruteforce_and_edges(spark):
    W = 100
    ivs = [
        (1, 0, 100),     # exactly one bin
        (2, 50, 250),    # spans 3 bins; overlaps 1 and 3 — emitted ONCE each
        (3, 100, 200),   # touches 1 at t=100: NOT a pair (half-open)
        (4, 199, 201),   # straddles a bin edge
        (5, 150, 160),   # contained inside 2 and 3
        (6, 1000, 1100), # far away, no pairs
    ]
    df = spark.createDataFrame(ivs, "event_id long, start_ms long, end_ms long")
    got = {
        (r["id_a"], r["id_b"], r["overlap_ms"])
        for r in interval_overlap_pairs(df, bin_ms=W).collect()
    }
    want = _brute_overlaps(ivs)
    assert got == want
    assert (1, 3, 0) not in got  # the half-open boundary case
    assert (2, 3, 100) in got    # multi-bin overlap present exactly once


def test_interval_overlap_carry_cols(spark):
    df = spark.createDataFrame(
        [(1, 7, 0, 100), (2, 9, 50, 150)],
        "event_id long, user_id long, start_ms long, end_ms long",
    )
    rows = interval_overlap_pairs(
        df, bin_ms=100, carry_cols=("user_id",)
    ).collect()
    assert [(r["id_a"], r["id_b"], r["user_id_a"], r["user_id_b"], r["overlap_ms"]) for r in rows] == [
        (1, 2, 7, 9, 50)
    ]


def test_hamming_near_pairs_matches_bruteforce(spark):
    """Banded-LSH Hamming pairs vs brute force over random 64-bit
    strings, plus the pigeonhole boundary: distance exactly max_ham is
    kept, max_ham+1 dropped -- including the adversarial pattern of one
    flip in every band (which defeats any single band but must still be
    dropped only by the VERIFY, i.e. distance 5 > 4)."""
    import random

    from stateful_spark_streaming_spark.operators.dedup import (
        hamming_near_pairs,
    )

    rng = random.Random(11)
    base = [rng.randrange(2) for _ in range(64)]

    def flip(bits, positions):
        out = list(bits)
        for p in positions:
            out[p] ^= 1
        return out

    rows = {0: base, 1: flip(base, [0, 20, 40, 60]),      # ham 4: keep
            2: flip(base, [0, 13, 26, 39, 52]),           # one per band: ham 5, drop
            3: flip(base, [1, 2, 3, 4]),                  # 4 flips one band: keep
            4: [rng.randrange(2) for _ in range(64)]}     # random far
    df = spark.createDataFrame(
        [(i, "".join(map(str, b))) for i, b in rows.items()],
        "image_id long, bits string",
    )
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_near_pairs(df, "image_id", "bits", max_ham=4).collect()
    }
    import itertools

    def ham(a, b):
        return sum(x != y for x, y in zip(a, b))

    want = {
        (i, j, ham(rows[i], rows[j]))
        for i, j in itertools.combinations(sorted(rows), 2)
        if ham(rows[i], rows[j]) <= 4
    }
    assert got == want
    assert (0, 1, 4) in got and (0, 3, 4) in got
    assert all(p[:2] != (0, 2) for p in got)


def test_interval_overlap_drops_empty_intervals(spark):
    """[s, e) with e <= s is degenerate: it overlaps nothing (and must
    not trip sequence()'s descending mode)."""
    df = spark.createDataFrame(
        [(1, 0, 100), (2, 50, 50), (3, 80, 20)],
        "event_id long, start_ms long, end_ms long",
    )
    assert interval_overlap_pairs(df, bin_ms=100).collect() == []


def test_interval_overlap_randomized_negative_ts_and_odd_bin(spark):
    """Seeded randomized cross-check on the regime the crafted cases
    skip: timestamps STRADDLING ZERO (where ``cast('long')`` truncates
    toward zero instead of flooring — correct only because BOTH the bin
    expansion and the emit-at-overlap-start rule use the same
    truncation; this pins that consistency) and a bin width that divides
    nothing.  Exactly-once is asserted by comparing a LIST-sized collect
    against the SET-sized brute force."""
    import random

    rng = random.Random(42)
    ivs = []
    for i in range(80):
        s = rng.randint(-500, 450)
        ivs.append((i, s, s + rng.randint(1, 160)))
    df = spark.createDataFrame(ivs, "event_id long, start_ms long, end_ms long")
    for W in (100, 7, 333):
        rows = interval_overlap_pairs(df, bin_ms=W).collect()
        got = [(r["id_a"], r["id_b"], r["overlap_ms"]) for r in rows]
        want = _brute_overlaps(ivs)
        assert len(got) == len(want), f"W={W}: duplicate or dropped emissions"
        assert set(got) == want, f"W={W}"
