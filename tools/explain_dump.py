"""Dump ``explain('formatted')`` for catalog queries to files.

  python tools/explain_dump.py <repo_root> <sf_dir> <out_dir> <suffix> q [q ...]

Writes ``<out_dir>/<query>_<suffix>.txt`` per query.  ``repo_root`` is
inserted at sys.path[0], so the same script can dump plans from a git
worktree of an OLDER commit (the "_before" side of an optimization A/B)
as well as from the live tree — the judge checks plan-shape claims
against these files.  Queries whose function runs eager setup actions
(probes, counts, stream replays) execute those; the dumped plan is the
plan of the RETURNED DataFrame, exactly what the bench's noop action
executes.
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    repo_root, sf_dir, out_dir, suffix = sys.argv[1:5]
    names = sys.argv[5:]
    sys.path.insert(0, repo_root)

    import importlib

    entrymod = importlib.import_module("__spark_entry__")
    from stateful_spark_streaming_spark.session import get_spark

    spark = get_spark("explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
