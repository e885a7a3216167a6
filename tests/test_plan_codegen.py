"""Positive whole-stage-codegen evidence from EXECUTED plans.

plan_audit.py intentionally reports no codegen counts: the
pre-execution formatted plan under AQE hides `(codegen id : N)`
annotations, so a static audit always read 0.  This test executes
representative queries and asserts the FINAL adaptive plan actually ran
with whole-stage codegen — the JVM-side guarantee the repo's "UDFs are
the slow path" design rests on."""

from __future__ import annotations

from stateful_spark_streaming_spark.operators.relational import pricing_summary
from stateful_spark_streaming_spark.sources.tables import load_table


def test_executed_plans_use_wholestage_codegen(spark, sf_dir):
    import re

    df = pricing_summary(load_table(spark, sf_dir, "lineitem"))
    df.collect()  # materialize so AQE finalizes the plan
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final
    # codegen stages render as `*(N) Operator` in the executed tree; the
    # scan→partial-aggregate hot path must sit inside one, not interpreted
    assert re.search(r"\*\(\d+\) HashAggregate", final), final[:500]
