"""Streaming windowed aggregation with watermark: append-mode finalization
and late-data drop — the idiomatic fix for the reference's unimplemented
30-minute timeout comment (SURVEY §2 T7)."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from stateful_spark_streaming_spark.streaming.pipeline import file_flight_source

FLIGHTS = ["ASA2", "SWA510", "SWA2706"]


def _csv_line(fid: str, tick: int) -> str:
    t = f"3/16/2012 02:25:{30 + tick:02d} PM"
    return f'"{fid}","{t}",-79.58,34.26,"IAD","TPA","B733",37000'


def _write_batch(dirpath: str, batch_no: int, ticks: list[int]) -> None:
    lines = [_csv_line(f, t) for t in ticks for f in FLIGHTS]
    with open(os.path.join(dirpath, f"batch{batch_no:03d}.csv"), "w") as f:
        f.write("\n".join(lines) + "\n")


def test_watermark_append_finalizes_and_drops_late(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_batch(src, 1, list(range(10)))  # ts :30-:39 → fills window [:30,:40)

    source = file_flight_source(spark, src)
    windowed = (
        source.withWatermark("ts", "5 seconds")
        .groupBy(F.window("ts", "10 seconds").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").cast("string").alias("start"), "n")
    )
    q = (
        windowed.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_counts")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0.5 seconds")
        .start()
    )
    try:
        # batch 2 pushes event time to :49 → watermark :44 → [:30,:40) final
        _wait_files_consumed(q, 1)
        _write_batch(src, 2, list(range(10, 20)))
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            rows = spark.sql("select * from win_counts").collect()
            if rows:
                break
            time.sleep(0.5)
        got = {r.start: r.n for r in rows}
        assert any(s.endswith("25:30") for s in got), f"window not finalized: {got}"
        first = [v for s, v in got.items() if s.endswith("25:30")][0]
        assert first == 30  # 3 flights × 10 ticks

        # batch 3 is LATE (tick 2 → ts :32, far behind watermark :44) —
        # appended window results must not change
        _write_batch(src, 3, [2])
        _wait_files_consumed(q, 3)
        rows2 = spark.sql("select * from win_counts").collect()
        got2 = {r.start: r.n for r in rows2}
        assert [v for s, v in got2.items() if s.endswith("25:30")][0] == 30, (
            "late row leaked into a finalized window"
        )
    finally:
        q.stop()


def _wait_files_consumed(q, n_batches: int, timeout: float = 60.0) -> None:
    deadline = time.time() + timeout
    while time.time() < deadline:
        p = q.lastProgress
        if p and p.get("batchId", -1) >= n_batches:
            return
        time.sleep(0.4)
