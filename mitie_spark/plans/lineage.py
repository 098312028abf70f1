"""Per-stage lineage + resume bookkeeping.

North rule: "Every stage checkpoints per-partition lineage and counters so
runs resume idempotently." Each pipeline stage materializes to parquet; next
to it we write `<stage>.lineage.json` carrying input/output row counts, a
per-partition output histogram, and the stage config hash. A stage re-runs
only if its output is missing, incomplete (no _SUCCESS), or its config hash
changed — so a killed run resumes from the last completed stage and re-runs
are byte-stable."""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def config_hash(conf: dict) -> str:
    return hashlib.md5(
        json.dumps(conf, sort_keys=True, default=str).encode()
    ).hexdigest()[:12]


def _lineage_path(out_path: str) -> str:
    return out_path.rstrip("/") + ".lineage.json"


def stage_is_complete(out_path: str, conf_hash: str) -> bool:
    lp = _lineage_path(out_path)
    if not (
        os.path.exists(os.path.join(out_path, "_SUCCESS")) and os.path.exists(lp)
    ):
        return False
    try:
        with open(lp) as f:
            rec = json.load(f)
        return rec.get("config_hash") == conf_hash
    except (json.JSONDecodeError, OSError):
        return False


def write_stage(
    df: DataFrame,
    out_path: str,
    stage: str,
    conf: dict,
    partition_by: list[str] | None = None,
    input_rows: int | None = None,
) -> dict:
    """Materialize a stage → parquet + lineage record. Returns the record."""
    t0 = time.time()
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(out_path)

    spark = df.sparkSession
    back = spark.read.parquet(out_path)
    part_hist = [
        {"partition": int(r["pid"]), "rows": int(r["rows"])}
        for r in back.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.count("*").alias("rows"))
        .collect()
    ]
    rec = {
        "stage": stage,
        "output": out_path,
        "config_hash": config_hash(conf),
        "config": {k: str(v) for k, v in conf.items()},
        "input_rows": input_rows,
        "output_rows": int(sum(p["rows"] for p in part_hist)),
        "partitions": len(part_hist),
        "partition_histogram": sorted(part_hist, key=lambda p: -p["rows"])[:32],
        "wall_sec": round(time.time() - t0, 3),
    }
    with open(_lineage_path(out_path), "w") as f:
        json.dump(rec, f, indent=1)
    return rec


def read_lineage(out_path: str) -> dict | None:
    lp = _lineage_path(out_path)
    if os.path.exists(lp):
        with open(lp) as f:
            return json.load(f)
    return None
