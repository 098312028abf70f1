"""Event-time windowed aggregation + custom stateful operator tests."""

import json
import time

from pyspark.sql import functions as F


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_windowed_counts_batch_semantics(spark):
    from mitie_spark.streaming.windowed import windowed_counts

    df = spark.createDataFrame(
        [
            ("2024-01-01 10:05:00", "PERSON"),
            ("2024-01-01 10:55:00", "PERSON"),
            ("2024-01-01 11:05:00", "PERSON"),
            ("2024-01-01 10:20:00", "LOCATION"),
        ],
        "ts_s string, tag string",
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "tag")
    out = {
        (str(r["window_start"]), r["tag"]): r["n"]
        for r in windowed_counts(df, window_len="1 hour").collect()
    }
    assert out[("2024-01-01 10:00:00", "PERSON")] == 2
    assert out[("2024-01-01 11:00:00", "PERSON")] == 1
    assert out[("2024-01-01 10:00:00", "LOCATION")] == 1


def test_windowed_counts_streaming_with_watermark(spark, tmp_path):
    from mitie_spark.streaming.windowed import windowed_counts

    indir = tmp_path / "in"
    indir.mkdir()
    _write_jsonl(
        indir / "b1.jsonl",
        [
            {"ts": "2024-01-01T10:05:00", "tag": "PERSON"},
            {"ts": "2024-01-01T10:45:00", "tag": "PERSON"},
            {"ts": "2024-01-01T11:10:00", "tag": "LOCATION"},
        ],
    )
    stream = (
        spark.readStream.schema("ts timestamp, tag string")
        .json(str(indir))
    )
    agg = windowed_counts(stream, window_len="1 hour", watermark="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (str(r["window_start"]), r["tag"]): r["n"]
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert rows[("2024-01-01 10:00:00", "PERSON")] == 2
    assert rows[("2024-01-01 11:00:00", "LOCATION")] == 1


def test_running_counts_stateful_across_microbatches(spark, tmp_path):
    """applyInPandasWithState accumulates per-key state across micro-batches
    (maxFilesPerTrigger=1 forces two batches)."""
    from mitie_spark.streaming.windowed import running_counts_stateful

    indir = tmp_path / "in2"
    indir.mkdir()
    _write_jsonl(
        indir / "a.jsonl",
        [{"tag": "PERSON"}, {"tag": "PERSON"}, {"tag": "ORG"}],
    )
    # ensure distinct mtimes so file ordering is stable
    time.sleep(0.05)
    _write_jsonl(indir / "b.jsonl", [{"tag": "PERSON"}])

    stream = (
        spark.readStream.schema("tag string")
        .option("maxFilesPerTrigger", 1)
        .json(str(indir))
    )
    out = running_counts_stateful(stream, key_col="tag")
    q = (
        out.writeStream.format("memory")
        .queryName("running_counts")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM running_counts").collect()
    person_totals = sorted(
        r["running_total"] for r in rows if r["tag"] == "PERSON"
    )
    # two micro-batches: totals 2 then 3 (state carried), ORG stays at 1
    assert person_totals == [2, 3]
    assert [r["running_total"] for r in rows if r["tag"] == "ORG"] == [1]


def test_streaming_exact_dedup(spark, tmp_path):
    """Duplicate keys arriving across micro-batches are emitted once."""
    import pandas as pd

    from mitie_spark.streaming.windowed import streaming_exact_dedup

    src = tmp_path / "in"
    src.mkdir()
    # datetime64[us]: Spark's parquet reader expects micros, pandas
    # defaults to nanos
    pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:01:00"]
            ).astype("datetime64[us]"),
            "url": ["a", "b"],
        }
    ).to_parquet(src / "batch1.parquet")
    pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01 00:02:00", "2024-01-01 00:03:00"]
            ).astype("datetime64[us]"),
            "url": ["a", "c"],  # 'a' is a repeat
        }
    ).to_parquet(src / "batch2.parquet")

    stream = (
        spark.readStream.schema("ts timestamp, url string")
        .option("maxFilesPerTrigger", 1)  # force separate micro-batches
        .parquet(str(src))
    )
    out = streaming_exact_dedup(stream, ["url"], ts_col="ts")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT url FROM dedup_sink").collect()
    assert sorted(r["url"] for r in rows) == ["a", "b", "c"]


def test_stream_static_enrichment_join(spark, tmp_path):
    """Stream-static join: a streaming feed enriched against a static
    dimension (the broadcast pattern a streaming extraction pipeline uses
    for alias/gazetteer lookup)."""
    import pandas as pd

    from pyspark.sql import functions as F

    src = tmp_path / "in"
    src.mkdir()
    pd.DataFrame({"url": ["a", "b", "c"], "domain": ["x.org", "y.org", "x.org"]}).to_parquet(
        src / "b1.parquet"
    )
    dim = spark.createDataFrame(
        pd.DataFrame({"domain": ["x.org", "y.org"], "tier": [1, 2]})
    )
    stream = spark.readStream.schema("url string, domain string").parquet(
        str(src)
    )
    joined = stream.join(F.broadcast(dim), "domain", "left")
    q = (
        joined.writeStream.format("memory")
        .queryName("enrich_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.awaitTermination(120)
    rows = {
        r["url"]: r["tier"]
        for r in spark.sql("SELECT url, tier FROM enrich_sink").collect()
    }
    assert rows == {"a": 1, "b": 2, "c": 1}
