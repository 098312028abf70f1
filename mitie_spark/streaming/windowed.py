"""Event-time streaming aggregation: watermarks, tumbling windows, and a
custom stateful operator (applyInPandasWithState).

The reference is batch-only (SURVEY.md §2.5: no streaming-state machinery
exists in MITIE; ner_stream "streams" only as a Unix pipe), so these are
Spark-first additions for the continuous-ingest shape of a web-scale
pipeline: pages arrive with event time `warc_ts`, mention/triple counts
roll up per window, and late pages are bounded by the watermark so state
is evicted instead of growing without bound.

Scale notes: windowed aggregation state is partitioned by (window, key) —
the same shuffle as a batch groupBy; the watermark is what makes 10^12-doc
ingest feasible (state eviction). The stateful operator keeps one small
running-count record per key with a processing-time timeout.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "tag",
    window_len: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling event-time window counts with a late-data watermark.

    Works on both batch and streaming DataFrames (the streaming case needs
    the watermark for append-mode output + state eviction)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_len).alias("win"), F.col(key_col))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n",
        )
    )


_STATE_SCHEMA = StructType([StructField("total", LongType())])
_OUT_SCHEMA = StructType(
    [
        StructField("tag", StringType()),
        StructField("batch_n", LongType()),
        StructField("running_total", LongType()),
    ]
)


_IDLE_TIMEOUT_MS = 30 * 60 * 1000  # evict keys idle for 30 processing-min


def _running_count_fn(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-key running total across micro-batches (custom stateful op).
    A key idle past the processing-time timeout has its record EVICTED —
    this is what bounds state at 10^12-doc key cardinality (the module
    docstring's promise); a re-appearing key restarts its tally."""
    if state.hasTimedOut:
        state.remove()
        return
    n = 0
    for pdf in pdfs:
        n += len(pdf)
    (total,) = state.get if state.exists else (0,)
    total += n
    state.update((total,))
    state.setTimeoutDuration(_IDLE_TIMEOUT_MS)
    yield pd.DataFrame(
        {"tag": [key[0]], "batch_n": [n], "running_total": [total]}
    )


def running_counts_stateful(stream: DataFrame, key_col: str = "tag") -> DataFrame:
    """Streaming running count per key via applyInPandasWithState — the
    template for MITIE-shaped custom stateful operators (e.g. incremental
    entity-frequency tallies feeding the linking dictionary). State is
    bounded by the processing-time idle timeout (see _running_count_fn)."""
    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            _running_count_fn,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def streaming_exact_dedup(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Continuous-ingestion exact dedup: emit each key once, drop repeats.

    `withWatermark + dropDuplicatesWithinWatermark` is Spark's built-in
    stateful dedup with bounded state: an entry per key is held only until
    the watermark passes its event time, then evicted — memory tracks the
    dedup horizon, not the stream's lifetime. (Plain `dropDuplicates(keys)`
    without the event-time column among the keys never evicts: its state
    grows forever. That foot-gun is why this wrapper exists.) This is the
    streaming twin of the batch `dedup_exact_groups` hash-groupBy: a
    pipeline ingesting a crawl feed continuously dedups (url, content-hash)
    here before the extraction stage sees the page."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )
