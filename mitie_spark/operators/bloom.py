"""Distributed Bloom filter — the crawl frontier's seen-URL set.

A recrawl frontier asks "have we ever fetched this URL?" billions of
times; the classic answer is a Bloom filter over the seen set (no false
negatives, tunable false-positive rate).  This builds one AS A
DATAFRAME — (word_index, bits) rows, 63 bits per word — so the build is
a plain aggregation and membership is a join, both expressible
identically in SQL (every step is integer/boolean arithmetic, so the
whole operator passes a DuckDB value-hash gate bit-for-bit).

Hash family: position_i(url) = int64(first 8 hex chars of
md5("{seed}:{i}:" || url)) mod m_bits — md5 is the one keyed hash both
engines share (same convention as the md5-bucket domain mixing in
queries_llmdata.py).  k positions per url; word = pos DIV 63, mask =
1 << (pos MOD 63) — 63 usable bits per int64 word, bit 63 excluded
because DuckDB overflow-checks ``1::BIGINT << 63`` (and positive masks
compare identically everywhere).

Scale shape: the BUILD is one explode(k) + groupBy(word) BIT_OR — one
shuffle of (word, mask) int pairs, never URLs.  The filter itself is
m_bits/63 rows (a 1-billion-bit filter is ~16M rows ≈ 256 MB) — small
enough to BROADCAST, so the PROBE side is k broadcast left joins:
the billion-row frontier never shuffles at all.  False-
positive rate follows the standard (1 - e^{-kn/m})^k; size m_bits ≈
10–15 bits per seen URL for ~1% at k=4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_build", "bloom_probe"]


def _positions(url_col: str, m_bits: int, k: int, seed: str):
    """k bit positions as (word, mask) column pairs.

    Built as SQL expressions because the Python ``F.shiftleft`` binding
    only accepts a literal shift amount — the SQL function takes a
    column.  ``DIV`` is Spark's exact integer division."""
    out = []
    for i in range(k):
        h = f"md5(concat('{seed}:{i}:', {url_col}))"
        pos = f"(cast(conv(substring({h}, 1, 8), 16, 10) as bigint) % {m_bits})"
        word = F.expr(f"{pos} DIV 63")
        mask = F.expr(f"shiftleft(cast(1 as bigint), cast({pos} % 63 as int))")
        out.append((word, mask))
    return out


def bloom_build(
    seen: DataFrame,
    url_col: str = "url",
    m_bits: int = 1 << 16,
    k: int = 4,
    seed: str = "bloom",
) -> DataFrame:
    """Seen URLs → (word, bits) Bloom rows (absent word = all-zero)."""
    pairs = _positions(url_col, m_bits, k, seed)
    stacked = seen.select(
        F.explode(
            F.array(
                *[
                    F.struct(w.alias("word"), m.alias("mask"))
                    for w, m in pairs
                ]
            )
        ).alias("wm")
    ).select(F.col("wm.word").alias("word"), F.col("wm.mask").alias("mask"))
    built = stacked.groupBy("word").agg(F.expr("bit_or(mask)").alias("bits"))
    # EAGER: the filter is a small artifact probed many times — without
    # the cut, each of bloom_probe's k broadcast joins replays the whole
    # seen-set scan+aggregate (measured: 4 full builds per probe; Spark's
    # ReuseExchange does not canonicalize across the per-join aliases).
    # Lifetime note: the checkpointed blocks live in executor storage
    # until the returned DataFrame is garbage-collected (ContextCleaner
    # reclaims them) — callers building MANY filters in one long session
    # should drop references promptly rather than accumulate them
    return built.localCheckpoint(eager=True)


def bloom_probe(
    bloom: DataFrame,
    probes: DataFrame,
    url_col: str = "url",
    m_bits: int = 1 << 16,
    k: int = 4,
    seed: str = "bloom",
) -> DataFrame:
    """(url, maybe_seen) per probe row.  maybe_seen=false is definitive
    (no false negatives); true is probabilistic at the filter's FPR.

    Probe rows stay 1:1 through k broadcast LEFT JOINs (one per hash) —
    an explode+groupBy formulation would re-shuffle the frontier on url,
    which at billions of probes IS the cost; k map-side joins against
    the broadcast filter keep the probe side fully narrow."""
    pairs = _positions(url_col, m_bits, k, seed)
    res = probes  # passenger columns ride along untouched
    hits = []
    for i, (w, m) in enumerate(pairs):
        b = bloom.select(
            F.col("word").alias(f"_w{i}"), F.col("bits").alias(f"_b{i}")
        )
        res = res.withColumn(f"_word{i}", w).withColumn(f"_mask{i}", m)
        res = res.join(
            F.broadcast(b), res[f"_word{i}"] == b[f"_w{i}"], "left"
        )
        hits.append(
            F.coalesce(F.col(f"_b{i}"), F.lit(0).cast("long")).bitwiseAND(
                F.col(f"_mask{i}")
            )
            == F.col(f"_mask{i}")
        )
    maybe = hits[0]
    for h in hits[1:]:
        maybe = maybe & h
    return res.select(*probes.columns, maybe.alias("maybe_seen"))
