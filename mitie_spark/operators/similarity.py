"""Similarity search over embedding columns.

- ``brute_force_topk``: exact cosine top-k — the baseline. Query set is
  broadcast; candidates are scored in one narrow pass (JVM-side
  zip_with/aggregate expressions, no Python) and ranked per query.
- ``ivf_topk``: IVF-style ANN — k-means-lite centroids (deterministic
  seeding, Lloyd iterations as DataFrame aggregations), candidates searched
  only within the ``nprobe`` closest cells. At 100 TB the cell assignment is
  the partition key: cells are written bucketed-by-cell so a query touches
  nprobe buckets instead of the full corpus.
- ``cosine_near_duplicates``: random-hyperplane LSH blocking + exact cosine
  verify — the embedding-space near-dup detector.

Reference precedent for LSH-bucketed neighbor search: the wordrep k-NN tool
(/root/reference/tools/wordrep/src/main.cpp:197-256).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


# Default quantization for oracle-gated cosine scoring: with |x| ≤ O(1)
# embeddings and dims in the hundreds, floor(x·1e6)² sums stay far below
# 2^53, so the dot products are exact INTEGERS under any summation order —
# NumPy's pairwise batch sum here and DuckDB's sequential fold produce the
# same bits by construction, and the scoring runs as one Arrow batch
# instead of the interpreted F.aggregate folds this replaced (which were
# the last HOF lambdas in a gated hot path).
QUANT_SCALE = 1_000_000.0


def _cos_pair_udf(scale: float | None):
    """(vec, vec) → cosine, one NumPy batch per Arrow chunk.

    ``scale`` set: cosine of floor(x·scale)-quantized vectors — every
    product is integer-valued and exact in float64, so the value is
    engine-independent (the oracle applies the identical FLOOR(x·scale)
    transform). ``scale`` None: raw float64 cosine (non-gated paths)."""

    @F.pandas_udf("double")
    def cos_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        if not len(a):
            return pd.Series([], dtype="float64")
        A = np.stack(a.map(np.asarray).values).astype(np.float64)
        B = np.stack(b.map(np.asarray).values).astype(np.float64)
        if scale is not None:
            A = np.floor(A * scale)
            B = np.floor(B * scale)
        dots = (A * B).sum(axis=1)
        na = np.sqrt((A * A).sum(axis=1))
        nb = np.sqrt((B * B).sum(axis=1))
        # zero-norm guard: quantization can floor a tiny-magnitude vector
        # to all zeros (components in [0, 1/scale)), and 0/0 would leak a
        # platform-shaped NaN into ranking; emit an explicit NaN — Arrow
        # surfaces it as SQL NULL, the same value the F.aggregate
        # expressions this UDF replaced produced for 0/0
        denom = na * nb
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = np.where(denom == 0.0, np.nan, dots / denom)
        return pd.Series(cos)

    return cos_udf


def brute_force_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_decimals: int | None = None,
    quantize_scale: float | None = None,
) -> DataFrame:
    """→ (qid, cid, cos, rk) — exact top-k by cosine, vec_id tie-break.
    Scoring is one vectorized Arrow batch over the broadcast-joined pairs.
    ``round_decimals``: round cos BEFORE ranking. ``quantize_scale``: rank
    the cosine of floor(x·scale)-quantized vectors — integer-exact dots
    make the value engine-independent (the oracle-gated form; see
    _cos_pair_udf)."""
    # null embeddings cannot be scored (np.stack over a batch containing
    # None raises and kills the whole task); drop them on BOTH sides like
    # assign_cells does — a vector-less row has no cosine to anything
    q = queries.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qe")
    )
    c = candidates.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("ce")
    )
    cos = _cos_pair_udf(quantize_scale)("qe", "ce")
    if round_decimals is not None:
        cos = F.round(cos, round_decimals)
    scored = c.join(F.broadcast(q)).select("qid", "cid", cos.alias("cos"))
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    return (
        scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
    )


def train_centroids(
    df: DataFrame, n_cells: int = 16, vec_col: str = "embedding",
    iters: int = 2, seed: int = 7,
) -> np.ndarray:
    """k-means-lite: deterministic sample init + `iters` Lloyd rounds, each a
    single groupBy aggregation over the assignment (scales: only centroids
    come back to the driver). The input is persisted for the loop — each
    round re-scans it, and recomputing an expensive upstream per round
    would multiply its cost."""
    df = df.select(vec_col).persist()
    probe = df.first()
    if probe is None:
        raise ValueError("train_centroids: empty input (no vectors)")
    dim = len(probe[0])
    init = (
        df.select(vec_col)
        .orderBy(F.md5(F.concat_ws(",", F.col(vec_col).cast("array<string>"))))
        .limit(n_cells)
        .collect()
    )
    cents = np.array([r[0] for r in init], dtype=np.float64)
    for _ in range(iters):
        assigned = assign_cells(df, cents, vec_col=vec_col)
        sums = (
            assigned.select(
                "cell", F.posexplode(vec_col).alias("i", "v")
            )
            .groupBy("cell", "i")
            .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new = np.array(cents)
        bucket = {}
        for r in sums:
            bucket.setdefault(r["cell"], {})[r["i"]] = (r["s"], r["n"])
        for cell, comps in bucket.items():
            vec = np.array([comps[i][0] / comps[i][1] for i in range(dim)])
            new[cell] = vec
        cents = new
    df.unpersist(blocking=False)  # centroids are materialized ndarrays
    return cents


def assign_cells(
    df: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Add a `cell` column: index of the nearest centroid (batched NumPy).
    Null embeddings are dropped (a null row would make np.stack ragged and
    kill the task; a vector-less row cannot be assigned a cell anyway)."""
    df = df.filter(F.col(vec_col).isNotNull())
    cents = centroids.astype(np.float64)

    @F.pandas_udf("int")
    def cell_udf(vecs: pd.Series) -> pd.Series:
        if not len(vecs):  # Arrow can hand a UDF an empty batch
            return pd.Series([], dtype="int32")
        M = np.stack(vecs.map(np.asarray).values).astype(np.float64)
        # nearest by euclidean distance: argmin ||x||² - 2x·c + ||c||²
        d = (M * M).sum(1)[:, None] - 2 * M @ cents.T + (cents * cents).sum(1)[None, :]
        return pd.Series(np.argmin(d, axis=1).astype(np.int32))

    return df.withColumn("cell", cell_udf(F.col(vec_col)))


def ivf_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize_scale: float | None = None,
) -> DataFrame:
    """ANN: search only the nprobe nearest cells per query."""
    queries = queries.filter(F.col(vec_col).isNotNull())
    cents = train_centroids(candidates, n_cells=n_cells, vec_col=vec_col)
    c = assign_cells(candidates, cents, vec_col=vec_col).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("ce"), "cell"
    )

    cents_local = cents

    @F.pandas_udf("array<int>")
    def probe_udf(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype="object")
        M = np.stack(vecs.map(np.asarray).values).astype(np.float64)
        d = (
            (M * M).sum(1)[:, None]
            - 2 * M @ cents_local.T
            + (cents_local * cents_local).sum(1)[None, :]
        )
        order = np.argsort(d, axis=1)[:, :nprobe]
        return pd.Series([row.astype(np.int32).tolist() for row in order])

    q = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qe"),
        F.explode(probe_udf(F.col(vec_col))).alias("cell"),
    )
    scored = c.join(F.broadcast(q), "cell").select(
        "qid",
        "cid",
        _cos_pair_udf(quantize_scale)("qe", "ce").alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    return (
        scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
    )


def cosine_near_duplicates(
    df: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
    center: "np.ndarray | None" = None,
) -> DataFrame:
    """Random-hyperplane LSH: sign-bit signatures → banded bucket join →
    exact cosine verify ≥ threshold.

    ``center``: optional vector subtracted before projection (BLOCKING
    only — verification still scores raw cosine). All-positive vector
    families (count vectors, ReLU embeddings) have heavily biased sign
    bits: most rows share a handful of sign patterns, buckets collapse,
    and the bucket join degenerates toward quadratic. Centering on the
    (approximate) data mean de-biases the bits; since near-identical
    vectors stay near-identical after the shift, true near-dups still
    collide and the exact verify keeps the output sound."""
    r_planes = n_planes // bands
    if not (1 <= r_planes <= 32):
        raise ValueError(
            f"planes-per-band must be in [1, 32], got {r_planes} "
            f"(n_planes={n_planes}, bands={bands})"
        )
    probe = df.select(vec_col).first()
    if probe is None:
        raise ValueError("cosine_near_duplicates: empty input (no vectors)")
    dim = len(probe[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))

    shift = None if center is None else np.asarray(center, dtype=np.float64)

    @F.pandas_udf("array<long>")
    def band_udf(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype="object")
        M = np.stack(vecs.map(np.asarray).values).astype(np.float64)
        if shift is not None:
            M = M - shift
        bits = (M @ planes.T) > 0  # (n, n_planes)
        out = []
        for row in bits:
            sig = []
            for b in range(bands):
                chunk = row[b * r_planes : (b + 1) * r_planes]
                v = 0
                for bit in chunk:
                    v = (v << 1) | int(bit)
                # band index in the high bits, clear of the ≤32 value bits —
                # a plain (b << 16) | v overflowed int32 above 16 planes per
                # band and collided buckets across bands at 17-30
                sig.append((b << 48) | v)
            out.append(sig)
        return pd.Series(out)

    vecs = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    sig = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.explode(band_udf(F.col(vec_col))).alias("bucket"),
    )
    l = sig.select(F.col("id").alias("id_a"), "bucket")
    r = sig.select(F.col("id").alias("id_b"), "bucket")
    # dedupe band-duplicate pairs on ids alone — carrying the embedding
    # arrays through the distinct() exchange would shuffle every vector
    # once per matching band
    pairs = (
        l.join(r, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # shuffle joins by design: at corpus scale BOTH sides can be huge (the
    # vectors always, the pair list after a bad-parameter blocking round),
    # so neither is safe to broadcast statically — AQE converts either
    # side to a broadcast at runtime when its measured size allows
    joined = pairs.join(
        vecs.select(F.col("id").alias("id_a"), F.col("vec").alias("va")), "id_a"
    ).join(
        vecs.select(F.col("id").alias("id_b"), F.col("vec").alias("vb")), "id_b"
    )

    # vectorized verify: this operator is not oracle-gated, so the exact
    # cosine can run as one NumPy batch per Arrow chunk instead of
    # interpreted folds per pair (the folds are kept in brute_force/ivf,
    # whose queries ARE value-hash-gated against DuckDB's fold)
    @F.pandas_udf("double")
    def _cos_batch(a: pd.Series, b: pd.Series) -> pd.Series:
        if not len(a):
            return pd.Series([], dtype="float64")
        A = np.stack(a.map(np.asarray).values).astype(np.float64)
        B = np.stack(b.map(np.asarray).values).astype(np.float64)
        dots = (A * B).sum(axis=1)
        return pd.Series(
            dots
            / (np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1))
        )

    return joined.select(
        "id_a", "id_b", _cos_batch("va", "vb").alias("cos")
    ).filter(F.col("cos") >= threshold)
