"""Deterministic k-means coarse quantizer for IVF-style ANN.

LLM-data-pipeline extension (no reference counterpart): the missing
piece the round-1 review called out — IVF blocking previously rode a
pre-existing ``label`` column; a real 100 TB ANN index computes its own
coarse centroids. This module is DataFrame-native Lloyd iteration:

- **assignment** is a map-side fold against broadcast centroid literals
  (k x dim values — model state, not data — so shipping them to the
  driver between iterations is O(k*dim), independent of corpus size);
- **update** is one hash aggregate per iteration (partial aggregation
  map-side, one shuffle keyed on the cluster id).

Determinism device: Lloyd's algorithm on floats is not reproducible
across engines (summation order), so the quantizer runs on
integer-quantized vectors — ``qx_i = floor(x_i * 16384)`` — and keeps
centroids on an integer grid (``c_i = floor(64 * sum(qx_i) / n)``).
Every distance is then EXACT 64-bit integer arithmetic (bounded by
64 * (2^19)^2 < 2^53, so even a double-typed fold is exact), which makes
cluster assignments bit-identical in any engine and any partitioning —
the DuckDB oracle can replay the whole fit. Production would swap the
grid for float Lloyd; the plan shape (broadcast centroids -> map fold ->
one keyed shuffle per iteration) is identical. Final candidate SCORING
stays exact cosine on the original float vectors — quantization only
affects which coarse cell a vector lands in.

Seeding: the k rows with the smallest ``md5(cast(id as string))`` — a
deterministic pseudo-random sample expressible in SQL (same device as
the hash-split operators, plans/queries_llm.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUANT_SCALE = 16384  # 2^14: |x| <= ~16 stays overflow-safe (see module doc)
CENT_SCALE = 64  # centroid grid is 64x finer than the vector grid


def quantized(vec: Column | str, scale: int = QUANT_SCALE) -> Column:
    """array<float> -> array<long> on the deterministic integer grid."""
    vec = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * F.lit(float(scale)))
    )


def _seed_order(id_col: str) -> list[Column]:
    return [
        F.md5(F.encode(F.col(id_col).cast("string"), "UTF-8")).asc(),
        F.col(id_col).asc(),
    ]


def nearest_centroid_expr(qv: Column) -> Column:
    """The argmin-with-tiebreak cluster expression of
    :func:`assign_clusters`, factored out (r11) so the joint IVF+PQ fit
    can evaluate it alongside the PQ code expression in ONE projection.
    Requires the ``__cents``/``__c2s`` broadcast columns in scope."""
    scored = F.transform(
        F.col("__cents"),
        lambda c, i: F.struct(
            (
                F.lit(-2 * CENT_SCALE)
                * F.aggregate(
                    F.zip_with(qv, c, lambda a, b: a * b),
                    F.lit(0).cast("long"),
                    lambda acc, v: acc + v,
                )
                + F.element_at(F.col("__c2s"), (i + F.lit(1)).cast("int"))
            ).alias("d"),
            i.cast("int").alias("c"),
        ),
    )
    return F.array_min(scored)["c"]


def centroid_rows_df(spark, centroids: list[list[int]]):
    """The one-row broadcastable centroid relation used by
    :func:`assign_clusters` (shared with the joint IVF+PQ fit)."""
    c2s = [sum(int(v) * int(v) for v in c) for c in centroids]
    return spark.createDataFrame(
        [([[int(v) for v in c] for c in centroids], c2s)],
        "__cents array<array<bigint>>, __c2s array<bigint>",
    )


def assign_clusters(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[int]],
    out_col: str = "cluster",
    pre_quantized: bool = False,
) -> DataFrame:
    """Add the nearest-centroid id (ties -> lowest cluster id): map-only,
    one exact integer fold per centroid against a broadcast centroid row.

    The per-centroid score is the REDUCED distance ``-128*dot(qx,c) +
    |c|^2``: expanding ``sum((qx*64 - c_i)^2)`` drops the ``4096*|qx|^2``
    term, which is constant per row across centroids, so the argmin (and
    every tie) is identical to the full squared distance while the fold
    does one multiply per dimension instead of two multiplies and a
    subtract. The centroids travel as DATA in a one-row broadcast
    relation (array<array<bigint>> + precomputed |c|^2 per cluster, both
    exact: <= 64*(2^20)^2 < 2^53), NOT as expression literals: a k x dim
    literal tree forced a fresh analysis + codegen compile on every
    Lloyd iteration (the literals change), which dominated iteration
    wall time; with the centroids in a broadcast row the expression tree
    is iteration-invariant, so the codegen cache serves every iteration
    after the first (measured ~3x faster per iteration at sf0.1)."""
    qv = F.col(vec_col) if pre_quantized else quantized(vec_col)
    cdf = centroid_rows_df(df.sparkSession, centroids)
    # array_min over structs is lexicographic (dist, cluster) — the same
    # argmin-with-tiebreak the oracle expresses as row_number over
    # ORDER BY dist, cluster (equal-tie sets: both scores differ by the
    # same per-row constant). transform's 2-arg lambda receives
    # (element, index); element_at is 1-based, hence the i + 1 inside
    # nearest_centroid_expr.
    return (
        df.crossJoin(F.broadcast(cdf))
        .withColumn(out_col, nearest_centroid_expr(qv))
        .drop("__cents", "__c2s")
    )


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iters: int = 2,
) -> list[list[int]]:
    """Fit k integer-grid centroids with ``iters`` Lloyd iterations.

    Each iteration: map-side assignment against the current broadcast
    centroids, then ONE hash aggregate keyed on (cluster, dimension) —
    the vector is posexploded so the update is k*dim narrow groups
    (map-side partial aggregation collapses each partition to <= k*dim
    rows before the shuffle) instead of a dim-wide column list, whose
    per-iteration Catalyst analysis cost dominated wall time at small
    scale. Only the k*dim aggregated rows come back to the driver.
    A cluster that loses all members drops out (both engines mirror
    this), so the result may have fewer than k centroids.
    """
    seeds = (
        df.orderBy(*_seed_order(id_col))
        .limit(k)
        .select(quantized(vec_col).alias("q"))
        .collect()
    )
    centroids = [
        [int(v) * CENT_SCALE for v in r["q"]] for r in seeds
    ]
    dim = len(seeds[0]["q"]) if seeds else 0
    import math

    # One materialization of the quantized vectors serves every Lloyd
    # iteration (and the seed scan already ran) — without it each
    # iteration re-reads and re-quantizes the corpus. At cluster scale
    # this is a MEMORY_AND_DISK persist of one narrow column.
    qdf = df.select(quantized(vec_col).alias("q")).persist()
    for _ in range(iters):
        assigned = assign_clusters(
            qdf, "q", centroids, out_col="cluster", pre_quantized=True
        )
        rows = (
            assigned.select("cluster", F.posexplode("q").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_cluster: dict[int, dict[int, tuple[int, int]]] = {}
        for r in rows:
            by_cluster.setdefault(r["cluster"], {})[r["pos"]] = (r["s"], r["n"])
        # floor((s*64)/n) via DOUBLE division on both sides: s*64 is exact
        # in double (< 2^33) and the correctly-rounded quotient + floor is
        # the same IEEE computation the oracle's floor(... / n) performs.
        # (Exact integer floor-division would NOT mirror SQL: // semantics
        # differ across engines for negative sums.)
        centroids = [
            [
                int(math.floor((dims[i][0] * float(CENT_SCALE)) / dims[i][1]))
                for i in range(dim)
            ]
            for _, dims in sorted(by_cluster.items())
        ]
    qdf.unpersist()
    return centroids
