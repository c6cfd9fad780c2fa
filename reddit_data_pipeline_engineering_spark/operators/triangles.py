"""Triangle counting over a co-occurrence graph (degree-oriented, sampled).

No reference counterpart (the reference is an OpenAQ ETL); this is the
third canonical distributed graph kernel next to connected components
(``operators/components.py``) and PageRank (``operators/pagerank.py``).

Scale design (the parts that survive a 100 TB co-purchase graph):

- **Degree orientation** (Schank & Wagner 2005; the MapReduce form is
  Suri & Vassilvitskii, WWW'11 "Counting triangles and the curse of the
  last reducer"): every undirected edge is directed from its lower
  (degree, node) endpoint to the higher one. Wedge generation then joins
  oriented edges on their SOURCE, so a hub of degree d contributes
  O(arboricity) wedges instead of O(d^2) — the classic skew killer for
  power-law graphs.
- **Deterministic edge sparsification** (DOULION, Tsourakakis et al.
  KDD'09): keep an edge iff its md5 bucket falls below ``pct``; the
  triangle count on the sampled graph times (100/pct)^3 is an unbiased
  estimate of the full count. md5 bucketing (not RNG) keeps the sample —
  and therefore the oracle replay — engine- and cluster-size-invariant.
- **Equi-join closure**: wedges (v, w) carry v < w by node id and the
  base edge set already stores each undirected pair as (u < v), so the
  closing-edge probe is a plain two-column hash equi-join — never an OR
  of two orderings (which would force a nested-loop join).

All arithmetic is integer, so a DuckDB oracle replays the whole pipeline
bit-for-bit, including the scaled estimator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Distinct undirected part co-purchase edges (u < v) from order baskets.

    Basket self-join on the order key: shuffle is keyed by ``l_orderkey``
    and output is bounded by orders * basket_size^2 (TPC-H baskets are
    <= 7 rows), not by |lineitem|^2.
    """
    a = lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u")
    )
    b = lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v")
    )
    return (
        a.join(b, ["ok"])
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )


def sample_edges(edges: DataFrame, pct: int) -> DataFrame:
    """Deterministic DOULION edge sample: md5 bucket of "u:v" < pct."""
    key = F.concat(
        F.col("u").cast("string"), F.lit(":"), F.col("v").cast("string")
    )
    bucket = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % 100
    return edges.filter(bucket < pct)


def triangle_count(edges: DataFrame) -> DataFrame:
    """Count triangles in an undirected (u < v) edge set.

    Returns a 1-row DataFrame ``(n_wedges, n_triangles)``. Degree table
    is |V|-sized (small next to |E|) and joins broadcast under AQE; the
    wedge join and the closure probe are hash equi-joins.
    """
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    with_deg = edges.join(F.broadcast(du), "u").join(F.broadcast(dv), "v")
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = with_deg.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )
    e1 = oriented.select("src", F.col("dst").alias("v"))
    e2 = oriented.select("src", F.col("dst").alias("w"))
    wedges = e1.join(e2, ["src"]).filter(F.col("v") < F.col("w"))
    closed = wedges.join(
        edges.select(F.col("u").alias("v"), F.col("v").alias("w")),
        ["v", "w"],
    )
    n_wedges = wedges.agg(F.count(F.lit(1)).alias("n_wedges"))
    n_tri = closed.agg(F.count(F.lit(1)).alias("n_triangles"))
    return n_wedges.crossJoin(n_tri)


def per_node_triangles(edges: DataFrame) -> DataFrame:
    """Exact triangle count PER NODE, ``(node, t)``, for an undirected
    (u < v) edge set — the local-clustering companion of
    ``triangle_count``.

    Same degree-ordered orientation: each triangle materializes exactly
    once (at its unique corner whose two oriented out-edges cover it),
    then credits all three corners via a 3-way explode + one keyed
    count. The orientation bounds the wedge join by sum(outdeg^2) <=
    O(|E|^1.5) — no hot-node cap needed, the standard enumeration
    guarantee. Nodes in no triangle are absent (left-join + coalesce
    at the call site).
    """
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    with_deg = edges.join(F.broadcast(du), "u").join(F.broadcast(dv), "v")
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = with_deg.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )
    e1 = oriented.select("src", F.col("dst").alias("v"))
    e2 = oriented.select("src", F.col("dst").alias("w"))
    wedges = e1.join(e2, ["src"]).filter(F.col("v") < F.col("w"))
    closed = wedges.join(
        edges.select(F.col("u").alias("v"), F.col("v").alias("w")),
        ["v", "w"],
    ).localCheckpoint(eager=False)  # 3 corner branches share one pass
    corners = (
        closed.select(F.col("src").alias("node"))
        .unionAll(closed.select(F.col("v").alias("node")))
        .unionAll(closed.select(F.col("w").alias("node")))
    )
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("t"))
