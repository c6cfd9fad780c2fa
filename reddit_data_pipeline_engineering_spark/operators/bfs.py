"""Breadth-first search / unweighted single-source shortest paths.

The fourth distributed graph kernel (components, PageRank, triangles are
the other three): frontier expansion with min-distance merge — the
pattern behind reachability, radius probes, and delta-stepping SSSP.

Scale shape per round: one hash join of the CURRENT FRONTIER (not the
whole visited set) against the edge list on ``src``, then a min-merge
groupBy on ``node``. Both are keyed shuffles on uniform ids; the visited
set is carried as a (node, dist) relation and localCheckpointed each
round so lineage stays flat (same device as components/pagerank). Rounds
are bounded by the probe depth, not the graph diameter — this is a
k-hop probe, and the oracle replays every round as unrolled CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_levels(
    edges: DataFrame, source: int, rounds: int, checkpoint: bool = True
) -> DataFrame:
    """(node, dist) for every node within ``rounds`` hops of ``source``.

    ``edges`` must be directed (src, dst) — symmetrize first for
    undirected semantics. Distances are exact minimum hop counts within
    the probed radius.
    """
    spark = edges.sparkSession
    if checkpoint:
        # Materialize the edge relation ONCE — every round scans it, and
        # without this the upstream plan (e.g. a fact-table join) would
        # recompute per round. The visited set is checkpointed per round
        # for the same reason plus lineage truncation.
        edges = edges.localCheckpoint(eager=True)
    levels = spark.createDataFrame(
        [(source, 0)], "node long, dist int"
    )
    for t in range(1, rounds + 1):
        frontier = levels.filter(F.col("dist") == t - 1).select(
            F.col("node").alias("src")
        )
        cand = (
            frontier.join(edges, "src")
            .select(F.col("dst").alias("node"), F.lit(t).alias("dist"))
        )
        levels = (
            levels.unionAll(cand)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        if checkpoint:
            levels = levels.localCheckpoint(eager=True)
    return levels
