"""Synchronous label propagation (LPA) — community detection.

Completes the distributed graph-kernel family (components, PageRank,
triangles, BFS, k-core): every node starts with its own label and each
round adopts the most frequent label among its neighbors — the
near-linear-time community detector of Raghavan et al. (Phys. Rev. E
76, 2007). This is the SYNCHRONOUS variant with a deterministic
tie-break (highest count, then smallest label), so a fixed round count
is engine-exact and the DuckDB oracle replays every round as unrolled
CTEs. (Classic async LPA breaks ties randomly; determinism is the
price of bit-exact verifiability, and the synchronous schedule is the
one that maps to a distributed engine anyway.)

Scale shape per round: one join of the edge list against the bounded
(node, label) relation on ``src`` (keyed shuffle), one (dst, label)
count aggregate, one per-node argmax window — all keyed on uniform
node ids; label state is one row per node. Labels are checkpointed per
round (same device as components/pagerank/bfs/kcore) to keep lineage
flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_propagation(
    edges: DataFrame,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """(node, label) after ``rounds`` synchronous LPA updates.

    ``edges`` must be symmetrized; the node universe is derived from
    edge endpoints, so every tracked node has at least one neighbor.
    """
    if checkpoint:
        edges = edges.localCheckpoint(eager=True)
    labels = (
        edges.select(F.col(src).alias("node")).distinct()
        .withColumn("label", F.col("node"))
    )
    if checkpoint:
        labels = labels.localCheckpoint(eager=True)
    w = Window.partitionBy("node").orderBy(
        F.col("c").desc(), F.col("label").asc()
    )
    for _ in range(rounds):
        counts = (
            edges.join(labels, edges[src] == labels["node"])
            .select(F.col(dst).alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "label")
        )
        if checkpoint:
            labels = labels.localCheckpoint(eager=True)
    return labels
