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
count aggregate, one per-node struct-max argmax (map-side partial
aggregation — no per-node sort, the shuffle carries one partial row
per node per map partition) — all keyed on uniform node ids; label
state is one row per node. Labels are checkpointed per round (same
device as components/pagerank/bfs/kcore) to keep lineage flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
    # Deterministic argmax (highest count, then smallest label) as a
    # struct max — label negated so the max picks the smallest on count
    # ties. Aggregates partially map-side; the row_number-window
    # formulation shuffled and SORTED every (node, label) count row.
    best = F.max(
        F.struct(F.col("c"), (-F.col("label")).alias("neg_label"))
    ).alias("s")
    for _ in range(rounds):
        counts = (
            edges.join(labels, edges[src] == labels["node"])
            .select(F.col(dst).alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            counts.groupBy("node")
            .agg(best)
            .select("node", (-F.col("s.neg_label")).alias("label"))
        )
        if checkpoint:
            labels = labels.localCheckpoint(eager=True)
    return labels
