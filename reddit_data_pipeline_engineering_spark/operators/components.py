"""Connected components over candidate-pair graphs (dedup clustering).

Training-data pipelines need the step AFTER near-dup candidate generation:
grouping pairs into duplicate clusters and electing one canonical document
per cluster. That is connected components on the pair graph.

Implementation: iterative minimum-label propagation on DataFrames —
every vertex starts labeled with itself; each round takes the min label
over its neighborhood; stop when no label changes. Rounds = graph diameter
(near-dup clusters are dense, so typically 2-4). Each round is one join +
one aggregate; intermediates are cached and the lineage is cut with
localCheckpoint so the plan doesn't grow exponentially across iterations
(the classic Spark iterative-algorithm trap).

At 100 TB-scale pair graphs, swap label propagation for the
large-star/small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond") — same DataFrame primitives, provably O(log n)
rounds; propagation is kept here because candidate-pair components are
tiny-diameter by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iterations: int = 25,
) -> DataFrame:
    """Return (id, component) with component = min vertex id reachable.

    ``edges`` is an undirected pair list (each pair once, either order).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .persist()
    )
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.b == labels.id)
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("component").alias("nbr_min"))
        )
        # Carry the changed flag through the (already materializing)
        # checkpoint so convergence costs a scan of checkpointed rows, not
        # an extra join against the previous labels.
        stepped = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", "component")
                ).alias("component"),
                (
                    F.coalesce("nbr_min", "component") < F.col("component")
                ).alias("__changed"),
            )
            .localCheckpoint(eager=True)  # cut lineage each round
        )
        labels.unpersist()
        labels = stepped.drop("__changed")
        if stepped.filter(F.col("__changed")).limit(1).count() == 0:
            break
    sym.unpersist()
    return labels


def duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Candidate pairs -> (component, n_members, canonical_id) clusters.

    canonical_id = min member (the component label itself); singleton
    documents (no pair) are not rows here — they are their own canonical.
    """
    comp = connected_components(pairs, id_a, id_b)
    return comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("id").alias("canonical_id"),
    )
