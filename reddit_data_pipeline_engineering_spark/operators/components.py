"""Connected components over candidate-pair graphs (dedup clustering).

Training-data pipelines need the step AFTER near-dup candidate generation:
grouping pairs into duplicate clusters and electing one canonical document
per cluster. That is connected components on the pair graph.

Two interchangeable implementations behind one API:

- ``label`` (default): iterative minimum-label propagation — every vertex
  starts labeled with itself; each round takes the min label over its
  neighborhood; stop when no label changes. Rounds = graph DIAMETER
  (near-dup clusters are dense, so typically 2-4). Each round is one join
  + one aggregate.
- ``star``: the large-star/small-star edge-contraction algorithm
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14 — public algorithm). Each round rewires edges toward local
  minima (large-star moves every larger neighbor to the neighborhood
  min, small-star then flattens the remaining down-edges), which
  provably converges in O(log n) rounds REGARDLESS of diameter. This is
  the 100 TB path for long-chain graphs (>10^9 edges; SCALE.md §10):
  a chain of length L costs the label variant ~L rounds but the star
  variant ~log L.

Both cut lineage with localCheckpoint every round so the plan doesn't
grow across iterations (the classic Spark iterative-algorithm trap), and
both shuffle only on vertex ids — one keyed exchange per join/aggregate,
no all-pairs work.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# r11 optimization: once the (possibly already contracted) edge relation
# is at most this many rows, the remaining rounds are replaced by ONE
# bounded collect + driver-side union-find with min-id roots — the same
# labels the distributed fixed point produces, without paying 3-6 more
# rounds of micro-stage scheduling (measured 1.2 s/round on a 6.8k-edge
# graph at bench scale — pure fixed cost, no data). The collect is
# bounded by THIS constant (~16 bytes/edge -> <2 MB at the default), the
# precedent for every other bounded collect in the repo; at 100 TB the
# distributed rounds run until star contraction shrinks the remnant
# under the cap (it shrinks monotonically toward one star per
# component), so the driver never sees an unbounded relation. Override
# with RDPE_CC_DRIVER_FINISH_MAX_EDGES; 0 disables (pure distributed).
DRIVER_FINISH_MAX_EDGES = 100_000


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iterations: int = 25,
    algorithm: str = "label",
    stats: dict | None = None,
    driver_finish_max_edges: int | None = None,
) -> DataFrame:
    """Return (id, component) with component = min vertex id reachable.

    ``edges`` is an undirected pair list (each pair once, either order).
    ``algorithm`` is ``"label"`` (min-label propagation, rounds = graph
    diameter) or ``"star"`` (large-star/small-star contraction, rounds =
    O(log n)). If ``stats`` is a dict, ``stats["rounds"]`` records the
    number of iterations executed and ``stats["driver_finish_edges"]``
    the residual edge count handed to the union-find finish (absent when
    the distributed fixed point completed first).
    ``driver_finish_max_edges`` gates the bounded driver finish (None ->
    env ``RDPE_CC_DRIVER_FINISH_MAX_EDGES`` -> module default; 0
    disables).
    """
    if driver_finish_max_edges is None:
        driver_finish_max_edges = int(
            os.environ.get(
                "RDPE_CC_DRIVER_FINISH_MAX_EDGES",
                str(DRIVER_FINISH_MAX_EDGES),
            )
        )
    if algorithm == "label":
        return _cc_label(
            edges, src, dst, max_iterations, stats, driver_finish_max_edges
        )
    if algorithm == "star":
        return _cc_star(
            edges, src, dst, max_iterations, stats, driver_finish_max_edges
        )
    raise ValueError(f"unknown algorithm {algorithm!r} (label|star)")


def _id_type(edges: DataFrame, src: str) -> str:
    return edges.schema[src].dataType.simpleString()


def _driver_union_find(spark, rows, id_type: str) -> DataFrame:
    """Min-id union-find over a BOUNDED collected edge list — the exact
    fixed-point labeling both distributed variants converge to: every
    node labeled with the minimum node id reachable from it. Root choice
    is 'smaller id wins', so the root of every set is its min id under
    any union order; path compression keeps it near-linear."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    nodes = set()
    for a, b in rows:
        nodes.add(a)
        nodes.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    out = [(n, find(n)) for n in sorted(nodes)]
    return spark.createDataFrame(
        out, f"id {id_type}, component {id_type}"
    )


def _cc_label(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iterations: int,
    stats: dict | None,
    driver_finish_max_edges: int = 0,
) -> DataFrame:
    # Symmetrize in ONE pass over the (possibly expensive, unpersisted)
    # pair-generation subtree: union(edges, edges.swap) would evaluate
    # that subtree twice — LSH candidate generation is the typical
    # input — while explode(array(fwd, rev)) reads it once for the
    # same rows.
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(src).alias("a"), F.col(dst).alias("b")
                    ),
                    F.struct(
                        F.col(dst).alias("a"), F.col(src).alias("b")
                    ),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .distinct()
        .persist()
    )
    if driver_finish_max_edges:
        # One upfront count materializes the persisted symmetric relation
        # (the pair-generation subtree runs exactly once) and gates the
        # bounded driver finish: |sym| = 2|E|, so compare against 2x the
        # edge cap. Collected rows are bounded by the gate itself.
        n_sym = sym.count()
        if n_sym <= 2 * driver_finish_max_edges:
            if stats is not None:
                stats["rounds"] = 0
                stats["driver_finish_edges"] = n_sym // 2
            rows = [(r["a"], r["b"]) for r in sym.collect()]
            out = _driver_union_find(
                edges.sparkSession, rows, _id_type(edges, src)
            )
            sym.unpersist()
            return out
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .persist()
    )
    rounds = 0
    converged = False
    for _ in range(max_iterations):
        rounds += 1
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
            converged = True
            break
    sym.unpersist()
    if stats is not None:
        stats["rounds"] = rounds
    if not converged:
        # Silent truncation returns WRONG components (split clusters) —
        # found the hard way: grid-DBSCAN's core-core graph at sf0.1
        # has diameter > 25, and the capped labels reported 30 clusters
        # where the true closure has 28. Min-label rounds track graph
        # DIAMETER; for long-chain graphs use algorithm="star"
        # (O(log n) rounds) or raise max_iterations explicitly.
        raise ValueError(
            f"connected_components(label) did not converge in "
            f"{max_iterations} rounds — the graph diameter exceeds the "
            f"cap; use algorithm='star' or raise max_iterations"
        )
    return labels


def _cc_star(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iterations: int,
    stats: dict | None,
    driver_finish_max_edges: int = 0,
) -> DataFrame:
    """Large-star/small-star contraction (Kiveris et al., SoCC'14).

    Edges are kept canonically pointing DOWN (u > v). One round =
    large-star (every neighbor larger than the center rewires to the
    neighborhood min, computed over BOTH directions) then small-star
    (every down-neighbor of a center rewires to the center's min
    down-neighbor). The edge set is a fixed point iff it is a union of
    stars rooted at each component's min vertex.
    """
    e = (
        edges.select(F.col(src).alias("x"), F.col(dst).alias("y"))
        .filter(F.col("x") != F.col("y"))
        .select(
            F.greatest(F.col("x"), F.col("y")).alias("u"),
            F.least(F.col("x"), F.col("y")).alias("v"),
        )
        .distinct()
        .persist()
    )
    rounds = 0
    converged = False

    def _finish(cur: DataFrame, n_edges: int) -> DataFrame:
        # Bounded driver finish: both star operations preserve the
        # component partition over the same vertex set (Kiveris et al.
        # §3 — rewiring only moves edges toward the component min), so
        # union-find over ANY round's edge set yields the identical
        # min-id labeling the distributed fixed point reads off.
        if stats is not None:
            stats["rounds"] = rounds
            stats["driver_finish_edges"] = n_edges
        rows = [(r["u"], r["v"]) for r in cur.collect()]
        out = _driver_union_find(
            edges.sparkSession, rows, _id_type(edges, src)
        )
        cur.unpersist()
        return out

    if driver_finish_max_edges:
        # Upfront count also materializes the persisted edge set once —
        # without it, round 1's sym union scans the UNpersisted cache
        # twice and computes the (often expensive) pair-generation
        # subtree twice.
        n_e = e.count()
        if n_e <= driver_finish_max_edges:
            return _finish(e, n_e)
    for _ in range(max_iterations):
        rounds += 1
        # Large-star over full neighborhoods (both directions).
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least(F.col("mn"), F.col("u")).alias("m"))
        )
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            # No distinct here (r11): duplicate (u, v) rows — several
            # old centers sharing one min — are absorbed by small-star's
            # min-aggregate and the final distinct below, so the output
            # edge set is identical while the round does one less
            # full-|E| exchange (the dedup shuffle this removed).
        )
        # Small-star: `large` edges all point down (v < u).
        smins = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(smins, "u")
            .select(F.col("v").alias("node"), F.col("m"))
            .union(smins.select(F.col("u").alias("node"), F.col("m")))
            .filter(F.col("node") != F.col("m"))
            .select(F.col("node").alias("u"), F.col("m").alias("v"))
            .distinct()
            # Lazy checkpoint (r11): the violations aggregate below is a
            # FULL pass over `small`, so letting it trigger the local-
            # checkpoint materialization folds the former eager
            # materialization job into the convergence-check job — one
            # driver action per round instead of two. Lineage is cut
            # identically (LocalRDDCheckpointData fills any partition a
            # partial job missed at job end; the violations agg computes
            # them all anyway).
            .localCheckpoint(eager=False)
        )
        # Fixed-point test WITHOUT materializing another round: a
        # down-pointing distinct edge set is invariant under the
        # large+small round iff it is a union of min-rooted stars —
        # i.e. every u carries exactly one edge and no node appears on
        # both sides. (Leaves then see exactly {root}, min = root; the
        # root sees its leaves, min = itself — both stars reproduce
        # themselves.) Checking the property on this round's output is
        # ONE tiny scan+agg job over the checkpointed rows, replacing
        # the old count + exceptAll pair (the exceptAll re-shuffled
        # BOTH edge relations every round) and detecting convergence
        # one round earlier: the old criterion needed round k+1 to
        # reproduce round k's output before it could stop.
        violations = (
            # ONE scan of `small` (explode, not a self-union): the union
            # form read the checkpoint-pending RDD twice, which before
            # materialization computes every partition twice (and races
            # the checkpoint cache); the exploded form both materializes
            # the lazy checkpoint and checks convergence in a single
            # pass over each partition.
            small.select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col("u").alias("node"),
                            F.lit(1).alias("as_u"),
                            F.lit(0).alias("as_v"),
                        ),
                        F.struct(
                            F.col("v").alias("node"),
                            F.lit(0).alias("as_u"),
                            F.lit(1).alias("as_v"),
                        ),
                    )
                ).alias("s")
            )
            .select("s.node", "s.as_u", "s.as_v")
            .groupBy("node")
            .agg(F.sum("as_u").alias("nu"), F.max("as_v").alias("nv"))
            # Global fold: violation count AND edge count (sum of nu =
            # |small|) in the SAME job — the round's only driver action,
            # serving convergence, the driver-finish gate, and the lazy-
            # checkpoint materialization at once.
            .agg(
                F.sum(
                    F.when(
                        (F.col("nu") > 1)
                        | ((F.col("nu") >= 1) & (F.col("nv") == 1)),
                        1,
                    ).otherwise(0)
                ).alias("n_vio"),
                F.sum("nu").alias("n_edges"),
            )
        )
        # No .persist() on top: the localCheckpoint above materializes
        # `small` under the violations job; layering a columnar cache
        # over the checkpoint RDD would add a per-round cache-build pass
        # (the label variant has always relied on the checkpoint alone).
        old = e
        e = small
        old.unpersist()  # only the pre-loop persisted edge set
        row = violations.collect()[0]
        if (row["n_vio"] or 0) == 0:
            converged = True
            break
        if driver_finish_max_edges and row["n_edges"] <= driver_finish_max_edges:
            return _finish(e, row["n_edges"])
    if stats is not None:
        stats["rounds"] = rounds
    if not converged:
        # Same loud-failure contract as the label path: a capped result
        # is a WRONG result (non-star residual edges mislabel nodes).
        # Star needs O(log n) rounds, so 25 covers ~2^25 vertices — if
        # this fires the graph is astronomically deep or the cap was
        # lowered; raise max_iterations.
        raise ValueError(
            f"connected_components(star) did not converge in "
            f"{max_iterations} rounds; raise max_iterations"
        )
    # Fixed point is a union of stars: non-roots each hold exactly one
    # edge to their component's min vertex; roots label themselves.
    labels = e.select(F.col("u").alias("id"), F.col("v").alias("component"))
    roots = (
        e.select(F.col("v").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    out = labels.union(roots).distinct()
    e.unpersist()
    return out


def duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    algorithm: str = "label",
) -> DataFrame:
    """Candidate pairs -> (component, n_members, canonical_id) clusters.

    canonical_id = min member (the component label itself); singleton
    documents (no pair) are not rows here — they are their own canonical.
    """
    comp = connected_components(pairs, id_a, id_b, algorithm=algorithm)
    return comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("id").alias("canonical_id"),
    )
