"""Units for the integer-exact PageRank operator."""

from pyspark.sql import functions as F

from reddit_data_pipeline_engineering_spark.operators import pagerank as pr


def _ranks(spark, edges, iters=3):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = pr.pagerank(df, iters=iters)
    return {r.node: r.rank for r in out.collect()}


def test_symmetric_triangle_ranks_equal(spark):
    edges = [(a, b) for a in (1, 2, 3) for b in (1, 2, 3) if a != b]
    got = _ranks(spark, edges)
    assert len(set(got.values())) == 1
    # Mass is conserved up to truncation: each rank stays ~scale.
    assert abs(next(iter(got.values())) - pr.SCALE) < 10


def test_star_hub_outranks_leaves(spark):
    hub, leaves = 0, [1, 2, 3, 4]
    edges = [(hub, leaf) for leaf in leaves] + [(leaf, hub) for leaf in leaves]
    got = _ranks(spark, edges)
    assert all(got[hub] > got[leaf] for leaf in leaves)
    assert len({got[leaf] for leaf in leaves}) == 1  # leaves symmetric


def test_no_inedge_node_gets_teleport_floor(spark):
    got = _ranks(spark, [(1, 2)], iters=2)
    teleport = (pr.SCALE * (pr.DAMP_DEN - pr.DAMP_NUM)) // pr.DAMP_DEN
    # Node 1 has no in-edges: exactly the teleport constant after any
    # iteration. Node 2 (dangling) accumulates 1's damped contribution.
    assert got[1] == teleport
    assert got[2] > teleport


def test_iterations_are_deterministic_across_partitionings(spark):
    edges = [(a, b) for a in range(20) for b in range(20) if (a * 7 + b) % 5 == 0 and a != b]
    df1 = spark.createDataFrame(edges, "src long, dst long").repartition(1)
    df8 = spark.createDataFrame(edges, "src long, dst long").repartition(8)
    r1 = {r.node: r.rank for r in pr.pagerank(df1).collect()}
    r8 = {r.node: r.rank for r in pr.pagerank(df8).collect()}
    assert r1 == r8
