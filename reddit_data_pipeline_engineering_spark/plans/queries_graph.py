"""Graph centrality over the order network (iterative-algorithm family).

With connected components (dup_clusters) this gives the engine both
canonical iterative graph operators. PageRank runs on the symmetrized
customer–supplier transaction graph (an edge per distinct trading pair,
via orders ⋈ lineitem) in exact integer arithmetic, so the DuckDB oracle
replays all three power iterations bit-identically as unrolled CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_data_pipeline_engineering_spark.operators import pagerank as pr
from reddit_data_pipeline_engineering_spark.plans.queries import REGISTRY, query
from reddit_data_pipeline_engineering_spark.sources.tables import load_table

__all__ = ["REGISTRY"]

_PR_ITERS = 3
# Node ids carry a tag BIT (customer = 2*custkey, supplier = 2*suppkey+1)
# instead of an additive offset — structurally disjoint at ANY scale,
# where a fixed offset would collide once custkeys outgrow it.


def _pr_ctes(iters: int = _PR_ITERS) -> str:
    teleport = (pr.SCALE * (pr.DAMP_DEN - pr.DAMP_NUM)) // pr.DAMP_DEN
    parts = [
        f"""pairs AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
)""",
        """edges AS MATERIALIZED (
  SELECT c * 2 AS src, s * 2 + 1 AS dst FROM pairs
  UNION ALL
  SELECT s * 2 + 1 AS src, c * 2 AS dst FROM pairs
)""",
        """deg AS MATERIALIZED (
  SELECT src, COUNT(*) AS d FROM edges GROUP BY src
)""",
        """nodes AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)
)""",
        f"""r0 AS MATERIALIZED (
  SELECT node, CAST({pr.SCALE} AS BIGINT) AS rank FROM nodes
)""",
    ]
    for t in range(1, iters + 1):
        parts.append(f"""c{t} AS MATERIALIZED (
  SELECT e.dst AS node, SUM(r.rank // d.d) AS m
  FROM edges e
  JOIN r{t - 1} r ON e.src = r.node
  JOIN deg d ON e.src = d.src
  GROUP BY e.dst
)""")
        parts.append(f"""r{t} AS MATERIALIZED (
  SELECT n.node,
         CAST({teleport} + ({pr.DAMP_NUM} * COALESCE(c.m, 0))
              // {pr.DAMP_DEN} AS BIGINT) AS rank
  FROM nodes n LEFT JOIN c{t} c USING (node)
)""")
    return ",\n".join(parts)


_PAGERANK_ORACLE = f"""
WITH {_pr_ctes()}
SELECT CASE WHEN node % 2 = 1 THEN 'supplier' ELSE 'customer' END
         AS node_kind,
       CAST(node // 2 AS BIGINT) AS node_id,
       rank
FROM r{_PR_ITERS}
ORDER BY rank DESC, node
LIMIT 20
"""


@query(
    "pagerank_topk",
    _PAGERANK_ORACLE,
    "Integer-exact PageRank (3 power iterations, operators/pagerank.py) "
    "over the symmetrized customer-supplier graph: one keyed shuffle per "
    "iteration (edges ⋈ ranks on src, contributions aggregated on dst "
    "with map-side partials), teleport as a literal, every step exact "
    "64-bit integer math so the oracle replays all iterations as "
    "unrolled CTEs. Top-20 authority nodes.",
    tags=("relational", "graph", "iterative", "bench"),
)
def q_pagerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    up = pairs.select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    down = pairs.select(
        (F.col("l_suppkey") * 2 + 1).alias("src"),
        (F.col("o_custkey") * 2).alias("dst"),
    )
    ranks = pr.pagerank(up.union(down), iters=_PR_ITERS)
    kind = F.when(
        F.col("node") % 2 == 1, F.lit("supplier")
    ).otherwise(F.lit("customer"))
    node_id = F.shiftright(F.col("node").cast("long"), 1)
    return (
        ranks.orderBy(F.col("rank").desc(), F.col("node").asc())
        .limit(20)
        .select(
            kind.alias("node_kind"),
            node_id.cast("long").alias("node_id"),
            "rank",
        )
    )
