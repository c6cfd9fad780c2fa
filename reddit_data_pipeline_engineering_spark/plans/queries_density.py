"""Density-based clustering over the embedding space (grid-blocked
DBSCAN) — the clustering family k-means cannot express: no k, arbitrary
cluster shapes, explicit noise. See `operators/density.py` for the
distributed reformulation (9-cell grid blocking -> exact eps
verification -> core-core connected components -> deterministic border
attachment).

The registry query clusters the first two embedding coordinates on the
exact 1e-6 integer grid (the same quantization contract as
embedding_dim_profile), eps = 15000 grid units (0.015), min_pts = 4 —
probed on the fixture to yield a non-trivial mix (27 clusters + border
+ noise at sf0.001 AND sf0.1, so the driver gate and the bench both
exercise real cluster structure). The oracle replays grid cells, the
3x3 candidate join, core election, a recursive-CTE transitive closure
of the core-core graph, and the min-component border attachment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_data_pipeline_engineering_spark.operators import density
from reddit_data_pipeline_engineering_spark.plans.queries import query
from reddit_data_pipeline_engineering_spark.sources.tables import load_table

_EPS = 15_000
_MIN_PTS = 4


def _sql_floor_div(name: str, k: int) -> str:
    # DuckDB's // already floors, but mirror the engine's CASE verbatim
    # so both sides execute the same arithmetic tree.
    return (
        f"CASE WHEN {name} >= 0 THEN {name} // {k} "
        f"ELSE -(((-{name}) + {k} - 1) // {k}) END"
    )


_DBSCAN_ORACLE = f"""
WITH RECURSIVE pts AS MATERIALIZED (
  SELECT vec_id AS id,
         CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 1000000.0) AS BIGINT) AS x,
         CAST(FLOOR(CAST(embedding[2] AS DOUBLE) * 1000000.0) AS BIGINT) AS y
  FROM embeddings
),
cells AS MATERIALIZED (
  SELECT id, x, y,
         {_sql_floor_div('x', _EPS)} AS cx,
         {_sql_floor_div('y', _EPS)} AS cy
  FROM pts
),
offs AS (
  SELECT o1.dx, o2.dy
  FROM (VALUES (-1), (0), (1)) o1(dx), (VALUES (-1), (0), (1)) o2(dy)
),
pairs AS MATERIALIZED (
  SELECT r.id AS a, b.id AS b
  FROM (SELECT c.id, c.x, c.y, c.cx + o.dx AS jx, c.cy + o.dy AS jy
        FROM cells c CROSS JOIN offs o) r
  JOIN cells b ON b.cx = r.jx AND b.cy = r.jy AND b.id <> r.id
  WHERE (r.x - b.x) * (r.x - b.x) + (r.y - b.y) * (r.y - b.y)
        <= {_EPS * _EPS}
),
nb AS (SELECT a, COUNT(*) AS c FROM pairs GROUP BY a),
core AS MATERIALIZED (
  SELECT c.id FROM cells c LEFT JOIN nb ON nb.a = c.id
  WHERE COALESCE(nb.c, 0) + 1 >= {_MIN_PTS}
),
eedges AS MATERIALIZED (
  SELECT p.a, p.b FROM pairs p
  JOIN core ca ON ca.id = p.a
  JOIN core cb ON cb.id = p.b
),
reach AS (
  SELECT a AS id, a AS lbl FROM eedges
  UNION
  SELECT e.a AS id, r.lbl FROM eedges e JOIN reach r ON e.b = r.id
),
comp0 AS MATERIALIZED (SELECT id, MIN(lbl) AS component FROM reach GROUP BY id),
comp AS MATERIALIZED (
  SELECT id, component FROM comp0
  UNION ALL
  SELECT c.id, c.id FROM core c WHERE c.id NOT IN (SELECT id FROM comp0)
),
border AS MATERIALIZED (
  SELECT p.a AS id, MIN(cm.component) AS component
  FROM pairs p
  JOIN core cb ON cb.id = p.b
  JOIN comp cm ON cm.id = p.b
  WHERE p.a NOT IN (SELECT id FROM core)
  GROUP BY p.a
),
ncore AS (
  SELECT component, CAST(COUNT(*) AS BIGINT) AS n_core FROM comp GROUP BY 1
),
nbord AS (
  SELECT component, CAST(COUNT(*) AS BIGINT) AS n_border FROM border GROUP BY 1
)
SELECT nc.component AS cluster, nc.n_core,
       CAST(COALESCE(nb2.n_border, 0) AS BIGINT) AS n_border
FROM ncore nc LEFT JOIN nbord nb2 ON nb2.component = nc.component
UNION ALL
SELECT CAST(-1 AS BIGINT) AS cluster, CAST(0 AS BIGINT) AS n_core,
       CAST(COUNT(*) AS BIGINT) AS n_border
FROM cells c
WHERE c.id NOT IN (SELECT id FROM core)
  AND c.id NOT IN (SELECT id FROM border)
ORDER BY cluster
"""


@query(
    "dbscan_grid_clusters",
    _DBSCAN_ORACLE,
    "Grid-blocked DBSCAN over the first two embedding coordinates on "
    "the 1e-6 integer grid (eps=15000, min_pts=4): map-side x9 cell "
    "replication -> ONE cell equi-join for exact eps-neighbor pairs -> "
    "core election -> core-core connected components (star "
    "contraction — O(log n) rounds; the dense-blob core graph's "
    "diameter exceeds what per-round label propagation can afford) "
    "-> deterministic min-component border "
    "attachment; per-cluster core/border counts plus the -1 noise "
    "bucket. Oracle replays the closure as a recursive CTE.",
    tags=("llm", "similarity", "clustering", "iterative", "bench"),
)
def q_dbscan_grid_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        F.floor(F.element_at("embedding", 1).cast("double") * 1000000.0)
        .cast("long")
        .alias("x"),
        F.floor(F.element_at("embedding", 2).cast("double") * 1000000.0)
        .cast("long")
        .alias("y"),
    )
    return density.dbscan_grid(
        pts, "vec_id", "x", "y", eps=_EPS, min_pts=_MIN_PTS
    )
