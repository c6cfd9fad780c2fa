"""Brute-force differential tests for the r11 wave-8 queries.

Same contract as tests/test_r11_queries.py: each test recomputes the
result INDEPENDENTLY (python loops over the raw parquet). The
closeness replay runs a literal python BFS; the clustering replay
counts neighbor pairs directly (NOT the degree-orientation device the
engines share); the AUC replay assigns literal midranks by sorting
users (NOT the grid-cumulative device). Integer division replays
truncate toward zero.
"""

from collections import Counter, defaultdict, deque
from hashlib import md5

import duckdb
import pytest

from reddit_data_pipeline_engineering_spark.plans.queries import REGISTRY, queries
from reddit_data_pipeline_engineering_spark.plans.queries_r11d import (
    _CLOSE_ROUNDS,
    _CLOSE_SEEDS,
)

from .conftest import SF_SMALL

queries()  # force registration


def _pdf(name, spark):
    return REGISTRY[name].fn(spark, SF_SMALL).toPandas()


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division (Spark div / DuckDB //)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


@pytest.fixture(scope="module")
def cs_pairs():
    return duckdb.sql(
        f"SELECT DISTINCT o_custkey, l_suppkey "
        f"FROM '{SF_SMALL}/orders.parquet' o "
        f"JOIN '{SF_SMALL}/lineitem.parquet' l ON o_orderkey = l_orderkey"
    ).fetchall()


def test_harmonic_closeness_matches_bruteforce(spark, cs_pairs):
    got = _pdf("harmonic_closeness_seeds", spark)
    adj = defaultdict(set)
    for c, s in cs_pairs:
        adj[int(c) * 2].add(int(s) * 2 + 1)
        adj[int(s) * 2 + 1].add(int(c) * 2)
    assert len(got) == len(_CLOSE_SEEDS)
    reached_any = 0
    for r in got.itertuples():
        seed = int(r.custkey) * 2
        dist = {seed: 0}
        q = deque([seed])
        while q:
            u = q.popleft()
            if dist[u] >= _CLOSE_ROUNDS:
                continue
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        reached = {v: d for v, d in dist.items() if d >= 1}
        assert int(r.n_reached) == len(reached)
        assert int(r.sum_dist) == sum(reached.values())
        assert int(r.harmonic_e6) == sum(
            _tdiv(10**6, d) for d in reached.values()
        )
        reached_any += len(reached)
    assert reached_any > 0  # the probe actually expands at this sf


def test_local_clustering_matches_bruteforce(spark):
    got = _pdf("local_clustering_hist", spark)
    rows = duckdb.sql(
        f"SELECT DISTINCT a.l_partkey, b.l_partkey "
        f"FROM '{SF_SMALL}/lineitem.parquet' a "
        f"JOIN '{SF_SMALL}/lineitem.parquet' b "
        f"ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"
    ).fetchall()
    adj = defaultdict(set)
    for u, v in rows:
        adj[int(u)].add(int(v))
        adj[int(v)].add(int(u))
    bands = Counter()
    sums = Counter()
    n_closed = 0
    for u, nb in adj.items():
        d = len(nb)
        if d < 2:
            continue
        nbl = sorted(nb)
        t = sum(
            1
            for i, x in enumerate(nbl)
            for y in nbl[i + 1:]
            if y in adj[x]
        )
        lcc = _tdiv(2 * t * 10**6, d * (d - 1))
        bands[_tdiv(lcc, 100000)] += 1
        sums[_tdiv(lcc, 100000)] += lcc
        n_closed += t
    assert [int(r.band) for r in got.itertuples()] == sorted(bands)
    for r in got.itertuples():
        assert int(r.n_nodes) == bands[int(r.band)]
        assert int(r.sum_lcc_e6) == sums[int(r.band)]
    assert n_closed > 0  # the fixture graph actually has triangles


@pytest.fixture(scope="module")
def purchases():
    return duckdb.sql(
        f"SELECT user_id, CAST(CAST(value AS DECIMAL(14,4)) * 100 AS BIGINT) "
        f"FROM '{SF_SMALL}/events.parquet' "
        f"WHERE event_type = 'purchase' AND value IS NOT NULL"
    ).fetchall()


def test_ad_two_sample_matches_bruteforce(spark, purchases):
    got = _pdf("ad_two_sample_ab", spark).iloc[0]
    vals = []
    for uid, cents in purchases:
        arm_a = int(md5(str(int(uid)).encode()).hexdigest()[:8], 16) % 2 == 0
        vals.append((int(cents), arm_a))
    n = sum(1 for _, a in vals if a)
    m = len(vals) - n
    grid = sorted({c for c, _ in vals})
    per = {c: [0, 0] for c in grid}
    for c, a in vals:
        per[c][0 if a else 1] += 1
    s = 0
    cum_a = cum_all = 0
    for c in grid:
        ca, cb = per[c]
        cum_a += ca
        cum_all += ca + cb
        if cum_all < n + m:
            num = (n + m) * cum_a - n * cum_all
            s += _tdiv(
                (ca + cb) * num * num * 10**6,
                cum_all * (n + m - cum_all),
            )
    assert int(got.n_a) == n and int(got.n_b) == m
    assert int(got.n_cells) == len(grid)
    assert int(got.ad2_e6) == (0 if n == 0 or m == 0 else _tdiv(s, n * m))
    assert n > 0 and m > 0  # both arms populated: the guard never masks


def test_dp_sensitivity_matches_bruteforce(spark):
    got = _pdf("dp_sensitivity_audit", spark)
    rows = duckdb.sql(
        f"SELECT event_type, user_id, "
        f"CASE WHEN value IS NULL THEN 0 "
        f"ELSE CAST(CAST(value AS DECIMAL(14,4)) * 100 AS BIGINT) END "
        f"FROM '{SF_SMALL}/events.parquet'"
    ).fetchall()
    cells = defaultdict(lambda: [0, 0])  # (type, user) -> [rows, cents]
    for et, u, cents in rows:
        c = cells[(et, int(u))]
        c[0] += 1
        c[1] += int(cents)
    per_type = defaultdict(list)
    for (et, _), (rc, cc) in cells.items():
        per_type[et].append((rc, cc))
    assert len(got) == len(per_type)
    for r in got.itertuples():
        xs = per_type[r.event_type]
        n_rows = sum(rc for rc, _ in xs)
        assert int(r.n_rows) == n_rows
        assert int(r.n_users) == len(xs)
        assert int(r.max_user_rows) == max(rc for rc, _ in xs)
        assert int(r.max_user_abs_cents) == max(abs(cc) for _, cc in xs)
        assert int(r.avg_user_rows_e3) == _tdiv(1000 * n_rows, len(xs))


def test_roc_auc_matches_bruteforce(spark):
    got = _pdf("roc_auc_propensity", spark).iloc[0]
    rows = duckdb.sql(
        f"SELECT user_id, event_type, value "
        f"FROM '{SF_SMALL}/events.parquet'"
    ).fetchall()
    score = Counter()
    spend = Counter()
    for u, et, v in rows:
        if et != "purchase":
            score[int(u)] += 1
        elif v is not None:
            spend[int(u)] += int(round(float(v) * 100))
        else:
            spend[int(u)] += 0
    scored = sorted(
        (score.get(u, 0), 1 if spend.get(u, 0) >= 60000 else 0)
        for u in set(score) | set(spend)
    )
    # literal midranks: average the 1-based positions of each tie block
    r2_pos = 0  # 2x sum of positive midranks
    i = 0
    while i < len(scored):
        j = i
        while j < len(scored) and scored[j][0] == scored[i][0]:
            j += 1
        midrank2 = (i + 1) + j  # 2 * (first_pos + last_pos) / 2
        r2_pos += midrank2 * sum(lb for _, lb in scored[i:j])
        i = j
    n1 = sum(lb for _, lb in scored)
    n0 = len(scored) - n1
    u2 = r2_pos - n1 * (n1 + 1)
    assert int(got.n_users) == len(scored)
    assert int(got.n_pos) == n1 and int(got.n_neg) == n0
    assert int(got.n_cells) == len({s for s, _ in scored})
    assert int(got.u2) == u2
    assert int(got.auc_e6) == (
        0 if n1 == 0 or n0 == 0 else _tdiv(u2 * 10**6, 2 * n1 * n0)
    )
    # non-degenerate fixture: both classes exist and AUC is informative
    assert n1 > 0 and n0 > 0 and 0 <= int(got.auc_e6) <= 10**6
