"""Brute-force differential tests for the r11 wave-5/6 queries.

Same contract as tests/test_r11_queries.py: each test recomputes the
result INDEPENDENTLY (python loops over the raw parquet — no SQL, no
Spark expressions), so a misconception shared by the Spark plan and
its hand-mirrored DuckDB oracle cannot hide. The JT test replays the
PAIRWISE definition directly (not the histogram-fold identity the
engines use). Integer division replays truncate-toward-zero.
"""

from collections import Counter, defaultdict

import duckdb
import pytest

from reddit_data_pipeline_engineering_spark.plans.queries import REGISTRY, queries
from reddit_data_pipeline_engineering_spark.plans.queries_r11b import _LEV_CAP

from .conftest import SF_SMALL

queries()  # force registration

_WEEK_US = 604_800_000_000


def _pdf(name, spark):
    return REGISTRY[name].fn(spark, SF_SMALL).toPandas()


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division (Spark div / DuckDB //)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


@pytest.fixture(scope="module")
def daily_counts():
    rows = duckdb.sql(
        f"SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS x FROM "
        f"'{SF_SMALL}/orders.parquet' GROUP BY 1 ORDER BY d"
    ).fetchall()
    return [int(x) for _, x in rows]


def test_pacf_daily_matches_bruteforce(spark, daily_counts):
    got = _pdf("pacf_daily", spark).iloc[0]
    xs = daily_counts
    n, s = len(xs), sum(xs)
    m = s // n  # positive ints: floor == trunc
    c = [x - m for x in xs]
    n0 = sum(v * v for v in c)
    nk = [sum(c[i] * c[i + k] for i in range(n - k)) for k in (1, 2, 3)]
    n1, n2, n3 = nk
    assert int(got.n_days) == n
    assert int(got.ss_centered) == n0
    assert int(got.pacf1_e6) == (0 if n0 == 0 else _tdiv(n1 * 10**6, n0))
    d2 = n0 * n0 - n1 * n1
    assert int(got.pacf2_e6) == (
        0 if d2 == 0 else _tdiv((n2 * n0 - n1 * n1) * 10**6, d2)
    )
    det_r = n0**3 - 2 * n0 * n1 * n1 + 2 * n1 * n1 * n2 - n0 * n2 * n2
    det_a = (
        n0 * n0 * n3 - 2 * n0 * n1 * n2 - n1 * n1 * n3
        + n1 * n2 * n2 + n1**3
    )
    assert int(got.pacf3_e6) == (
        0 if det_r == 0 else _tdiv(det_a * 10**6, det_r)
    )
    # the fixture series is non-constant, so the guards never mask the
    # real closed forms in this replay
    assert n0 > 0 and d2 > 0 and det_r != 0


def _lev(a: str, b: str) -> int:
    """Classic Levenshtein DP (insert/delete/substitute cost 1)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (ca != cb),
            ))
        prev = cur
    return prev[-1]


def test_levenshtein_blocked_pairs_matches_bruteforce(spark):
    got = _pdf("levenshtein_blocked_pairs", spark).iloc[0]
    parts = duckdb.sql(
        f"SELECT p_partkey, p_brand, p_name FROM "
        f"'{SF_SMALL}/part.parquet'"
    ).fetchall()
    blocks = defaultdict(list)
    for pk, brand, name in parts:
        blocks[(brand, name.split(" ")[0])].append((int(pk), name))
    hot = sum(1 for v in blocks.values() if len(v) > _LEV_CAP)
    dists = []
    for members in blocks.values():
        if len(members) > _LEV_CAP:
            continue
        members = sorted(members)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                dists.append(_lev(members[i][1], members[j][1]))
    assert int(got.n_blocks) == len(blocks)
    assert int(got.n_hot_blocks_dropped) == hot
    assert int(got.n_cand_pairs) == len(dists)
    assert int(got.n_exact_name) == sum(1 for d in dists if d == 0)
    assert int(got.n_d_le2) == sum(1 for d in dists if d <= 2)
    assert int(got.n_d_le4) == sum(1 for d in dists if d <= 4)
    assert int(got.min_dist) == (min(dists) if dists else -1)


def test_chao1_matches_bruteforce(spark):
    got = _pdf("chao1_vocab_richness", spark).set_index("source")
    docs = duckdb.sql(
        f"SELECT source, text FROM '{SF_SMALL}/documents.parquet'"
    ).fetchall()
    per_src = {}
    all_cnt = Counter()
    for source, text in docs:
        cnt = per_src.setdefault(source, Counter())
        for t in text.split():
            if t:
                cnt[t] += 1
                all_cnt[t] += 1
    per_src["ALL"] = all_cnt
    assert set(got.index) == set(per_src)
    for src, cnt in per_src.items():
        vocab = len(cnt)
        f1 = sum(1 for v in cnt.values() if v == 1)
        f2 = sum(1 for v in cnt.values() if v == 2)
        n_tok = sum(cnt.values())
        row = got.loc[src]
        assert int(row.vocab) == vocab
        assert int(row.f1) == f1
        assert int(row.f2) == f2
        assert int(row.n_tokens) == n_tok
        assert int(row.chao1_x100) == vocab * 100 + _tdiv(
            f1 * (f1 - 1) * 100, 2 * (f2 + 1)
        )
        assert int(row.gt_unseen_bp) == _tdiv(f1 * 10000, n_tok)


def test_calibration_ece_matches_bruteforce(spark):
    got = _pdf("calibration_ece_temporal", spark).set_index("bin")
    rows = duckdb.sql(
        f"SELECT user_id, event_type, "
        f"epoch_us(CAST(ts AS TIMESTAMP)) // {_WEEK_US} AS wk "
        f"FROM '{SF_SMALL}/events.parquet'"
    ).fetchall()
    w0 = min(r[2] for r in rows)
    w1 = max(r[2] for r in rows)
    mid = (w0 + w1) // 2
    per_user = {}
    for uid, et, wk in rows:
        u = per_user.setdefault(int(uid), {"e": 0, "pe": 0, "pl": 0})
        if wk <= mid:
            u["e"] += 1
            if et == "purchase":
                u["pe"] = 1
        elif et == "purchase":
            u["pl"] = 1
    per_user = {k: v for k, v in per_user.items() if v["e"] > 0}
    nu = len(per_user)
    te = sum(v["e"] for v in per_user.values())
    bins = {}
    for v in per_user.values():
        b = "%02d" % min(_tdiv(v["e"] * 4 * nu, te), 9)
        s = bins.setdefault(b, {"n": 0, "c": 0, "a": 0})
        s["n"] += 1
        s["c"] += v["pe"]
        s["a"] += v["pl"]
    assert set(got.index) == set(bins) | {"ALL"}
    gap_total = 0
    for b, s in bins.items():
        row = got.loc[b]
        assert int(row.n_users) == s["n"]
        assert int(row.conf_users) == s["c"]
        assert int(row.acc_users) == s["a"]
        assert int(row.conf_ppm) == _tdiv(s["c"] * 10**6, s["n"])
        assert int(row.acc_ppm) == _tdiv(s["a"] * 10**6, s["n"])
        assert int(row.gap_ppm) == _tdiv(abs(s["c"] - s["a"]) * 10**6, s["n"])
        gap_total += abs(s["c"] - s["a"])
    all_row = got.loc["ALL"]
    assert int(all_row.n_users) == nu
    assert int(all_row.gap_ppm) == _tdiv(gap_total * 10**6, nu)  # the ECE


def test_jt_trend_matches_pairwise_definition(spark):
    """Replays the PAIRWISE Jonckheere-Terpstra definition (every
    cross-group order pair scored 2/1/0), not the histogram-fold
    identity the engines use — the strongest possible differential."""
    got = _pdf("jt_trend_priority", spark).iloc[0]
    rows = duckdb.sql(
        f"SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
        f" // 10000 AS band, CAST(substr(o_orderpriority, 1, 1) AS BIGINT)"
        f" AS pri FROM '{SF_SMALL}/orders.parquet'"
    ).fetchall()
    by_pri = defaultdict(list)
    for band, pri in rows:
        by_pri[int(pri)].append(int(band))
    jt2 = 0
    for i in range(1, 6):
        for j in range(i + 1, 6):
            for u in by_pri[i]:
                for v in by_pri[j]:
                    if u < v:
                        jt2 += 2
                    elif u == v:
                        jt2 += 1
    ns = {i: len(by_pri[i]) for i in range(1, 6)}
    n = sum(ns.values())
    m2 = sum(
        ns[i] * ns[j] for i in range(1, 6) for j in range(i + 1, 6)
    )
    v72 = n * n * (2 * n + 3) - sum(
        ns[i] * ns[i] * (2 * ns[i] + 3) for i in range(1, 6)
    )
    assert int(got.n_orders) == n
    assert int(got.jt2_stat) == jt2
    assert int(got.jt2_mean) == m2
    assert int(got.v72) == v72
    assert int(got.jt_z2_e6) == (
        0 if v72 == 0 else _tdiv((jt2 - m2) ** 2 * 18 * 10**6, v72)
    )


def test_morans_i_matches_pairwise_double_sum(spark):
    """Replays Moran's I with the LITERAL pairwise double sum over the
    25-nation grid (not the per-region closed form the engines use)."""
    got = _pdf("morans_i_region", spark).iloc[0]
    orders = duckdb.sql(
        f"SELECT o_custkey, o_totalprice FROM '{SF_SMALL}/orders.parquet'"
    ).fetchall()
    cust = dict(duckdb.sql(
        f"SELECT c_custkey, c_nationkey FROM '{SF_SMALL}/customer.parquet'"
    ).fetchall())
    nat_region = dict(duckdb.sql(
        f"SELECT n_nationkey, n_regionkey FROM '{SF_SMALL}/nation.parquet'"
    ).fetchall())
    sums = defaultdict(lambda: [0, 0])  # nation -> [cents, count]
    for ck, price in orders:
        nk = cust[ck]
        s = sums[nk]
        s[0] += int(round(float(price) * 100))
        s[1] += 1
    xs = {nk: _tdiv(c, m) for nk, (c, m) in sums.items()}
    n, s = len(xs), sum(xs.values())
    c = {nk: x * n - s for nk, x in xs.items()}
    keys = list(c)
    num = sum(
        c[i] * c[j]
        for i in keys for j in keys
        if i != j and nat_region[i] == nat_region[j]
    )
    den = sum(v * v for v in c.values())
    w = sum(
        1
        for i in keys for j in keys
        if i != j and nat_region[i] == nat_region[j]
    )
    assert int(got.n_nations) == n
    assert int(got.w_pairs) == w
    assert int(got.morans_i_e6) == (
        0 if w == 0 or den == 0 else _tdiv(n * num * 10**6, w * den)
    )
    assert int(got.expected_i_e6) == _tdiv(-(10**6), n - 1)
    assert w > 0 and den > 0  # guards never mask the replay


def test_cronbach_alpha_matches_bruteforce(spark):
    got = _pdf("cronbach_alpha_types", spark).iloc[0]
    rows = duckdb.sql(
        f"SELECT user_id, event_type FROM '{SF_SMALL}/events.parquet'"
    ).fetchall()
    ut = Counter((int(u), t) for u, t in rows)
    users = sorted({u for u, _ in ut})
    types = sorted({t for _, t in ut})
    n, k = len(users), len(types)
    sum_d = 0
    for t in types:
        xs = [ut.get((u, t), 0) for u in users]
        sum_d += n * sum(x * x for x in xs) - sum(xs) ** 2
    ys = [sum(ut.get((u, t), 0) for t in types) for u in users]
    d_tot = n * sum(y * y for y in ys) - sum(ys) ** 2
    assert int(got.k_items) == k
    assert int(got.n_users) == n
    assert int(got.sum_item_d) == sum_d
    assert int(got.d_total) == d_tot
    assert int(got.alpha_e6) == (
        0 if d_tot == 0 or k <= 1
        else _tdiv(k * (d_tot - sum_d) * 10**6, (k - 1) * d_tot)
    )
    assert d_tot > 0 and k > 1  # guards never mask the replay


def test_brown_forsythe_matches_bruteforce(spark):
    # column-wise access: .iloc[0] on the mixed row would coerce the
    # BIGINT columns to float64 and lose exactness above 2^53
    got_df = _pdf("brown_forsythe_var", spark)
    got = {c: got_df[c].iloc[0] for c in got_df.columns}
    rows = duckdb.sql(
        f"SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
        f" // 1000 AS band, CAST(substr(o_orderpriority, 1, 1) AS BIGINT)"
        f" AS pri FROM '{SF_SMALL}/orders.parquet'"
    ).fetchall()
    by_pri = defaultdict(list)
    for band, pri in rows:
        by_pri[int(pri)].append(int(band))
    # lower median per group, then the anova device on |band - median|
    tt = ss = qq = nn = 0
    per_group = []
    for pri, bands in sorted(by_pri.items()):
        bands.sort()
        med = bands[(len(bands) + 1) // 2 - 1]
        zs = [abs(b - med) for b in bands]
        n_g, s_g, q_g = len(zs), sum(zs), sum(z * z for z in zs)
        per_group.append((n_g, s_g, q_g))
        nn += n_g
        ss += s_g
        qq += q_g
        tt += _tdiv(s_g * s_g * 10**6, n_g)
    k = len(per_group)
    ssb = max(tt - _tdiv(ss * ss * 10**6, nn), 0)
    ssw = max(qq * 10**6 - tt, 0)
    assert int(got["k_groups"]) == k
    assert int(got["n_orders"]) == nn
    assert int(got["ssb_e6"]) == ssb
    assert int(got["ssw_e6"]) == ssw
    expected_f = (ssb / (k - 1)) / (ssw / (nn - k))
    assert abs(float(got["bf_f_stat"]) - expected_f) < 1e-5
