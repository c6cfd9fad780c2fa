"""Brute-force differential tests for the r10 statistics waves.

Same contract as tests/test_stats_queries.py: each test recomputes the
statistic INDEPENDENTLY (pandas/python loops/Fraction arithmetic over
the raw parquet — no SQL, no Spark expressions), so a misconception
shared by the Spark plan and its hand-mirrored DuckDB oracle cannot
hide. Exact integer outputs are matched through fractions.Fraction
with explicit truncation toward zero (`int(Fraction)`), the division
semantics both engines use.
"""

import hashlib
from collections import Counter
from fractions import Fraction

import duckdb
import pandas as pd
import pytest

from reddit_data_pipeline_engineering_spark.plans.queries import REGISTRY, queries

from .conftest import SF_SMALL

queries()  # force registration


def _pdf(name, spark):
    return REGISTRY[name].fn(spark, SF_SMALL).toPandas()


def _cents(x) -> int:
    # exact 2-decimal quantization (the data is 2-decimal by construction)
    return int(round(x * 100))


@pytest.fixture(scope="module")
def events_pdf():
    return duckdb.sql(
        f"SELECT ts, user_id, event_type, value FROM "
        f"'{SF_SMALL}/events.parquet'"
    ).df()


@pytest.fixture(scope="module")
def daily_orders_pdf():
    """(day, rev_cents, n_orders) — revenue as exact integer cents."""
    return duckdb.sql(
        f"SELECT CAST(o_orderdate AS DATE) AS d, "
        f"SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) "
        f"AS rev_c, COUNT(*) AS n FROM '{SF_SMALL}/orders.parquet' "
        f"GROUP BY 1 ORDER BY 1"
    ).df()


def _md5_bucket(v, buckets=2) -> int:
    return int(hashlib.md5(str(int(v)).encode()).hexdigest()[:8], 16) % buckets


def test_kendall_tau_matches_bruteforce(spark, daily_orders_pdf):
    import math

    out = _pdf("kendall_tau_daily", spark).iloc[0]
    g = daily_orders_pdf
    rev = [int(r) for r in g["rev_c"]]
    cnt = [int(n) for n in g["n"]]
    n = len(rev)
    C = D = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx, dy = rev[j] - rev[i], cnt[j] - cnt[i]
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
            if dx * dy > 0:
                C += 1
            elif dx * dy < 0:
                D += 1
    n0 = n * (n - 1) // 2
    assert out["n_days"] == n
    assert out["n_pairs"] == n0
    assert out["concordant"] == C and out["discordant"] == D
    assert out["ties_rev"] == tx and out["ties_orders"] == ty
    expect = round((C - D) / math.sqrt((n0 - tx) * (n0 - ty)), 6)
    assert out["tau_b"] == pytest.approx(expect, abs=1e-9)


def test_mcnemar_matches_pandas(spark, events_pdf):
    out = _pdf("mcnemar_paired_conversion", spark).iloc[0]
    e = events_pdf.copy()
    us = e["ts"].astype("int64") // 1000  # ns -> µs
    lo, hi = int(us.min()), int(us.max())
    mid = lo + (hi - lo) // 2
    purch = e["event_type"] == "purchase"
    early = e.loc[purch & (us < mid)].groupby("user_id").size()
    late = e.loc[purch & (us >= mid)].groupby("user_id").size()
    users = e["user_id"].unique()
    b = sum(1 for u in users if u in early.index and u not in late.index)
    c = sum(1 for u in users if u not in early.index and u in late.index)
    both = sum(1 for u in users if u in early.index and u in late.index)
    assert out["n_users"] == len(users)
    assert out["b_early_only"] == b and out["c_late_only"] == c
    assert out["both_halves"] == both
    expect = 0 if b + c == 0 else int(Fraction((b - c) ** 2 * 10000, b + c))
    assert out["mcnemar_bp"] == expect


def test_kappa_formula_matches_fractions(spark):
    """Chance-corrected agreement recomputed with Fraction over the
    scored relation's crosstab (the scoring itself is differential-
    tested by the lang-ID suite; this pins the kappa ALGEBRA)."""
    out = _pdf("cohen_kappa_agreement", spark).iloc[0]
    scored = _pdf("lang_id", spark)
    ct = pd.crosstab(scored["lang"], scored["pred_lang"])
    n = int(ct.values.sum())
    diag = int(sum(ct.at[l, l] for l in ct.index if l in ct.columns))
    pe_num = int(
        sum(
            int(ct.loc[l].sum()) * int(ct[l].sum())
            for l in ct.index
            if l in ct.columns
        )
    )
    assert out["n_docs"] == n and out["observed_agree"] == diag
    assert out["po_bp"] == int(Fraction(diag * 10000, n))
    assert out["pe_bp"] == int(Fraction(pe_num * 10000, n * n))
    expect = (
        0
        if n * n == pe_num
        else int(Fraction((n * diag - pe_num) * 10000, n * n - pe_num))
    )
    assert out["kappa_bp"] == expect


def test_gamma_matches_bruteforce(spark):
    out = _pdf("goodman_kruskal_gamma", spark).iloc[0]
    orders = duckdb.sql(
        f"SELECT CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS x, "
        f"CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) "
        f"// 5000000 AS y FROM '{SF_SMALL}/orders.parquet'"
    ).df()
    cells = Counter(zip(orders["x"], orders["y"]))
    C = D = 0
    items = list(cells.items())
    for (x1, y1), n1 in items:
        for (x2, y2), n2 in items:
            if x1 < x2 and y1 < y2:
                C += n1 * n2
            elif x1 < x2 and y1 > y2:
                D += n1 * n2
    assert out["n_orders"] == len(orders) and out["n_cells"] == len(cells)
    expect = 0 if C + D == 0 else int(Fraction((C - D) * 10000, C + D))
    assert out["gamma_bp"] == expect


def test_gini_stump_matches_bruteforce(spark):
    out = _pdf("gini_split_stump", spark).iloc[0]
    li = duckdb.sql(
        f"SELECT CAST(l_quantity AS INTEGER) AS q, "
        f"CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos "
        f"FROM '{SF_SMALL}/lineitem.parquet'"
    ).df()
    N = len(li)
    P = int(li["pos"].sum())
    best = None
    for t in sorted(li["q"].unique()):
        left = li[li["q"] <= t]
        nl, pl = len(left), int(left["pos"].sum())
        nr, pr = N - nl, P - pl
        if nr == 0:
            continue
        num = (nl * nl - pl * pl - (nl - pl) ** 2) * nr + (
            nr * nr - pr * pr - (nr - pr) ** 2
        ) * nl
        bp = int(Fraction(num * 10000, N * nl * nr))
        if best is None or bp < best[1]:
            best = (t, bp)
    parent = int(Fraction((N * N - P * P - (N - P) ** 2) * 10000, N * N))
    assert out["n_rows"] == N
    assert (out["split_qty"], out["split_gini_bp"]) == best
    assert out["parent_gini_bp"] == parent
    assert out["gain_bp"] == parent - best[1]


def test_yule_k_matches_counter(spark):
    out = _pdf("yule_k_vocab", spark).iloc[0]
    docs = duckdb.sql(
        f"SELECT text FROM '{SF_SMALL}/documents.parquet'"
    ).df()
    freq = Counter()
    for t in docs["text"]:
        freq.update(w for w in t.strip().split() if w)
    N = sum(freq.values())
    s2 = sum(m * m for m in freq.values())
    assert out["n_tokens"] == N and out["vocab_size"] == len(freq)
    assert out["yule_k_milli"] == int(Fraction((s2 - N) * 10000 * 1000, N * N))


def test_friedman_matches_pandas_ranks(spark, events_pdf):
    out = _pdf("friedman_test_types", spark).set_index("event_type")
    e = events_pdf.dropna(subset=["value"]).copy()
    e["d"] = e["ts"].dt.date
    e["v4"] = (e["value"].astype(float) * 10000).round().astype("int64")
    cells = e.groupby(["d", "event_type"])["v4"].sum()
    mat = cells.unstack(fill_value=0)
    # complete-block scaffold: every (day, type) cell, zeros filled
    r2 = (mat.rank(axis=1, method="average") * 2).astype("int64")
    n, k = mat.shape
    rank2_sums = r2.sum(axis=0)
    sr2 = int(sum(int(v) ** 2 for v in rank2_sums))
    chi_bp = int(
        Fraction(
            30000 * sr2 - 30000 * n * n * k * (k + 1) ** 2, n * k * (k + 1)
        )
    )
    for t, r in rank2_sums.items():
        row = out.loc[t]
        assert row["rank2_sum"] == int(r)
        assert row["n_blocks"] == n
        assert row["friedman_bp"] == chi_bp


def test_cochran_q_matches_pandas(spark, events_pdf):
    out = _pdf("cochran_q_types", spark).iloc[0]
    inc = events_pdf.groupby(["user_id", "event_type"]).size().clip(upper=1)
    mat = inc.unstack(fill_value=0)
    k = mat.shape[1]
    R = mat.sum(axis=1)
    Cj = mat.sum(axis=0)
    T = int(R.sum())
    sr2 = int((R * R).sum())
    sc2 = int((Cj * Cj).sum())
    assert out["n_users"] == mat.shape[0] and out["k_treatments"] == k
    expect = (
        0
        if k * T == sr2
        else int(Fraction((k - 1) * (k * sc2 - T * T) * 10000, k * T - sr2))
    )
    assert out["cochran_q_bp"] == expect


def test_page_trend_matches_pandas(spark, daily_orders_pdf):
    out = _pdf("page_trend_dow", spark).set_index("dow")
    g = daily_orders_pdf.copy()
    days = pd.to_datetime(g["d"]).map(
        lambda x: (x - pd.Timestamp("1970-01-01")).days
    )
    g["wk"] = (days + 3) // 7
    g["dow"] = (days + 3) % 7 + 1
    lo, hi = g["wk"].min(), g["wk"].max()
    interior = g[(g["wk"] > lo) & (g["wk"] < hi)]
    mat = (
        interior.pivot_table(
            index="wk", columns="dow", values="rev_c", aggfunc="sum"
        )
        .reindex(columns=range(1, 8))
        .fillna(0)
    )
    r2 = (mat.rank(axis=1, method="average") * 2).astype("int64")
    nw = mat.shape[0]
    l2 = int(sum(int(dow) * int(r2[dow].sum()) for dow in r2.columns))
    for dow in range(1, 8):
        row = out.loc[dow]
        assert row["rank2_sum"] == int(r2[dow].sum())
        assert row["page_l2"] == l2
        assert row["page_l2_null"] == nw * 224
        assert row["n_weeks"] == nw


def test_cvm_matches_bruteforce(spark, events_pdf):
    out = _pdf("cvm_two_sample_ab", spark).iloc[0]
    e = events_pdf.dropna(subset=["value"])
    e = e[e["event_type"] == "purchase"]
    a, b = [], []
    for u, v in zip(e["user_id"], e["value"]):
        (a if _md5_bucket(u) == 0 else b).append(_cents(v))
    n, m = len(a), len(b)
    grid = sorted(set(a + b))
    ca, cb = Counter(a), Counter(b)
    cum_a = cum_b = 0
    s = 0
    for v in grid:
        cum_a += ca[v]
        cum_b += cb[v]
        s += (ca[v] + cb[v]) * (cum_a * m - cum_b * n) ** 2
    assert out["n_a"] == n and out["n_b"] == m
    assert out["n_cells"] == len(grid)
    assert out["cvm_t_e6"] == int(
        Fraction(s * 1000000, (n + m) ** 2 * n * m)
    )


def test_obf_matches_bruteforce(spark, events_pdf):
    out = _pdf("obf_sequential_ab", spark).set_index("look")
    e = events_pdf.copy()
    us = e["ts"].astype("int64") // 1000
    lo, hi = int(us.min()), int(us.max())
    first = us.groupby(e["user_id"]).min()
    fp = us[e["event_type"] == "purchase"].groupby(
        e.loc[e["event_type"] == "purchase", "user_id"]
    ).min()
    for k in range(1, 6):
        bk = lo + (hi - lo) * k // 5
        na = ca = nb = cb = 0
        for u, f in first.items():
            arm_a = _md5_bucket(u) == 0
            if f <= bk:
                na += arm_a
                nb += not arm_a
            if u in fp.index and fp[u] <= bk:
                ca += arm_a
                cb += not arm_a
        row = out.loc[k]
        assert (row["n_a"], row["conv_a"], row["n_b"], row["conv_b"]) == (
            na, ca, nb, cb,
        )
        c, n = ca + cb, na + nb
        if na == 0 or nb == 0 or c == 0 or c == n:
            expect = 0
        else:
            expect = int(
                Fraction(
                    (ca * nb - cb * na) ** 2 * n * 10000,
                    na * nb * c * (n - c),
                )
            )
        assert row["z2_bp"] == expect
        assert row["thr_bp"] == 208080 // k
        assert bool(row["crossed"]) == (expect >= 208080 // k)


def test_hhi_matches_fractions(spark):
    out = _pdf("market_hhi_concentration", spark).set_index("nation")
    df = duckdb.sql(
        f"SELECT s.s_nationkey AS nk, l.l_suppkey AS sk, "
        f"SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT))"
        f" AS c FROM '{SF_SMALL}/lineitem.parquet' l "
        f"JOIN '{SF_SMALL}/supplier.parquet' s ON l.l_suppkey = s.s_suppkey "
        f"GROUP BY 1, 2"
    ).df()
    names = duckdb.sql(
        f"SELECT n_nationkey, n_name FROM '{SF_SMALL}/nation.parquet'"
    ).df().set_index("n_nationkey")["n_name"]
    for nk, g in df.groupby("nk"):
        s = [int(x) for x in g["c"]]
        tot = sum(s)
        row = out.loc[names[nk]]
        assert row["n_suppliers"] == len(s)
        assert row["hhi_bp"] == int(
            Fraction(sum(x * x for x in s) * 10000, tot * tot)
        )
        assert row["top_share_bp"] == int(Fraction(max(s) * 10000, tot))


def test_backtest_matches_pandas(spark, daily_orders_pdf):
    out = _pdf("seasonal_naive_backtest", spark).iloc[0]
    g = daily_orders_pdf.set_index(pd.to_datetime(daily_orders_pdf["d"]))
    rev = {d: int(r) for d, r in zip(g.index, g["rev_c"])}
    errs = [
        abs(rev[d] - rev[d - pd.Timedelta(days=7)])
        for d in rev
        if d - pd.Timedelta(days=7) in rev
    ]
    acts = [
        rev[d] for d in rev if d - pd.Timedelta(days=7) in rev
    ]
    assert out["n_days"] == len(errs)
    assert out["sum_abs_err_c"] == sum(errs)
    assert out["mae_c"] == sum(errs) // len(errs)
    assert out["wape_bp"] == int(Fraction(sum(errs) * 10000, sum(acts)))


def test_trigram_matches_python_loops(spark, events_pdf):
    out = _pdf("event_trigram_topk", spark)
    e = events_pdf.copy()
    e["us"] = e["ts"].astype("int64")
    ev_ids = duckdb.sql(
        f"SELECT event_id, ts, user_id FROM '{SF_SMALL}/events.parquet'"
    ).df()
    e = e.join(ev_ids["event_id"])
    grams = Counter()
    for _, g in e.groupby("user_id"):
        seq = list(
            g.sort_values(["us", "event_id"])["event_type"]
        )
        for i in range(len(seq) - 2):
            grams[">".join(seq[i : i + 3])] += 1
    top = sorted(grams.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = list(zip(out["trigram"], out["n_occurrences"]))
    assert got == [(t, c) for t, c in top]
