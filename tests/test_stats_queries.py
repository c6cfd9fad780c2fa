"""Brute-force differential tests for the queries_stats family.

Each test recomputes the statistic independently (pandas/numpy/hashlib
over the raw parquet — no SQL, no Spark expressions) and compares the
query's output, so a shared misconception between the Spark plan and
the DuckDB oracle can't hide: the replay here uses float math and
library rank/corr primitives where the queries use scaled integers, and
the assertions bridge the two representations explicitly.
"""

import hashlib
import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from reddit_data_pipeline_engineering_spark.plans.queries import REGISTRY, queries

from .conftest import SF_SMALL

queries()  # force registration


def _pdf(name, spark):
    return REGISTRY[name].fn(spark, SF_SMALL).toPandas()


@pytest.fixture(scope="module")
def events_pdf():
    return duckdb.sql(
        f"SELECT ts, user_id, event_type, value FROM "
        f"'{SF_SMALL}/events.parquet'"
    ).df()


def test_acf_matches_numpy_pearson(spark, events_pdf):
    out = _pdf("acf_lag_profile", spark).set_index("lag")
    daily = (
        events_pdf.assign(day=events_pdf["ts"].dt.normalize())
        .groupby("day")
        .size()
        .sort_index()
    )
    days = daily.index
    for lag in range(1, 8):
        shifted = days + pd.Timedelta(days=lag)
        aligned = daily.reindex(shifted)
        mask = aligned.notna().to_numpy()
        x = daily.to_numpy()[mask].astype(float)
        y = aligned.to_numpy()[mask].astype(float)
        r = np.corrcoef(x, y)[0, 1]
        row = out.loc[lag]
        assert row["n_pairs"] == mask.sum()
        # acf2_bp is sign(r) * floor(r^2 * 1e4): same sign, r^2 within
        # one basis point of the float recomputation.
        got = row["acf2_bp"]
        assert np.sign(got) == np.sign(round(r, 10)) or got == 0
        assert abs(abs(got) / 1e4 - r * r) < 2e-4


def test_spearman_matches_pandas_ranks(spark):
    out = _pdf("spearman_daily_corr", spark).set_index("priority")
    orders = duckdb.sql(
        f"SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) "
        f"AS day, o_totalprice FROM '{SF_SMALL}/orders.parquet'"
    ).df()
    daily = (
        orders.groupby(["priority", "day"])
        .agg(n_orders=("o_totalprice", "size"), revenue=("o_totalprice", "sum"))
        .reset_index()
    )
    for prio, g in daily.groupby("priority"):
        g = g.reset_index(drop=True)
        # Deterministic (value, day) tie-break = ordinal rank assigned
        # along each lexicographic sort — the query's row_number
        # semantics — attached back to the rows by position.
        rx = pd.Series(0, index=g.index)
        rx.loc[g.sort_values(["n_orders", "day"]).index] = np.arange(
            1, len(g) + 1
        )
        ry = pd.Series(0, index=g.index)
        ry.loc[g.sort_values(["revenue", "day"]).index] = np.arange(
            1, len(g) + 1
        )
        n = len(g)
        sd2 = int(((rx - ry) ** 2).sum())
        row = out.loc[prio]
        assert row["n_days"] == n
        assert row["sd2"] == sd2
        num = n * (n * n - 1) - 6 * sd2
        expect = int(math.copysign(abs(num) * 10000 // (n * (n * n - 1)), num))
        assert row["rho_bp"] == expect


def test_pmi_matches_counter_bruteforce(spark):
    out = _pdf("pmi_collocations", spark)
    docs = duckdb.sql(
        f"SELECT text FROM '{SF_SMALL}/documents.parquet'"
    ).df()["text"]
    from collections import Counter

    uni, bg = Counter(), Counter()
    n_bigrams = 0
    for t in docs:
        ws = t.split(" ")
        uni.update(ws)
        bg.update(zip(ws, ws[1:]))
        n_bigrams += max(0, len(ws) - 1)
    scored = []
    for (x, y), cxy in bg.items():
        if cxy < 20:
            continue
        s = (cxy * 1_000_000 // uni[x]) * n_bigrams // uni[y]
        scored.append((f"{x} {y}", cxy, uni[x], uni[y], s))
    scored.sort(key=lambda r: (-r[4], r[0]))
    expect = scored[:30]
    got = [
        (r[0], int(r[1]), int(r[2]), int(r[3]), int(r[4]))
        for r in out.itertuples(index=False, name=None)
    ]
    assert got == expect


def test_dedup_quality_shift_matches_hashlib(spark):
    out = _pdf("dedup_quality_shift", spark).set_index("source")
    docs = duckdb.sql(
        f"SELECT doc_id, source, text FROM '{SF_SMALL}/documents.parquet' "
        f"ORDER BY doc_id"
    ).df()
    toks = docs["text"].map(lambda t: [w for w in t.strip().split() if w])
    docs["fp"] = toks.map(
        lambda ws: hashlib.md5(" ".join(w.lower() for w in ws).encode()).hexdigest()
    )
    docs["dr_bp"] = toks.map(lambda ws: len(set(ws)) * 10000 // len(ws))
    docs["survives"] = ~docs.duplicated("fp")  # first occurrence by doc_id
    for src, g in docs.groupby("source"):
        row = out.loc[src]
        surv = g[g["survives"]]
        assert row["n_docs"] == len(g)
        assert row["n_survivors"] == len(surv)
        assert row["mean_dr_bp_all"] == int(g["dr_bp"].sum()) // len(g)
        assert row["mean_dr_bp_surv"] == int(surv["dr_bp"].sum()) // len(surv)


def test_acf_detects_weekly_cycle_on_synthetic(spark):
    """A pure 7-day cycle must spike acf2_bp at lag 7 and sit negative
    or near zero at the off-phase lags — the diagnostic the query
    exists for, pinned on a constructed series via the same plan
    arithmetic (moments recomputed here in exact ints)."""
    x = [100, 100, 100, 100, 100, 300, 300] * 8  # 8 weeks, weekend spike
    n = len(x)
    for lag, expect_high in ((7, True), (3, False)):
        xs = x[: n - lag]
        ys = x[lag:]
        m = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        syy = sum(b * b for b in ys)
        num = m * sxy - sx * sy
        denx, deny = m * sxx - sx * sx, m * syy - sy * sy
        acf2 = (1 if num > 0 else -1 if num < 0 else 0) * (
            num * num * 10000 // (denx * deny)
        )
        if expect_high:
            assert acf2 == 10000  # perfect periodicity: r = 1 exactly
        else:
            assert acf2 < 0  # off-phase lag anti-correlates


def test_heaps_matches_first_occurrence_bruteforce(spark):
    out = _pdf("heaps_vocab_growth", spark)
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_SMALL}/documents.parquet'"
    ).df()
    n_docs = int(docs["doc_id"].max()) + 1
    first_seen = {}
    tokens_per_decile = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        d = int(doc_id) * 10 // n_docs
        ws = text.split(" ")
        tokens_per_decile[d] = tokens_per_decile.get(d, 0) + len(ws)
        for w in ws:
            if w not in first_seen or first_seen[w] > int(doc_id):
                first_seen[w] = int(doc_id)
    new_per_decile = {}
    for w, fd in first_seen.items():
        d = fd * 10 // n_docs
        new_per_decile[d] = new_per_decile.get(d, 0) + 1
    cum_v = cum_t = 0
    for row in out.itertuples(index=False):
        cum_v += new_per_decile.get(row.decile, 0)
        cum_t += tokens_per_decile.get(row.decile, 0)
        assert row.n_new_words == new_per_decile.get(row.decile, 0)
        assert row.cum_vocab == cum_v
        assert row.n_tokens == tokens_per_decile.get(row.decile, 0)
        assert row.cum_tokens == cum_t
    # The full corpus vocabulary is exactly the final cumulative point.
    assert cum_v == len(first_seen)


def test_burstiness_matches_pandas_bruteforce(spark):
    out = _pdf("interarrival_burstiness", spark).set_index("event_type")
    ev = duckdb.sql(
        f"SELECT event_type, user_id, event_id, "
        f"epoch_us(date_trunc('second', ts)) // 1000000 AS es, ts "
        f"FROM '{SF_SMALL}/events.parquet'"
    ).df()
    for etype, g in ev.groupby("event_type"):
        gaps = []
        for _, u in g.groupby("user_id"):
            es = u.sort_values(["ts", "event_id"])["es"].to_list()
            gaps += [b - a for a, b in zip(es, es[1:])]
        n = len(gaps)
        s1 = sum(gaps)
        s2 = sum(x * x for x in gaps)
        row = out.loc[etype]
        assert row["n_gaps"] == n
        assert row["s1"] == s1
        assert row["s2"] == s2
        assert row["cv2_bp"] == (n * s2 - s1 * s1) * 10000 // (s1 * s1)


def test_burstiness_poisson_vs_bursty_distinguishes():
    """The statistic itself (pure python, same integer formula): regular
    arrivals score ~0, exponential-ish arrivals ~10000, bursty >>10000."""
    regular = [60] * 500
    # alternating burst/silence: 9 one-second gaps then one 600 s gap
    bursty = ([1] * 9 + [600]) * 50
    def cv2(gaps):
        n, s1, s2 = len(gaps), sum(gaps), sum(x * x for x in gaps)
        return (n * s2 - s1 * s1) * 10000 // (s1 * s1)
    assert cv2(regular) == 0
    assert cv2(bursty) > 80000


from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=20, max_value=10_000),   # cxy
            st.integers(min_value=0, max_value=1_000_000), # cx surplus
            st.integers(min_value=0, max_value=1_000_000), # cy surplus
        ),
        min_size=2,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=10**9),  # extra corpus bigrams
)
def test_pmi_staged_ranking_tracks_exact_ratio(rows, extra_n):
    """The staged integer score (cxy*1e6 div cx) * N div cy may deviate
    from the exact rational 1e6-scaled ratio cxy*1e6*N/(cx*cy) by at
    most N/cy + 1 ABSOLUTE (stage-1's <1 truncation amplified by
    N div cy, plus stage-2's own <1) — the documented bound in
    queries_stats.py. Two properties over the same formula the query
    and oracle share (c(xy) <= c(x), c(y) as in any real count table):
    the per-candidate error bound holds, and any ranking inversion vs
    the exact ratio only happens between candidates whose exact scores
    sit within the sum of their bounds (staging reorders only
    effective ties)."""
    n_total = sum(r[0] for r in rows) + extra_n
    cands = []
    for i, (cxy, sx, sy) in enumerate(rows):
        cx, cy = cxy + sx, cxy + sy
        staged = (cxy * 1_000_000 // cx) * n_total // cy
        exact = Fraction(cxy * 1_000_000 * n_total, cx * cy)
        bound = Fraction(n_total, cy) + 1
        assert 0 <= exact - staged <= bound, (staged, exact, bound)
        cands.append((staged, exact, bound, i))
    staged_order = [c[3] for c in sorted(cands, key=lambda c: -c[0])]
    by_i = {i: (staged, exact, bound) for staged, exact, bound, i in cands}
    for a, b in zip(staged_order, staged_order[1:]):
        _, ea, ba = by_i[a]
        _, eb, bb = by_i[b]
        if ea < eb:  # inverted vs exact ranking
            assert eb - ea <= ba + bb, (ea, eb, ba, bb)


def test_ks_source_drift_matches_brute_force(spark):
    """Third independent KS: pure-Python ECDF sup with cleared
    denominators, one-vs-rest per source."""
    import re as _re
    from collections import Counter

    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF_SMALL}/documents.parquet").to_pylist()
    lens_by_src: dict[str, list[int]] = {}
    for d in docs:
        n = len([t for t in _re.split(r"\s+", d["text"].strip()) if t])
        lens_by_src.setdefault(d["source"], []).append(n)
    all_lens = sorted({v for vs in lens_by_src.values() for v in vs})
    n_all = sum(len(v) for v in lens_by_src.values())
    want = []
    for s in sorted(lens_by_src):
        cs, ca = Counter(lens_by_src[s]), Counter()
        for vs in lens_by_src.values():
            ca.update(vs)
        n_s = len(lens_by_src[s])
        n_r = n_all - n_s
        cum_s = cum_a = 0
        d_num = 0
        for v in all_lens:
            cum_s += cs.get(v, 0)
            cum_a += ca.get(v, 0)
            d_num = max(d_num, abs(cum_s * n_r - (cum_a - cum_s) * n_s))
        want.append((s, n_s, n_r, d_num, d_num * 1_000_000 // (n_s * n_r)))
    got = [tuple(r) for r in REGISTRY["ks_source_drift"].fn(spark, SF_SMALL).collect()]
    assert got == want


def test_ks_drift_decimal_survives_2_63_overflow(spark):
    """Overflow regression (VERDICT r06 #6 + ADVICE r06): with counts
    near 2^63 the old BIGINT pipeline silently wrapped on the d_num*1e6
    product (from ~3e6 docs per side); the DECIMAL(38,0) form must stay
    integer-exact. Adversarial counts can't be materialized as document
    rows, so the factored counts-relation helper is driven directly and
    checked against unbounded Python-int arithmetic and the DuckDB
    HUGEINT oracle on the same counts.

    r08 output contract: the decision value ks_ppm stays integer-exact
    (DECIMAL internally, BIGINT out); the d_num diagnostic is emitted as
    DOUBLE (driver-hash-safe — decimal outputs are banned), so it is
    checked to double precision, not to the unit."""
    import duckdb

    from reddit_data_pipeline_engineering_spark.plans.queries_stats import (
        ks_drift_from_counts,
    )

    # Sides ~1e13 put d_num ~ n_src*n_rest ~ 2e26 — far past 2^63 (the
    # old wrap point) yet inside the documented DECIMAL(38,0) ceiling
    # (d_num*1e6 < 1e38). Beyond that ceiling Spark ANSI mode raises
    # loudly rather than wrapping (verified while sizing this fixture).
    big = 10**13 + 7919
    counts = [
        ("a", 1, big),
        ("a", 2, 3),
        ("b", 1, 5),
        ("b", 2, big - 11),
        ("c", 3, big // 3),
    ]
    cnt = spark.createDataFrame(counts, "source string, l int, c long")
    got = {r["source"]: tuple(r) for r in ks_drift_from_counts(cnt).collect()}

    # Unbounded Python ints: the ground truth no 64-bit engine can wrap.
    srcs = sorted({s for s, _, _ in counts})
    vals = sorted({v for _, v, _ in counts})
    n_all = sum(c for _, _, c in counts)
    for s in srcs:
        n_s = sum(c for src, _, c in counts if src == s)
        n_r = n_all - n_s
        cum_s = cum_a = d_num = 0
        for v in vals:
            cum_s += sum(c for src, vv, c in counts if src == s and vv == v)
            cum_a += sum(c for _, vv, c in counts if vv == v)
            d_num = max(d_num, abs(cum_s * n_r - (cum_a - cum_s) * n_s))
        ppm = d_num * 1_000_000 // (n_s * n_r)
        assert d_num > 2**63, "fixture must actually exceed BIGINT"
        g = got[s]
        assert (g[0], g[1], g[2], g[4]) == (s, n_s, n_r, ppm), g
        assert g[3] == float(d_num), g  # DOUBLE leg: nearest-double exact

    # DuckDB leg of the oracle arithmetic on the same counts relation.
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE cnt(source VARCHAR, l INT, c BIGINT)"
    )
    con.executemany("INSERT INTO cnt VALUES (?, ?, ?)", counts)
    rows = con.execute(
        """
        WITH srcs AS (SELECT source, SUM(c) AS n_src FROM cnt GROUP BY source),
        vals AS (SELECT DISTINCT l FROM cnt),
        tot AS (SELECT SUM(c) AS n_all FROM cnt),
        grid AS (
          SELECT s.source, s.n_src, v.l, COALESCE(c.c, 0) AS c_src,
                 (SELECT SUM(c2.c) FROM cnt c2 WHERE c2.l = v.l) AS c_all
          FROM srcs s CROSS JOIN vals v
          LEFT JOIN cnt c ON c.source = s.source AND c.l = v.l
        ),
        cum AS (
          SELECT source, n_src, l,
                 SUM(c_src) OVER (PARTITION BY source ORDER BY l) AS cum_src,
                 SUM(COALESCE(c_all,0)) OVER (PARTITION BY source ORDER BY l) AS cum_all
          FROM grid
        )
        SELECT g.source,
               MAX(ABS(CAST(g.cum_src AS HUGEINT) * (t.n_all - g.n_src)
                       - (g.cum_all - g.cum_src) * g.n_src)) AS d_num,
               CAST(MAX(ABS(CAST(g.cum_src AS HUGEINT) * (t.n_all - g.n_src)
                            - (g.cum_all - g.cum_src) * g.n_src)) * 1000000
                    // (CAST(g.n_src AS HUGEINT) * (t.n_all - g.n_src))
                    AS BIGINT) AS ks_ppm
        FROM cum g, tot t GROUP BY g.source, g.n_src, t.n_all ORDER BY g.source
        """
    ).fetchall()
    for s, d_num, ppm in rows:
        assert got[s][3] == float(d_num) and got[s][4] == ppm


def test_ab_ztest_replay(spark, events_pdf):
    import hashlib

    out = _pdf("ab_conversion_ztest", spark).set_index("metric")
    flags = {}
    for _, r in events_pdf.iterrows():
        u = int(r["user_id"])
        d = flags.setdefault(u, {"purchase": 0, "signup": 0})
        if r["event_type"] in d:
            d[r["event_type"]] = 1
    arms = {"A": [0, 0, 0], "B": [0, 0, 0]}  # n, conv_purchase, conv_signup
    for u, d in flags.items():
        h = int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2
        v = "A" if h == 0 else "B"
        arms[v][0] += 1
        arms[v][1] += d["purchase"]
        arms[v][2] += d["signup"]
    for mi, metric in enumerate(("purchase", "signup"), start=1):
        n_a, n_b = arms["A"][0], arms["B"][0]
        c_a, c_b = arms["A"][mi], arms["B"][mi]
        row = out.loc[metric]
        assert (int(row["n_a"]), int(row["conv_a"])) == (n_a, c_a)
        assert (int(row["n_b"]), int(row["conv_b"])) == (n_b, c_b)
        C, N = c_a + c_b, n_a + n_b
        if C == 0 or C == N:
            expect = 0
        else:
            d = c_a * n_b - c_b * n_a
            expect = d * d * N * 10000 // (n_a * n_b * C * (N - C))
        assert int(row["z2_bp"]) == expect
        assert int(row["significant"]) == int(expect > 38416)


def test_correlation_matrix_matches_numpy(spark):
    import duckdb
    import numpy as np

    out = {
        (r["col_a"], r["col_b"]): (r["n"], r["corr_r"])
        for _, r in _pdf("correlation_matrix", spark).iterrows()
    }
    pdf = duckdb.sql(
        f"SELECT l_discount AS discount, l_extendedprice AS price, "
        f"l_quantity AS quantity, l_tax AS tax "
        f"FROM '{SF_SMALL}/lineitem.parquet'"
    ).df()
    cols = ["discount", "price", "quantity", "tax"]
    X = {c: np.round(pdf[c].to_numpy() * 10000).astype(np.int64) for c in cols}
    n = len(pdf)
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            num = n * int((X[a].astype(object) * X[b]).sum()) - int(
                X[a].sum()
            ) * int(X[b].sum())
            da = n * int((X[a].astype(object) * X[a]).sum()) - int(
                X[a].sum()
            ) ** 2
            db = n * int((X[b].astype(object) * X[b]).sum()) - int(
                X[b].sum()
            ) ** 2
            expect = num / (da**0.5 * db**0.5)
            got_n, got_r = out[(a, b)]
            assert got_n == n
            assert abs(got_r - expect) < 2e-6
            # and it agrees with numpy's own corrcoef
            ref = np.corrcoef(X[a].astype(float), X[b].astype(float))[0, 1]
            assert abs(got_r - ref) < 1e-5


def _doc_lengths_by_source():
    import re as _re

    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF_SMALL}/documents.parquet").to_pylist()
    by_src: dict[str, list[int]] = {}
    for d in docs:
        n = len([t for t in _re.split(r"\s+", d["text"].strip()) if t])
        by_src.setdefault(d["source"], []).append(n)
    return by_src


def _midranks(all_vals: list[int]) -> dict[int, float]:
    """Classical average ranks over the pooled sample — the O(n log n)
    single-machine presentation the engine's count-based grid must
    reproduce exactly."""
    from collections import Counter

    c = Counter(all_vals)
    ranks, cum = {}, 0
    for v in sorted(c):
        t = c[v]
        ranks[v] = cum + (t + 1) / 2
        cum += t
    return ranks


def test_mannwhitney_matches_bruteforce(spark):
    """Engine midrank grid vs an independent sort-based rank pass:
    rb_ppm integer-exact, z to 6dp (the emitted rounding)."""
    import math

    by_src = _doc_lengths_by_source()
    pooled = [v for vs in by_src.values() for v in vs]
    ranks = _midranks(pooled)
    n = len(pooled)
    t_ties = sum(t**3 - t for t in __import__("collections").Counter(pooled).values())
    got = {
        r["source"]: tuple(r)
        for r in REGISTRY["mannwhitney_source_test"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(by_src)
    for s, vs in by_src.items():
        n_s, n_r = len(vs), n - len(vs)
        r_s = sum(ranks[v] for v in vs)
        u = r_s - n_s * (n_s + 1) / 2
        a = 2 * (u - n_s * n_r / 2)          # exact: .5s cancel in the double
        rb_ppm = math.copysign(abs(int(a)) * 1_000_000 // (n_s * n_r), a)
        var4 = n_s * n_r * (n**3 - n - t_ties) / (3 * n * (n - 1))
        z = round(a / math.sqrt(var4), 6)
        g = got[s]
        assert (g[1], g[2], g[3]) == (n_s, n_r, int(rb_ppm)), g
        assert abs(g[4] - z) < 2e-6, (s, g[4], z)


def test_kruskal_wallis_matches_bruteforce(spark):
    """h_micro within (k+2) micro-units of the real-valued H (each of
    the k per-group trunc-divs and the final one loses < 1 micro)."""
    by_src = _doc_lengths_by_source()
    pooled = [v for vs in by_src.values() for v in vs]
    ranks = _midranks(pooled)
    n, k = len(pooled), len(by_src)
    from collections import Counter

    t_ties = sum(t**3 - t for t in Counter(pooled).values())
    h = (12 / (n * (n + 1))) * sum(
        sum(ranks[v] for v in vs) ** 2 / len(vs) for vs in by_src.values()
    ) - 3 * (n + 1)
    h_tc = h / (1 - t_ties / (n**3 - n))
    [row] = REGISTRY["kruskal_wallis_lengths"].fn(spark, SF_SMALL).collect()
    assert row["n_all"] == n and row["k_groups"] == k
    assert abs(row["h_micro"] / 1e6 - h) < (k + 2) / 1e6 + 1e-9
    assert row["tie_ppm"] == t_ties * 1_000_000 // (n**3 - n)
    assert abs(row["h_tie_corrected"] - h_tc) < 1e-4


def test_mannwhitney_counts_survive_big_magnitudes(spark):
    """Adversarial counts (~1e9 docs per value — beyond any local
    fixture): rb_ppm must match unbounded Python-int arithmetic
    exactly; DECIMAL(38,0) keeps every product exact far past 2^63."""
    from reddit_data_pipeline_engineering_spark.plans.queries_stats import (
        mannwhitney_from_counts,
    )

    big = 10**9 + 7
    counts = [
        ("a", 1, big),
        ("a", 2, 13),
        ("b", 1, 7),
        ("b", 2, big - 5),
        ("c", 2, big // 2),
    ]
    cnt = spark.createDataFrame(counts, "source string, l int, c long")
    got = {r["source"]: tuple(r) for r in mannwhitney_from_counts(cnt).collect()}

    from collections import Counter

    pooled = Counter()
    for _, v, c in counts:
        pooled[v] += c
    n = sum(pooled.values())
    vals = sorted(pooled)
    cum, r2 = 0, {}
    for v in vals:
        r2[v] = 2 * cum + pooled[v] + 1
        cum += pooled[v]
    for s in sorted({s for s, _, _ in counts}):
        n_s = sum(c for src, _, c in counts if src == s)
        n_r = n - n_s
        r2_sum = sum(c * r2[v] for src, v, c in counts if src == s)
        a = r2_sum - n_s * (n_s + 1) - n_s * n_r
        assert abs(a) * 1_000_000 > 2**63  # the product BIGINT would wrap on
        rb = (1 if a >= 0 else -1) * (abs(a) * 1_000_000 // (n_s * n_r))
        g = got[s]
        assert (g[1], g[2], g[3]) == (n_s, n_r, rb), (s, g)


def test_xcorr_matches_numpy_pearson(spark, events_pdf):
    """Cross-type lead-lag vs a numpy recomputation (same bridge as the
    ACF test: xcorr2_bp is sign(r) * floor(r^2 * 1e4))."""
    out = _pdf("xcorr_lead_lag", spark).set_index(["type_a", "type_b", "lag"])
    daily = (
        events_pdf.assign(day=events_pdf["ts"].dt.normalize())
        .groupby(["event_type", "day"])
        .size()
    )
    types = sorted(daily.index.get_level_values(0).unique())
    checked = 0
    for ta in types:
        xa = daily.loc[ta]
        for tb in types:
            if tb == ta:
                continue
            xb = daily.loc[tb]
            for lag in range(8):
                shifted = xa.index + pd.Timedelta(days=lag)
                aligned = xb.reindex(shifted)
                mask = aligned.notna().to_numpy()
                x = xa.to_numpy()[mask].astype(float)
                y = aligned.to_numpy()[mask].astype(float)
                row = out.loc[(ta, tb, lag)]
                assert row["n_pairs"] == mask.sum()
                if x.std() == 0 or y.std() == 0:
                    assert pd.isna(row["xcorr2_bp"])
                    continue
                r = np.corrcoef(x, y)[0, 1]
                got = row["xcorr2_bp"]
                assert np.sign(got) == np.sign(round(r, 10)) or got == 0
                assert abs(abs(got) / 1e4 - r * r) < 2e-4
                checked += 1
    assert checked >= 100  # the fixture genuinely exercises the grid


def test_median_ci_matches_sorted_order_statistics(spark):
    """Selection from the counts grid vs explicit sorted-list indexing,
    with the rank formulas replayed in Python floats (same IEEE ops)."""
    by_src = _doc_lengths_by_source()
    got = {
        r["source"]: tuple(r)
        for r in REGISTRY["median_ci_sources"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(by_src)
    for s, vs in by_src.items():
        xs = sorted(vs)
        n = len(xs)
        r_med = (n + 1) // 2
        r_lo = max(1, math.floor((n - 1.96 * math.sqrt(n)) / 2.0))
        r_hi = min(n, math.ceil((n + 1.96 * math.sqrt(n)) / 2.0) + 1)
        expect = (s, n, xs[r_med - 1], xs[r_lo - 1], xs[r_hi - 1])
        assert got[s] == expect, (got[s], expect)
        # The interval actually brackets the median.
        assert got[s][3] <= got[s][2] <= got[s][4]


def test_wilson_ci_matches_python(spark, events_pdf):
    """Wilson bounds vs an independent Python recomputation (statsmodels
    absent — the closed form is replayed with math.sqrt), plus the
    bracketing property rate in (lo, hi) on every arm."""
    import hashlib as _hl

    out = {
        (r["variant"], r["metric"]): r
        for r in REGISTRY["wilson_conversion_ci"].fn(spark, SF_SMALL).collect()
    }
    per_user = {}
    for _, row in events_pdf.iterrows():
        u = int(row["user_id"])
        d = per_user.setdefault(u, {"hv": 0, "np": 0})
        if row["event_type"] == "purchase":
            d["np"] += 1
            if row["value"] > 150:
                d["hv"] = 1
    arms = {}
    for u, d in per_user.items():
        bucket = int(_hl.md5(str(u).encode()).hexdigest()[:8], 16) % 2
        v = "A" if bucket == 0 else "B"
        a = arms.setdefault(v, {"n": 0, "high_value": 0, "heavy_buyer": 0})
        a["n"] += 1
        a["high_value"] += d["hv"]
        a["heavy_buyer"] += 1 if d["np"] >= 15 else 0
    assert set(arms) == {"A", "B"}
    checked = 0
    for v, a in arms.items():
        for m in ("high_value", "heavy_buyer"):
            n, c = a["n"], a[m]
            r = out[(v, m)]
            assert (r["n"], r["conv"]) == (n, c)
            assert r["rate_ppm"] == c * 1_000_000 // n
            p = c / n
            denom = 1.0 + 3.8416 / n
            center = p + 1.9208 / n
            half = 1.96 * math.sqrt((p * (1.0 - p) + 0.9604 / n) / n)
            assert abs(r["wilson_lo"] - (center - half) / denom) < 2e-6
            assert abs(r["wilson_hi"] - (center + half) / denom) < 2e-6
            assert r["wilson_lo"] < p < r["wilson_hi"]
            assert 0 < c < n  # the metric genuinely varies on the fixture
            checked += 1
    assert checked == 4


def _doc_lengths():
    pdf = duckdb.sql(
        f"SELECT source, lang, text FROM '{SF_SMALL}/documents.parquet'"
    ).df()
    pdf["x"] = pdf["text"].str.split().str.len()
    return pdf


def test_anova_f_matches_numpy(spark):
    out = _pdf("anova_f_sources", spark).iloc[0]
    pdf = _doc_lengths()
    groups = [g["x"].to_numpy(dtype=float) for _, g in pdf.groupby("source")]
    k, n = len(groups), len(pdf)
    grand = pdf["x"].mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert out["k_groups"] == k and out["n_docs"] == n
    assert abs(out["f_stat"] - f) < 1e-4 * max(1.0, abs(f))
    assert abs(out["eta2_ppm"] / 1e6 - ssb / (ssb + ssw)) < 2e-6


def test_welch_cohen_matches_numpy(spark, events_pdf):
    out = _pdf("welch_cohen_effect", spark).iloc[0]
    # Replay the e4 quantization: the query measures the DECIMAL(14,4)
    # projection of value, not the raw float.
    q = events_pdf[events_pdf["event_type"].isin(["purchase", "view"])]
    import decimal

    def e4(s):
        return np.array(
            [
                int(
                    decimal.Decimal(repr(v)).quantize(
                        decimal.Decimal("0.0001"),
                        rounding=decimal.ROUND_HALF_UP,
                    )
                    * 10000
                )
                for v in s
            ],
            dtype=float,
        )

    a = e4(q.loc[q["event_type"] == "purchase", "value"])
    b = e4(q.loc[q["event_type"] == "view", "value"])
    n1, n2 = len(a), len(b)
    m1, m2 = a.mean(), b.mean()
    v1, v2 = a.var(ddof=1), b.var(ddof=1)
    t = (m1 - m2) / math.sqrt(v1 / n1 + v2 / n2)
    df = (v1 / n1 + v2 / n2) ** 2 / (
        (v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1)
    )
    d = (m1 - m2) / math.sqrt(
        ((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2)
    )
    assert (out["n1"], out["n2"]) == (n1, n2)
    assert abs(out["mean_purchase"] - m1 / 1e4) < 1e-5
    assert abs(out["mean_view"] - m2 / 1e4) < 1e-5
    assert abs(out["welch_t"] - t) < 1e-5
    assert abs(out["welch_df"] - df) < 1e-2
    assert abs(out["cohens_d"] - d) < 1e-5


def test_cramers_v_matches_pandas_crosstab(spark):
    out = _pdf("cramers_v_association", spark).iloc[0]
    pdf = _doc_lengths()
    ct = pd.crosstab(pdf["lang"], pdf["source"])
    n = ct.to_numpy().sum()
    r = ct.sum(axis=1).to_numpy(dtype=float)
    c = ct.sum(axis=0).to_numpy(dtype=float)
    e = np.outer(r, c) / n
    chi2 = ((ct.to_numpy() - e) ** 2 / e).sum()
    v = math.sqrt(chi2 / (n * (min(ct.shape) - 1)))
    assert out["n_docs"] == n
    assert (out["n_langs"], out["n_sources"]) == ct.shape
    assert out["dof"] == (ct.shape[0] - 1) * (ct.shape[1] - 1)
    # chi2_e6 sums per-cell floor-truncated terms: within r*c units low.
    assert 0 <= chi2 - out["chi2_e6"] / 1e6 < ct.size * 1e-6 + 1e-9
    assert abs(out["cramers_v"] - v) < 1e-5


def test_degree_assortativity_matches_numpy(spark):
    out = _pdf("degree_assortativity", spark).iloc[0]
    pairs = duckdb.sql(
        f"SELECT DISTINCT o_custkey AS c, l_suppkey AS s FROM "
        f"'{SF_SMALL}/orders.parquet' o JOIN '{SF_SMALL}/lineitem.parquet' l "
        f"ON o.o_orderkey = l.l_orderkey"
    ).df()
    src = pd.concat([pairs["c"] * 2, pairs["s"] * 2 + 1]).to_numpy()
    dst = pd.concat([pairs["s"] * 2 + 1, pairs["c"] * 2]).to_numpy()
    deg = pd.Series(src).value_counts()
    x = deg.reindex(src).to_numpy(dtype=float)
    y = deg.reindex(dst).to_numpy(dtype=float)
    r = np.corrcoef(x, y)[0, 1]
    assert out["n_edges"] == len(src)
    assert out["n_nodes"] == deg.size
    assert abs(out["assort_r"] - r) < 1e-5
    assert out["assort_r"] < 0  # bipartite order graph: hubs meet leaves


def test_runs_test_matches_python_replay(spark, events_pdf):
    out = _pdf("runs_test_daily", spark).iloc[0]
    daily = (
        events_pdf.assign(day=events_pdf["ts"].dt.normalize())
        .groupby("day")
        .size()
        .sort_index()
        .to_numpy()
    )
    signs = [1 if b > a else -1 for a, b in zip(daily, daily[1:]) if b != a]
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    n1 = sum(1 for s in signs if s == 1)
    n2 = len(signs) - n1
    e = 2 * n1 * n2 / (n1 + n2) + 1
    var = (
        2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
        / ((n1 + n2) ** 2 * (n1 + n2 - 1))
    )
    assert (out["n_runs"], out["n_up"], out["n_down"]) == (runs, n1, n2)
    assert abs(out["expected_runs"] - e) < 1e-5
    assert abs(out["runs_z"] - (runs - e) / math.sqrt(var)) < 1e-5


def test_paired_sign_test_matches_python_replay(spark, events_pdf):
    out = _pdf("paired_sign_test", spark).iloc[0]
    pv = (
        events_pdf[events_pdf["event_type"].isin(["purchase", "view"])]
        .assign(day=lambda d: d["ts"].dt.normalize())
        .pivot_table(
            index="day", columns="event_type", values="user_id",
            aggfunc="count", fill_value=0,
        )
    )
    k = int((pv["purchase"] > pv["view"]).sum())
    ties = int((pv["purchase"] == pv["view"]).sum())
    n = len(pv) - ties
    assert (out["n_days"], out["k_plus"], out["ties"]) == (n, k, ties)
    assert abs(out["sign_z"] - (2 * k - n) / math.sqrt(n)) < 1e-5


def test_jackknife_se_matches_python_replay(spark):
    out = _pdf("jackknife_se_mean", spark).iloc[0]
    pdf = _doc_lengths()
    g = pdf.groupby("source")["x"].agg(["sum", "count"])
    S, N = pdf["x"].sum(), len(pdf)
    thetas = [(S - s) / (N - n) for s, n in zip(g["sum"], g["count"])]
    k = len(thetas)
    tbar = sum(thetas) / k
    se = math.sqrt((k - 1) / k * sum((t - tbar) ** 2 for t in thetas))
    assert (out["g_groups"], out["n_docs"]) == (k, N)
    assert abs(out["mean_len"] - S / N) < 1e-5
    # the query truncates each theta to the 1e-6 grid before the moment
    # pass; the float replay agrees within that grid resolution
    assert abs(out["jackknife_se"] - se) < 1e-4


def test_capture_recapture_matches_hashlib_replay(spark):
    out = _pdf("capture_recapture_estimate", spark).iloc[0]
    ev = duckdb.sql(
        f"SELECT event_id, user_id FROM '{SF_SMALL}/events.parquet'"
    ).df()
    caps = {}
    for _, r in ev.iterrows():
        u = int(r["user_id"])
        c = caps.setdefault(u, [0, 0])
        for i, salt in enumerate(("#s1", "#s2")):
            h = int(
                hashlib.md5(f"{int(r['event_id'])}{salt}".encode())
                .hexdigest()[:8],
                16,
            )
            if h % 1000 < 5:
                c[i] = 1
    n1 = sum(c[0] for c in caps.values())
    n2 = sum(c[1] for c in caps.values())
    m = sum(c[0] * c[1] for c in caps.values())
    est = (n1 + 1) * (n2 + 1) // (m + 1) - 1
    assert (out["n1"], out["n2"], out["m"]) == (n1, n2, m)
    assert out["exact_distinct"] == len(caps)
    assert out["chapman_est"] == est
    assert out["err_ppm"] == abs(est - len(caps)) * 1_000_000 // len(caps)


def test_mantel_haenszel_matches_python_replay(spark, events_pdf):
    out = _pdf("mantel_haenszel_uplift", spark).iloc[0]
    nat = dict(
        duckdb.sql(
            f"SELECT c_custkey, c_nationkey FROM '{SF_SMALL}/customer.parquet'"
        ).fetchall()
    )
    per_user = {}
    for _, r in events_pdf.iterrows():
        u = int(r["user_id"])
        d = per_user.setdefault(u, 0)
        if r["event_type"] == "purchase" and r["value"] > 150:
            per_user[u] = 1
    from collections import defaultdict

    cells = defaultdict(lambda: [0, 0, 0, 0])  # n1, n2, a, b
    for u, conv in per_user.items():
        arm = int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2
        c = cells[nat[u]]
        if arm == 0:
            c[0] += 1
            c[2] += conv
        else:
            c[1] += 1
            c[3] += conv
    num = den = 0.0
    n1 = n2 = a1 = b1 = 0
    strata = 0
    for n1i, n2i, ai, bi in cells.values():
        if n1i == 0 or n2i == 0:
            continue
        strata += 1
        n1, n2, a1, b1 = n1 + n1i, n2 + n2i, a1 + ai, b1 + bi
        num += (ai * n2i - bi * n1i) / (n1i + n2i)
        den += n1i * n2i / (n1i + n2i)
    assert out["n_strata"] == strata
    assert (out["n1"], out["n2"], out["conv1"], out["conv2"]) == (
        n1, n2, a1, b1,
    )
    assert abs(out["crude_rd"] - (a1 / n1 - b1 / n2)) < 1e-5
    # terms are 1e-6-grid truncated; the float replay agrees within
    # stratum-count grid slack
    assert abs(out["mh_rd"] - num / den) < 1e-4


def test_decayed_popularity_weights_are_exact_powers(spark):
    from reddit_data_pipeline_engineering_spark.plans.queries import REGISTRY

    out = (
        REGISTRY["decayed_popularity_topk"]
        .fn(spark, SF_SMALL)
        .toPandas()
    )
    rows = duckdb.sql(
        f"""
        WITH a AS (SELECT MAX(o_orderdate) mx FROM '{SF_SMALL}/orders.parquet')
        SELECT l.l_partkey,
               (epoch_us(CAST(a.mx AS TIMESTAMP))
                - epoch_us(CAST(o.o_orderdate AS TIMESTAMP))) // 604800000000
        FROM '{SF_SMALL}/lineitem.parquet' l
        JOIN '{SF_SMALL}/orders.parquet' o ON o.o_orderkey = l.l_orderkey
        CROSS JOIN a
        """
    ).fetchall()
    from collections import defaultdict

    score = defaultdict(int)
    nrec = defaultdict(int)
    for pk, w in rows:
        if w <= 6:
            score[pk] += 1 << (6 - int(w))
            nrec[pk] += 1
    expected = sorted(
        ((s, -pk) for pk, s in score.items()), reverse=True
    )[:20]
    got = list(zip(out["decayed_score"], -out["partkey"]))
    assert got == expected
    for _, r in out.iterrows():
        assert r["n_recent"] == nrec[r["partkey"]]


def test_ols_matches_numpy_lstsq(spark):
    import decimal

    out = _pdf("ols_price_model", spark).iloc[0]
    li = duckdb.sql(
        f"SELECT l_extendedprice, l_quantity, l_discount FROM "
        f"'{SF_SMALL}/lineitem.parquet'"
    ).df()

    def quant(s, q, scale):
        return np.array(
            [
                int(
                    decimal.Decimal(repr(v)).quantize(
                        decimal.Decimal(q), rounding=decimal.ROUND_HALF_UP
                    )
                    * scale
                )
                for v in s
            ],
            dtype=float,
        )

    y = quant(li["l_extendedprice"], "0.01", 100)
    x1 = li["l_quantity"].to_numpy(dtype=float)
    x2 = quant(li["l_discount"], "0.0001", 10000)
    X = np.column_stack([np.ones_like(x1), x1, x2])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    pred = X @ beta
    sse = ((y - pred) ** 2).sum()
    sst = ((y - y.mean()) ** 2).sum()
    assert out["n_rows"] == len(li)
    assert abs(out["intercept"] - beta[0] / 100) < 1e-3 * abs(beta[0] / 100)
    assert abs(out["beta_quantity"] - beta[1] / 100) < 1e-3 * max(
        1e-3, abs(beta[1] / 100)
    )
    assert abs(out["beta_discount_pct"] - beta[2] * 100) < 1e-3 * max(
        1e-3, abs(beta[2] * 100)
    )
    assert abs(out["r2"] - (1 - sse / sst)) < 1e-5


def test_split_conformal_coverage_and_quantile(spark, events_pdf):
    out = _pdf("split_conformal_interval", spark).set_index("event_type")
    ev = duckdb.sql(
        f"SELECT event_id, event_type, value FROM "
        f"'{SF_SMALL}/events.parquet' WHERE value IS NOT NULL"
    ).df()
    import decimal

    halves = ev["event_id"].map(
        lambda e: int(
            hashlib.md5(f"{int(e)}#cal".encode()).hexdigest()[:8], 16
        )
        % 2
    )
    ev = ev.assign(half=halves)
    ev["v_e4"] = [
        int(
            decimal.Decimal(repr(v)).quantize(
                decimal.Decimal("0.0001"), rounding=decimal.ROUND_HALF_UP
            )
            * 10000
        )
        for v in ev["value"]
    ]
    for t, g in ev.groupby("event_type"):
        cal = g[g["half"] == 0]
        tst = g[g["half"] == 1]
        mean_e4 = int(cal["v_e4"].sum()) // len(cal)
        res = sorted(abs(v - mean_e4) // 100 for v in cal["v_e4"])
        k = -(-9 * (len(cal) + 1) // 10)  # ceil(0.9*(n+1))
        qhat = res[k - 1]
        cov = sum(
            1 for v in tst["v_e4"] if abs(v - mean_e4) // 100 <= qhat
        )
        row = out.loc[t]
        assert (row["n_cal"], row["n_test"]) == (len(cal), len(tst))
        assert row["qhat_cents"] == qhat
        assert row["coverage_ppm"] == cov * 1_000_000 // len(tst)
        # the split-conformal guarantee: coverage near or above 90%
        assert row["coverage_ppm"] > 850_000


def test_permutation_test_matches_hashlib_replay(spark, events_pdf):
    out = _pdf("permutation_test_ab", spark).iloc[0]
    per_user = {}
    for _, r in events_pdf.iterrows():
        u = int(r["user_id"])
        per_user.setdefault(u, 0)
        if r["event_type"] == "purchase" and r["value"] > 150:
            per_user[u] = 1

    def d_e6(salt):
        n1 = n2 = a = b = 0
        for u, conv in per_user.items():
            key = f"{u}{salt}" if salt else str(u)
            arm = int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % 2
            if arm == 0:
                n1 += 1
                a += conv
            else:
                n2 += 1
                b += conv
        num = a * n2 - b * n1
        sgn = 1 if num >= 0 else -1
        return sgn * (abs(num) * 1_000_000 // (n1 * n2)), n1, n2

    od, n1, n2 = d_e6("")
    extreme = sum(
        1
        for i in range(1, 65)
        if abs(d_e6(f"#p{i}")[0]) >= abs(od)
    )
    assert (out["n1"], out["n2"]) == (n1, n2)
    assert out["obs_diff_e6"] == od
    assert out["b_perms"] == 64
    assert out["n_extreme"] == extreme
    assert out["p_ppm"] == (1 + extreme) * 1_000_000 // 65
    assert 0 < out["p_ppm"] <= 1_000_000


def test_simpson_diversity_matches_counter_replay(spark):
    from collections import Counter

    out = _pdf("simpson_diversity_sources", spark).set_index("source")
    docs = duckdb.sql(
        f"SELECT source, text FROM '{SF_SMALL}/documents.parquet'"
    ).df()
    per = {}
    for src, text in zip(docs["source"], docs["text"]):
        per.setdefault(src, Counter()).update(
            w for w in text.strip().split() if w
        )
    for src, cnt in per.items():
        t = sum(cnt.values())
        c2 = sum(c * c for c in cnt.values())
        row = out.loc[src]
        assert row["n_tokens"] == t
        assert row["vocab"] == len(cnt)
        assert row["inv_simpson_e2"] == t * t * 100 // c2
        assert row["evenness_bp"] == (t * t * 100 // c2) * 10000 // (
            len(cnt) * 100
        )
        # float sanity: matches 1/sum(p^2) within grid resolution
        inv = 1.0 / sum((c / t) ** 2 for c in cnt.values())
        assert abs(row["inv_simpson_e2"] / 100 - inv) < 0.02
    assert set(out.index) == set(per)


def test_textrank_matches_pure_python_replay(spark):
    """Weighted integer-grid TextRank replayed in pure python (Counter
    graph build + exact integer power iterations) — top-20 must match
    word-for-word and rank-for-rank."""
    from collections import Counter, defaultdict

    from reddit_data_pipeline_engineering_spark.operators import pagerank as pr

    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    und = Counter()
    for text in docs["text"]:
        toks = text.split(" ")
        for a, b in zip(toks, toks[1:]):
            if a != b:
                und[(min(a, b), max(a, b))] += 1
    edges = defaultdict(list)
    strength = Counter()
    for (a, b), w in und.items():
        edges[a].append((b, w))
        edges[b].append((a, w))
        strength[a] += w
        strength[b] += w
    teleport = (pr.SCALE * (pr.DAMP_DEN - pr.DAMP_NUM)) // pr.DAMP_DEN
    rank = {n: pr.SCALE for n in strength}
    for _ in range(3):
        contrib = Counter()
        for src, outs in edges.items():
            q = rank[src] // strength[src]  # truncate BEFORE multiply
            for dst, w in outs:
                contrib[dst] += q * w
        rank = {
            n: teleport + (pr.DAMP_NUM * contrib[n]) // pr.DAMP_DEN
            for n in strength
        }
    exp = sorted(rank.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = _pdf("textrank_keywords", spark)
    assert list(map(tuple, got[["word", "rank"]].itertuples(index=False))) == exp


def test_shapley_attribution_matches_python_replay(spark):
    """Closed-form Shapley (uniform split per converted path) replayed
    with Counter arithmetic; also checks the Shapley efficiency axiom:
    channel shares sum back to total conversions (modulo DIV floor)."""
    from collections import Counter

    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    ev["ts"] = pd.to_datetime(ev["ts"])
    first_p = (
        ev[ev.event_type == "purchase"].groupby("user_id")["ts"].min()
    )
    grid = Counter()
    for uid, pts in first_p.items():
        rows = ev[(ev.user_id == uid) & (ev.ts < pts)
                  & (ev.event_type != "purchase")]
        path = tuple(sorted(set(rows.event_type))) or ("(direct)",)
        grid[path] += 1
    exp = Counter()
    touched = Counter()
    npaths = Counter()
    for path, conv in grid.items():
        for ch in path:
            exp[ch] += conv * 1_000_000 // len(path)
            touched[ch] += conv
            npaths[ch] += 1
    got = _pdf("shapley_attribution", spark)
    for _, r in got.iterrows():
        assert r["shapley_e6"] == exp[r["channel"]]
        assert r["touched_conversions"] == touched[r["channel"]]
        assert r["n_paths"] == npaths[r["channel"]]
    assert set(got["channel"]) == set(exp)
    # efficiency: total attributed mass == total conversions (floor loss
    # bounded by one grid unit per (path, channel) pair)
    total = sum(grid.values()) * 1_000_000
    assert 0 <= total - got["shapley_e6"].sum() < sum(
        len(p) for p in grid
    )


def test_cuped_matches_numpy_replay(spark, events_pdf):
    """CUPED theta/rho^2/adjusted means replayed with numpy float math
    over the same md5 split and 3-day pre-period cut."""
    import hashlib

    ev = events_pdf.copy()
    ev["ts"] = pd.to_datetime(ev["ts"])
    t0 = ev["ts"].min()
    cut = t0 + pd.Timedelta(days=3)
    p = ev[ev.event_type == "purchase"]
    x = p[p.ts < cut].groupby("user_id")["value"].sum()
    y = p[p.ts >= cut].groupby("user_id")["value"].sum()
    users = sorted(set(ev.user_id))
    xs = np.array([round(x.get(u, 0.0), 4) for u in users])
    ys = np.array([round(y.get(u, 0.0), 4) for u in users])
    arm = np.array([
        int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2
        for u in users
    ])
    n = len(users)
    sx, sy = xs.sum(), ys.sum()
    sxy, sxx, syy = (xs * ys).sum(), (xs * xs).sum(), (ys * ys).sum()
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    rho2 = (n * sxy - sx * sy) ** 2 / (
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    got = _pdf("cuped_variance_reduction", spark).set_index("variant")
    assert abs(got.loc["A", "theta"] - theta) < 1e-4
    assert abs(got.loc["A", "var_reduction"] - rho2) < 1e-4
    for v, mask in (("A", arm == 0), ("B", arm == 1)):
        my = ys[mask].mean()
        madj = my - theta * (xs[mask].mean() - xs.mean())
        assert got.loc[v, "n_users"] == mask.sum()
        assert abs(got.loc[v, "mean_y"] - my) < 1e-3
        assert abs(got.loc[v, "mean_y_adj"] - madj) < 1e-3
    # CUPED preserves the pooled mean: weighted adj means == raw pooled
    pooled_raw = ys.mean()
    w = got["n_users"] / got["n_users"].sum()
    assert abs((got["mean_y_adj"] * w).sum() - pooled_raw) < 1e-3


def test_bh_fdr_thresholds_and_replay(spark):
    """The Acklam-derived chi-square(1) quantile ladder must match the
    textbook values, and the per-nation z2/rank/step-up output must
    match a pure-python replay."""
    import hashlib

    from reddit_data_pipeline_engineering_spark.plans.queries_stats import (
        _bh_thresholds,
    )

    thr = dict(_bh_thresholds())
    assert thr[25] == 38415   # chi2inv(0.95, 1) = 3.8415
    assert thr[5] == 66349    # chi2inv(0.99, 1) = 6.6349
    assert all(thr[i] > thr[i + 1] for i in range(1, 25))  # monotone

    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    cust = pd.read_parquet(f"{SF_SMALL}/customer.parquet")
    j = ev.merge(cust, left_on="user_id", right_on="c_custkey")
    per_user = (
        j.assign(conv=(j.event_type == "purchase").astype(int))
        .groupby(["user_id", "c_nationkey"])["conv"].max().reset_index()
    )
    nat = per_user.groupby("c_nationkey")["conv"].agg(["count", "sum"])
    nn, cc = int(nat["count"].sum()), int(nat["sum"].sum())
    rows = []
    for nk, r in nat.iterrows():
        n, c = int(r["count"]), int(r["sum"])
        if n == nn or cc == 0 or cc == nn:
            z2 = 0
        else:
            z2 = ((c * nn - cc * n) ** 2 * nn * 10000
                  // (n * (nn - n) * cc * (nn - cc)))
        rows.append((nk, z2))
    rows.sort(key=lambda t: (-t[1], t[0]))
    k = max((i + 1 for i, (_, z2) in enumerate(rows)
             if z2 >= thr[i + 1]), default=0)
    got = _pdf("bh_fdr_nation_conversion", spark)
    assert list(got["z2_bp"]) == [z2 for _, z2 in rows]
    assert list(got["discovery"]) == [
        1 if i + 1 <= k else 0 for i in range(len(rows))
    ]


def test_eb_shrinkage_matches_numpy_replay(spark):
    """Beta-binomial MoM prior + shrunk rates replayed in numpy over
    the same 1e-6-grid rates; shrinkage direction/monotonicity pinned:
    every shrunk rate sits between the raw rate and the prior mean."""
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    cust = pd.read_parquet(f"{SF_SMALL}/customer.parquet")
    j = ev.merge(cust, left_on="user_id", right_on="c_custkey")
    j["conv"] = (
        (j.event_type == "purchase") & (j.value > 150)
    ).astype(int)
    per_user = (
        j.groupby(["user_id", "c_nationkey"])["conv"].max().reset_index()
    )
    nat = per_user.groupby("c_nationkey")["conv"].agg(["count", "sum"])
    r6 = (nat["sum"] * 1_000_000 // nat["count"]).astype(np.int64)
    k, s1, s2 = len(r6), int(r6.sum()), int((r6 * r6).sum())
    m = s1 / k / 1e6
    v = (s2 - s1 * s1 / k) / (k - 1) / 1e12
    s = m * (1 - m) / v - 1 if v > 0 and m * (1 - m) / v - 1 > 0 else 0
    got = _pdf("eb_shrunk_conversion", spark)
    assert len(got) == k
    assert abs(got["alpha"].iloc[0] - m * s) < 1e-3
    for _, r in got.iterrows():
        raw, shrunk = r["raw_rate"], r["shrunk_rate"]
        lo, hi = sorted((raw, m))
        assert lo - 1e-6 <= shrunk <= hi + 1e-6  # between raw and prior
    # numpy value check, keyed by nation name (no positional guessing)
    names = pd.read_parquet(f"{SF_SMALL}/nation.parquet").set_index(
        "n_nationkey"
    )["n_name"]
    by_name = got.set_index("nation")
    for nk in list(nat.index)[:5]:
        n0, c0 = int(nat.loc[nk, "count"]), int(nat.loc[nk, "sum"])
        exp0 = (c0 + m * s) / (n0 + s)
        assert abs(by_name.loc[names[nk], "shrunk_rate"] - exp0) < 1e-4


def test_did_matches_numpy_replay(spark):
    """DiD interaction + SE replayed in numpy over the same md5 arms
    and 3-day pre/post split."""
    import hashlib

    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    ev["ts"] = pd.to_datetime(ev["ts"])
    t0 = ev["ts"].min()
    cut = t0 + pd.Timedelta(days=3)
    p = ev[ev.event_type == "purchase"]
    users = sorted(set(ev.user_id))
    x = p[p.ts < cut].groupby("user_id")["value"].sum()
    y = p[p.ts >= cut].groupby("user_id")["value"].sum()
    xs = np.array([round(x.get(u, 0.0), 4) for u in users])
    ys = np.array([round(y.get(u, 0.0), 4) for u in users])
    arm = np.array([
        int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2
        for u in users
    ])
    a, b = arm == 0, arm == 1
    did = (ys[b].mean() - xs[b].mean()) - (ys[a].mean() - xs[a].mean())
    se = np.sqrt(
        (xs[a].var(ddof=1) + ys[a].var(ddof=1)) / a.sum()
        + (xs[b].var(ddof=1) + ys[b].var(ddof=1)) / b.sum()
    )
    got = _pdf("did_spend_estimate", spark).iloc[0]
    assert got["n_a"] == a.sum() and got["n_b"] == b.sum()
    assert abs(got["did"] - did) < 1e-3
    assert abs(got["t_stat"] - did / se) < 1e-3
    assert abs(got["mean_b_post"] - ys[b].mean()) < 1e-3
