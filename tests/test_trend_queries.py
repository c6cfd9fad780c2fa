"""Brute-force differential tests for the queries_trend family.

Same contract as test_stats_queries.py: each statistic is recomputed
independently (pure python / numpy over the raw parquet or a synthetic
series — no SQL, no Spark expressions), so a shared misconception
between the Spark plan and the DuckDB oracle cannot hide. The trend
kernels are additionally driven with synthetic series (monotone ramp,
flat line, heavy ties) that the orders fixture cannot produce on
demand — the significance flag must TRIP on a ramp and stay quiet on
noise-free flatness.
"""

import datetime
from collections import Counter
from math import floor

import duckdb
import numpy as np
import pytest

from reddit_data_pipeline_engineering_spark.plans.queries import REGISTRY, queries
from reddit_data_pipeline_engineering_spark.plans.queries_trend import (
    mann_kendall_from_daily,
    theil_sen_from_daily,
)

from .conftest import SF_SMALL

queries()  # force registration

from concurrent.futures import ThreadPoolExecutor as _TPE  # noqa: E402

_POOLED = [
    "mann_kendall_trend",
    "theil_sen_slope",
    "unigram_tv_drift",
    "embedding_centroid_drift",
]


@pytest.fixture(scope="module")
def pooled_pdfs(spark):
    """Run the four registry queries concurrently (each is scheduling-
    latency-bound at sf0.001 — the pooled-fixture pattern)."""
    with _TPE(max_workers=4) as ex:
        futs = {
            n: ex.submit(
                lambda n=n: REGISTRY[n].fn(spark, SF_SMALL).toPandas()
            )
            for n in _POOLED
        }
        return {n: f.result() for n, f in futs.items()}


def _pdf(name, spark, pooled=None):
    if pooled is not None and name in pooled:
        return pooled[name]
    return REGISTRY[name].fn(spark, SF_SMALL).toPandas()


def _daily_df(spark, xs, priority="P"):
    day0 = datetime.date(2020, 1, 1)
    rows = [
        (priority, day0 + datetime.timedelta(days=i), int(x))
        for i, x in enumerate(xs)
    ]
    return spark.createDataFrame(rows, "priority string, day date, x long")


def _mk_replay(xs):
    """Pure-python Mann-Kendall: S, var18, z^2 bp, trending flag."""
    n = len(xs)
    s = sum(
        (xs[j] > xs[i]) - (xs[j] < xs[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    tie18 = sum(
        t * (t - 1) * (2 * t + 5) for t in Counter(xs).values() if t > 1
    )
    var18 = n * (n - 1) * (2 * n + 5) - tie18
    if s == 0 or var18 <= 0:
        z2 = 0
    else:
        z2 = (abs(s) - 1) ** 2 * 180000 // var18
    return s, var18, z2, int(z2 > 38416)


def test_mann_kendall_replay_on_orders(spark, pooled_pdfs):
    out = _pdf("mann_kendall_trend", spark, pooled_pdfs).set_index("priority")
    daily = duckdb.sql(
        f"SELECT o_orderpriority AS p, CAST(o_orderdate AS DATE) AS d, "
        f"COUNT(*) AS x FROM '{SF_SMALL}/orders.parquet' GROUP BY 1, 2 "
        f"ORDER BY 1, 2"
    ).df()
    for p, grp in daily.groupby("p"):
        xs = [int(v) for v in grp.sort_values("d")["x"]]
        s, var18, z2, flag = _mk_replay(xs)
        row = out.loc[p]
        assert int(row["n_days"]) == len(xs)
        assert int(row["s_stat"]) == s
        assert int(row["var18"]) == var18
        assert int(row["mk_z2_bp"]) == z2
        assert int(row["trending"]) == flag


def test_mann_kendall_ramp_trips_and_flat_does_not(spark):
    ramp = mann_kendall_from_daily(
        _daily_df(spark, range(1, 31), "ramp")
    ).collect()[0]
    assert ramp["s_stat"] == 30 * 29 // 2  # every pair increasing
    assert ramp["trending"] == 1
    flat = mann_kendall_from_daily(
        _daily_df(spark, [7] * 30, "flat")
    ).collect()[0]
    assert flat["s_stat"] == 0
    assert flat["mk_z2_bp"] == 0 and flat["trending"] == 0
    # all-tied series: var18 = 0 (every value in one tie group) — the
    # guard must emit 0, not divide by zero
    assert flat["var18"] == 0


def test_mann_kendall_tie_correction(spark):
    # alternating ties: n=6 of 3 distinct values, each tied twice
    xs = [1, 2, 3, 1, 2, 3]
    got = mann_kendall_from_daily(_daily_df(spark, xs)).collect()[0]
    s, var18, z2, flag = _mk_replay(xs)
    assert (got["s_stat"], got["var18"], got["mk_z2_bp"], got["trending"]) == (
        s, var18, z2, flag,
    )


def _ts_replay(xs):
    """Pure-python Theil-Sen lower-median of 1e4-scaled pair slopes."""
    slopes = []
    n = len(xs)
    for i in range(n):
        for j in range(i + 1, n):
            dy, dx = xs[j] - xs[i], j - i
            q = abs(dy) * 10000 // dx
            slopes.append(q if dy >= 0 else -q)
    slopes.sort()
    return len(slopes), slopes[(len(slopes) + 1) // 2 - 1]


def test_theil_sen_replay_on_orders(spark, pooled_pdfs):
    out = _pdf("theil_sen_slope", spark, pooled_pdfs).set_index("priority")
    daily = duckdb.sql(
        f"SELECT o_orderpriority AS p, CAST(o_orderdate AS DATE) AS d, "
        f"COUNT(*) AS x FROM '{SF_SMALL}/orders.parquet' GROUP BY 1, 2 "
        f"ORDER BY 1, 2"
    ).df()
    for p, grp in daily.groupby("p"):
        grp = grp.sort_values("d")
        xs = [int(v) for v in grp["x"]]
        days = [d for d in grp["d"]]
        # replay with real (possibly gappy) day gaps
        slopes = []
        for i in range(len(xs)):
            for j in range(i + 1, len(xs)):
                dy = xs[j] - xs[i]
                dx = (days[j] - days[i]).days
                q = abs(dy) * 10000 // dx
                slopes.append(q if dy >= 0 else -q)
        slopes.sort()
        row = out.loc[p]
        assert int(row["n_pairs"]) == len(slopes)
        assert int(row["slope_bp"]) == slopes[(len(slopes) + 1) // 2 - 1]


def test_theil_sen_outlier_immunity(spark):
    # slope-2 ramp with one wild outlier: TS stays ~2e4, OLS would not
    xs = [2 * i for i in range(20)]
    xs[10] = 10_000
    got = theil_sen_from_daily(_daily_df(spark, xs)).collect()[0]
    n, med = _ts_replay(xs)
    assert got["n_pairs"] == n == 190
    assert got["slope_bp"] == med
    assert abs(med - 20000) <= 1  # robust estimate survives the spike


def test_unigram_tv_replay(spark, pooled_pdfs):
    out = _pdf("unigram_tv_drift", spark, pooled_pdfs).set_index("source")
    docs = duckdb.sql(
        f"SELECT source, text FROM '{SF_SMALL}/documents.parquet'"
    ).fetchall()
    per_src: dict[str, Counter] = {}
    for src, text in docs:
        per_src.setdefault(src, Counter()).update(text.split())
    total = Counter()
    for c in per_src.values():
        total.update(c)
    n_all = sum(total.values())
    for src, cs in per_src.items():
        n_src = sum(cs.values())
        n_rest = n_all - n_src
        if n_rest == 0:
            assert src not in out.index
            continue
        num = sum(
            abs(cs.get(w, 0) * n_rest - (total[w] - cs.get(w, 0)) * n_src)
            for w in total
        )
        tv_bp = num * 10000 // (2 * n_src * n_rest)
        row = out.loc[src]
        assert int(row["n_src"]) == n_src
        assert int(row["n_rest"]) == n_rest
        assert int(row["tv_bp"]) == tv_bp
        # TV is a metric on [0, 1] -> bp in [0, 10000]
        assert 0 <= int(row["tv_bp"]) <= 10000


def test_centroid_drift_replay(spark, pooled_pdfs):
    out = _pdf("embedding_centroid_drift", spark, pooled_pdfs).set_index("label")
    emb = duckdb.sql(
        f"SELECT label, embedding FROM '{SF_SMALL}/embeddings.parquet'"
    ).fetchall()
    by_label: dict[int, list] = {}
    for label, vec in emb:
        by_label.setdefault(label, []).append(
            [floor(float(x) * 1_000_000.0) for x in vec]
        )
    dims = len(next(iter(by_label.values()))[0])
    g_sum = [0] * dims
    g_n = 0
    for vecs in by_label.values():
        for v in vecs:
            for d in range(dims):
                g_sum[d] += v[d]
        g_n += len(vecs)

    def int_mean(s, n):
        q = abs(s) // n
        return q if s >= 0 else -q

    mg = [int_mean(g_sum[d], g_n) for d in range(dims)]
    den_g = sum(x * x for x in mg)
    for label, vecs in by_label.items():
        n = len(vecs)
        m = [int_mean(sum(v[d] for v in vecs), n) for d in range(dims)]
        num = sum(m[d] * mg[d] for d in range(dims))
        den_l = sum(x * x for x in m)
        row = out.loc[label]
        assert int(row["n_vecs"]) == n
        if den_l == 0 or den_g == 0:
            assert row["cos2_e8"] is None or np.isnan(row["cos2_e8"])
        else:
            q = num * num * 100_000_000 // (den_l * den_g)
            expect = q if num >= 0 else -q
            assert int(row["cos2_e8"]) == expect
            # squared cosine magnitude can't exceed 1e8
            assert abs(int(row["cos2_e8"])) <= 100_000_000


def test_centroid_drift_detects_shifted_label(spark, pooled_pdfs):
    # sanity: labels are random-ish in the fixture, so every centroid
    # should be broadly aligned with the global mean (positive cos2)
    out = _pdf("embedding_centroid_drift", spark, pooled_pdfs)
    assert (out["cos2_e8"].dropna() > 0).all()


def test_isotonic_daily_trend_equals_pava(spark):
    """The minimax grid formula must equal classic sequential PAVA
    pooling (independent algorithm, exact rational arithmetic via
    Fraction) — and be monotone with preserved total mass."""
    from fractions import Fraction

    import duckdb

    from reddit_data_pipeline_engineering_spark.plans.queries import REGISTRY

    from .conftest import SF_SMALL

    out = (
        REGISTRY["isotonic_daily_trend"]
        .fn(spark, SF_SMALL)
        .orderBy("day")
        .toPandas()
    )
    daily = [
        r[1]
        for r in duckdb.sql(
            f"SELECT CAST(ts AS DATE) d, COUNT(*) FROM "
            f"'{SF_SMALL}/events.parquet' GROUP BY 1 ORDER BY 1"
        ).fetchall()
    ]
    # classic PAVA: merge adjacent violating blocks (exact rationals)
    blocks = [[Fraction(x), 1] for x in daily]  # [sum, weight]
    merged = []
    for b in blocks:
        merged.append(b)
        while len(merged) > 1 and (
            merged[-2][0] / merged[-2][1] > merged[-1][0] / merged[-1][1]
        ):
            s2, w2 = merged.pop()
            merged[-1][0] += s2
            merged[-1][1] += w2
    pava = []
    for s_, w_ in merged:
        pava.extend([s_ / w_] * w_)
    assert out["x"].tolist() == daily
    got = out["iso_fit"].tolist()
    assert len(got) == len(pava)
    for g, p in zip(got, pava):
        assert abs(g - float(p)) < 1e-5
    # monotone, and mass-preserving (both exact PAVA properties)
    assert all(b >= a - 1e-9 for a, b in zip(got, got[1:]))
    assert abs(sum(got) - sum(daily)) < 1e-3 * max(1, sum(daily))


def test_bollinger_bands_match_pandas_rolling(spark):
    import duckdb
    import numpy as np

    from reddit_data_pipeline_engineering_spark.plans.queries import (
        REGISTRY,
        queries,
    )

    from .conftest import SF_SMALL

    queries()
    out = (
        REGISTRY["bollinger_bands_daily"]
        .fn(spark, SF_SMALL)
        .orderBy("day")
        .toPandas()
    )
    daily = duckdb.sql(
        f"SELECT CAST(ts AS DATE) d, COUNT(*) n FROM "
        f"'{SF_SMALL}/events.parquet' GROUP BY 1 ORDER BY 1"
    ).df()
    s = daily["n"].astype(float)
    m = s.rolling(7).mean()
    sd = s.rolling(7).std(ddof=1)
    assert len(out) == len(daily) - 6
    for i, row in enumerate(out.itertuples(index=False)):
        j = i + 6
        assert abs(row.mean_7d - m.iloc[j]) < 1e-3
        assert abs(row.sd_7d - sd.iloc[j]) < 1e-3
        assert abs(row.upper_band - (m.iloc[j] + 2 * sd.iloc[j])) < 2e-3
        assert row.breach == bool(
            s.iloc[j] > m.iloc[j] + 2 * sd.iloc[j]
            or s.iloc[j] < m.iloc[j] - 2 * sd.iloc[j]
        )


def test_running_records_match_bruteforce(spark):
    import duckdb

    from reddit_data_pipeline_engineering_spark.plans.queries import (
        REGISTRY,
        queries,
    )

    from .conftest import SF_SMALL

    queries()
    out = {
        r["event_type"]: r
        for r in REGISTRY["running_records_daily"]
        .fn(spark, SF_SMALL)
        .toPandas()
        .to_dict("records")
    }
    rows = duckdb.sql(
        f"SELECT event_type, CAST(ts AS DATE) d, COUNT(*) n FROM "
        f"'{SF_SMALL}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    from collections import defaultdict

    series = defaultdict(list)
    for t, d, n in rows:
        series[t].append((d, n))
    for t, pts in series.items():
        best, recs, last = -1, 0, None
        for d, n in pts:
            if n > best:
                best, recs, last = n, recs + 1, d
        r = out[t]
        assert r["n_days"] == len(pts)
        assert r["n_records"] == recs
        assert r["last_record_day"] == last
        assert r["max_count"] == best
