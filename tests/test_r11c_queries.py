"""Brute-force differential tests for the r11 wave-7 queries.

Same contract as tests/test_r11_queries.py: each test recomputes the
result INDEPENDENTLY (python loops over the raw parquet — no SQL, no
Spark expressions), so a misconception shared by the Spark plan and
its hand-mirrored DuckDB oracle cannot hide. The Kendall-W replay
derives average ranks from LITERAL smaller/tied counting (not window
functions); the ABC replay rebuilds exact micros from integer cents x
basis points. Integer division replays truncate toward zero.
"""

import re
from collections import Counter, defaultdict
from datetime import date, timedelta

import duckdb
import pytest

from reddit_data_pipeline_engineering_spark.plans.queries import REGISTRY, queries

from .conftest import SF_SMALL

queries()  # force registration


def _pdf(name, spark):
    return REGISTRY[name].fn(spark, SF_SMALL).toPandas()


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division (Spark div / DuckDB //)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_flesch_matches_bruteforce(spark):
    got = _pdf("flesch_reading_scores", spark)
    docs = duckdb.sql(
        f"SELECT source, text FROM '{SF_SMALL}/documents.parquet'"
    ).fetchall()
    agg = defaultdict(lambda: [0, 0, 0, 0])  # n, W, Y, S
    for source, text in docs:
        w = len(re.findall(r"[A-Za-z]+", text))
        y = len(re.findall(r"[aeiouyAEIOUY]+", text))
        s = max(1, len(re.findall(r"[.!?]+", text)))
        a = agg[source]
        a[0] += 1
        a[1] += w
        a[2] += y
        a[3] += s
    assert len(got) == len(agg)
    for r in got.itertuples():
        n, W, Y, S = agg[r.source]
        assert int(r.n_docs) == n
        assert (int(r.words), int(r.syllables), int(r.sentences)) == (W, Y, S)
        assert int(r.wps_e3) == (_tdiv(1000 * W, S) if S else 0)
        assert int(r.spw_e3) == (_tdiv(1000 * Y, W) if W else 0)
        expect = (
            0 if W == 0 or S == 0
            else 206835 - _tdiv(1015 * W, S) - _tdiv(84600 * Y, W)
        )
        assert int(r.fre_e3) == expect
    # the synthetic corpus has no terminators: the sentence floor must
    # actually engage (S == n_docs) or this replay proves nothing
    assert all(a[3] == a[0] for a in agg.values())


def test_kendall_w_matches_bruteforce(spark):
    got = _pdf("kendall_w_concordance", spark).iloc[0]
    rows = duckdb.sql(
        f"SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) "
        f"FROM '{SF_SMALL}/events.parquet'"
    ).fetchall()
    epoch = date(1970, 1, 1)
    cells = Counter()
    types = set()
    for et, d in rows:
        dow = ((d - epoch).days + 3) % 7 + 1
        cells[(et, dow)] += 1
        types.add(et)
    m = len(types)
    # literal average ranks: for judge j and item value v, the 2x
    # average rank is 2*(#smaller + 1) + (#tied - 1), counted directly
    r2_sum = Counter()  # per dow
    tie_t = 0
    for et in types:
        vals = [cells.get((et, dow), 0) for dow in range(1, 8)]
        for dow in range(1, 8):
            v = cells.get((et, dow), 0)
            smaller = sum(1 for u in vals if u < v)
            tied = sum(1 for u in vals if u == v)
            r2_sum[dow] += 2 * (smaller + 1) + (tied - 1)
        for t in Counter(vals).values():
            tie_t += t * t * t - t
    s4 = sum((r2_sum[dow] - m * 8) ** 2 for dow in range(1, 8))
    denom = m * m * 336 - m * tie_t
    assert int(got.m_judges) == m
    assert int(got.n_items) == 7
    assert int(got.s4) == s4
    assert int(got.tie_t) == tie_t
    assert int(got.w_e6) == (0 if denom == 0 else _tdiv(3 * s4 * 10**6, denom))
    # the fixture data is non-degenerate: some disagreement, some
    # agreement, and W lands strictly inside (0, 1)
    assert denom > 0 and 0 <= int(got.w_e6) <= 10**6


def test_moment_shape_matches_bruteforce(spark):
    got = _pdf("moment_shape_profile", spark)
    rows = duckdb.sql(
        f"SELECT source, n_chars FROM '{SF_SMALL}/documents.parquet'"
    ).fetchall()
    by_src = defaultdict(list)
    for s, x in rows:
        by_src[s].append(int(x))
    assert len(got) == len(by_src)
    saw_skew = False
    for r in got.itertuples():
        xs = by_src[r.source]
        n, s = len(xs), sum(xs)
        mu = s // n  # positive ints: floor == trunc
        c = [x - mu for x in xs]
        m2 = sum(v * v for v in c)
        m3 = sum(v**3 for v in c)
        m4 = sum(v**4 for v in c)
        assert int(r.n_docs) == n
        assert int(r.ss2) == m2
        assert int(r.skew_sign) == (1 if m3 > 0 else -1 if m3 < 0 else 0)
        if m2 == 0:
            assert int(r.skew2_e6) == 0 and int(r.kurt_e6) == 0
        else:
            t3 = _tdiv(1000 * m3, m2)
            assert int(r.skew2_e6) == _tdiv(n * t3 * t3, m2)
            assert int(r.kurt_e6) == _tdiv(n * m4 * 10**6, m2 * m2)
        saw_skew = saw_skew or m3 != 0
    assert saw_skew  # at least one source exercises the staged path


def test_abc_pareto_matches_bruteforce(spark):
    got = _pdf("abc_pareto_parts", spark)
    rows = duckdb.sql(
        f"SELECT l_partkey, l_extendedprice, l_discount "
        f"FROM '{SF_SMALL}/lineitem.parquet'"
    ).fetchall()
    micros = Counter()
    for pk, price, disc in rows:
        cents = int(round(float(price) * 100))
        bp = 10000 - int(round(float(disc) * 10000))
        micros[int(pk)] += cents * bp  # cents x basis points = micros
    total = sum(micros.values())
    ranked = sorted(micros.items(), key=lambda kv: (-kv[1], kv[0]))
    cls = Counter()
    cls_micros = Counter()
    cum = 0
    for pk, mv in ranked:
        cum += mv
        ppm = _tdiv(cum * 10**6, total)
        c = "A" if ppm <= 800000 else ("B" if ppm <= 950000 else "C")
        cls[c] += 1
        cls_micros[c] += mv
    assert [r.abc_class for r in got.itertuples()] == sorted(cls)
    cum_share = 0
    for r in got.itertuples():
        c = r.abc_class
        assert int(r.n_parts) == cls[c]
        assert int(r.revenue_micros) == cls_micros[c]
        assert int(r.share_ppm) == _tdiv(cls_micros[c] * 10**6, total)
        cum_share += cls_micros[c]
        assert int(r.cum_share_ppm) == _tdiv(cum_share * 10**6, total)
    # shape sanity: all three classes populated, and mean per-part
    # revenue decreases A -> B -> C (true by construction of the
    # descending rank; the synthetic data is near-uniform so the
    # classic "A = few parts" concentration does NOT hold here)
    assert all(cls[c] > 0 for c in "ABC")
    assert (
        _tdiv(cls_micros["A"], cls["A"])
        >= _tdiv(cls_micros["B"], cls["B"])
        >= _tdiv(cls_micros["C"], cls["C"])
    )


def test_dau_mau_matches_bruteforce(spark):
    got = _pdf("dau_mau_stickiness", spark)
    rows = duckdb.sql(
        f"SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) "
        f"FROM '{SF_SMALL}/events.parquet'"
    ).fetchall()
    by_day = defaultdict(set)
    for u, d in rows:
        by_day[d].add(int(u))
    days = sorted(by_day)
    assert len(got) == len(days)
    for r in got.itertuples():
        d = r.d if isinstance(r.d, date) else r.d.date()
        dau = len(by_day[d])
        mau = len(set().union(
            *(by_day.get(d - timedelta(days=i), set()) for i in range(28))
        ))
        assert int(r.dau) == dau
        assert int(r.mau28) == mau
        assert int(r.stickiness_ppm) == _tdiv(dau * 10**6, mau)
    # late days must aggregate a genuinely multi-day window
    last = max(days)
    assert len(by_day[last]) < len(set().union(
        *(by_day.get(last - timedelta(days=i), set()) for i in range(28))
    ))
