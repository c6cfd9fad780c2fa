"""Brute-force differential tests for the r11 pipeline-ops wave.

Same contract as tests/test_stats3_queries.py: each test recomputes
the result INDEPENDENTLY (pandas/python loops over the raw parquet —
no SQL, no Spark expressions), so a misconception shared by the Spark
plan and its hand-mirrored DuckDB oracle cannot hide. Integer division
replays both engines' truncate-toward-zero semantics explicitly.
"""

import hashlib
from collections import Counter

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


def _dyadic_lo(v: int) -> int:
    if v < 16:
        return v
    shift = v.bit_length() - 4
    return (v >> shift) << shift


@pytest.fixture(scope="module")
def docs_pdf():
    return duckdb.sql(
        f"SELECT doc_id, text, source, n_chars FROM "
        f"'{SF_SMALL}/documents.parquet'"
    ).df()


@pytest.fixture(scope="module")
def events_pdf():
    return duckdb.sql(
        f"SELECT user_id, event_type, value FROM "
        f"'{SF_SMALL}/events.parquet'"
    ).df()


def test_claim_check_manifest_matches_bruteforce(spark, docs_pdf):
    got = _pdf("claim_check_manifest", spark).set_index("source")
    by_src = {}
    for r in docs_pdf.itertuples():
        s = by_src.setdefault(r.source, {
            "n": 0, "ext": 0, "bytes": 0, "mx": 0, "shards": set()})
        s["n"] += 1
        s["mx"] = max(s["mx"], int(r.n_chars))
        if int(r.n_chars) > 256:
            s["ext"] += 1
            s["bytes"] += int(r.n_chars)
            s["shards"].add(hashlib.md5(r.text.encode()).hexdigest()[:2])
    assert set(got.index) == set(by_src)
    for src, s in by_src.items():
        row = got.loc[src]
        assert int(row.n_docs) == s["n"]
        assert int(row.n_external) == s["ext"]
        assert int(row.external_bytes) == s["bytes"]
        assert int(row.max_chars) == s["mx"]
        assert int(row.external_bp) == _tdiv(s["ext"] * 10000, s["n"])
        assert int(row.digest_shards) == len(s["shards"])


def test_quantile_sketch_merge_matches_bruteforce(spark, events_pdf):
    got = _pdf("quantile_sketch_merge", spark).set_index("event_type")
    vals = {}
    for r in events_pdf.itertuples():
        if r.value != r.value or r.value is None:  # NaN
            continue
        v4 = int(round(float(r.value) * 10000))
        vals.setdefault(r.event_type, []).append(v4)
        vals.setdefault("ALL", []).append(v4)
    assert set(got.index) == set(vals)
    for et, vs in vals.items():
        hist = Counter(_dyadic_lo(v) for v in vs)
        n = sum(hist.values())
        row = got.loc[et]
        assert int(row.n_values) == n
        assert int(row.sketch_size) == len(hist)
        # sketch state is genuinely bounded: dyadic levels only
        assert len(hist) <= 16 + 8 * max(v.bit_length() for v in vs)
        for col, num in (("q25_lo", 1), ("q50_lo", 2), ("q75_lo", 3)):
            target = (n * num + 3) // 4  # ceil(n*q/4), positive
            cum = 0
            for lo in sorted(hist):
                cum += hist[lo]
                if cum >= target:
                    assert int(getattr(row, col)) == lo
                    # the bucket CONTAINS the exact rank-target value
                    exact = sorted(vs)[target - 1]
                    width = 0 if lo < 16 else (1 << (lo.bit_length() - 4)) - 1
                    assert lo <= exact <= lo + width
                    break


def test_page_hinkley_matches_bruteforce(spark):
    got = _pdf("page_hinkley_drift", spark).iloc[0]
    daily = duckdb.sql(
        f"SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS x "
        f"FROM '{SF_SMALL}/orders.parquet' GROUP BY 1 ORDER BY 1"
    ).df()
    s = 0
    ph = 0
    phs = []
    for t, x in enumerate(daily["x"].astype(int), start=1):
        s += x
        dv = x * 1_000_000 - _tdiv(s * 1_000_000, t)
        ph += dv
        phs.append(ph)
    runmin = None
    gaps = []
    for p in phs:
        runmin = p if runmin is None else min(runmin, p)
        gaps.append(p - runmin)
    lam = 5_000_000
    alarms = [i + 1 for i, g in enumerate(gaps) if g >= lam]
    assert int(got.n_days) == len(phs)
    assert int(got.ph_final) == phs[-1]
    assert int(got.ph_min) == min(phs)
    assert int(got.max_gap) == max(gaps)
    assert int(got.n_alarm_days) == len(alarms)
    assert int(got.first_alarm_t) == (alarms[0] if alarms else 0)


def test_poisson_bootstrap_matches_bruteforce(spark, events_pdf):
    got = _pdf("poisson_bootstrap_ci", spark).iloc[0]
    spend = Counter()
    for r in events_pdf.itertuples():
        if r.event_type == "purchase" and r.value == r.value:
            spend[int(r.user_id)] += int(round(float(r.value) * 100))
    users = sorted(spend)
    assert int(got.n_users) == len(users)
    assert int(got.base_mean_cents) == _tdiv(
        sum(spend.values()), len(users)
    )
    thresholds = (367879, 735759, 919699, 981012, 996340)

    def w_of(u, r):
        h = int(
            hashlib.md5(f"{u}:{r}".encode()).hexdigest()[:8], 16
        ) % 1_000_000
        for k, t in enumerate(thresholds):
            if h < t:
                return k
        return 5

    means = []
    for r in range(19):
        sw = sum(w_of(u, r) * spend[u] for u in users)
        ww = sum(w_of(u, r) for u in users)
        means.append((_tdiv(sw, ww) if ww else None, r))
    ranked = sorted((m, r) for m, r in means if m is not None)
    assert int(got.ci_lo_cents) == ranked[1][0]   # rank 2 of 19
    assert int(got.ci_hi_cents) == ranked[17][0]  # rank 18 of 19


def test_ordinal_logit_matches_bruteforce(spark):
    got = _pdf("ordinal_logit_proxy", spark).set_index("cut_k")
    orders = duckdb.sql(
        f"SELECT o_orderpriority AS pri, o_totalprice AS tp "
        f"FROM '{SF_SMALL}/orders.parquet'"
    ).df()
    rows = [
        (int(p[0]), 1 if round(float(t) * 100) >= 15_000_000 else 0)
        for p, t in zip(orders["pri"], orders["tp"])
    ]
    for k in (1, 2, 3, 4):
        a = sum(1 for p, h in rows if h == 1 and p <= k)
        b = sum(1 for p, h in rows if h == 1 and p > k)
        c = sum(1 for p, h in rows if h == 0 and p <= k)
        d = sum(1 for p, h in rows if h == 0 and p > k)
        r = got.loc[k]
        assert (int(r.a_hi_le), int(r.b_hi_gt), int(r.c_lo_le),
                int(r.d_lo_gt)) == (a, b, c, d)
        expect = 0 if (b == 0 or c == 0) else _tdiv(a * d * 1_000_000, b * c)
        assert int(r.cum_or_ppm) == expect


def test_freq_itemset_matches_bruteforce(spark):
    got = _pdf("freq_itemset_pairs", spark)
    items = duckdb.sql(
        f"SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS b "
        f"FROM '{SF_SMALL}/lineitem.parquet' l "
        f"JOIN '{SF_SMALL}/part.parquet' p ON p.p_partkey = l.l_partkey"
    ).df()
    baskets = {}
    for r in items.itertuples():
        baskets.setdefault(int(r.o), set()).add(r.b)
    nb = len(baskets)
    ms = (nb + 99) // 100
    c1 = Counter(b for bs in baskets.values() for b in bs)
    freq1 = {b for b, c in c1.items() if c >= ms}
    pair_c = Counter()
    for bs in baskets.values():
        fb = sorted(b for b in bs if b in freq1)
        for i in range(len(fb)):
            for j in range(i + 1, len(fb)):
                pair_c[(fb[i], fb[j])] += 1
    qualifying = {p: c for p, c in pair_c.items() if c >= ms}
    expected = sorted(
        ((p, c) for p, c in qualifying.items()),
        key=lambda pc: (-pc[1], pc[0][0], pc[0][1]),
    )[:20]
    assert len(got) == min(20, len(expected))
    for row, ((ba, bb), c) in zip(got.itertuples(), expected):
        assert (row.brand_a, row.brand_b, int(row.c_ab)) == (ba, bb, c)
        assert int(row.conf_a_to_b_ppm) == _tdiv(c * 1_000_000, c1[ba])
        assert int(row.lift_ppm) == _tdiv(
            c * nb * 1_000_000, c1[ba] * c1[bb]
        )


# ---------------------------------------------------------------------------
# Wave 2
# ---------------------------------------------------------------------------


def test_merkle_fingerprint_matches_bruteforce_and_flips_on_any_row(spark):
    got = _pdf("merkle_partition_diff", spark)
    ev = duckdb.sql(
        f"SELECT event_id, user_id, event_type, value, "
        f"epoch_us(CAST(ts AS TIMESTAMP)) AS eus, "
        f"strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day "
        f"FROM '{SF_SMALL}/events.parquet'"
    ).df()
    by_day = {}
    for r in ev.itertuples():
        v4 = (
            int(round(float(r.value) * 10000))
            if r.value == r.value and r.value is not None
            else -1
        )
        s = f"{int(r.event_id)}|{int(r.user_id)}|{r.event_type}|{v4}|{int(r.eus)}"
        h = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        d = by_day.setdefault(r.day, {"n": 0, "x": 0})
        d["n"] += 1
        d["x"] ^= h
    assert len(got) == len(by_day)
    for row in got.itertuples():
        assert by_day[row.day]["n"] == int(row.n_rows)
        assert by_day[row.day]["x"] == int(row.fingerprint)
    # single-row sensitivity: flipping any one digest changes the fold
    any_day = next(iter(by_day))
    assert by_day[any_day]["x"] != by_day[any_day]["x"] ^ 1


def test_durbin_watson_matches_bruteforce(spark):
    got = _pdf("durbin_watson_daily", spark).iloc[0]
    daily = duckdb.sql(
        f"SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS x "
        f"FROM '{SF_SMALL}/orders.parquet' GROUP BY 1 ORDER BY 1"
    ).df()
    xs = [int(v) for v in daily["x"]]
    n, s = len(xs), sum(xs)
    sse_diff = sum((b - a) ** 2 for a, b in zip(xs, xs[1:]))
    ssc_scaled = sum((x * n - s) ** 2 for x in xs)
    assert int(got.n_days) == n
    assert int(got.sse_diff) == sse_diff
    assert int(got.ss_centered) == _tdiv(ssc_scaled, n * n)
    assert int(got.dw_e6) == _tdiv(sse_diff * n * n * 1_000_000, ssc_scaled)
    # sanity: DW lives in [0, 4]
    assert 0 <= int(got.dw_e6) <= 4_000_000


def test_theil_u_matches_bruteforce(spark):
    got = _pdf("theil_u_forecast", spark).iloc[0]
    daily = duckdb.sql(
        f"SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS x "
        f"FROM '{SF_SMALL}/orders.parquet' GROUP BY 1 ORDER BY 1"
    ).df()
    xs = [int(v) for v in daily["x"]]
    ev = [(xs[t], xs[t - 1], xs[t - 7]) for t in range(7, len(xs))]
    sse7 = sum((x - x7) ** 2 for x, _, x7 in ev)
    sse1 = sum((x - x1) ** 2 for x, x1, _ in ev)
    assert int(got.n_eval) == len(ev)
    assert int(got.sse_seasonal7) == sse7
    assert int(got.sse_randomwalk) == sse1
    assert int(got.theil_u2_ppm) == (
        0 if sse1 == 0 else _tdiv(sse7 * 1_000_000, sse1)
    )


def test_ngram_novelty_matches_bruteforce(spark, docs_pdf):
    got = _pdf("ngram_novelty_rate", spark).set_index("source")
    shingle_first = {}
    doc_shingles = {}
    for r in sorted(docs_pdf.itertuples(), key=lambda r: int(r.doc_id)):
        toks = [t for t in r.text.split() if t]
        sh = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
        doc_shingles[int(r.doc_id)] = (r.source, sh)
        for s in sh:
            shingle_first.setdefault(s, int(r.doc_id))
    per_src = {}
    for doc_id, (src, sh) in doc_shingles.items():
        d = per_src.setdefault(src, {"docs": set(), "pairs": 0, "novel": 0})
        if sh:
            d["docs"].add(doc_id)
        d["pairs"] += len(sh)
        d["novel"] += sum(1 for s in sh if shingle_first[s] == doc_id)
    for src, d in per_src.items():
        if not d["pairs"]:
            continue
        row = got.loc[src]
        assert int(row.n_docs) == len(d["docs"])
        assert int(row.n_shingle_pairs) == d["pairs"]
        assert int(row.n_novel) == d["novel"]
        assert int(row.novelty_bp) == _tdiv(d["novel"] * 10000, d["pairs"])


def test_srm_check_matches_bruteforce(spark, events_pdf):
    got = _pdf("srm_check", spark).iloc[0]
    users = sorted({int(u) for u in events_pdf["user_id"]})
    na = sum(
        1 for u in users
        if int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2 == 0
    )
    nb = len(users) - na
    chi2 = _tdiv((na - nb) ** 2 * 1_000_000, na + nb)
    assert int(got.n_users) == len(users)
    assert (int(got.n_a), int(got.n_b)) == (na, nb)
    assert int(got.srm_chi2_e6) == chi2
    assert int(got.srm_flag) == (1 if chi2 >= 3_841_459 else 0)


# ---------------------------------------------------------------------------
# Wave 3
# ---------------------------------------------------------------------------


def test_cohort_ltv_matches_bruteforce(spark):
    got = _pdf("cohort_ltv_curve", spark)
    ev = duckdb.sql(
        f"SELECT user_id, event_type, value, "
        f"epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS wk "
        f"FROM '{SF_SMALL}/events.parquet'"
    ).df()
    cohort = {}
    for r in ev.itertuples():
        u = int(r.user_id)
        cohort[u] = min(cohort.get(u, 1 << 62), int(r.wk))
    sizes = Counter(cohort.values())
    rev = Counter()
    for r in ev.itertuples():
        if r.event_type == "purchase" and r.value == r.value:
            u = int(r.user_id)
            rev[(cohort[u], int(r.wk) - cohort[u])] += int(
                round(float(r.value) * 100)
            )
    wk0 = min(cohort.values())
    rows = {}
    for (cw, age) in sorted(rev):
        prior = sum(v for (c, a), v in rev.items() if c == cw and a <= age)
        rows[(cw - wk0, age)] = (
            sizes[cw], rev[(cw, age)], prior, _tdiv(prior, sizes[cw])
        )
    assert len(got) == len(rows)
    for r in got.itertuples():
        key = (int(r.cohort_idx), int(r.age_wk))
        assert rows[key] == (
            int(r.n_users), int(r.rev_cents), int(r.cum_rev_cents),
            int(r.ltv_per_user_cents),
        )


def test_compaction_bin_plan_matches_bruteforce(spark, docs_pdf):
    got = _pdf("compaction_bin_plan", spark).set_index("source")
    target = 16_384
    per_src = {}
    for r in sorted(docs_pdf.itertuples(), key=lambda r: int(r.doc_id)):
        per_src.setdefault(r.source, []).append(int(r.n_chars))
    for src, sizes in per_src.items():
        bins = {}
        cum = 0
        for nc in sizes:
            bins.setdefault(cum // target, []).append(nc)
            cum += nc
        last = max(bins)
        under = sum(
            1 for b, docs in bins.items()
            if b < last and _tdiv(sum(docs) * 10000, target) < 8000
        )
        row = got.loc[src]
        assert int(row.n_docs) == len(sizes)
        assert int(row.total_bytes) == sum(sizes)
        assert int(row.n_bins) == len(bins)
        assert int(row.underfull_bins) == under
        assert int(row.tail_fill_bp) == _tdiv(
            sum(bins[last]) * 10000, target
        )


def test_storage_layout_advisor_matches_bruteforce(spark, events_pdf):
    got = _pdf("storage_layout_advisor", spark).set_index("col_name")
    ev = duckdb.sql(
        f"SELECT event_id, user_id, event_type FROM "
        f"'{SF_SMALL}/events.parquet'"
    ).df()
    n = len(ev)
    for col in ("event_id", "user_id", "event_type"):
        nd = ev[col].nunique()
        row = got.loc[col]
        assert int(row.n_rows) == n
        assert int(row.n_distinct) == nd
        bp = _tdiv(nd * 10000, n)
        assert int(row.distinct_bp) == bp
        assert int(row.dict_recommended) == (1 if bp < 500 else 0)
        assert int(row.bloom_bits_1pct) == _tdiv(nd * 9585, 1000)


# ---------------------------------------------------------------------------
# Wave 4
# ---------------------------------------------------------------------------


def test_mood_median_matches_bruteforce(spark, events_pdf):
    got = _pdf("mood_median_test", spark).iloc[0]
    vals = []
    for r in events_pdf.itertuples():
        if r.event_type == "purchase" and r.value == r.value:
            cents = int(round(float(r.value) * 100))
            is_a = (
                int(hashlib.md5(str(int(r.user_id)).encode())
                    .hexdigest()[:8], 16) % 2 == 0
            )
            vals.append((cents, is_a))
    vals.sort()
    n = len(vals)
    med = vals[(n + 1) // 2 - 1][0]  # pooled lower median
    a_above = sum(1 for c, a in vals if a and c > med)
    b_above = sum(1 for c, a in vals if not a and c > med)
    a_below = sum(1 for c, a in vals if a and c <= med)
    b_below = sum(1 for c, a in vals if not a and c <= med)
    assert int(got.med_cents) == med
    assert (int(got.n_a), int(got.n_b)) == (a_above + a_below,
                                            b_above + b_below)
    assert (int(got.a_above), int(got.b_above)) == (a_above, b_above)
    r1, r2 = a_above + b_above, a_below + b_below
    c1, c2 = a_above + a_below, b_above + b_below
    if 0 in (r1, r2, c1, c2):
        expect = 0
    else:
        det = a_above * b_below - b_above * a_below
        expect = _tdiv(n * det * det * 1_000_000, r1 * r2 * c1 * c2)
    assert int(got.mood_chi2_e6) == expect


def test_ljung_box_matches_bruteforce(spark):
    got = _pdf("ljung_box_daily", spark).iloc[0]
    daily = duckdb.sql(
        f"SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS x "
        f"FROM '{SF_SMALL}/orders.parquet' GROUP BY 1 ORDER BY 1"
    ).df()
    xs = [int(v) for v in daily["x"]]
    n, s = len(xs), sum(xs)
    c = [x * n - s for x in xs]
    D = sum(v * v for v in c)
    q = 0
    for k in range(1, 8):
        nk = sum(c[i] * c[i + k] for i in range(n - k))
        q += _tdiv(n * (n + 2) * nk * nk * 1_000_000, (n - k) * D * D)
    assert int(got.n_days) == n
    assert int(got.ss_scaled) == D
    assert int(got.ljung_box_q_e6) == q


def test_hapax_rate_matches_bruteforce(spark, docs_pdf):
    got = _pdf("hapax_legomena_rate", spark).set_index("source")
    per_src = {}
    all_cnt = Counter()
    for r in docs_pdf.itertuples():
        toks = [t for t in r.text.split() if t]
        cnt = per_src.setdefault(r.source, Counter())
        for t in toks:
            cnt[t] += 1
            all_cnt[t] += 1
    per_src["ALL"] = all_cnt
    assert set(got.index) == set(per_src)
    for src, cnt in per_src.items():
        vocab = len(cnt)
        hapax = sum(1 for v in cnt.values() if v == 1)
        row = got.loc[src]
        assert int(row.vocab) == vocab
        assert int(row.hapax) == hapax
        assert int(row.n_tokens) == sum(cnt.values())
        assert int(row.hapax_bp) == _tdiv(hapax * 10000, vocab)
