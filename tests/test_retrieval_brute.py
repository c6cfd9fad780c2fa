"""Brute-force differential tests for the late-r05 retrieval/link
families: a THIRD independent implementation (pure Python over the
sf0.001 parquet) against the Spark plans, complementing the DuckDB
oracles. Each brute force re-derives the integer-scaled arithmetic from
the definitions — if the Spark plan and the oracle shared a mistake,
this layer would catch it.
"""

from collections import Counter, defaultdict

import pyarrow.parquet as pq
import pytest

from reddit_data_pipeline_engineering_spark.plans.queries import REGISTRY, queries

from .conftest import SF_SMALL

queries()  # force registration


def _docs():
    t = pq.read_table(f"{SF_SMALL}/documents.parquet")
    return t.to_pylist()


def _pairs():
    orders = pq.read_table(
        f"{SF_SMALL}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).to_pylist()
    li = pq.read_table(
        f"{SF_SMALL}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    ).to_pylist()
    cust_of = {r["o_orderkey"]: r["o_custkey"] for r in orders}
    return {
        (cust_of[r["l_orderkey"]], r["l_suppkey"])
        for r in li
        if r["l_orderkey"] in cust_of
    }


def test_bm25_topk_matches_brute_force(spark):
    docs = _docs()
    terms = ("join", "hash", "dup")
    toks = {d["doc_id"]: d["text"].split(" ") for d in docs}
    n_docs = len(docs)
    w_total = sum(len(t) for t in toks.values())
    tf = {
        (doc, w): c
        for doc, t in toks.items()
        for w, c in Counter(x for x in t if x in terms).items()
    }
    df = Counter(w for (_, w) in tf)
    exp = defaultdict(lambda: [0, 0, 0])  # doc -> [len, n_terms, score]
    for (doc, w), c in tf.items():
        l = len(toks[doc])
        idf = (n_docs * 10000) // df[w]
        sat = (22000 * c * w_total) // (
            10 * w_total * c + 3 * w_total + 9 * l * n_docs
        )
        exp[doc][0] = l
        exp[doc][1] += 1
        exp[doc][2] += idf * sat
    want = sorted(
        ((d, *v) for d, v in exp.items()), key=lambda r: (-r[3], r[0])
    )[:20]
    got = [
        (r["doc_id"], r["doc_len"], r["n_terms"], r["bm25_scaled"])
        for r in REGISTRY["bm25_topk"].fn(spark, SF_SMALL).collect()
    ]
    assert got == [tuple(w) for w in want]


def test_source_wjaccard_matches_brute_force(spark):
    docs = _docs()
    cnt: dict[str, Counter] = defaultdict(Counter)
    for d in docs:
        cnt[d["source"]].update(d["text"].split(" "))
    srcs = sorted(cnt)
    want = []
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            common = set(cnt[a]) & set(cnt[b])
            msum = sum(min(cnt[a][w], cnt[b][w]) for w in common)
            ta, tb = sum(cnt[a].values()), sum(cnt[b].values())
            want.append(
                (a, b, len(common), msum * 1_000_000 // (ta + tb - msum))
            )
    got = [
        (r["src_a"], r["src_b"], r["n_common_words"], r["wjaccard_scaled"])
        for r in REGISTRY["source_wjaccard"].fn(spark, SF_SMALL).collect()
    ]
    assert got == want


def test_chisq_source_drift_matches_brute_force(spark):
    docs = _docs()
    cnt: dict[str, Counter] = defaultdict(Counter)
    for d in docs:
        cnt[d["source"]].update(d["text"].split(" "))
    corpus = Counter()
    for c in cnt.values():
        corpus.update(c)
    nn = sum(corpus.values())
    R = 1_000_000
    want = []
    for s in sorted(cnt):
        n = sum(cnt[s].values())
        drift = 0
        for w, c in cnt[s].items():
            rs = c * R // n
            rc = corpus[w] * R // nn
            drift += (rs - rc) * (rs - rc) // (rc + 1)
        want.append((s, n, len(cnt[s]), drift))
    got = [
        (r["source"], r["n_words"], r["n_vocab"], r["drift_scaled"])
        for r in REGISTRY["chisq_source_drift"].fn(spark, SF_SMALL).collect()
    ]
    assert got == want


def test_bigram_lm_familiarity_matches_brute_force(spark):
    import hashlib

    docs = _docs()

    def bucket(doc_id: int) -> int:
        h = hashlib.md5(str(doc_id).encode()).hexdigest()[:8]
        return int(h, 16) % 100

    def bigrams(text: str):
        t = text.split(" ")
        return [f"{a} {b}" for a, b in zip(t, t[1:])]

    model: Counter = Counter()
    for d in docs:
        if bucket(d["doc_id"]) < 80:
            model.update(bigrams(d["text"]))
    mt = sum(model.values())
    S = 1_000_000_000
    per_source: dict[str, list[int]] = defaultdict(list)
    for d in docs:
        if bucket(d["doc_id"]) >= 80:
            bgs = bigrams(d["text"])
            if not bgs:
                continue
            tot = sum(model.get(g, 0) * S // mt for g in bgs)
            per_source[d["source"]].append(tot // len(bgs))
    want = [
        (s, len(v), sum(v) // len(v), min(v), max(v))
        for s, v in sorted(per_source.items())
    ]
    got = [
        tuple(r)
        for r in REGISTRY["bigram_lm_familiarity"].fn(spark, SF_SMALL).collect()
    ]
    assert got == want


def test_ra_linkpred_matches_brute_force(spark):
    pairs = _pairs()
    deg = Counter(c for c, _ in pairs)
    by_cust = defaultdict(set)
    for c, s in pairs:
        if deg[c] <= 40:
            by_cust[c].add(s)
    score: Counter = Counter()
    shared: Counter = Counter()
    for c, supps in by_cust.items():
        ss = sorted(supps)
        for i, a in enumerate(ss):
            for b in ss[i + 1 :]:
                score[(a, b)] += 1_000_000 // deg[c]
                shared[(a, b)] += 1
    want = sorted(
        ((a, b, shared[(a, b)], sc) for (a, b), sc in score.items()),
        key=lambda r: (-r[3], r[0], r[1]),
    )[:20]
    got = [
        (r["supp_a"], r["supp_b"], r["n_shared"], r["ra_scaled"])
        for r in REGISTRY["ra_linkpred_topk"].fn(spark, SF_SMALL).collect()
    ]
    assert got == want


def test_hits_topk_matches_brute_force(spark):
    pairs = _pairs()
    a1: Counter = Counter(s for _, s in pairs)
    a1 = Counter({s: v // 8 for s, v in a1.items()})
    h1: Counter = Counter()
    for c, s in pairs:
        h1[c] += a1[s]
    h1 = Counter({c: v // 8 for c, v in h1.items()})
    a2: Counter = Counter()
    for c, s in pairs:
        a2[s] += h1[c]
    a2 = Counter({s: v // 8 for s, v in a2.items()})
    h2: Counter = Counter()
    for c, s in pairs:
        h2[c] += a2[s]
    h2 = Counter({c: v // 8 for c, v in h2.items()})
    topa = sorted(a2.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    toph = sorted(h2.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    want = sorted(
        [("authority", n, v) for n, v in topa]
        + [("hub", n, v) for n, v in toph],
        key=lambda r: (r[0], -r[2], r[1]),
    )
    got = [
        (r["kind"], r["node_id"], r["score"])
        for r in REGISTRY["hits_topk"].fn(spark, SF_SMALL).collect()
    ]
    assert got == want


def test_rrf_fusion_ranks_consistent(spark):
    """Structural invariants of the fused output: ranks are within the
    shortlist depth, the score is exactly the RRF formula of the two
    rank columns, and the top row dominates."""
    rows = REGISTRY["rrf_fusion_topk"].fn(spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert 0 <= r["rank_cos"] <= 100 and 0 <= r["rank_dot"] <= 100
        want = (1_000_000 // (60 + r["rank_cos"]) if r["rank_cos"] else 0) + (
            1_000_000 // (60 + r["rank_dot"]) if r["rank_dot"] else 0
        )
        assert r["rrf_scaled"] == want
    scores = [r["rrf_scaled"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_matryoshka_recall_bounds(spark):
    row = REGISTRY["matryoshka_recall_at_k"].fn(spark, SF_SMALL).collect()[0]
    assert row["k"] == 20 and row["dim_prefix"] == 8
    assert 0 <= row["n_overlap"] <= 20
    assert abs(row["recall_at_k"] - round(row["n_overlap"] / 20.0, 4)) < 1e-9


def test_ndcg_at_k_matches_brute_force(spark):
    """Third independent nDCG@20: pure-Python cosine rankings with the
    same HALF_UP 6-decimal rounding and the same integer rank-discount
    literals as the plan/oracle pair."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    t = pq.read_table(f"{SF_SMALL}/embeddings.parquet").to_pylist()
    emb = {r["vec_id"]: r["embedding"] for r in t}
    q = emb.pop(0)

    def r6(x: float) -> float:
        # Spark F.round = BigDecimal(Double.toString) HALF_UP; Python's
        # repr gives the same shortest decimal representation.
        return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))

    def cos(a, b, n=None):
        a, b = (a[:n], b[:n]) if n else (a, b)
        d = sum(x * y for x, y in zip(a, b))
        return r6(d / (math.sqrt(sum(x * x for x in a))
                       * math.sqrt(sum(y * y for y in b))))

    full = sorted(((cos(v, q), i) for i, v in emb.items()),
                  key=lambda s: (-s[0], s[1]))[:20]
    pre = sorted(((cos(v, q, 8), i) for i, v in emb.items()),
                 key=lambda s: (-s[0], s[1]))[:20]
    w = [int(round(1_000_000 / math.log2(r + 1))) for r in range(1, 21)]
    rel = {i: (3 if r <= 5 else 2 if r <= 10 else 1)
           for r, (_, i) in enumerate(full, 1)}
    dcg = sum(rel.get(i, 0) * w[r - 1] for r, (_, i) in enumerate(pre, 1))
    idcg = sum(g * w[r - 1]
               for r, g in enumerate(sorted(rel.values(), reverse=True), 1))
    row = REGISTRY["ndcg_at_k"].fn(spark, SF_SMALL).collect()[0]
    assert (row["k"], row["dim_prefix"]) == (20, 8)
    assert (row["dcg_scaled"], row["idcg_scaled"]) == (dcg, idcg)
    assert row["ndcg_bps"] == dcg * 10000 // idcg


def test_mrr_prefix_rank_matches_brute_force(spark):
    """Third independent MRR: pure-Python full/prefix cosine ranks with
    the same rounding and tie-break as the plan/oracle pair."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    t = pq.read_table(f"{SF_SMALL}/embeddings.parquet").to_pylist()
    emb = {r["vec_id"]: r["embedding"] for r in t}

    def r6(x):
        return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))

    def cos(a, b, n=None):
        a, b = (a[:n], b[:n]) if n else (a, b)
        return r6(sum(x * y for x, y in zip(a, b))
                  / (math.sqrt(sum(x * x for x in a))
                     * math.sqrt(sum(y * y for y in b))))

    qids = sorted(i for i in emb if i % 25 == 2 and i < 5000)
    cands = sorted(i for i in emb if not (i % 25 == 2 and i < 5000))
    total, hits = 0, 0
    for q in qids:
        full = [(cos(emb[c], emb[q]), c) for c in cands]
        nn = max(full, key=lambda s: (s[0], -s[1]))[1]
        pre = {c: cos(emb[c], emb[q], 8) for c in cands}
        rank = 1 + sum(
            1
            for c in cands
            if pre[c] > pre[nn] or (pre[c] == pre[nn] and c < nn)
        )
        if rank <= 50:
            hits += 1
            total += 1_000_000 // rank
    row = REGISTRY["mrr_prefix_rank"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_queries"] == len(qids)
    assert row["n_hits_at_50"] == hits
    assert row["mrr_scaled"] == total // len(qids)


def test_map_at_k_matches_brute_force(spark):
    """Third independent MAP@50: pure-Python AP with the same rounding,
    tie-breaks and integer scaling as the plan/oracle pair."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    t = pq.read_table(f"{SF_SMALL}/embeddings.parquet").to_pylist()
    emb = {r["vec_id"]: r["embedding"] for r in t}

    def r6(x):
        return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))

    def cos(a, b, n=None):
        a, b = (a[:n], b[:n]) if n else (a, b)
        return r6(sum(x * y for x, y in zip(a, b))
                  / (math.sqrt(sum(x * x for x in a))
                     * math.sqrt(sum(y * y for y in b))))

    qids = sorted(i for i in emb if i % 25 == 2 and i < 5000)
    cands = sorted(i for i in emb if not (i % 25 == 2 and i < 5000))
    aps, hits_total = [], 0
    for q in qids:
        full = sorted(((cos(emb[c], emb[q]), c) for c in cands),
                      key=lambda s: (-s[0], s[1]))
        rel = [c for _, c in full[:10]]
        pre = {c: cos(emb[c], emb[q], 8) for c in cands}
        by_pre = sorted(rel, key=lambda c: (-pre[c], c))
        ap = 0
        for i, c in enumerate(by_pre, 1):
            prank = 1 + sum(
                1 for o in cands
                if pre[o] > pre[c] or (pre[o] == pre[c] and o < c)
            )
            if prank <= 50:
                hits_total += 1
                ap += i * 1_000_000 // prank
        aps.append(ap // 10)
    row = REGISTRY["map_at_k"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_queries"] == len(qids)
    assert row["n_hits_total"] == hits_total
    assert row["map_scaled"] == sum(aps) // len(qids)


def test_prf_expansion_behaviors(spark, query_df_cache):
    """PRF invariants: expansion terms exclude seeds, at most 5 of
    them, weighted scoring favors seed matches 2:1, and the whole
    two-round pipeline is deterministic across rebuilds (fresh build
    vs the parity suite's cached build — two independent
    constructions)."""
    from reddit_data_pipeline_engineering_spark.plans.queries import (
        REGISTRY,
        queries,
    )
    from reddit_data_pipeline_engineering_spark.plans.queries_retrieval import (
        _BM25_TERMS,
        _PRF_EXP_K,
    )

    from .conftest import SF_SMALL

    queries()
    a = query_df_cache("prf_expansion_topk")[0].toPandas()
    b = (
        REGISTRY["prf_expansion_topk"].fn(spark, SF_SMALL).toPandas()
    )
    assert a.to_dict("records") == b.to_dict("records")  # deterministic
    assert len(a) <= 20 and len(a) > 0
    assert (a["n_seed_terms"] <= len(_BM25_TERMS)).all()
    assert (a["n_exp_terms"] <= _PRF_EXP_K).all()
    # descending score with doc_id tiebreak
    s = list(zip(-a["prf_scaled"], a["doc_id"]))
    assert s == sorted(s)
    # the widened query matches strictly more term-slots than the seed
    # query alone for at least one returned doc (expansion did work)
    assert (a["n_exp_terms"] > 0).any()
