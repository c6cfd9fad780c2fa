"""Property-based tests (hypothesis) — the testing layer SURVEY.md §5
notes the reference lacks entirely.

Each property runs on small generated long-format tables; example counts
are kept low because every example builds a Spark job (examples are cheap
to shrink but expensive to run).
"""

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from reddit_data_pipeline_engineering_spark.functions import aqi
from reddit_data_pipeline_engineering_spark.operators.dedup import window_dedup
from reddit_data_pipeline_engineering_spark.operators.pivot import (
    pivot_conditional,
    unpivot,
)

PARAMS = ["pm25", "pm10", "no2"]

# (entity, hour, param, value, tiebreak) rows
row_st = st.tuples(
    st.integers(1, 6),
    st.integers(0, 5),
    st.sampled_from(PARAMS),
    st.floats(0, 1000, allow_nan=False, width=32),
    st.integers(0, 9),
)
rows_st = st.lists(row_st, min_size=1, max_size=60)

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Wide-input tier (VERDICT r05 #5): for tests whose per-example cost is
# dominated by FIXED Spark execution overhead (iterative kernels, joins),
# the strategy below draws a WIDER input per example (multi-component
# graph unions, more groups/docs) so 6 examples cover at least as many
# randomized cases as 12 narrow ones did, at half the executions. The
# assertion code is untouched - every brute-force replay runs on whatever
# input the strategy draws.
WIDE = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(e, f"2025-01-01 {h:02d}:00:00", p, float(v), t) for e, h, p, v, t in rows],
        "entity long, ts string, parameter string, value double, tb long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


@given(rows=rows_st)
@WIDE
def _prop_window_dedup_properties(spark, rows):
    """Dedup yields exactly one row per key, keeps only input rows,
    is idempotent, and picks the minimal tiebreak deterministically."""
    df = _df(spark, rows)
    out = window_dedup(df, ["entity", "ts", "parameter"], ["tb", "value"])
    got = out.collect()
    keys = {(r["entity"], r["ts"], r["parameter"]) for r in got}
    assert len(got) == len(keys)  # one survivor per key
    # every key in the input appears exactly once
    in_keys = set()
    for r in df.collect():
        in_keys.add((r["entity"], r["ts"], r["parameter"]))
    assert keys == in_keys
    # survivor = min (tb, value) per key
    best = {}
    for r in df.collect():
        k = (r["entity"], r["ts"], r["parameter"])
        cand = (r["tb"], r["value"])
        if k not in best or cand < best[k]:
            best[k] = cand
    for r in got:
        k = (r["entity"], r["ts"], r["parameter"])
        assert (r["tb"], r["value"]) == best[k]
    # idempotent
    again = window_dedup(out, ["entity", "ts", "parameter"], ["tb", "value"])
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, got))


@given(rows=rows_st)
@WIDE
def _prop_pivot_unpivot_roundtrip_property(spark, rows):
    """unpivot(pivot(long)) == mean-collapsed long, for any input."""
    df = _df(spark, rows)
    wide = pivot_conditional(df, ["entity", "ts"], "parameter", "value", PARAMS)
    back = unpivot(wide, ["entity", "ts"], PARAMS).filter(
        F.col("value").isNotNull()
    )
    got = {
        (r["entity"], r["ts"], r["parameter"]): r["value"] for r in back.collect()
    }
    sums: dict = {}
    for r in df.collect():
        k = (r["entity"], r["ts"], r["parameter"])
        s, n = sums.get(k, (0.0, 0))
        sums[k] = (s + r["value"], n + 1)
    assert set(got) == set(sums)
    for k, (s, n) in sums.items():
        assert abs(got[k] - s / n) < 1e-6


@given(conc=st.floats(0, 600, allow_nan=False))
@SLOW
def _prop_aqi_subindex_monotone_property(spark, conc):
    """AQI sub-index is non-negative and monotone in concentration."""
    df = spark.createDataFrame(
        [(float(conc),), (float(conc) + 10.0,)], "c double"
    )
    vals = [
        r[0] for r in df.select(aqi.subindex(F.col("c"), "pm25")).collect()
    ]
    assert vals[0] >= 0
    assert vals[1] >= vals[0]  # monotone non-decreasing

# --- corpus-prep properties ------------------------------------------------

doc_st = st.lists(
    st.tuples(
        st.integers(0, 30),  # doc_id source (deduped below)
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
            min_size=0,
            max_size=12,
        ),
    ),
    min_size=1,
    max_size=12,
)


@given(docs=doc_st, max_tokens=st.integers(2, 50))
@WIDE
def _prop_pack_sequences_properties(spark, docs, max_tokens):
    """Every doc's pack equals floor(preceding_tokens / budget) within its
    group; packs are contiguous from 0; pack of the first doc is 0."""
    from reddit_data_pipeline_engineering_spark.operators.corpus import (
        pack_sequences,
    )

    uniq = {d: toks for d, toks in docs}
    rows = [(d, "g", len(toks)) for d, toks in sorted(uniq.items())]
    df = spark.createDataFrame(rows, "doc_id long, grp string, n_tokens int")
    got = {
        r["doc_id"]: (r["pack_id"], r["__cum_tokens"])
        for r in pack_sequences(
            df, "n_tokens", "doc_id", max_tokens, ["grp"]
        ).collect()
    }
    running = 0
    for d, toks in sorted(uniq.items()):
        n = len(toks)
        assert got[d] == (running // max_tokens, running + n)
        running += n


@given(s=st.text(min_size=0, max_size=150))
@WIDE
def _prop_scrub_pii_idempotent(spark, s):
    """Scrubbing twice equals scrubbing once (replacement tokens must not
    themselves match the patterns)."""
    from reddit_data_pipeline_engineering_spark.functions.text import scrub_pii

    df = spark.createDataFrame([(s,)], "t string")
    once = df.select(scrub_pii("t").alias("o"))
    twice = once.select(scrub_pii("o").alias("o"))
    assert once.collect() == twice.collect()


sel_groups_st = st.dictionaries(
    st.sampled_from(["a", "b", "c", "d", "e", "f"]),
    st.lists(
        st.one_of(
            st.floats(
                min_value=-1e6, max_value=1e6,
                allow_nan=False, allow_infinity=False,
            ),
            st.sampled_from([0.0, 1.5, -2.25]),  # force duplicates
        ),
        min_size=1,
        max_size=60,
    ),
    min_size=1,
    max_size=6,
)


@given(groups=sel_groups_st)
# Regression pins (found by hypothesis): a subnormal absorbed into 0.0
# by bracket arithmetic used to leave the terminal bisection bracket
# empty -> KeyError (operators/selection.py bucket-boundary widening).
@example(groups={"b": [-2.225073858507e-311, 0.0, -0.5, 1.5]})
@example(groups={"a": [-0.5, -2.225073858507e-311, 1.5]})
@WIDE
def _prop_selection_median_property(spark, groups):
    """Bucket-bisection median == sorted-middle median for arbitrary
    group contents (duplicates, negatives, single values)."""
    from reddit_data_pipeline_engineering_spark.operators.selection import (
        grouped_median_selection,
    )

    data = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(data, "g string, v double")
    got = {
        r["g"]: (r["n_values"], r["median_value"])
        for r in grouped_median_selection(df, "g", "v").collect()
    }
    for g, vs in groups.items():
        s = sorted(vs)
        n = len(s)
        exp = s[(n - 1) // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2
        assert got[g] == (n, exp), (g, got[g], (n, exp))


_cc_subgraph_st = st.lists(
    st.tuples(st.integers(0, 25), st.integers(0, 25)),
    min_size=1,
    max_size=40,
)
# A disjoint union of up to 4 random subgraphs per example (node spaces
# offset by 100): connected components on a union == union of per-graph
# results, so one Spark execution covers several drawn graphs.
edges_st = (
    st.lists(_cc_subgraph_st, min_size=1, max_size=4)
    .map(
        lambda gs: [
            (a + 100 * k, b + 100 * k)
            for k, g in enumerate(gs)
            for a, b in g
        ]
    )
    .filter(lambda es: any(a != b for a, b in es))
)


@given(edges=edges_st)
@WIDE
def _prop_star_components_property(spark, edges):
    """Large-star/small-star labeling == a reference union-find on the
    same edges, for arbitrary graphs (self-loops dropped)."""
    from reddit_data_pipeline_engineering_spark.operators import components as cc

    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = set()
    for a, b in edges:
        if a != b:
            nodes |= {a, b}
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    expected = {(x, find(x)) for x in nodes}

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        (r["id"], r["component"])
        for r in cc.connected_components(
            df, "id_a", "id_b", algorithm="star"
        ).collect()
    }
    assert got == expected


def _prop_hash_split_membership_invariant_across_sf(spark):
    """The md5-bucket split's WHOLE value proposition: a document's
    train/val/test assignment depends only on its id — identical across
    scale factors, reruns, and engines. The documents table shares ids
    across sf0.001 and sf0.01, so the assignment maps must agree on the
    intersection."""
    from pyspark.sql import functions as F

    from reddit_data_pipeline_engineering_spark.sources.tables import load_table

    def assignment(sf):
        docs = load_table(spark, sf, "documents")
        b = F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long") % 100
        split = (
            F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
        )
        return {
            r.doc_id: r.split
            for r in docs.select("doc_id", split.alias("split")).collect()
        }

    a = assignment("/root/testdata/sf0.001")
    b = assignment("/root/testdata/sf0.01")
    common = set(a) & set(b)
    assert common
    assert all(a[d] == b[d] for d in common)


def _prop_triangle_count_partitioning_invariant(spark):
    """Degree orientation + equi-join closure must give the same count
    regardless of how the edge list is physically partitioned."""
    import itertools

    from reddit_data_pipeline_engineering_spark.operators import triangles as tri

    edges = [(a, b) for a, b in itertools.combinations(range(7), 2)
             if (a * 7 + b) % 3 != 0]
    df = spark.createDataFrame(edges, "u long, v long")
    base = tri.triangle_count(df).head()
    for n in (1, 5, 13):
        got = tri.triangle_count(df.repartition(n)).head()
        assert (got.n_wedges, got.n_triangles) == (
            base.n_wedges,
            base.n_triangles,
        )


from hypothesis import example, given, settings
from hypothesis import strategies as st


@given(st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=60))
@settings(max_examples=200, deadline=None)
def test_gini_rank_block_closed_form_matches_sorted_ranks(counts):
    """key_skew_gini's histogram formula must equal the textbook
    per-element rank formula for ANY count multiset: a tie block of m
    equal values x starting after R predecessors contributes
    x * (m*R + m*(m+1)/2) to the rank-weighted sum."""
    n = len(counts)
    s = sum(counts)
    xs = sorted(counts)
    rank_sum = sum((i + 1) * x for i, x in enumerate(xs))

    hist = {}
    for x in counts:
        hist[x] = hist.get(x, 0) + 1
    r = 0
    block_sum = 0
    for x in sorted(hist):
        m = hist[x]
        block_sum += x * (m * r + m * (m + 1) // 2)
        r += m
    assert block_sum == rank_sum
    # and therefore the integer-scaled Gini agrees exactly
    assert (2 * block_sum - (n + 1) * s) * 1_000_000 // (n * s) == (
        2 * rank_sum - (n + 1) * s
    ) * 1_000_000 // (n * s)


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2", "g3", "g4"]),
            st.floats(-100, 100, allow_nan=False).map(lambda x: round(x, 2)),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=60,
    )
)
@WIDE
def _prop_weighted_median_crossing_matches_brute_force(spark, rows):
    """The cumulative-weight crossing rule must pick the same value as a
    direct scan of the sorted (value, weight) list for arbitrary
    weights, duplicates, and group contents."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "g string, v double, wt long")
    wc = (
        Window.partitionBy("g")
        .orderBy("v", "wt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt_all = Window.partitionBy("g")
    c = df.select(
        "g",
        "v",
        F.sum("wt").over(wc).alias("cum"),
        F.sum("wt").over(wt_all).alias("tot"),
    )
    got = {
        r["g"]: r["wm"]
        for r in c.groupBy("g")
        .agg(
            F.min(
                F.when(F.col("cum") * 2 >= F.col("tot"), F.col("v"))
            ).alias("wm")
        )
        .collect()
    }
    by_g = {}
    for g, v, wt in rows:
        by_g.setdefault(g, []).append((v, wt))
    for g, vw in by_g.items():
        tot = sum(w for _, w in vw)
        cum = 0
        exp = None
        for v, w in sorted(vw):
            cum += w
            if cum * 2 >= tot:
                exp = v
                break
        assert got[g] == exp, (g, got[g], exp, vw)


# ---- PPJoin prefix filtering: zero false negatives vs brute force ----

_ssj_word = st.sampled_from(["a", "b", "c", "d", "e"])
_ssj_doc = st.lists(_ssj_word, min_size=1, max_size=8).map(" ".join)
_ssj_corpus = st.lists(_ssj_doc, min_size=2, max_size=14)


@given(docs=_ssj_corpus)
@WIDE
def _prop_setsim_prefix_join_exact_vs_brute_force(spark, docs):
    """The prefix filter may only PRUNE non-qualifying pairs: every pair
    with shingle-set Jaccard >= 1/2 must be emitted with exact
    intersection/union sizes, and nothing below threshold may appear.
    Tiny 5-word alphabet + 2-gram shingles force heavy collisions —
    the regime where a wrong prefix bound would drop pairs."""
    from reddit_data_pipeline_engineering_spark.operators import setsim

    n = 2  # shingle length
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): (r.n_inter, r.n_union)
        for r in setsim.setsim_join(
            df, "text", "doc_id", shingle_len=n, t_num=1, t_den=2
        ).collect()
    }

    def shingles(text):
        toks = text.split()
        return {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }

    sets = {i: shingles(t) for i, t in enumerate(docs)}
    expected = {}
    for i in sorted(sets):
        for j in sorted(sets):
            if i >= j or not sets[i] or not sets[j]:
                continue
            inter = len(sets[i] & sets[j])
            union = len(sets[i] | sets[j])
            if inter * 2 >= union:
                expected[(i, j)] = (inter, union)
    assert got == expected


# ---- round-3 graph kernels vs brute force on random graphs ----

_edge_st = st.tuples(st.integers(1, 8), st.integers(1, 8)).filter(
    lambda e: e[0] != e[1]
)
# Disjoint union of up to 3 small digraphs per example (offset 100 per
# subgraph): peeling and label propagation are per-component, and the
# Python replays run on the union as drawn, so one execution covers
# several graphs.
_graph_st = st.lists(
    st.lists(_edge_st, min_size=1, max_size=14), min_size=1, max_size=3
).map(
    lambda gs: [
        (a + 100 * k, b + 100 * k) for k, g in enumerate(gs) for a, b in g
    ]
)


def _symmetrize(und):
    return sorted({(a, b) for a, b in und} | {(b, a) for a, b in und})


@given(und=_graph_st, k=st.integers(1, 4))
@WIDE
def _prop_kcore_peel_random_graphs(spark, und, k):
    """Fixed-round peeling equals the Python replay on arbitrary small
    graphs for arbitrary k — including immediate collapse and no-op
    (already-a-core) cases."""
    from reddit_data_pipeline_engineering_spark.operators import kcore

    sym = _symmetrize(und)
    df = spark.createDataFrame(sym, "src long, dst long")
    rounds = 3
    got = [
        (r.round, r.nodes_alive, r.edges_alive)
        for r in kcore.kcore_peel(df, k=k, rounds=rounds).collect()
    ]
    edges = set(sym)
    expected = []
    for r in range(1, rounds + 1):
        deg = {}
        for a, _ in edges:
            deg[a] = deg.get(a, 0) + 1
        alive = {n for n, d in deg.items() if d >= k}
        edges = {(a, b) for a, b in edges if a in alive and b in alive}
        expected.append((r, len(alive), len(edges) // 2))
    assert got == expected


@given(und=_graph_st)
@WIDE
def _prop_lpa_random_graphs(spark, und):
    """Synchronous LPA with the (max count, min label) tie-break equals
    the Python replay on arbitrary small graphs."""
    from reddit_data_pipeline_engineering_spark.operators import lpa

    sym = _symmetrize(und)
    df = spark.createDataFrame(sym, "src long, dst long")
    rounds = 2
    got = {
        r.node: r.label
        for r in lpa.label_propagation(df, rounds=rounds).collect()
    }
    adj = {}
    for a, b in sym:
        adj.setdefault(b, []).append(a)
    labels = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        for n, nbrs in adj.items():
            counts = {}
            for m in nbrs:
                counts[labels[m]] = counts.get(labels[m], 0) + 1
            new[n] = min(counts, key=lambda lbl: (-counts[lbl], lbl))
        labels = new
    assert got == labels


@given(docs=_ssj_corpus)
@WIDE
def _prop_setsim_cosine_join_exact_vs_brute_force(spark, docs):
    """The cosine variant's t^2 prefix bound may only prune: every pair
    with binary cosine >= 0.7 must be emitted with the exact squared
    score, and nothing below threshold may appear."""
    from reddit_data_pipeline_engineering_spark.operators import setsim

    n = 2
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): (r.n_inter, r.cos2_ppm)
        for r in setsim.setsim_join(
            df, "text", "doc_id", shingle_len=n, t_num=7, t_den=10,
            metric="cosine",
        ).collect()
    }

    def shingles(text):
        toks = text.split()
        return {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }

    sets = {i: shingles(t) for i, t in enumerate(docs)}
    expected = {}
    for i in sorted(sets):
        for j in sorted(sets):
            if i >= j or not sets[i] or not sets[j]:
                continue
            inter = len(sets[i] & sets[j])
            na, nb = len(sets[i]), len(sets[j])
            if inter * inter * 100 >= 49 * na * nb:
                expected[(i, j)] = (inter, inter * inter * 1000000 // (na * nb))
    assert got == expected


# Random docs over a 3-word vocabulary: chunk-grain duplicates are
# plentiful, so span merging/retirement paths all get exercised.
span_docs_st = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc"]), min_size=1, max_size=30),
    min_size=1,
    max_size=12,
)


@given(docs=span_docs_st, chunk_words=st.integers(2, 4))
@WIDE
def _prop_duplicate_spans_match_bruteforce(spark, docs, chunk_words):
    """duplicate_spans == a direct Python replay: fixed-width chunks,
    corpus-wide duplicate flag, adjacent duplicated chunks merged into
    maximal per-doc spans."""
    from collections import Counter

    from reddit_data_pipeline_engineering_spark.operators.corpus import (
        duplicate_spans,
    )

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.span_start): (r.span_chunks, r.span_chars)
        for r in duplicate_spans(df, "text", "doc_id", chunk_words).collect()
    }

    chunks = {}  # (doc, idx) -> chunk text
    for i, words in enumerate(docs):
        for idx in range(0, (len(words) + chunk_words - 1) // chunk_words):
            chunks[(i, idx)] = " ".join(
                words[idx * chunk_words : (idx + 1) * chunk_words]
            )
    freq = Counter(chunks.values())
    expected = {}
    for i in range(len(docs)):
        idxs = sorted(
            idx for (d, idx), txt in chunks.items() if d == i and freq[txt] > 1
        )
        run_start, prev = None, None
        for idx in idxs + [None]:
            if idx is not None and (prev is None or idx != prev + 1):
                if run_start is not None:
                    expected[(i, run_start)] = (
                        prev - run_start + 1,
                        sum(
                            len(chunks[(i, j)])
                            for j in range(run_start, prev + 1)
                        ),
                    )
                run_start = idx
            elif idx is None and run_start is not None:
                expected[(i, run_start)] = (
                    prev - run_start + 1,
                    sum(
                        len(chunks[(i, j)]) for j in range(run_start, prev + 1)
                    ),
                )
            prev = idx if idx is not None else prev
    assert got == expected


@given(docs=_ssj_corpus)
@WIDE
def _prop_containment_join_exact_vs_brute_force(spark, docs):
    """One-sided prefix filtering may only PRUNE non-qualifying ordered
    pairs: every (a, b), a != b, with |A∩B|/|A| >= 7/10 on 2-gram
    shingle sets must be emitted with the exact intersection size, and
    nothing below threshold may appear. The tiny alphabet forces heavy
    shingle collisions and many full containments (short docs inside
    longer ones) — the asymmetric cases Jaccard-side tests never hit."""
    from reddit_data_pipeline_engineering_spark.operators import setsim

    n = 2
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): (r.n_inter, r.na)
        for r in setsim.containment_join(
            df, "text", "doc_id", shingle_len=n, t_num=7, t_den=10
        ).collect()
    }

    def shingles(text):
        toks = text.split()
        return {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }

    sets = {i: shingles(t) for i, t in enumerate(docs)}
    expected = {}
    for i in sorted(sets):
        for j in sorted(sets):
            if i == j or not sets[i] or not sets[j]:
                continue
            inter = len(sets[i] & sets[j])
            if inter * 10 >= 7 * len(sets[i]):
                expected[(i, j)] = (inter, len(sets[i]))
    assert got == expected


wedges_st = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15), st.integers(1, 9)),
    min_size=1,
    max_size=45,
).filter(lambda es: any(a != b for a, b, _ in es))


@given(edges=wedges_st, rounds=st.integers(1, 4))
@WIDE
def _prop_sssp_bounded_relaxation_property(spark, edges, rounds):
    """Frontier-pruned Bellman-Ford == textbook full relaxation after
    every round, on arbitrary weighted digraphs (parallel edges and
    self-loops included; source fixed at the smallest endpoint)."""
    from reddit_data_pipeline_engineering_spark.operators import bfs

    source = min(min(a, b) for a, b, _ in edges)
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {
        r.node: r.dist
        for r in bfs.sssp_distances(df, source, rounds).collect()
    }

    dist = {source: 0}
    for _ in range(rounds):
        nxt = dict(dist)
        for a, b, w in edges:
            if a in dist and dist[a] + w < nxt.get(b, float("inf")):
                nxt[b] = dist[a] + w
        dist = nxt
    assert got == dist


# --------------------------------------------------------------------------
# Concurrent execution (VERDICT r06 #7, the parity/streaming fixture
# pattern): every property above is an independent chain of small Spark
# jobs, so a module fixture runs ALL of them over a thread pool — Spark
# accepts concurrent job submission from driver threads — and the
# parametrized test re-raises each recorded outcome, preserving per-test
# reporting. Each worker calls the @given-decorated function directly,
# which runs its full hypothesis search exactly as pytest would.
# --------------------------------------------------------------------------

import pytest as _pytest
from concurrent.futures import ThreadPoolExecutor as _TPE

_PROPERTY_CASES = {
    "window_dedup_properties": _prop_window_dedup_properties,
    "pivot_unpivot_roundtrip_property": _prop_pivot_unpivot_roundtrip_property,
    "aqi_subindex_monotone_property": _prop_aqi_subindex_monotone_property,
    "pack_sequences_properties": _prop_pack_sequences_properties,
    "scrub_pii_idempotent": _prop_scrub_pii_idempotent,
    "selection_median_property": _prop_selection_median_property,
    "star_components_property": _prop_star_components_property,
    "hash_split_membership_invariant_across_sf": _prop_hash_split_membership_invariant_across_sf,
    "triangle_count_partitioning_invariant": _prop_triangle_count_partitioning_invariant,
    "weighted_median_crossing_matches_brute_force": _prop_weighted_median_crossing_matches_brute_force,
    "setsim_prefix_join_exact_vs_brute_force": _prop_setsim_prefix_join_exact_vs_brute_force,
    "kcore_peel_random_graphs": _prop_kcore_peel_random_graphs,
    "lpa_random_graphs": _prop_lpa_random_graphs,
    "setsim_cosine_join_exact_vs_brute_force": _prop_setsim_cosine_join_exact_vs_brute_force,
    "duplicate_spans_match_bruteforce": _prop_duplicate_spans_match_bruteforce,
    "containment_join_exact_vs_brute_force": _prop_containment_join_exact_vs_brute_force,
    "sssp_bounded_relaxation_property": _prop_sssp_bounded_relaxation_property,
}


@_pytest.fixture(scope="module")
def property_outcomes(spark):
    def run(fn):
        try:
            fn(spark)
            return None
        except BaseException as exc:  # noqa: BLE001 - re-raised per test
            return exc

    with _TPE(max_workers=8) as ex:
        return dict(
            zip(_PROPERTY_CASES, ex.map(run, _PROPERTY_CASES.values()))
        )


@_pytest.mark.parametrize("name", list(_PROPERTY_CASES))
def test_property_case(name, property_outcomes):
    res = property_outcomes[name]
    if res is not None:
        raise res
