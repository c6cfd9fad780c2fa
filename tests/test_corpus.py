"""Corpus-preparation operators: decontamination, packing, mixing.

Constructed-data unit tests; the registry queries over the parquet tables
are covered by test_oracle_parity.py like everything else.
"""

from pyspark.sql import functions as F

from reddit_data_pipeline_engineering_spark.operators import corpus


def _docs(spark):
    rows = [
        # doc 0 is the "benchmark"; doc 10 copies it verbatim, doc 11
        # shares nothing, doc 12 shares exactly one 3-gram.
        (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (10, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (11, "one two three four five six seven eight nine ten"),
        (12, "alpha beta gamma completely different words follow here now"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_benchmark_overlap_flags_copies(spark):
    out = corpus.benchmark_overlap(
        _docs(spark),
        "text",
        "doc_id",
        bench_pred=F.col("doc_id") == 0,
        shingle_len=3,
        min_overlap=5,
    )
    got = {r["doc_id"]: (r["n_overlap"], r["contaminated"]) for r in out.collect()}
    assert got[10] == (8, True)  # 10 tokens -> 8 distinct 3-grams, all shared
    assert got[11] == (0, False)
    assert got[12] == (1, False)  # only 'alpha beta gamma'


def test_pack_sequences_offset_binning(spark):
    rows = [(i, "g", 100) for i in range(6)]  # 100 tokens each, budget 256
    df = spark.createDataFrame(rows, ["doc_id", "grp", "n_tokens"])
    packed = corpus.pack_sequences(
        df, "n_tokens", "doc_id", max_tokens=256, partition_cols=["grp"]
    )
    got = {r["doc_id"]: r["pack_id"] for r in packed.collect()}
    # starts at 0,100,200,300,400,500 -> floor(/256) = 0,0,0,1,1,1
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1}


def test_mix_plan_uniform_quota_and_apply(spark):
    rows = [(i, "big" if i < 80 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    plan = corpus.source_mix_plan(df, "source")
    got = {r["source"]: r for r in plan.collect()}
    assert got["big"]["quota"] == 50 and got["small"]["quota"] == 50
    assert got["small"]["keep_rate"] == 1.0
    assert 0 < got["big"]["keep_rate"] < 1.0

    kept = corpus.apply_mix_plan(df, plan, "source", "doc_id")
    counts = {r["source"]: r["n"] for r in
              kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["small"] == 20  # rate 1.0 keeps everything
    assert counts["big"] <= 80
    # Deterministic: a rerun keeps the exact same ids.
    again = corpus.apply_mix_plan(df, plan, "source", "doc_id")
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_benchmark_overlap_broadcasts_bench_dim(spark):
    plan = corpus.benchmark_overlap(
        _docs(spark), "text", "doc_id", bench_pred=F.col("doc_id") == 0
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_chunk_documents_roundtrip(spark):
    """Chunks reassembled in chunk_idx order reproduce every document
    exactly (no word lost/duplicated at chunk boundaries), including a
    doc shorter than one chunk and one at an exact chunk multiple."""
    from pyspark.sql import functions as F

    from reddit_data_pipeline_engineering_spark.operators.corpus import (
        chunk_documents,
    )

    rows = [
        (1, "a b c"),                                   # < 1 chunk
        (2, " ".join(f"w{i}" for i in range(20))),      # exactly 2 chunks
        (3, " ".join(f"x{i}" for i in range(25))),      # ragged tail
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    chunks = chunk_documents(docs, "text", "doc_id", chunk_words=10)
    back = (
        chunks.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_idx", "chunk_text"))
                    ),
                    lambda s: s.chunk_text,
                ),
                " ",
            ).alias("rebuilt")
        )
    )
    joined = docs.join(back, "doc_id").collect()
    assert len(joined) == 3
    for r in joined:
        assert r.rebuilt == r.text, r.doc_id


def test_duplicate_spans_merges_adjacent_windows(spark):
    """Hand-built corpus: doc 1 and doc 2 share chunks 1-2 (one maximal
    2-chunk span each), doc 3 repeats doc 1's chunk 4 (a second,
    separate 1-chunk span for doc 1 — non-adjacent duplicates must NOT
    merge), and doc 4 is fully unique (no span row at all)."""
    from pyspark.sql import functions as F

    from reddit_data_pipeline_engineering_spark.operators.corpus import (
        duplicate_spans,
    )

    w = lambda tag, n: " ".join(f"{tag}{n}_{i}" for i in range(10))
    shared12 = w("s", 1) + " " + w("s", 2)   # chunks shared by docs 1+2
    rep4 = w("r", 4)                          # chunk shared by docs 1+3
    rows = [
        (1, w("a", 0) + " " + shared12 + " " + w("a", 3) + " " + rep4),
        (2, w("b", 0) + " " + shared12),
        (3, rep4 + " " + w("c", 1)),
        (4, w("d", 0) + " " + w("d", 1)),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    spans = duplicate_spans(docs, "text", "doc_id", chunk_words=10)
    got = {
        (r.doc_id, r.span_start): (r.span_chunks, r.span_chars)
        for r in spans.collect()
    }
    # doc 1: chunks 1-2 merge into one span; chunk 4 is its own span.
    assert got[(1, 1)][0] == 2
    assert got[(1, 4)][0] == 1
    # doc 2: chunks 1-2; doc 3: chunk 0. doc 4: absent.
    assert got[(2, 1)][0] == 2
    assert got[(3, 0)][0] == 1
    assert len(got) == 4
    # span_chars = sum of chunk text lengths (joining spaces not counted).
    assert got[(1, 1)][1] == len(w("s", 1)) + len(w("s", 2))


def test_duplicate_spans_rotated_windows_boundary(spark):
    """Adversarial boundary case (VERDICT r04 #8): two documents share
    only a ROTATED window sequence. (a) A = w1 w2, B = w2 w1: every
    chunk is duplicated and adjacent, so each doc reports exactly ONE
    maximal 2-chunk span — merging across differently-ordered copies is
    the documented 'text that exists elsewhere' semantics, and the span
    must not exceed the document. (b) With a unique chunk interposed
    (A = w1 u w2, B = w2 x w1) the duplicated windows are NOT adjacent,
    so they must stay two separate 1-chunk spans — rotation must never
    bridge across unique text."""
    from reddit_data_pipeline_engineering_spark.operators.corpus import (
        duplicate_spans,
    )

    w = lambda tag: " ".join(f"{tag}_{i}" for i in range(10))
    w1, w2, u, x = w("w1"), w("w2"), w("u"), w("x")

    adj = spark.createDataFrame(
        [(1, w1 + " " + w2), (2, w2 + " " + w1)], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.span_start): r.span_chunks
        for r in duplicate_spans(adj, "text", "doc_id", chunk_words=10).collect()
    }
    assert got == {(1, 0): 2, (2, 0): 2}

    gap = spark.createDataFrame(
        [(1, w1 + " " + u + " " + w2), (2, w2 + " " + x + " " + w1)],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.span_start): r.span_chunks
        for r in duplicate_spans(gap, "text", "doc_id", chunk_words=10).collect()
    }
    assert got == {(1, 0): 1, (1, 2): 1, (2, 0): 1, (2, 2): 1}


def test_bpe_merges_match_reference_fold(spark):
    """The Spark BPE rounds (pair count -> argmax -> broadcast replace)
    must learn the same merges, in the same order, as a plain-Python BPE
    over the same vocabulary — including the count-desc/pair-asc
    tiebreak and left-to-right non-overlapping replacement."""
    from collections import Counter

    from pyspark.sql import functions as F

    from reddit_data_pipeline_engineering_spark.plans.queries_llm2 import (
        _bpe_apply,
        _bpe_best,
    )

    vocab = {"aaab": 3, "abab": 2, "bbb": 4, "aab": 1}

    def ref_merges(vocab, iters):
        spelled = {w: list(w) + ["</w>"] for w in vocab}
        out = []
        for _ in range(iters):
            pairs = Counter()
            for w, syms in spelled.items():
                for i in range(len(syms) - 1):
                    pairs[(syms[i], syms[i + 1])] += vocab[w]
            best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            out.append((" ".join(best), "".join(best),
                        pairs[best]))
            for w, syms in spelled.items():
                ns, i = [], 0
                while i < len(syms):
                    if (i + 1 < len(syms)
                            and (syms[i], syms[i + 1]) == best):
                        ns.append("".join(best))
                        i += 2
                    else:
                        ns.append(syms[i])
                        i += 1
                spelled[w] = ns
        return out

    expected = ref_merges(vocab, 3)

    df = spark.createDataFrame(list(vocab.items()), "word string, freq long")
    spelled = df.select(
        "word",
        "freq",
        F.concat(
            F.regexp_replace("word", "(.)", "$1 "), F.lit("</w>")
        ).alias("spelled"),
    )
    got = []
    for _ in range(3):
        best = _bpe_best(spelled)
        r = best.head()
        got.append((r.pair, r.merged, r.cnt))
        spelled = _bpe_apply(spelled, best)
    assert got == expected


def test_weighted_sample_is_size_biased():
    """Efraimidis-Spirakis with priority = u/w must over-select heavy
    items: on the deterministic sf0.001 fixture the pooled sampled-doc
    mean length clearly exceeds the corpus mean (per-stratum k=5 is too
    small for a per-stratum guarantee — one stratum sits ~3% under)."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    rows = con.execute("""
        WITH pr AS (
          SELECT lang, n_chars,
                 (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                  % 1000000) * 1000000 // n_chars AS priority,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                                              % 1000000) * 1000000 // n_chars,
                                             doc_id) AS rn
          FROM documents
        )
        SELECT AVG(CASE WHEN rn <= 5 THEN n_chars END) AS samp_mean,
               AVG(n_chars) AS corpus_mean
        FROM pr
    """).fetchall()
    (samp_mean, corpus_mean), = rows
    assert samp_mean > corpus_mean * 1.15, (samp_mean, corpus_mean)


def test_simhash_hamming_pairs_brute_force(spark):
    """Banded candidate generation must find EVERY pair within the
    hamming radius (pigeonhole recall guarantee) and verify distances
    exactly — checked against an all-pairs popcount scan on synthetic
    signatures engineered around the band boundaries."""
    from reddit_data_pipeline_engineering_spark.operators.text_dedup import (
        simhash_hamming_pairs,
    )

    base = 0x0123456789AB  # 48-bit
    sigs = [
        (1, base),
        (2, base ^ 0b111),            # hamming 3 in band 0 -> found
        (3, base ^ (1 << 13)),        # hamming 1 in band 1 -> found
        (4, base ^ 0b11 ^ (1 << 13) ^ (1 << 25)),  # h=4, spread -> out
        (5, base ^ ((1 << 12) | (1 << 24) | (1 << 36))),  # h=3 across 3 bands
        (6, 0xFFFFFFFFFFFF),          # far from everything
        (7, base),                    # exact duplicate of 1
    ]
    df = spark.createDataFrame(sigs, "doc_id long, simhash long")
    got = {
        (r["id_a"], r["id_b"]): (r["hamming"], r["n_bands"])
        for r in simhash_hamming_pairs(df, "doc_id").collect()
    }
    expected = {}
    for i, (ida, sa) in enumerate(sigs):
        for idb, sb in sigs[i + 1:]:
            h = bin(sa ^ sb).count("1")
            shared = sum(
                (sa >> (b * 12)) & 0xFFF == (sb >> (b * 12)) & 0xFFF
                for b in range(4)
            )
            if h <= 3:
                assert shared >= 1  # the pigeonhole guarantee itself
                expected[(ida, idb)] = (h, shared)
    assert got == expected
    assert got[(1, 7)] == (0, 4)   # exact dup matches all bands
    assert got[(1, 2)][0] == 3
    assert (1, 4) not in got and (1, 6) not in got


def test_simhash_bucket_cap_drops_hot_buckets(spark):
    """SimHash bits correlate on homogeneous corpora, so hot buckets are
    quadratic traps — above max_bucket they must be dropped from
    candidate generation (observed in-plan), while small clusters keep
    their pairs."""
    from reddit_data_pipeline_engineering_spark.operators.text_dedup import (
        simhash_hamming_pairs,
    )

    base = 0x0123456789AB
    # a 5-member exact cluster (kept) + an 80-member cluster (dropped)
    sigs = [(i, base) for i in range(5)]
    sigs += [(100 + i, 0x0FEDCBA98765) for i in range(80)]
    df = spark.createDataFrame(sigs, "doc_id long, simhash long")
    got = {
        (r["id_a"], r["id_b"])
        for r in simhash_hamming_pairs(df, "doc_id", max_bucket=64).collect()
    }
    assert got == {(a, b) for a in range(5) for b in range(5) if a < b}
    # uncapped, the hot cluster's pairs come back
    uncapped = simhash_hamming_pairs(df, "doc_id", max_bucket=None).count()
    assert uncapped == 10 + 80 * 79 // 2

    # ADVICE r06: the dropped buckets are surfaced as a companion
    # DataFrame, so a batch caller detects recall loss with a plain
    # count — no QueryExecutionListener. The 80-member cluster collides
    # in all 4 bands -> 4 dropped (band_id, bucket) rows of 80 members.
    pairs, dropped = simhash_hamming_pairs(
        df, "doc_id", max_bucket=64, with_dropped_buckets=True
    )
    drows = dropped.collect()
    assert len(drows) == 4
    assert all(r["n_members"] == 80 for r in drows)
    assert {(r["id_a"], r["id_b"]) for r in pairs.collect()} == got
    # uncapped: companion is empty by construction
    _, dropped_none = simhash_hamming_pairs(
        df, "doc_id", max_bucket=None, with_dropped_buckets=True
    )
    assert dropped_none.count() == 0


def test_jaccard_dropped_shingles_companion(spark):
    """Same recall accounting for the jaccard stop-shingle cap: the
    capped (shingle, n_docs) rows surface as a companion DataFrame, so
    batch callers see which shingles stopped contributing to
    intersection counts."""
    from reddit_data_pipeline_engineering_spark.operators.text_dedup import (
        jaccard_candidate_pairs,
    )

    # 6 docs all share the stop-shingle "the end"; docs 0/1 also share
    # the rare "alpha beta".
    docs = [(0, "alpha beta the end"), (1, "alpha beta the end")]
    docs += [(i, f"tok{i} filler the end") for i in range(2, 6)]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    pairs, dropped = jaccard_candidate_pairs(
        df, "text", "doc_id", shingle_len=2, max_shingle_freq=4,
        with_dropped_shingles=True,
    )
    drows = {(r["shingle"], r["n_docs"]) for r in dropped.collect()}
    assert drows == {("the end", 6)}
    got = {(r["id_a"], r["id_b"]): r["n_common"] for r in pairs.collect()}
    # "the end" no longer contributes: 0-1 share alpha beta + beta the
    # (both under the cap); no other pair survives.
    assert got[(0, 1)] == 2
    for (a, b), n in got.items():
        assert (a, b) == (0, 1) or n < 2

    # uncapped: companion empty, intersections include the stop-shingle
    pairs_u, dropped_u = jaccard_candidate_pairs(
        df, "text", "doc_id", shingle_len=2, max_shingle_freq=None,
        with_dropped_shingles=True,
    )
    assert dropped_u.count() == 0
    got_u = {
        (r["id_a"], r["id_b"]): r["n_common"] for r in pairs_u.collect()
    }
    # doc0 shingles: alpha beta / beta the / the end — all 3 shared
    assert got_u[(0, 1)] == 3


def test_split_leakage_audit_matches_brute_force(spark):
    """Third independent leakage audit: hashlib fingerprints + the
    md5-bucket split replayed in pure Python over the sf0.001 corpus."""
    import hashlib

    import pyarrow.parquet as pq
    from collections import defaultdict

    from reddit_data_pipeline_engineering_spark.plans.queries import (
        REGISTRY,
        queries,
    )

    queries()
    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    ).to_pylist()

    def split_of(doc_id):
        b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100
        return "train" if b < 80 else "val" if b < 90 else "test"

    groups = defaultdict(lambda: [0, 0, set()])  # h -> [train, eval, splits]
    for d in docs:
        h = hashlib.md5(" ".join(d["text"].split(" ")[:10]).encode()).hexdigest()
        s = split_of(d["doc_id"])
        g = groups[h]
        g[0] += s == "train"
        g[1] += s != "train"
        g[2].add(s)
    n_leaky = sum(1 for g in groups.values() if len(g[2]) > 1)
    docs_leaky = sum(g[0] + g[1] for g in groups.values() if len(g[2]) > 1)
    eval_leaked = sum(g[1] for g in groups.values() if g[0] > 0)
    n_eval = sum(g[1] for g in groups.values())
    row = REGISTRY["split_leakage_audit"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert row["n_groups"] == len(groups)
    assert row["n_leaky_groups"] == n_leaky
    assert row["n_docs"] == len(docs)
    assert row["n_docs_in_leaky_groups"] == docs_leaky
    assert row["n_eval_docs_leaked"] == eval_leaked
    assert row["eval_leak_bps"] == eval_leaked * 10000 // n_eval
    # the audit has teeth on this corpus: duplicates exist, so some must
    # span splits
    assert row["n_leaky_groups"] > 0


def test_neyman_allocation_matches_python(spark):
    import hashlib
    import math

    import duckdb

    from reddit_data_pipeline_engineering_spark.plans.queries import (
        REGISTRY,
        queries,
    )
    from reddit_data_pipeline_engineering_spark.plans.queries_prep import (
        _NEYMAN_BUDGET,
    )

    from .conftest import SF_SMALL

    queries()
    out = {
        r["source"]: (
            r["n_docs"], int(r["var_num"]), r["w"], r["alloc_n"],
            r["n_sampled"],
        )
        for r in REGISTRY["neyman_allocation_sample"].fn(spark, SF_SMALL).collect()
    }
    docs = duckdb.sql(
        f"SELECT doc_id, source, text FROM '{SF_SMALL}/documents.parquet'"
    ).fetchall()
    per = {}
    for doc_id, src, text in docs:
        x = len([t for t in text.split() if t])
        per.setdefault(src, []).append((doc_id, x))
    stats = {}
    for src, rows in per.items():
        n = len(rows)
        sx = sum(x for _, x in rows)
        sxx = sum(x * x for _, x in rows)
        var_num = n * sxx - sx * sx
        w = n * math.floor(math.sqrt(var_num))
        stats[src] = (n, var_num, w)
    w_tot = sum(w for _, _, w in stats.values())
    expect = {}
    for src, (n, var_num, w) in stats.items():
        alloc = _NEYMAN_BUDGET * w // w_tot
        thr = (alloc * 1_000_000 + n - 1) // n
        sampled = sum(
            1
            for doc_id, _ in per[src]
            if int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
            % 1_000_000
            < thr
        )
        expect[src] = (n, var_num, w, alloc, sampled)
    assert out == expect
    # Neyman gives MORE budget to high-variance strata per doc: the
    # allocation is not simply proportional to size everywhere
    allocs = {s: v[3] for s, v in expect.items()}
    sizes = {s: v[0] for s, v in expect.items()}
    assert len(set(allocs.values())) > 1 or len(set(sizes.values())) > 1
