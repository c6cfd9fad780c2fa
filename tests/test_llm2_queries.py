"""Brute-force replay for the BPE encode-apply query: an independent
pure-python BPE (Counter-based pair counting, left-to-right
non-overlapping rewrite) learns the same 3 merges and encodes the same
corpus, so a shared misconception between the Spark plan and the
DuckDB oracle cannot hide.
"""

from collections import Counter

import duckdb

from reddit_data_pipeline_engineering_spark.plans.queries import REGISTRY, queries

from .conftest import SF_SMALL

queries()  # force registration


def _python_bpe(docs, iters=3):
    """(merges, encoded_symbol_count_per_word) replay."""
    vocab = Counter()
    for _, text in docs:
        vocab.update(text.split(" "))
    spelled = {w: " ".join(w) + " </w>" for w in vocab}
    merges = []
    for _ in range(iters):
        pairs = Counter()
        for w, f in vocab.items():
            syms = spelled[w].split(" ")
            for i in range(len(syms) - 1):
                pairs[f"{syms[i]} {syms[i + 1]}"] += f
        # argmax: count desc, pair asc (the queries' tiebreak)
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merged = best.replace(" ", "")
        merges.append(best)
        for w in spelled:
            padded = f" {spelled[w]} "
            spelled[w] = padded.replace(
                f" {best} ", f" {merged} "
            ).strip()
    return merges, {w: len(s.split(" ")) for w, s in spelled.items()}


def test_bpe_encode_apply_matches_python(spark):
    docs = duckdb.sql(
        f"SELECT source, text FROM '{SF_SMALL}/documents.parquet'"
    ).fetchall()
    _, n_sym = _python_bpe(docs)
    per_src = {}
    for src, text in docs:
        agg = per_src.setdefault(src, [0, 0, 0])  # tokens, before, after
        for w in text.split(" "):
            agg[0] += 1
            agg[1] += len(w) + 1
            agg[2] += n_sym[w]
    out = REGISTRY["bpe_encode_apply"].fn(spark, SF_SMALL).collect()
    got = {
        r["source"]: (
            r["n_tokens"], r["sym_before"], r["sym_after"],
            r["compression_bp"],
        )
        for r in out
    }
    expect = {
        src: (t, b, a, a * 10000 // b) for src, (t, b, a) in per_src.items()
    }
    assert got == expect
    # the learned merges actually compress (strictly fewer symbols)
    assert all(a < b for (_, b, a, _) in got.values())


def test_source_overlap_matrix_matches_python(spark):
    import hashlib

    docs = duckdb.sql(
        f"SELECT source, text FROM '{SF_SMALL}/documents.parquet'"
    ).fetchall()
    fps = {}
    for src, text in docs:
        h = hashlib.md5(
            " ".join(text.split(" ")[:10]).encode()
        ).hexdigest()
        fps.setdefault(src, set()).add(h)
    srcs = sorted(fps)
    expect = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            shared = len(fps[a] & fps[b])
            if shared:
                expect[(a, b)] = (
                    shared, len(fps[a]), len(fps[b]),
                    shared * 10000 // min(len(fps[a]), len(fps[b])),
                )
    out = REGISTRY["source_overlap_matrix"].fn(spark, SF_SMALL).collect()
    got = {
        (r["src_a"], r["src_b"]): (
            r["n_shared"], r["n_a"], r["n_b"], r["containment_bp"]
        )
        for r in out
    }
    assert got == expect
    assert len(got) > 0  # the fixture actually shares content


def test_incremental_lsh_dedup_matches_python(spark):
    import hashlib

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    docs = duckdb.sql(
        f"SELECT doc_id, source, text FROM '{SF_SMALL}/documents.parquet'"
    ).fetchall()
    # mirror: tokens -> distinct 2-shingles -> sig_k = min md5(f"{k}|sh")
    sigs, meta = {}, {}
    for doc_id, source, text in docs:
        toks = [t for t in text.split() if t]
        sh = {
            " ".join(toks[i : i + 2]) for i in range(max(0, len(toks) - 1))
        }
        sigs[doc_id] = [
            min(md5(f"{k}|{s}") for s in sh) for k in range(8)
        ]
        is_new = int(md5(str(doc_id))[:8], 16) % 100 >= 80
        meta[doc_id] = (source, is_new)
    buckets = {}
    for d, sg in sigs.items():
        for b in range(4):
            key = (b, md5(f"{sg[2 * b]}|{sg[2 * b + 1]}"))
            buckets.setdefault(key, []).append(d)
    partners = {}
    for ids in buckets.values():
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                partners.setdefault(a, set()).add(b)
                partners.setdefault(b, set()).add(a)
    agg = {}
    for d, (src, is_new) in meta.items():
        if not is_new:
            continue
        ps = partners.get(d, set())
        hh = any(not meta[p][1] for p in ps)
        hsn = any(meta[p][1] and p < d for p in ps)
        n, dh, dw, ing = agg.get(src, (0, 0, 0, 0))
        agg[src] = (
            n + 1,
            dh + int(hh),
            dw + int(not hh and hsn),
            ing + int(not hh and not hsn),
        )
    out = REGISTRY["incremental_lsh_dedup"].fn(spark, SF_SMALL).collect()
    got = {
        r["source"]: (
            r["n_new"], r["n_dup_history"], r["n_dup_within"],
            r["n_ingested"],
        )
        for r in out
    }
    assert got == agg
    # the screen finds real history near-dups in the fixture
    assert sum(v[1] for v in got.values()) > 0
