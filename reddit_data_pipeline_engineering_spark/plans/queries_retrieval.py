"""Retrieval-quality operators: BM25 ranking, reciprocal-rank fusion,
and n-gram language-model familiarity scoring.

These extend the LLM-pipeline surface (SURVEY.md §2 extensions) with the
three retrieval/scoring shapes a training-data pipeline runs between
dedup and packing:

- ``bm25_topk`` — lexical retrieval over the corpus (Robertson-Spärck
  Jones BM25, the standard sparse baseline every dense retriever is
  evaluated against).
- ``rrf_fusion_topk`` — reciprocal-rank fusion (Cormack et al.,
  SIGIR'09) of two retrieval rankings; the canonical hybrid-search
  combine step.
- ``bigram_lm_familiarity`` — CCNet-style LM quality scoring (Wenzek et
  al. 2020): train an n-gram model on one hash-split, score the other;
  low-familiarity documents are the "unnatural text" a quality filter
  drops.

All scores are integer-scaled (the tfidf_topk_terms convention) so the
DuckDB oracle replays the exact arithmetic: both engines floor-divide
positive BIGINTs identically, and no float ordering enters any ranking.
At extreme corpus sizes (model totals beyond ~1e12) the scaled products
should move to DECIMAL(38,0)/HUGEINT — a type swap, not a plan change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from reddit_data_pipeline_engineering_spark.functions.vectors import cosine, dot
from reddit_data_pipeline_engineering_spark.plans.queries import REGISTRY, query
from reddit_data_pipeline_engineering_spark.plans.queries_llm import (
    _query_vector,
    _sql_dot,
)
from reddit_data_pipeline_engineering_spark.sources.tables import load_table, spread

__all__ = ["REGISTRY"]


# --------------------------------------------------------------------------
# BM25 top-k. k1 = 1.2 = 6/5, b = 0.75 = 3/4 (the textbook defaults),
# cleared of float division by multiplying the per-term numerator and
# denominator by 10·W (W = total corpus tokens):
#
#   tf_sat = tf·(k1+1) / (tf + k1·(1 − b + b·L/avgdl))    avgdl = W/N
#          = 22000·tf·W // (10·W·tf + 3·W + 9·L·N)        (scaled ×1000)
#   score  = Σ_q idf_scaled · tf_sat,  idf_scaled = N·10000 // df
#
# Plan shape: one corpus scan explodes tokens and keeps only the query
# terms (a 3-element IN filter — the explode output is pruned before any
# shuffle), one (doc, term) count shuffle, document-frequency dim and
# corpus scalars broadcast, TakeOrderedAndProject for the top-k. The
# second scan is the two-scalar corpus profile (N, W) — map-only.
# --------------------------------------------------------------------------

_BM25_TERMS = ("join", "hash", "dup")
_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)

_BM25_ORACLE = f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
words AS (
  SELECT doc_id, len(t) AS l, t[i] AS word
  FROM tok, UNNEST(generate_series(1, len(t))) s(i)
),
hits AS (
  SELECT doc_id, word, MAX(l) AS l, COUNT(*) AS tf
  FROM words WHERE word IN ({_BM25_TERMS_SQL})
  GROUP BY doc_id, word
),
dfreq AS (SELECT word, COUNT(*) AS df FROM hits GROUP BY word),
scal AS (
  SELECT COUNT(*) AS n_docs, CAST(SUM(len(t)) AS BIGINT) AS w_total
  FROM tok
)
SELECT h.doc_id,
       CAST(MAX(h.l) AS BIGINT) AS doc_len,
       CAST(COUNT(*) AS BIGINT) AS n_terms,
       CAST(SUM((s.n_docs * 10000 // d.df)
                * ((22000 * h.tf * s.w_total)
                   // (10 * s.w_total * h.tf + 3 * s.w_total
                       + 9 * h.l * s.n_docs))) AS BIGINT) AS bm25_scaled
FROM hits h JOIN dfreq d USING (word), scal s
GROUP BY h.doc_id
ORDER BY bm25_scaled DESC, h.doc_id
LIMIT 20
"""


@query(
    "bm25_topk",
    _BM25_ORACLE,
    "BM25 lexical retrieval (k1=1.2, b=0.75) for a 3-term query: token "
    "explode pruned to the query terms before the one (doc, term) "
    "shuffle, df dim + corpus scalars broadcast, integer-scaled "
    "saturation (22000·tf·W div (10·W·tf + 3·W + 9·L·N)) so the ranking "
    "is engine-exact, TakeOrderedAndProject top-20",
    tags=("llm", "text", "retrieval", "bench"),
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    tok = docs.select("doc_id", F.split("text", " ").alias("t"))
    words = tok.select(
        "doc_id", F.size("t").alias("l"), F.explode("t").alias("word")
    )
    hits = words.filter(F.col("word").isin(*_BM25_TERMS))
    tf = hits.groupBy("doc_id", "word").agg(
        F.max("l").alias("l"), F.count(F.lit(1)).alias("tf")
    )
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    scal = tok.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("t")).cast("long").alias("w_total"),
    )
    scored = (
        tf.join(F.broadcast(dfreq), "word")
        .crossJoin(F.broadcast(scal))
        .withColumn(
            "term_score",
            F.expr(
                "((n_docs * 10000) div df)"
                " * ((22000 * tf * w_total)"
                "    div (10 * w_total * tf + 3 * w_total + 9 * l * n_docs))"
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.max("l").cast("long").alias("doc_len"),
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("term_score").cast("long").alias("bm25_scaled"),
        )
        .orderBy(F.desc("bm25_scaled"), "doc_id")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Reciprocal-rank fusion of two rankings (cosine and raw dot product)
# against the designated query vector. Each ranking is a distributed
# TakeOrderedAndProject top-100 — the single-partition row_number window
# then runs over exactly 100 rows (bounded at ANY corpus size; the
# global-window-over-the-corpus formulation would not scale and is
# deliberately avoided). RRF score = Σ 1_000_000 // (60 + rank), the
# k=60 constant from Cormack et al.
# --------------------------------------------------------------------------

_RRF_K = 60
_RRF_SCALE = 1_000_000
_RRF_DEPTH = 100

_RRF_ORACLE = f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
s AS (
  SELECT e.vec_id,
         ROUND(({_sql_dot('e.embedding', 'q.qe')})
               / (sqrt({_sql_dot('e.embedding', 'e.embedding')})
                  * sqrt({_sql_dot('q.qe', 'q.qe')})), 6) AS cosine,
         ROUND({_sql_dot('e.embedding', 'q.qe')}, 6) AS dotp
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> 0
),
ra AS (
  SELECT vec_id, row_number() OVER (ORDER BY cosine DESC, vec_id) AS r
  FROM s QUALIFY r <= {_RRF_DEPTH}
),
rb AS (
  SELECT vec_id, row_number() OVER (ORDER BY dotp DESC, vec_id) AS r
  FROM s QUALIFY r <= {_RRF_DEPTH}
)
SELECT vec_id,
       CAST(COALESCE(ra.r, 0) AS BIGINT) AS rank_cos,
       CAST(COALESCE(rb.r, 0) AS BIGINT) AS rank_dot,
       CAST(COALESCE({_RRF_SCALE} // ({_RRF_K} + ra.r), 0)
            + COALESCE({_RRF_SCALE} // ({_RRF_K} + rb.r), 0) AS BIGINT)
         AS rrf_scaled
FROM ra FULL JOIN rb USING (vec_id)
ORDER BY rrf_scaled DESC, vec_id
LIMIT 20
"""


def _ranked_topk(scored: DataFrame, score_col: str, depth: int) -> DataFrame:
    """Top-``depth`` by (score desc, vec_id) with 1-based rank attached.

    The limit is a distributed TakeOrderedAndProject; the rank window
    runs single-partition over the ``depth`` surviving rows only.
    """
    top = scored.orderBy(F.desc(score_col), "vec_id").limit(depth)
    w = Window.orderBy(F.desc(score_col), "vec_id")
    return top.select(
        "vec_id", F.row_number().over(w).cast("long").alias("r")
    )


@query(
    "rrf_fusion_topk",
    _RRF_ORACLE,
    "Reciprocal-rank fusion (Cormack SIGIR'09, k=60) of the cosine and "
    "dot-product rankings vs the query vector: each ranking is a "
    "distributed top-100 (TakeOrderedAndProject) with the rank window "
    "over only the 100 survivors, full-outer fuse on vec_id, integer "
    "1e6 div (60+rank) scoring, top-20 out",
    tags=("llm", "similarity", "retrieval", "bench"),
)
def q_rrf_fusion_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qv = F.array(*[F.lit(float(x)) for x in _query_vector(emb)])
    cand = emb.filter(F.col("vec_id") != 0)
    scored = cand.select(
        "vec_id",
        F.round(cosine(F.col("embedding"), qv), 6).alias("cosine"),
        F.round(dot(F.col("embedding"), qv), 6).alias("dotp"),
    )
    ra = _ranked_topk(scored, "cosine", _RRF_DEPTH)
    rb = _ranked_topk(scored, "dotp", _RRF_DEPTH)
    fused = ra.withColumnRenamed("r", "ra").join(
        rb.withColumnRenamed("r", "rb"), "vec_id", "full_outer"
    )
    return (
        fused.select(
            "vec_id",
            F.coalesce("ra", F.lit(0)).cast("long").alias("rank_cos"),
            F.coalesce("rb", F.lit(0)).cast("long").alias("rank_dot"),
            (
                F.coalesce(
                    F.expr(f"{_RRF_SCALE} div ({_RRF_K} + ra)"), F.lit(0)
                )
                + F.coalesce(
                    F.expr(f"{_RRF_SCALE} div ({_RRF_K} + rb)"), F.lit(0)
                )
            )
            .cast("long")
            .alias("rrf_scaled"),
        )
        .orderBy(F.desc("rrf_scaled"), "vec_id")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Bigram LM familiarity (CCNet-style quality scoring). The 80% md5
# hash-split trains a word-bigram count model; the held-out 20% is
# scored by mean scaled bigram probability:
#
#   p_scaled(bg) = model_count(bg) · 1e9 // model_total   (0 if unseen)
#   familiarity  = Σ p_scaled over the doc's bigrams // n_bigrams
#
# Per-bigram integer division BEFORE the per-doc sum keeps every
# intermediate under n_bigrams·1e9 — no overflow at any document length.
# The doc-bigrams ⋈ model join is a plain hash join on the bigram string
# (the model side is vocabulary-bounded here but corpus-sized in
# general — NOT broadcast by construction; AQE picks broadcast when the
# model happens to be small). Output is the bounded per-source profile.
# --------------------------------------------------------------------------

_LM_SCALE = 1_000_000_000

_BIGRAM_LM_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, source, string_split(text, ' ') AS t,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
           AS b
  FROM documents
),
bg AS (
  SELECT doc_id, source, b, t[i] || ' ' || t[i + 1] AS bigram
  FROM tok, UNNEST(generate_series(1, len(t) - 1)) s(i)
),
model AS (
  SELECT bigram, COUNT(*) AS c FROM bg WHERE b < 80 GROUP BY bigram
),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS mt FROM model),
scored AS (
  SELECT g.doc_id, g.source,
         CAST(SUM(COALESCE(m.c * {_LM_SCALE} // t.mt, 0))
              // COUNT(*) AS BIGINT) AS fam
  FROM bg g LEFT JOIN model m USING (bigram), tot t
  WHERE g.b >= 80
  GROUP BY g.doc_id, g.source
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(fam) // COUNT(*) AS BIGINT) AS mean_fam_scaled,
       MIN(fam) AS min_fam_scaled,
       MAX(fam) AS max_fam_scaled
FROM scored
GROUP BY source
ORDER BY source
"""


@query(
    "bigram_lm_familiarity",
    _BIGRAM_LM_ORACLE,
    "CCNet-style LM quality scoring (Wenzek et al. 2020): word-bigram "
    "counts from the 80% md5 hash-split, held-out docs scored by mean "
    "scaled bigram probability (per-bigram 1e9-scaled division, so no "
    "intermediate exceeds n_bigrams*1e9), doc-bigrams joined to the "
    "corpus-sized model on the bigram key (hash join, not broadcast by "
    "construction), bounded per-source profile out",
    tags=("llm", "text", "quality", "bench"),
)
def q_bigram_lm_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    b = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 100
    )
    bg = docs.select(
        "doc_id",
        "source",
        b.alias("b"),
        F.explode(
            F.expr(
                "zip_with(slice(split(text, ' '), 1, size(split(text, ' ')) - 1), "
                "slice(split(text, ' '), 2, size(split(text, ' ')) - 1), "
                "(x, y) -> concat(x, ' ', y))"
            )
        ).alias("bigram"),
    )
    model = (
        bg.filter(F.col("b") < 80)
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = model.agg(F.sum("c").cast("long").alias("mt"))
    scored = (
        bg.filter(F.col("b") >= 80)
        .join(model, "bigram", "left")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id", "source")
        .agg(
            F.expr(
                f"sum(coalesce((c * {_LM_SCALE}) div mt, 0)) div count(1)"
            )
            .cast("long")
            .alias("fam")
        )
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr("sum(fam) div count(1)").cast("long").alias(
                "mean_fam_scaled"
            ),
            F.min("fam").alias("min_fam_scaled"),
            F.max("fam").alias("max_fam_scaled"),
        )
        .orderBy("source")
    )
