"""Corpus / series statistics: autocorrelation, rank correlation,
PMI collocations, the dedup quality-shift audit, Heaps'-law vocabulary
growth, and inter-arrival burstiness.

Late round-5 additions. House rules as everywhere else: integer-exact
arithmetic end to end (scaled ``div``, never float division in a ranked
or hashed column), staged products with documented magnitude ceilings,
and a DuckDB oracle that replays the same expressions bit-for-bit.

- ``acf_lag_profile``: the sample autocorrelation of the daily event
  count series at lags 1..7 — the standard pre-modeling seasonality
  diagnostic (a weekly cycle shows as a spike at lag 7). The lag
  alignment is a self-join on ``date_add`` (a 7-row lag dim crossed
  with the bounded daily series), never a window per lag.
- ``spearman_daily_corr``: Spearman rank correlation between daily
  order count and daily revenue per order priority. Ranks are
  ``row_number`` with a deterministic ``(value, day)`` tie-break, so
  Sum d^2 is integer-exact; ties get distinct ranks (documented
  variant — the classical tie-corrected estimator needs average ranks,
  i.e. rationals).
- ``pmi_collocations``: top word-bigram collocations by pointwise
  mutual information. PMI = log p(xy)/(p(x)p(y)) is monotone in the
  ratio, so ranking by the *scaled integer ratio* c(xy)*N/(c(x)*c(y))
  IS ranking by PMI — no log, no float.
- ``dedup_quality_shift``: what exact dedup does to corpus quality —
  per source, lexical-diversity quality (scaled) over all docs vs the
  fingerprint-survivor subset. The audit a training-data curator runs
  before committing to a dedup policy.
- ``heaps_vocab_growth``: vocabulary size vs corpus-prefix decile
  (Heaps 1978) — first-occurrence doc per word, no global sort.
- ``interarrival_burstiness``: scaled CV^2 of per-user inter-event
  gaps per type (Poisson = 10000 bp) — sqrt-free burstiness.

Scale notes are inline per query; none of the six does all-pairs work
and every join side that is vocabulary- or calendar-bounded is
documented as such.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from reddit_data_pipeline_engineering_spark.functions import text as tx
from reddit_data_pipeline_engineering_spark.plans.queries import query
from reddit_data_pipeline_engineering_spark.sources.tables import load_table, spread

# --------------------------------------------------------------------------
# Autocorrelation of the daily event-count series, lags 1..7.
#
# Pearson r over the lag-k aligned pairs (x_d, x_{d+k}), computed from
# the six exact integer sums (n, Sx, Sy, Sxy, Sxx, Syy) via the
# product-moment identity:
#
#   num  = n*Sxy - Sx*Sy        denx = n*Sxx - Sx^2     deny = n*Syy - Sy^2
#   r^2  = num^2 / (denx*deny)
#
# The signed scaled output is sign(num) * (num^2 * 10^4 div denx*deny):
# integer-exact, and |r| recoverable as sqrt(|acf2_bp|/1e4). Magnitudes:
# the series is calendar-bounded (<=366 points), daily counts c; the
# int64 sums hold to c ~ 3e6/day, and the decimal(38,0) products
# (num^2*1e4 ~ (n^2*c^2)^2*1e4) to c ~ 2e4; above that pre-scale the
# daily counts (x div C) before the moment pass — the estimator is
# scale-invariant. One count shuffle builds the daily series; the lag
# alignment is a broadcast 7-row lag dim + a self-join on day+k over
# the bounded series; the final rollup groups by 7 lag keys.
#
# Both engines divide non-negative num^2 by positive denx*deny, so
# Spark's truncating `div` and DuckDB's flooring `//` agree.
# --------------------------------------------------------------------------

_ACF_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1
), lags AS (
  SELECT unnest(generate_series(1, 7)) AS lag
), pairs AS (
  SELECT l.lag, a.x AS x, b.x AS y
  FROM daily a CROSS JOIN lags l
  JOIN daily b ON b.day = a.day + CAST(l.lag AS INTEGER)
), moms AS (
  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM pairs GROUP BY lag
), parts AS (
  SELECT lag, n,
         n * sxy - sx * sy AS num,
         n * sxx - sx * sx AS denx,
         n * syy - sy * sy AS deny
  FROM moms
)
SELECT lag, n AS n_pairs, num, denx, deny,
       CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END
            * (CAST(num AS HUGEINT) * num * 10000
               // (CAST(denx AS HUGEINT) * deny)) AS BIGINT) AS acf2_bp
FROM parts ORDER BY lag
"""


@query(
    "acf_lag_profile",
    _ACF_ORACLE,
    "Sample autocorrelation of the daily event-count series at lags "
    "1..7 (weekly-seasonality diagnostic): exact integer product-moment "
    "sums over date_add-aligned pairs, signed r^2 scaled by 1e4 via "
    "decimal(38,0) products — no log, no float; series length is "
    "calendar-bounded so the lag self-join is O(days*7)",
    tags=("relational", "stats", "timeseries", "bench"),
)
def q_acf_lag_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    )
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    b = daily.select(F.col("day").alias("bday"), F.col("x").alias("y"))
    pairs = (
        daily.crossJoin(F.broadcast(lags))
        .join(b, F.expr("bday = date_add(day, lag)"))
    )
    moms = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    parts = moms.select(
        "lag",
        F.col("n").alias("n_pairs"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("denx"),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).alias("deny"),
    )
    acf2 = F.expr(
        "cast(sign(num) as long) * cast("
        "(cast(num as decimal(38,0)) * num * 10000)"
        " div (cast(denx as decimal(38,0)) * deny) as long)"
    )
    return parts.select(
        "lag", "n_pairs", "num", "denx", "deny", acf2.alias("acf2_bp")
    ).orderBy("lag")


# --------------------------------------------------------------------------
# Spearman rank correlation between daily order count and daily revenue,
# per order priority.
#
# rho = 1 - 6*Sum(d^2) / (n*(n^2-1)) with d = rank(x) - rank(y). Ranks
# are row_number ordered by (value, day): deterministic, integer, and
# identical in both engines; under ties this is the "random ranks made
# deterministic" variant (the tie-corrected estimator needs average
# ranks = rationals). Output is rho scaled by 1e4 with trunc-toward-zero
# semantics in BOTH engines: the numerator can be negative and DuckDB's
# `//` floors, so both sides compute sign * (|numer|*1e4 div denom).
# Windows partition by priority and hold <=366 rows each (calendar-
# bounded) — the single-partition sort never sees raw fact rows, only
# the daily aggregate. Magnitudes: n<=366 so n^3*1e4 < 5e11, int64-safe
# to series of ~6e4 points.
# --------------------------------------------------------------------------

_SPEARMAN_ORACLE = """
WITH daily AS (
  SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS revenue
  FROM orders GROUP BY 1, 2
), ranked AS (
  SELECT priority,
         CAST(ROW_NUMBER() OVER (PARTITION BY priority
                                 ORDER BY n_orders, day) AS BIGINT) AS rx,
         CAST(ROW_NUMBER() OVER (PARTITION BY priority
                                 ORDER BY revenue, day) AS BIGINT) AS ry
  FROM daily
), agg AS (
  SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM((rx - ry) * (rx - ry)) AS BIGINT) AS sd2
  FROM ranked GROUP BY priority
)
SELECT priority, n_days, sd2,
       CAST(CASE WHEN n_days < 2 THEN NULL ELSE
         CASE WHEN n_days * (n_days * n_days - 1) - 6 * sd2 >= 0
              THEN 1 ELSE -1 END
         * (abs(n_days * (n_days * n_days - 1) - 6 * sd2) * 10000
            // (n_days * (n_days * n_days - 1)))
       END AS BIGINT) AS rho_bp
FROM agg ORDER BY priority
"""


@query(
    "spearman_daily_corr",
    _SPEARMAN_ORACLE,
    "Spearman rank correlation between daily order count and daily "
    "revenue per order priority: row_number ranks with deterministic "
    "(value, day) tie-break, integer Sum d^2, rho scaled by 1e4 with "
    "explicit sign*abs-div so trunc (Spark) and floor (DuckDB) agree; "
    "windows are calendar-bounded per priority",
    tags=("relational", "stats", "timeseries", "bench"),
)
def q_spearman_daily_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.to_date("o_orderdate").alias("day"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("revenue"),
    )
    wx = Window.partitionBy("priority").orderBy("n_orders", "day")
    wy = Window.partitionBy("priority").orderBy("revenue", "day")
    ranked = daily.select(
        "priority",
        F.row_number().over(wx).cast("long").alias("rx"),
        F.row_number().over(wy).cast("long").alias("ry"),
    )
    agg = ranked.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum((F.col("rx") - F.col("ry")) * (F.col("rx") - F.col("ry"))).alias(
            "sd2"
        ),
    )
    rho = F.expr(
        "cast(case when n_days < 2 then null else "
        "  cast(case when n_days * (n_days * n_days - 1) - 6 * sd2 >= 0 "
        "       then 1 else -1 end as long) "
        "  * (abs(n_days * (n_days * n_days - 1) - 6 * sd2) * 10000 "
        "     div (n_days * (n_days * n_days - 1))) end as long)"
    )
    return agg.select("priority", "n_days", "sd2", rho.alias("rho_bp")).orderBy(
        "priority"
    )


# --------------------------------------------------------------------------
# PMI collocations: top word bigrams by pointwise mutual information.
#
# PMI(x,y) = log[ p(xy) / (p(x)p(y)) ] with p(xy) = c(xy)/N over bigram
# occurrences and p(x) = c(x)/N_w over unigrams. log is monotone, so the
# RANKING by PMI equals the ranking by the ratio — computed as the
# staged integer  (c(xy)*1e6 div c(x)) * N div c(y)  (c(xy) <= c(x), so
# the first stage is <= 1e6; the second is <= 1e6*N — int64-safe to
# N ~ 9e12 bigrams, i.e. ~50 TB of text; beyond, drop the scale to 1e4).
# Staging truncation costs at most N/c(y) + 1 ABSOLUTE on the
# 1e6-scaled score (stage-1's <1 error amplified by N div c(y), plus
# stage-2's own <1) — property-pinned in test_stats_queries.py: two
# candidates can invert vs the exact rational ratio only when their
# exact scaled scores sit within that bound of each other, which for
# ranking-relevant collocations (large scores, c(x) comparable to
# c(xy)) is a vanishing relative band; the bigram-text tiebreak keeps
# the output a deterministic total order regardless. Min-support
# c(xy) >= 20 prunes the hapax noise PMI is
# notorious for. Plan: one (bigram) count shuffle + one (word) count
# shuffle; the unigram side is vocabulary-bounded (plain hash joins;
# AQE broadcasts when small) and the result is TakeOrdered top-30.
# --------------------------------------------------------------------------

_PMI_SCALE = 1_000_000
_PMI_MIN_COUNT = 20
_PMI_TOP = 30

_PMI_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), uni AS (
  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS c
  FROM tok, UNNEST(t) s(w) GROUP BY 1
), bg AS (
  SELECT t[i] AS x, t[i + 1] AS y, CAST(COUNT(*) AS BIGINT) AS cxy
  FROM tok, UNNEST(generate_series(1, len(t) - 1)) s(i)
  GROUP BY 1, 2
), tot AS (
  SELECT CAST(SUM(cxy) AS BIGINT) AS n FROM bg
)
SELECT x || ' ' || y AS bigram, cxy, ux.c AS cx, uy.c AS cy,
       CAST((cxy * {_PMI_SCALE} // ux.c) * t.n // uy.c AS BIGINT)
         AS pmi_scaled
FROM bg
JOIN uni ux ON ux.word = x
JOIN uni uy ON uy.word = y
CROSS JOIN tot t
WHERE cxy >= {_PMI_MIN_COUNT}
ORDER BY pmi_scaled DESC, bigram
LIMIT {_PMI_TOP}
"""


@query(
    "pmi_collocations",
    _PMI_ORACLE,
    "Top-30 word-bigram collocations by PMI: log-free ranking via the "
    "monotone scaled ratio (c(xy)*1e6 div c(x)) * N div c(y), exact "
    "integers end to end, min-support 20 against hapax noise; one "
    "bigram-count + one unigram-count shuffle, vocabulary-bounded "
    "unigram joins, TakeOrdered top-k",
    tags=("llm", "text", "stats", "bench"),
)
def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    toked = docs.select(F.split("text", " ").alias("t"))
    uni = (
        toked.select(F.explode("t").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bg = (
        toked.select(
            F.explode(
                F.expr(
                    "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, "
                    "size(t) - 1), (a, b) -> struct(a as x, b as y))"
                )
            ).alias("p")
        )
        .select("p.x", "p.y")
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("cxy"))
        .filter(F.col("cxy") >= _PMI_MIN_COUNT)
    )
    tot = (
        toked.select(F.size("t").alias("k"))
        .agg((F.sum("k") - F.count(F.lit(1))).cast("long").alias("n"))
    )
    ux = uni.select(F.col("word").alias("x"), F.col("c").alias("cx"))
    uy = uni.select(F.col("word").alias("y"), F.col("c").alias("cy"))
    scored = (
        bg.join(ux, "x")
        .join(uy, "y")
        .crossJoin(F.broadcast(tot))
        .select(
            F.concat_ws(" ", "x", "y").alias("bigram"),
            "cxy",
            "cx",
            "cy",
            F.expr(f"(cxy * {_PMI_SCALE} div cx) * n div cy").alias(
                "pmi_scaled"
            ),
        )
    )
    return scored.orderBy(F.desc("pmi_scaled"), "bigram").limit(_PMI_TOP)


# --------------------------------------------------------------------------
# Dedup quality shift: the audit a curator runs before committing to a
# dedup policy — does dropping exact duplicates change the quality
# profile of what remains, and differently per source?
#
# Quality proxy: lexical diversity scaled to basis points,
# n_distinct_tokens * 1e4 div n_tokens per doc (the integer core of
# quality_score). Survivors: first occurrence (min doc_id) per full-
# text fingerprint — the same md5-of-normalized-token-stream key as
# the `fingerprint` / `exact_dedup` family, so this composes with them.
# Plan: map-only per-doc stats, one fingerprint shuffle for the
# survivor window, one source rollup reusing nothing exotic; output is
# bounded by the source domain. The duplicate-heavy source shows its
# dedup penalty as (mean_dr_bp_surv - mean_dr_bp_all).
# --------------------------------------------------------------------------

_QSHIFT_TOKS = r"list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')"

_QSHIFT_ORACLE = f"""
WITH base AS (
  SELECT doc_id, source,
         md5(array_to_string(list_transform({_QSHIFT_TOKS},
             t -> lower(t)), ' ')) AS fp,
         CAST(len(list_distinct({_QSHIFT_TOKS})) AS BIGINT) * 10000
           // CAST(len({_QSHIFT_TOKS}) AS BIGINT) AS dr_bp
  FROM documents
), flagged AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) = 1
              AS survives
  FROM base
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN survives THEN 1 ELSE 0 END) AS BIGINT)
         AS n_survivors,
       CAST(SUM(dr_bp) // COUNT(*) AS BIGINT) AS mean_dr_bp_all,
       CAST(SUM(CASE WHEN survives THEN dr_bp ELSE 0 END)
            // SUM(CASE WHEN survives THEN 1 ELSE 0 END) AS BIGINT)
         AS mean_dr_bp_surv
FROM flagged
GROUP BY source ORDER BY source
"""


@query(
    "dedup_quality_shift",
    _QSHIFT_ORACLE,
    "Per-source quality-profile shift under exact dedup: scaled lexical-"
    "diversity mean over all docs vs fingerprint first-occurrence "
    "survivors (same md5 token-stream key as the exact_dedup family); "
    "map-only doc stats + one fingerprint window shuffle + one bounded "
    "source rollup",
    tags=("llm", "text", "dedup", "bench"),
)
def q_dedup_quality_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id",
        "source",
        tx.full_fingerprint_of(tx.tokens("text")).alias("fp"),
        tx.distinct_token_count("text").cast("long").alias("n_distinct"),
        tx.token_count("text").cast("long").alias("n_tokens"),
    ).select(
        "doc_id",
        "source",
        "fp",
        F.expr("n_distinct * 10000 div n_tokens").alias("dr_bp"),
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    flagged = base.withColumn("survives", F.row_number().over(w) == 1)
    surv = F.when(F.col("survives"), F.lit(1)).otherwise(F.lit(0))
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(surv).cast("long").alias("n_survivors"),
            F.expr("sum(dr_bp) div count(1)").alias("mean_dr_bp_all"),
            F.expr(
                "sum(case when survives then dr_bp else 0 end) div "
                "sum(case when survives then 1 else 0 end)"
            ).alias("mean_dr_bp_surv"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Heaps'-law vocabulary growth: distinct vocabulary as a function of
# corpus prefix — the curve that sizes tokenizer vocabularies and
# predicts how much NEW vocabulary another shard of data buys
# (V(n) ~ K*n^beta, Heaps 1978). Prefixes are doc_id deciles (id-order
# prefix, max-id broadcast scalar — NO global sort, NO corpus-sized
# window: the 100 TB guard). One explode feeds (a) per-word
# min(doc_id) — the vocabulary aggregate, bounded by the vocab — and
# (b) per-decile token counts; the cumulative pass windows over the
# 10-row decile rollup only.
# --------------------------------------------------------------------------

_HEAPS_ORACLE = """
WITH mx AS (
  SELECT MAX(doc_id) + 1 AS n_docs FROM documents
), tok AS (
  SELECT doc_id, w AS word
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       UNNEST(t) s(w)
), firsts AS (
  SELECT word, MIN(doc_id) AS first_doc FROM tok GROUP BY word
), new_words AS (
  SELECT CAST(first_doc * 10 // n_docs AS BIGINT) AS decile,
         CAST(COUNT(*) AS BIGINT) AS n_new_words
  FROM firsts, mx GROUP BY 1
), tokens AS (
  SELECT CAST(doc_id * 10 // n_docs AS BIGINT) AS decile,
         CAST(COUNT(*) AS BIGINT) AS n_tokens
  FROM tok, mx GROUP BY 1
)
SELECT decile, COALESCE(n_new_words, 0) AS n_new_words,
       CAST(SUM(COALESCE(n_new_words, 0)) OVER (ORDER BY decile)
            AS BIGINT) AS cum_vocab,
       n_tokens,
       CAST(SUM(n_tokens) OVER (ORDER BY decile) AS BIGINT) AS cum_tokens
FROM tokens LEFT JOIN new_words USING (decile)
ORDER BY decile
"""


@query(
    "heaps_vocab_growth",
    _HEAPS_ORACLE,
    "Heaps'-law vocabulary-growth curve over doc-id-decile corpus "
    "prefixes: per-word MIN(doc_id) first occurrence (vocab-bounded "
    "aggregate), per-decile new-word and token counts, cumulative "
    "windows over the 10-row rollup only — no global sort, no "
    "corpus-sized window; the how-much-new-vocab-does-more-data-buy "
    "curve that sizes tokenizers",
    tags=("llm", "text", "stats", "bench"),
)
def q_heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    mx = docs.agg((F.max("doc_id") + 1).alias("n_docs"))
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).crossJoin(F.broadcast(mx))
    firsts = tok.groupBy("word").agg(
        F.min("doc_id").alias("first_doc"), F.first("n_docs").alias("n_docs")
    )
    new_words = firsts.groupBy(
        F.expr("first_doc * 10 div n_docs").alias("decile")
    ).agg(F.count(F.lit(1)).alias("n_new_words"))
    tokens = tok.groupBy(
        F.expr("doc_id * 10 div n_docs").alias("decile")
    ).agg(F.count(F.lit(1)).alias("n_tokens"))
    w = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # tokens drives the join: every decile has documents (dense ids),
    # but a decile can introduce zero NEW words — coalesce, don't drop.
    nw = F.coalesce("n_new_words", F.lit(0))
    return (
        tokens.join(new_words, "decile", "left")
        .select(
            "decile",
            nw.alias("n_new_words"),
            F.sum(nw).over(w).alias("cum_vocab"),
            "n_tokens",
            F.sum("n_tokens").over(w).alias("cum_tokens"),
        )
        .orderBy("decile")
    )


# --------------------------------------------------------------------------
# Inter-arrival burstiness: is event traffic Poisson or bursty? The
# scaled squared coefficient of variation of per-user inter-event gaps,
# per event type: CV^2 = (n*S2 - S1^2) / S1^2 over gap seconds
# (S1 = sum g, S2 = sum g^2). Poisson arrivals give CV^2 = 1 (10000 bp);
# heavier values mean burst-and-silence traffic (Goh & Barabasi 2008
# use the equivalent (sigma-mu)/(sigma+mu); CV^2 carries the same
# signal without the sqrt, keeping the pipeline integer-exact). Gaps
# come from ONE lag window partitioned by (user, type) — per-key
# sequences, the sessionize partitioning, never a global order. The
# moment sums run in decimal(38,0) (HUGEINT in the oracle): gap <= ~3e7
# s, so S2 fits int64 only to ~1e4 events/key-family — the decimal
# ceiling is ~1e9 events per type at worst-case gaps.
# --------------------------------------------------------------------------

_BURST_ORACLE = """
WITH secs AS (
  -- whole-second truncation via date_trunc, NOT epoch()'s DOUBLE
  -- (a double's ~2e-7 s spacing at epoch magnitudes could round a
  -- .9999999 fraction across the second boundary); mirrors Spark's
  -- flooring unix_timestamp exactly
  SELECT event_type, user_id, ts, event_id,
         epoch_us(date_trunc('second', ts)) // 1000000 AS es
  FROM events
), gaps AS (
  SELECT event_type,
         CAST(es - LAG(es) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id)
           AS BIGINT) AS g
  FROM secs
), moms AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
         CAST(SUM(g) AS BIGINT) AS s1,
         CAST(SUM(CAST(g AS HUGEINT) * g) AS HUGEINT) AS s2
  FROM gaps WHERE g IS NOT NULL GROUP BY event_type
)
SELECT event_type, n_gaps, s1, CAST(s2 AS BIGINT) AS s2,
       CAST((n_gaps * s2 - CAST(s1 AS HUGEINT) * s1) * 10000
            // (CAST(s1 AS HUGEINT) * s1) AS BIGINT) AS cv2_bp
FROM moms ORDER BY event_type
"""


@query(
    "interarrival_burstiness",
    _BURST_ORACLE,
    "Inter-arrival burstiness per event type: scaled CV^2 of per-user "
    "inter-event gaps (Poisson = 10000 bp; more = bursty) from one lag "
    "window partitioned by (user, type) — per-key sequences, never a "
    "global order — with decimal(38,0)/HUGEINT moment products; the "
    "sqrt-free twin of the Goh-Barabasi burstiness parameter",
    tags=("relational", "stats", "timeseries", "bench"),
)
def q_interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("g"),
    ).filter(F.col("g").isNotNull())
    moms = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("g").alias("s1"),
        F.sum(F.expr("cast(g as decimal(38,0)) * g")).alias("__s2"),
    )
    return moms.select(
        "event_type",
        "n_gaps",
        "s1",
        F.col("__s2").cast("long").alias("s2"),
        F.expr(
            "cast((n_gaps * __s2 - cast(s1 as decimal(38,0)) * s1) * 10000"
            " div (cast(s1 as decimal(38,0)) * s1) as long)"
        ).alias("cv2_bp"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Kolmogorov-Smirnov two-sample drift (r06): per source, the KS distance
# between that source's document token-length distribution and the REST
# of the corpus — the distribution-free complement of chisq_source_drift
# (which sees vocabulary shift but is blind to length/shape shift).
#
# Integer-exact sup: with cumulative counts cum_s(v), cum_r(v) and totals
# n_s, n_r, the ECDF gap at value v is |cum_s/n_s - cum_r/n_r|; clearing
# denominators, D_num = max_v |cum_s(v)*n_r - cum_r(v)*n_s| and
# KS = D_num / (n_s*n_r), reported as ks_ppm = D_num*1e6 div (n_s*n_r).
# No float enters the sup.
#
# Plan shape: one corpus scan -> (source, len) counts (one shuffle);
# the evaluation grid is sources x distinct-lengths — BOTH bounded (a
# length is at most the max document size, sources are an enum), so the
# per-source cumulative windows run over grid rows, never corpus rows.
# cum_rest = cum_all - cum_src needs no second pass. Magnitudes
# (VERDICT r06 #6 + ADVICE r06): every product — the cum*total gap
# terms AND the final d_num*1e6 ppm scaling — runs in DECIMAL(38,0)
# (Spark) / HUGEINT-then-DECIMAL(38,0) (DuckDB oracle), so the
# arithmetic is integer-exact while every product stays under 1e38:
# d_num <= n_src*n_rest bounds the ppm term at n_src*n_rest*1e6 < 1e38,
# i.e. ~1e16 docs per side. The previous BIGINT form silently wrapped
# (Spark, non-ANSI) once d_num*1e6 crossed 2^63 — n_src*n_rest ~ 9.2e12,
# only ~3e6 docs per side in the worst case, a factor 1e6 earlier than
# its comment claimed. ks_ppm itself is bounded by 1e6 and stays
# BIGINT. d_num is EMITTED as DOUBLE on both legs (VERDICT r07 #1):
# the r07 driver gate hash-failed exactly the registry's 3
# decimal-output queries (this one regressed green→red when d_num
# became DECIMAL(38,0)) on value-exact matches — the driver's typed
# hash serializes Spark DecimalType and DuckDB DECIMAL differently.
# The sup arithmetic stays DECIMAL(38,0) internally; only the final
# diagnostic column is rendered as a correctly-rounded double (the
# decision value, ks_ppm, is exact BIGINT).
# --------------------------------------------------------------------------

_KS_SCALE = 1_000_000
_KS_TOKS = r"len(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> ''))"

_KS_ORACLE = f"""
WITH lens AS (
  SELECT source, {_KS_TOKS} AS l FROM documents
),
cnt AS (
  SELECT source, l, COUNT(*) AS c FROM lens GROUP BY source, l
),
srcs AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_src FROM cnt GROUP BY source),
vals AS (SELECT DISTINCT l FROM cnt),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_all FROM cnt),
grid AS (
  SELECT s.source, s.n_src, v.l,
         COALESCE(c.c, 0) AS c_src,
         (SELECT COALESCE(SUM(c2.c), 0) FROM cnt c2 WHERE c2.l = v.l) AS c_all
  FROM srcs s CROSS JOIN vals v
  LEFT JOIN cnt c ON c.source = s.source AND c.l = v.l
),
cum AS (
  SELECT source, n_src, l,
         SUM(c_src) OVER (PARTITION BY source ORDER BY l) AS cum_src,
         SUM(c_all) OVER (PARTITION BY source ORDER BY l) AS cum_all
  FROM grid
)
SELECT g.source,
       g.n_src,
       CAST(t.n_all - g.n_src AS BIGINT) AS n_rest,
       CAST(MAX(ABS(CAST(g.cum_src AS HUGEINT) * (t.n_all - g.n_src)
                    - (g.cum_all - g.cum_src) * g.n_src))
            AS DOUBLE) AS d_num,
       CAST(MAX(ABS(CAST(g.cum_src AS HUGEINT) * (t.n_all - g.n_src)
                    - (g.cum_all - g.cum_src) * g.n_src))
            * {_KS_SCALE}
            // (CAST(g.n_src AS HUGEINT) * (t.n_all - g.n_src)) AS BIGINT)
         AS ks_ppm
FROM cum g, tot t
GROUP BY g.source, g.n_src, t.n_all
ORDER BY g.source
"""


@query(
    "ks_source_drift",
    _KS_ORACLE,
    "Two-sample Kolmogorov-Smirnov drift per source vs the rest of the "
    "corpus over document token lengths: one (source, len) count "
    "shuffle, the sup runs over the bounded sources x distinct-lengths "
    "grid (never corpus rows), denominators cleared so the max is "
    "integer-exact in DECIMAL(38,0) arithmetic (no 2^63 wrap), "
    "ks_ppm = D_num*1e6 div (n_src*n_rest)",
    tags=("llm", "stats", "quality", "bench"),
)
def q_ks_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    lens = docs.select(
        "source", F.size(tx.tokens("text")).alias("l")
    )
    cnt = lens.groupBy("source", "l").agg(F.count(F.lit(1)).alias("c"))
    return ks_drift_from_counts(cnt)


def ks_drift_from_counts(cnt: DataFrame) -> DataFrame:
    """KS sup over a ``(source, l, c)`` per-value counts relation.

    DECIMAL(38,0) end to end (VERDICT r06 #6): cumulative sums and every
    product run in decimal so nothing wraps at 2^63 — integer-exact up
    to ~1e16 docs per side (the d_num*1e6 term is the binding product).
    Factored out of the registry query so the overflow regression test
    can drive it with adversarial counts near 2^63, which no parquet
    fixture could physically materialize as rows.
    """
    cnt = cnt.select(
        "source", "l", F.col("c").cast("decimal(38,0)").alias("c")
    )
    # cnt fans out to three consumers (srcs, vals, the grid join); a
    # lazy localCheckpoint materializes its corpus-sized upstream
    # shuffle ONCE (the r07 §9e probe measured the count stage pair
    # materializing twice — the dominant movement). What is stored is
    # grid-bounded — distinct (source, l) pairs, sources x max doc
    # length — never corpus-sized, at any scale.
    cnt = cnt.localCheckpoint(eager=False)
    srcs = cnt.groupBy("source").agg(F.sum("c").alias("n_src_d"))
    vals = cnt.select("l").distinct()
    tot = srcs.agg(F.sum("n_src_d").alias("n_all_d"))
    # The dense grid holds EVERY (source, l) cell 0-filled, so the
    # pooled per-value count is a window over the grid itself —
    # c_all(l) = sum of c_src over sources — replacing the r06 form's
    # separate cnt.groupBy(l) aggregate + join, which materialized the
    # corpus-sized count shuffle a second time (§9e addendum: the two
    # 50k/500k-record stages were the probe's dominant movement). The
    # window shuffles only grid rows (sources x distinct lengths),
    # orders of magnitude below corpus rows.
    grid = (
        srcs.crossJoin(vals)
        .join(cnt, ["source", "l"], "left")
        .select(
            "source",
            "n_src_d",
            "l",
            F.coalesce("c", F.lit(0).cast("decimal(38,0)")).alias("c_src"),
        )
        .withColumn("c_all", F.sum("c_src").over(Window.partitionBy("l")))
    )
    w = (
        Window.partitionBy("source")
        .orderBy("l")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.select(
        "source",
        "n_src_d",
        F.sum("c_src").over(w).alias("cum_src"),
        F.sum("c_all").over(w).alias("cum_all"),
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .withColumn(
            "gap",
            F.abs(
                F.col("cum_src") * (F.col("n_all_d") - F.col("n_src_d"))
                - (F.col("cum_all") - F.col("cum_src")) * F.col("n_src_d")
            ).cast("decimal(38,0)"),
        )
        .groupBy("source", "n_src_d", "n_all_d")
        .agg(F.max("gap").alias("d_num"))
        .select(
            "source",
            F.col("n_src_d").cast("long").alias("n_src"),
            (F.col("n_all_d") - F.col("n_src_d")).cast("long").alias("n_rest"),
            F.col("d_num").cast("double").alias("d_num"),
            F.expr(
                f"d_num * CAST({_KS_SCALE} AS DECIMAL(7,0))"
                " div (n_src_d * (n_all_d - n_src_d))"
            )
            .cast("long")
            .alias("ks_ppm"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Two-proportion z-test A/B audit (r07) — the experimentation-warehouse
# primitive next to the drift family: users are split into two variants
# by the deterministic md5 bucket (engine/rerun/cluster-size invariant,
# the same device as the split queries), per-user conversion flags are
# ONE user-keyed aggregate, and the pooled two-proportion z-test runs
# integer-exactly with cleared denominators:
#
#   d   = c_a*n_b - c_b*n_a          (scaled p_a - p_b)
#   z^2 = d^2 * N / (n_a*n_b*C*(N-C))   with C = c_a+c_b, N = n_a+n_b
#   z2_bp = d^2 * N * 1e4 div (n_a*n_b*C*(N-C))  -> flag at 38416 (1.96^2)
#
# Products run in DECIMAL(38,0)/HUGEINT: d^2*N*1e4 caps exact arms at
# ~1e6 users under worst-case imbalance (d ~ n_a*n_b); beyond, pre-scale
# the per-arm counts (divide all four by a common factor — the statistic
# is scale-invariant up to the truncation grid). One row per conversion
# metric (purchase, signup).
# --------------------------------------------------------------------------

_AB_METRICS = ("purchase", "signup")
_AB_BUCKET_SQL = (
    "('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2"
)

_AB_ORACLE = f"""
WITH per_user AS (
  SELECT user_id,
         CASE WHEN {_AB_BUCKET_SQL} = 0 THEN 'A' ELSE 'B' END AS variant,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchase,
         MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS signup
  FROM events GROUP BY 1
),
arms AS (
  SELECT variant, CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(purchase) AS HUGEINT) AS conv_purchase,
         CAST(SUM(signup) AS HUGEINT) AS conv_signup
  FROM per_user GROUP BY 1
),
m AS (
  SELECT 'purchase' AS metric, a.n AS n_a, a.conv_purchase AS c_a,
         b.n AS n_b, b.conv_purchase AS c_b
  FROM arms a JOIN arms b ON a.variant = 'A' AND b.variant = 'B'
  UNION ALL
  SELECT 'signup', a.n, a.conv_signup, b.n, b.conv_signup
  FROM arms a JOIN arms b ON a.variant = 'A' AND b.variant = 'B'
)
SELECT metric,
       CAST(n_a AS BIGINT) AS n_a, CAST(c_a AS BIGINT) AS conv_a,
       CAST(n_b AS BIGINT) AS n_b, CAST(c_b AS BIGINT) AS conv_b,
       CAST(CASE WHEN c_a + c_b = 0 OR c_a + c_b = n_a + n_b THEN 0 ELSE
         (c_a * n_b - c_b * n_a) * (c_a * n_b - c_b * n_a)
         * (n_a + n_b) * 10000
         // (n_a * n_b * (c_a + c_b) * (n_a + n_b - c_a - c_b)) END
         AS BIGINT) AS z2_bp,
       CAST(CASE WHEN c_a + c_b = 0 OR c_a + c_b = n_a + n_b THEN 0 ELSE
         CASE WHEN (c_a * n_b - c_b * n_a) * (c_a * n_b - c_b * n_a)
                   * (n_a + n_b) * 10000
                   // (n_a * n_b * (c_a + c_b) * (n_a + n_b - c_a - c_b))
                   > 38416 THEN 1 ELSE 0 END END AS INTEGER) AS significant
FROM m ORDER BY metric
"""


@query(
    "ab_conversion_ztest",
    _AB_ORACLE,
    "Two-proportion z-test A/B audit: deterministic md5 user split, "
    "per-user conversion flags in ONE user-keyed aggregate, pooled "
    "z^2 in bp with cleared denominators (DECIMAL(38,0)) and the 5% "
    "significance flag; one row per conversion metric",
    tags=("relational", "stats", "bench"),
)
def q_ab_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_data_pipeline_engineering_spark.operators.corpus import (
        md5_bucket,
    )

    events = load_table(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        *[
            F.max(
                F.when(F.col("event_type") == m, 1).otherwise(0)
            ).alias(m)
            for m in _AB_METRICS
        ]
    ).withColumn(
        "variant",
        F.when(md5_bucket("user_id", 2) == 0, F.lit("A")).otherwise(
            F.lit("B")
        ),
    )
    arms = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        *[
            F.sum(m).cast("decimal(38,0)").alias(f"conv_{m}")
            for m in _AB_METRICS
        ],
    )
    # arms (2 rows) fans out to the A side, the B side, and both metric
    # branches — store it once so the user-keyed aggregate runs once.
    arms = arms.localCheckpoint(eager=False)
    a = arms.filter(F.col("variant") == "A").select(
        F.col("n").alias("n_a"),
        *[F.col(f"conv_{m}").alias(f"ca_{m}") for m in _AB_METRICS],
    )
    b = arms.filter(F.col("variant") == "B").select(
        F.col("n").alias("n_b"),
        *[F.col(f"conv_{m}").alias(f"cb_{m}") for m in _AB_METRICS],
    )
    rows = None
    for m in _AB_METRICS:
        r = (
            a.crossJoin(b)
            .select(
                F.lit(m).alias("metric"),
                F.col("n_a"),
                F.col(f"ca_{m}").alias("c_a"),
                F.col("n_b"),
                F.col(f"cb_{m}").alias("c_b"),
            )
        )
        rows = r if rows is None else rows.unionByName(r)
    z2 = F.expr(
        "cast(case when c_a + c_b = 0 or c_a + c_b = n_a + n_b then 0 else "
        "  (c_a * n_b - c_b * n_a) * (c_a * n_b - c_b * n_a) "
        "  * (n_a + n_b) * 10000 "
        "  div (n_a * n_b * (c_a + c_b) * (n_a + n_b - c_a - c_b)) "
        "end as long)"
    )
    return (
        rows.withColumn("z2_bp", z2)
        .select(
            "metric",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("c_a").cast("long").alias("conv_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.col("c_b").cast("long").alias("conv_b"),
            "z2_bp",
            F.when(F.col("z2_bp") > 38416, F.lit(1))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("significant"),
        )
        .orderBy("metric")
    )


# --------------------------------------------------------------------------
# One-pass correlation matrix (r07) — the table-profiling classic: all
# pairwise Pearson correlations of lineitem's four numeric measures
# from ONE aggregate pass (the naive form runs one corr() per pair =
# C(4,2) scans). Every value enters on the exact 1e-4 integer grid
# (prices have 2 dp, rates 4 dp — lossless), so the power sums
# (n, S_i, P_ij) and the moments num = n*P_ij - S_i*S_j,
# den_i = n*P_ii - S_i^2 are DECIMAL(38,0)-exact and summation-order-
# independent; the final r = num / (sqrt(den_i)*sqrt(den_j)) is the
# mirrored IEEE tree (decimal->double, two correctly-rounded sqrts,
# one divide) rounded to 6 dp — the cosine precedent, since num^2
# would overflow DECIMAL(38) at n^2 * grid^2 scale. Output: 6 pair
# rows from a bounded literal unpivot.
# --------------------------------------------------------------------------

_CORR_COLS = [
    ("discount", "l_discount"),
    ("price", "l_extendedprice"),
    ("quantity", "l_quantity"),
    ("tax", "l_tax"),
]


def _corr_grid_sql(col: str) -> str:
    return f"CAST(CAST({col} AS DECIMAL(16,4)) * 10000 AS DECIMAL(38,0))"


def _corr_matrix_oracle() -> str:
    sums = []
    for n1, c1 in _CORR_COLS:
        sums.append(f"SUM({_corr_grid_sql(c1)}) AS s_{n1}")
        for n2, c2 in _CORR_COLS:
            if n1 <= n2:
                sums.append(
                    f"SUM({_corr_grid_sql(c1)} * {_corr_grid_sql(c2)})"
                    f" AS p_{n1}_{n2}"
                )
    moments = []
    for i, (n1, _) in enumerate(_CORR_COLS):
        moments.append(f"n * p_{n1}_{n1} - s_{n1} * s_{n1} AS den_{n1}")
        for n2, _ in _CORR_COLS[i + 1:]:
            moments.append(
                f"n * p_{n1}_{n2} - s_{n1} * s_{n2} AS num_{n1}_{n2}"
            )
    pair_rows = []
    for i, (n1, _) in enumerate(_CORR_COLS):
        for n2, _ in _CORR_COLS[i + 1:]:
            pair_rows.append(
                f"SELECT '{n1}' AS col_a, '{n2}' AS col_b, n,\n"
                f"  ROUND(CASE WHEN den_{n1} = 0 OR den_{n2} = 0 THEN NULL"
                f" ELSE CAST(num_{n1}_{n2} AS DOUBLE)"
                f" / (SQRT(CAST(den_{n1} AS DOUBLE))"
                f"    * SQRT(CAST(den_{n2} AS DOUBLE))) END, 6) AS corr_r"
                f" FROM m"
            )
    agg = ",\n         ".join(sums)
    return f"""
WITH base AS (
  SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
         {agg}
  FROM lineitem
),
m AS (
  SELECT CAST(n AS BIGINT) AS n,
       {",       ".join(moments)}
  FROM base
)
{" UNION ALL ".join(pair_rows)}
ORDER BY col_a, col_b
"""


@query(
    "correlation_matrix",
    _corr_matrix_oracle(),
    "All pairwise Pearson correlations of lineitem's four numeric "
    "measures from ONE aggregate pass: exact 1e-4 integer-grid power "
    "sums, DECIMAL(38,0) moments, final r via the mirrored IEEE "
    "decimal->double sqrt/divide tree rounded to 6 dp — 6 pair rows "
    "from a bounded literal unpivot, zero per-pair scans",
    tags=("relational", "stats", "bench"),
)
def q_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    def grid(col):
        return (
            (F.col(col).cast("decimal(16,4)") * 10000)
            .cast("decimal(38,0)")
        )

    aggs = [F.count(F.lit(1)).cast("decimal(38,0)").alias("n")]
    for n1, c1 in _CORR_COLS:
        aggs.append(F.sum(grid(c1)).alias(f"s_{n1}"))
        for n2, c2 in _CORR_COLS:
            if n1 <= n2:
                aggs.append(
                    F.sum(grid(c1) * grid(c2)).alias(f"p_{n1}_{n2}")
                )
    base = li.agg(*aggs)
    m_cols = ["CAST(n AS BIGINT) AS n"]
    for i, (n1, _) in enumerate(_CORR_COLS):
        m_cols.append(f"n * p_{n1}_{n1} - s_{n1} * s_{n1} AS den_{n1}")
        for n2, _ in _CORR_COLS[i + 1:]:
            m_cols.append(
                f"n * p_{n1}_{n2} - s_{n1} * s_{n2} AS num_{n1}_{n2}"
            )
    m = base.selectExpr(*m_cols)
    m = m.localCheckpoint(eager=False)  # 1 row, feeds all 6 pair rows
    outs = []
    for i, (n1, _) in enumerate(_CORR_COLS):
        for n2, _ in _CORR_COLS[i + 1:]:
            outs.append(
                m.select(
                    F.lit(n1).alias("col_a"),
                    F.lit(n2).alias("col_b"),
                    "n",
                    F.round(
                        F.when(
                            (F.col(f"den_{n1}") == 0)
                            | (F.col(f"den_{n2}") == 0),
                            F.lit(None).cast("double"),
                        ).otherwise(
                            F.col(f"num_{n1}_{n2}").cast("double")
                            / (
                                F.sqrt(F.col(f"den_{n1}").cast("double"))
                                * F.sqrt(F.col(f"den_{n2}").cast("double"))
                            )
                        ),
                        6,
                    ).alias("corr_r"),
                )
            )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.orderBy("col_a", "col_b")


# --------------------------------------------------------------------------
# Rank-based two-sample / k-sample tests (r08) — Mann-Whitney U per
# source vs the rest and Kruskal-Wallis across all sources, over
# document token lengths. They complete the drift toolkit next to
# ks_source_drift (sup-of-ECDF-gap) and chisq_source_drift (vocabulary):
# the rank tests are the location-shift detectors a data curator runs
# when a new crawl snapshot starts delivering systematically longer or
# shorter documents.
#
# NO GLOBAL SORT. The classical presentation ranks all n documents; the
# whole statistic is computable from per-value counts. With pooled count
# t(v) per distinct length v and cumulative pooled count cum(v), every
# document of length v has midrank (cum(v-) + (t(v)+1)/2); doubling
# clears the half: r2(v) = 2*cum(v) - t(v) + 1. One corpus scan makes
# the (source, l) counts (the only corpus-sized shuffle); everything
# after runs on the bounded sources x distinct-lengths grid — the exact
# evaluation-grid shape ks_drift_from_counts certified linear at sf10.
#
# Integer-exact core (house rule): with R2_s = sum_v c_s(v)*r2(v),
#   A = R2_s - n_s*(n_s+1) - n_s*n_r            ( = 2*(U_s - mu_U) )
#   rank-biserial effect size rb = A / (n_s*n_r), emitted as signed ppm
#   (the decision value, exact; both engines divide |A| >= 0 by a
#   positive product so trunc-div and floor-div agree).
# Tie-corrected normal approximation (diagnostic, DOUBLE):
#   z = A * sqrt( 3*n*(n-1) / (n_s*n_r*(n^3 - n - T)) ),  T = sum t^3-t
# computed with the SAME expression tree both legs — every factor is an
# exact DECIMAL(38,0)/HUGEINT cast to a correctly-rounded double, then
# one division, one sqrt, one multiply (IEEE-deterministic), rounded to
# 6 dp like correlation_matrix. Magnitude ceilings: R2_s <= 2n*n_s and
# A products stay under 1e38 to ~1e16 docs; the variance factor
# n^3 - n - T binds first at n ~ 4.6e12 documents — far past any single
# corpus; past that, compute the variance factor in DOUBLE from the
# (n, T) pair (documented fallback, not needed here).
# --------------------------------------------------------------------------

_MW_ORACLE = f"""
WITH lens AS (
  SELECT source, {_KS_TOKS} AS l FROM documents
),
cnt AS (
  SELECT source, l, COUNT(*) AS c FROM lens GROUP BY source, l
),
srcs AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_src FROM cnt GROUP BY source),
vals AS (SELECT DISTINCT l FROM cnt),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_all FROM cnt),
grid AS (
  SELECT s.source, s.n_src, v.l,
         COALESCE(c.c, 0) AS c_src,
         (SELECT COALESCE(SUM(c2.c), 0) FROM cnt c2 WHERE c2.l = v.l) AS c_all
  FROM srcs s CROSS JOIN vals v
  LEFT JOIN cnt c ON c.source = s.source AND c.l = v.l
),
cum AS (
  SELECT source, n_src, l, c_src, c_all,
         SUM(c_all) OVER (PARTITION BY source ORDER BY l) AS cum_all
  FROM grid
),
agg AS (
  SELECT source, n_src,
         SUM(CAST(c_src AS HUGEINT) * (2 * cum_all - c_all + 1)) AS r2_sum,
         SUM(CAST(c_all AS HUGEINT) * c_all * c_all - c_all) AS t_ties
  FROM cum GROUP BY source, n_src
),
stat AS (
  SELECT a.source, a.n_src,
         CAST(t.n_all - a.n_src AS BIGINT) AS n_rest,
         a.r2_sum - CAST(a.n_src AS HUGEINT) * (a.n_src + 1)
                  - CAST(a.n_src AS HUGEINT) * (t.n_all - a.n_src) AS big_a,
         CAST(a.n_src AS HUGEINT) * (t.n_all - a.n_src) AS nsr,
         CAST(t.n_all AS HUGEINT) * t.n_all * t.n_all - t.n_all
           - a.t_ties AS vfac,
         3 * CAST(t.n_all AS HUGEINT) * (t.n_all - 1) AS p3
  FROM agg a, tot t
)
SELECT source, n_src, n_rest,
       CAST(CASE WHEN big_a < 0
                 THEN -((-big_a) * 1000000 // nsr)
                 ELSE (big_a * 1000000 // nsr) END AS BIGINT) AS rb_ppm,
       CASE WHEN vfac > 0 THEN
         ROUND(CAST(big_a AS DOUBLE)
               * SQRT(CAST(p3 AS DOUBLE)
                      / (CAST(nsr AS DOUBLE) * CAST(vfac AS DOUBLE))), 6)
       END AS z_score
FROM stat
ORDER BY source
"""


def _rank_grid(cnt: DataFrame):
    """Dense (source, l) rank grid shared by the two rank tests.

    Mirrors the ks_drift_from_counts construction (that shipped, gated
    plan keeps its own copy — standing policy: never refactor a gated
    plan mid-round): counts cast to DECIMAL(38,0), lazily checkpointed
    once for the three consumers, pooled per-value counts via a window
    over the grid itself, per-source cumulative pooled counts.
    """
    cnt = cnt.select(
        "source", "l", F.col("c").cast("decimal(38,0)").alias("c")
    )
    cnt = cnt.localCheckpoint(eager=False)
    srcs = cnt.groupBy("source").agg(F.sum("c").alias("n_src_d"))
    vals = cnt.select("l").distinct()
    tot = srcs.agg(F.sum("n_src_d").alias("n_all_d"))
    grid = (
        srcs.crossJoin(vals)
        .join(cnt, ["source", "l"], "left")
        .select(
            "source",
            "n_src_d",
            "l",
            F.coalesce("c", F.lit(0).cast("decimal(38,0)")).alias("c_src"),
        )
        .withColumn("c_all", F.sum("c_src").over(Window.partitionBy("l")))
    )
    w = (
        Window.partitionBy("source")
        .orderBy("l")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.select(
        "source",
        "n_src_d",
        "c_src",
        "c_all",
        F.sum("c_all").over(w).alias("cum_all"),
    )
    per_src = (
        cum.withColumn(
            "r2", F.lit(2) * F.col("cum_all") - F.col("c_all") + F.lit(1)
        )
        .groupBy("source", "n_src_d")
        .agg(
            F.sum(F.col("c_src") * F.col("r2")).alias("r2_sum"),
            F.sum(
                F.col("c_all") * F.col("c_all") * F.col("c_all")
                - F.col("c_all")
            ).alias("t_ties"),
        )
    )
    return per_src, tot


def mannwhitney_from_counts(cnt: DataFrame) -> DataFrame:
    """Mann-Whitney U (source vs rest) from a (source, l, c) counts
    relation. Factored like ks_drift_from_counts so the overflow
    regression test can drive it with counts no fixture could
    materialize as rows."""
    per_src, tot = _rank_grid(cnt)
    stat = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_src_d",
        (F.col("n_all_d") - F.col("n_src_d")).alias("n_rest_d"),
        (
            F.col("r2_sum")
            - F.col("n_src_d") * (F.col("n_src_d") + F.lit(1))
            - F.col("n_src_d") * (F.col("n_all_d") - F.col("n_src_d"))
        ).alias("big_a"),
        (F.col("n_src_d") * (F.col("n_all_d") - F.col("n_src_d"))).alias("nsr"),
        (
            F.col("n_all_d") * F.col("n_all_d") * F.col("n_all_d")
            - F.col("n_all_d")
            - F.col("t_ties")
        ).alias("vfac"),
        (F.lit(3) * F.col("n_all_d") * (F.col("n_all_d") - F.lit(1))).alias("p3"),
    )
    return stat.select(
        "source",
        F.col("n_src_d").cast("long").alias("n_src"),
        F.col("n_rest_d").cast("long").alias("n_rest"),
        F.when(
            F.col("big_a") < 0,
            -F.expr("((-big_a) * CAST(1000000 AS DECIMAL(7,0))) div nsr"),
        )
        .otherwise(F.expr("(big_a * CAST(1000000 AS DECIMAL(7,0))) div nsr"))
        .cast("long")
        .alias("rb_ppm"),
        F.when(
            F.col("vfac") > 0,
            F.round(
                F.col("big_a").cast("double")
                * F.sqrt(
                    F.col("p3").cast("double")
                    / (F.col("nsr").cast("double") * F.col("vfac").cast("double"))
                ),
                6,
            ),
        ).alias("z_score"),
    ).orderBy("source")


@query(
    "mannwhitney_source_test",
    _MW_ORACLE,
    "Mann-Whitney U rank-sum test per source vs the rest of the corpus "
    "over document token lengths — midranks from per-value counts (no "
    "global sort: r2 = 2*cum - t + 1 over the bounded sources x "
    "distinct-lengths grid), signed rank-biserial effect size in exact "
    "ppm, tie-corrected z diagnostic as a mirrored-tree double",
    tags=("llm", "stats", "quality", "bench"),
)
def q_mannwhitney_source_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    lens = docs.select("source", F.size(tx.tokens("text")).alias("l"))
    cnt = lens.groupBy("source", "l").agg(F.count(F.lit(1)).alias("c"))
    return mannwhitney_from_counts(cnt)


# --------------------------------------------------------------------------
# Kruskal-Wallis H across ALL sources (one row) — the k-sample
# generalization: "does ANY source deliver a shifted length
# distribution?" answered before the per-source Mann-Whitney drill-down.
#
#   H = 12/(n(n+1)) * sum_j R_j^2/n_j - 3(n+1),   R_j = r2_sum_j / 2
#
# Emitted in exact micro-units: the per-group term R_j^2/n_j becomes
# s_term_j = r2_sum_j^2 * 1e6 div (4*n_j) (positive; trunc == floor), so
#   h_micro = 12*S div (n(n+1)) - 3(n+1)*1e6,   S = sum_j s_term_j.
# Each truncation loses < 1 micro-unit, so h_micro is within (k+1)e-6 of
# the real-valued H — deterministic on both engines, unlike a float sum
# over groups. Tie factor emitted separately as exact tie_ppm =
# T*1e6 div (n^3-n); the tie-corrected H' = H / (1 - T/(n^3-n)) is the
# DOUBLE diagnostic with a mirrored tree. Ceiling: s_term ~ 4*n^2*n_j*1e6
# stays under 1e38 to n ~ 3e10 docs (then pre-scale counts, the
# statistic is rank-based and invariant).
# --------------------------------------------------------------------------

_KW_ORACLE = f"""
WITH lens AS (
  SELECT source, {_KS_TOKS} AS l FROM documents
),
cnt AS (
  SELECT source, l, COUNT(*) AS c FROM lens GROUP BY source, l
),
srcs AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_src FROM cnt GROUP BY source),
vals AS (SELECT DISTINCT l FROM cnt),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_all FROM cnt),
grid AS (
  SELECT s.source, s.n_src, v.l,
         COALESCE(c.c, 0) AS c_src,
         (SELECT COALESCE(SUM(c2.c), 0) FROM cnt c2 WHERE c2.l = v.l) AS c_all
  FROM srcs s CROSS JOIN vals v
  LEFT JOIN cnt c ON c.source = s.source AND c.l = v.l
),
cum AS (
  SELECT source, n_src, l, c_src, c_all,
         SUM(c_all) OVER (PARTITION BY source ORDER BY l) AS cum_all
  FROM grid
),
agg AS (
  SELECT source, n_src,
         SUM(CAST(c_src AS HUGEINT) * (2 * cum_all - c_all + 1)) AS r2_sum,
         SUM(CAST(c_all AS HUGEINT) * c_all * c_all - c_all) AS t_ties
  FROM cum GROUP BY source, n_src
),
roll AS (
  SELECT SUM(r2_sum * r2_sum * 1000000 // (4 * CAST(n_src AS HUGEINT))) AS s_micro,
         MAX(t_ties) AS t_ties,
         CAST(COUNT(*) AS BIGINT) AS k_groups
  FROM agg
),
stat AS (
  SELECT t.n_all, r.k_groups,
         12 * r.s_micro // (CAST(t.n_all AS HUGEINT) * (t.n_all + 1))
           - 3 * (CAST(t.n_all AS HUGEINT) + 1) * 1000000 AS h_micro,
         CAST(t.n_all AS HUGEINT) * t.n_all * t.n_all - t.n_all AS n3n,
         r.t_ties
  FROM roll r, tot t
)
SELECT n_all, k_groups,
       CAST(h_micro AS BIGINT) AS h_micro,
       CAST(t_ties * 1000000 // n3n AS BIGINT) AS tie_ppm,
       CASE WHEN n3n - t_ties > 0 THEN
         ROUND((CAST(h_micro AS DOUBLE) / 1000000.0)
               * (CAST(n3n AS DOUBLE) / CAST(n3n - t_ties AS DOUBLE)), 6)
       END AS h_tie_corrected
FROM stat
"""


def kruskal_from_counts(cnt: DataFrame) -> DataFrame:
    """Kruskal-Wallis H from a (source, l, c) counts relation, exact
    micro-unit arithmetic (see the block comment above)."""
    per_src, tot = _rank_grid(cnt)
    roll = per_src.agg(
        F.sum(
            F.expr(
                "(r2_sum * r2_sum * CAST(1000000 AS DECIMAL(7,0)))"
                " div (4 * n_src_d)"
            )
        ).alias("s_micro"),
        F.max("t_ties").alias("t_ties"),
        F.count(F.lit(1)).cast("long").alias("k_groups"),
    )
    stat = roll.crossJoin(F.broadcast(tot)).select(
        F.col("n_all_d").cast("long").alias("n_all"),
        "k_groups",
        (
            F.expr(
                "(12 * s_micro) div (n_all_d * (n_all_d + 1))"
            )
            - F.lit(3) * (F.col("n_all_d") + F.lit(1)) * F.lit(1000000)
        ).alias("h_micro_d"),
        (
            F.col("n_all_d") * F.col("n_all_d") * F.col("n_all_d")
            - F.col("n_all_d")
        ).alias("n3n"),
        "t_ties",
    )
    return stat.select(
        "n_all",
        "k_groups",
        F.col("h_micro_d").cast("long").alias("h_micro"),
        F.expr("(t_ties * CAST(1000000 AS DECIMAL(7,0))) div n3n")
        .cast("long")
        .alias("tie_ppm"),
        F.when(
            (F.col("n3n") - F.col("t_ties")) > 0,
            F.round(
                (F.col("h_micro_d").cast("double") / F.lit(1000000.0))
                * (
                    F.col("n3n").cast("double")
                    / (F.col("n3n") - F.col("t_ties")).cast("double")
                ),
                6,
            ),
        ).alias("h_tie_corrected"),
    )


@query(
    "kruskal_wallis_lengths",
    _KW_ORACLE,
    "Kruskal-Wallis H test across all sources over document token "
    "lengths — k-sample location-shift screen ahead of the per-source "
    "Mann-Whitney drill-down; midranks from per-value counts on the "
    "bounded grid (no global sort), H in exact deterministic "
    "micro-units, tie factor as exact ppm, tie-corrected H as a "
    "mirrored-tree double",
    tags=("llm", "stats", "quality", "bench"),
)
def q_kruskal_wallis_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    lens = docs.select("source", F.size(tx.tokens("text")).alias("l"))
    cnt = lens.groupBy("source", "l").agg(F.count(F.lit(1)).alias("c"))
    return kruskal_from_counts(cnt)


# --------------------------------------------------------------------------
# Cross-correlation lead-lag profile (r08) — acf_lag_profile's
# cross-series sibling: Pearson r between daily counts of event type A
# and type B shifted by lag 0..7, for every ORDERED pair of distinct
# types. The lead-lag discovery a funnel analyst runs ("purchases
# track clicks two days later") before committing to an attribution
# window. Same exact product-moment identity as ACF (six integer sums,
# num/denx/deny, signed r^2 in basis points via DECIMAL(38,0) — no
# float, no log); lag 0 is included because contemporaneous coupling
# is the natural baseline the lagged values are read against.
#
# Plan shape: ONE corpus-sized shuffle (the (type, day) count
# aggregate); the aligned pairs come from a broadcast 8-row lag dim
# and a self-join on (day + lag) over the types x days bounded series
# — O(types^2 * days * 8) pair rows, all far below corpus rows. Same
# magnitude ceilings as ACF (int64 sums to ~3e6 events/day/type;
# decimal products past that).
# --------------------------------------------------------------------------

_XCORR_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), lags AS (
  SELECT unnest(generate_series(0, 7)) AS lag
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, l.lag,
         a.x AS x, b.x AS y
  FROM daily a CROSS JOIN lags l
  JOIN daily b ON b.day = a.day + CAST(l.lag AS INTEGER)
             AND b.event_type <> a.event_type
), moms AS (
  SELECT type_a, type_b, lag, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM pairs GROUP BY 1, 2, 3
), parts AS (
  SELECT type_a, type_b, lag, n,
         n * sxy - sx * sy AS num,
         n * sxx - sx * sx AS denx,
         n * syy - sy * sy AS deny
  FROM moms
)
SELECT type_a, type_b, lag, n AS n_pairs,
       CAST(CASE WHEN denx = 0 OR deny = 0 THEN NULL
                 ELSE CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END
                      * (CAST(num AS HUGEINT) * num * 10000
                         // (CAST(denx AS HUGEINT) * deny)) END AS BIGINT)
         AS xcorr2_bp
FROM parts ORDER BY type_a, type_b, lag
"""


@query(
    "xcorr_lead_lag",
    _XCORR_ORACLE,
    "Cross-correlation lead-lag profile between daily count series of "
    "every ordered pair of distinct event types at lags 0..7: exact "
    "integer product-moment sums over date_add-aligned pairs, signed "
    "r^2 in basis points via decimal(38,0) — the funnel analyst's "
    "lead-lag discovery before picking an attribution window; pair "
    "rows are types^2 x days x 8, never corpus rows",
    tags=("relational", "stats", "timeseries", "bench"),
)
def q_xcorr_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    lags = spark.range(0, 8).select(F.col("id").cast("int").alias("lag"))
    b = daily.select(
        F.col("event_type").alias("type_b"),
        F.col("day").alias("bday"),
        F.col("x").alias("y"),
    )
    pairs = (
        daily.withColumnRenamed("event_type", "type_a")
        .crossJoin(F.broadcast(lags))
        .join(
            b,
            F.expr("bday = date_add(day, lag) AND type_b <> type_a"),
        )
    )
    moms = pairs.groupBy("type_a", "type_b", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    parts = moms.select(
        "type_a",
        "type_b",
        "lag",
        F.col("n").alias("n_pairs"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("denx"),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).alias("deny"),
    )
    xcorr2 = F.expr(
        "cast(case when denx = 0 or deny = 0 then null"
        " else cast(sign(num) as long) * cast("
        "(cast(num as decimal(38,0)) * num * 10000)"
        " div (cast(denx as decimal(38,0)) * deny) as long) end as long)"
    )
    return parts.select(
        "type_a", "type_b", "lag", "n_pairs", xcorr2.alias("xcorr2_bp")
    ).orderBy("type_a", "type_b", "lag")


# --------------------------------------------------------------------------
# Distribution-free median confidence interval (r08) — per source, the
# median document token length with a 95% CI from ORDER STATISTICS
# (binomial argument, normal approximation to Binomial(n, 1/2)):
#
#   r_med = (n+1) div 2                         (lower median)
#   r_lo  = max(1, floor((n - 1.96*sqrt(n))/2))
#   r_hi  = min(n, ceil((n + 1.96*sqrt(n))/2) + 1)
#
# and the reported values are the r-th smallest lengths. The honest
# uncertainty a curator needs next to every median dashboard number —
# "is source X's median 412 +/- 3 or +/- 90?" — with zero parametric
# assumptions.
#
# NO GLOBAL SORT: the r-th order statistic of a counts relation is
# min{ l : cum(l) >= r }, so selection is a filter + min over the same
# bounded per-source cumulative grid the KS/rank tests use. The only
# floats are inside the RANK formulas, computed by the SAME expression
# tree on both engines (sqrt/mul/div on exact BIGINT-cast doubles,
# IEEE-deterministic); every OUTPUT is BIGINT. One corpus-sized count
# shuffle; ranks are 3 broadcast-sized rows per source.
# --------------------------------------------------------------------------

_MEDCI_ORACLE = f"""
WITH lens AS (
  SELECT source, {_KS_TOKS} AS l FROM documents
),
cnt AS (
  SELECT source, l, COUNT(*) AS c FROM lens GROUP BY source, l
),
cum AS (
  SELECT source, l,
         SUM(c) OVER (PARTITION BY source ORDER BY l) AS cum
  FROM cnt
),
srcs AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_src FROM cnt GROUP BY source),
ranks AS (
  SELECT source, n_src,
         (n_src + 1) // 2 AS r_med,
         GREATEST(1, CAST(FLOOR((CAST(n_src AS DOUBLE)
             - 1.96 * SQRT(CAST(n_src AS DOUBLE))) / 2.0) AS BIGINT)) AS r_lo,
         LEAST(n_src, CAST(CEIL((CAST(n_src AS DOUBLE)
             + 1.96 * SQRT(CAST(n_src AS DOUBLE))) / 2.0) AS BIGINT) + 1) AS r_hi
  FROM srcs
)
SELECT r.source, r.n_src,
       CAST(MIN(CASE WHEN g.cum >= r.r_med THEN g.l END) AS BIGINT) AS median_len,
       CAST(MIN(CASE WHEN g.cum >= r.r_lo  THEN g.l END) AS BIGINT) AS ci_lo_len,
       CAST(MIN(CASE WHEN g.cum >= r.r_hi  THEN g.l END) AS BIGINT) AS ci_hi_len
FROM ranks r JOIN cum g ON g.source = r.source
GROUP BY r.source, r.n_src
ORDER BY r.source
"""


@query(
    "median_ci_sources",
    _MEDCI_ORACLE,
    "Per-source median document token length with a distribution-free "
    "95% CI from order statistics (binomial rank bounds, normal "
    "approximation): the r-th order statistic of a counts relation is "
    "min{l : cum(l) >= r}, so selection is a filter+min over the "
    "bounded per-source cumulative grid — no global sort; all outputs "
    "BIGINT, floats only inside the mirrored rank formulas",
    tags=("llm", "stats", "quality", "bench"),
)
def q_median_ci_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    lens = docs.select("source", F.size(tx.tokens("text")).alias("l"))
    cnt = lens.groupBy("source", "l").agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.partitionBy("source")
        .orderBy("l")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cnt.select("source", "l", F.sum("c").over(w).alias("cum"))
    srcs = cnt.groupBy("source").agg(F.sum("c").cast("long").alias("n_src"))
    ranks = srcs.select(
        "source",
        "n_src",
        F.expr("(n_src + 1) div 2").alias("r_med"),
        F.expr(
            "greatest(1L, cast(floor((cast(n_src as double)"
            " - 1.96 * sqrt(cast(n_src as double))) / 2.0) as bigint))"
        ).alias("r_lo"),
        F.expr(
            "least(n_src, cast(ceil((cast(n_src as double)"
            " + 1.96 * sqrt(cast(n_src as double))) / 2.0) as bigint) + 1)"
        ).alias("r_hi"),
    )
    return (
        F.broadcast(ranks)
        .join(cum, "source")
        .groupBy("source", "n_src")
        .agg(
            F.min(F.when(F.col("cum") >= F.col("r_med"), F.col("l")))
            .cast("long")
            .alias("median_len"),
            F.min(F.when(F.col("cum") >= F.col("r_lo"), F.col("l")))
            .cast("long")
            .alias("ci_lo_len"),
            F.min(F.when(F.col("cum") >= F.col("r_hi"), F.col("l")))
            .cast("long")
            .alias("ci_hi_len"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Wilson score confidence intervals (r08) — the per-arm companion to
# ab_conversion_ztest: the z-test says WHETHER the arms differ; the
# Wilson interval says what each arm's conversion rate IS, with the
# small-sample/extreme-p behavior the naive Wald interval gets wrong
# (Wald collapses to zero width at p=0 or 1; Wilson stays honest).
#
#   center = (p + z^2/2n) / (1 + z^2/n)
#   half   = z * sqrt( (p(1-p) + z^2/4n) / n ) / (1 + z^2/n)
#
# with z = 1.96 folded into literal constants (z^2 = 3.8416,
# z^2/2 = 1.9208, z^2/4 = 0.9604). Same md5 user split and ONE
# user-keyed aggregate as the z-test; the metrics here are the
# VARIANCE-BEARING ones (every user has a bare purchase/signup event in
# this corpus, so the z-test's raw flags sit at p=1 exactly):
# high_value = any purchase event with value > 150 (~the per-user max
# median), heavy_buyer = 15+ purchase events. The decision value
# rate_ppm is integer-exact; lo/hi are DOUBLE diagnostics computed by
# the SAME expression tree on both engines from exact (n, c) casts,
# rounded to 6 dp. Output: 2 variants x 2 metrics = 4 rows.
# --------------------------------------------------------------------------

_WILSON_ORACLE = f"""
WITH per_user AS (
  SELECT user_id,
         CASE WHEN {_AB_BUCKET_SQL} = 0 THEN 'A' ELSE 'B' END AS variant,
         MAX(CASE WHEN event_type = 'purchase' AND value > 150
                  THEN 1 ELSE 0 END) AS high_value,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   >= 15 THEN 1 ELSE 0 END AS heavy_buyer
  FROM events GROUP BY 1
),
arms AS (
  SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(high_value) AS BIGINT) AS conv_high_value,
         CAST(SUM(heavy_buyer) AS BIGINT) AS conv_heavy_buyer
  FROM per_user GROUP BY 1
),
m AS (
  SELECT variant, 'high_value' AS metric, n, conv_high_value AS c FROM arms
  UNION ALL
  SELECT variant, 'heavy_buyer', n, conv_heavy_buyer FROM arms
),
w AS (
  SELECT variant, metric, n, c,
         CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS p,
         1.0 + 3.8416 / CAST(n AS DOUBLE) AS denom
  FROM m
)
SELECT variant, metric, n, c AS conv,
       CAST(CAST(c AS HUGEINT) * 1000000 // n AS BIGINT) AS rate_ppm,
       ROUND(((p + 1.9208 / CAST(n AS DOUBLE))
              - 1.96 * SQRT((p * (1.0 - p) + 0.9604 / CAST(n AS DOUBLE))
                            / CAST(n AS DOUBLE))) / denom, 6) AS wilson_lo,
       ROUND(((p + 1.9208 / CAST(n AS DOUBLE))
              + 1.96 * SQRT((p * (1.0 - p) + 0.9604 / CAST(n AS DOUBLE))
                            / CAST(n AS DOUBLE))) / denom, 6) AS wilson_hi
FROM w
ORDER BY variant, metric
"""


@query(
    "wilson_conversion_ci",
    _WILSON_ORACLE,
    "Wilson score 95% confidence interval per (variant, metric) "
    "conversion rate — the per-arm companion to ab_conversion_ztest "
    "(same md5 split, one user-keyed aggregate) over variance-bearing "
    "metrics (high-value purchase, heavy buyer): rate_ppm "
    "integer-exact, Wilson lo/hi as mirrored-expression-tree doubles "
    "(honest width at extreme p, unlike Wald)",
    tags=("relational", "stats", "bench"),
)
def q_wilson_conversion_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_data_pipeline_engineering_spark.operators.corpus import (
        md5_bucket,
    )

    metrics = ("high_value", "heavy_buyer")
    events = load_table(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150),
                1,
            ).otherwise(0)
        ).alias("high_value"),
        F.when(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            >= 15,
            1,
        )
        .otherwise(0)
        .alias("heavy_buyer"),
    ).withColumn(
        "variant",
        F.when(md5_bucket("user_id", 2) == 0, F.lit("A")).otherwise(
            F.lit("B")
        ),
    )
    arms = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *[
            F.sum(m).cast("long").alias(f"conv_{m}")
            for m in metrics
        ],
    )
    arms = arms.localCheckpoint(eager=False)
    rows = None
    for m in metrics:
        r = arms.select(
            "variant",
            F.lit(m).alias("metric"),
            "n",
            F.col(f"conv_{m}").alias("c"),
        )
        rows = r if rows is None else rows.unionByName(r)
    p = F.col("c").cast("double") / F.col("n").cast("double")
    n_d = F.col("n").cast("double")
    denom = F.lit(1.0) + F.lit(3.8416) / n_d
    center = p + F.lit(1.9208) / n_d
    half = F.lit(1.96) * F.sqrt(
        (p * (F.lit(1.0) - p) + F.lit(0.9604) / n_d) / n_d
    )
    return rows.select(
        "variant",
        "metric",
        "n",
        F.col("c").alias("conv"),
        F.expr(
            "cast((cast(c as decimal(38,0)) * 1000000) div n as long)"
        ).alias("rate_ppm"),
        F.round((center - half) / denom, 6).alias("wilson_lo"),
        F.round((center + half) / denom, 6).alias("wilson_hi"),
    ).orderBy("variant", "metric")


# --------------------------------------------------------------------------
# TextRank keyword extraction (r09) — PageRank over the word
# co-occurrence graph, the classic unsupervised keyword scorer (Mihalcea
# & Tarau 2004). Graph: adjacent-token pairs (the PMI bigram machinery,
# zip_with — no window), self-loops dropped, symmetrized, edge weight =
# co-occurrence count. Iteration is the WEIGHTED power step on the
# integer grid (operators/pagerank.py constants):
#
#   contrib(dst) = SUM over in-edges of (rank(src) div strength(src)) * w
#   rank'        = teleport + 85 * contrib div 100
#
# Truncate-BEFORE-multiply is deliberate: rank*w could overflow int64 at
# corpus scale (rank ~ n*1e12, w ~ 1e8), while (rank div s)*w <= rank
# since w <= s — the per-edge truncation costs < w grid units on a 1e12
# grid (ranking-irrelevant) and both engines replay it bit-identically.
# Plan: one token-pair count shuffle over fact rows (vocabulary^2-
# bounded output), strength folded into the edge rows ONCE, then 3
# vocabulary-bounded iterations; top-20 via TakeOrdered.
# --------------------------------------------------------------------------

_TR_ITERS = 3
_TR_TOP = 20


def _textrank_ctes(iters: int) -> str:
    from reddit_data_pipeline_engineering_spark.operators import pagerank as _pr

    teleport = (_pr.SCALE * (_pr.DAMP_DEN - _pr.DAMP_NUM)) // _pr.DAMP_DEN
    parts = [
        """tok AS (
  SELECT string_split(text, ' ') AS t FROM documents
)""",
        """und AS MATERIALIZED (
  SELECT LEAST(t[i], t[i + 1]) AS a, GREATEST(t[i], t[i + 1]) AS b,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM tok, UNNEST(generate_series(1, len(t) - 1)) s(i)
  WHERE t[i] <> t[i + 1]
  GROUP BY 1, 2
)""",
        """edges AS MATERIALIZED (
  SELECT a AS src, b AS dst, w FROM und
  UNION ALL
  SELECT b, a, w FROM und
)""",
        """strength AS MATERIALIZED (
  SELECT src, CAST(SUM(w) AS BIGINT) AS s FROM edges GROUP BY src
)""",
        f"""r0 AS MATERIALIZED (
  SELECT src AS word, CAST({_pr.SCALE} AS BIGINT) AS rank FROM strength
)""",
    ]
    for t in range(1, iters + 1):
        parts.append(f"""c{t} AS MATERIALIZED (
  SELECT e.dst AS word, SUM((r.rank // st.s) * e.w) AS m
  FROM edges e
  JOIN r{t - 1} r ON e.src = r.word
  JOIN strength st ON e.src = st.src
  GROUP BY e.dst
)""")
        parts.append(f"""r{t} AS MATERIALIZED (
  SELECT n.word,
         CAST({teleport} + ({_pr.DAMP_NUM} * COALESCE(c.m, 0))
              // {_pr.DAMP_DEN} AS BIGINT) AS rank
  FROM r0 n LEFT JOIN c{t} c USING (word)
)""")
    return ",\n".join(parts)


def _textrank_oracle() -> str:
    return f"""
WITH {_textrank_ctes(_TR_ITERS)}
SELECT word, rank FROM r{_TR_ITERS}
ORDER BY rank DESC, word
LIMIT {_TR_TOP}
"""


@query(
    "textrank_keywords",
    _textrank_oracle(),
    "TextRank keyword extraction: weighted PageRank (3 integer-grid "
    "power iterations, truncate-before-multiply so no int64 overflow "
    "at corpus scale) over the symmetrized adjacent-token co-occurrence "
    "graph — one fact-row pair-count shuffle, vocabulary-bounded "
    "iterations, top-20 keywords via TakeOrdered; the oracle replays "
    "every iteration as unrolled CTEs",
    tags=("llm", "text", "graph", "iterative", "bench"),
)
def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_data_pipeline_engineering_spark.operators import pagerank as _pr

    teleport = (_pr.SCALE * (_pr.DAMP_DEN - _pr.DAMP_NUM)) // _pr.DAMP_DEN
    docs = spread(load_table(spark, sf_dir, "documents"))
    toked = docs.select(F.split("text", " ").alias("t"))
    und = (
        toked.select(
            F.explode(
                F.expr(
                    "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, "
                    "size(t) - 1), (a, b) -> struct(a as x, b as y))"
                )
            ).alias("p")
        )
        .filter(F.col("p.x") != F.col("p.y"))
        .select(
            F.least("p.x", "p.y").alias("a"),
            F.greatest("p.x", "p.y").alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    edges = und.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "w"
    ).unionAll(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w")
    )
    # strength folded into the edge rows ONCE (pagerank's loop-invariant
    # pattern); the vocab-bounded relation persists across rounds.
    strength = edges.groupBy("src").agg(F.sum("w").cast("long").alias("s"))
    ew = edges.join(strength, "src").localCheckpoint(eager=False)
    ranks = strength.select(
        F.col("src").alias("word"), F.lit(_pr.SCALE).cast("long").alias("rank")
    ).localCheckpoint(eager=False)
    nodes = ranks.select("word")
    for _ in range(_TR_ITERS):
        contrib = (
            ew.join(ranks, ew["src"] == ranks["word"])
            .select(
                F.col("dst"),
                F.expr("(rank DIV s) * w").alias("cpart"),
            )
            .groupBy("dst")
            .agg(F.sum("cpart").cast("long").alias("m"))
        )
        ranks = (
            nodes.join(contrib, nodes["word"] == contrib["dst"], "left")
            .select(
                "word",
                F.expr(
                    f"cast({teleport}L + ({_pr.DAMP_NUM} * "
                    f"coalesce(m, 0L)) DIV {_pr.DAMP_DEN} as long)"
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return (
        ranks.orderBy(F.col("rank").desc(), F.col("word").asc())
        .limit(_TR_TOP)
        .select("word", "rank")
    )


# --------------------------------------------------------------------------
# Shapley-value channel attribution (r09) — the game-theoretic
# multi-touch attribution marketers run over conversion paths. With the
# standard additive coalition value (v(S) = conversions whose touched
# channel set is a subset of S), the Shapley value collapses to a
# closed form: each converted path T splits its conversions EQUALLY
# among its |T| channels — phi(c) = SUM over paths T containing c of
# conv(T) / |T| (every marginal-contribution term cancels except the
# path's own uniform share). That makes the whole computation exact
# integer math: conv(T) * 1e6 DIV |T|, summed per channel.
#
# Path = the set of distinct non-purchase event types a user touched
# STRICTLY BEFORE their first purchase; converted users with no prior
# touches attribute to the '(direct)' pseudo-channel. Key identity for
# the scale plan: a type belongs to the path iff MIN(ts of that type)
# < first-purchase ts — so a (user, type) MIN pre-aggregate (map-side
# combine absorbs per-user event skew; <= |EVENT_TYPES| rows per user
# survive) replaces any events-to-first-purchase self-join, and the
# path derives from array ops over the bounded per-user type list.
# ONE fact-sized shuffle; everything after is user- then
# 2^|channels|-bounded (grid rollup, explode, channel rollup).
# --------------------------------------------------------------------------

_SHAPLEY_ORACLE = """
WITH fp AS (
  SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS pts
  FROM events WHERE event_type = 'purchase' GROUP BY 1
), pre AS (
  SELECT e.user_id, e.event_type
  FROM events e JOIN fp USING (user_id)
  WHERE CAST(e.ts AS TIMESTAMP) < fp.pts AND e.event_type <> 'purchase'
), paths0 AS (
  SELECT user_id, list_sort(list_distinct(array_agg(event_type))) AS path
  FROM pre GROUP BY 1
), allc AS (
  SELECT f.user_id, COALESCE(p.path, ['(direct)']) AS path
  FROM fp f LEFT JOIN paths0 p USING (user_id)
), grid AS (
  SELECT path, CAST(COUNT(*) AS BIGINT) AS conv FROM allc GROUP BY path
), shares AS (
  SELECT u.ch AS channel, conv, len(path) AS plen
  FROM grid, UNNEST(path) u(ch)
)
SELECT channel,
       CAST(COUNT(*) AS BIGINT) AS n_paths,
       CAST(SUM(conv) AS BIGINT) AS touched_conversions,
       CAST(SUM(conv * 1000000 // plen) AS BIGINT) AS shapley_e6
FROM shares GROUP BY channel
ORDER BY shapley_e6 DESC, channel
"""


@query(
    "shapley_attribution",
    _SHAPLEY_ORACLE,
    "Exact Shapley-value multi-touch attribution: per converted user "
    "the set of channels touched strictly before first purchase "
    "('(direct)' when none), conversions split via the closed form "
    "conv(T)*1e6 DIV |T| per member channel (the additive-coalition "
    "Shapley value, exact integers); one user-keyed aggregate over "
    "facts, then path-grid-bounded rollups",
    tags=("relational", "stats", "bench"),
)
def q_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # the ONE fact-sized shuffle: per-(user, type) first-touch times
    ut = ev.groupBy("user_id", "event_type").agg(F.min("ts").alias("mt"))
    per_user = ut.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("mt"))
        ).alias("pts"),
        # bounded by |EVENT_TYPES| entries per user
        F.collect_list(F.struct("event_type", "mt")).alias("tl"),
    )
    raw_path = F.sort_array(
        F.expr(
            "transform(filter(tl, x -> x.mt < pts AND "
            "x.event_type <> 'purchase'), x -> x.event_type)"
        )
    )
    allc = per_user.filter(F.col("pts").isNotNull()).select(
        F.when(F.size(raw_path) == 0, F.array(F.lit("(direct)")))
        .otherwise(raw_path)
        .alias("path")
    )
    grid = allc.groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("conv")
    )
    shares = grid.select(
        F.explode("path").alias("channel"),
        "conv",
        F.expr("(conv * 1000000) DIV size(path)").alias("share"),
    )
    return (
        shares.groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_paths"),
            F.sum("conv").cast("long").alias("touched_conversions"),
            F.sum("share").cast("long").alias("shapley_e6"),
        )
        .orderBy(F.col("shapley_e6").desc(), F.col("channel").asc())
    )


# --------------------------------------------------------------------------
# CUPED variance reduction (r09) — the experimentation-platform
# companion to ab_conversion_ztest: adjust the post-period spend metric
# with the pre-period spend covariate (theta from the POOLED
# regression, the standard CUPED estimator), reporting per-arm adjusted
# means and the pooled variance-reduction factor rho^2.
#
#   theta = (N*Sxy - Sx*Sy) / (N*Sxx - Sx^2)
#   mean_y_adj(arm) = mean_y(arm) - theta * (mean_x(arm) - mean_x(pooled))
#   var_reduction = rho^2 = (N*Sxy - Sx*Sy)^2
#                           / ((N*Sxx - Sx^2) * (N*Syy - Sy^2))
#
# Exactness: per-user x (pre-period purchase spend, first 3 days) and y
# (post-period) land on the 1e-4 integer grid (value is DECIMAL(14,4)
# on both engines, times 1e4); per-arm moment SUMS run in
# decimal(38,0) — per-user x*y caps at ~1e28, arm sums exact to ~1e9
# users. The N*Sxy-class products would overflow the decimal grid, so
# theta/rho^2/means are MIRRORED double expression trees over the exact
# integer sums (identical IEEE ops both sides — the cramers_v device).
# theta is scale-invariant on the e4 grid; means descale by 1e-4 at the
# end. Plan: ONE user-keyed conditional aggregate over facts (t0 rides
# a broadcast 1-row min), then a 2-row arm rollup and broadcast pooled
# scalars.
# --------------------------------------------------------------------------

_CUPED_ORACLE = f"""
WITH t0 AS (
  SELECT MIN(CAST(ts AS TIMESTAMP)) AS t0 FROM events
), per_user AS (
  SELECT user_id,
         CASE WHEN {_AB_BUCKET_SQL} = 0 THEN 'A' ELSE 'B' END AS variant,
         CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                    AND CAST(ts AS TIMESTAMP) < t.t0 + INTERVAL 3 DAY
                    THEN CAST(value AS DECIMAL(14,4)) END) * 10000, 0)
              AS BIGINT) AS x,
         CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                    AND CAST(ts AS TIMESTAMP) >= t.t0 + INTERVAL 3 DAY
                    THEN CAST(value AS DECIMAL(14,4)) END) * 10000, 0)
              AS BIGINT) AS y
  FROM events, t0 t GROUP BY user_id
), arms AS (
  SELECT variant, CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
         CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
  FROM per_user GROUP BY variant
), pooled AS (
  SELECT CAST(SUM(n) AS DOUBLE) AS nn, CAST(SUM(sx) AS DOUBLE) AS px,
         CAST(SUM(sy) AS DOUBLE) AS py, CAST(SUM(sxy) AS DOUBLE) AS pxy,
         CAST(SUM(sxx) AS DOUBLE) AS pxx, CAST(SUM(syy) AS DOUBLE) AS pyy
  FROM arms
)
SELECT variant,
       CAST(n AS BIGINT) AS n_users,
       ROUND(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 10000.0, 6)
         AS mean_y,
       ROUND((CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
              - ((nn * pxy - px * py) / (nn * pxx - px * px))
                * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) - px / nn))
             / 10000.0, 6) AS mean_y_adj,
       ROUND((nn * pxy - px * py) / (nn * pxx - px * px), 6) AS theta,
       ROUND((nn * pxy - px * py) * (nn * pxy - px * py)
             / ((nn * pxx - px * px) * (nn * pyy - py * py)), 6)
         AS var_reduction
FROM arms, pooled ORDER BY variant
"""


@query(
    "cuped_variance_reduction",
    _CUPED_ORACLE,
    "CUPED adjusted A/B means: pre-period spend covariate (first 3 "
    "days) against post-period spend, pooled theta and rho^2 variance "
    "reduction — exact 1e-4-grid integer moments per arm, mirrored "
    "double trees for the regression scalars; ONE user-keyed "
    "conditional aggregate over facts, then 2-row rollups",
    tags=("relational", "stats", "bench"),
)
def q_cuped_variance_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_data_pipeline_engineering_spark.operators.corpus import (
        md5_bucket,
    )

    ev = load_table(spark, sf_dir, "events")
    ev = ev.crossJoin(F.broadcast(ev.agg(F.min("ts").alias("t0"))))
    dec_val = F.col("value").cast("decimal(14,4)")
    pre = F.col("ts") < F.col("t0") + F.expr("INTERVAL 3 DAYS")
    is_p = F.col("event_type") == "purchase"
    per_user = ev.groupBy("user_id").agg(
        F.coalesce(
            (F.sum(F.when(is_p & pre, dec_val)) * 10000).cast("long"),
            F.lit(0).cast("long"),
        ).alias("x"),
        F.coalesce(
            (F.sum(F.when(is_p & ~pre, dec_val)) * 10000).cast("long"),
            F.lit(0).cast("long"),
        ).alias("y"),
    ).withColumn(
        "variant",
        F.when(md5_bucket("user_id", 2) == 0, F.lit("A")).otherwise(
            F.lit("B")
        ),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    arms = per_user.groupBy("variant").agg(
        dec(F.count(F.lit(1))).alias("n"),
        dec(F.sum("x")).alias("sx"),
        dec(F.sum("y")).alias("sy"),
        F.sum(dec(F.col("x")) * F.col("y")).alias("sxy"),
        F.sum(dec(F.col("x")) * F.col("x")).alias("sxx"),
        F.sum(dec(F.col("y")) * F.col("y")).alias("syy"),
    ).localCheckpoint(eager=False)
    pooled = arms.agg(
        F.sum("n").cast("double").alias("nn"),
        F.sum("sx").cast("double").alias("px"),
        F.sum("sy").cast("double").alias("py"),
        F.sum("sxy").cast("double").alias("pxy"),
        F.sum("sxx").cast("double").alias("pxx"),
        F.sum("syy").cast("double").alias("pyy"),
    )
    theta = (F.col("nn") * F.col("pxy") - F.col("px") * F.col("py")) / (
        F.col("nn") * F.col("pxx") - F.col("px") * F.col("px")
    )
    mean_y = F.col("sy").cast("double") / F.col("n").cast("double")
    mean_x = F.col("sx").cast("double") / F.col("n").cast("double")
    return (
        arms.crossJoin(F.broadcast(pooled))
        .select(
            "variant",
            F.col("n").cast("long").alias("n_users"),
            F.round(mean_y / 10000.0, 6).alias("mean_y"),
            F.round(
                (mean_y - theta * (mean_x - F.col("px") / F.col("nn")))
                / 10000.0,
                6,
            ).alias("mean_y_adj"),
            F.round(theta, 6).alias("theta"),
            F.round(
                (F.col("nn") * F.col("pxy") - F.col("px") * F.col("py"))
                * (F.col("nn") * F.col("pxy") - F.col("px") * F.col("py"))
                / (
                    (F.col("nn") * F.col("pxx") - F.col("px") * F.col("px"))
                    * (F.col("nn") * F.col("pyy") - F.col("py") * F.col("py"))
                ),
                6,
            ).alias("var_reduction"),
        )
        .orderBy("variant")
    )


# --------------------------------------------------------------------------
# Benjamini-Hochberg FDR control (r09) — multiple-testing control over
# the per-nation conversion-rate test family, the piece that makes the
# inference family honest when it runs one test PER GROUP: at alpha =
# 0.05 over 25 nations, ~1 false positive per run is EXPECTED without
# correction.
#
# Per nation: the one-proportion-vs-pooled z^2 with cleared
# denominators (the ab_conversion_ztest device, integer-exact in bp):
#   z2_bp = (c_s*N - C*n_s)^2 * N * 1e4
#           div (n_s*(N-n_s)*C*(N-C))
# BH needs p(i) <= alpha*i/m, equivalently z2(i) >= Q(1 - alpha*i/m)
# where Q is the chi-square(1) quantile — TRANSCENDENTAL, so the
# quantile ladder is computed ONCE at query-build time in Python
# (Acklam probit, squared) and embedded as the SAME bp-integer literal
# dim in both the Spark plan and the oracle: the runtime comparison is
# pure integer, no engine ever evaluates exp/erf. Discovery set =
# ranks 1..k where k = max{i : z2_bp(i) >= thr_bp(i)} (step-up rule).
# Plan: user-keyed conversion aggregate -> nation rollup (25 rows) ->
# broadcast pooled scalars + literal threshold dim; the rank window
# partitions a nation-bounded 25-row relation (dimension-bounded
# global frame, the cusum waiver class).
# --------------------------------------------------------------------------

_BH_M = 25      # nations
_BH_ALPHA_BP = 500  # alpha = 0.05 in bp


def _chi2_inv_1df(p: float) -> float:
    """Quantile of chi-square(1) at 1-p via Acklam's probit — build-time
    only (both engines receive the result as a literal)."""
    import math

    a = [-3.969683028665376e+01, 2.209460984245205e+02,
         -2.759285104469687e+02, 1.383577518672690e+02,
         -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02,
         -1.556989798598866e+02, 6.680131188771972e+01,
         -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01,
         -2.400758277161838e+00, -2.549732539343734e+00,
         4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01,
         2.445134137142996e+00, 3.754408661907416e+00]
    q = p / 2  # two-sided
    if q < 0.02425:
        t = math.sqrt(-2 * math.log(q))
        z = -((((((c[0]*t+c[1])*t+c[2])*t+c[3])*t+c[4])*t+c[5])
              / ((((d[0]*t+d[1])*t+d[2])*t+d[3])*t+1))
    else:
        u = (1 - q) - 0.5
        r = u * u
        z = ((((((a[0]*r+a[1])*r+a[2])*r+a[3])*r+a[4])*r+a[5])*u
             / (((((b[0]*r+b[1])*r+b[2])*r+b[3])*r+b[4])*r+1))
    return z * z


def _bh_thresholds() -> list[tuple[int, int]]:
    """(rank i, chi2(1) quantile at 1 - alpha*i/m, in bp)."""
    return [
        (i, int(round(_chi2_inv_1df(_BH_ALPHA_BP / 10000.0 * i / _BH_M)
                      * 10000)))
        for i in range(1, _BH_M + 1)
    ]


def _bh_oracle() -> str:
    thr_rows = ", ".join(f"({i}, {t})" for i, t in _bh_thresholds())
    return f"""
WITH per_user AS (
  SELECT e.user_id, c.c_nationkey AS nk,
         MAX(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events e JOIN customer c ON e.user_id = c.c_custkey
  GROUP BY 1, 2
), nat AS (
  SELECT nk, CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(conv) AS HUGEINT) AS c
  FROM per_user GROUP BY nk
), pooled AS (
  SELECT SUM(n) AS nn, SUM(c) AS cc FROM nat
), stats AS (
  SELECT nk, n, c,
         CASE WHEN n = nn OR cc = 0 OR cc = nn THEN 0 ELSE
           (c * nn - cc * n) * (c * nn - cc * n) * nn * 10000
           // (n * (nn - n) * cc * (nn - cc)) END AS z2_bp
  FROM nat, pooled
), ranked AS (
  SELECT nk, n, c, z2_bp,
         row_number() OVER (ORDER BY z2_bp DESC, nk) AS i
  FROM stats
), flagged AS (
  SELECT r.*, t.thr_bp,
         CASE WHEN r.z2_bp >= t.thr_bp THEN r.i ELSE 0 END AS hit_i
  FROM ranked r JOIN (VALUES {thr_rows}) t(i, thr_bp) ON r.i = t.i
), k AS (SELECT MAX(hit_i) AS k FROM flagged)
SELECT n2.n_name AS nation,
       CAST(f.n AS BIGINT) AS n_users, CAST(f.c AS BIGINT) AS conversions,
       CAST(f.z2_bp AS BIGINT) AS z2_bp,
       CAST(f.i AS INTEGER) AS rnk,
       CAST(f.thr_bp AS BIGINT) AS thr_bp,
       CAST(CASE WHEN f.i <= k.k THEN 1 ELSE 0 END AS INTEGER) AS discovery
FROM flagged f, k JOIN nation n2 ON n2.n_nationkey = f.nk
ORDER BY f.i
"""


@query(
    "bh_fdr_nation_conversion",
    _bh_oracle(),
    "Benjamini-Hochberg FDR control over the per-nation conversion-rate "
    "test family: integer-exact one-proportion z^2 in bp per nation, "
    "ranked and step-up-compared against a chi-square(1) quantile "
    "ladder embedded as bp literals (computed once at build time — no "
    "engine evaluates a transcendental at runtime); discoveries = "
    "ranks 1..k",
    tags=("relational", "stats", "bench"),
)
def q_bh_fdr_nation_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    per_user = (
        ev.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            ev["user_id"] == F.col("c_custkey"),
        )
        .groupBy("user_id", "c_nationkey")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv")
        )
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    nat = per_user.groupBy("c_nationkey").agg(
        dec(F.count(F.lit(1))).alias("n"), dec(F.sum("conv")).alias("c")
    )
    pooled = nat.agg(
        F.sum("n").alias("nn"), F.sum("c").alias("cc")
    )
    # Integer-exactness ceiling (ADVICE r09): the numerator
    # (c*nn - cc*n)^2 * nn * 10000 peaks near nn^5 * 1e4, which crosses
    # DECIMAL(38,0) when nn (total joined users) exceeds ~2e6 — past
    # that, Spark (ANSI off) NULLs while DuckDB HUGEINT raises, the same
    # asymmetric failure documented for logrank_ab_survival. At 100 TB
    # pre-scale the bp factor: fold 10000 INTO the divisor as
    # DIV (... DIV 10000) and drop one nn power by dividing (c*nn-cc*n)
    # by gcd-safe n first — kept exact here because the sf ladder tops
    # out far below the ceiling and exactness is the oracle contract.
    stats = nat.crossJoin(F.broadcast(pooled)).select(
        "c_nationkey", "n", "c",
        F.expr(
            "CASE WHEN n = nn OR cc = 0 OR cc = nn THEN CAST(0 AS "
            "DECIMAL(38,0)) ELSE (c * nn - cc * n) * (c * nn - cc * n) "
            "* nn * 10000 DIV (n * (nn - n) * cc * (nn - cc)) END"
        ).alias("z2_bp"),
    )
    # nation-bounded 25-row relation: the global rank window is the
    # dimension-bounded waiver class (cusum/bollinger family)
    ranked = stats.withColumn(
        "i",
        F.row_number().over(
            W.orderBy(F.col("z2_bp").desc(), F.col("c_nationkey").asc())
        ),
    )
    thr = spark.createDataFrame(_bh_thresholds(), "i int, thr_bp long")
    # checkpoint the 25-row flagged relation: both consumers (the k
    # scalar and the output join) would otherwise replay the whole
    # upstream subtree (the grouped_median_plan_state device)
    flagged = (
        ranked.join(F.broadcast(thr), "i")
        .withColumn(
            "hit_i",
            F.when(F.col("z2_bp") >= F.col("thr_bp"), F.col("i"))
            .otherwise(0),
        )
        .localCheckpoint(eager=False)
    )
    k = flagged.agg(F.max("hit_i").alias("k"))
    return (
        flagged.crossJoin(F.broadcast(k))
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.col("n_name").alias("nation"),
            F.col("n").cast("long").alias("n_users"),
            F.col("c").cast("long").alias("conversions"),
            F.col("z2_bp").cast("long").alias("z2_bp"),
            F.col("i").cast("int").alias("rnk"),
            F.col("thr_bp").cast("long").alias("thr_bp"),
            F.when(F.col("i") <= F.col("k"), 1).otherwise(0)
            .cast("int")
            .alias("discovery"),
        )
        .orderBy("rnk")
    )


# --------------------------------------------------------------------------
# Empirical-Bayes shrinkage (r09) — the estimation companion to the
# BH-FDR query: per-nation HIGH-VALUE conversion rates (the z-test
# family's shared value > 150 metric) shrunk toward the cross-nation
# prior by a beta-binomial fit. Method of moments over the K observed
# rates:  s = alpha + beta = m(1-m)/v - 1,  alpha = m*s,
# shrunk_i = (c_i + alpha) / (n_i + s) — small-sample groups move
# toward the prior mean, large-sample groups barely move (the standard
# CTR-smoothing estimator).
#
# Determinism: the observed rates land on the exact 1e-6 integer grid
# (r6 = c*1e6 DIV n), so the moment SUMS (S1 = sum r6, S2 = sum r6^2)
# are order-independent BIGINTs; m/v/s/alpha and the shrunk rates are
# mirrored double trees over those exact sums (the cramers_v device —
# float summation over a distributed relation would be
# order-sensitive; integer sums are not). Degenerate prior (v <= 0 or
# s <= 0) falls back to no shrinkage, guarded identically both sides.
# --------------------------------------------------------------------------

from reddit_data_pipeline_engineering_spark.plans.queries_stats2 import (  # noqa: E402
    _HV_CONV_SQL,
)

_EB_ORACLE = f"""
WITH per_user AS (
  SELECT e.user_id, c.c_nationkey AS nk,
         {_HV_CONV_SQL} AS conv
  FROM events e JOIN customer c ON e.user_id = c.c_custkey
  GROUP BY 1, 2
), nat AS (
  SELECT nk, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(conv) AS BIGINT) AS c,
         CAST(SUM(conv) AS BIGINT) * 1000000 // COUNT(*) AS r6
  FROM per_user GROUP BY nk
), mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(r6) AS BIGINT) AS s1,
         CAST(SUM(r6 * r6) AS BIGINT) AS s2
  FROM nat
), prior AS (
  SELECT k, s1, s2,
         CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE) / 1000000.0 AS m,
         (CAST(s2 AS DOUBLE)
          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE))
         / CAST(k - 1 AS DOUBLE) / 1000000000000.0 AS v
  FROM mom
), pp AS (
  SELECT m, v,
         CASE WHEN v > 0 AND m * (1 - m) / v - 1 > 0
              THEN m * (1 - m) / v - 1 ELSE 0 END AS s
  FROM prior
)
SELECT n2.n_name AS nation,
       CAST(nat.n AS BIGINT) AS n_users,
       CAST(nat.c AS BIGINT) AS conversions,
       ROUND(CAST(nat.c AS DOUBLE) / CAST(nat.n AS DOUBLE), 6) AS raw_rate,
       ROUND((CAST(nat.c AS DOUBLE) + pp.m * pp.s)
             / (CAST(nat.n AS DOUBLE) + pp.s), 6) AS shrunk_rate,
       ROUND(pp.m * pp.s, 4) AS alpha,
       ROUND((1 - pp.m) * pp.s, 4) AS beta
FROM nat, pp JOIN nation n2 ON n2.n_nationkey = nat.nk
ORDER BY nation
"""


@query(
    "eb_shrunk_conversion",
    _EB_ORACLE,
    "Empirical-Bayes beta-binomial shrinkage of per-nation high-value "
    "conversion rates: method-of-moments prior over the exact "
    "1e-6-grid rates (integer moment sums, order-independent), shrunk "
    "rates as mirrored double trees; the standard small-sample "
    "CTR-smoothing estimator next to the BH-FDR test family",
    tags=("relational", "stats", "bench"),
)
def q_eb_shrunk_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    per_user = (
        ev.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            ev["user_id"] == F.col("c_custkey"),
        )
        .groupBy("user_id", "c_nationkey")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > 150),
                    1,
                ).otherwise(0)
            ).alias("conv")
        )
    )
    nat = (
        per_user.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("conv").cast("long").alias("c"),
        )
        .withColumn("r6", F.expr("c * 1000000 DIV n"))
        .localCheckpoint(eager=False)
    )
    prior = nat.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("r6").cast("long").alias("s1"),
        F.sum(F.col("r6") * F.col("r6")).cast("long").alias("s2"),
    ).select(
        F.expr("CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE) / 1000000.0")
        .alias("m"),
        F.expr(
            "(CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)"
            " / CAST(k AS DOUBLE)) / CAST(k - 1 AS DOUBLE)"
            " / 1000000000000.0"
        ).alias("v"),
    ).select(
        "m",
        F.expr(
            "CASE WHEN v > 0 AND m * (1 - m) / v - 1 > 0"
            " THEN m * (1 - m) / v - 1 ELSE 0 END"
        ).alias("s"),
    )
    return (
        nat.crossJoin(F.broadcast(prior))
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.col("n_name").alias("nation"),
            F.col("n").alias("n_users"),
            F.col("c").alias("conversions"),
            F.round(
                F.col("c").cast("double") / F.col("n").cast("double"), 6
            ).alias("raw_rate"),
            F.round(
                (F.col("c").cast("double") + F.col("m") * F.col("s"))
                / (F.col("n").cast("double") + F.col("s")),
                6,
            ).alias("shrunk_rate"),
            F.round(F.col("m") * F.col("s"), 4).alias("alpha"),
            F.round((F.lit(1) - F.col("m")) * F.col("s"), 4).alias("beta"),
        )
        .orderBy("nation")
    )


# --------------------------------------------------------------------------
# Difference-in-differences (r09) — the quasi-experimental companion to
# CUPED: the same md5 arms and 3-day pre/post split, but estimating the
# INTERACTION effect did = (mean_B_post - mean_B_pre) -
# (mean_A_post - mean_A_pre) with its large-sample standard error from
# the four cell variances, se^2 = sum s2_cell / n_cell. Per-user
# per-period spend lands on the exact 1e-4 integer grid; per-cell
# moment sums run in decimal(38,0); did / se / t are mirrored double
# trees over the exact sums (the CUPED device). One user-keyed
# conditional aggregate over facts -> a 2-row arm relation carrying
# both period cells -> one output row.
# --------------------------------------------------------------------------

_DID_ORACLE = f"""
WITH t0 AS (
  SELECT MIN(CAST(ts AS TIMESTAMP)) AS t0 FROM events
), per_user AS (
  SELECT user_id,
         CASE WHEN {_AB_BUCKET_SQL} = 0 THEN 'A' ELSE 'B' END AS variant,
         CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                    AND CAST(ts AS TIMESTAMP) < t.t0 + INTERVAL 3 DAY
                    THEN CAST(value AS DECIMAL(14,4)) END) * 10000, 0)
              AS BIGINT) AS x,
         CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                    AND CAST(ts AS TIMESTAMP) >= t.t0 + INTERVAL 3 DAY
                    THEN CAST(value AS DECIMAL(14,4)) END) * 10000, 0)
              AS BIGINT) AS y
  FROM events, t0 t GROUP BY user_id
), arms AS (
  SELECT variant, CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
  FROM per_user GROUP BY variant
), cells AS (
  SELECT a.n AS na, a.sx AS axs, a.sy AS ays, a.sxx AS axx, a.syy AS ayy,
         b.n AS nb, b.sx AS bxs, b.sy AS bys, b.sxx AS bxx, b.syy AS byy
  FROM arms a JOIN arms b ON a.variant = 'A' AND b.variant = 'B'
)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       ROUND(CAST(axs AS DOUBLE) / CAST(na AS DOUBLE) / 10000.0, 6)
         AS mean_a_pre,
       ROUND(CAST(ays AS DOUBLE) / CAST(na AS DOUBLE) / 10000.0, 6)
         AS mean_a_post,
       ROUND(CAST(bxs AS DOUBLE) / CAST(nb AS DOUBLE) / 10000.0, 6)
         AS mean_b_pre,
       ROUND(CAST(bys AS DOUBLE) / CAST(nb AS DOUBLE) / 10000.0, 6)
         AS mean_b_post,
       ROUND(((CAST(bys AS DOUBLE) / CAST(nb AS DOUBLE)
               - CAST(bxs AS DOUBLE) / CAST(nb AS DOUBLE))
              - (CAST(ays AS DOUBLE) / CAST(na AS DOUBLE)
                 - CAST(axs AS DOUBLE) / CAST(na AS DOUBLE)))
             / 10000.0, 6) AS did,
       ROUND(((CAST(bys AS DOUBLE) / CAST(nb AS DOUBLE)
               - CAST(bxs AS DOUBLE) / CAST(nb AS DOUBLE))
              - (CAST(ays AS DOUBLE) / CAST(na AS DOUBLE)
                 - CAST(axs AS DOUBLE) / CAST(na AS DOUBLE)))
             / SQRT(
          ((CAST(axx AS DOUBLE) - CAST(axs AS DOUBLE) * CAST(axs AS DOUBLE)
            / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1)
           + (CAST(ayy AS DOUBLE) - CAST(ays AS DOUBLE) * CAST(ays AS DOUBLE)
              / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1))
          / CAST(na AS DOUBLE)
          + ((CAST(bxx AS DOUBLE) - CAST(bxs AS DOUBLE) * CAST(bxs AS DOUBLE)
              / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1)
             + (CAST(byy AS DOUBLE) - CAST(bys AS DOUBLE) * CAST(bys AS DOUBLE)
                / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1))
          / CAST(nb AS DOUBLE)), 6) AS t_stat
FROM cells
"""


@query(
    "did_spend_estimate",
    _DID_ORACLE,
    "Difference-in-differences spend estimate over the standing md5 "
    "arms and 3-day pre/post split: interaction effect with its "
    "large-sample SE from the four cell variances — exact 1e-4-grid "
    "integer moments per cell, mirrored double trees for the estimate; "
    "one user-keyed conditional aggregate, 2-row arm relation, one "
    "output row",
    tags=("relational", "stats", "bench"),
)
def q_did_spend_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_data_pipeline_engineering_spark.operators.corpus import (
        md5_bucket,
    )

    ev = load_table(spark, sf_dir, "events")
    ev = ev.crossJoin(F.broadcast(ev.agg(F.min("ts").alias("t0"))))
    dec_val = F.col("value").cast("decimal(14,4)")
    pre = F.col("ts") < F.col("t0") + F.expr("INTERVAL 3 DAYS")
    is_p = F.col("event_type") == "purchase"
    per_user = ev.groupBy("user_id").agg(
        F.coalesce(
            (F.sum(F.when(is_p & pre, dec_val)) * 10000).cast("long"),
            F.lit(0).cast("long"),
        ).alias("x"),
        F.coalesce(
            (F.sum(F.when(is_p & ~pre, dec_val)) * 10000).cast("long"),
            F.lit(0).cast("long"),
        ).alias("y"),
    ).withColumn(
        "variant",
        F.when(md5_bucket("user_id", 2) == 0, F.lit("A")).otherwise(
            F.lit("B")
        ),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    arms = per_user.groupBy("variant").agg(
        dec(F.count(F.lit(1))).alias("n"),
        dec(F.sum("x")).alias("sx"),
        dec(F.sum("y")).alias("sy"),
        F.sum(dec(F.col("x")) * F.col("x")).alias("sxx"),
        F.sum(dec(F.col("y")) * F.col("y")).alias("syy"),
    ).localCheckpoint(eager=False)
    a = arms.filter(F.col("variant") == "A").select(
        F.col("n").alias("na"), F.col("sx").alias("axs"),
        F.col("sy").alias("ays"), F.col("sxx").alias("axx"),
        F.col("syy").alias("ayy"),
    )
    b = arms.filter(F.col("variant") == "B").select(
        F.col("n").alias("nb"), F.col("sx").alias("bxs"),
        F.col("sy").alias("bys"), F.col("sxx").alias("bxx"),
        F.col("syy").alias("byy"),
    )
    cells = a.crossJoin(F.broadcast(b))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    mean = lambda s, n: d(s) / d(n)  # noqa: E731
    var = lambda s2, s, n: (  # noqa: E731
        (d(s2) - d(s) * d(s) / d(n)) / (d(n) - 1)
    )
    did = (mean("bys", "nb") - mean("bxs", "nb")) - (
        mean("ays", "na") - mean("axs", "na")
    )
    se = F.sqrt(
        (var("axx", "axs", "na") + var("ayy", "ays", "na")) / d("na")
        + (var("bxx", "bxs", "nb") + var("byy", "bys", "nb")) / d("nb")
    )
    return cells.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.round(mean("axs", "na") / 10000.0, 6).alias("mean_a_pre"),
        F.round(mean("ays", "na") / 10000.0, 6).alias("mean_a_post"),
        F.round(mean("bxs", "nb") / 10000.0, 6).alias("mean_b_pre"),
        F.round(mean("bys", "nb") / 10000.0, 6).alias("mean_b_post"),
        F.round(did / 10000.0, 6).alias("did"),
        F.round(did / se, 6).alias("t_stat"),
    )
