"""Round-11 wave 5: linkage, calibration, richness, and trend shapes.

Five operators extending the training-data-pipeline and inference
surface (no reference counterpart — the reference's only analytics is
the Glue projection kernel, SURVEY.md §3.2):

- ``pacf_daily`` — partial autocorrelation (lags 1..3) of the daily
  order-count series via Durbin-Levinson determinant closed forms on
  integer autocovariances (the order-k companion of ``ljung_box_daily``
  / ``durbin_watson_daily``);
- ``levenshtein_blocked_pairs`` — record-linkage near-name audit:
  (brand, first-token) blocking with a hot-block cap, built-in
  ``levenshtein`` edit distance in BOTH engines (integer-exact);
- ``chao1_vocab_richness`` — bias-corrected Chao1 species-richness
  estimate + Good-Turing unseen-probability mass per source (the
  "how much vocabulary have we NOT seen yet" companion of
  ``hapax_legomena_rate`` / ``heaps_vocab_growth``);
- ``calibration_ece_temporal`` — temporal-holdout expected calibration
  error: early-window purchase propensity per activity bin scored
  against the late-window purchase rate (the model-governance gate
  ``lift_by_score_band`` does not cover: it audits CALIBRATION, not
  ranking);
- ``jt_trend_priority`` — Jonckheere-Terpstra ordered-trend test of
  order value across the 5-level priority ordinal on a $100-banded
  value grid (the ordered-alternative upgrade of kruskal_wallis).

House rules (module contract, same as queries_r11): every output
column is integer-exact (no ln/exp/sqrt), ``div``/``//`` truncates
toward zero in BOTH engines, every aggregate is keyed unless the input
is provably bounded (calendar days, the $100 band grid, the fixed
block-key domain), big products ride DECIMAL(38,0) on the Spark side
and HUGEINT in the oracle (the ljung_box/cvm precedent), and both
expression trees mirror each other operation for operation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from reddit_data_pipeline_engineering_spark.plans.queries import REGISTRY, query
from reddit_data_pipeline_engineering_spark.sources.tables import load_table

__all__ = ["REGISTRY"]


# --------------------------------------------------------------------------
# Partial autocorrelation (lags 1..3) of the daily order counts.
# Durbin-Levinson closed forms as determinant ratios of the Toeplitz
# autocovariance matrix — every intermediate an integer:
#   c_i  = x_i - (S div n)            (floor-mean centering)
#   N_k  = sum c_i * c_{i+k}          (integer autocovariances)
#   pacf1 = N1 / N0
#   pacf2 = (N2*N0 - N1^2) / (N0^2 - N1^2)
#   pacf3 = det(A) / det(R)  with the 3x3 Yule-Walker Toeplitz system
#     det(R) = N0^3 - 2*N0*N1^2 + 2*N1^2*N2 - N0*N2^2
#     det(A) = N0^2*N3 - 2*N0*N1*N2 - N1^2*N3 + N1*N2^2 + N1^3
# Floor-mean centering (vs the x*n - S scaling of ljung_box) keeps the
# TRIPLE products inside DECIMAL(38,0)/HUGEINT up to ~sf50 (N_k ~ 1e11
# there; N^3 * 1e6 ~ 1e39 is the documented ceiling). The lead window
# is calendar-bounded behind a checkpoint (ljung_box pattern); every
# ratio is division-guarded (ADVICE r10 cvm precedent).
# --------------------------------------------------------------------------

_PACF_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
  FROM orders GROUP BY 1
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s
  FROM daily
), led AS (
  SELECT d, x,
         LEAD(x, 1) OVER (ORDER BY d) AS x1,
         LEAD(x, 2) OVER (ORDER BY d) AS x2,
         LEAD(x, 3) OVER (ORDER BY d) AS x3
  FROM daily
), cent AS (
  SELECT CAST(x - (s // n) AS HUGEINT) AS c,
         CAST(x1 - (s // n) AS HUGEINT) AS c1,
         CAST(x2 - (s // n) AS HUGEINT) AS c2,
         CAST(x3 - (s // n) AS HUGEINT) AS c3,
         n
  FROM led CROSS JOIN tot
), m AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n,
         SUM(c * c) AS n0,
         SUM(CASE WHEN c1 IS NULL THEN 0 ELSE c * c1 END) AS n1,
         SUM(CASE WHEN c2 IS NULL THEN 0 ELSE c * c2 END) AS n2,
         SUM(CASE WHEN c3 IS NULL THEN 0 ELSE c * c3 END) AS n3
  FROM cent
)
SELECT n AS n_days,
       CAST(n0 AS BIGINT) AS ss_centered,
       CASE WHEN n0 = 0 THEN 0
            ELSE CAST(n1 * 1000000 // n0 AS BIGINT) END AS pacf1_e6,
       CASE WHEN n0 * n0 - n1 * n1 = 0 THEN 0
            ELSE CAST((n2 * n0 - n1 * n1) * 1000000
                      // (n0 * n0 - n1 * n1) AS BIGINT) END AS pacf2_e6,
       CASE WHEN n0 * n0 * n0 - 2 * n0 * n1 * n1
                 + 2 * n1 * n1 * n2 - n0 * n2 * n2 = 0 THEN 0
            ELSE CAST((n0 * n0 * n3 - 2 * n0 * n1 * n2 - n1 * n1 * n3
                       + n1 * n2 * n2 + n1 * n1 * n1) * 1000000
                      // (n0 * n0 * n0 - 2 * n0 * n1 * n1
                          + 2 * n1 * n1 * n2 - n0 * n2 * n2) AS BIGINT)
       END AS pacf3_e6
FROM m
"""


@query(
    "pacf_daily",
    _PACF_ORACLE,
    "Partial autocorrelation lags 1..3 of the daily order counts via "
    "Durbin-Levinson determinant closed forms on integer floor-mean-"
    "centered autocovariances (x1e6, division-guarded; triple products "
    "on DECIMAL(38,0)/HUGEINT, ljung_box precedent) — the AR-order "
    "diagnostic acf_lag_profile cannot give; calendar-bounded lead "
    "window behind a checkpoint",
    tags=("relational", "stats", "timeseries", "bench"),
)
def q_pacf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    w = Window.orderBy("d")
    led = daily.select(
        "d",
        "x",
        *[F.lead("x", k).over(w).alias(f"x{k}") for k in (1, 2, 3)],
    ).localCheckpoint(eager=False)  # calendar-bounded series
    tot = led.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    dec = "decimal(38,0)"
    cent = led.crossJoin(F.broadcast(tot)).select(
        F.expr(f"CAST(x - (s div n) AS {dec})").alias("c"),
        *[F.expr(f"CAST(x{k} - (s div n) AS {dec})").alias(f"c{k}")
          for k in (1, 2, 3)],
        "n",
    )
    m = cent.groupBy("n").agg(
        F.expr(f"CAST(SUM(c * c) AS {dec})").alias("n0"),
        *[F.expr(
            f"CAST(SUM(CASE WHEN c{k} IS NULL THEN CAST(0 AS {dec}) "
            f"ELSE c * c{k} END) AS {dec})"
          ).alias(f"n{k}") for k in (1, 2, 3)],
    )
    return m.select(
        F.col("n").alias("n_days"),
        F.expr("CAST(n0 AS BIGINT)").alias("ss_centered"),
        F.expr(
            "CASE WHEN n0 = 0 THEN 0 "
            "ELSE CAST(n1 * 1000000 div n0 AS BIGINT) END"
        ).alias("pacf1_e6"),
        F.expr(
            "CASE WHEN n0 * n0 - n1 * n1 = 0 THEN 0 "
            "ELSE CAST((n2 * n0 - n1 * n1) * 1000000 "
            "div (n0 * n0 - n1 * n1) AS BIGINT) END"
        ).alias("pacf2_e6"),
        F.expr(
            "CASE WHEN n0 * n0 * n0 - 2 * n0 * n1 * n1 "
            "+ 2 * n1 * n1 * n2 - n0 * n2 * n2 = 0 THEN 0 "
            "ELSE CAST((n0 * n0 * n3 - 2 * n0 * n1 * n2 - n1 * n1 * n3 "
            "+ n1 * n2 * n2 + n1 * n1 * n1) * 1000000 "
            "div (n0 * n0 * n0 - 2 * n0 * n1 * n1 "
            "+ 2 * n1 * n1 * n2 - n0 * n2 * n2) AS BIGINT) END"
        ).alias("pacf3_e6"),
    )


# --------------------------------------------------------------------------
# Blocked Levenshtein near-name audit over part names. The record-
# linkage primitive: candidate pairs form ONLY inside (p_brand, first
# name token) blocks — a FIXED key domain (~25 x ~30), so the pair
# space is sum-of-block-squares, never corpus². Hot blocks
# above the cap are dropped WITH an in-plan drop count (the simhash
# hot-bucket precedent); blocking recall loss is the documented
# record-linkage tradeoff. Edit distance is the built-in levenshtein
# in BOTH engines — integer-exact, no mirroring hazard. Block sizes
# come from a key-domain-bounded aggregate that broadcasts back.
# Blocks stay under the 512 cap through ~sf1.9 (sf1.0 measured:
# ~267 parts/block, 26.5M in-block comparisons, 0.77 s wall); the
# documented move at larger sf is widening the key (add p_size or
# p_type) — loud in the n_hot_blocks_dropped column, never silent.
# --------------------------------------------------------------------------

_LEV_CAP = 512  # max parts per block admitted to pairing

_LEV_ORACLE = f"""
WITH named AS (
  SELECT p_partkey, p_brand, p_name,
         split_part(p_name, ' ', 1) AS tok0
  FROM part
), sized AS (
  SELECT p_brand, tok0, CAST(COUNT(*) AS BIGINT) AS bs
  FROM named GROUP BY 1, 2
), kept AS (
  SELECT n.p_partkey, n.p_brand, n.tok0, n.p_name
  FROM named n
  JOIN sized s ON s.p_brand = n.p_brand AND s.tok0 = n.tok0
  WHERE s.bs <= {_LEV_CAP}
), scored AS (
  SELECT levenshtein(a.p_name, b.p_name) AS dist
  FROM kept a
  JOIN kept b ON a.p_brand = b.p_brand AND a.tok0 = b.tok0
            AND a.p_partkey < b.p_partkey
), blocks AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
         CAST(SUM(CASE WHEN bs > {_LEV_CAP} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hot_blocks_dropped
  FROM sized
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_cand_pairs,
         CAST(COALESCE(SUM(CASE WHEN dist = 0 THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS n_exact_name,
         CAST(COALESCE(SUM(CASE WHEN dist <= 2 THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS n_d_le2,
         CAST(COALESCE(SUM(CASE WHEN dist <= 4 THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS n_d_le4,
         CAST(COALESCE(MIN(dist), -1) AS BIGINT) AS min_dist
  FROM scored
)
SELECT b.n_blocks, b.n_hot_blocks_dropped, a.n_cand_pairs,
       a.n_exact_name, a.n_d_le2, a.n_d_le4, a.min_dist
FROM blocks b CROSS JOIN agg a
"""


@query(
    "levenshtein_blocked_pairs",
    _LEV_ORACLE,
    "Record-linkage near-name audit: Levenshtein edit distance (built-"
    "in in both engines, integer-exact) over candidate pairs blocked "
    "by (brand, first name token) — a fixed ~750-block key domain, so "
    "pairs are sum-of-block-squares never corpus²; hot blocks above "
    f"{_LEV_CAP} drop with an in-plan count (simhash precedent)",
    tags=("relational", "dedup", "llm", "bench"),
)
def q_levenshtein_blocked_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    named = part.select(
        "p_partkey",
        "p_brand",
        "p_name",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("tok0"),
    ).localCheckpoint(eager=False)  # block sizing + pairing both read it
    keys = ["p_brand", "tok0"]
    sized = named.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("bs")
    ).localCheckpoint(eager=False)  # block audit + admission filter
    kept = named.join(
        F.broadcast(sized.filter(F.col("bs") <= _LEV_CAP).select(*keys)),
        keys,
        "left_semi",
    )
    a = kept.select(
        *keys,
        F.col("p_partkey").alias("ka"),
        F.col("p_name").alias("na"),
    )
    b = kept.select(
        *keys,
        F.col("p_partkey").alias("kb"),
        F.col("p_name").alias("nb"),
    )
    scored = (
        a.join(b, keys)
        .filter(F.col("ka") < F.col("kb"))
        .select(F.levenshtein(F.col("na"), F.col("nb")).alias("dist"))
    )
    blocks = sized.agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum(F.when(F.col("bs") > _LEV_CAP, 1).otherwise(0))
        .cast("long")
        .alias("n_hot_blocks_dropped"),
    )
    agg = scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_cand_pairs"),
        F.coalesce(
            F.sum(F.when(F.col("dist") == 0, 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("n_exact_name"),
        F.coalesce(
            F.sum(F.when(F.col("dist") <= 2, 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("n_d_le2"),
        F.coalesce(
            F.sum(F.when(F.col("dist") <= 4, 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("n_d_le4"),
        F.coalesce(F.min("dist"), F.lit(-1)).cast("long").alias("min_dist"),
    )
    return blocks.crossJoin(F.broadcast(agg)).select(
        "n_blocks",
        "n_hot_blocks_dropped",
        "n_cand_pairs",
        "n_exact_name",
        "n_d_le2",
        "n_d_le4",
        "min_dist",
    )


# --------------------------------------------------------------------------
# Chao1 species-richness + Good-Turing unseen mass per source (plus the
# pooled 'ALL' row — hapax pattern). Bias-corrected Chao1 is division-
# safe by construction: chao1 = V + F1(F1-1)/(2(F2+1)), F2+1 >= 1.
# Good-Turing P0 = F1/N is the probability the NEXT token is unseen —
# the "is this source exhausted" signal a corpus curator reads next to
# heaps_vocab_growth's rate estimate. One (source, token) count shuffle
# + a token-level re-aggregate, both key-bounded.
# --------------------------------------------------------------------------

from reddit_data_pipeline_engineering_spark.plans.queries_llm import (  # noqa: E402
    _TOKS,
)

_CHAO1_ORACLE = f"""
WITH toks AS (
  SELECT source, unnest({_TOKS}) AS tok FROM documents
), per_src AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks GROUP BY source, tok
), src_stats AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS vocab,
         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
         CAST(SUM(c) AS BIGINT) AS n_tokens
  FROM per_src GROUP BY source
), all_tok AS (
  SELECT tok, CAST(SUM(c) AS BIGINT) AS c FROM per_src GROUP BY tok
), all_stats AS (
  SELECT 'ALL' AS source,
         CAST(COUNT(*) AS BIGINT) AS vocab,
         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
         CAST(SUM(c) AS BIGINT) AS n_tokens
  FROM all_tok
), unioned AS (
  SELECT * FROM src_stats UNION ALL SELECT * FROM all_stats
)
SELECT source, vocab, f1, f2, n_tokens,
       CAST(vocab * 100 + f1 * (f1 - 1) * 100 // (2 * (f2 + 1)) AS BIGINT)
         AS chao1_x100,
       CAST(f1 * 10000 // n_tokens AS BIGINT) AS gt_unseen_bp
FROM unioned ORDER BY source
"""


@query(
    "chao1_vocab_richness",
    _CHAO1_ORACLE,
    "Bias-corrected Chao1 species-richness estimate (x100) + Good-"
    "Turing unseen-probability mass (bp) per source and pooled 'ALL': "
    "how much vocabulary the corpus has NOT yet seen — the curation "
    "companion of hapax_legomena_rate/heaps_vocab_growth; one (source, "
    "token) count shuffle + a token-level re-aggregate, division-safe "
    "by the F2+1 correction",
    tags=("llm", "text", "quality", "bench"),
)
def q_chao1_vocab_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_data_pipeline_engineering_spark.functions.text import tokens
    from reddit_data_pipeline_engineering_spark.sources.tables import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select("source", F.explode(tokens("text")).alias("tok"))
    per_src = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).localCheckpoint(eager=False)  # source rollup + token re-agg
    f1 = F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long")
    f2 = F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).cast("long")
    src_stats = per_src.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("vocab"),
        f1.alias("f1"),
        f2.alias("f2"),
        F.sum("c").cast("long").alias("n_tokens"),
    )
    all_tok = per_src.groupBy("tok").agg(F.sum("c").cast("long").alias("c"))
    all_stats = all_tok.agg(
        F.lit("ALL").alias("source"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        f1.alias("f1"),
        f2.alias("f2"),
        F.sum("c").cast("long").alias("n_tokens"),
    )
    return (
        src_stats.unionByName(all_stats)
        .select(
            "source",
            "vocab",
            "f1",
            "f2",
            "n_tokens",
            F.expr(
                "CAST(vocab * 100 + f1 * (f1 - 1) * 100 "
                "div (2 * (f2 + 1)) AS BIGINT)"
            ).alias("chao1_x100"),
            F.expr("CAST(f1 * 10000 div n_tokens AS BIGINT)").alias(
                "gt_unseen_bp"
            ),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Temporal-holdout expected calibration error. The epoch-week range
# splits at its midpoint: the EARLY window fits a per-bin propensity
# (bin = early activity RELATIVE to the mean, least(e*4*nu div te, 9)
# — mean lands in bin 4, bounded 0..9 and scale-invariant where a
# fixed count cap saturates and a log2 bucket collapses; conf_b =
# share of bin-b users who purchased early), the LATE window scores it
# (acc_b = share who purchased late). Integer identity: n_b * |conf_b
# - acc_b| = |early_purchasers_b - late_purchasers_b|, so ECE_ppm =
# sum_b |e_b - l_b| * 1e6 div N with zero rationals. Per-bin rows +
# the 'ALL' ECE row. One user-keyed shuffle + a 10-bin rollup; the
# week boundary and the activity mean are broadcast scalars.
# --------------------------------------------------------------------------

_WEEK_US = 604_800_000_000

_ECE_ORACLE = f"""
WITH ev AS (
  SELECT user_id, event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) // {_WEEK_US} AS wk
  FROM events
), bounds AS (
  SELECT MIN(wk) AS w0, MAX(wk) AS w1 FROM ev
), tagged AS (
  SELECT e.user_id, e.event_type,
         CASE WHEN e.wk <= (b.w0 + b.w1) // 2 THEN 1 ELSE 0 END AS early
  FROM ev e CROSS JOIN bounds b
), per_user AS (
  SELECT user_id,
         CAST(SUM(early) AS BIGINT) AS ev_early,
         CAST(MAX(CASE WHEN early = 1 AND event_type = 'purchase'
                  THEN 1 ELSE 0 END) AS BIGINT) AS p_early,
         CAST(MAX(CASE WHEN early = 0 AND event_type = 'purchase'
                  THEN 1 ELSE 0 END) AS BIGINT) AS p_late
  FROM tagged GROUP BY user_id
  HAVING SUM(early) > 0
), act AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nu,
         CAST(SUM(ev_early) AS BIGINT) AS te
  FROM per_user
), binned AS (
  SELECT lpad(CAST(LEAST(p.ev_early * 4 * a.nu // a.te, 9) AS VARCHAR),
              2, '0') AS bin,
         CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(p.p_early) AS BIGINT) AS conf_users,
         CAST(SUM(p.p_late) AS BIGINT) AS acc_users
  FROM per_user p CROSS JOIN act a GROUP BY 1
), unioned AS (
  SELECT bin, n_users, conf_users, acc_users,
         CAST(ABS(conf_users - acc_users) * 1000000 // n_users AS BIGINT)
           AS gap_ppm
  FROM binned
  UNION ALL
  SELECT 'ALL', CAST(SUM(n_users) AS BIGINT),
         CAST(SUM(conf_users) AS BIGINT), CAST(SUM(acc_users) AS BIGINT),
         CAST(SUM(ABS(conf_users - acc_users)) * 1000000
              // SUM(n_users) AS BIGINT)
  FROM binned
)
SELECT bin, n_users, conf_users, acc_users,
       CAST(conf_users * 1000000 // n_users AS BIGINT) AS conf_ppm,
       CAST(acc_users * 1000000 // n_users AS BIGINT) AS acc_ppm,
       gap_ppm
FROM unioned ORDER BY bin
"""


@query(
    "calibration_ece_temporal",
    _ECE_ORACLE,
    "Temporal-holdout expected calibration error: early-half purchase "
    "propensity per activity bin (early event count relative to the "
    "mean, least(e*4*nu div te, 9) — bounded 0..9, scale-invariant) "
    "scored against the late-half purchase rate; "
    "ECE_ppm = sum|early_p - late_p|*1e6 div N rides the integer "
    "identity n_b*|conf-acc| = |e_b - l_b| — calibration governance "
    "lift_by_score_band's ranking audit does not cover; one user "
    "shuffle + a bounded-bin rollup, epoch-week midpoint split",
    tags=("relational", "stats", "audit", "bench"),
)
def q_calibration_ece_temporal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
            f" ts) div {_WEEK_US}"
        ).alias("wk"),
    )
    bounds = ev.agg(
        F.min("wk").alias("w0"), F.max("wk").alias("w1")
    )
    tagged = ev.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        "event_type",
        F.expr(
            "CASE WHEN wk <= (w0 + w1) div 2 THEN 1 ELSE 0 END"
        ).alias("early"),
    )
    per_user = (
        tagged.groupBy("user_id")
        .agg(
            F.sum("early").cast("long").alias("ev_early"),
            F.max(
                F.when(
                    (F.col("early") == 1)
                    & (F.col("event_type") == "purchase"),
                    1,
                ).otherwise(0)
            ).cast("long").alias("p_early"),
            F.max(
                F.when(
                    (F.col("early") == 0)
                    & (F.col("event_type") == "purchase"),
                    1,
                ).otherwise(0)
            ).cast("long").alias("p_late"),
        )
        .filter(F.col("ev_early") > 0)
        .localCheckpoint(eager=False)  # activity scalars + bin rollup
    )
    act = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("nu"),
        F.sum("ev_early").cast("long").alias("te"),
    )
    binned = (
        per_user.crossJoin(F.broadcast(act))
        .groupBy(
            F.expr(
                "lpad(CAST(LEAST(ev_early * 4 * nu div te, 9) AS STRING), "
                "2, '0')"
            ).alias("bin")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("p_early").cast("long").alias("conf_users"),
            F.sum("p_late").cast("long").alias("acc_users"),
        )
        .localCheckpoint(eager=False)  # per-bin rows + the ALL fold
    )
    per_bin = binned.select(
        "bin",
        "n_users",
        "conf_users",
        "acc_users",
        F.expr(
            "CAST(ABS(conf_users - acc_users) * 1000000 div n_users "
            "AS BIGINT)"
        ).alias("gap_ppm"),
    )
    all_row = binned.agg(
        F.lit("ALL").alias("bin"),
        F.sum("n_users").cast("long").alias("n_users"),
        F.sum("conf_users").cast("long").alias("conf_users"),
        F.sum("acc_users").cast("long").alias("acc_users"),
        F.expr(
            "CAST(SUM(ABS(conf_users - acc_users)) * 1000000 "
            "div SUM(n_users) AS BIGINT)"
        ).alias("gap_ppm"),
    )
    return (
        per_bin.unionByName(all_row)
        .select(
            "bin",
            "n_users",
            "conf_users",
            "acc_users",
            F.expr(
                "CAST(conf_users * 1000000 div n_users AS BIGINT)"
            ).alias("conf_ppm"),
            F.expr(
                "CAST(acc_users * 1000000 div n_users AS BIGINT)"
            ).alias("acc_ppm"),
            "gap_ppm",
        )
        .orderBy("bin")
    )


# --------------------------------------------------------------------------
# Jonckheere-Terpstra ordered-trend test: does order VALUE rise
# monotonically with the 5-level priority ordinal? Values live on a
# $100 band grid (cents div 10000 — domain-bounded, the skyline/cvm
# waiver class), so each pairwise Mann-Whitney count folds over the
# banded histogram, never over row pairs. Doubled statistic JT2 =
# sum_{i<j} [2*(#less pairs) + (#band-tie pairs)] keeps half-tie
# credits integer; E[JT2] = sum_{i<j} n_i*n_j exactly; z^2 x 1e6 uses
# the standard no-ties variance V = [N^2(2N+3) - sum n_i^2(2n_i+3)]/72
# (ties note in docstring), so z2_e6 = (JT2-M2)^2 * 18e6 div V72.
# Big products ride DECIMAL(38,0)/HUGEINT.
# --------------------------------------------------------------------------

_JT_BAND_CENTS = 10_000  # $100 value bands

_JT_PAIR_TERMS_SQL = (
    "c2 * (2 * l1 + c1) + "
    "c3 * ((2 * l1 + c1) + (2 * l2 + c2)) + "
    "c4 * ((2 * l1 + c1) + (2 * l2 + c2) + (2 * l3 + c3)) + "
    "c5 * ((2 * l1 + c1) + (2 * l2 + c2) + (2 * l3 + c3) + (2 * l4 + c4))"
)

_JT_ORACLE = f"""
WITH cells AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
           // {_JT_BAND_CENTS} AS band,
         CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS pri,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY 1, 2
), grid AS (
  SELECT band,
         CAST(SUM(CASE WHEN pri = 1 THEN c ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN pri = 2 THEN c ELSE 0 END) AS BIGINT) AS c2,
         CAST(SUM(CASE WHEN pri = 3 THEN c ELSE 0 END) AS BIGINT) AS c3,
         CAST(SUM(CASE WHEN pri = 4 THEN c ELSE 0 END) AS BIGINT) AS c4,
         CAST(SUM(CASE WHEN pri = 5 THEN c ELSE 0 END) AS BIGINT) AS c5
  FROM cells GROUP BY band
), cum AS (
  SELECT band, c1, c2, c3, c4, c5,
         COALESCE(SUM(c1) OVER w, 0) AS l1,
         COALESCE(SUM(c2) OVER w, 0) AS l2,
         COALESCE(SUM(c3) OVER w, 0) AS l3,
         COALESCE(SUM(c4) OVER w, 0) AS l4
  FROM grid
  WINDOW w AS (ORDER BY band
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), tots AS (
  SELECT CAST(SUM(c1) AS HUGEINT) AS n1, CAST(SUM(c2) AS HUGEINT) AS n2,
         CAST(SUM(c3) AS HUGEINT) AS n3, CAST(SUM(c4) AS HUGEINT) AS n4,
         CAST(SUM(c5) AS HUGEINT) AS n5
  FROM grid
), jt AS (
  SELECT CAST(SUM({_JT_PAIR_TERMS_SQL}) AS HUGEINT) AS jt2 FROM cum
), stats AS (
  SELECT jt2,
         n1 + n2 + n3 + n4 + n5 AS n,
         n1 * n2 + n1 * n3 + n1 * n4 + n1 * n5 + n2 * n3 + n2 * n4
           + n2 * n5 + n3 * n4 + n3 * n5 + n4 * n5 AS m2,
         n1, n2, n3, n4, n5
  FROM jt CROSS JOIN tots
)
SELECT CAST(n AS BIGINT) AS n_orders,
       CAST(jt2 AS BIGINT) AS jt2_stat,
       CAST(m2 AS BIGINT) AS jt2_mean,
       CAST((n * n * (2 * n + 3)
             - (n1 * n1 * (2 * n1 + 3) + n2 * n2 * (2 * n2 + 3)
                + n3 * n3 * (2 * n3 + 3) + n4 * n4 * (2 * n4 + 3)
                + n5 * n5 * (2 * n5 + 3))) AS BIGINT) AS v72,
       CASE WHEN n * n * (2 * n + 3)
                 - (n1 * n1 * (2 * n1 + 3) + n2 * n2 * (2 * n2 + 3)
                    + n3 * n3 * (2 * n3 + 3) + n4 * n4 * (2 * n4 + 3)
                    + n5 * n5 * (2 * n5 + 3)) = 0 THEN 0
            ELSE CAST((jt2 - m2) * (jt2 - m2) * 18000000
                      // (n * n * (2 * n + 3)
                          - (n1 * n1 * (2 * n1 + 3)
                             + n2 * n2 * (2 * n2 + 3)
                             + n3 * n3 * (2 * n3 + 3)
                             + n4 * n4 * (2 * n4 + 3)
                             + n5 * n5 * (2 * n5 + 3))) AS BIGINT)
       END AS jt_z2_e6
FROM stats
"""


@query(
    "jt_trend_priority",
    _JT_ORACLE,
    "Jonckheere-Terpstra ordered-trend test of order value across the "
    "5-level priority ordinal on a $100 band grid (domain-bounded "
    "cumulative window, skyline/cvm waiver class): doubled statistic "
    "JT2 keeps half-tie credits integer, E[JT2] = sum n_i*n_j exact, "
    "z^2 x1e6 from the standard /72 variance (no-ties form, banded "
    "ties documented) — the ordered-alternative upgrade of "
    "kruskal_wallis_lengths; big products on DECIMAL(38,0)/HUGEINT",
    tags=("relational", "stats", "bench"),
)
def q_jt_trend_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cells = (
        orders.select(
            F.expr(
                f"CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
                f" div {_JT_BAND_CENTS}"
            ).alias("band"),
            F.expr("CAST(substr(o_orderpriority, 1, 1) AS BIGINT)").alias(
                "pri"
            ),
        )
        .groupBy("band", "pri")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    grid = (
        cells.groupBy("band")
        .agg(
            *[
                F.sum(F.when(F.col("pri") == i, F.col("c")).otherwise(0))
                .cast("long")
                .alias(f"c{i}")
                for i in (1, 2, 3, 4, 5)
            ]
        )
        .localCheckpoint(eager=False)  # band-bounded grid: cum + totals
    )
    w = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, -1)
    cum = grid.select(
        "band",
        "c1",
        "c2",
        "c3",
        "c4",
        "c5",
        *[
            F.coalesce(F.sum(f"c{i}").over(w), F.lit(0)).alias(f"l{i}")
            for i in (1, 2, 3, 4)
        ],
    )
    dec = "decimal(38,0)"
    jt = cum.agg(
        F.expr(f"CAST(SUM({_JT_PAIR_TERMS_SQL}) AS {dec})").alias("jt2")
    )
    tots = grid.agg(
        *[
            F.expr(f"CAST(SUM(c{i}) AS {dec})").alias(f"n{i}")
            for i in (1, 2, 3, 4, 5)
        ]
    )
    v72_sql = (
        "n * n * (2 * n + 3) - (n1 * n1 * (2 * n1 + 3) "
        "+ n2 * n2 * (2 * n2 + 3) + n3 * n3 * (2 * n3 + 3) "
        "+ n4 * n4 * (2 * n4 + 3) + n5 * n5 * (2 * n5 + 3))"
    )
    stats = (
        jt.crossJoin(F.broadcast(tots))
        .withColumn("n", F.expr("n1 + n2 + n3 + n4 + n5"))
        .withColumn(
            "m2",
            F.expr(
                "n1 * n2 + n1 * n3 + n1 * n4 + n1 * n5 + n2 * n3 "
                "+ n2 * n4 + n2 * n5 + n3 * n4 + n3 * n5 + n4 * n5"
            ),
        )
    )
    return stats.select(
        F.expr("CAST(n AS BIGINT)").alias("n_orders"),
        F.expr("CAST(jt2 AS BIGINT)").alias("jt2_stat"),
        F.expr("CAST(m2 AS BIGINT)").alias("jt2_mean"),
        F.expr(f"CAST({v72_sql} AS BIGINT)").alias("v72"),
        F.expr(
            f"CASE WHEN {v72_sql} = 0 THEN 0 "
            f"ELSE CAST((jt2 - m2) * (jt2 - m2) * 18000000 "
            f"div ({v72_sql}) AS BIGINT) END"
        ).alias("jt_z2_e6"),
    )
