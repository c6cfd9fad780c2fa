"""Explicit Bloom-filter semi-join reduction.

No reference counterpart (the reference's joins are plain Glue joins —
SURVEY.md §2.3); this is the pattern Spark's runtime row-level filtering
applies internally for selective joins, made explicit, tunable, and
verifiable: build a compact bit-array over the small side's join keys,
broadcast it as a LITERAL (model state, like the k-means centroids), and
pre-filter the big side BEFORE the shuffle/join. At 100 TB the win is
that the filter is O(m_bits/8) bytes regardless of key count — a 100M-key
dim fits in a few MB of bits where the key set itself would not
broadcast — and the fact-side pre-filter is a map-side expression fused
into the scan, so rows that cannot match never enter the exchange.

Determinism: positions come from md5 slices of the key (k independent
hashes via a salt suffix), the same device as the split/sample queries —
an oracle replays the EXACT filter, false positives included, with a
position-set formulation (bit set <=> position present).

False positives are expected and by design: the bloom pass is always
followed by the exact join; the filter only reduces what reaches it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_BITS = 64


def _shl1(shift: Column) -> Column:
    """``1L << shift`` with a Column shift amount (the PySpark
    ``shiftleft`` wrapper only takes a literal int)."""
    return F.call_function("shiftleft", F.lit(1).cast("long"), shift)


def bloom_positions(key: Column, m_bits: int, k_hashes: int) -> list[Column]:
    """The k bit positions for one key: ``md5(key || '#' || i)`` first 8
    hex chars as an integer, mod ``m_bits``. The SHARED salted-md5 device
    for every hash family in the engine (bloom, count-min) — mirror with
    :func:`salted_md5_pos_sql` so both engines replay the same positions."""
    return [
        F.conv(
            F.substring(
                F.md5(F.concat(key.cast("string"), F.lit(f"#{i}"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % m_bits
        for i in range(k_hashes)
    ]


def salted_md5_pos_sql(key_expr: str, i: int, m_bits: int) -> str:
    """DuckDB mirror of one :func:`bloom_positions` entry."""
    return (
        f"('0x' || substr(md5(CAST({key_expr} AS VARCHAR) || '#{i}'), 1, 8))"
        f"::BIGINT % {m_bits}"
    )


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 512, k_hashes: int = 3
) -> list[int]:
    """Build the filter distributed: explode each key to its k positions,
    one tiny shuffle (``m_bits / 64`` groups) OR-ing the word masks, and
    collect only the word array — driver state is the MODEL (m_bits/8
    bytes), never the keys."""
    if m_bits % WORD_BITS:
        raise ValueError(f"m_bits {m_bits} not a multiple of {WORD_BITS}")
    pos = F.explode(
        F.array(*bloom_positions(F.col(key_col), m_bits, k_hashes))
    ).alias("pos")
    words = (
        df.select(pos)
        .select(
            (F.col("pos") / WORD_BITS).cast("int").alias("word"),
            _shl1((F.col("pos") % WORD_BITS).cast("int")).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    out = [0] * (m_bits // WORD_BITS)
    for r in words:
        out[r["word"]] = r["bits"]
    return out


def bloom_filter_rows(
    df: DataFrame,
    key: Column,
    words: list[int],
    m_bits: int,
    k_hashes: int,
) -> DataFrame:
    """Filter ``df`` to rows whose key might be in the filter, carrying
    the word array as a ONE-ROW BROADCAST RELATION instead of the
    :func:`bloom_might_contain` literal (r11): embedding m_bits/64 long
    literals k times in the predicate made codegen/planning the dominant
    cost at bench scale (measured 3.75 s -> 2.13 s for the identical
    65536-bit filter over 600k rows), and a literal also caps the filter
    size well below the broadcast path (same device as the k-means
    centroid relation — the expression tree is filter-invariant, so the
    codegen cache serves every build)."""
    wdf = df.sparkSession.createDataFrame(
        [(list(map(int, words)),)], "__bloom array<bigint>"
    )
    cond = None
    for p in bloom_positions(key, m_bits, k_hashes):
        word = F.element_at(
            F.col("__bloom"), (p / WORD_BITS).cast("int") + 1
        )
        test = word.bitwiseAND(_shl1((p % WORD_BITS).cast("int"))) != 0
        cond = test if cond is None else cond & test
    return df.crossJoin(F.broadcast(wdf)).filter(cond).drop("__bloom")


def bloom_might_contain(
    key: Column, words: list[int], m_bits: int, k_hashes: int
) -> Column:
    """Membership test as a pure JVM expression over the literal word
    array: k array lookups + bit tests, fused into the scan (map-side,
    before any exchange). True for every inserted key; false positives
    at the standard ``(1 - e^(-kn/m))^k`` rate."""
    cond = None
    lit_words = F.lit(words)
    for p in bloom_positions(key, m_bits, k_hashes):
        word = F.element_at(lit_words, (p / WORD_BITS).cast("int") + 1)
        bit = _shl1((p % WORD_BITS).cast("int"))
        test = word.bitwiseAND(bit) != 0
        cond = test if cond is None else cond & test
    return cond
