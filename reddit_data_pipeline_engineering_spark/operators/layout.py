"""Z-order (Morton) interleaving for multi-column data-skipping layouts.

No reference counterpart (the reference's layout story is Hive
year/month/day partitioning only — SURVEY.md §2.2 S6/S8); Z-ordering is
the standard next step at lake scale: interleave the bits of several
quantized columns into one sort key so that a range predicate on ANY of
the columns maps to a bounded set of contiguous key ranges, and parquet
row-group min/max stats prune files for all of them at once.

Scale shape: the key is a pure per-row projection (no shuffle, no UDF —
integer arithmetic only, whole-stage codegen). The intended write path is
``df.repartitionByRange(n, zkey).sortWithinPartitions(zkey).write...``:
one range exchange, then every output file covers a tight z-range, i.e.
a tight hyper-rectangle in the quantized column space. The arithmetic is
plain integer div/mod (no engine-specific bit intrinsics), so the exact
key is replayable in any SQL engine for verification.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(cols: Sequence[Column], bits: int = 4) -> Column:
    """Interleave ``bits`` low bits of each (already-quantized, non-negative
    integer) column into a Morton key.

    Bit ``i`` of column ``j`` lands at output position ``i * len(cols) + j``
    — the classic round-robin interleave; with ``bits=4`` and two columns
    the key is 8 bits wide. Columns must already be quantized to
    ``[0, 2**bits)`` (use :func:`quantize`).
    """
    n = len(cols)
    parts = []
    for j, c in enumerate(cols):
        for i in range(bits):
            # True integer ops (shiftright == floor-div for non-negative
            # longs) so the "plain integer arithmetic" replay claim holds
            # at any key width, not just small quantized values.
            bit = F.shiftright(c.cast("long"), i) % 2
            parts.append(bit * F.lit(2 ** (i * n + j)))
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out.cast("long")


def quantize(col: Column, lo: float, step: float, bits: int = 4) -> Column:
    """Clamp ``floor((col - lo) / step)`` into ``[0, 2**bits)``.

    ``lo``/``step`` are fixed literals chosen from known domain bounds, NOT
    computed from the data — a data-dependent min/max would make the key
    non-deterministic across snapshots and unreplayable by an oracle.
    """
    q = F.floor((col - F.lit(lo)) / F.lit(step)).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(2**bits - 1), q))


def hilbert_key_2d(x: Column, y: Column, bits: int = 4) -> Column:
    """Hilbert-curve index of two (already-quantized, ``[0, 2**bits)``)
    integer columns — the locality-tighter alternative to
    :func:`zorder_key`: consecutive Hilbert indices are UNIT-ADJACENT
    cells (no Morton "seam jumps"), so a range of key values maps to an
    even tighter region and parquet min/max pruning sheds more files for
    the same sort.

    This is the classic xy2d bit-level recurrence (rx/ry quadrant bits,
    ``d += s*s*((3*rx) xor ry)``, reflect+swap rotation) unrolled
    ``bits`` times as pure integer/conditional expressions — no UDF, no
    shuffle, whole-stage codegen, and exactly replayable in any SQL
    engine (the oracle mirrors each round as a chained CTE).
    """
    n = 2**bits
    xx, yy = x.cast("long"), y.cast("long")
    d = F.lit(0).cast("long")
    s = n // 2
    while s > 0:
        rx = F.when(xx.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(
            F.lit(0)
        )
        ry = F.when(yy.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(
            F.lit(0)
        )
        d = d + F.lit(s * s) * (rx * 3).bitwiseXOR(ry)
        # rot: when ry == 0 reflect (if rx == 1) then swap x and y.
        refl_x = F.when(rx == 1, F.lit(n - 1) - xx).otherwise(xx)
        refl_y = F.when(rx == 1, F.lit(n - 1) - yy).otherwise(yy)
        nxt_x = F.when(ry == 0, refl_y).otherwise(xx)
        nxt_y = F.when(ry == 0, refl_x).otherwise(yy)
        xx, yy = nxt_x, nxt_y
        s //= 2
    return d.cast("long")
