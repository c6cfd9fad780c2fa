"""EPA AQI as native column expressions — the reference's unshipped plan.

Reference: ``doc/archive/AQI Calculation Implementation Plan.md`` specified
three row-at-a-time Python UDFs (aqi, dominant_pollutant, aqi_level) that
were never implemented (``glue_jobs/aqi_calculator.py`` does not exist —
SURVEY.md §2.10). The engine implements the same semantics as pure
``when()/greatest()`` expression chains over the EPA breakpoint table:
Catalyst-optimizable, whole-stage-codegen'd, zero serialization cost — the
right shape for a 100 TB scan.

Edge-case contract (plan lines 69-73): missing pollutants -> AQI from the
available ones; all-null -> NULL AQI + 'Unknown' level; negative values
skipped (treated as missing); > 500 uncapped (last bracket's line
extrapolates).

Both a Spark ``Column`` and an equivalent ANSI-SQL string are generated
from the *same* breakpoint table, so oracle verification checks the exact
expression semantics, not a reimplementation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# pollutant -> [(C_lo, C_hi, I_lo, I_hi)], EPA 2012/2018 tables as cited in
# the reference plan (breakpoints table, plan lines 41-49).
BREAKPOINTS: dict[str, list[tuple[float, float, int, int]]] = {
    "pm25": [
        (0.0, 12.0, 0, 50), (12.1, 35.4, 51, 100), (35.5, 55.4, 101, 150),
        (55.5, 150.4, 151, 200), (150.5, 250.4, 201, 300),
        (250.5, 350.4, 301, 400), (350.5, 500.4, 401, 500),
    ],
    "pm10": [
        (0.0, 54.0, 0, 50), (55.0, 154.0, 51, 100), (155.0, 254.0, 101, 150),
        (255.0, 354.0, 151, 200), (355.0, 424.0, 201, 300),
        (425.0, 504.0, 301, 400), (505.0, 604.0, 401, 500),
    ],
    "o3": [
        (0.0, 54.0, 0, 50), (55.0, 70.0, 51, 100), (71.0, 85.0, 101, 150),
        (86.0, 105.0, 151, 200), (106.0, 200.0, 201, 300),
    ],
    "no2": [
        (0.0, 53.0, 0, 50), (54.0, 100.0, 51, 100), (101.0, 360.0, 101, 150),
        (361.0, 649.0, 151, 200), (650.0, 1249.0, 201, 300),
        (1250.0, 1649.0, 301, 400), (1650.0, 2049.0, 401, 500),
    ],
    "so2": [
        (0.0, 35.0, 0, 50), (36.0, 75.0, 51, 100), (76.0, 185.0, 101, 150),
        (186.0, 304.0, 151, 200), (305.0, 604.0, 201, 300),
        (605.0, 804.0, 301, 400), (805.0, 1004.0, 401, 500),
    ],
    "co": [
        (0.0, 4.4, 0, 50), (4.5, 9.4, 51, 100), (9.5, 12.4, 101, 150),
        (12.5, 15.4, 151, 200), (15.5, 30.4, 201, 300),
        (30.5, 40.4, 301, 400), (40.5, 50.4, 401, 500),
    ],
}

AQI_POLLUTANTS = tuple(BREAKPOINTS)  # 6 pollutants; `bc` has no EPA AQI

LEVELS = [
    (50, "Good"), (100, "Moderate"), (150, "Unhealthy for Sensitive Groups"),
    (200, "Unhealthy"), (300, "Very Unhealthy"),
]
HAZARDOUS = "Hazardous"


def _linear(c: Column, lo: float, hi: float, ilo: int, ihi: int) -> Column:
    # Mirrors sql_subindex term-for-term so Spark and DuckDB produce
    # bit-identical doubles.
    return (
        (F.lit(float(ihi)) - F.lit(float(ilo)))
        / (F.lit(hi) - F.lit(lo))
        * (c - F.lit(lo))
        + F.lit(float(ilo))
    )


def subindex(col: Column | str, pollutant: str) -> Column:
    """Per-pollutant AQI sub-index; NULL for null/negative concentration."""
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    bps = BREAKPOINTS[pollutant]
    expr = F.when(c.isNull() | (c < 0), F.lit(None).cast("double"))
    for lo, hi, ilo, ihi in bps[:-1]:
        expr = expr.when(c <= F.lit(hi), _linear(c, lo, hi, ilo, ihi))
    lo, hi, ilo, ihi = bps[-1]
    return expr.otherwise(_linear(c, lo, hi, ilo, ihi))  # >500 uncapped


def sql_subindex(expr: str, pollutant: str) -> str:
    """DuckDB/ANSI SQL mirror of :func:`subindex` (same literal order)."""
    bps = BREAKPOINTS[pollutant]
    parts = [
        f"WHEN ({expr} IS NULL OR {expr} < 0) THEN CAST(NULL AS DOUBLE)"
    ]
    for lo, hi, ilo, ihi in bps[:-1]:
        parts.append(
            f"WHEN {expr} <= {hi!r} THEN "
            f"({float(ihi)!r} - {float(ilo)!r}) / ({hi!r} - {lo!r})"
            f" * ({expr} - {lo!r}) + {float(ilo)!r}"
        )
    lo, hi, ilo, ihi = bps[-1]
    parts.append(
        f"ELSE ({float(ihi)!r} - {float(ilo)!r}) / ({hi!r} - {lo!r})"
        f" * ({expr} - {lo!r}) + {float(ilo)!r}"
    )
    return "CASE " + " ".join(parts) + " END"


def overall_aqi(sub: dict[str, Column]) -> Column:
    """Max over available sub-indexes; NULL when all are NULL.

    greatest() ignores NULLs (both Spark and DuckDB), giving the
    missing-pollutant contract for free.
    """
    return F.greatest(*sub.values()) if len(sub) > 1 else next(iter(sub.values()))


def dominant_pollutant(aqi: Column, sub: dict[str, Column]) -> Column:
    """First pollutant (table order) whose sub-index equals the overall AQI."""
    expr = F.when(aqi.isNull(), F.lit(None).cast("string"))
    for name, c in sub.items():
        expr = expr.when(c == aqi, F.lit(name))
    return expr


def aqi_level(aqi: Column) -> Column:
    """Six-category EPA level; 'Unknown' for NULL AQI (plan lines 69-73)."""
    expr = F.when(aqi.isNull(), F.lit("Unknown"))
    for bound, label in LEVELS:
        expr = expr.when(aqi <= F.lit(float(bound)), F.lit(label))
    return expr.otherwise(F.lit(HAZARDOUS))


def sql_aqi_bundle(col_exprs: dict[str, str]) -> dict[str, str]:
    """SQL mirrors for (sub-indexes, overall, dominant, level).

    ``col_exprs`` maps pollutant -> SQL expression for its concentration.
    Returns SQL strings keyed 'sub_<p>', 'aqi', 'dominant_pollutant',
    'aqi_level' (the 'aqi' string must be aliased and the later exprs
    reference that alias via a wrapping query).
    """
    subs = {p: sql_subindex(e, p) for p, e in col_exprs.items()}
    out = {f"sub_{p}": s for p, s in subs.items()}
    out["aqi"] = "GREATEST(" + ", ".join(f"sub_{p}" for p in col_exprs) + ")"
    dom = ["CASE WHEN aqi IS NULL THEN CAST(NULL AS VARCHAR)"]
    for p in col_exprs:
        dom.append(f"WHEN sub_{p} = aqi THEN '{p}'")
    out["dominant_pollutant"] = " ".join(dom) + " END"
    lvl = ["CASE WHEN aqi IS NULL THEN 'Unknown'"]
    for bound, label in LEVELS:
        lvl.append(f"WHEN aqi <= {float(bound)!r} THEN '{label}'")
    out["aqi_level"] = " ".join(lvl) + f" ELSE '{HAZARDOUS}' END"
    return out
