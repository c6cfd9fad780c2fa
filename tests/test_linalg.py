"""Differential tests for the PCA power-iteration query: an exact
pure-Python replay of the integer iteration (independent of both the
Spark plan and the DuckDB oracle), plus a numpy eigendecomposition
bound on the explained-variance output."""

import math

import duckdb
import numpy as np

from reddit_data_pipeline_engineering_spark.plans.queries import REGISTRY, queries
from reddit_data_pipeline_engineering_spark.plans.queries_linalg import (
    _PCA_ITERS,
    _VS,
)

from .conftest import SF_SMALL

queries()  # force registration


def _quantized_matrix():
    rows = duckdb.sql(
        f"SELECT embedding FROM '{SF_SMALL}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    return [[math.floor(float(x) * 1e6) for x in r[0]] for r in rows]


def _replay():
    X = _quantized_matrix()
    n, d = len(X), len(X[0])
    s = [sum(row[i] for row in X) for i in range(d)]
    p = [
        [sum(row[i] * row[j] for row in X) for j in range(d)]
        for i in range(d)
    ]
    cov = [[n * p[i][j] - s[i] * s[j] for j in range(d)] for i in range(d)]
    v = [_VS] * d
    for _ in range(_PCA_ITERS):
        w = [sum(cov[i][j] * v[j] for j in range(d)) for i in range(d)]
        m = max(abs(x) for x in w)
        scale = max(m // _VS, 1)
        v = [(1 if x >= 0 else -1) * (abs(x) // scale) for x in w]
    wf = [sum(cov[i][j] * v[j] for j in range(d)) for i in range(d)]
    num = sum(v[i] * wf[i] for i in range(d))
    den = sum(x * x for x in v)
    tr = sum(cov[i][i] for i in range(d))
    ev_ppm = num // (den * max(tr // _VS, 1))
    k = min(range(d), key=lambda i: (-abs(v[i]), i))
    if v[k] < 0:
        v = [-x for x in v]
    return v, ev_ppm, cov, tr


def test_pca_power_matches_exact_python_replay(spark):
    out = (
        REGISTRY["pca_power_component"]
        .fn(spark, SF_SMALL)
        .orderBy("dim")
        .toPandas()
    )
    v, ev_ppm, _, _ = _replay()
    assert out["loading_e6"].tolist() == v
    assert (out["ev_ppm"] == ev_ppm).all()
    assert out["dim"].tolist() == list(range(len(v)))
    # sign convention: the largest-|loading| dimension is positive
    k = int(out["loading_e6"].abs().idxmax())
    assert out.loc[k, "loading_e6"] > 0
    # loadings live on the e6 grid after renormalization
    assert out["loading_e6"].abs().max() <= _VS + len(v)


def test_pca_ev_ppm_brackets_numpy_top_eigenvalue(spark):
    out = (
        REGISTRY["pca_power_component"].fn(spark, SF_SMALL).limit(1).toPandas()
    )
    ev_ppm = int(out["ev_ppm"].iloc[0])
    _, _, cov, tr = _replay()
    C = np.array([[float(x) for x in row] for row in cov])
    lam1 = np.linalg.eigvalsh((C + C.T) / 2)[-1]
    top_share_ppm = lam1 / float(tr) * 1e6
    # The Rayleigh quotient of ANY vector is <= lam1 (allow the 1e-6
    # trace pre-truncation plus integer rounding headroom), and 8
    # rounds from the all-ones start must capture most of lam1 even on
    # a near-degenerate spectrum.
    assert ev_ppm <= top_share_ppm * 1.001 + 2
    assert ev_ppm >= 0.7 * top_share_ppm
