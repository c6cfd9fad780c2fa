"""Connected-components: label-propagation vs large-star/small-star.

The star variant (Kiveris et al., SoCC'14) must produce identical
(id, component) labelings and converge in O(log n) rounds where the
label variant needs diameter rounds — the chain graph makes the gap
observable.
"""

import random

from pyspark.sql import functions as F

from reddit_data_pipeline_engineering_spark.operators import components as cc


def _labels(df):
    return {(r.id, r.component) for r in df.collect()}


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def _case_star_matches_label_on_random_graphs(spark):
    # Three random graphs as ONE disjoint union (node offset 1000 per
    # trial): components never cross trial boundaries, so the union
    # equality asserts all three trials with two iterative executions
    # instead of six.
    rng = random.Random(7)
    pairs = []
    for trial in range(3):
        n = 40
        pairs += [
            (trial * 1000 + rng.randrange(n), trial * 1000 + rng.randrange(n))
            for _ in range(30 + trial * 10)
        ]
    pairs = [(a, b) for a, b in pairs if a != b]
    edges = _edges_df(spark, pairs)
    # The two iterative algorithms are independent executions — run them
    # concurrently (Spark schedules both job chains across the cores).
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as ex:
        f_lab = ex.submit(
            lambda: _labels(cc.connected_components(edges, "id_a", "id_b", driver_finish_max_edges=0))
        )
        f_star = ex.submit(
            lambda: _labels(
                cc.connected_components(edges, "id_a", "id_b", algorithm="star", driver_finish_max_edges=0)
            )
        )
        lab, star = f_lab.result(), f_star.result()
    assert lab == star


def _case_star_matches_label_on_disjoint_cliques(spark):
    # Three dense clusters (the near-dup shape) + one bridge pair.
    pairs = []
    for base in (0, 100, 200):
        members = [base + i for i in range(5)]
        pairs += [(a, b) for a in members for b in members if a < b]
    pairs.append((4, 104))  # merge first two clusters
    edges = _edges_df(spark, pairs)
    lab = _labels(cc.connected_components(edges, "id_a", "id_b", driver_finish_max_edges=0))
    star = _labels(
        cc.connected_components(edges, "id_a", "id_b", algorithm="star", driver_finish_max_edges=0)
    )
    assert lab == star
    comps = {c for _, c in star}
    assert comps == {0, 200}


def _case_star_fewer_rounds_on_chain(spark):
    # Chain 0-1-2-...-L: diameter L. Label propagation moves the min one
    # hop per round (~L rounds); star contraction halves star depth per
    # round (~log L rounds).
    L = 16
    edges = _edges_df(spark, [(i, i + 1) for i in range(L)])
    s_lab, s_star = {}, {}
    lab = _labels(
        cc.connected_components(
            edges, "id_a", "id_b", max_iterations=50, stats=s_lab,
            driver_finish_max_edges=0,
        )
    )
    star = _labels(
        cc.connected_components(
            edges, "id_a", "id_b", algorithm="star", max_iterations=50,
            stats=s_star, driver_finish_max_edges=0,
        )
    )
    assert lab == star == {(i, 0) for i in range(L + 1)}
    assert s_star["rounds"] < s_lab["rounds"], (s_star, s_lab)
    assert s_star["rounds"] <= 8  # O(log 16) + convergence check round
    assert s_lab["rounds"] >= L - 1


def _case_duplicate_clusters_algorithm_passthrough(spark):
    pairs = _edges_df(spark, [(1, 2), (2, 3), (10, 11)])
    out = {
        (r.component, r.n_members, r.canonical_id)
        for r in cc.duplicate_clusters(pairs, algorithm="star").collect()
    }
    assert out == {(1, 3, 1), (10, 2, 10)}



def _case_driver_finish_matches_distributed(spark):
    """r11 hybrid: the bounded union-find finish must label identically
    to the pure-distributed fixed point — at the upfront gate, at a
    MID-LOOP gate (cap sized so one contraction round runs first), and
    across both algorithms. Random graphs with chains + cliques."""
    rng = random.Random(41)
    pairs = []
    for trial in range(3):
        off = trial * 10_000
        n = 60
        pairs += [
            (off + rng.randrange(n), off + rng.randrange(n))
            for _ in range(45 + 12 * trial)
        ]
        pairs += [(off + 500 + i, off + 501 + i) for i in range(24)]  # chain
    pairs = [(a, b) for a, b in pairs if a != b]
    edges = _edges_df(spark, pairs)
    pure = _labels(
        cc.connected_components(
            edges, "id_a", "id_b", algorithm="star", driver_finish_max_edges=0
        )
    )
    for algo in ("label", "star"):
        up = _labels(
            cc.connected_components(
                edges, "id_a", "id_b", algorithm=algo,
                driver_finish_max_edges=10**6,  # gate fires upfront
            )
        )
        assert up == pure, algo
    # Mid-loop gate: cap below the input edge count but above the
    # post-round-1 contracted count -> at least one distributed round,
    # then the driver finish. (Star only: the label variant does not
    # contract, so its gate is upfront-only by construction.)
    n_in = edges.distinct().count()
    st = {}
    mid = _labels(
        cc.connected_components(
            edges, "id_a", "id_b", algorithm="star",
            driver_finish_max_edges=max(1, n_in - 10), stats=st,
        )
    )
    assert mid == pure
    assert st["rounds"] >= 1 or "driver_finish_edges" in st


# Concurrent execution (VERDICT r06 #7, the parity/streaming fixture
# pattern): the four cases are independent iterative-kernel executions
# — a module fixture runs them over a thread pool and the parametrized
# test re-raises each recorded outcome.

import pytest as _pytest
from concurrent.futures import ThreadPoolExecutor as _TPE

_CC_CASES = {
    "star_matches_label_on_random_graphs": _case_star_matches_label_on_random_graphs,
    "star_matches_label_on_disjoint_cliques": _case_star_matches_label_on_disjoint_cliques,
    "star_fewer_rounds_on_chain": _case_star_fewer_rounds_on_chain,
    "duplicate_clusters_algorithm_passthrough": _case_duplicate_clusters_algorithm_passthrough,
    "driver_finish_matches_distributed": _case_driver_finish_matches_distributed,
}


@_pytest.fixture(scope="module")
def cc_outcomes(spark):
    def run(fn):
        try:
            fn(spark)
            return None
        except BaseException as exc:  # noqa: BLE001 - re-raised per test
            return exc

    with _TPE(max_workers=4) as ex:
        return dict(zip(_CC_CASES, ex.map(run, _CC_CASES.values())))


@_pytest.mark.parametrize("name", list(_CC_CASES))
def test_components_case(name, cc_outcomes):
    res = cc_outcomes[name]
    if res is not None:
        raise res
