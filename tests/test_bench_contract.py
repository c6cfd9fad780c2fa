"""Driver-facing bench output contract (the BENCH_r04 parsed:null bug).

The verification driver records the TAIL of bench.py's stdout; the last
line must therefore stay small and self-contained at any registry size.
"""

import json

from bench import emit_lines


def test_last_line_bounded_and_parseable(tmp_path):
    # Far larger than any plausible registry: 2000 bench queries.
    timings = {f"query_with_a_rather_long_name_{i:04d}": 1.234 for i in range(2000)}
    host = {"cpus": 32, "load1_start": 1.23, "load1_end": 30.45}
    full_line, compact_line = emit_lines(
        timings, 0.1, str(tmp_path), host=host
    )

    # The compact (LAST) line: < 1 KB, parseable, carries the total.
    assert len(compact_line.encode()) < 1024
    d = json.loads(compact_line)
    assert d["metric"] == "bench_suite_total"
    assert d["value"] == round(1.234 * 2000, 3)
    assert d["n_queries"] == 2000
    assert d["unit"] == "sec" and d["sf"] == 0.1
    # Host-contention telemetry (VERDICT r09 #3) rides BOTH lines: the
    # compact one so the driver tail-capture records it, the full dict
    # so the judge can read it next to the per-query timings.
    assert d["host"] == host

    # The full line carries every per-query timing...
    f = json.loads(full_line)
    assert len(f["queries"]) == 2000 and f["value"] == d["value"]
    assert f["host"] == host
    # ...and the same dict is persisted for the judge.
    on_disk = json.loads((tmp_path / "bench_full.json").read_text())
    assert on_disk == f


def test_committed_bench_records_host_load():
    """VERDICT r09 #3: the artifact of record must carry start/end host
    load so contention is distinguishable from regression without git
    archaeology."""
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "bench_full.json")
    with open(path) as f:
        full = json.load(f)
    host = full.get("host")
    assert host, "bench_full.json has no host block — re-run bench.py"
    assert {"cpus", "load1_start", "load1_end"} <= set(host)
    assert host["cpus"] >= 1
    assert host["load1_start"] >= 0.0 and host["load1_end"] >= 0.0


def test_local_dir_hygiene_assertion(tmp_path):
    """VERDICT r09 #8: the r08 spill-dir pin as a tested invariant —
    repo-scoped and empty after stop, else the bench fails loudly."""
    import pytest as _pytest

    from bench import assert_local_dir_hygiene

    repo = tmp_path / "repo"
    good = repo / ".spark-local" / "1234"
    good.mkdir(parents=True)
    assert_local_dir_hygiene(str(good), str(repo))
    assert not good.exists()  # the empty per-pid dir itself is reclaimed

    escaped = tmp_path / "tmpdir" / "spill"
    escaped.mkdir(parents=True)
    with _pytest.raises(AssertionError, match="escaped the repo"):
        assert_local_dir_hygiene(str(escaped), str(repo))

    dirty = repo / ".spark-local" / "5678"
    leak = dirty / "blockmgr-leak"
    leak.mkdir(parents=True)
    (leak / "shuffle_0_0_0.data").write_text("spill bytes")
    # wait_s=0: the production backoff (r11 — tolerate the JVM shutdown
    # hook finishing its deletes after spark.stop() returns) would poll
    # a genuinely-leaked dir for the full window; the negative case
    # pins the assertion, not the wait. Leaks are FILE content — an
    # empty `spark-<uuid>` driver temp dir is swept, not failed (it is
    # removed by JVM-exit hooks the long-lived gateway never runs).
    with _pytest.raises(AssertionError, match="leaked spill data"):
        assert_local_dir_hygiene(str(dirty), str(repo), wait_s=0)

    lingering = repo / ".spark-local" / "9012"
    (lingering / "spark-0a1b2c3d-empty-driver-tmp").mkdir(parents=True)
    assert_local_dir_hygiene(str(lingering), str(repo), wait_s=0)
    assert not lingering.exists()  # empty tree swept, dir reclaimed


def test_hygiene_backoff_tolerates_late_shutdown_delete(tmp_path, monkeypatch):
    """VERDICT r10 #2: spark.stop() returns before the JVM shutdown hook
    finishes deleting blockmgr-*/spark-* subdirs — the r10 artifact
    recorded rc=1 for a dir that was empty moments later. The emptiness
    check must poll: a leftover deleted 0.3 s after the call starts is
    NOT a failure. Also pins the ADVICE r10 override waiver: with
    RDPE_SPARK_LOCAL_DIR set, the repo-scope assert is skipped and the
    operator's dir is left in place."""
    import threading

    from bench import assert_local_dir_hygiene

    repo = tmp_path / "repo"
    lagging = repo / ".spark-local" / "4321"
    leftover = lagging / "spark-deadbeef"
    leftover.mkdir(parents=True)
    threading.Timer(0.3, lambda: leftover.rmdir()).start()
    assert_local_dir_hygiene(str(lagging), str(repo), wait_s=10)
    assert not lagging.exists()

    override = tmp_path / "elsewhere" / "spill"  # outside the repo
    override.mkdir(parents=True)
    monkeypatch.setenv("RDPE_SPARK_LOCAL_DIR", str(override))
    assert_local_dir_hygiene(str(override), str(repo), wait_s=0)
    assert override.exists()  # operator-managed dir is not reclaimed


def test_streaming_throughput_block_in_full_line_only(tmp_path):
    """VERDICT r06 #9: the streaming drained-rows/s block rides the full
    dict (file + intermediate line) but must NOT grow the compact last
    line the driver tail-captures."""
    timings = {"q": 1.0}
    streaming = {
        f"streaming_q{i}": {
            "sec": 2.0, "input_rows": 600_000,
            "drained_rows_per_s": 300_000.0,
        }
        for i in range(50)
    }
    full_line, compact_line = emit_lines(
        timings, 0.1, str(tmp_path), streaming
    )
    f = json.loads(full_line)
    assert f["streaming"] == streaming
    on_disk = json.loads((tmp_path / "bench_full.json").read_text())
    assert on_disk == f
    d = json.loads(compact_line)
    assert "streaming" not in d
    assert len(compact_line.encode()) < 1024


def test_lsh_exact_guard_refuses_oversized_corpus(spark, monkeypatch):
    """VERDICT r05 #3: the full-exact LSH certification DNFs at sf10, so
    it must refuse loudly above its documented ceiling instead of
    launching an impossible job. (Cap patched tiny so sf0.001 trips it.)"""
    import pytest as _pytest

    from reddit_data_pipeline_engineering_spark.plans import queries_llm3 as m
    from reddit_data_pipeline_engineering_spark.plans.queries import REGISTRY, queries

    queries()
    monkeypatch.setattr(m, "LSH_EXACT_MAX_DOCS", 10)
    with _pytest.raises(ValueError, match="lsh_quality_eval_sampled"):
        REGISTRY["lsh_quality_eval"].fn(spark, "/root/testdata/sf0.001")
    # The sampled twin has no ceiling — it must still build a plan.
    assert REGISTRY["lsh_quality_eval_sampled"].fn(
        spark, "/root/testdata/sf0.001"
    ).columns == [
        "n_candidates",
        "n_exact",
        "n_true_positives",
        "precision_bps",
        "recall_bps",
    ]


def test_streaming_rows_per_sec_floor():
    """VERDICT r07 #8: the streaming drain legs are the stateful
    operators' only performance signal — pin a floor so a regression
    (state blow-up, per-trigger recompute, broadcast fallback) fails a
    contract instead of drifting silently in BENCH. Floor: 2,000
    drained rows/s at sf0.1 (the r07 fleet measured 3.2k-15.4k; the
    slowest legs are the interval joins at ~3.2k, so 2k holds ~35%
    headroom). bench_full.json is rewritten by every bench.py run —
    the same artifact the judge reads."""
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "bench_full.json")
    with open(path) as f:
        full = json.load(f)
    streaming = full.get("streaming")
    assert streaming, "bench_full.json has no streaming block — run bench.py"
    floors = {name: 2000.0 for name in streaming}
    bad = {
        name: leg["drained_rows_per_s"]
        for name, leg in streaming.items()
        if leg["drained_rows_per_s"] < floors[name]
    }
    assert not bad, f"streaming drain legs under the 2k rows/s floor: {bad}"
    # Every registry streaming query must HAVE a drain leg (a query
    # silently dropped from the throughput sweep is also a regression).
    from reddit_data_pipeline_engineering_spark.plans.queries import (
        REGISTRY,
        queries,
    )

    queries()
    expected = {n for n, s in REGISTRY.items() if "streaming" in s.tags}
    missing = expected - set(streaming)
    assert not missing, f"streaming queries with no drain leg: {missing}"
