"""Machine-state probes + bench hygiene (judge r9 tasks #1a, #1b, #7).

No SparkSession needed — everything here is pure-Python/OS-level.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

import pytest

from streaming_etl_pipeline_spark.machine_state import (
    load_1m,
    machine_state,
    sibling_processes,
    thp_canary,
    thp_state,
)

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_thp_state_reads_bracketed_modes():
    state = thp_state()
    assert set(state) == {"enabled", "defrag"}
    # On this Linux box the sysfs files exist; the active value is a
    # single token (e.g. "madvise"), never the raw bracketed line.
    for val in state.values():
        if val is not None:
            assert "[" not in val and " " not in val


def test_load_and_canary_probe():
    load = load_1m()
    assert load is None or load >= 0.0
    rate = thp_canary(mb=16, budget_s=2.0)
    assert rate is not None and rate > 0.0


def test_canary_budget_bounds_cost():
    t0 = time.monotonic()
    thp_canary(mb=64, budget_s=0.5)
    # Budget + one 4MB chunk of slack; a poisoned box must not make the
    # probe itself take minutes.
    assert time.monotonic() - t0 < 5.0


def test_machine_state_shape():
    state = machine_state(canary_mb=16)
    assert {"enabled", "defrag", "load_1m", "canary_mb_s"} <= set(state)


def test_sibling_detection_sees_fake_bench_and_not_self():
    marker = "soak_fake_sibling_for_test"
    proc = subprocess.Popen(
        [sys.executable, "-c", "import time; time.sleep(30)", marker],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        time.sleep(0.2)
        hits = sibling_processes(patterns=(marker,))
        assert any(str(proc.pid) in h for h in hits), hits
    finally:
        proc.kill()
        proc.wait()
    # Own process never matches even when the pattern is in OUR cmdline
    # surrogate (the r9 pgrep self-match trap): search for a pattern
    # guaranteed to be only in this pytest process tree.
    assert all(str(os.getpid()) not in h.split(":")[0]
               for h in sibling_processes())


def test_bench_regress_preflight_refuses_on_sibling(monkeypatch):
    scripts = os.path.join(REPO, "scripts")
    if scripts not in sys.path:
        sys.path.insert(0, scripts)
    import bench_regress

    monkeypatch.setattr(
        bench_regress, "sibling_processes",
        lambda *a, **k: ["12345: python soak_fake.py"],
    )
    monkeypatch.delenv("SPARK_GRAFT_BENCH_FORCE", raising=False)
    with pytest.raises(SystemExit) as exc:
        bench_regress.preflight(will_bench=True)
    assert exc.value.code == 2
    # Force-override lets it proceed (prints canary, no raise).
    monkeypatch.setenv("SPARK_GRAFT_BENCH_FORCE", "1")
    monkeypatch.setattr(
        bench_regress, "machine_state",
        lambda *a, **k: {"enabled": "madvise", "defrag": "madvise",
                         "load_1m": 0.1, "canary_mb_s": 900.0},
    )
    bench_regress.preflight(will_bench=True)
    # Compare-only invocations never block on siblings.
    monkeypatch.delenv("SPARK_GRAFT_BENCH_FORCE", raising=False)
    bench_regress.preflight(will_bench=False)


def test_timed_passes_trims_additive_outlier():
    sys.path.insert(0, REPO)
    import bench

    # Settled from the start: keep all, median reported.
    seq = iter([1.0, 1.1, 0.95])
    passes, kept = bench.timed_passes(lambda: next(seq), 3)
    assert passes == [1.0, 1.1, 0.95] and sorted(kept) == sorted(passes)
    assert bench._median(kept) == 1.0

    # One additive spike: extras taken, spike dropped, spread settles.
    seq = iter([0.5, 0.55, 1.5, 0.52])
    passes, kept = bench.timed_passes(lambda: next(seq), 3)
    assert len(passes) == 4
    assert 1.5 not in kept and len(kept) == 3
    med = bench._median(kept)
    assert (max(kept) - min(kept)) / med <= 0.5

    # Chaotic box: never keeps fewer than 2 passes.
    seq = iter([0.5, 1.0, 2.0, 4.0, 8.0])
    passes, kept = bench.timed_passes(lambda: next(seq), 3)
    assert len(passes) == 5 and len(kept) >= 2


def test_prime_page_cache_touches_files(tmp_path):
    sys.path.insert(0, REPO)
    import bench

    f = tmp_path / "x.parquet"
    f.write_bytes(b"z" * (2 << 20))
    bench.prime_page_cache(str(tmp_path))  # must not raise
    bench.prime_page_cache(str(tmp_path / "missing"))  # nor on absent dirs
