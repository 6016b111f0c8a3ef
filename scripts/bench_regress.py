#!/usr/bin/env python
"""Per-query bench regression gate vs the committed baseline.

Usage:
    python scripts/bench_regress.py                 # runs bench.py, compares
    python scripts/bench_regress.py BENCH_rN.json   # compares a recorded file
                                                    # (raw driver file or the
                                                    # one-line bench output)
    python scripts/bench_regress.py --ab OLD_REF    # A/B: bench OLD_REF in a
                                                    # scratch worktree, then
                                                    # HEAD, back-to-back on
                                                    # the same machine state

The --ab mode exists because single-run cross-session comparisons are
meaningless here: the sandbox's wall-clock speed drifts ~25% between
sessions (round 4's commit recorded 15.7 s and re-benched at 19.1 s the
same day). Benching both commits in ONE invocation removes the
machine-state variable; only the printed A/B ratios are comparable.

Compares each query's wall time (and the total) against
``BENCH_BASELINE.json`` (snapshot of round 1 at sf0.1) and exits 1 on any
>2x regression — the mechanical "vs last round" check the judge asked
for. Queries new since the baseline are reported but never fail; update
the baseline deliberately (copy the new run over BENCH_BASELINE.json)
when a faster plan lands.

Absolute-floor guard: sub-second queries jitter on a busy machine, so a
regression only fails when the new time also exceeds ``FLOOR_SEC``.

Machine-state hygiene (judge r9 task #7, after two r9 incidents — a
THP-poisoned A/B and a double-running soak doubling both walls): before
any benching this script (a) REFUSES to start while another bench/soak
process is live (``SPARK_GRAFT_BENCH_FORCE=1`` overrides) and (b) prints
the THP fragmentation canary's fill rate so a poisoned box is visible
before 20 minutes of benching, not after.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from streaming_etl_pipeline_spark.machine_state import (  # noqa: E402
    machine_state,
    sibling_processes,
)

BASELINE = os.path.join(REPO, "BENCH_BASELINE.json")
THRESHOLD = 2.0
FLOOR_SEC = 1.0
# Below this MADV_HUGEPAGE first-touch rate the box is in the r9
# fragmentation stall regime (healthy measures hundreds of MB/s+).
CANARY_SUSPECT_MB_S = 50.0


def preflight(will_bench: bool) -> None:
    """Refuse to bench alongside a sibling bench/soak; print the canary."""
    if not will_bench:
        return
    sibs = sibling_processes()
    if sibs and os.environ.get("SPARK_GRAFT_BENCH_FORCE") != "1":
        print("REFUSING to bench: sibling bench/soak process(es) live "
              "(their load poisons every timing; r9 double-run incident):")
        for s in sibs:
            print(f"  {s}")
        print("Set SPARK_GRAFT_BENCH_FORCE=1 to override.")
        raise SystemExit(2)
    state = machine_state()
    print(f"machine: thp={state.get('enabled')}/{state.get('defrag')} "
          f"load_1m={state.get('load_1m')} "
          f"canary={state.get('canary_mb_s')} MB/s", flush=True)
    rate = state.get("canary_mb_s")
    if rate is not None and rate < CANARY_SUSPECT_MB_S:
        print(f"WARNING: THP first-touch canary {rate} MB/s < "
              f"{CANARY_SUSPECT_MB_S} — box is in the fragmentation-stall "
              "regime (SCALE.md); timings from this session are suspect.")


def load_run(arg: str | None) -> dict:
    if arg is None:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, check=True,
        ).stdout
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        return json.loads(line)
    data = json.load(open(arg))
    if "parsed" in data:  # driver-recorded BENCH_r{N}.json
        return data["parsed"]
    return data


def _bench_in(repo: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        capture_output=True, text=True, check=True, cwd=repo,
    ).stdout
    line = [l for l in out.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def ab_compare(old_ref: str) -> int:
    """Bench ``old_ref`` (scratch detached worktree) then HEAD in one
    invocation and print per-query old/new/ratio — the only bench
    comparison that survives the sandbox's session-to-session jitter."""
    import tempfile

    preflight(will_bench=True)
    wt = tempfile.mkdtemp(prefix="bench_ab_")
    subprocess.run(
        ["git", "worktree", "add", "--detach", wt, old_ref],
        cwd=REPO, check=True, capture_output=True,
    )
    try:
        print(f"== benching {old_ref} (worktree {wt}) ==", flush=True)
        old = _bench_in(wt)
        print("== benching HEAD ==", flush=True)
        new = _bench_in(REPO)
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=REPO, check=True, capture_output=True,
        )
    names = sorted(set(old["queries"]) | set(new["queries"]))
    worse = []
    for name in names:
        o, n = old["queries"].get(name), new["queries"].get(name)
        if o is None or n is None:
            tag = "OLD-ONLY" if n is None else "NEW-ONLY"
            print(f"{tag:8s} {name:28s} old={o} new={n}")
            continue
        ratio = n / o if o else float("inf")
        flag = "SLOWER" if ratio > 1.10 and n > FLOOR_SEC else "ok    "
        print(f"{flag} {name:28s} {o:7.3f}s -> {n:7.3f}s ({ratio:4.2f}x)")
        if flag == "SLOWER":
            worse.append(name)
    t = new["value"] / old["value"]
    print(f"\ntotal: {old['value']:.3f}s -> {new['value']:.3f}s ({t:.2f}x)")
    if worse:
        print(f"SLOWER (>1.10x, > {FLOOR_SEC}s): {worse}")
    return 0 if t <= 1.10 else 1


def main() -> int:
    if len(sys.argv) > 2 and sys.argv[1] == "--ab":
        return ab_compare(sys.argv[2])
    preflight(will_bench=len(sys.argv) <= 1)
    run = load_run(sys.argv[1] if len(sys.argv) > 1 else None)
    base = json.load(open(BASELINE))
    failures = []
    for name, sec in sorted(run["queries"].items()):
        ref = base["queries"].get(name)
        if ref is None:
            print(f"NEW  {name:28s} {sec:7.3f}s (no baseline)")
            continue
        ratio = sec / ref if ref else float("inf")
        flag = "FAIL" if ratio > THRESHOLD and sec > FLOOR_SEC else "ok  "
        print(f"{flag} {name:28s} {sec:7.3f}s vs {ref:7.3f}s ({ratio:4.2f}x)")
        if flag == "FAIL":
            failures.append(name)
    t_ratio = run["value"] / base["value"]
    print(f"\ntotal: {run['value']:.3f}s vs baseline {base['value']:.3f}s "
          f"({t_ratio:.2f}x, threshold {THRESHOLD}x)")
    if t_ratio > THRESHOLD:
        failures.append("TOTAL")
    if failures:
        print(f"REGRESSION: {failures}")
        return 1
    print("BENCH OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
