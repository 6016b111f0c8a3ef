"""Machine-state probes for benchmark self-diagnosis.

Round-9 postmortem (SCALE.md "NumPy THP hugepage stall"): two driver
bench sessions in a row ran 15-40% hot across queries whose code did not
change, and one (r9) pushed dedup_exact formally over the 2x per-query
gate.  The root causes were box-level — THP ``madvise``+``defrag=madvise``
on a memory-fragmented host makes every hugepage first-touch stall in
synchronous compaction (~8 MB/s observed), and ambient co-tenant load
adds additive jitter to sub-second queries.  Neither is visible from the
bench JSON alone, so a hot session looks like a code regression.

This module makes a bench artifact self-diagnosing (judge r9 task #1a):

- :func:`thp_state` — the kernel's THP ``enabled``/``defrag`` modes.
- :func:`load_1m` — 1-minute load average at bench time.
- :func:`thp_canary` — the fragmentation canary: mmap an anonymous
  buffer, ``madvise(MADV_HUGEPAGE)`` it (reproducing exactly what numpy
  >=1.22 does to large allocations), and measure the first-touch fill
  rate in MB/s.  Healthy box: GB/s-range.  Fragmented-THP box: single-
  digit MB/s.  A budget cap bounds the probe's own cost when the box IS
  poisoned (we report the rate measured so far, which is the diagnosis).
- :func:`sibling_processes` — /proc scan for other live bench/soak
  processes (judge r9 task #7: two r9 incidents came from overlapping
  benchmark jobs doubling each other's walls).
- :func:`machine_state` — one dict with all of the above, embedded in
  bench.py's output JSON.

Everything degrades to ``None``/empty on non-Linux or permission errors —
probes must never fail a bench run.
"""

from __future__ import annotations

import ctypes
import mmap
import os
import time

_THP_DIR = "/sys/kernel/mm/transparent_hugepage"
_MADV_HUGEPAGE = 14  # linux/mman.h


def _read_thp_file(name: str) -> str | None:
    """Return the bracketed (active) value of a THP sysfs file."""
    try:
        with open(os.path.join(_THP_DIR, name)) as fh:
            raw = fh.read().strip()
    except OSError:
        return None
    for tok in raw.split():
        if tok.startswith("[") and tok.endswith("]"):
            return tok[1:-1]
    return raw or None


def thp_state() -> dict:
    return {
        "enabled": _read_thp_file("enabled"),
        "defrag": _read_thp_file("defrag"),
    }


def load_1m() -> float | None:
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:
        return None


def thp_canary(mb: int = 100, budget_s: float = 2.0) -> float | None:
    """First-touch fill rate (MB/s) of a fresh MADV_HUGEPAGE buffer.

    Reproduces the exact allocation pattern that stalls on a fragmented
    THP-madvise box (what numpy does to every large array): anonymous
    mmap, ``madvise(MADV_HUGEPAGE)``, then write one byte per 4 KiB page.
    Touching stops after ``budget_s`` seconds so a poisoned box costs at
    most the budget — the partial rate is still the diagnosis (single-
    digit MB/s == poisoned; hundreds+ == healthy).
    """
    n = mb * 1024 * 1024
    try:
        buf = mmap.mmap(-1, n)
    except (OSError, ValueError):
        return None
    try:
        try:
            libc = ctypes.CDLL(None, use_errno=True)
            view = ctypes.c_char.from_buffer(buf)
            addr = ctypes.addressof(view)
            libc.madvise(
                ctypes.c_void_p(addr), ctypes.c_size_t(n),
                ctypes.c_int(_MADV_HUGEPAGE),
            )
            del view  # release the exported pointer so buf can close
        except Exception:
            pass  # canary still measures plain first-touch
        page = 4096
        chunk = 4 * 1024 * 1024
        t0 = time.monotonic()
        touched = 0
        for off in range(0, n, chunk):
            end = min(off + chunk, n)
            for p in range(off, end, page):
                buf[p] = 1
            touched = end
            if time.monotonic() - t0 > budget_s:
                break
        dt = max(time.monotonic() - t0, 1e-9)
        return round(touched / (1024 * 1024) / dt, 1)
    finally:
        buf.close()


def sibling_processes(patterns: tuple[str, ...] = (
    "bench.py", "bench_regress.py", "soak_", "bench_curation.py",
    "bench_docs_ops.py", "check_oracle.py", "plan_audit.py",
)) -> list[str]:
    """Other live processes whose cmdline matches a bench/soak pattern.

    Excludes this process and its ancestors (so a bench launched BY
    bench_regress.py does not see its parent as a sibling, and the
    checker never matches its own cmdline — the r9 ``pgrep -f``
    self-match trap).
    """
    skip = set()
    pid = os.getpid()
    while pid > 1:
        skip.add(pid)
        try:
            with open(f"/proc/{pid}/stat") as fh:
                pid = int(fh.read().split(")")[-1].split()[1])
        except (OSError, ValueError, IndexError):
            break
    out = []
    try:
        entries = os.listdir("/proc")
    except OSError:
        return out
    for entry in entries:
        if not entry.isdigit() or int(entry) in skip:
            continue
        try:
            with open(f"/proc/{entry}/cmdline", "rb") as fh:
                cmd = fh.read().replace(b"\0", b" ").decode(
                    "utf-8", "replace").strip()
        except OSError:
            continue
        if any(pat in cmd for pat in patterns):
            out.append(f"{entry}: {cmd[:200]}")
    return out


def machine_state(canary_mb: int = 100) -> dict:
    """Snapshot for embedding in bench output (judge r9 task #1a)."""
    state = thp_state()
    state["load_1m"] = load_1m()
    state["canary_mb_s"] = thp_canary(mb=canary_mb)
    return state
