"""CLI entry points for the batch pipelines — the engine's equivalent of
the reference's ``spark-submit`` jobs and Airflow task chain
(``dags/streaming_pipeline_dag.py:355-366``: ingest → bronze→silver →
silver→gold → quality):

    python -m streaming_etl_pipeline_spark.pipelines.run b2s \\
        --bronze /data/bronze --silver /data/silver [--date 2024-06-15]
    python -m streaming_etl_pipeline_spark.pipelines.run s2g \\
        --silver /data/silver --gold /data/gold
    python -m streaming_etl_pipeline_spark.pipelines.run all \\
        --bronze /data/bronze --silver /data/silver --gold /data/gold
    python -m streaming_etl_pipeline_spark.pipelines.run dedup \\
        --docs /data/new_batch --store /data/dedup_store [--threshold 0.6]

Orchestration stays external (cron/Airflow/dbt invoke these commands);
idempotency comes from dynamic partition overwrite, so re-running a task
for a date converges instead of duplicating.
"""

from __future__ import annotations

import argparse
import json

from streaming_etl_pipeline_spark.pipelines.medallion import (
    bronze_to_silver,
    silver_to_gold,
)
from streaming_etl_pipeline_spark.session import build_session


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="streaming_etl_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    b2s = sub.add_parser("b2s", help="bronze → silver")
    b2s.add_argument("--bronze", required=True)
    b2s.add_argument("--silver", required=True)
    b2s.add_argument("--date", default=None)
    b2s.add_argument("--no-merge", action="store_true")
    b2s.add_argument("--validate", action="store_true")

    s2g = sub.add_parser("s2g", help="silver → gold")
    s2g.add_argument("--silver", required=True)
    s2g.add_argument("--gold", required=True)
    s2g.add_argument("--date", default=None)

    both = sub.add_parser("all", help="b2s then s2g")
    both.add_argument("--bronze", required=True)
    both.add_argument("--silver", required=True)
    both.add_argument("--gold", required=True)
    both.add_argument("--date", default=None)
    both.add_argument("--validate", action="store_true")

    dd = sub.add_parser(
        "dedup", help="incremental near-dedup of a document batch vs a store"
    )
    dd.add_argument("--docs", required=True, help="parquet with doc_id,text")
    dd.add_argument("--store", required=True, help="signature store dir")
    dd.add_argument("--threshold", type=float, default=0.6)
    dd.add_argument("--id-col", default="doc_id")
    dd.add_argument("--text-col", default="text")
    return p


def main(argv: list[str] | None = None) -> int:
    args = make_parser().parse_args(argv)
    spark = build_session(app_name=f"pipeline-{args.cmd}")
    metrics: dict[str, float] = {}
    if args.cmd in ("b2s", "all"):
        res = bronze_to_silver(
            spark,
            args.bronze,
            args.silver,
            run_date=args.date,
            merge_with_existing=not getattr(args, "no_merge", False),
            validate=getattr(args, "validate", False),
        )
        metrics.update({f"b2s.{k}": v for k, v in res.metrics.items()})
    if args.cmd in ("s2g", "all"):
        res = silver_to_gold(
            spark, args.silver, args.gold, run_date=args.date
        )
        metrics.update({f"s2g.{k}": v for k, v in res.metrics.items()})
    if args.cmd == "dedup":
        from streaming_etl_pipeline_spark.operators.dedup import (
            incremental_near_dups,
        )

        docs = spark.read.parquet(args.docs)
        pairs = incremental_near_dups(
            spark,
            docs,
            args.store,
            id_col=args.id_col,
            text_col=args.text_col,
            threshold=args.threshold,
        )
        metrics["dedup.input_docs"] = docs.count()
        metrics["dedup.near_dup_pairs"] = pairs.count()
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
