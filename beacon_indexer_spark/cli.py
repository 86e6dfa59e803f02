"""CLI: the reference's command surface (``src/cli.py:15-135`` in
/root/reference) over the Spark engine.

    python -m beacon_indexer_spark load backfill --start-slot S --end-slot E
    python -m beacon_indexer_spark load realtime [--iterations N]
    python -m beacon_indexer_spark transform batch [--raw-table T]
    python -m beacon_indexer_spark maintain status|gaps|integrity|reset|fix

Lifecycle parity (SURVEY §3): backfill = chunk plan → distributed fetch →
raw lake → ledger; transform = discovery anti-join → parse fan-out →
structured lake → progress; maintain fix = reset failed → re-transform
with partition overwrite (the DELETE-free repair).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from beacon_indexer_spark.config import NETWORKS, default_config
from beacon_indexer_spark.control import ledger as L
from beacon_indexer_spark.plans.pipeline import BeaconPipeline
from beacon_indexer_spark.schemas.structured import RAW_TO_STRUCTURED
from beacon_indexer_spark.sources.beacon_api import (
    BeaconAPI,
    FetchConfig,
    LOADERS,
    bootstrap_schedule,
    fetch_slots_distributed,
)
from beacon_indexer_spark.sources.storage import ParquetLake
from beacon_indexer_spark.streaming.realtime import RealtimeLoop


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("beacon_indexer_spark")
    p.add_argument("--lake-dir", default="./lake")
    p.add_argument("--beacon-url", default="http://localhost:5052")
    p.add_argument("--network", default="gnosis", choices=sorted(NETWORKS))
    p.add_argument("--bootstrap", action="store_true",
                   help="derive the fork schedule from the node's /config/spec "
                        "instead of the built-in network defaults")
    sub = p.add_subparsers(dest="command", required=True)

    load = sub.add_parser("load").add_subparsers(dest="subcommand", required=True)
    bf = load.add_parser("backfill")
    bf.add_argument("--start-slot", type=int, required=True)
    bf.add_argument("--end-slot", type=int, required=True)
    bf.add_argument("--loaders", default="blocks")
    rt = load.add_parser("realtime")
    rt.add_argument("--iterations", type=int, default=None)

    tr = sub.add_parser("transform").add_subparsers(dest="subcommand", required=True)
    tb = tr.add_parser("batch")
    tb.add_argument("--raw-table", default="raw_blocks")
    tb.add_argument("--limit", type=int, default=50)

    mt = sub.add_parser("maintain").add_subparsers(dest="subcommand", required=True)
    mt.add_parser("status")
    gp = mt.add_parser("gaps")
    gp.add_argument("--raw-table", default="raw_blocks")
    gp.add_argument("--start-slot", type=int, required=True)
    gp.add_argument("--end-slot", type=int, required=True)
    ig = mt.add_parser("integrity")
    ig.add_argument("--raw-table", default="raw_blocks")
    rs = mt.add_parser("reset")
    rs.add_argument("--statuses", default="claimed,failed")
    fx = mt.add_parser("fix")
    fx.add_argument("--raw-table", default="raw_blocks")
    cp = mt.add_parser("compact")
    cp.add_argument("--tables", required=True,
                    help="comma-separated lake tables to rewrite latest-wins")
    return p


def _services(args, spark: SparkSession):
    if args.bootstrap:
        schedule, _, _ = bootstrap_schedule(BeaconAPI(args.beacon_url))
    else:
        schedule = NETWORKS[args.network]
    lake = ParquetLake(spark, args.lake_dir, schedule)
    ledger = L.ChunkLedger(spark, f"{args.lake_dir}/_control/load_state_chunks")
    progress = L.ProgressManifest(spark, f"{args.lake_dir}/_control/transformer_progress")
    pipe = BeaconPipeline(lake, progress=progress)
    return lake, ledger, progress, pipe


def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> int:
    args = build_parser().parse_args(argv)
    if spark is None:
        from beacon_indexer_spark.session import get_spark

        spark = get_spark(app_name="beacon-indexer-spark-cli")
    lake, ledger, progress, pipe = _services(args, spark)
    cfg = default_config()
    out: dict = {"command": f"{args.command} {args.subcommand}"}

    if (args.command, args.subcommand) == ("load", "backfill"):
        names = [n.strip() for n in args.loaders.split(",") if n.strip()]
        fetch_cfg = FetchConfig(base_url=args.beacon_url)
        for name in names:
            spec = LOADERS[name]
            chunks = L.generate_chunks(
                spark, args.start_slot, args.end_slot, cfg.chunk_size, name,
                completed=ledger.with_status(L.COMPLETED),
            )
            ledger.append(chunks)
            df = fetch_slots_distributed(
                spark, fetch_cfg, spec, args.start_slot, args.end_slot,
                lake.schedule, slots_per_task=cfg.chunk_size,
            )
            lake.write(spec.raw_table, df)
            # mark ONLY this run's range completed — stale pending chunks
            # from an interrupted earlier backfill must stay pending
            ledger.mark(
                ledger.with_status(L.PENDING).filter(
                    (F.col("loader_name") == name)
                    & (F.col("start_slot") >= (args.start_slot // cfg.chunk_size)
                       * cfg.chunk_size)
                    & (F.col("end_slot") <= args.end_slot)
                ),
                L.COMPLETED,
            )
            out[name] = lake.table_stats(spec.raw_table)

    elif (args.command, args.subcommand) == ("load", "realtime"):
        loop = RealtimeLoop(
            api=BeaconAPI(args.beacon_url), lake=lake, pipeline=pipe, config=cfg
        )
        out["windows_processed"] = loop.run(max_iterations=args.iterations)

    elif (args.command, args.subcommand) == ("transform", "batch"):
        results = pipe.transform_pending(
            ledger.current(), args.raw_table, limit=args.limit
        )
        out["chunks"] = [
            {"start_slot": s, "end_slot": e, "rows": c} for s, e, c in results
        ]

    elif (args.command, args.subcommand) == ("maintain", "status"):
        out["chunks"] = [r.asDict() for r in ledger.counts().collect()]
        out["transform"] = [r.asDict() for r in progress.stats().collect()]
        out["tables"] = [
            lake.table_stats(t)
            for t in ["raw_blocks", *RAW_TO_STRUCTURED.get("raw_blocks", [])]
            if lake.exists(t)
        ]

    elif (args.command, args.subcommand) == ("maintain", "gaps"):
        raw = lake.read(args.raw_table)
        out["report"] = L.gap_report(raw, args.start_slot, args.end_slot)

    elif (args.command, args.subcommand) == ("maintain", "integrity"):
        out["report"] = L.integrity_check(ledger, progress, args.raw_table)

    elif (args.command, args.subcommand) == ("maintain", "reset"):
        statuses = tuple(s.strip() for s in args.statuses.split(","))
        out["reset"] = ledger.reset(statuses=statuses)

    elif (args.command, args.subcommand) == ("maintain", "fix"):
        # reference maintain fix (C9): failed ranges → re-transform with
        # partition overwrite; ledger rows reset to completed on success
        failed = progress.current().filter(
            (F.col("raw_table_name") == args.raw_table)
            & (F.col("status") == L.FAILED)
        ).collect()
        fixed = []
        for r in failed:
            pipe.repair_range(args.raw_table, r["start_slot"], r["end_slot"])
            fixed.append((r["start_slot"], r["end_slot"]))
        out["fixed_ranges"] = fixed

    elif (args.command, args.subcommand) == ("maintain", "compact"):
        # ReplacingMergeTree background-merge analogue, run explicitly
        compacted = {}
        for t in (x.strip() for x in args.tables.split(",") if x.strip()):
            before = lake.read(t).count()
            lake.compact(t)
            compacted[t] = {"before": before, "after": lake.read(t).count()}
        out["compacted"] = compacted

    print(json.dumps(out, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
