"""Thin CLI — the programmatic replacement for the reference's REST control
plane (SURVEY.md §7.1: "plain Python API + thin CLI").

    python -m autonomus_datapipeline_spark run-spec spec.json --warehouse /tmp/wh
    python -m autonomus_datapipeline_spark detect /data/in --format csv
    python -m autonomus_datapipeline_spark query q1_pricing_summary --sf-dir /root/testdata/sf0.01
    python -m autonomus_datapipeline_spark explain q1_pricing_summary
    python -m autonomus_datapipeline_spark list-queries
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="autonomus_datapipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    p_run = sub.add_parser("run-spec", help="run a pipeline spec JSON file")
    p_run.add_argument("spec")
    p_run.add_argument("--warehouse", required=True)

    p_det = sub.add_parser("detect", help="detect schema of a file source")
    p_det.add_argument("path")
    p_det.add_argument("--format", default="csv", choices=["csv", "json", "parquet"])

    p_q = sub.add_parser("query", help="run a registry query, print preview")
    p_q.add_argument("name")
    p_q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_q.add_argument("--rows", type=int, default=20)

    p_e = sub.add_parser(
        "explain", help="print a registry query's formatted physical plan"
    )
    p_e.add_argument("name")
    p_e.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_e.add_argument(
        "--mode",
        default="formatted",
        choices=["simple", "extended", "formatted", "cost", "codegen"],
    )

    sub.add_parser("list-queries", help="list registered workload queries")

    args = p.parse_args(argv)

    if args.cmd == "list-queries":
        from autonomus_datapipeline_spark.workloads import QUERY_REGISTRY

        for name, spec in QUERY_REGISTRY.items():
            kind = "oracle" if spec.oracle else "rows-only"
            doc = (spec.doc or "").strip().splitlines()[0] if spec.doc else ""
            print(f"{name:32s} [{kind}] {doc}")
        return 0

    from autonomus_datapipeline_spark.session import get_spark

    spark = get_spark("cli")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "run-spec":
        from autonomus_datapipeline_spark.catalog import Catalog
        from autonomus_datapipeline_spark.plans import run_spec

        with open(args.spec) as fh:
            spec = json.load(fh)
        results = run_spec(spark, Catalog(args.warehouse), spec)
        print(json.dumps({k: dataclasses.asdict(v) for k, v in results.items()},
                         indent=2, default=str))
        return 0

    if args.cmd == "detect":
        from autonomus_datapipeline_spark.inference.detect import detect_file_schema
        from autonomus_datapipeline_spark.sources import FileSource

        res = detect_file_schema(spark, FileSource(args.path, args.format))
        print(json.dumps(dataclasses.asdict(res), indent=2, default=str))
        return 0

    if args.cmd == "query":
        from autonomus_datapipeline_spark.engine.audit import preview
        from autonomus_datapipeline_spark.workloads import QUERY_REGISTRY

        spec = QUERY_REGISTRY[args.name]
        print(json.dumps(preview(spec.fn(spark, args.sf_dir), args.rows), indent=2))
        return 0

    if args.cmd == "explain":
        from autonomus_datapipeline_spark.workloads import QUERY_REGISTRY

        df = QUERY_REGISTRY[args.name].fn(spark, args.sf_dir)
        # public surface (works on Spark Connect too): DataFrame.explain
        # prints the requested mode directly
        df.explain(mode=args.mode)
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
