#!/usr/bin/env python
"""Design-time export CLI (parity with the reference's Ksql.Linq.Cli).

  python tools/ddl_export.py script [--module path.to.mod] [--output f.sql] [--no-header]
  python tools/ddl_export.py avro   [--module path.to.mod] [--output f.json]

The reference CLI loads a compiled assembly and discovers a KsqlContext
factory (ScriptCommand.cs --project/--context); here ``--module`` names an
importable module exposing ``build_context() -> SparkKsqlContext``.  With
no module, a demo context is built over ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.001) with one derived entity, so the command is
runnable standalone.
"""

from __future__ import annotations

import argparse
import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _demo_context():
    from pyspark.sql import functions as F

    from ksql_linq_spark.context import SparkKsqlContext
    from ksql_linq_spark.entity import Column, Entity
    from ksql_linq_spark.session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    ctx = SparkKsqlContext(build_session("ddl-export"))
    ctx.register_parquet_dir(sf_dir)
    ctx._entities["events"] = Entity(
        "events",
        [
            Column("event_id", "long", nullable=False, key_order=0),
            Column("ts", "timestamp", timestamp=True),
            Column("user_id", "long"),
            Column("event_type", "string"),
            Column("value", "double"),
            Column("props", "string"),
        ],
        partitions=3,
    )
    ctx.to_query(
        "event_type_totals",
        lambda c: c.from_("events")
        .group_by("event_type")
        .select(F.count(F.lit(1)).alias("n"), F.max("value").alias("hi")),
    )
    return ctx


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("command", choices=["script", "avro", "ai-assist"])
    ap.add_argument("--module", "-m", help="module exposing build_context()")
    ap.add_argument("--output", "-o", help="output path (default stdout)")
    ap.add_argument("--no-header", action="store_true")
    args = ap.parse_args()

    if args.command == "ai-assist":
        # parity with the reference CLI's `ai-assist` (AiAssistCommand.cs:
        # prints the library-embedded assistant guide; --copy/clipboard is
        # a desktop nicety skipped here — pipe to your clipboard tool).
        # The guide ships inside the package like the embedded resource.
        guide = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            os.pardir, "ksql_linq_spark", "AI_ASSISTANT_GUIDE.md",
        )
        if not os.path.exists(guide):
            print("AI_ASSISTANT_GUIDE.md not found", file=sys.stderr)
            return 1
        with open(guide) as f:
            text = f.read()
        if args.output:
            with open(args.output, "w") as f:
                f.write(text)
        else:
            print(text)
        return 0

    if args.module:
        ctx = importlib.import_module(args.module).build_context()
    else:
        ctx = _demo_context()

    from ksql_linq_spark.script import ddl_script, export_json

    text = (
        ddl_script(ctx, header=not args.no_header)
        if args.command == "script"
        else export_json(ctx)
    )
    if args.output:
        with open(args.output, "w") as f:
            f.write(text)
    else:
        print(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
