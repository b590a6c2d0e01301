"""CLI — the reference's single-binary surface (cmd/root.go):

    python -m octosql_spark.cli "SELECT * FROM people.csv WHERE age > 3"

Flags mirror the reference: ``--output`` (table/csv/json/
stream_native), ``--describe`` (output schema as rows),
``--explain N`` (0 = off, 1+ = plan; we render Catalyst's plan —
the reference renders its own physical plan graph).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="octosql-spark")
    ap.add_argument("query")
    ap.add_argument("--output", default="table",
                    choices=["table", "batch_table", "live_table", "csv",
                             "json", "stream_native"])
    ap.add_argument("--describe", action="store_true")
    ap.add_argument("--explain", type=int, default=0)
    ap.add_argument("--sf-dir", default=None,
                    help="register the testdata tables from this dir")
    args = ap.parse_args(argv)

    from octosql_spark.session import get_spark
    from octosql_spark.sql import run_query
    from octosql_spark import sinks

    spark = get_spark("octosql-spark-cli")
    if args.sf_dir:
        from octosql_spark.catalog import register_views
        register_views(spark, args.sf_dir)

    try:
        res = run_query(spark, args.query)
        df = res.df
    except Exception as ex:
        # concise one-line errors like the reference's CLI (golden
        # .err files), not a Py4J traceback
        msg = str(ex).strip().split("\n")[0]
        print(f"error: {msg}", file=sys.stderr)
        return 1

    if args.explain:
        print("-- transpiled Spark SQL --")
        print(res.spark_sql)
        print("-- physical plan --")
        df.explain("formatted" if args.explain > 1 else "simple")
        if not args.describe:
            return 0

    if args.describe:
        sinks.write_table(sinks.describe(df))
        return 0

    sinks.WRITERS[args.output](df)
    return 0


if __name__ == "__main__":
    sys.exit(main())
