"""Output sinks (SURVEY.md §2.1 sinks).

The reference's sinks: live/batch table (retractable ordered buffer,
outputs/batch/live_output.go:35-204), eager csv/json writers
(outputs/eager/eager.go, outputs/formats/*), stream_native printer
(outputs/stream/printer.go), and ``--describe``
(cmd/root.go:300-313). Batch equivalents below; streaming variants
live in octosql_spark.streaming.
"""

from __future__ import annotations

import json
import sys
from typing import IO

from pyspark.sql import DataFrame


def write_table(df: DataFrame, out: IO[str] = sys.stdout,
                limit: int | None = None) -> None:
    """batch_table output — pretty table like the reference's final
    live-table repaint (live_output.go:165-204)."""
    n = limit if limit is not None else 20_000
    out.write(df._show_string(n, 0, False))
    out.write("\n")


def write_csv(df: DataFrame, out: IO[str] = sys.stdout) -> None:
    """csv output (outputs/formats/csv_format.go:1-72): header row with
    the ORIGINAL field names, then records. Collects through
    toLocalIterator — constant driver memory."""
    import csv as _csv
    w = _csv.writer(out)
    w.writerow(df.columns)
    for row in df.toLocalIterator():
        w.writerow(["" if v is None else v for v in row])


def write_json(df: DataFrame, out: IO[str] = sys.stdout) -> None:
    """json output (outputs/formats/json_format.go:1-103): one object
    per line, original field names."""
    for row in df.toLocalIterator():
        out.write(json.dumps(row.asDict(recursive=True), default=str))
        out.write("\n")


def write_stream_native(df: DataFrame, out: IO[str] = sys.stdout) -> None:
    """stream_native (outputs/stream/printer.go:1-73): records rendered
    with a retraction marker and event time. A finished batch query is
    a stream of additions — every record prints as ``+``; true
    retraction streams only arise in streaming mode (update-mode
    console sink is the equivalent there)."""
    for row in df.toLocalIterator():
        vals = ", ".join(str(v) for v in row)
        out.write(f"{{+ | {vals} |}}\n")


def describe(df: DataFrame) -> DataFrame:
    """--describe: the query's output schema as rows
    (cmd/root.go:300-313, cmd/describe.go)."""
    spark = df.sparkSession
    rows = [(f.name, f.dataType.simpleString(), f.nullable)
            for f in df.schema.fields]
    return spark.createDataFrame(rows, "name string, type string, nullable boolean")


WRITERS = {
    "table": write_table,
    "batch_table": write_table,
    "live_table": write_table,
    "csv": write_csv,
    "json": write_json,
    "stream_native": write_stream_native,
}
