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


def write_table(df: DataFrame, out: IO[str] | None = None,
                limit: int | None = None) -> None:
    """batch_table output — pretty table like the reference's final
    live-table repaint (live_output.go:165-204)."""
    out = out or sys.stdout
    n = limit if limit is not None else 20_000
    out.write(df._show_string(n, 0, False))
    out.write("\n")


def write_csv(df: DataFrame, out: IO[str] | None = None) -> None:
    """csv output (outputs/formats/csv_format.go:1-72): header row with
    the ORIGINAL field names, then records. Collects through
    toLocalIterator — constant driver memory."""
    import csv as _csv
    out = out or sys.stdout
    w = _csv.writer(out)
    w.writerow(df.columns)
    for row in df.toLocalIterator():
        w.writerow(["" if v is None else v for v in row])


def _jsonable(v):
    """Recursive JSON-encodable form; VariantVal (union-typed columns)
    re-emits its exact runtime value (42 vs "42" vs [42,"42"] — the
    union scenario, tests/scenarios/outputs/json/union.out)."""
    if hasattr(v, "toJson") and type(v).__name__ == "VariantVal":
        return json.loads(v.toJson())
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    return v


def write_json(df: DataFrame, out: IO[str] | None = None) -> None:
    """json output (outputs/formats/json_format.go:1-103): one object
    per line, original field names."""
    out = out or sys.stdout
    for row in df.toLocalIterator():
        out.write(json.dumps(_jsonable(row.asDict(recursive=True)),
                             default=str))
        out.write("\n")


_ZERO_TIME = "0001-01-01T00:00:00Z"


def _native_value(v) -> str:
    """Render one value the way the reference's native format does
    (octosql/values.go:357-424): <null>, bare ints/bools, 'strings',
    RFC3339 times, [lists], { structs }."""
    import datetime

    from pyspark.sql import Row
    if v is None:
        return "<null>"
    if hasattr(v, "toJson") and type(v).__name__ == "VariantVal":
        return _native_value(json.loads(v.toJson()))
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return f"'{v}'"
    if isinstance(v, float):
        return str(int(v)) if v.is_integer() else repr(v)
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%dT%H:%M:%SZ")
    if isinstance(v, Row):
        return "{ " + ", ".join(_native_value(x) for x in v) + " }"
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_native_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{ " + ", ".join(_native_value(x) for x in v.values()) + " }"
    return str(v)


def write_stream_native(df: DataFrame, out: IO[str] | None = None,
                        retraction: bool = False,
                        event_time_col: str | None = None) -> None:
    """stream_native (outputs/stream/printer.go:56-60 →
    execution/execution.go:73-91): ``{+<event-time>| v1, v2 |}`` per
    record, ``-`` for retractions. ``event_time_col`` names the column
    carrying each record's event time (set by tumble /
    max_diff_watermark); without one the zero time renders (same as
    the reference for non-temporal queries)."""
    out = out or sys.stdout
    marker = "-" if retraction else "+"
    et_idx = (df.columns.index(event_time_col)
              if event_time_col in (df.columns if event_time_col else [])
              else None)
    for row in df.toLocalIterator():
        ts = _ZERO_TIME
        if et_idx is not None and row[et_idx] is not None:
            ts = row[et_idx].strftime("%Y-%m-%dT%H:%M:%SZ")
        vals = ", ".join(_native_value(v) for v in row)
        out.write(f"{{{marker}{ts}| {vals} |}}\n")


def _octo_type_name(dt) -> str:
    """Spark dtype → the reference's type rendering
    (octosql/types.go String()): Int/Float/String/Boolean/Time,
    [elem] lists, {field: T; ...} structs, unions for variant."""
    from pyspark.sql import types as T
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "Int"
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "Float"
    if isinstance(dt, T.StringType):
        return "String"
    if isinstance(dt, T.BooleanType):
        return "Boolean"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return "Time"
    if isinstance(dt, T.DayTimeIntervalType):
        return "Duration"
    if isinstance(dt, T.ArrayType):
        return f"[{_octo_type_name(dt.elementType)}]"
    if isinstance(dt, T.StructType):
        inner = "; ".join(f"{f.name}: {_octo_type_name(f.dataType)}"
                          for f in dt.fields)
        return "{" + inner + "}"
    if isinstance(dt, T.BinaryType):
        return "Binary"
    if type(dt).__name__ == "VariantType":
        return "Union"
    return dt.simpleString()


def describe(df: DataFrame) -> DataFrame:
    """--describe: the query's output schema as rows with the
    reference's type names (cmd/root.go:300-313, cmd/describe.go;
    golden varying_object_fields_describe.out renders 'String',
    'Float', '{field: T; ...}')."""
    spark = df.sparkSession
    rows = [(f.name, _octo_type_name(f.dataType), f.nullable)
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


# ------------------------------------------------- streaming (foreachBatch)

def stream_native_diff_writer(out: IO[str] | None = None):
    """TRUE retraction stream for aggregating streaming queries: runs
    under complete output mode and diffs consecutive result frames —
    rows that disappeared print as ``{-...|}`` retractions, new rows as
    ``{+...|}`` additions. This reproduces the reference's
    retract-then-emit contract (custom_trigger_group_by.go:62-233 →
    outputs/stream/printer.go) exactly at the sink.

    The frame materializes per batch — the same cost profile as the
    reference's in-memory live buffer; bounded-state queries only (an
    aggregate's result set, not the raw stream)."""
    from collections import Counter
    prev: dict = {"rows": None}

    def _write(batch_df: DataFrame, batch_id: int, out=out) -> None:
        if out is None:
            out = sys.stdout
        cur_rows = [tuple(r) for r in batch_df.collect()]
        c_prev = Counter(prev["rows"]) if prev["rows"] else Counter()
        c_cur = Counter(cur_rows)
        for row in sorted((c_prev - c_cur).elements(), key=str):
            vals = ", ".join(_native_value(v) for v in row)
            out.write(f"{{-{_ZERO_TIME}| {vals} |}}\n")
        for row in sorted((c_cur - c_prev).elements(), key=str):
            vals = ", ".join(_native_value(v) for v in row)
            out.write(f"{{+{_ZERO_TIME}| {vals} |}}\n")
        prev["rows"] = cur_rows
        out.flush()

    return _write

def stream_batch_writer(output: str, out: IO[str] | None = None):
    """foreachBatch printer for streaming queries through the CLI.

    - ``stream_native``: every batch's rows print as additions
      (``{+ | ... |}``, outputs/stream/printer.go:34-55). Spark's
      update mode re-emits refined rows instead of sending explicit
      retractions — the refined row replaces the prior one for its
      key; documented deviation from the reference's ``-`` markers.
    - ``live_table``/``table``: repaint the current result per batch
      (live_output.go:165-204's ≤4 Hz repaint, one frame per
      micro-batch), rows sorted for a stable frame.
    - ``csv``/``json``: eager append per batch (outputs/eager).
    """
    header_written = {"done": False}

    def _write(batch_df: DataFrame, batch_id: int, out=out) -> None:
        if out is None:
            out = sys.stdout  # resolve per-batch: test harnesses swap it
        if output == "stream_native":
            write_stream_native(batch_df, out)
        elif output in ("table", "batch_table", "live_table"):
            out.write(f"-- batch {batch_id} --\n")
            write_table(batch_df.sort(batch_df.columns), out)
        elif output == "csv":
            import csv as _csv
            w = _csv.writer(out)
            if not header_written["done"]:
                w.writerow(batch_df.columns)
                header_written["done"] = True
            for row in batch_df.toLocalIterator():
                w.writerow(["" if v is None else v for v in row])
        elif output == "json":
            write_json(batch_df, out)
        out.flush()

    return _write
