"""TRIGGER COUNTING n — a real implementation.

The reference's counting trigger (execution/triggers.go:17-87) fires a
key's aggregate every n records seen for that key; each re-emission
retracts the prior value (custom_trigger_group_by.go:62-233,
``previouslySentValues``). Structured Streaming has no per-record
trigger, so ``map_trigger`` approximates with update mode — THIS
module is the exact version: a custom stateful operator via
``applyInPandasWithState`` keeping (per key) the running aggregate
state and a records-since-last-emit counter, emitting one output row
per n-record boundary crossed.

Output rows carry ``emitted_at_count`` (the total records seen at
emission) — the positive half of the reference's retract/emit pairs;
consumers treat a newer emission for the same key as replacing the
older one (same contract as update-mode sinks).

Scale: state is per-key O(#aggregates); rows stream through in Arrow
batches grouped by key. This is the documented pattern for custom
stateful operators the engine lacks natively.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StructField, StructType, DoubleType, StringType,
)

_SUPPORTED = ("count", "sum", "min", "max", "avg")


def counting_trigger_aggregate(df: DataFrame, keys: Sequence[str],
                               aggs: Sequence[tuple[str, str, str]],
                               n: int) -> DataFrame:
    """``aggs``: (fn, column, alias) with fn in count/sum/min/max/avg.
    Returns a streaming DataFrame that emits one row per key each time
    that key has accumulated ``n`` more records."""
    for fn, _, _ in aggs:
        if fn not in _SUPPORTED:
            raise ValueError(f"counting trigger: unsupported aggregate {fn!r}")

    key_fields = [df.schema[k] for k in keys]
    out_schema = StructType(
        list(key_fields)
        + [StructField("emitted_at_count", LongType())]
        + [StructField(alias, LongType() if fn == "count" else DoubleType())
           for fn, _, alias in aggs])
    # state: total_seen, since_emit, then per-agg accumulators (sum+cnt)
    state_schema = StructType(
        [StructField("total", LongType()), StructField("since", LongType())]
        + [f for i, _ in enumerate(aggs) for f in
           (StructField(f"acc{i}", DoubleType()),
            StructField(f"cnt{i}", LongType()))])

    agg_specs = list(aggs)
    n_keys = len(keys)

    def fn(key: tuple, pdf_iter: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            vals = list(state.get)
        else:
            vals = [0, 0] + [None, 0] * len(agg_specs)
        total, since = vals[0], vals[1]
        accs = vals[2:]

        out_rows = []
        for pdf in pdf_iter:
            for _, row in pdf.iterrows():
                total += 1
                since += 1
                for i, (f, col, _alias) in enumerate(agg_specs):
                    v = row[col] if col != "*" else 1
                    if v is None or (isinstance(v, float) and pd.isna(v)):
                        continue
                    a = accs[2 * i]
                    # accumulators live in DoubleType state fields — a
                    # Python int there is silently dropped on restore
                    if f == "count":
                        accs[2 * i] = float(a or 0) + 1.0
                    elif f in ("sum", "avg"):
                        accs[2 * i] = (a or 0.0) + float(v)
                        accs[2 * i + 1] += 1
                    elif f == "min":
                        accs[2 * i] = float(v) if a is None else min(a, float(v))
                    elif f == "max":
                        accs[2 * i] = float(v) if a is None else max(a, float(v))
                if since >= n:
                    since = 0
                    out = list(key) + [total]
                    for i, (f, _col, _alias) in enumerate(agg_specs):
                        a, c = accs[2 * i], accs[2 * i + 1]
                        if f == "count":
                            out.append(int(a or 0))
                        elif f == "avg":
                            out.append((a / c) if c else None)
                        else:
                            out.append(a)
                    out_rows.append(out)

        state.update(tuple([total, since] + accs))
        cols = [f.name for f in out_schema.fields]
        if out_rows:
            yield pd.DataFrame(out_rows, columns=cols)

    return (df.groupBy(*keys)
            .applyInPandasWithState(fn, outputStructType=out_schema,
                                    stateStructType=state_schema,
                                    outputMode="append",
                                    timeoutConf=GroupStateTimeout.NoTimeout))
