"""octosql_spark — a PySpark-native analytics engine with the query
surface of cube2222/octosql (the reference lives at /root/reference,
studied in SURVEY.md; all ``file:line`` citations in docstrings are
relative to that tree).

Design (SURVEY.md §7): the reference's value is its *semantics and SQL
surface* — its mechanisms (push pipeline, btrees, retractions, its
8-rule optimizer) are what Spark/Catalyst already provide. So this
package is a thin, Spark-first layer:

- ``session``     — tuned SparkSession factory (AQE, Arrow, UTC).
- ``sources``     — csv/json/lines/parquet/stdin/memory readers with
                    octosql-style sampled schema inference.
- ``operators``   — DataFrame combinators for every §2 operator
                    (joins incl. lookup join, group-by w/ the
                    reference's aggregate catalog, distinct,
                    order/limit, set ops, unnest).
- ``functions``   — the scalar function catalog (§2.7) as Column
                    builders, registered for SQL use.
- ``tvf``         — table-valued functions: range, tumble,
                    max_diff_watermark, poll (§2.8).
- ``plans``       — a small logical IR + explain rendering (the real
                    optimizer is Catalyst).
- ``sql``         — the OctoSQL dialect front-end: tokenizer +
                    transpiler to Spark SQL (``->``, ``::``,
                    file-path tables, TVF keyword args, TRIGGER).
- ``streaming``   — Structured-Streaming mapping of the dataflow
                    subset (watermarks, triggers, stream joins).
- ``sinks``       — table/csv/json/stream output + --describe.
- ``datapipe``    — large-scale training-data ops: dedup (exact,
                    MinHash-LSH, SimHash, n-gram Jaccard, embedding
                    cosine), ANN similarity search, text analysis,
                    multimodal column plumbing.
"""

from octosql_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
