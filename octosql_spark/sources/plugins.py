"""``plugins.*`` introspection tables
(datasources/plugins/database.go:31-184 + the five table files).

The reference surfaces its gRPC plugin ecosystem as five catalog
tables: ``repositories``, ``available_plugins``,
``available_versions``, ``installed_plugins``,
``installed_versions``. This port replaces gRPC plugin databases with
Spark's built-in JDBC source (SURVEY.md §2.1, sources/jdbc.py), so
the same five tables are generated from that world:

- the "repository" is the single built-in ``core`` repo (the JDBC
  connector set shipped with Spark — there is nothing to download);
- "available plugins" are the JDBC database types ``jdbc_url`` knows
  how to dial (plus the raw-URL passthrough);
- "installed plugins/versions" are the database types actually
  configured in octosql.yml — the closest analog to a plugin being
  present on the local machine.

Schemas (column names and order) mirror the reference exactly so
``SELECT * FROM plugins.repositories`` is drop-in. Tiny driver-side
DataFrames, same as ``docs.*``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORE_REPO = "core"

# name -> (description, file_extensions, website, license)
_BUILTIN = {
    "postgres": ("PostgreSQL over Spark JDBC", [],
                 "https://spark.apache.org/docs/latest/sql-data-sources-jdbc.html",
                 "Apache-2.0"),
    "mysql": ("MySQL over Spark JDBC", [],
              "https://spark.apache.org/docs/latest/sql-data-sources-jdbc.html",
              "Apache-2.0"),
    "sqlite": ("SQLite over Spark JDBC", [],
               "https://spark.apache.org/docs/latest/sql-data-sources-jdbc.html",
               "Apache-2.0"),
    "jdbc": ("Raw JDBC URL passthrough (derby, h2, oracle, ...)", [],
             "https://spark.apache.org/docs/latest/sql-data-sources-jdbc.html",
             "Apache-2.0"),
}

# the connector set ships with the engine, not via downloads: a single
# stable version marker keeps introspection output deterministic
_BUILTIN_VERSION = "builtin"


def _installed_types() -> list[str]:
    from octosql_spark.sources.jdbc import load_config
    seen: list[str] = []
    for db in load_config().get("databases", []):
        t = db.get("type", "jdbc")
        if t not in seen:
            seen.append(t)
    return seen


def plugins_table(spark: SparkSession, name: str) -> DataFrame:
    if name == "repositories":
        rows = [(CORE_REPO, "octosql-spark built-ins",
                 "JDBC connector set bundled with the engine")]
        return spark.createDataFrame(
            rows, "slug string, name string, description string")
    if name == "available_plugins":
        rows = [(n, d[0], d[1], d[2], "", d[3], "", CORE_REPO)
                for n, d in sorted(_BUILTIN.items())]
        return spark.createDataFrame(
            rows, "name string, description string, "
                  "file_extensions array<string>, website string, "
                  "contact_email string, license string, "
                  "readme_url string, repo_slug string")
    if name == "available_versions":
        rows = [(_BUILTIN_VERSION, False, n, CORE_REPO)
                for n in sorted(_BUILTIN)]
        return spark.createDataFrame(
            rows, "version string, prerelease boolean, "
                  "plugin_name string, repo_slug string")
    if name == "installed_plugins":
        rows = [(n, CORE_REPO) for n in sorted(_installed_types())]
        return spark.createDataFrame(
            rows, "name string, repo_slug string")
    if name == "installed_versions":
        rows = [(_BUILTIN_VERSION, False, n, CORE_REPO)
                for n in sorted(_installed_types())]
        return spark.createDataFrame(
            rows, "version string, prerelease boolean, "
                  "plugin_name string, repo_slug string")
    raise ValueError(f"unknown plugins table: plugins.{name}")
