"""JDBC datasources — the Spark-native replacement for the
reference's gRPC plugin databases (SURVEY.md §2.1: plugins/plugins.go
speaks a custom protocol to postgres/mysql plugin processes; Spark's
JDBC source provides the same capability — schema discovery +
predicate pushdown — built in, DataSourceV2 under the hood).

Configured the way the reference is (octosql.yml, config/config.go):

    databases:
      - name: mydb
        type: postgres
        config:
          host: localhost
          port: 5432
          database: mydb
          user: u
          password: p

Table references ``mydb.tablename`` then resolve through
``jdbc_table``. No JDBC driver jars ship in this container, so this
module is exercised by config/URL-construction tests; the read path
is the stock ``spark.read.jdbc``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_URL_TEMPLATES = {
    "postgres": "jdbc:postgresql://{host}:{port}/{database}",
    "mysql": "jdbc:mysql://{host}:{port}/{database}",
    "sqlite": "jdbc:sqlite:{database}",
}

_DEFAULT_PORTS = {"postgres": 5432, "mysql": 3306}


def load_config(path: str | None = None) -> dict:
    """octosql.yml-style config. YAML isn't vendored in this
    container; the subset the reference uses (two-level keys) is
    parsed directly, and real YAML is used when available."""
    path = path or os.environ.get("OCTOSQL_CONFIG", "octosql.yml")
    if not os.path.exists(path):
        return {"databases": []}
    try:
        import yaml  # type: ignore
        with open(path) as f:
            return yaml.safe_load(f) or {"databases": []}
    except ImportError:
        return _parse_mini_yaml(open(path).read())


def _parse_mini_yaml(text: str) -> dict:
    """Just enough YAML for the reference's config shape: a
    ``databases:`` list of ``- name/type/config`` entries."""
    dbs: list[dict] = []
    cur: dict | None = None
    in_config = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].rstrip()
        if not line.strip():
            continue
        stripped = line.strip()
        if stripped.startswith("- name:"):
            cur = {"name": stripped.split(":", 1)[1].strip(), "config": {}}
            dbs.append(cur)
            in_config = False
        elif cur is not None and stripped.startswith("type:"):
            cur["type"] = stripped.split(":", 1)[1].strip()
            in_config = False
        elif cur is not None and stripped.startswith("config:"):
            in_config = True
        elif cur is not None and in_config and ":" in stripped:
            k, v = stripped.split(":", 1)
            v = v.strip()
            cur["config"][k.strip()] = int(v) if v.isdigit() else v
    return {"databases": dbs}


def jdbc_url(db: dict) -> str:
    cfg = dict(db.get("config", {}))
    if "url" in cfg:  # raw JDBC URL passthrough (derby, h2, oracle...)
        return cfg["url"]
    dbtype = db["type"]
    cfg.setdefault("port", _DEFAULT_PORTS.get(dbtype, 0))
    return _URL_TEMPLATES[dbtype].format(**cfg)


def jdbc_table(spark: SparkSession, db: dict, table: str,
               partition_column: str | None = None,
               num_partitions: int = 8,
               lower_bound=None, upper_bound=None) -> DataFrame:
    """Read one table. Predicate pushdown and column pruning are
    handled by the JDBC source (the reference pushes ``col op const``
    conjuncts over its plugin protocol — physical/physical.go:88-91;
    Spark does the same through the JDBC dialect).

    ``partition_column`` enables parallel reads (the scale path: N
    concurrent range queries instead of one cursor). Spark requires
    partitionColumn/lowerBound/upperBound/numPartitions as a foursome;
    when bounds aren't supplied they are probed with a one-row
    MIN/MAX query before the parallel read."""
    cfg = db.get("config", {})

    def _base():
        return (spark.read.format("jdbc")
                .option("url", jdbc_url(db))
                .option("user", str(cfg.get("user", "")))
                .option("password", str(cfg.get("password", ""))))

    reader = _base().option("dbtable", table)
    if partition_column:
        if lower_bound is None or upper_bound is None:
            probe = (_base()
                     .option("query",
                             f"SELECT MIN({partition_column}) AS lo, "
                             f"MAX({partition_column}) AS hi FROM {table}")
                     .load().collect()[0])
            # positional access: identifier case is dialect-dependent
            # (Derby/Oracle uppercase unquoted aliases)
            lower_bound = probe[0] if lower_bound is None else lower_bound
            upper_bound = probe[1] if upper_bound is None else upper_bound
        if lower_bound is None or upper_bound is None:
            return reader.load()  # empty table — single-cursor read
        reader = (reader.option("partitionColumn", partition_column)
                  .option("lowerBound", str(lower_bound))
                  .option("upperBound", str(upper_bound))
                  .option("numPartitions", str(num_partitions)))
    return reader.load()


def database_by_name(config: dict, name: str) -> dict | None:
    for db in config.get("databases", []):
        if db.get("name") == name:
            return db
    return None
