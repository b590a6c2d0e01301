from octosql_spark.plans.nodes import (  # noqa: F401
    Datasource, FileSource, Filter, Map, GroupBy, Join, Distinct,
    OrderLimit, Unnest, SetOp, With, Node, explain,
)
