from octosql_spark.functions.registry import (  # noqa: F401
    FUNCTIONS, FunctionDef, call, register_sql_functions,
)
