from octosql_spark.sql.transpiler import transpile, run_query, Transpiled  # noqa: F401
