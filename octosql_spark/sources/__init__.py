from octosql_spark.sources.files import (  # noqa: F401
    read_file, read_csv, read_json, read_lines, read_parquet, read_stdin,
    FILE_HANDLERS,
)
from octosql_spark.sources.memory import in_memory_records, dual  # noqa: F401
