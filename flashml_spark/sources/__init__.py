from flashml_spark.sources.readers import (  # noqa: F401
    load_table,
    load_tables,
    read_source,
    run_sql_view_chain,
)
from flashml_spark.sources.savepoint import SavepointManager  # noqa: F401
