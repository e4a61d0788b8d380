from dpe_energy_performance_analysis_etl_spark.sources.io import (
    read_csv,
    read_parquet,
    read_json_lines,
    write_parquet,
    write_json_lines,
    read_jdbc_table,
    append_jdbc_table,
    purge_dir,
    write_bucketed_table,
)
from dpe_energy_performance_analysis_etl_spark.sources.rest import (
    RateLimiter,
    shared_limiter,
    rest_lookup_join,
    paged_rest_scan,
)
from dpe_energy_performance_analysis_etl_spark.sources.datasource import (
    PagedRestDataSource,
    register_datasources,
)
from dpe_energy_performance_analysis_etl_spark.sources.jdbc_dialect import (
    JdbcDialect,
    POSTGRES,
    DERBY,
    GENERIC,
    dialect_for_url,
    upsert_jdbc_table,
    jdbc_table_exists,
    check_table_ident,
)

__all__ = [
    "read_csv",
    "read_parquet",
    "read_json_lines",
    "write_parquet",
    "write_json_lines",
    "read_jdbc_table",
    "append_jdbc_table",
    "purge_dir",
    "write_bucketed_table",
    "RateLimiter",
    "shared_limiter",
    "rest_lookup_join",
    "paged_rest_scan",
    "JdbcDialect",
    "POSTGRES",
    "DERBY",
    "GENERIC",
    "dialect_for_url",
    "upsert_jdbc_table",
    "jdbc_table_exists",
    "check_table_ident",
    "PagedRestDataSource",
    "register_datasources",
]
