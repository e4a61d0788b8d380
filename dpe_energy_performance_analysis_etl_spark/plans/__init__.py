from dpe_energy_performance_analysis_etl_spark.plans.queries import (
    QUERIES,
    ORACLE_SQL,
    load_tables,
    register_tables,
    run_sql,
)

__all__ = ["QUERIES", "ORACLE_SQL", "load_tables", "register_tables", "run_sql"]
