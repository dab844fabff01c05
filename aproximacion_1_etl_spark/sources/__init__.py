from aproximacion_1_etl_spark.sources.tables import load_table, load_all, TABLES  # noqa: F401
