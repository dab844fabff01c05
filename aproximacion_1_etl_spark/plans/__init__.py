from aproximacion_1_etl_spark.plans.runner import run_daily, flagship  # noqa: F401
