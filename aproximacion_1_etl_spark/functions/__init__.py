from aproximacion_1_etl_spark.functions.cleaning import (  # noqa: F401
    empty_to_null,
    default_fill,
    strip_digits,
    cast_to_ddl,
    try_ts,
    lenient_ts,
    lenient_date,
)
