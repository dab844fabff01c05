from aproximacion_1_etl_spark.operators.explode import explode_json_array  # noqa: F401
from aproximacion_1_etl_spark.operators.refine import (  # noqa: F401
    dedup_latest,
    merge_upsert,
    latest_child_attrs,
    nth_event,
    child_rollup,
)
