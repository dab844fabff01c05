from aproximacion_1_etl_spark.streaming.events import (  # noqa: F401
    read_events_stream,
    windowed_event_counts,
    run_available_now,
)
