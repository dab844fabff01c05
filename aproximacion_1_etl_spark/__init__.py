"""aproximacion_1_etl_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of rocamil85/Aproximacion-1-ETL.

The reference system is a GCP batch ETL (Cloud Run extractor -> GCS ->
5 Apache Beam/Dataflow pipelines -> BigQuery -> ~30 stored procedures,
orchestrated by Airflow). This package re-expresses *what it computes* —
ingestion, scalar cleaning, JSON-array un-nesting, dedup/merge/update
refinement chain — as idiomatic PySpark DataFrame programs, plus the
large-scale training-data-pipeline extensions (dedup, similarity search,
text analysis, multimodal plumbing) a 100 TB deployment needs.

Design rules (SURVEY.md §7):
- DataFrame/SQL only; Catalyst + AQE do the physical planning.
- No row-at-a-time Python UDFs in hot paths; Arrow pandas UDFs where
  Python is unavoidable (external enrichment, multimodal decode).
- Every operator keyed/partitioned — no driver-side loops over data.
"""

__version__ = "0.1.0"

from aproximacion_1_etl_spark.session import get_spark  # noqa: F401
