"""Un-nesting layer — the reference's signature operator family
(SURVEY.md §2.3, F1-F5).

The reference stores array-of-struct sub-fields re-serialized as JSON
strings inside the wide parent row (``json.dumps(record[json_field])``,
``src/1_run_main_table_pipeline.py:60-65``), then each child pipeline
``json.loads`` + explodes one array into a child table carrying the
parent key (``src/3_...py:93-97``).

Spark-first: ``from_json`` -> ``explode`` -> nested projection. One
declarative plan; Catalyst fuses parse+explode+project into a single
whole-stage-codegen span, and the parent-key carry is just keeping
sibling columns in the select — no joins, no shuffles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def pack_children_as_json(
    df: DataFrame, parent_keys: list[str], child_cols: list[str], json_col: str
) -> DataFrame:
    """The P12/master-table direction: collapse child rows into a JSON
    string array per parent (what the reference's wide table stores).

    groupBy(parent) + collect_list(struct) + to_json. This shuffles once
    on the parent key — at 100 TB the parent key is the natural
    partitioning, so downstream explodes are shuffle-free.
    """
    struct = F.struct(*[F.col(c) for c in child_cols])
    return df.groupBy(*parent_keys).agg(
        F.to_json(F.collect_list(struct)).alias(json_col)
    )


def explode_json_array(
    df: DataFrame,
    json_col: str,
    element_schema_ddl: str,
    parent_keys: list[str],
    projections: dict[str, str] | None = None,
) -> DataFrame:
    """F2-F5: parse a JSON-string array column and emit one row per
    element, carrying the parent keys.

    ``projections`` maps output-column-name -> path inside the element
    (dotted for nested structs, e.g. ``info.user_name`` — the
    ``event['info']['user_name']`` chains at ``src/2_...py:92-96``).
    Null / unparsable arrays yield no rows (P9 null-guard + F6
    error-tolerance: ``from_json`` returns NULL on corrupt input, and
    the generator-style skip is ``explode``'s default for NULL arrays).
    """
    arr = F.from_json(F.col(json_col), f"array<struct<{element_schema_ddl}>>")
    exploded = df.select(
        *[F.col(k) for k in parent_keys], F.explode(arr).alias("_e")
    )
    if projections is None:
        return exploded.select(*parent_keys, "_e.*")
    return exploded.select(
        *[F.col(k) for k in parent_keys],
        *[F.col(f"_e.{path}").alias(name) for name, path in projections.items()],
    )
