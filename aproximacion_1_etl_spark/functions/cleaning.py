"""Per-cell scalar transforms (SURVEY.md §2.2 P3-P8, §2.7).

Every function here is a pure Column expression — JVM-side, inside
whole-stage codegen, no Python UDFs. These are the Spark forms of the
reference's per-record cleaning helpers:

- empty-string -> NULL normalization applied to nearly every field
  (reference ``extract-app/app.py:41-54``);
- default fill (``recycling`` -> False, ``app.py:40``);
- digit-strip clean (``size_box``, ``app.py:42``);
- strict-pattern timestamp parse returning NULL on failure
  (``src/2_run_events_info_temp_pipeline.py:76-83``);
- lenient dateutil-style parse with format fallback (``app.py:17-35``);
- schema cast against a string DDL (the ``"name:BQTYPE"`` declarations,
  ``src/1_run_main_table_pipeline.py:95-116``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.types import StructType

ColumnOrName = Column | str

# Reference format '%Y-%m-%dT%H:%M:%S.%f' (src/2_...py:79)
STRICT_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

# Fallback chain standing in for dateutil.parser.parse (app.py:17-35).
# Documented, bounded set — SURVEY.md §7 chose explicit formats over
# emulating dateutil exactly.
# Ordered most-specific-first (fraction before bare seconds, offset
# variants before naive) so coalesce picks the tightest match. Mirrors
# the breadth of the reference's dateutil.parser (app.py:17-35):
# ISO 'T' and space separators, micro/milli fractions, date-only,
# slashed and day-first forms, and zone-offset suffixes ('XXX' matches
# '+03:00' and 'Z'; offset strings normalize to the session timezone).
LENIENT_TS_FMTS = (
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",
    "yyyy-MM-dd'T'HH:mm:ss.SSS",
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd",
    "yyyy/MM/dd HH:mm:ss",
    "dd-MM-yyyy HH:mm:ss",
    "dd/MM/yyyy",
)


def _c(col: ColumnOrName) -> Column:
    return F.col(col) if isinstance(col, str) else col


def empty_to_null(col: ColumnOrName) -> Column:
    """P3: '' -> NULL (the `x if x not in [None, ""] else None` pattern)."""
    return F.nullif(_c(col), F.lit(""))


def default_fill(col: ColumnOrName, default) -> Column:
    """P4: null-or-empty -> default (e.g. recycling -> False)."""
    return F.coalesce(empty_to_null(col), F.lit(default))


def strip_digits(col: ColumnOrName) -> Column:
    """P5: remove all digit characters (size_box clean)."""
    return F.regexp_replace(_c(col), "[0-9]", "")


def try_ts(col: ColumnOrName, fmt: str = STRICT_TS_FMT) -> Column:
    """P7: strict-pattern parse, NULL on failure (never raises)."""
    return F.try_to_timestamp(_c(col), F.lit(fmt))


def lenient_ts(col: ColumnOrName) -> Column:
    """P8: lenient parse via a coalesce chain over known formats."""
    c = _c(col)
    return F.coalesce(*[F.try_to_timestamp(c, F.lit(f)) for f in LENIENT_TS_FMTS])


def lenient_date(col: ColumnOrName) -> Column:
    """P8 date-only variant: 'yyyy-MM-dd' string or NULL."""
    return F.date_format(lenient_ts(col), "yyyy-MM-dd")


# PII patterns deliberately use only syntax common to Java regex (Spark)
# and RE2 (DuckDB): char classes, +, {m,}, no lookaround/backrefs.
PII_PATTERNS: dict[str, str] = {
    "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}",
    "phone": "[0-9][0-9 ()+.-]{6,}[0-9]",
}


def pii_scrub(col: ColumnOrName, token: str = "[REDACTED]") -> Column:
    """Redact PII-shaped substrings (emails, phone-number-like digit
    runs) with ``token``. A pre-training scrub pass: pure
    regexp_replace chain, JVM-side, one narrow projection — no Python
    in the hot path at any scale."""
    out = _c(col)
    for pat in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, token)
    return out


def pii_count(col: ColumnOrName) -> Column:
    """Number of PII-shaped matches in the value (audit metric for the
    scrub pass)."""
    c = _c(col)
    total: Column = F.lit(0)
    for pat in PII_PATTERNS.values():
        total = total + F.size(
            F.regexp_extract_all(c, F.lit(pat), F.lit(0))
        )
    return total.cast("bigint")


def cast_to_ddl(df: DataFrame, ddl: str) -> DataFrame:
    """P6: project+cast to a declared string-DDL schema.

    Spark's analog of the reference's per-pipeline ``"a:STRING,b:INTEGER"``
    sink schemas: selects exactly the declared columns (pruning) and
    casts each (non-ANSI => null on bad cast, matching the permissive
    BigQuery-insert coercion).
    """
    schema = StructType.fromDDL(ddl)
    return df.select(
        [F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )


def flatten_struct(df: DataFrame, sep: str = "_") -> DataFrame:
    """Recursively flatten every struct column into top-level columns
    named ``parent<sep>child`` — the generalized form of the
    reference's hand-written wide projection (``app.py:37-98`` lifts
    ``destination.geo_location.lat`` etc. field-by-field; here the
    schema drives it, so a ~100-field nested order flattens with zero
    per-field code). Arrays are left intact (un-nesting them is
    explode's job, operators/explode.py). Pure projection — no shuffle,
    fully prunable by Catalyst."""
    cols = []
    names: list[str] = []
    again = False
    for f in df.schema.fields:
        if isinstance(f.dataType, StructType):
            again = True
            for sub in f.dataType.fields:
                cols.append(
                    F.col(f"`{f.name}`.`{sub.name}`").alias(
                        f"{f.name}{sep}{sub.name}"
                    )
                )
                names.append(f"{f.name}{sep}{sub.name}")
        else:
            cols.append(F.col(f"`{f.name}`"))
            names.append(f.name)
    # A flattened name can collide with an existing column (top-level
    # `a_b` plus struct `a.b`): fail loudly here, not with an ambiguous-
    # column error at some downstream select.
    dupes = sorted({n for n in names if names.count(n) > 1})
    if dupes:
        raise ValueError(
            f"flatten_struct: flattened name(s) {dupes} collide with "
            f"existing columns; rename the source columns or use a "
            f"different sep than {sep!r}"
        )
    out = df.select(cols)
    return flatten_struct(out, sep) if again else out
