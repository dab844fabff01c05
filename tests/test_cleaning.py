"""Scalar-transform tests (P3-P8): the reference's per-field cleaning
semantics (``extract-app/app.py:17-54``, ``src/2_...py:76-83``)."""

import pyspark.sql.functions as F

from aproximacion_1_etl_spark.functions.cleaning import (
    cast_to_ddl,
    default_fill,
    empty_to_null,
    lenient_ts,
    strip_digits,
    try_ts,
)


def _one(spark, **cols):
    ddl = ", ".join(
        f"{k} {'BIGINT' if isinstance(v, int) else 'STRING'}"
        for k, v in cols.items()
    )
    return spark.createDataFrame([tuple(cols.values())], ddl)


def test_empty_to_null_and_default(spark):
    df = _one(spark, a="", b="x", c=None)
    r = df.select(
        empty_to_null("a").alias("a"),
        empty_to_null("b").alias("b"),
        default_fill("a", "D").alias("fa"),
        default_fill("c", "D").alias("fc"),
    ).collect()[0]
    assert r["a"] is None and r["b"] == "x"
    assert r["fa"] == "D" and r["fc"] == "D"


def test_strip_digits(spark):
    df = _one(spark, s="M2X9")
    assert df.select(strip_digits("s").alias("s")).collect()[0]["s"] == "MX"


def test_strict_ts_null_on_failure(spark):
    df = spark.createDataFrame(
        [("2024-03-01T10:15:30.123456",), ("garbage",), (None,)], ["s"]
    )
    rows = df.select(try_ts("s").alias("t")).collect()
    assert rows[0]["t"] is not None
    assert rows[0]["t"].microsecond == 123456
    assert rows[1]["t"] is None and rows[2]["t"] is None


def test_lenient_ts_fallback_chain(spark):
    df = spark.createDataFrame(
        [
            ("2024-03-01T10:15:30.123456",),
            ("2024-03-01 10:15:30",),
            ("2024-03-01",),
            ("2024/03/01 08:00:00",),
            ("not a date",),
        ],
        ["s"],
    )
    rows = [r["t"] for r in df.select(lenient_ts("s").alias("t")).collect()]
    assert [r is not None for r in rows] == [True, True, True, True, False]


def test_cast_to_ddl_prunes_and_coerces(spark):
    df = _one(spark, a="12", b=3, c="drop-me")
    out = cast_to_ddl(df, "a BIGINT, b STRING")
    assert out.columns == ["a", "b"]
    r = out.collect()[0]
    assert r["a"] == 12 and r["b"] == "3"
    # permissive cast: bad input -> NULL, never an error (P6)
    bad = cast_to_ddl(_one(spark, a="xx", b=1), "a BIGINT, b BIGINT")
    assert bad.collect()[0]["a"] is None


def test_pii_scrub_redacts_emails_and_phones(spark):
    import pyspark.sql.functions as F

    from aproximacion_1_etl_spark.functions.cleaning import (
        pii_count,
        pii_scrub,
    )

    df = spark.createDataFrame(
        [
            (1, "contact alice@example.com or +1 (555) 123-4567 now"),
            (2, "no pii here at all"),
            (3, "two mails a@b.io c@d.org"),
        ],
        "id INT, t STRING",
    )
    out = {
        r["id"]: (r["s"], r["n"])
        for r in df.select(
            "id",
            pii_scrub(F.col("t")).alias("s"),
            pii_count(F.col("t")).alias("n"),
        ).collect()
    }
    assert out[1][0] == "contact [REDACTED] or +[REDACTED] now"
    assert out[1][1] == 2
    assert out[2] == ("no pii here at all", 0)
    assert out[3][0] == "two mails [REDACTED] [REDACTED]"
    assert out[3][1] == 2
