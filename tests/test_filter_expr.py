"""Milvus-style filter expression grammar → Catalyst Column."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from python_vectordbapp_ceph_spark.operators.filter_expr import (
    FilterExprError,
    translate,
)

SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
        T.StructField("props", T.StringType()),  # JSON string column
    ]
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            ("a", 1, {"color": "red", "size": "L"}, '{"k": "1"}'),
            ("b", 2, {"color": "blue"}, '{"k": "2"}'),
            ("c", 3, None, None),
        ],
        SCHEMA,
    )


def keys(df, expr):
    return {r.key for r in df.filter(translate(expr, df)).select("key").collect()}


def test_comparisons(df):
    assert keys(df, "n > 1") == {"b", "c"}
    assert keys(df, "n >= 2 and n <= 3") == {"b", "c"}
    assert keys(df, 'key == "a"') == {"a"}
    assert keys(df, 'key != "a"') == {"b", "c"}


def test_in_list_both_delimiters(df):
    assert keys(df, "n in (1, 3)") == {"a", "c"}
    assert keys(df, "n in [1, 3]") == {"a", "c"}


def test_in_list_mismatched_closer_rejected():
    with pytest.raises(FilterExprError):
        translate("n in (1, 2]")
    with pytest.raises(FilterExprError):
        translate("n in [1, 2)")


def test_like_not_parens(df):
    assert keys(df, 'key like "a%"') == {"a"}
    assert keys(df, 'not (key == "a")') == {"b", "c"}
    assert keys(df, '(n == 1 or n == 2) and key != "a"') == {"b"}


def test_parenthesized_operand(df):
    # regression: `(a) == 1` used to raise "unexpected token lparen"
    assert keys(df, "(n) == 1") == {"a"}


def test_map_tag_access(df):
    # regression: MapType access compiled to get_json_object(cast(map))
    # which silently matched nothing (the Milvus delete-filter shape,
    # pythonvectordbceph_milvus.py:109)
    assert keys(df, 'tags["color"] == "red"') == {"a"}
    assert keys(df, 'tags["color"] == "blue"') == {"b"}
    assert keys(df, 'tags["size"] == "L"') == {"a"}


def test_json_string_access(df):
    assert keys(df, 'props["k"] == "1"') == {"a"}


def test_nested_json_access(spark):
    """Regression: the second level of col["a"]["b"] compiled to
    try_element_at on a string and raised AnalysisException."""
    df = spark.createDataFrame(
        [("x", '{"a": {"b": "1"}}'), ("y", '{"a": {"b": "2"}}')],
        "key string, props string",
    )
    got = {r.key for r in df.filter(
        translate('props["a"]["b"] == "2"', df)).collect()}
    assert got == {"y"}


def test_nested_map_access(spark):
    from pyspark.sql import types as TT

    schema = TT.StructType([
        TT.StructField("key", TT.StringType()),
        TT.StructField("m", TT.MapType(
            TT.StringType(),
            TT.MapType(TT.StringType(), TT.StringType()))),
    ])
    df = spark.createDataFrame(
        [("x", {"a": {"b": "1"}}), ("y", {"a": {"b": "2"}})], schema
    )
    got = {r.key for r in df.filter(translate('m["a"]["b"] == "2"', df)).collect()}
    assert got == {"y"}


def test_empty_expr_matches_all(df):
    assert keys(df, "") == {"a", "b", "c"}
    assert keys(df, "   ") == {"a", "b", "c"}


def test_errors():
    with pytest.raises(FilterExprError):
        translate("n ===")
    with pytest.raises(FilterExprError):
        translate('like "x"')
    with pytest.raises(FilterExprError):
        translate("n == 1 extra_token junk(")
    with pytest.raises(FilterExprError):
        translate("n @ 1")


def test_arithmetic_precedence_and_unary_minus(spark, df):
    got = {r.key for r in df.filter(translate("n * 2 + 1 > 4", df)).collect()}
    assert got == {"b", "c"}  # 2*2+1=5, 3*2+1=7
    got = {r.key for r in df.filter(translate("n + 2 * 2 == 5", df)).collect()}
    assert got == {"a"}  # precedence: 1 + 4
    got = {r.key for r in df.filter(translate("-n < -2", df)).collect()}
    assert got == {"c"}
    got = {r.key for r in df.filter(translate("(n + 1) % 2 == 0", df)).collect()}
    assert got == {"a", "c"}
    got = {r.key for r in df.filter(translate("n in [-1, 3]", df)).collect()}
    assert got == {"c"}


def test_is_null_and_is_not_null(spark, df):
    got = {r.key for r in df.filter(translate("tags is null", df)).collect()}
    assert got == {"c"}
    got = {r.key for r in df.filter(translate("props is not null and n < 2", df)).collect()}
    assert got == {"a"}


def test_array_contains_and_length(spark):
    adf = spark.createDataFrame(
        [("a", [1, 2, 3]), ("b", [4]), ("c", [])],
        "key string, xs array<int>",
    )
    got = {r.key for r in adf.filter(translate("array_contains(xs, 2)", adf)).collect()}
    assert got == {"a"}
    got = {r.key for r in adf.filter(translate("array_length(xs) >= 1", adf)).collect()}
    assert got == {"a", "b"}


def test_arithmetic_inside_grouped_boolean_still_parses(spark, df):
    got = {
        r.key
        for r in df.filter(
            translate("(n - 1 == 0 or n - 2 == 0) and key != 'b'", df)
        ).collect()
    }
    assert got == {"a"}


@pytest.mark.slow
def test_random_arithmetic_expressions_match_spark_sql(spark):
    """The extended grammar is SQL-compatible for arithmetic
    comparisons: 60 seeded-random expressions filter identically via
    translate() and via Spark SQL WHERE (== mapped to =)."""
    import random

    rng = random.Random(42)
    df = spark.createDataFrame(
        [(i, float(i) * 1.5 - 7) for i in range(-20, 21)],
        "n long, v double",
    )
    df.createOrReplaceTempView("fx_rand")
    for _ in range(60):
        left = rng.choice(["n", "v", "n + 3", "v * 2", "n % 5", "-n",
                           "(n + 1) * 2", "v - n", "n * n"])
        op = rng.choice(["==", "!=", ">", ">=", "<", "<="])
        right = str(rng.randint(-15, 15))
        expr = f"{left} {op} {right}"
        want = {
            r.n
            for r in spark.sql(
                f"SELECT n FROM fx_rand WHERE {expr.replace('==', '=')}"
            ).collect()
        }
        got = {r.n for r in df.filter(translate(expr, df)).select("n").collect()}
        assert got == want, expr
