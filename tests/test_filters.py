"""Filter-chain tests — parity with filtering_test.go (TestFilterOnStruct,
TestAddFilter) and the filter catalogue (README.md:959-986)."""

import datetime

import pyspark.sql.functions as F

from validate_spark import RuleSet, validate
from validate_spark.functions.filters import (
    parse_filter_chain,
    apply_filter_chain,
    register_filter,
)


def apply_one(spark, chain_str, values, dtype="string"):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], f"i int, v {dtype}")
    out = df.withColumn("v", apply_filter_chain(F.col("v"), parse_filter_chain(chain_str)))
    rows = sorted(out.collect(), key=lambda r: r["i"])
    return [r["v"] for r in rows]


def test_trim_upper_chain(spark):
    # TestAddFilter: ' inhere ' → trim|upper → 'INHERE'
    assert apply_one(spark, "trim|upper", [" inhere "]) == ["INHERE"]


def test_casts(spark):
    assert apply_one(spark, "trim|int", [" 50 ", "abc"]) == [50, None]
    assert apply_one(spark, "float", ["1.5"]) == [1.5]
    assert apply_one(spark, "bool", ["on", "off", "yes", "xx"]) == [True, False, True, None]


def test_str2arr(spark):
    # tags 'go,php' → ['go','php']
    assert apply_one(spark, "str2arr:,", ["go,php"]) == [["go", "php"]]
    assert apply_one(spark, "str2ints:,", ["1,2"]) == [[1, 2]]


def test_case_filters(spark):
    assert apply_one(spark, "lower", ["ABC"]) == ["abc"]
    assert apply_one(spark, "ucFirst", ["abc"]) == ["Abc"]
    assert apply_one(spark, "lcFirst", ["ABC"]) == ["aBC"]
    assert apply_one(spark, "ucWord", ["hello world"]) == ["Hello World"]
    assert apply_one(spark, "snake", ["fooBarBaz"]) == ["foo_bar_baz"]
    assert apply_one(spark, "camel", ["foo_bar_baz"]) == ["fooBarBaz"]


def test_escape_filters(spark):
    assert apply_one(spark, "escapeHtml", ['<a href="x">']) == ["&lt;a href=&#34;x&#34;&gt;"]


def test_unique_and_trim_strings(spark):
    assert apply_one(spark, "unique", [["a", "a", "b"]], dtype="array<string>") == [["a", "b"]]
    assert apply_one(spark, "trimStrings", [[" a ", "b "]], dtype="array<string>") == [["a", "b"]]


def test_str2time(spark):
    out = apply_one(spark, "str2time", ["2024-01-02"])
    assert out[0] == datetime.datetime(2024, 1, 2)


def test_filter_on_struct_fixture(spark):
    # filter_struct golden (filtering_test.go:12-35):
    # ('one','inhere') -> cleaned ('ONE','INHERE'), verdict pass
    df = spark.createDataFrame([("one", "inhere")], "tres string, name string")
    rs = RuleSet(
        rules={"tres": "required|in:ONE,TWO,THREE", "name": "string"},
        filters={"tres": "upper", "name": "upper"},
    )
    res = validate(df, rs, key_cols=["tres"])
    rows = res.safe_rows().collect()
    assert len(rows) == 1
    assert (rows[0]["tres"], rows[0]["name"]) == ("ONE", "INHERE")


def test_failed_cast_filter_fails_validation(spark):
    # a failed filter cast = NULL → required catches it (validation.go:509-512)
    df = spark.createDataFrame([("abc",)], "age string")
    rs = RuleSet(rules={"age": "required|int"}, filters={"age": "int"})
    res = validate(df, rs)
    assert res.verdicts().collect()[0]["pass"] is False


def test_wildcard_element_filter(spark):
    # interior .* filter (#262): trim every element member
    df = spark.createDataFrame(
        [([{"name": " a "}, {"name": "b "}],)],
        "items array<struct<name:string>>",
    )
    rs = RuleSet(rules={"items": "required"}, filters={"items.*.name": "trim"})
    res = validate(df, rs, key_cols=["items"])
    row = res.safe_rows().collect()[0]
    assert [x["name"] for x in row["items"]] == ["a", "b"]


def test_custom_filter_registration(spark):
    @register_filter("reverse_str")
    def _reverse(col, args):
        return F.reverse(col)

    assert apply_one(spark, "reverse_str", ["abc"]) == ["cba"]


def test_cast_filter_changes_validation_dtype(spark):
    # regression: a cast filter (`float`) must make downstream
    # dtype-dependent machinery see the POST-filter type — the empty
    # gate on a double is null-based, not ''-based (was: ANSI cast
    # error comparing a double column to '')
    df = spark.createDataFrame(
        [("1", "12.5"), ("2", "-3.0"), ("3", "")], "id string, amt string"
    )
    rs = RuleSet(rules={"amt": "required|min:0"}, filters={"amt": "float"})
    res = validate(df, rs, key_cols=["id"])
    verd = {r["id"]: r["pass"] for r in res.verdicts().collect()}
    # "" try_casts to NULL → required fails; -3.0 fails min; 12.5 passes
    assert verd == {"1": True, "2": False, "3": False}
    viols = {(r["id"], r["validator"]) for r in res.violations().collect()}
    assert viols == {("2", "min"), ("3", "required")}


def test_nested_struct_filter_path(spark):
    df = spark.createDataFrame(
        [({"bal": " 10 ", "name": "x"},)], "acct struct<bal:string,name:string>"
    )
    rs = RuleSet(rules={"acct.bal": "required"}, filters={"acct.bal": "trim|int"})
    res = validate(df, rs, key_cols=["acct"])
    assert res.safe_rows().select("acct.bal").collect()[0][0] == 10
