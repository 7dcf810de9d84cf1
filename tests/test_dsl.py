"""DSL parser unit tests — grammar parity with rule.go:171-217 / util.go:74-95."""

from validate_spark.plans.dsl import split_segments, parse_segment, parse_rules
from validate_spark.functions.validators import resolve_alias


def test_split_basic():
    assert split_segments("required|minLen:7") == ["required", "minLen:7"]


def test_split_escaped_pipe():
    # \| escape inside a regexp arg (util.go:74-95)
    assert split_segments(r"regexp:^a\|b$|required") == ["regexp:^a|b$", "required"]


def test_split_empty_segments_dropped():
    assert split_segments("a||b|") == ["a", "b"]


def test_parse_segment_aliases():
    assert parse_segment("in:1,2,3") == ("enum", ("1", "2", "3"))
    assert parse_segment("min_len:7") == ("minLength", ("7",))
    assert parse_segment("email") == ("isEmail", ())
    assert parse_segment("str_len:1,5") == ("stringLength", ("1", "5"))


def test_regexp_raw_arg_keeps_colons_and_commas():
    name, args = parse_segment("regexp:^[a-z:,]{2,}$")
    assert name == "regexp"
    assert args == ("^[a-z:,]{2,}$",)


def test_default_and_optional_extracted():
    fr = parse_rules("age", "default:18|required|int:1,120")
    assert fr.default == "18"
    assert [r.name for r in fr.rules] == ["required", "isInt"]
    fr2 = parse_rules("nick", "optional|minLen:3")
    assert fr2.optional and fr2.rules[0].optional


def test_required_family_flag():
    fr = parse_rules("a", "required_if:b,1,2")
    assert fr.rules[0].required_family
    assert fr.rules[0].name == "requiredIf"


def test_alias_table_resolves():
    for alias, real in [
        ("in", "enum"), ("lte", "max"), ("gte", "min"), ("len", "length"),
        ("uuid4", "isUUID4"), ("url", "isURL"), ("date", "isDate"),
        ("eq_field", "eqField"), ("mime", "inMimeTypes"),
    ]:
        assert resolve_alias(alias) == real


def test_custom_message_lookup():
    fr = parse_rules(
        "name", "required|minLen:7",
        messages={"name.minLength": "User Name min length is 7"},
    )
    assert fr.rules[1].message == "User Name min length is 7"
