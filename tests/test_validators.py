"""Per-validator unit tests — semantics hand-derived from the reference
(validators_test.go, validators_string.go, internal/validators/*).

Each case evaluates ONE rule against a small column of values with
skip_on_empty=False so the raw validator semantics (incl. the
"empty string fails every string validator" rule) are visible.
"""

import pytest

from validate_spark import RuleSet, validate


def eval_rule(spark, rule, values, dtype="string", skip_on_empty=False, zero_as_empty=False):
    data = [(i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(data, f"i int, v {dtype}")
    rs = RuleSet(rules={"v": rule}, skip_on_empty=skip_on_empty, zero_as_empty=zero_as_empty)
    res = validate(df, rs, key_cols=["i"])
    rows = res.verdicts().collect()
    return [r["pass"] for r in sorted(rows, key=lambda r: r["i"])]


# --- presence ---------------------------------------------------------------

def test_required(spark):
    assert eval_rule(spark, "required", ["a", "", None]) == [True, False, False]


def test_required_numeric_zero_not_empty_by_default(spark):
    # map-source carve-out (validators.go:590-598): 0 is NOT empty
    assert eval_rule(spark, "required", [0, 1, None], dtype="int") == [True, True, False]


def test_required_zero_as_empty_flag(spark):
    assert eval_rule(spark, "required", [0, 1], dtype="int", zero_as_empty=True) == [False, True]


def test_required_array(spark):
    assert eval_rule(spark, "required", [["a"], [], None], dtype="array<string>") == [
        True, False, False,
    ]


# --- compare / range / membership -------------------------------------------

def test_min_max_numeric(spark):
    assert eval_rule(spark, "min:3", [2, 3, 4], dtype="int") == [False, True, True]
    assert eval_rule(spark, "max:3", [2, 3, 4], dtype="int") == [True, True, False]


def test_min_on_numeric_string(spark):
    # valueCompare funnels strings through float64 when arg is numeric
    assert eval_rule(spark, "min:10", ["9", "10", "11"]) == [False, True, True]


def test_between(spark):
    assert eval_rule(spark, "between:1,10", [0, 1, 10, 11], dtype="int") == [
        False, True, True, False,
    ]
    assert eval_rule(spark, "range:1,10", [5], dtype="int") == [True]


def test_enum_and_not_in(spark):
    # TestEnumAndNotIn (validators_test.go)
    assert eval_rule(spark, "in:a,b,c", ["a", "d", ""]) == [True, False, False]
    assert eval_rule(spark, "not_in:a,b", ["a", "c"]) == [False, True]
    assert eval_rule(spark, "in:1,2,3", [1, 4], dtype="int") == [True, False]


def test_eq_ne(spark):
    assert eval_rule(spark, "eq:abc", ["abc", "x"]) == [True, False]
    assert eval_rule(spark, "ne:abc", ["abc", "x"]) == [False, True]
    assert eval_rule(spark, "int_eq:5", ["5", "6"]) == [True, False]


def test_contains_string_and_array(spark):
    assert eval_rule(spark, "contains:bc", ["abcd", "xyz"]) == [True, False]
    assert eval_rule(spark, "contains:go", [["go", "php"], ["js"]], dtype="array<string>") == [
        True, False,
    ]
    assert eval_rule(spark, "not_contains:bc", ["abcd", "xyz"]) == [False, True]


def test_starts_ends_with(spark):
    assert eval_rule(spark, "starts_with:ab", ["abc", "xab"]) == [True, False]
    assert eval_rule(spark, "ends_with:bc", ["abc", "bcx"]) == [True, False]


# --- length ------------------------------------------------------------------

def test_length_bytes_vs_runes(spark):
    # Go len("你好") == 6 bytes (length.go:13-25); rune len == 2
    assert eval_rule(spark, "len:6", ["你好", "abcdef", "ab"]) == [True, True, False]
    assert eval_rule(spark, "strLen:2,2", ["你好", "abcdef"]) == [True, False]


def test_min_max_length(spark):
    assert eval_rule(spark, "minLen:3", ["ab", "abc"]) == [False, True]
    assert eval_rule(spark, "maxLen:3", ["abc", "abcd"]) == [True, False]


def test_length_on_array(spark):
    assert eval_rule(spark, "minLen:2", [["a"], ["a", "b"]], dtype="array<string>") == [
        False, True,
    ]


# --- type checks ---------------------------------------------------------------

def test_is_int_typed_and_string(spark):
    assert eval_rule(spark, "int", [1, None], dtype="int") == [True, False]
    assert eval_rule(spark, "int", ["10", "-3", "1.5", "abc", "+7", "007"]) == [
        True, True, False, False, True, False,  # Int regex: no leading zeros
    ]
    assert eval_rule(spark, "int:1,10", [0, 5, 11], dtype="int") == [False, True, False]


def test_is_uint_bool_float(spark):
    assert eval_rule(spark, "uint", ["5", "-5"]) == [True, False]
    assert eval_rule(spark, "bool", ["1", "on", "FALSE", "maybe"]) == [True, True, True, False]
    assert eval_rule(spark, "float", ["1.5", "2", "1e3", "abc"]) == [True, True, True, False]


def test_is_string_and_containers(spark):
    assert eval_rule(spark, "string", ["x"]) == [True]
    assert eval_rule(spark, "string", [1], dtype="int") == [False]
    assert eval_rule(spark, "arr", [["a"]], dtype="array<string>") == [True]
    assert eval_rule(spark, "arr", ["a"]) == [False]
    assert eval_rule(spark, "strings", [["a"]], dtype="array<string>") == [True]
    assert eval_rule(spark, "ints", [[1, 2]], dtype="array<int>") == [True]


def test_is_number_numeric(spark):
    assert eval_rule(spark, "num", ["123", "12a", "-1", ""]) == [True, False, False, False]


# --- string/format (empty string must FAIL each) --------------------------------

@pytest.mark.parametrize(
    "rule,good,bad",
    [
        ("email", "some@e.com", "not-an-email"),
        ("uuid", "f47ac10b-58cc-0372-8567-0e02b2c3d479", "xyz"),
        ("uuid4", "f47ac10b-58cc-4372-a567-0e02b2c3d479", "f47ac10b-58cc-0372-8567-0e02b2c3d479"),
        ("alpha", "Hello", "h3llo"),
        ("alpha_num", "h3llo", "h3 llo"),
        ("alpha_dash", "h3l-lo_x", "h3l lo"),
        ("ascii", "abc#123", "héllo"),
        ("printable_ascii", "abc 123", "h\x01llo"),
        ("base64", "aGVsbG8=", "aGVsbG8"),
        ("lat", "39.9042", "99.1"),
        ("lon", "116.40", "190.1"),
        ("mac", "00:1B:44:11:3A:B7", "001B44113AB7"),
        ("ipv4", "192.168.1.1", "192.168.1.256"),
        ("ipv6", "2001:db8::1", "2001:::1"),
        ("cidr", "192.168.1.0/24", "192.168.1.0/33"),
        ("dns_name", "example.com", "-bad-.com"),
        ("full_url", "https://example.com/path?q=1", "https://www"),
        ("hex_color", "#ff0000", "ff00zz"),
        ("hexadecimal", "deadBEEF", "xyz"),
        ("isbn10", "3836221195", "383622119"),
        ("isbn13", "9783836221191", "97838362211"),
        ("cn_mobile", "13800138000", "23800138000"),
        ("json", '{"a":1}', "{a:1}"),
        ("win_path", "C:\\Users\\test", "/unix/path"),
        ("unix_path", "/usr/local/bin", "C:\\Users"),
        ("data_uri", "data:image/png;base64,iVBOR=", "plain"),
    ],
)
def test_format_validators(spark, rule, good, bad):
    assert eval_rule(spark, rule, [good, bad, ""]) == [True, False, False]


def test_is_url_loose(spark):
    assert eval_rule(spark, "url", ["https://a.com/x", "a.com", "has space", ""]) == [
        True, True, False, False,
    ]


def test_has_whitespace_case(spark):
    assert eval_rule(spark, "hasWhitespace", ["a b", "ab"]) == [True, False]
    assert eval_rule(spark, "hasLowerCase", ["aB", "AB"]) == [True, False]
    assert eval_rule(spark, "hasUpperCase", ["aB", "ab"]) == [True, False]


def test_multibyte(spark):
    assert eval_rule(spark, "multiByte", ["héllo", "hello"]) == [True, False]


def test_regexp_custom(spark):
    assert eval_rule(spark, "regexp:^d-\\d+$", ["d-12", "x-12"]) == [True, False]


# --- dates --------------------------------------------------------------------

def test_is_date(spark):
    assert eval_rule(spark, "date", ["2024-01-02", "2024/01/02", "20240102", "not-a-date"]) == [
        True, True, True, False,
    ]


def test_date_format(spark):
    assert eval_rule(spark, "date_format:yyyy-MM-dd", ["2024-01-02", "01/02/2024"]) == [
        True, False,
    ]


def test_date_compare(spark):
    assert eval_rule(spark, "gt_date:2024-01-01", ["2024-06-01", "2023-06-01"]) == [True, False]
    assert eval_rule(spark, "lt_date:2024-01-01", ["2023-06-01", "2024-06-01"]) == [True, False]
    assert eval_rule(spark, "gte_date:2024-01-01", ["2024-01-01"]) == [True]
    assert eval_rule(spark, "lte_date:2024-01-01", ["2024-01-01"]) == [True]


# --- media --------------------------------------------------------------------

def test_mime_checks(spark):
    assert eval_rule(spark, "mime:image/png,image/jpeg", ["image/png", "video/mp4"]) == [
        True, False,
    ]
    assert eval_rule(spark, "image", ["image/png", "video/mp4"]) == [True, False]
    assert eval_rule(spark, "image:png,jpeg", ["image/png", "image/gif"]) == [True, False]


# --- rule_one_of (#292) ----------------------------------------------------------

def test_rule_one_of(spark):
    assert eval_rule(spark, "rule_one_of:email,uuid", [
        "some@e.com", "f47ac10b-58cc-0372-8567-0e02b2c3d479", "neither",
    ]) == [True, True, False]


def test_length_family_fails_on_numeric_values(spark):
    # calcLen of a number is -1 (internal/validators/length.go:13-37;
    # TestLength: RuneLength(23, 2) is false): every length check FAILS
    # on numeric columns — only strings and containers have length
    from validate_spark import RuleSet, validate

    df = spark.createDataFrame([(12345, "12345", [1, 2, 3])], "n long, s string, a array<int>")
    cases = {
        "n": ("minLen:3", False),
        "s": ("minLen:3", True),
        "a": ("minLen:3", True),
    }
    for field, (rule, want) in cases.items():
        res = validate(df, RuleSet(rules={field: rule}), key_cols=["s"])
        assert res.verdicts().collect()[0]["pass"] is want, field
    # stringLength mirrors RuneLength: ints fail
    res = validate(df, RuleSet(rules={"n": "stringLength:2,9"}), key_cols=["s"])
    assert res.verdicts().collect()[0]["pass"] is False
    # a cast FILTER makes the value length-able again (post-filter dtype)
    res = validate(
        df,
        RuleSet(rules={"n": "minLen:3"}, filters={"n": "str"}),
        key_cols=["s"],
    )
    assert res.verdicts().collect()[0]["pass"] is True


def test_vector_validators(spark):
    """arrayDim / allFinite / l2NormBetween on array<float> columns —
    shape + numeric-sanity gates for embedding pipelines."""
    from validate_spark import RuleSet, validate

    rows = [
        (1, [0.6, 0.8]),                 # norm 1.0, finite, dim 2 → pass
        (2, [0.6, 0.8, 0.0]),            # dim 3 → arrayDim fails
        (3, [float("nan"), 1.0]),        # NaN → allFinite + norm fail
        (4, [3.0, 4.0]),                 # norm 5 → range fails
        (5, None),                        # required fails, others skip
        (6, [None, 1.0]),                 # NULL element → allFinite + norm fail
    ]
    df = spark.createDataFrame(rows, "rid int, v array<float>")
    rs = RuleSet(rules={"v": "required|dim:2|finite|normBetween:0.9,1.1"})
    res = validate(df, rs, key_cols=["rid"])
    viol = {}
    for r in res.violations().collect():
        viol.setdefault(r["rid"], set()).add(r["validator"])
    assert viol.get(1) is None
    assert viol[2] == {"arrayDim"}
    assert viol[3] == {"allFinite", "l2NormBetween"}
    assert viol[4] == {"l2NormBetween"}
    assert viol[5] == {"required"}
    # NULL elements propagate through the norm fold (norm undefined →
    # range fails) — stricter than sum-skips-NULL engines; documented
    assert viol[6] == {"allFinite", "l2NormBetween"}


def test_vector_validators_property_vs_numpy(spark):
    """Randomized differential check: l2NormBetween / arrayDim /
    allFinite against numpy-computed truth over 120 random float
    vectors (incl. NaN/inf/NULL injections)."""
    import math
    import random

    import numpy as np

    from validate_spark import RuleSet, validate

    rng = random.Random(11)
    rows = []
    for i in range(120):
        n = rng.randint(1, 8)
        v = [rng.uniform(-2, 2) for _ in range(n)]
        roll = rng.random()
        if roll < 0.1:
            v[rng.randrange(n)] = float("nan")
        elif roll < 0.2:
            v[rng.randrange(n)] = float("inf")
        elif roll < 0.3:
            v[rng.randrange(n)] = None
        rows.append((i, v))
    df = spark.createDataFrame(rows, "rid int, v array<float>")
    rs = RuleSet(rules={"v": "dim:4|finite|normBetween:0.5,2.5"})
    res = validate(df, rs, key_cols=["rid"])
    viol = {}
    for r in res.violations().collect():
        viol.setdefault(r["rid"], set()).add(r["validator"])

    for rid, v in rows:
        # float32 storage: round-trip through np.float32 like Spark does
        v32 = [None if x is None else float(np.float32(x)) for x in v]
        expect = set()
        if len(v32) != 4:
            expect.add("arrayDim")
        if any(x is None or math.isnan(x) or math.isinf(x) for x in v32):
            expect.add("allFinite")
        if any(x is None for x in v32):
            norm = None  # NULL propagates through the fold
        else:
            norm = round(math.sqrt(sum(x * x for x in v32)), 6)
        ok = norm is not None and not math.isnan(norm) and 0.5 <= norm <= 2.5
        if math.isinf(sum(0 if x is None else abs(x) for x in v32)):
            ok = False  # inf norm fails the range
        if not ok:
            expect.add("l2NormBetween")
        assert viol.get(rid, set()) == expect, (rid, v32, viol.get(rid), expect)
