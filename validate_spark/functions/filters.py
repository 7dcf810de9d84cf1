"""Filter (sanitizer) registry: name → Column transformer.

Parity with the reference's filter catalogue (applied via
``filter.Apply(name, val, args)``, filtering.go:229; chain syntax
``"trim|lower"``, filtering.go:74-88; catalogue README.md:959-986).

Each filter is ``fn(col: Column, args: tuple[str, ...]) -> Column``.
Chains compose left-to-right as nested projections —
``withColumn(c, f3(f2(f1(col))))`` — which Catalyst collapses into one
whole-stage-codegen'd expression; a failed cast produces NULL
(``try_cast``), which the engine reports as a ``_filter`` violation
(reference: validation.go:509-512).
"""

from __future__ import annotations

import re
from typing import Callable

from pyspark.sql import Column, functions as F

FilterFn = Callable[[Column, tuple], Column]
FILTERS: dict[str, FilterFn] = {}

_FILTER_ALIASES = {
    "toInt": "int", "to_int": "int", "toUint": "uint",
    "toInt64": "int64", "to_int64": "int64",
    "toFloat": "float", "to_float": "float",
    "toBool": "bool", "to_bool": "bool",
    "str": "string", "toString": "string", "to_string": "string",
    "lowerCase": "lower", "lowercase": "lower",
    "upperCase": "upper", "uppercase": "upper",
    "lowerFirst": "lcFirst", "lcfirst": "lcFirst",
    "upperFirst": "ucFirst", "ucfirst": "ucFirst",
    "upperWord": "ucWord", "ucword": "ucWord",
    "camelCase": "camel", "camel_case": "camel",
    "snakeCase": "snake", "snake_case": "snake",
    "str2time": "strToTime", "strToInts": "str2ints",
    "strToArr": "str2arr", "str2array": "str2arr", "strToArray": "str2arr",
    "trim_strings": "trimStrings",
    "escapeJS": "escapeJs", "escape_js": "escapeJs",
    "escapeHTML": "escapeHtml", "escape_html": "escapeHtml",
}


def resolve_filter_alias(name: str) -> str:
    return _FILTER_ALIASES.get(name, name)


FILTER_REGISTRY_VERSION = 0


def register_filter(name: str, fn: FilterFn | None = None):
    """Custom-filter surface — reference ``AddFilter`` (filtering.go:19-53)."""
    def deco(f: FilterFn) -> FilterFn:
        global FILTER_REGISTRY_VERSION
        FILTERS[resolve_filter_alias(name)] = f
        FILTER_REGISTRY_VERSION += 1
        return f
    if fn is not None:
        return deco(fn)
    return deco


def _f(name: str):
    return register_filter(name)


@_f("int")
def _to_int(col, args):
    return col.try_cast("int")


@_f("uint")
def _to_uint(col, args):
    v = col.try_cast("bigint")
    return F.when(v >= 0, v)


@_f("int64")
def _to_int64(col, args):
    return col.try_cast("bigint")


@_f("float")
def _to_float(col, args):
    return col.try_cast("double")


@_f("string")
def _to_string(col, args):
    # gookit/filter ToString ("str"/"string"): stringify any scalar —
    # also makes a numeric column length-able again (post-filter dtype)
    return col.cast("string")


@_f("bool")
def _to_bool(col, args):
    c = F.lower(F.trim(col.cast("string")))
    return (
        F.when(c.isin("1", "on", "yes", "true"), F.lit(True))
        .when(c.isin("0", "off", "no", "false", ""), F.lit(False))
    )


@_f("trim")
def _trim(col, args):
    return F.trim(col)


@_f("ltrim")
def _ltrim(col, args):
    return F.ltrim(col)


@_f("rtrim")
def _rtrim(col, args):
    return F.rtrim(col)


@_f("lower")
def _lower(col, args):
    return F.lower(col)


@_f("upper")
def _upper(col, args):
    return F.upper(col)


@_f("lcFirst")
def _lc_first(col, args):
    return F.concat(F.lower(F.substring(col, 1, 1)), F.substring(col, 2, 2**31 - 1))


@_f("ucFirst")
def _uc_first(col, args):
    return F.concat(F.upper(F.substring(col, 1, 1)), F.substring(col, 2, 2**31 - 1))


@_f("ucWord")
def _uc_word(col, args):
    return F.initcap(col)


@_f("camel")
def _camel(col, args):
    # snake_case / kebab-case → camelCase. Java regex has no \U, so:
    # split on sep, initcap the tail words, concat back.
    sep = args[0] if args else "_"
    parts = F.split(col, f"[{sep}]")
    head = F.element_at(parts, 1)
    tail = F.slice(parts, 2, F.size(parts))
    return F.concat(head, F.array_join(F.transform(tail, lambda w: F.initcap(w)), ""))


@_f("snake")
def _snake(col, args):
    # camelCase → snake_case
    sep = args[0] if args else "_"
    return F.lower(F.regexp_replace(col, "([a-z0-9])([A-Z])", f"$1{sep}$2"))


@_f("escapeJs")
def _escape_js(col, args):
    c = F.regexp_replace(col, r"\\", r"\\\\")
    c = F.regexp_replace(c, "'", r"\\'")
    c = F.regexp_replace(c, '"', r'\\"')
    c = F.regexp_replace(c, "<", r"\\u003C")
    c = F.regexp_replace(c, ">", r"\\u003E")
    return c


@_f("escapeHtml")
def _escape_html(col, args):
    c = F.regexp_replace(col, "&", "&amp;")
    c = F.regexp_replace(c, "<", "&lt;")
    c = F.regexp_replace(c, ">", "&gt;")
    c = F.regexp_replace(c, '"', "&#34;")
    c = F.regexp_replace(c, "'", "&#39;")
    return c


# --- PII scrubbing (beyond-reference: training-data sanitization) ----------
# The reference's filters sanitize FORMAT (trim/case/escape); a corpus
# pipeline also needs CONTENT scrubbing before text reaches a training
# set. Same filter-chain surface ("text": "trim|scrubEmail|scrubUrl"),
# same one-projection compilation. Patterns are deliberately kept in
# the Java∩RE2 common dialect (no lookaround, ASCII \b only) so the
# DuckDB oracle replays them verbatim; an optional first chain arg
# overrides the replacement token.

_PII_PATTERNS = {
    "scrubEmail": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "scrubUrl": (r"https?://[^\s]+", "[URL]"),
    # phone: 7-15 DIGITS (not a char-run length) with at most 2
    # separator chars between consecutive digits — a bare 2-digit
    # "1- - - -2" soup no longer matches, and >15-digit serials are
    # not swallowed whole
    "scrubPhone": (r"\+?[0-9]([()\- ]{0,2}[0-9]){6,14}", "[PHONE]"),
    # ip: octets bounded to 0-255 ("999.999.999.999" is not an IP)
    "scrubIp": (
        r"\b(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
        r"(\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\b",
        "[IP]",
    ),
}


def _make_scrub(pattern: str, token: str) -> FilterFn:
    def scrub(col, args):
        return F.regexp_replace(col, pattern, args[0] if args else token)
    return scrub


for _name, (_pat, _tok) in _PII_PATTERNS.items():
    register_filter(_name, _make_scrub(_pat, _tok))
_FILTER_ALIASES.update(
    {"scrubURL": "scrubUrl", "scrubIP": "scrubIp",
     "scrub_email": "scrubEmail", "scrub_url": "scrubUrl",
     "scrub_phone": "scrubPhone", "scrub_ip": "scrubIp"}
)


@_f("str2ints")
def _str2ints(col, args):
    sep = re.escape(args[0]) if args and args[0] else ","
    return F.transform(F.split(col, sep), lambda x: F.trim(x).try_cast("int"))


@_f("str2arr")
def _str2arr(col, args):
    sep = re.escape(args[0]) if args and args[0] else ","
    return F.split(col, sep)


@_f("strToTime")
def _str_to_time(col, args):
    fmt = args[0] if args else None
    if fmt:
        return F.try_to_timestamp(col, F.lit(fmt))
    return F.coalesce(
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd HH:mm:ss")),
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd")),
    )


@_f("unique")
def _unique(col, args):
    # slice-aware unique (#172 note, filtering.go:179-182)
    return F.array_distinct(col)


@_f("trimStrings")
def _trim_strings(col, args):
    return F.transform(col, lambda x: F.trim(x))


# output dtypes of type-changing filters — the plan compiler consults
# this so dtype-dependent machinery (empty gates, numeric compares)
# sees the POST-filter type, mirroring the reference where validation
# always runs on the filtered value (Filtering() before rules,
# validating.go:119-155).
_CAST_OUTPUT: dict[str, "T.DataType"] = {}


def _cast_outputs():
    from pyspark.sql import types as T

    return {
        "int": T.IntegerType(),
        "uint": T.LongType(),
        "int64": T.LongType(),
        "float": T.DoubleType(),
        "bool": T.BooleanType(),
        "string": T.StringType(),
        "strToTime": T.TimestampType(),
        "str2arr": T.ArrayType(T.StringType()),
        "str2ints": T.ArrayType(T.IntegerType()),
    }


def chain_output_dtype(chain: list[tuple[str, tuple]], input_dt):
    """Data type a filter chain produces, given the input column type.
    String-to-string filters keep the input type; cast filters override."""
    if not _CAST_OUTPUT:
        _CAST_OUTPUT.update(_cast_outputs())
    dt = input_dt
    for name, _args in chain:
        real = resolve_filter_alias(name)
        if real in _CAST_OUTPUT:
            dt = _CAST_OUTPUT[real]
    return dt


def apply_filter_chain(col: Column, chain: list[tuple[str, tuple]]) -> Column:
    """Compose a parsed chain [(name, args), ...] into one Column expr."""
    for name, args in chain:
        real = resolve_filter_alias(name)
        if real not in FILTERS:
            raise KeyError(f"unknown filter: {name}")
        col = FILTERS[real](col, args)
    return col


def parse_filter_chain(chain_str: str) -> list[tuple[str, tuple]]:
    """``"trim|str2arr:,"`` → [("trim", ()), ("str2arr", (",",))].
    Same pipe grammar as rules (filtering.go:74-88)."""
    from validate_spark.plans.dsl import split_segments

    out = []
    for seg in split_segments(chain_str):
        if ":" in seg:
            name, raw = seg.split(":", 1)
            parts = raw.split(",")
            # `str2arr:,` — the arg IS a comma; keep raw when the split
            # produces only empty strings
            if all(p == "" for p in parts):
                args = (raw,)
            else:
                args = tuple(parts)
            out.append((name.strip(), args))
        else:
            out.append((seg, ()))
    return out
