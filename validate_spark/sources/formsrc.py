"""Form / URL-encoded sources — reference ``FromURLValues``/``FromQuery``
(validate.go:471-490) and the query-string branch of ``FromRequest``
(validate.go:410-465). All form values are strings (``FormData``,
data_source.go:657-669); casts happen later through filter chains,
exactly like the reference (``filter`` tag then validation).

Bracket form keys normalize to dot paths — ``address[street]`` →
``address.street`` (#324; ``normalizeFormKey``/``bracketKeyReplacer``,
util.go:200-221) — EXCEPT array-style ``k[]`` keys, which are left
verbatim like the reference. Dotted paths then materialize as nested
all-string struct columns so the engine's ordinary path rules
(``address.street: required``) apply unchanged.

Two entry shapes:

* ``from_url_values(spark, values)`` — one record, the literal
  reference constructor (handy for parity tests).
* ``parse_query_column(df, col)`` / ``validate_form`` — the table-scale
  form: a DataFrame COLUMN of raw query strings (what a log of HTTP
  requests looks like at 10^12 scale) parsed vectorized with
  ``str_to_map`` + ``url_decode`` — JVM-side, zero Python.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from validate_spark.operators.engine import ValidationResult, validate
from validate_spark.plans.plan import RuleSet


def normalize_form_key(key: str) -> str:
    """``a[b][c]`` → ``a.b.c``; ``k[]`` kept verbatim (util.go:212-221)."""
    if "[" not in key or "[]" in key:
        return key
    return key.replace("[", ".").replace("]", "")


def _nest(flat: dict[str, str]) -> dict:
    root: dict = {}
    for key, val in flat.items():
        parts = normalize_form_key(key).split(".")
        node = root
        for p in parts[:-1]:
            nxt = node.get(p)
            if not isinstance(nxt, dict):
                nxt = {}
                node[p] = nxt
            node = nxt
        # a scalar never overwrites an existing nested branch
        node.setdefault(parts[-1], val)
    return root


def _schema_of(node: dict) -> T.StructType:
    fields = []
    for k in sorted(node):
        v = node[k]
        if isinstance(v, dict):
            fields.append(T.StructField(k, _schema_of(v)))
        else:
            fields.append(T.StructField(k, T.StringType()))
    return T.StructType(fields)


def _row_of(node: dict) -> tuple:
    out = []
    for k in sorted(node):
        v = node[k]
        out.append(_row_of(v) if isinstance(v, dict) else v)
    return tuple(out)


def from_url_values(
    spark: SparkSession, values: dict[str, "str | list[str]"]
) -> DataFrame:
    """One all-string record from url.Values-shaped data. Multi-valued
    keys keep the FIRST value (``FormData.Get`` returns ``vs[0]``,
    data_source.go:657-705)."""
    flat = {
        k: (v[0] if isinstance(v, (list, tuple)) else v) for k, v in values.items()
    }
    nested = _nest(flat)
    return spark.createDataFrame([_row_of(nested)], _schema_of(nested))


def _struct_from_map(m: Column, keys: Iterable[str]) -> Column:
    """Nested all-string struct column from dotted map keys."""
    tree: dict = {}
    for key in keys:
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node.setdefault(parts[-1], key)

    def build(node: dict) -> Column:
        cols = []
        for k in sorted(node):
            v = node[k]
            c = build(v) if isinstance(v, dict) else F.element_at(m, v)
            cols.append(c.alias(k))
        return F.struct(*cols)

    return build(tree)


def parse_query_column(
    df: DataFrame,
    query_col: str,
    fields: Iterable[str],
    *,
    out_col: str = "_form",
) -> DataFrame:
    """Parse a raw query-string column (``a=1&address%5Bstreet%5D=x``)
    into a nested all-string struct column, fully vectorized:
    ``str_to_map`` splits pairs, ``url_decode`` handles percent-escapes,
    and bracket keys normalize to dot paths JVM-side. ``fields`` are the
    dotted paths the rule set will address (reference reads only ruled
    fields too — safeData semantics). Missing keys yield NULL ≡ empty.

    Duplicate keys: ``str_to_map`` keeps the LAST occurrence, while the
    reference's ``Get`` returns the first — documented divergence, form
    logs rarely carry duplicates and "a value was present" verdicts
    are unaffected.
    """
    # try_url_decode, not url_decode: a single malformed %-escape in one
    # of 10^12 rows must yield NULL ≡ empty (a `required` violation),
    # not kill the job with an ANSI error
    raw = F.str_to_map(F.col(query_col), F.lit("&"), F.lit("="))

    def _dec_key(k: Column) -> Column:
        # malformed %-escape in a KEY: fall back to the raw key (a null
        # map key would abort the job)
        d = F.coalesce(F.try_url_decode(k), k)
        return F.when(k.contains("[]"), d).otherwise(
            F.replace(F.replace(d, F.lit("["), F.lit(".")), F.lit("]"), F.lit(""))
        )

    decoded = F.map_from_arrays(
        F.transform(F.map_keys(raw), _dec_key),
        F.transform(F.map_values(raw), F.try_url_decode),
    )
    return df.withColumn(out_col, _struct_from_map(decoded, fields))


def validate_form(
    df: DataFrame,
    query_col: str,
    rules: "dict[str, str] | RuleSet",
    *,
    key_cols: list[str] | None = None,
) -> ValidationResult:
    """Validate fields of a query-string column — the engine analogue of
    ``validate.FromQuery(...).Create().Validate()`` over a whole table
    of requests at once."""
    import dataclasses

    rs = rules if isinstance(rules, RuleSet) else RuleSet(rules=dict(rules))
    field_paths = {f.split(".*")[0].split(".0")[0] for f in rs.rules}
    field_paths |= set(rs.filters)
    parsed = parse_query_column(df, query_col, sorted(field_paths))
    prefixed = dataclasses.replace(
        rs,
        rules={f"_form.{f}": r for f, r in rs.rules.items()},
        filters={f"_form.{f}": r for f, r in rs.filters.items()},
        labels={f"_form.{f}": v for f, v in rs.labels.items()},
    )
    return validate(parsed, prefixed, key_cols=key_cols)
