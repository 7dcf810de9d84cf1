"""Semi-structured (JSON) sources — reference ``FromJSON``/``MapData``
(validate.go:345-364; dotted-path access data_source.go:105-116).

A JSON string column parses once (``from_json`` with an explicit
schema — never schema inference on the hot path) into a struct column;
rules then address members with the same dotted paths the reference
uses on maps. ``try``-semantics: unparseable JSON yields NULL members
≡ empty values, so ``required`` catches malformed rows while
non-required rules skip them (SkipOnEmpty parity)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from validate_spark.operators.engine import ValidationResult, validate
from validate_spark.plans.plan import RuleSet


def parse_json_column(
    df: DataFrame, json_col: str, ddl_schema: str, *, out_col: str | None = None
) -> DataFrame:
    """Parse a JSON string column into a struct column (one projection)."""
    out_col = out_col or f"{json_col}_parsed"
    return df.withColumn(out_col, F.from_json(F.col(json_col), ddl_schema))


def validate_json(
    df: DataFrame,
    json_col: str,
    ddl_schema: str,
    rules: dict[str, str] | RuleSet,
    *,
    key_cols: list[str] | None = None,
    scene: str | None = None,
) -> ValidationResult:
    """Validate fields INSIDE a JSON column: rule paths are relative to
    the parsed document (``"k": "required|min:0"`` addresses ``$.k``) —
    the engine analogue of ``validate.FromJSONBytes(...).Validate()``."""
    parsed = parse_json_column(df, json_col, ddl_schema, out_col="_doc")
    rs = rules if isinstance(rules, RuleSet) else RuleSet(rules=dict(rules))
    return validate(parsed, rs.prefixed("_doc."), key_cols=key_cols, scene=scene)


def variant_fields(
    df: DataFrame,
    json_col: str,
    fields: dict[str, tuple[str, str]],
    *,
    keep: list[str] | None = None,
    valid_col: str = "json_valid",
) -> DataFrame:
    """Semi-structured ingestion via the VARIANT type (Spark 4):
    ``try_parse_json`` once per row, then one ``try_variant_get`` per
    requested (path, type) — malformed JSON and missing/mistyped paths
    become NULL, never a job abort (the ANSI rule), and ``valid_col``
    flags parse failures for quarantine routing.

    Why VARIANT over from_json at 10^12 rows: from_json re-parses the
    string per schema change and forces a FULL struct schema up front;
    a variant parses ONCE into a binary-encoded tree that any number
    of downstream extractions share, and schema drift in ignored
    subtrees costs nothing. The extraction is JVM columnar — no
    Python.
    """
    v = F.try_parse_json(F.col(json_col))
    cols = [*(F.col(c) for c in (keep or []))]
    cols.append(v.isNotNull().alias(valid_col))
    for name, (path, dtype) in fields.items():
        cols.append(F.try_variant_get(v, path, dtype).alias(name))
    return df.select(*cols)
