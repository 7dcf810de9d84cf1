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
