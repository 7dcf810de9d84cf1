"""HTTP request-log source — the reference's ``FromRequest``
(validate.go:410-465) lifted from one live ``*http.Request`` to a TABLE
of logged requests.

The reference dispatches per request on method + Content-Type:

- GET (or no body)                    → URL query params (FromQuery)
- POST/PUT + application/json        → JSON body (FromJSONBytes)
- POST/PUT + x-www-form-urlencoded   → form body (same key grammar)
- multipart/form-data                → form fields + uploaded files

Here the same dispatch is ONE vectorized projection over a request-log
DataFrame (method, content_type, query, body): every ruled field
resolves per row from the query entries, the urlencoded body entries,
or a JSON-body path — all-string values exactly like ``FormData``, so
filter chains and rules apply unchanged. Uploaded files have no row
analogue; media payloads are binary columns validated by the
isFile/isImage/inMimeTypes family (operators/multimodal.py), which is
the documented replacement for the multipart branch.

Scale notes: both entries arrays are staged once per row in their own
projection (the parse_query_column PERF boundary); JSON fields go
through ``get_json_object`` (JVM-side, no schema inference, NULL on
malformed JSON ≡ empty — try-semantics like jsonsrc)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from validate_spark.operators.engine import ValidationResult, validate
from validate_spark.plans.plan import RuleSet
from validate_spark.sources.formsrc import (
    _entries_lookup,
    _struct_from_keys,
    query_entries,
)


def parse_request_log(
    df: DataFrame,
    fields: "list[str]",
    *,
    method_col: str = "method",
    content_type_col: str = "content_type",
    query_col: str = "query",
    body_col: str = "body",
    out_col: str = "_req",
) -> DataFrame:
    """Add ``out_col``: a nested all-string struct of the ruled fields,
    each resolved by the reference's method/Content-Type dispatch."""
    method = F.upper(F.coalesce(F.col(method_col), F.lit("GET")))
    ct = F.lower(F.coalesce(F.col(content_type_col), F.lit("")))
    is_get = method == "GET"
    is_json = ct.startswith("application/json")
    is_form = ct.startswith("application/x-www-form-urlencoded")

    qcol, bcol = f"{out_col}_qe", f"{out_col}_be"
    staged = df.withColumn(qcol, query_entries(F.col(query_col))).withColumn(
        bcol,
        F.when(is_form, query_entries(F.col(body_col))).otherwise(
            F.array().cast("array<struct<k:string,v:string>>")
        ),
    )
    q_lookup = _entries_lookup(F.col(qcol))
    b_lookup = _entries_lookup(F.col(bcol))

    def lookup(key: str):
        return (
            F.when(is_get, q_lookup(key))
            .when(is_json, F.get_json_object(F.col(body_col), f"$.{key}"))
            .when(is_form, b_lookup(key))
            # unknown content type: fall back to query params, the same
            # catch-all the reference applies (FromURLValues on r.URL)
            .otherwise(q_lookup(key))
        )

    return staged.withColumn(out_col, _struct_from_keys(lookup, fields)).drop(
        qcol, bcol
    )


def validate_request_log(
    df: DataFrame,
    rules: "dict[str, str] | RuleSet",
    *,
    method_col: str = "method",
    content_type_col: str = "content_type",
    query_col: str = "query",
    body_col: str = "body",
    key_cols: list[str] | None = None,
    scene: str | None = None,
) -> ValidationResult:
    """Validate a whole HTTP request log at once — the engine analogue
    of ``validate.FromRequest(r).Create().Validate()`` per row."""
    rs = rules if isinstance(rules, RuleSet) else RuleSet(rules=dict(rules))
    field_paths = {f.split(".*")[0].split(".0")[0] for f in rs.field_names()}
    parsed = parse_request_log(
        df,
        sorted(field_paths),
        method_col=method_col,
        content_type_col=content_type_col,
        query_col=query_col,
        body_col=body_col,
    )
    return validate(parsed, rs.prefixed("_req."), key_cols=key_cols, scene=scene)
