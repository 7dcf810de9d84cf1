"""Rule suggestion — profile a table once, emit a RuleSet.

The inverse of validation: where the reference always receives rules
from tags/strings, a table-scale engine can LEARN a baseline rule set
from a trusted snapshot and then validate future data against it
(schema-drift guard). One stats pass (operators/stats.py) + one tiny
distinct-values pass for low-cardinality string columns.

Suggested per column:
- ``required``            when the snapshot has zero nulls/empties
- ``enum:v1,...``         string column with ≤ max_enum distinct values
- ``min:x|max:y``         numeric column's observed range
- ``minLength/maxLength`` string column's observed byte-length range

The output is a plain RuleSet — inspect/edit it, then ``validate`` as
usual; by construction the snapshot itself passes 100%.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from validate_spark.plans.plan import RuleSet


def suggest_rules(
    df: DataFrame,
    cols: list[str] | None = None,
    *,
    max_enum: int = 20,
) -> RuleSet:
    """One profiling pass → RuleSet (see module doc)."""
    if cols is None:
        cols = df.columns
    schema = {f.name: f.dataType for f in df.schema.fields}

    aggs = []
    for c in cols:
        dt = schema.get(c)
        col = F.col(c)
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"{c}__nnull"))
        if isinstance(dt, T.StringType):
            aggs.append(F.sum((col == "").cast("long")).alias(f"{c}__nempty"))
            aggs.append(F.countDistinct(col).alias(f"{c}__ndist"))
            aggs.append(F.min(F.octet_length(col)).alias(f"{c}__minlen"))
            aggs.append(F.max(F.octet_length(col)).alias(f"{c}__maxlen"))
        elif isinstance(dt, T.NumericType):
            aggs.append(F.min(col).alias(f"{c}__min"))
            aggs.append(F.max(col).alias(f"{c}__max"))
    prof = df.agg(*aggs).collect()[0]

    rules: dict[str, str] = {}
    enum_candidates = []
    for c in cols:
        dt = schema.get(c)
        parts = []
        empties = prof[f"{c}__nnull"] + (
            prof[f"{c}__nempty"] if isinstance(dt, T.StringType) else 0
        )
        if empties == 0:
            parts.append("required")
        if isinstance(dt, T.StringType):
            if prof[f"{c}__ndist"] <= max_enum:
                enum_candidates.append(c)
                parts.append(None)  # placeholder, filled below
            else:
                parts.append(f"minLength:{prof[f'{c}__minlen']}")
                parts.append(f"maxLength:{prof[f'{c}__maxlen']}")
        elif isinstance(dt, T.NumericType):
            lo, hi = prof[f"{c}__min"], prof[f"{c}__max"]
            if lo is not None:
                parts.append(f"min:{lo}")
                parts.append(f"max:{hi}")
        rules[c] = parts

    if enum_candidates:
        # one pass for all enum domains (grouping sets would also work;
        # per-column distinct on ≤max_enum values is tiny either way)
        for c in enum_candidates:
            vals = sorted(
                r[0]
                for r in df.select(c).filter(F.col(c).isNotNull()).distinct().collect()
            )
            rules[c] = [
                p if p is not None else "enum:" + ",".join(str(v) for v in vals)
                for p in rules[c]
            ]

    return RuleSet(
        rules={c: "|".join(p for p in parts if p) for c, parts in rules.items() if parts}
    )


def schema_diff(
    before: "T.StructType | DataFrame",
    after: "T.StructType | DataFrame",
) -> list[dict]:
    """Structural drift between two schemas: columns (recursively, by
    dotted path) added, removed, or type-changed — the schema-level
    complement of value drift (operators/drift.py). The reference pins a
    struct's shape at compile time via its type meta (cache.go:98-257);
    at table scale the analogous guard is diffing the CURRENT schema
    against the trusted snapshot's before validating.

    Returns [{"path", "kind": added|removed|type_changed,
    "before", "after"}], sorted by path. Driver-side pure Python —
    schemas are tiny.
    """
    def flatten(dt, prefix=""):
        # leaf-level paths only: a changed array<struct<...>> container
        # would just duplicate its children's precise diffs
        out = {}
        if isinstance(dt, T.StructType):
            for f in dt.fields:
                out.update(flatten(f.dataType, f"{prefix}{f.name}."))
            return out
        if isinstance(dt, T.ArrayType) and isinstance(
            dt.elementType, (T.StructType, T.ArrayType)
        ):
            return flatten(dt.elementType, f"{prefix}*.")
        key = prefix[:-1] if prefix else ""
        if key:
            out[key] = dt.simpleString()
        return out

    a = flatten(before.schema if hasattr(before, "schema") else before)
    b = flatten(after.schema if hasattr(after, "schema") else after)
    diffs = []
    for path in sorted(set(a) | set(b)):
        if path not in b:
            diffs.append({"path": path, "kind": "removed", "before": a[path], "after": None})
        elif path not in a:
            diffs.append({"path": path, "kind": "added", "before": None, "after": b[path]})
        elif a[path] != b[path]:
            diffs.append({"path": path, "kind": "type_changed", "before": a[path], "after": b[path]})
    return diffs
