"""validate_spark — a PySpark-native schema + constraint validation engine.

Re-expresses the rule DSL of gookit/validate (the reference implementation,
a per-record Go validation library) as vectorized predicate evaluation over
Spark DataFrames: every rule compiles to a boolean ``Column`` expression,
the whole rule set evaluates in ONE projection pass (no per-row Python),
and the outputs mirror the reference's ``Validation.Validate()`` /
``Errors`` semantics — a per-row verdict plus exploded violation rows —
lifted to table scale with dataset-level checks (column stats, uniqueness,
referential integrity, distribution drift) that the reference's single
record model cannot express.

This is NOT a port: the reference's reflection caches, instance pools and
switch dispatch (cache.go, factory.go, validating.go:605-943) are all
subsumed by compiling the plan once on the driver and letting Catalyst /
Tungsten evaluate it columnar on executors.
"""

from validate_spark.plans.dsl import parse_rules, RuleSpec
from validate_spark.plans.plan import RuleSet, compile_plan, Plan
from validate_spark.operators.engine import validate, check_value, ValidationResult
from validate_spark.functions.validators import (
    register_validator,
    register_custom_type,
    reset_custom_types,
    VALIDATORS,
    resolve_alias,
)
from validate_spark.functions.filters import register_filter, FILTERS

__all__ = [
    "parse_rules",
    "RuleSpec",
    "RuleSet",
    "compile_plan",
    "Plan",
    "validate",
    "check_value",
    "ValidationResult",
    "register_validator",
    "register_custom_type",
    "reset_custom_types",
    "register_filter",
    "resolve_alias",
    "VALIDATORS",
    "FILTERS",
]

__version__ = "0.1.0"
