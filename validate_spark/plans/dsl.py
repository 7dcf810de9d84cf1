"""Rule-string DSL parser.

Grammar parity with the reference (gookit/validate):

- a field's rules are ``|``-separated segments with ``\\|`` as the escape
  (reference: util.go:74-95 ``splitRules``);
- each segment is ``name`` or ``name:args`` split on the FIRST ``:``
  (rule.go:171-217 ``StringRule``);
- ``regexp`` keeps everything after the first colon as ONE raw argument
  (it may contain colons/commas — rule.go:199-205);
- list validators (``enum/in/not_in/rule_one_of`` …) treat the argument
  string as a comma-separated value list;
- all other validators split args on ``,``;
- ``default:v`` is not a validator — it records a default value
  substituted before validation (rule.go:195-197);
- ``optional`` marks the field optional: children are skipped when the
  (parent) value is empty (validation.go:880-904);
- alias names resolve to canonical names via the alias table
  (register.go:132-376).

This module is pure Python (driver side only) — the output feeds the plan
compiler which emits Spark Column expressions.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from validate_spark.functions.validators import resolve_alias, is_required_family

# validators whose single argument is a comma-separated list — CANONICAL
# names (parse_segment matches after alias resolution)
_LIST_ARG = {
    "enum",
    "notIn",
    "rule_one_of",
    "contains",
    "notContains",
    "requiredIf",
    "requiredUnless",
    "requiredWith",
    "requiredWithAll",
    "requiredWithout",
    "requiredWithoutAll",
    "inMimeTypes",
}

# validators that keep the raw string after the first ':' as one argument
_RAW_ARG = {"regexp"}


@dataclass
class RuleSpec:
    """One (field, validator, args) application — reference ``Rule`` (rule.go:15-53)."""

    field: str
    name: str  # canonical validator name after alias resolution
    args: tuple[str, ...] = ()
    skip_empty: bool = True  # SkipOnEmpty default (validate.go:79-83)
    optional: bool = False
    message: str | None = None

    @property
    def required_family(self) -> bool:
        return is_required_family(self.name)


@dataclass
class FieldRules:
    """All parsed directives for one field."""

    field: str
    rules: list[RuleSpec] = dc_field(default_factory=list)
    default: str | None = None
    optional: bool = False


def split_segments(rule_str: str) -> list[str]:
    """Split on ``|`` honoring the ``\\|`` escape (util.go:74-95)."""
    out: list[str] = []
    buf: list[str] = []
    i, n = 0, len(rule_str)
    while i < n:
        c = rule_str[i]
        if c == "\\" and i + 1 < n and rule_str[i + 1] == "|":
            buf.append("|")
            i += 2
            continue
        if c == "|":
            out.append("".join(buf).strip())
            buf = []
            i += 1
            continue
        buf.append(c)
        i += 1
    out.append("".join(buf).strip())
    return [s for s in out if s]


def parse_segment(seg: str) -> tuple[str, tuple[str, ...]]:
    """``name[:args]`` → (canonical_name, args tuple)."""
    if ":" in seg:
        raw_name, raw_args = seg.split(":", 1)
    else:
        raw_name, raw_args = seg, None
    name = resolve_alias(raw_name.strip())
    if raw_args is None:
        return name, ()
    if name in _RAW_ARG:
        return name, (raw_args,)
    if name in _LIST_ARG:
        return name, tuple(a.strip() for a in raw_args.split(",") if a.strip() != "")
    return name, tuple(a.strip() for a in raw_args.split(","))


def _canon_msg_key(key: str) -> str:
    """Canonicalize the validator part of a message key so alias-form
    keys match ("in" → "enum", "title.in" → "title.enum", "int2" →
    "isInt2") — the reference accepts alias keys because its rules keep
    raw validator names (Message() tries validatorAliases,
    messages.go:458-470); this engine canonicalizes at parse time, so
    keys canonicalize instead."""
    head, dot, last = key.rpartition(".")
    canon = resolve_alias(last)
    if canon == last and last and last[-1].isdigit():
        # arg-count-suffixed alias: "int2" → "isInt" + "2"
        import re as _re

        m = _re.fullmatch(r"(.*?)(\d+)", last)
        base = resolve_alias(m.group(1))
        if base != m.group(1):
            canon = base + m.group(2)
    return f"{head}.{canon}" if dot else canon


def _find_custom_message(
    messages: dict[str, str], field: str, name: str, n_args: int
) -> str | None:
    """Custom-message lookup, findMessage order (messages.go:541-578):
    "field.validatorN" → "validatorN" → "field.validator" → bare
    "field" (field-level message overrides any validator) → bare
    "validator". Keys are accepted in alias form."""
    cm: dict[str, str] = {}
    for k, v in messages.items():
        cm.setdefault(k, v)
        cm.setdefault(_canon_msg_key(k), v)
    keys = []
    if n_args:
        keys += [f"{field}.{name}{n_args}", f"{name}{n_args}"]
    keys += [f"{field}.{name}", field, name]
    for k in keys:
        if k in cm:
            return cm[k]
    return None


def parse_rules(
    field: str,
    rule_str: str,
    *,
    skip_empty: bool = True,
    messages: dict[str, str] | None = None,
) -> FieldRules:
    """Parse one field's rule string into a ``FieldRules``.

    ``messages`` maps ``"field.validator"`` or ``"validator"`` to a custom
    message template (messages.go:478-520 lookup order).
    """
    fr = FieldRules(field=field)
    for seg in split_segments(rule_str):
        name, args = parse_segment(seg)
        if name == "default":
            fr.default = args[0] if args else ""
            continue
        if name == "optional":
            fr.optional = True
            continue
        if name == "-" or name == "safe":  # reference: skip validation marker
            continue
        msg = None
        if messages:
            msg = _find_custom_message(messages, field, name, len(args))
        fr.rules.append(
            RuleSpec(
                field=field,
                name=name,
                args=args,
                skip_empty=skip_empty,
                message=msg,
            )
        )
    for r in fr.rules:
        r.optional = fr.optional
    return fr
