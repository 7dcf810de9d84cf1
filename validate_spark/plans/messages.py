"""Builtin violation-message templates + rendering.

Transliterated from the reference's builtin message table
(messages.go:153-269) and its resolution order (messages.go:458-588):
rule-level custom message → ``field.validator`` → field → validator →
builtin default. Templates support ``{field}``, ``{args0}``,
``{args1end}``, ``{values}`` and Go's positional ``%v``/``%d``/``%s``
verbs (filled left-to-right from the rule args).

Messages are rendered to STATIC strings at plan-compile time (all args
are literals) — zero runtime cost. Value interpolation (``ErrShowValue``)
is intentionally out of scope (off by default in the reference too,
validate.go:126).
"""

from __future__ import annotations

import re

DEFAULT_MSG = "{field} field did not pass validation"

BUILTIN_MESSAGES: dict[str, str] = {
    "_": DEFAULT_MSG,
    "_validate": "{field} did not pass validation",
    "_filter": "{field} data is invalid",
    "min": "{field} min value is %v",
    "max": "{field} max value is %v",
    "isInt": "{field} value must be an integer",
    "isInts": "{field} value must be an int slice",
    "isUint": "{field} value must be an unsigned integer(>= 0)",
    "isString": "{field} value must be a string",
    "minLength": "{field} min length is %d",
    "maxLength": "{field} max length is %d",
    "stringLength": "{field} length must be in the range %d - %d",
    "isURL": "{field} must be a valid URL address",
    "isFullURL": "{field} must be a valid full URL address",
    "regexp": "{field} must match pattern %s",
    "isFile": "{field} must be an uploaded file",
    "isImage": "{field} must be an uploaded image file",
    "enum": "{field} value must be in the enum %v",
    "between": "{field} value must be in the range %v - %v",
    "rule_one_of": "{field} did not satisfy any of: %v",
    "lt": "{field} value should be less than %v",
    "gt": "{field} value should be greater than %v",
    "required": "{field} is required to not be empty",
    "requiredIf": "{field} is required when {args0} is in {args1end}",
    "requiredUnless": "{field} field is required unless {args0} is in {args1end}",
    "requiredWith": "{field} field is required when {values} is present",
    "requiredWithAll": "{field} field is required when {values} is present",
    "requiredWithout": "{field} field is required when {values} is not present",
    "requiredWithoutAll": "{field} field is required when none of {values} are present",
    "eqField": "{field} value must be equal the field %s",
    "neField": "{field} value cannot be equal to the field %s",
    "ltField": "{field} value should be less than the field %s",
    "lteField": "{field} value should be less than or equal to the field %s",
    "gtField": "{field} value must be greater than the field %s",
    "gteField": "{field} value should be greater or equal to the field %s",
    "isBool": "{field} value must be a bool",
    "isFloat": "{field} value must be a float",
    "isSlice": "{field} value must be a slice",
    "isMap": "{field} value must be a map",
    "isArray": "{field} value must be an array",
    "isStrings": "{field} value must be a []string",
    "notIn": "{field} value must not be in the given enum list %v",
    "contains": "{field} value does not contain %s",
    "notContains": "{field} value contains %s",
    "startsWith": "{field} value does not start with %s",
    "endsWith": "{field} value does not end with %s",
    "isEmail": "{field} value is an invalid email address",
    "isDate": "{field} value should be a date string",
    "length": "{field} length is invalid, length is %v",
}

_VERB = re.compile(r"%[vds]")


def render_message(
    name: str,
    field: str,
    args: tuple[str, ...],
    custom: str | None = None,
    label: str | None = None,
) -> str:
    """Resolve + render a message to a static string at compile time."""
    tpl = custom or BUILTIN_MESSAGES.get(name) or DEFAULT_MSG
    shown = label or field
    out = tpl.replace("{field}", shown)
    out = out.replace("{values}", ",".join(args))
    out = out.replace("{args0}", args[0] if args else "")
    out = out.replace("{args1end}", ",".join(args[1:]))
    for i, a in enumerate(args):
        out = out.replace("{args%d}" % i, a)
    # positional Go verbs, left-to-right; the LAST verb consumes all
    # remaining args (the reference passes the whole slice to one %v
    # for list validators like enum)
    verbs = _VERB.findall(out)
    if verbs:
        consumed = list(args)
        parts = _VERB.split(out)
        filled = [parts[0]]
        for k in range(len(verbs)):
            if k == len(verbs) - 1:
                val = ",".join(consumed)
            else:
                val = consumed.pop(0) if consumed else ""
            filled.append(val)
            filled.append(parts[k + 1])
        out = "".join(filled)
    return out
