"""Validator registry: canonical name → Spark ``Column`` builder.

Parity map (reference → here):

- registry of built-ins: register.go:36-129; alias table register.go:132-376
  (reproduced verbatim in ``ALIASES`` below);
- the giant switch dispatch (validating.go:605-943) becomes a dict of
  builder functions, each emitting ONE boolean Column expression — no
  per-row Python anywhere;
- regexes transliterated from validators.go:15-87 (Go RE2 → Java regex;
  the only dialect fix needed is POSIX classes ``[[:lower:]]`` →
  ``\\p{Lower}``);
- empty-string-fails-string-validators: every string-format validator in
  the reference is ``s != "" && rx.Match(s)`` (validators_string.go) — we
  wrap each ``rlike`` in a non-empty guard;
- ``IsEmpty`` semantics (validators.go:605-622): nil, "", zero-length
  container; numeric zero counts as empty ONLY when the engine option
  ``zero_as_empty`` is on (the reference carves numeric zeros out for map
  sources, validators.go:590-598 — our default matches that carve-out:
  zero is NOT empty);
- Go ``len(str)`` is BYTES → ``octet_length``; ``stringLength`` is runes
  → ``char_length`` (validators_compare.go:163-197).

Builder signature::

    builder(col: Column, args: tuple[str, ...], ctx: BuildCtx) -> Column  # boolean

Every emitted predicate is null-safe: the engine coalesces to False so a
NULL value fails non-required validators exactly like the reference's
nil handling.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Callable

from pyspark.sql import Column, functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# alias table — verbatim from register.go:132-376
# ---------------------------------------------------------------------------

ALIASES: dict[str, str] = {
    "in": "enum", "oneof": "enum", "not_in": "notIn", "range": "between",
    # type
    "int": "isInt", "integer": "isInt", "uint": "isUint", "bool": "isBool",
    "boolean": "isBool", "float": "isFloat", "map": "isMap",
    "ints": "isInts", "int_slice": "isInts", "int_list": "isInts",
    "str": "isString", "string": "isString", "strings": "isStrings",
    "str_list": "isStrings", "str_slice": "isStrings",
    "arr": "isArray", "list": "isArray", "array": "isArray", "slice": "isSlice",
    # val
    "regex": "regexp", "eq": "isEqual", "equal": "isEqual", "equals": "isEqual",
    # vector family (beyond-reference)
    "dim": "arrayDim", "finite": "allFinite", "normBetween": "l2NormBetween",
    "intEq": "intEqual", "int_eq": "intEqual",
    "ne": "notEqual", "notEq": "notEqual", "not_eq": "notEqual",
    # int compare
    "lte": "max", "gte": "min", "lessThan": "lt", "less_than": "lt",
    "greaterThan": "gt", "greater_than": "gt",
    # len
    "len": "length", "leneq": "length", "lenEq": "length", "len_eq": "length",
    "lengthEq": "length", "length_eq": "length",
    "minlen": "minLength", "minLen": "minLength", "min_len": "minLength",
    "min_length": "minLength", "maxlen": "maxLength", "maxLen": "maxLength",
    "max_len": "maxLength", "max_length": "maxLength",
    "minsize": "minLength", "minSize": "minLength", "min_size": "minLength",
    "maxsize": "maxLength", "maxSize": "maxLength", "max_size": "maxLength",
    # string rune length
    "strlen": "stringLength", "strLen": "stringLength", "str_len": "stringLength",
    "strLength": "stringLength", "str_length": "stringLength",
    "runeLen": "stringLength", "rune_len": "stringLength",
    "runeLength": "stringLength", "rune_length": "stringLength",
    # string contains
    "string_contains": "stringContains", "str_contains": "stringContains",
    "startWith": "startsWith", "startwith": "startsWith",
    "start_with": "startsWith", "starts_with": "startsWith",
    "endwith": "endsWith", "endWith": "endsWith", "end_with": "endsWith",
    "endswith": "endsWith", "ends_with": "endsWith",
    # string
    "ip": "isIP", "IP": "isIP", "ipv4": "isIPv4", "IPv4": "isIPv4",
    "ipv6": "isIPv6", "IPv6": "isIPv6", "email": "isEmail",
    "intStr": "isIntString", "int_str": "isIntString", "strint": "isIntString",
    "strInt": "isIntString", "str_int": "isIntString", "intstr": "isIntString",
    "intString": "isIntString", "int_string": "isIntString",
    "stringNum": "isStringNumber", "string_num": "isStringNumber",
    "strNumber": "isStringNumber", "str_number": "isStringNumber",
    "strnum": "isStringNumber", "strNum": "isStringNumber",
    "str_num": "isStringNumber", "stringNumber": "isStringNumber",
    "string_number": "isStringNumber",
    "hexadecimal": "isHexadecimal",
    "hasWhitespace": "hasWhitespace", "has_whitespace": "hasWhitespace",
    "has_wp": "hasWhitespace",
    "printableASCII": "isPrintableASCII", "printable_ascii": "isPrintableASCII",
    "printable_ASCII": "isPrintableASCII",
    "ascii": "isASCII", "ASCII": "isASCII", "alpha": "isAlpha",
    "alphaNum": "isAlphaNum", "alpha_num": "isAlphaNum",
    "alphaDash": "isAlphaDash", "alpha_dash": "isAlphaDash",
    "base64": "isBase64", "cidr": "isCIDR", "CIDR": "isCIDR",
    "CIDRv4": "isCIDRv4", "cidrv4": "isCIDRv4", "cidr_v4": "isCIDRv4",
    "cidrv6": "isCIDRv6", "CIDRv6": "isCIDRv6", "cidr_v6": "isCIDRv6",
    "dnsname": "isDNSName", "dnsName": "isDNSName", "dns_name": "isDNSName",
    "DNSName": "isDNSName",
    "datauri": "isDataURI", "dataURI": "isDataURI", "data_URI": "isDataURI",
    "data_uri": "isDataURI", "empty": "isEmpty",
    "HEXColor": "isHexColor", "hexcolor": "isHexColor", "hexColor": "isHexColor",
    "hex_color": "isHexColor",
    "isbn10": "isISBN10", "ISBN10": "isISBN10",
    "isbn13": "isISBN13", "ISBN13": "isISBN13",
    "json": "isJSON", "Json": "isJSON", "JSON": "isJSON",
    "lat": "isLatitude", "latitude": "isLatitude",
    "lon": "isLongitude", "longitude": "isLongitude",
    "mac": "isMAC", "MAC": "isMAC", "multiByte": "isMultiByte",
    "num": "isNumber", "number": "isNumber", "numeric": "isNumeric",
    "rgbcolor": "isRGBColor", "rgbColor": "isRGBColor", "rgb_color": "isRGBColor",
    "RGBColor": "isRGBColor", "RGB_color": "isRGBColor",
    "url": "isURL", "URL": "isURL",
    "fullURL": "isFullURL", "fullUrl": "isFullURL", "fullurl": "isFullURL",
    "full_url": "isFullURL",
    "activeURL": "isActiveURL", "activeUrl": "isActiveURL",
    "active_url": "isActiveURL",
    "uuid": "isUUID", "UUID": "isUUID", "uuid3": "isUUID3", "UUID3": "isUUID3",
    "uuid4": "isUUID4", "UUID4": "isUUID4", "uuid5": "isUUID5", "UUID5": "isUUID5",
    "cnMobile": "isCnMobile", "cn_mobile": "isCnMobile",
    # file system
    "path_exists": "pathExists", "pathExist": "pathExists",
    "path_exist": "pathExists", "filePath": "isFilePath",
    "filepath": "isFilePath", "local_file": "isFilePath",
    "dirPath": "isDirPath", "local_dir": "isDirPath",
    "unixPath": "isUnixPath", "unix_path": "isUnixPath",
    "winPath": "isWinPath", "win_path": "isWinPath",
    # date
    "date": "isDate", "gtDate": "afterDate", "gt_date": "afterDate",
    "ltDate": "beforeDate", "lt_date": "beforeDate",
    "gteDate": "afterOrEqualDate", "gte_date": "afterOrEqualDate",
    "lteDate": "beforeOrEqualDate", "lte_date": "beforeOrEqualDate",
    # uploaded file / media
    "img": "isImage", "image": "isImage", "upload_image": "isImage",
    "file": "isFile", "upload_file": "isFile",
    "mime": "inMimeTypes", "mimes": "inMimeTypes", "mimeType": "inMimeTypes",
    "mime_type": "inMimeTypes", "mimeTypes": "inMimeTypes",
    "mime_types": "inMimeTypes",
    # field compare
    "eq_field": "eqField", "ne_field": "neField", "neqField": "neField",
    "neq_field": "neField", "gt_field": "gtField", "gte_field": "gteField",
    "lt_field": "ltField", "lte_field": "lteField",
    # requiredXXX
    "required_if": "requiredIf", "required_unless": "requiredUnless",
    "required_with": "requiredWith", "required_with_all": "requiredWithAll",
    "required_without": "requiredWithout",
    "required_without_all": "requiredWithoutAll",
    # other
    "defaults": "default", "not_contains": "notContains",
    "date_format": "dateFormat", "dateFormat": "dateFormat",
    "min": "min", "max": "max",
}


def resolve_alias(name: str) -> str:
    return ALIASES.get(name, name)


def is_required_family(name: str) -> bool:
    """Reference: rule.go:330 — validators whose NAME starts with 'required'
    must still run on empty values (they ARE the emptiness checks)."""
    return name.startswith("required")


# ---------------------------------------------------------------------------
# regexes — validators.go:15-87 (Go RE2 → Java regex)
# ---------------------------------------------------------------------------

RX = {
    "email": r'^(([^<>()\[\]\\.,;:\s@"]+(\.[^<>()\[\]\\.,;:\s@"]+)*)|(".+"))@((\[[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}])|(([a-zA-Z\-0-9]+\.)+[a-zA-Z]{2,}))$',
    "uuid3": r"^[0-9a-f]{8}-[0-9a-f]{4}-3[0-9a-f]{3}-[0-9a-f]{4}-[0-9a-f]{12}$",
    "uuid4": r"^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$",
    "uuid5": r"^[0-9a-f]{8}-[0-9a-f]{4}-5[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$",
    "uuid": r"^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$",
    "int": r"^(?:[-+]?(?:0|[1-9][0-9]*))$",
    "float": r"^(?:[-+]?(?:[0-9]+))?(?:\.[0-9]*)?(?:[eE][\+\-]?(?:[0-9]+))?$",
    "rgb_color": r"^rgb\(\s*(0|[1-9]\d?|1\d\d?|2[0-4]\d|25[0-5])\s*,\s*(0|[1-9]\d?|1\d\d?|2[0-4]\d|25[0-5])\s*,\s*(0|[1-9]\d?|1\d\d?|2[0-4]\d|25[0-5])\s*\)$",
    "base64": r"^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=|[A-Za-z0-9+/]{4})$",
    "latitude": r"^[-+]?([1-8]?\d(\.\d+)?|90(\.0+)?)$",
    "longitude": r"^[-+]?(180(\.0+)?|((1[0-7]\d)|([1-9]?\d))(\.\d+)?)$",
    "dns_name": r"^([a-zA-Z0-9_]{1}[a-zA-Z0-9_-]{0,62}){1}(\.[a-zA-Z0-9_]{1}[a-zA-Z0-9_-]{0,62})*[\._]?$",
    "full_url": r"^(?:ftp|tcp|udp|wss?|https?)://(?:(?:[a-zA-Z0-9](?:[a-zA-Z0-9-]*[a-zA-Z0-9])?\.)+[a-zA-Z]{2,}|(?:\d{1,3}\.){3}\d{1,3})(?::\d{1,5})?(?:[/?#]\S*)?$",
    "win_path": r'^[a-zA-Z]:\\(?:[^\\/:*?"<>|\r\n]+\\)*[^\\/:*?"<>|\r\n]*$',
    "unix_path": r"^(/[^/\x00]*)+/?$",
    "isbn10": r"^(?:\d{9}X|\d{10})$",
    "isbn13": r"^\d{13}$",
    "alpha": r"^[a-zA-Z]+$",
    "alpha_num": r"^[a-zA-Z0-9]+$",
    "alpha_dash": r"^(?:[\w-]+)$",
    "number": r"^[0-9]+$",
    "cn_mobile": r"^1\d{10}$",
    "hex_color": r"^#?([\da-fA-F]{3}|[\da-fA-F]{6})$",
    "ascii": r"^[\x00-\x7F]+$",
    "hexadecimal": r"^[\da-fA-F]+$",
    "printable_ascii": r"^[\x20-\x7E]+$",
    "multi_byte": r"[^\x00-\x7F]",
    "data_uri": r"^data:.+/(.+);base64,(?:.+)",
    "has_lower": r"[a-z]",  # Go: .*[[:lower:]] (POSIX→Java class)
    "has_upper": r"[A-Z]",
    # net.ParseIP / ParseMAC equivalents (validators_string.go:204-229)
    "ipv4": r"^((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)$",
    "ipv6": r"^(([0-9a-fA-F]{1,4}:){7}[0-9a-fA-F]{1,4}|([0-9a-fA-F]{1,4}:){1,7}:|([0-9a-fA-F]{1,4}:){1,6}:[0-9a-fA-F]{1,4}|([0-9a-fA-F]{1,4}:){1,5}(:[0-9a-fA-F]{1,4}){1,2}|([0-9a-fA-F]{1,4}:){1,4}(:[0-9a-fA-F]{1,4}){1,3}|([0-9a-fA-F]{1,4}:){1,3}(:[0-9a-fA-F]{1,4}){1,4}|([0-9a-fA-F]{1,4}:){1,2}(:[0-9a-fA-F]{1,4}){1,5}|[0-9a-fA-F]{1,4}:((:[0-9a-fA-F]{1,4}){1,6})|:((:[0-9a-fA-F]{1,4}){1,7}|:)|::([fF]{4}(:0{1,4})?:)?((25[0-5]|(2[0-4]|1?\d)?\d)\.){3}(25[0-5]|(2[0-4]|1?\d)?\d))$",
    "mac": r"^([0-9a-fA-F]{2}[:-]){5}[0-9a-fA-F]{2}$|^([0-9a-fA-F]{4}\.){2}[0-9a-fA-F]{4}$",
}

_IPV4_PART = r"((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
RX["cidr_v4"] = rf"^{_IPV4_PART}/(3[0-2]|[12]?\d)$"
RX["cidr_v6"] = r"^([0-9a-fA-F:]+)/(12[0-8]|1[01]\d|\d{1,2})$"


# ---------------------------------------------------------------------------
# build context
# ---------------------------------------------------------------------------

@dataclass
class BuildCtx:
    """Compile-time context handed to every builder.

    ``resolve`` maps a field path to the (possibly filter-transformed)
    Column for cross-field validators (§2.3); ``dtype`` is the Spark
    data type of the CURRENT target expression (drives numeric-vs-string
    dispatch exactly where the reference dispatches on reflect.Kind,
    internal/validators/validators.go:92-145).
    """

    dtype: T.DataType | None = None
    resolve: Callable[[str], Column] | None = None
    dtype_of: Callable[[str], T.DataType | None] | None = None
    zero_as_empty: bool = False
    extra: dict = dc_field(default_factory=dict)


def is_string_type(dt: T.DataType | None) -> bool:
    return isinstance(dt, T.StringType)


def is_numeric_type(dt: T.DataType | None) -> bool:
    return isinstance(dt, T.NumericType)


def is_container_type(dt: T.DataType | None) -> bool:
    return isinstance(dt, (T.ArrayType, T.MapType))


def is_empty_col(col: Column, dt: T.DataType | None, *, zero_as_empty: bool = False) -> Column:
    """IsEmpty parity (validators.go:605-622): nil / "" / zero-len container;
    numeric zero only when ``zero_as_empty``."""
    empty = col.isNull()
    if is_string_type(dt) or dt is None:
        empty = empty | (col == F.lit(""))
    if is_container_type(dt):
        empty = empty | (F.size(col) == 0)
    if zero_as_empty and is_numeric_type(dt):
        empty = empty | (col == F.lit(0))
    if zero_as_empty and isinstance(dt, T.BooleanType):
        empty = empty | (~col)
    return empty


def _num(col: Column) -> Column:
    """To-number coercion used by the compare funnel
    (internal/validators/validators.go:124-139)."""
    return col.try_cast("double")


def _num_arg(a: str) -> Column:
    return F.lit(float(a))


def _cmp_pair(col: Column, arg: str, dt: T.DataType | None) -> tuple[Column, Column]:
    """valueCompare dispatch: numeric columns compare numerically; string
    columns compare numerically when the argument parses as a number (the
    reference funnels through int64/float64), else lexicographically."""
    if is_numeric_type(dt):
        return col, _num_arg(arg)
    try:
        float(arg)
    except ValueError:
        return col, F.lit(arg)
    return _num(col), _num_arg(arg)


def _lit_for(dt: T.DataType | None, a: str) -> Column:
    if is_numeric_type(dt):
        try:
            return F.lit(int(a)) if not isinstance(dt, (T.DoubleType, T.FloatType, T.DecimalType)) else F.lit(float(a))
        except ValueError:
            return F.lit(float(a))
    if isinstance(dt, T.BooleanType):
        return F.lit(a.lower() in ("1", "on", "yes", "true"))
    return F.lit(a)


def _nonempty_str(col: Column) -> Column:
    """Every reference string validator fails on empty string."""
    return col.isNotNull() & (col != "")


def _rx(col: Column, pattern: str) -> Column:
    return _nonempty_str(col) & col.rlike(pattern)


def _is_lengthable(dt: T.DataType | None) -> bool:
    """reflects.Len kinds: string / slice / array / map — NUMERIC values
    have no length and every length check FAILS on them (calcLen = -1,
    internal/validators/length.go:13-37; TestLength: RuneLength(23,2)
    is false). Unknown dtype (schemaless paths) keeps the string
    assumption."""
    return dt is None or is_container_type(dt) or is_string_type(dt)


def _byte_len(col: Column, dt: T.DataType | None) -> Column:
    """Go len(): bytes for strings, element count for containers
    (internal/validators/length.go:13-37)."""
    if is_container_type(dt):
        return F.size(col)
    return F.octet_length(col.cast("string"))


# date parsing: strutil.ToTime layout list (most-common subset).
# Layouts are grouped by the EXACT string length each produces (Spark's
# CORRECTED parser needs 2-digit MM/dd, so length is decisive): trying
# only length-compatible layouts avoids the JVM throw/catch a failed
# try_to_timestamp costs per row per layout — measured 3.4x on a
# 3-date-rule scan (BENCH.md §5).
_DATE_FORMATS_BY_LEN = {
    19: ("yyyy-MM-dd HH:mm:ss", "yyyy/MM/dd HH:mm:ss"),
    16: ("yyyy-MM-dd HH:mm",),
    10: ("yyyy-MM-dd", "yyyy/MM/dd"),
    8: ("yyyyMMdd",),
}


def _to_ts(col: Column) -> Column:
    c = col.cast("string")
    n = F.length(c)
    expr = None
    for ln, fmts in _DATE_FORMATS_BY_LEN.items():
        branch = F.coalesce(*[F.try_to_timestamp(c, F.lit(f)) for f in fmts]) if len(fmts) > 1 else F.try_to_timestamp(c, F.lit(fmts[0]))
        expr = F.when(n == ln, branch) if expr is None else expr.when(n == ln, branch)
    return expr


def _ts_lit(arg: str) -> Column:
    return _to_ts(F.lit(arg))


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

Builder = Callable[[Column, tuple, BuildCtx], Column]
VALIDATORS: dict[str, Builder] = {}

# bumped on every (re-)registration — cached plans are invalidated the
# same way the reference's tag-version invalidates typeMeta caches
# (validate.go:151-163 atomic tagVer bump)
REGISTRY_VERSION = 0


def registry_version() -> int:
    from validate_spark.functions import filters as _flt

    return REGISTRY_VERSION + _flt.FILTER_REGISTRY_VERSION


# --- custom-type extractors (AddCustomType parity) -------------------------

# key = exact Spark DataType (simpleString form); value = extractor
# (col, dtype) -> (underlying_col, underlying_dtype)
TypeExtractor = Callable[[Column, T.DataType], "tuple[Column, T.DataType | None]"]
CUSTOM_TYPES: dict[str, TypeExtractor] = {}


def register_custom_type(
    dtype: T.DataType, extractor: TypeExtractor, *, replace: bool = True
) -> None:
    """``AddCustomType`` parity (register_type.go:30-68): register an
    underlying-value extractor keyed by the EXACT Spark data type — the
    reference keys by exact ``reflect.Type`` with no pointer auto-deref;
    here the analogue is the full struct/array type signature.

    The extractor is applied as a pre-predicate projection wherever a
    ruled field (or wildcard leaf) has exactly this type: validators,
    the skip-on-empty gate and the required family all see the
    EXTRACTED value, so a NULL extraction means "treat as unset" and
    fails ``required`` — the documented CustomTypeFunc nil contract.
    Registration bumps the registry version, invalidating cached plans
    like the reference's tagVer bump."""
    global REGISTRY_VERSION
    if not isinstance(dtype, T.DataType):
        raise TypeError("register_custom_type expects a pyspark DataType instance")
    key = dtype.simpleString()
    if not replace and key in CUSTOM_TYPES:
        raise ValueError(f"custom type {key} already registered")
    CUSTOM_TYPES[key] = extractor
    REGISTRY_VERSION += 1


def reset_custom_types() -> None:
    """``ResetCustomTypes`` parity (register_type.go:46-55)."""
    global REGISTRY_VERSION
    CUSTOM_TYPES.clear()
    REGISTRY_VERSION += 1


def resolve_custom_type(
    col: Column, dt: T.DataType | None
) -> "tuple[Column, T.DataType | None]":
    """``resolveCustomType`` (register_type.go:57-68): zero-cost when
    nothing is registered; on a type hit, swap in the extracted value."""
    if not CUSTOM_TYPES or dt is None:
        return col, dt
    fn = CUSTOM_TYPES.get(dt.simpleString())
    if fn is None:
        return col, dt
    return fn(col, dt)


def register_validator(name: str, builder: Builder | None = None, *, replace: bool = True):
    """Custom-validator surface — reference ``AddValidator``
    (validators.go:158-178). Usable as a decorator or a direct call.
    Builders receive (col, args, ctx) and must return a boolean Column;
    vectorized pandas UDFs wrapped in a Column are the escape hatch for
    logic Spark expressions can't say (README.md:713-736 custom surface).
    """
    def deco(fn: Builder) -> Builder:
        global REGISTRY_VERSION
        if not replace and name in VALIDATORS:
            raise ValueError(f"validator {name} already registered")
        VALIDATORS[resolve_alias(name)] = fn
        REGISTRY_VERSION += 1
        return fn
    if builder is not None:
        return deco(builder)
    return deco


def _v(name: str):
    return register_validator(name)


# --- presence -------------------------------------------------------------

@_v("required")
def _required(col, args, ctx):
    # validators.go:191-232
    return ~is_empty_col(col, ctx.dtype, zero_as_empty=ctx.zero_as_empty)


def _present(ctx: BuildCtx, f: str) -> Column:
    return ~is_empty_col(ctx.resolve(f), ctx.dtype_of(f), zero_as_empty=ctx.zero_as_empty)


@_v("requiredIf")
def _required_if(col, args, ctx):
    # validators.go:268-303: required when other field ∈ values
    other, vals = args[0], list(args[1:])
    cond = ctx.resolve(other).cast("string").isin(vals)
    req = ~is_empty_col(col, ctx.dtype, zero_as_empty=ctx.zero_as_empty)
    return F.when(cond, req).otherwise(F.lit(True))


@_v("requiredUnless")
def _required_unless(col, args, ctx):
    other, vals = args[0], list(args[1:])
    cond = ctx.resolve(other).cast("string").isin(vals)
    req = ~is_empty_col(col, ctx.dtype, zero_as_empty=ctx.zero_as_empty)
    return F.when(~F.coalesce(cond, F.lit(False)), req).otherwise(F.lit(True))


@_v("requiredWith")
def _required_with(col, args, ctx):
    any_present = None
    for f in args:
        p = _present(ctx, f)
        any_present = p if any_present is None else (any_present | p)
    req = ~is_empty_col(col, ctx.dtype, zero_as_empty=ctx.zero_as_empty)
    return F.when(any_present, req).otherwise(F.lit(True))


@_v("requiredWithAll")
def _required_with_all(col, args, ctx):
    all_present = None
    for f in args:
        p = _present(ctx, f)
        all_present = p if all_present is None else (all_present & p)
    req = ~is_empty_col(col, ctx.dtype, zero_as_empty=ctx.zero_as_empty)
    return F.when(all_present, req).otherwise(F.lit(True))


@_v("requiredWithout")
def _required_without(col, args, ctx):
    any_absent = None
    for f in args:
        a = ~_present(ctx, f)
        any_absent = a if any_absent is None else (any_absent | a)
    req = ~is_empty_col(col, ctx.dtype, zero_as_empty=ctx.zero_as_empty)
    return F.when(any_absent, req).otherwise(F.lit(True))


@_v("requiredWithoutAll")
def _required_without_all(col, args, ctx):
    all_absent = None
    for f in args:
        a = ~_present(ctx, f)
        all_absent = a if all_absent is None else (all_absent & a)
    req = ~is_empty_col(col, ctx.dtype, zero_as_empty=ctx.zero_as_empty)
    return F.when(all_absent, req).otherwise(F.lit(True))


# --- cross-field compare (§2.3) --------------------------------------------

@_v("eqField")
def _eq_field(col, args, ctx):
    return col == ctx.resolve(args[0])


@_v("neField")
def _ne_field(col, args, ctx):
    return col != ctx.resolve(args[0])


@_v("gtField")
def _gt_field(col, args, ctx):
    return col > ctx.resolve(args[0])


@_v("gteField")
def _gte_field(col, args, ctx):
    return col >= ctx.resolve(args[0])


@_v("ltField")
def _lt_field(col, args, ctx):
    return col < ctx.resolve(args[0])


@_v("lteField")
def _lte_field(col, args, ctx):
    return col <= ctx.resolve(args[0])


# --- compare / range / membership (§2.4) -----------------------------------

@_v("min")
def _min(col, args, ctx):
    c, a = _cmp_pair(col, args[0], ctx.dtype)
    return c >= a


@_v("max")
def _max(col, args, ctx):
    c, a = _cmp_pair(col, args[0], ctx.dtype)
    return c <= a


@_v("gt")
def _gt(col, args, ctx):
    c, a = _cmp_pair(col, args[0], ctx.dtype)
    return c > a


@_v("lt")
def _lt(col, args, ctx):
    c, a = _cmp_pair(col, args[0], ctx.dtype)
    return c < a


@_v("between")
def _between(col, args, ctx):
    c0, a0 = _cmp_pair(col, args[0], ctx.dtype)
    c1, a1 = _cmp_pair(col, args[1], ctx.dtype)
    return (c0 >= a0) & (c1 <= a1)


@_v("isEqual")
def _is_equal(col, args, ctx):
    return col == _lit_for(ctx.dtype, args[0])


@_v("notEqual")
def _not_equal(col, args, ctx):
    return col != _lit_for(ctx.dtype, args[0])


@_v("intEqual")
def _int_equal(col, args, ctx):
    return col.try_cast("long") == F.lit(int(args[0]))


@_v("enum")
def _enum(col, args, ctx):
    # internal/validators/enum.go:15-39. A CONTAINER value is never a
    # member of a scalar enum list — the reference fails the whole
    # slice (#266: `in` on []string fails; the per-element form is
    # `S.*`); raising an AnalysisException here would kill the job on a
    # legal rule set instead of producing the violation row.
    if is_container_type(ctx.dtype):
        return F.lit(False)
    if is_numeric_type(ctx.dtype):
        vals = [float(a) if "." in a else int(a) for a in args]
        return col.isin(vals)
    return col.isin(list(args))


@_v("notIn")
def _not_in(col, args, ctx):
    # reference NotIn = !Enum (validators.go): a container value is not
    # in a scalar list, so notIn PASSES on non-empty containers (#266)
    if is_container_type(ctx.dtype):
        return F.lit(True)
    if is_numeric_type(ctx.dtype):
        vals = [float(a) if "." in a else int(a) for a in args]
        return col.isNotNull() & ~col.isin(vals)
    return col.isNotNull() & ~col.isin(list(args))


@_v("contains")
def _contains(col, args, ctx):
    # string-contains OR array-element OR map-key (util.go:408-442)
    a = args[0]
    if isinstance(ctx.dtype, T.ArrayType):
        return F.array_contains(col, _lit_for(ctx.dtype.elementType, a))
    if isinstance(ctx.dtype, T.MapType):
        return F.map_contains_key(col, _lit_for(ctx.dtype.keyType, a))
    return col.contains(a)


@_v("notContains")
def _not_contains(col, args, ctx):
    return col.isNotNull() & ~F.coalesce(_contains(col, args, ctx), F.lit(False))


@_v("stringContains")
def _string_contains(col, args, ctx):
    return col.contains(args[0])


@_v("startsWith")
def _starts_with(col, args, ctx):
    return col.startswith(args[0])


@_v("endsWith")
def _ends_with(col, args, ctx):
    return col.endswith(args[0])


# --- length (§2.4) ----------------------------------------------------------

@_v("length")
def _length(col, args, ctx):
    if not _is_lengthable(ctx.dtype):
        return F.lit(False)
    n = _byte_len(col, ctx.dtype)
    if len(args) == 1:
        return n == int(args[0])
    return (n >= int(args[0])) & (n <= int(args[1]))


@_v("minLength")
def _min_length(col, args, ctx):
    if not _is_lengthable(ctx.dtype):
        return F.lit(False)
    return _byte_len(col, ctx.dtype) >= int(args[0])


@_v("maxLength")
def _max_length(col, args, ctx):
    if not _is_lengthable(ctx.dtype):
        return F.lit(False)
    return _byte_len(col, ctx.dtype) <= int(args[0])


@_v("stringLength")
def _string_length(col, args, ctx):
    # RUNE count (validators_compare.go:176-197) → char_length;
    # non-strings fail like RuneLength(23, 2) does
    if ctx.dtype is not None and not is_string_type(ctx.dtype):
        return F.lit(False)
    n = F.char_length(col.cast("string"))
    if len(args) == 1:
        return n >= int(args[0])
    return (n >= int(args[0])) & (n <= int(args[1]))


@_v("byteLength")
def _byte_length(col, args, ctx):
    # ByteLength(str string, ...) — a non-string COERCES through the
    # string-param arg conversion (same contract as isStringNumber)
    n = F.octet_length(col.cast("string"))
    if len(args) == 1:
        return n >= int(args[0])
    return (n >= int(args[0])) & (n <= int(args[1]))


# --- type checks (§2.5) ------------------------------------------------------

@_v("isInt")
def _is_int(col, args, ctx):
    # internal/validators/type.go:25-48: strict kind for typed columns;
    # stringly data needs the Int regex + range
    if is_numeric_type(ctx.dtype) and isinstance(
        ctx.dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        ok = col.isNotNull()
    else:
        ok = _rx(col.cast("string"), RX["int"])
    if len(args) >= 1:
        v = col.try_cast("long")
        ok = ok & (v >= int(args[0]))
    if len(args) >= 2:
        ok = ok & (col.try_cast("long") <= int(args[1]))
    return ok


@_v("isUint")
def _is_uint(col, args, ctx):
    if is_numeric_type(ctx.dtype):
        return col.isNotNull() & (col >= 0)
    return _rx(col.cast("string"), r"^\d+$")


@_v("isBool")
def _is_bool(col, args, ctx):
    if isinstance(ctx.dtype, T.BooleanType):
        return col.isNotNull()
    # strutil.ToBool strings (validators_type.go:40-52)
    return F.lower(F.trim(col.cast("string"))).isin(
        "1", "on", "yes", "true", "0", "off", "no", "false"
    )


@_v("isFloat")
def _is_float(col, args, ctx):
    if isinstance(ctx.dtype, (T.DoubleType, T.FloatType, T.DecimalType)):
        return col.isNotNull()
    return _rx(col.cast("string"), RX["float"])


@_v("isString")
def _is_string(col, args, ctx):
    ok = col.isNotNull() if is_string_type(ctx.dtype) else F.lit(False)
    if len(args) >= 1 and is_string_type(ctx.dtype):
        n = F.octet_length(col)
        ok = ok & (n >= int(args[0]))
        if len(args) >= 2:
            ok = ok & (n <= int(args[1]))
    return ok


@_v("isIntString")
def _is_int_string(col, args, ctx):
    return _rx(col.cast("string"), RX["int"])


@_v("isNumber")
def _is_number(col, args, ctx):
    return _rx(col.cast("string"), RX["number"])


@_v("isNumeric")
def _is_numeric(col, args, ctx):
    return _rx(col.cast("string"), RX["number"])


@_v("isStringNumber")
def _is_string_number(col, args, ctx):
    # reference IsStringNumber(s string) — non-string values COERCE to
    # string through the arg conversion (issue #30: JSON number 10
    # passes str_num), so cast like isNumber rather than hard-failing
    return _rx(col.cast("string"), RX["number"])


def _schema_static(check):
    def b(col, args, ctx):
        return col.isNotNull() if check(ctx.dtype) else F.lit(False)
    return b


register_validator("isArray", _schema_static(lambda dt: isinstance(dt, T.ArrayType)))
register_validator("isSlice", _schema_static(lambda dt: isinstance(dt, T.ArrayType)))
register_validator("isMap", _schema_static(lambda dt: isinstance(dt, T.MapType)))
register_validator(
    "isInts",
    _schema_static(lambda dt: isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.IntegralType)),
)
register_validator(
    "isStrings",
    _schema_static(lambda dt: isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.StringType)),
)


@_v("isEmpty")
def _is_empty(col, args, ctx):
    return is_empty_col(col, ctx.dtype, zero_as_empty=ctx.zero_as_empty)


# --- string/format (§2.6) ----------------------------------------------------

@_v("regexp")
def _regexp(col, args, ctx):
    return _rx(col.cast("string"), args[0])


def _rx_validator(pattern_key: str):
    def b(col, args, ctx):
        return _rx(col.cast("string"), RX[pattern_key])
    return b


for _name, _key in [
    ("isEmail", "email"), ("isUUID", "uuid"), ("isUUID3", "uuid3"),
    ("isUUID4", "uuid4"), ("isUUID5", "uuid5"), ("isASCII", "ascii"),
    ("isPrintableASCII", "printable_ascii"), ("isAlpha", "alpha"),
    ("isAlphaNum", "alpha_num"), ("isAlphaDash", "alpha_dash"),
    ("isBase64", "base64"), ("isDataURI", "data_uri"),
    ("isHexadecimal", "hexadecimal"), ("isHexColor", "hex_color"),
    ("isRGBColor", "rgb_color"), ("isLatitude", "latitude"),
    ("isLongitude", "longitude"), ("isDNSName", "dns_name"),
    ("isCnMobile", "cn_mobile"), ("isISBN10", "isbn10"),
    ("isISBN13", "isbn13"), ("isFullURL", "full_url"),
    ("isIPv4", "ipv4"), ("isIPv6", "ipv6"), ("isMAC", "mac"),
    ("isCIDRv4", "cidr_v4"), ("isCIDRv6", "cidr_v6"),
    ("isWinPath", "win_path"), ("isUnixPath", "unix_path"),
]:
    register_validator(_name, _rx_validator(_key))


@_v("isIP")
def _is_ip(col, args, ctx):
    c = col.cast("string")
    return _nonempty_str(c) & (c.rlike(RX["ipv4"]) | c.rlike(RX["ipv6"]))


@_v("isCIDR")
def _is_cidr(col, args, ctx):
    c = col.cast("string")
    return _nonempty_str(c) & (c.rlike(RX["cidr_v4"]) | c.rlike(RX["cidr_v6"]))


@_v("isMultiByte")
def _is_multibyte(col, args, ctx):
    c = col.cast("string")
    return _nonempty_str(c) & c.rlike(RX["multi_byte"])


@_v("isURL")
def _is_url(col, args, ctx):
    # loose check (validators_string.go:62-75): no whitespace + url.Parse ok.
    # parse_url returns NULL on unparseable input — same "best effort" shape.
    c = col.cast("string")
    return (
        _nonempty_str(c)
        & ~c.rlike(r"\s")
        & (F.parse_url(c, F.lit("HOST")).isNotNull() | c.startswith("/") | c.contains("."))
    )


@_v("isJSON")
def _is_json(col, args, ctx):
    c = col.cast("string")
    # fast scan + parse (validators_string.go:261-271): object/array heads
    head = F.substring(F.ltrim(c), 1, 1)
    return _nonempty_str(c) & head.isin("{", "[") & F.try_parse_json(c).isNotNull()


@_v("hasWhitespace")
def _has_whitespace(col, args, ctx):
    c = col.cast("string")
    return _nonempty_str(c) & c.contains(" ")


@_v("hasLowerCase")
def _has_lower(col, args, ctx):
    return _rx(col.cast("string"), RX["has_lower"])


@_v("hasUpperCase")
def _has_upper(col, args, ctx):
    return _rx(col.cast("string"), RX["has_upper"])


# --- dates (§2.7) ------------------------------------------------------------

@_v("isDate")
def _is_date(col, args, ctx):
    return _to_ts(col).isNotNull()


@_v("dateFormat")
def _date_format(col, args, ctx):
    return F.try_to_timestamp(col.cast("string"), F.lit(args[0])).isNotNull()


@_v("afterDate")
def _after_date(col, args, ctx):
    return _to_ts(col) > _ts_lit(args[0])


@_v("beforeDate")
def _before_date(col, args, ctx):
    return _to_ts(col) < _ts_lit(args[0])


@_v("afterOrEqualDate")
def _after_or_equal_date(col, args, ctx):
    return _to_ts(col) >= _ts_lit(args[0])


@_v("beforeOrEqualDate")
def _before_or_equal_date(col, args, ctx):
    return _to_ts(col) <= _ts_lit(args[0])


# --- media (§2.8) — columnar re-expression ----------------------------------

@_v("isFile")
def _is_file(col, args, ctx):
    """Reference isFile (validators.go:505-517) = uploaded file exists.
    Columnar form: the media_ref is non-empty. Catalog resolution is the
    dataset-level referential check (operators/refcheck.py)."""
    return _nonempty_str(col.cast("string"))


@_v("isImage")
def _is_image(col, args, ctx):
    """MIME-map membership (validators.go:486-559). Expects a MIME column;
    optional args restrict to specific image subtypes (ext allowlist)."""
    c = col.cast("string")
    if args:
        mimes = [f"image/{a}" for a in args]
        return c.isin(mimes)
    return c.startswith("image/")


@_v("inMimeTypes")
def _in_mime_types(col, args, ctx):
    return col.cast("string").isin(list(args))


# --- rule_one_of (#292) -------------------------------------------------------

@_v("rule_one_of")
def _rule_one_of(col, args, ctx):
    # validators.go:240-260: logical OR of named sub-validators (no args)
    pred = None
    for name in args:
        sub = VALIDATORS[resolve_alias(name)](col, (), ctx)
        pred = sub if pred is None else (pred | F.coalesce(sub, F.lit(False)))
    return pred


# --- vector / embedding validators (beyond-reference) -----------------------
# The input_hint corpus carries embedding columns (array<float>); a
# training pipeline must gate them on shape and numeric sanity before
# ANN/dedup consume them. No single-row analogue exists in the
# reference — this is the rule-DSL lift of "is this vector usable".
# All three are Column expressions; l2NormBetween folds left-to-right
# over double-cast elements so external engines (the DuckDB oracle)
# reproduce the exact IEEE sum.

@_v("arrayDim")
def _array_dim(col, args, ctx):
    """Exact element count — catches truncated / ragged vectors."""
    if ctx is not None and ctx.dtype is not None and not is_container_type(ctx.dtype):
        return F.lit(False)
    return F.size(col) == int(args[0])


@_v("allFinite")
def _all_finite(col, args, ctx):
    """Every element non-NULL, non-NaN, finite. NaN/inf embeddings
    poison cosine scores silently — fail them at validation time.
    try_cast (not cast): under Spark 4 ANSI mode a non-numeric element
    (rule applied to array<string>) must fail the ROW, not abort the
    job — try_cast yields NULL, forall yields non-TRUE, rule fails."""
    return F.forall(
        col,
        lambda x: x.isNotNull()
        & ~F.isnan(x.try_cast("double"))
        & (F.abs(x.try_cast("double")) != F.lit(float("inf"))),
    )


@_v("l2NormBetween")
def _l2_norm_between(col, args, ctx):
    """round(||v||2, 6) in [lo, hi] — unit-norm (or bounded-norm)
    contract. A NaN element makes the norm NaN, which fails the range
    under both Spark's and DuckDB's NaN-is-largest comparison order; a
    NULL element propagates through the fold (norm NULL → fails) — ON
    PURPOSE stricter than aggregate engines whose sum skips NULLs (an
    oracle must use a NULL-propagating fold, not plain list sum)."""
    lo, hi = float(args[0]), float(args[1])
    # try_cast: a non-numeric element → NULL → NULL norm → row fails
    # (ANSI-safe; plain cast would abort the whole job on one bad row)
    sq = F.aggregate(
        col,
        F.lit(0.0),
        lambda acc, x: acc + x.try_cast("double") * x.try_cast("double"),
    )
    n = F.round(F.sqrt(sq), 6)
    return (n >= F.lit(lo)) & (n <= F.lit(hi))


# --- struct-method validator auto-discovery ---------------------------------

def discover_validators(model) -> dict:
    """Struct-method validator auto-discovery — the reference finds a
    custom validator as an EXPORTED METHOD of the struct under
    validation, looked up by the rule's validator name with the first
    letter upper-cased (``CustomValidator`` for rule "customValidator";
    FuncValue lookup, validation.go:437-449). The table-scale analogue:
    pass a model object (or class) whose public methods are Column
    builders ``fn(col, args, ctx) -> Column``; every method becomes a
    per-instance validator named with its first letter lower-cased.
    Feed the result to ``RuleSet(validators=...)`` — same precedence as
    the reference (instance methods shadow the global registry), same
    isolation (nothing global is touched).

        class UserFormChecks:
            def CustomValidator(self, col, args, ctx):
                return col.startswith("u-")
        RuleSet(rules={"uid": "required|customValidator"},
                validators=discover_validators(UserFormChecks()))
    """
    # a CLASS would hand back unbound functions whose self-slot would
    # swallow the engine's `col` argument — instantiate so methods bind
    if isinstance(model, type):
        model = model()
    out = {}
    for name in dir(model):
        if name.startswith("_"):
            continue
        fn = getattr(model, name)
        if not callable(fn):
            continue
        out[name[0].lower() + name[1:]] = fn
    return out


def make_ngram_udtf(n: int = 2):
    """Python UDTF (Spark 4 ``pyspark.sql.functions.udtf``) emitting
    one row per word n-gram of a text — the TABLE-function corner of
    the §2.11 UDF/UDAF/UDTF surface (scalar UDFs: register_validator;
    grouped: the drift sketches' applyInPandas; this is the FROM-clause
    citizen, composable via LATERAL JOIN in SQL).

    Each instance is per-row streaming (eval yields; no buffering);
    normalization matches textstats.normalize_text so grams agree with
    the n-gram dedup family. For bulk gram work prefer the native
    array pipeline (dedup.word_ngram_frame — codegen, no Python); the
    UDTF exists for ad-hoc SQL composition where a lateral explode of
    Python logic is the convenient form, and as the registration
    pattern for genuinely-Python tokenizers.
    """
    import re

    from pyspark.sql.functions import udtf

    norm_re = re.compile(r"[^a-z0-9]+")
    k = int(n)

    @udtf(returnType="pos int, gram string")
    class NGramUDTF:
        def eval(self, text: str):
            words = [w for w in norm_re.sub(" ", (text or "").lower()).split() if w]
            for i in range(len(words) - k + 1):
                yield i, " ".join(words[i : i + k])

    return NGramUDTF
