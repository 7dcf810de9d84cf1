"""Builtin violation-message templates + rendering.

Transliterated from the reference's builtin message table
(messages.go:153-269) and its resolution order (messages.go:458-588):
rule-level custom message → ``field.validator`` → field → validator →
builtin default. Templates support ``{field}``, ``{args0}``,
``{args1end}``, ``{values}`` and Go's positional ``%v``/``%d``/``%s``
verbs (filled left-to-right from the rule args).

Messages are rendered to STATIC strings at plan-compile time (all args
are literals) — zero runtime cost. Value interpolation (``ErrShowValue``,
issue #184) IS supported, but lives in the plan layer, not here: the
compiled rule carries a ``value_col`` and the results array appends
" (value: %v)" at evaluation time (plan.py CompiledRule/results_array),
since the failing value is per-row and cannot be compile-time static.
"""

from __future__ import annotations

import re

DEFAULT_MSG = "{field} field did not pass validation"

# ---------------------------------------------------------------------------
# locales — pluggable per-language message maps (reference:
# locales/zhcn/zhcn.go Register/RegisterGlobal; lookup merges locale
# data over builtins via AddMessages, messages.go:458-588). Keys may be
# aliases ("date", "url") exactly as in the reference locale files; we
# normalize to canonical validator names at registration time.
# ---------------------------------------------------------------------------

LOCALES: dict[str, dict[str, str]] = {}


def register_locale(name: str, data: dict[str, str]) -> None:
    """Register a message map for a locale. Alias keys are also stored
    under their canonical validator name (resolve order parity: the
    reference indexes messages by the name the rule used, after alias
    resolution — register.go:132-376)."""
    from validate_spark.functions.validators import resolve_alias

    norm = dict(data)
    for k, v in data.items():
        canon = resolve_alias(k)
        norm.setdefault(canon, v)
    LOCALES[name] = norm


# zh-CN builtin, transliterated from the reference's locale map
# (locales/zhcn/zhcn.go:19-119).
ZH_CN = {
    "_": "{field} 没有通过验证",
    "min": "{field} 的最小值是 %v",
    "max": "{field} 的最大值是 %v",
    "minLength": "{field} 的最小长度是 %d",
    "maxLength": "{field} 的最大长度是 %d",
    "enum": "{field} 值必须在下列枚举中 %v",
    "range": "{field} 值必须在此范围内 %v - %v",
    "required": "{field} 是必填项",
    "requiredIf": "当 {args0} 为 {args1end} 时 {field} 不能为空。",
    "requiredUnless": "当 {args0} 不为 {args1end} 时 {field} 不能为空。",
    "requiredWith": "当 {values} 存在时 {field} 不能为空。",
    "requiredWithAll": "当 {values} 存在时 {field} 不能为空。",
    "requiredWithout": "当 {values} 不存在时 {field} 不能为空。",
    "requiredWithoutAll": "当 {values} 都不存在时 {field} 不能为空。",
    "email": "{field}不是合法邮箱",
    "eqField": "{field} 值必须等于该字段 %s",
    "neField": "{field} 值不能等于该字段 %s",
    "ltField": "{field} 值应小于该字段 %s",
    "lteField": "{field} 值应小于等于该字段 %s",
    "gtField": "{field} 值应大于该字段 %s",
    "gteField": "{field} 值应大于等于该字段 %s",
    "isString": "{field} 值必须是一个字符串",
    "stringLength": "{field} 值长度必须在 %d - %d 范围内",
    "isURL": "{field} 值必须是一个有效的URL地址",
    "isFullURL": "{field} 值必须是一个完整、有效的URL地址",
    "isFile": "{field} 值必须是一个可上传的文件",
    "isImage": "{field} 值必须是一个可上传的图像文件",
    "bool": "{field} 值必须是一个bool类型",
    "float": "{field} 值必须是一个float类型",
    "slice": "{field} 值必须是一个slice类型",
    "map": "{field} 值必须是一个map类型",
    "array": "{field} 值必须是一个array类型",
    "strings": "{field} 值必须是一个[]string类型",
    "notIn": "{field} 值不能出现在给定枚举列表中 %d",
    "contains": "{field} 值不能出现在枚举列表中 %s",
    "notContains": "{field} 值包含输入指定值 %s",
    "startsWith": "{field} 值的前缀必须是：%s ",
    "endsWith": "{field} 值的后缀必须是：%s ",
    "regex": "{field} 值没有通过正则匹配",
    "file": "{field} 值必须是一个文件",
    "image": "{field} 值必须是一图像",
    "date": "{field} 值应该是一个日期字符串",
    "gtDate": "{field} 日期应该在 %s 之后",
    "ltDate": "{field} 日期应该在 %s 之前",
    "gteDate": "{field} 日期应该等于 %s 或者在其之后",
    "lteDate": "{field} 日期应该等于 %s 或者在其之前",
    "hasWhitespace": "{field} 值应该包含空格",
    "ascii": "{field} 值应该是一个 ASCII 字符串",
    "alpha": "{field} 值仅包含字母字符",
    "alphaNum": "{field} 值仅包含字母字符和数字",
    "alphaDash": "{field} 值仅包含字母字符、数字、破折号（-）、下划线（_）",
    "multiByte": "{field} 值应该是一个多字节字符串",
    "base64": "{field} 值应该是一个Base64字符串",
    "dnsName": "{field} 值应该是一个DNS名称字符串",
    "dataURI": "{field} 值应该是一个DataURI字符串",
    "empty": "{field} 值应该为空",
    "hexColor": "{field} 值应该是十六进制的颜色字符串",
    "hexadecimal": "{field} 值应该是十六进制字符串",
    "json": "{field} 值应该是一个json字符串",
    "lat": "{field} 值应该是一个纬度坐标",
    "lon": "{field} 值应该是一个经度坐标",
    "mac": "{field} 值应该是一个 MAC 字符串",
    "num": "{field} 值应该是一个数字字符串(>=0)",
    "cnMobile": "{field} 值应该是中国11位手机号码字符串",
    "printableASCII": "{field} 值应该是可打印ASCII字符串",
    "rgbColor": "{field} 值应该是RGP颜色字符串",
    "fullUrl": "{field} 值应该是一个完整的URL字符串",
    "url": "{field} 值应该是一个URL字符串",
    "ip": "{field} 值应该是一个IP（v4或v6）字符串",
    "ipv4": "{field} 值应该是一个IPv4字符串",
    "ipv6": "{field} 值应该是一个IPv6字符串",
    "CIDR": "{field} 值应该是一个CIDR字符串",
    "CIDRv4": "{field} 值应该是一个CIDRv4字符串",
    "CIDRv6": "{field} 值应该是一个CIDRv6字符串",
    "uuid": "{field} 值应该是一个UUID字符串",
    "uuid3": "{field} 值应该是一个UUID3字符串",
    "uuid4": "{field} 值应该是一个UUID4字符串",
    "uuid5": "{field} 值应该是一个UUID5字符串",
    "unixPath": "{field} 值应该是一个Unix路径字符串",
    "winPath": "{field} 值应该是一个Windows路径字符串",
    "isbn10": "{field} 值应该是一个ISBN10字符串",
    "isbn13": "{field} 值应该是一个ISBN13字符串",
}

BUILTIN_MESSAGES: dict[str, str] = {
    "_": DEFAULT_MSG,
    "_validate": "{field} did not pass validation",
    "_filter": "{field} data is invalid",
    "min": "{field} min value is %v",
    "max": "{field} max value is %v",
    "isInt": "{field} value must be an integer",
    # arg-count variants, selected when the rule carries that many args
    # (findMessage "validator + lenStr", messages.go:547-563; the "mix"
    # typo is the reference's own, kept verbatim for parity)
    "isInt1": "{field} value must be an integer and mix value is %d",
    "isInt2": "{field} value must be an integer and in the range %d - %d",
    "isString1": "{field} value must be a string and min length is %d",
    "stringLength1": "{field} min length is %d",
    "stringLength2": "{field} length must be in the range %d - %d",
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
    locale: str | None = None,
    labels: "dict[str, str] | None" = None,
) -> str:
    """Resolve + render a message to a static string at compile time.

    Resolution order: rule-level custom → locale map (if a locale is
    set; reference merges locale data over builtins, AddMessages) →
    builtin → default (messages.go:458-588).

    Arg rendering parity (messages.go:473-533): any string ARG that is
    a labelled field name renders as its LABEL (#111 — e.g.
    ``requiredIf:Type,1`` with label 类型 says 当 类型 为 ...);
    ``{values}`` and ``{args1end}`` render as bracketed comma lists
    (arrutil.ToString — "[12,13,14]"); ``{args0}`` is the bare arg."""
    loc = LOCALES.get(locale, {}) if locale else {}
    # arg-count template variant first: isInt with (min, max) args uses
    # isInt2 (findMessage validator+lenStr, messages.go:547-563)
    narg = f"{name}{len(args)}" if args else None
    tpl = custom
    if tpl is None and narg:
        tpl = loc.get(narg) or BUILTIN_MESSAGES.get(narg)
    if tpl is None:
        tpl = loc.get(name) or BUILTIN_MESSAGES.get(name) or DEFAULT_MSG
    shown = label or field
    if labels:
        args = tuple(labels.get(a, a) for a in args)
    out = tpl.replace("{field}", shown)
    out = out.replace("{values}", "[" + ",".join(args) + "]")
    out = out.replace("{args0}", args[0] if args else "")
    out = out.replace("{args1end}", "[" + ",".join(args[1:]) + "]")
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


# ru-RU builtin, transliterated from locales/ruru/ruru.go:19-129
RU_RU = {
    "_": "Поле {field} не прошло проверку",
    "_validate": "Поле {field} не прошло проверку",
    "_filter": "Значение {field} некорректно",
    "min": "Минимальное значение {field} равно %v",
    "max": "Максимальное значение {field} равно %v",
    "isInt": "{field} должно быть числом",
    "isInt1": "{field} должно быть числом и не менее %d",
    "isInt2": "{field} должно быть числом и в диапазоне %d - %d",
    "isInts": "{field} должно быть массивом чисел",
    "isUint": "{field} должно быть положительным числом",
    "isString": "{field} должно быть строкой",
    "isString1": "{field} должно быть строкой с минимальной длиной %d",
    "minLength": "Длина {field} должна быть не меньше %d",
    "maxLength": "Длина {field} должна быть не более %d",
    "stringLength": "Длина {field} должна быть в диапазоне %d - %d",
    "stringLength1": "Минимальная длина {field} равна %d",
    "stringLength2": "Длина {field} должна быть в диапазоне %d - %d",
    "isURL": "{field} должно быть корректным URL адресом",
    "isFullURL": "{field} должно быть корректным полным URL адресом",
    "isFile": "{field} должно быть загруженным файлом",
    "isImage": "{field} должно быть изображением",
    "enum": "{field} должно иметь одно из указанных значений: %v",
    "range": "{field} должно быть в диапазоне %v - %v",
    "lt": "Значение {field} должно быть меньше %d",
    "gt": "Значение {field} должно быть больше %d",
    "required": "{field} не может быть пустым",
    "requiredIf": "{field} не может быть пустым, когда {args0} равно {args1end}",
    "requiredUnless": "{field} не может быть пустым, если {args0} не равно {args1end}",
    "requiredWith": "{field} не может быть пустым при наличии {values}",
    "requiredWithAll": "{field} не может быть пустым при наличии {values}",
    "requiredWithout": "{field} не может быть пустым, если поле {values} пустое",
    "requiredWithoutAll": "{field} не может быть пустым, если ни одной из {values} не присутствует",
    "eqField": "{field} должно быть равно полю %s",
    "neField": "{field} не может быть равно полю %s",
    "ltField": "{field} должно быть меньше значения поля %s",
    "lteField": "{field} должно быть меньше или равно значению поля %s",
    "gtField": "{field} должно быть больше значения поля %s",
    "gteField": "{field} должно быть больше или равно значению поля %s",
    "bool": "{field} должно быть логическим",
    "float": "{field} должно быть плавающим числом",
    "slice": "{field} должно быть слайсом",
    "map": "{field} должно быть картой",
    "array": "{field} должно быть массивом",
    "strings": "{field} должно быть массивом строк",
    "notIn": "{field} не должно быть в данном списке %d",
    "contains": "{field} должно содержать %s",
    "notContains": "{field} не должно содержать %s",
    "startsWith": "{field} должно начинаться с %s",
    "endsWith": "{field} должно заканчиваться на %s",
    "email": "{field} должно быть электронной почтой",
    "regex": "{field} не прошло проверку регулярным выражением",
    "file": "{field} должно быть файлом",
    "image": "{field} должно быть изображением",
    "date": "{field} должно быть строкой даты",
    "gtDate": "{field} должно быть датой после %s",
    "ltDate": "{field} должно быть датой до %s",
    "gteDate": "{field} должно быть датой после %s включительно",
    "lteDate": "{field} должно быть датой до %s включительно",
    "hasWhitespace": "{field} должно содержать пробелы",
    "ascii": "{field} должно быть ASCII строкой",
    "alpha": "{field} содержит только буквы",
    "alphaNum": "{field} содержит только буквы и числа",
    "alphaDash": "{field} содержит только буквы, цифры, тире (-) и подчеркивания (_)",
    "multiByte": "{field} должно быть многобайтовой строкой",
    "base64": "{field} должно быть base64 строкой",
    "dnsName": "{field} должно быть DNS строкой",
    "dataURI": "{field} должно быть DataURL строкой",
    "empty": "{field} должно быть пустым",
    "hexColor": "{field} должно быть цветовой шестнадцатеричной (HEX) строкой",
    "hexadecimal": "{field} должно быть шестнадцатеричной (HEX) строкой",
    "json": "{field} должно быть json строкой",
    "lat": "{field} должно быть координатами широты",
    "lon": "{field} должно быть координатами долготы",
    "num": "{field} должно быть цифровой строкой (>=0)",
    "mac": "{field} должно быть MAC адресом",
    "printableASCII": "{field} должно быть печатаемой ASCII строкой",
    "rgbColor": "{field} должно быть строкой RGB цвета",
    "fullURL": "{field} должно быть полной строкой URL-адреса",
    "full": "{field} должно быть строкой URL-адреса",
    "ip": "{field} должно быть строкой ip адреса (v4 или v6)",
    "ipv4": "{field} должно быть ipv4 строкой",
    "ipv6": "{field} должно быть ipv6 строкой",
    "CIDR": "{field} должно быть CIDR строкой",
    "CIDRv4": "{field} должно быть CIDRv4 строкой",
    "CIDRv6": "{field} должно быть CIDRv6 строкой",
    "uuid": "{field} должно быть UUID строкой",
    "uuid3": "{field} должно быть UUID3 строкой",
    "uuid4": "{field} должно быть UUID4 строкой",
    "uuid5": "{field} должно быть UUID5 строкой",
    "filePath": "{field} должно быть существующим путем к файлу",
    "unixPath": "{field} должно быть строкой пути unix",
    "winPath": "{field} должно быть строкой пути Windows",
    "isbn10": "{field} должно быть isbn10 строкой",
    "isbn13": "{field} должно быть isbn13 строкой",
}

# zh-TW builtin, transliterated from locales/zhtw/zhtw.go:19-118
ZH_TW = {
    "_": "{field} 沒有通過驗證",
    "min": "{field} 的最小值是 %v",
    "max": "{field} 的最大值是 %v",
    "lt": "{field} value should be less than %v",
    "gt": "{field} value should be greater than %v",
    "minLength": "{field} 的最小長度是 %d",
    "maxLength": "{field} 的最大長度是 %d",
    "enum": "{field} 值必須在下列枚舉中 %v",
    "range": "{field} 值必須在此範圍內 %v - %v",
    "required": "{field} 是必填項",
    "requiredIf": "當 %v 為 {args} 時 {field} 不能為空。",
    "requiredUnless": "當 %v 不為 {args} 時 {field} 不能為空。",
    "requiredWith": "當 {values} 存在時 {field} 不能為空。",
    "requiredWithAll": "當 {values} 存在時 {field} 不能為空。",
    "requiredWithout": "當 {values} 不存在時 {field} 不能為空。",
    "requiredWithoutAll": "當 {values} 都不存在時 {field} 不能為空。",
    "email": "{field}不是合法郵箱",
    "eqField": "{field} 值必須等於該字段 %s",
    "neField": "{field} 值不能等於該字段 %s",
    "ltField": "{field} 值應小於該字段 %s",
    "lteField": "{field} 值應小於等於該字段 %s",
    "gtField": "{field} 值應大於該字段 %s",
    "gteField": "{field} 值應大於等於該字段 %s",
    "isString": "{field} 值必須是壹個字符串",
    "isString1": "{field} 值必須是壹個字符串，最小長度為 %d",
    "stringLength": "{field} 值長度必須在 %d - %d 範圍內",
    "isURL": "{field} 值必須是壹個有效的URL地址",
    "isFullURL": "{field} 值必須是壹個完整、有效的URL地址",
    "isFile": "{field} 值必須是壹個可上傳的文件",
    "isImage": "{field} 值必須是壹個可上傳的圖像文件",
    "bool": "{field} 值必須是壹個bool類型",
    "float": "{field} 值必須是壹個float類型",
    "slice": "{field} 值必須是壹個slice類型",
    "map": "{field} 值必須是壹個map類型",
    "array": "{field} 值必須是壹個array類型",
    "strings": "{field} 值必須是壹個[]string類型",
    "notIn": "{field} 值不能出現在給定枚舉列表中 %d",
    "contains": "{field} 值不能出現在枚舉列表中 %s",
    "notContains": "{field} 值包含輸入指定值 %s",
    "startsWith": "{field} 值的前綴必須是：%s ",
    "endsWith": "{field} 值的後綴必須是：%s ",
    "regex": "{field} 值沒有通過正則匹配",
    "file": "{field} 值必須是壹個文件",
    "image": "{field} 值必須是壹圖像",
    "date": "{field} 值應該是壹個日期字符串",
    "gtDate": "{field} 日期應該在 %s 之後",
    "ltDate": "{field} 日期應該在 %s 之前",
    "gteDate": "{field} 日期應該等於 %s 或者在其之後",
    "lteDate": "{field} 日期應該等於 %s 或者在其之前",
    "hasWhitespace": "{field} 值應該包含空格",
    "ascii": "{field} 值應該是壹個 ASCII 字符串",
    "alpha": "{field} 值僅包含字母字符",
    "alphaNum": "{field} 值僅包含字母字符和數字",
    "alphaDash": "{field} 值僅包含字母字符、數字、破折號（-）、下劃線（_）",
    "multiByte": "{field} 值應該是壹個多字節字符串",
    "base64": "{field} 值應該是壹個Base64字符串",
    "dnsName": "{field} 值應該是壹個DNS名稱字符串",
    "dataURI": "{field} 值應該是壹個DataURI字符串",
    "empty": "{field} 值應該為空",
    "hexColor": "{field} 值應該是十六進制的顏色字符串",
    "hexadecimal": "{field} 值應該是十六進制字符串",
    "json": "{field} 值應該是壹個json字符串",
    "lat": "{field} 值應該是壹個緯度坐標",
    "lon": "{field} 值應該是壹個經度坐標",
    "mac": "{field} 值應該是壹個MAC字符串",
    "num": "{field} 值應該是壹個數字字符串(>=0)",
    "cnMobile": "{field} 值應該是中國11位手機號碼字符串",
    "printableASCII": "{field} 值應該是可打印ASCII字符串",
    "rgbColor": "{field} 值應該是RGP顏色字符串",
    "fullUrl": "{field} 值應該是壹個完整的URL字符串",
    "url": "{field} 值應該是壹個URL字符串",
    "ip": "{field} 值應該是壹個IP（v4或v6）字符串",
    "ipv4": "{field} 值應該是壹個IPv4字符串",
    "ipv6": "{field} 值應該是壹個IPv6字符串",
    "CIDR": "{field} 值應該是壹個CIDR字符串",
    "CIDRv4": "{field} 值應該是壹個CIDRv4字符串",
    "CIDRv6": "{field} 值應該是壹個CIDRv6字符串",
    "uuid": "{field} 值應該是壹個UUID字符串",
    "uuid3": "{field} 值應該是壹個UUID3字符串",
    "uuid4": "{field} 值應該是壹個UUID4字符串",
    "uuid5": "{field} 值應該是壹個UUID5字符串",
    "filePath": "{field} 值應該是壹個存在的文件路徑",
    "unixPath": "{field} 值應該是壹個Unix路徑字符串",
    "winPath": "{field} 值應該是壹個Windows路徑字符串",
    "isbn10": "{field} 值應該是壹個ISBN10字符串",
    "isbn13": "{field} 值應該是壹個ISBN13字符串",
}

register_locale("zh-CN", ZH_CN)
register_locale("ru-RU", RU_RU)
register_locale("zh-TW", ZH_TW)
