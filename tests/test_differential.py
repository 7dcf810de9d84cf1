"""Differential test: the Spark engine vs a pure-Python mini-oracle that
independently implements the REFERENCE's semantics (hand-derived from
validators.go / validating.go, not from our Spark code). One seeded
random corpus, every row × every rule compared — catches semantic drift
that example-based tests and SQL oracles can both miss (regex dialect,
empty gates, byte-vs-char lengths, numeric coercion of string columns).
"""

import random
import re

from pyspark.sql import types as T

from validate_spark import RuleSet, validate

SEED = 7
N_ROWS = 300

# the reference's Int / Email regexes, verbatim (validators.go:16,21) —
# note the Email pattern REQUIRES a dotted domain with a 2+ letter TLD,
# so "x@y" and "x@y.z" both fail (this differential test caught an
# HTML5-style oracle regex accepting them)
INT_RE = re.compile(r"^(?:[-+]?(?:0|[1-9][0-9]*))$")
EMAIL_RE_PY = re.compile(
    r'^(([^<>()\[\]\\.,;:\s@"]+(\.[^<>()\[\]\\.,;:\s@"]+)*)|(".+"))'
    r"@((\[[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}])"
    r"|(([a-zA-Z\-0-9]+\.)+[a-zA-Z]{2,}))$"
)


def _make_corpus():
    rng = random.Random(SEED)
    rows = []
    strings = ["", "ab", "abc", "hello world", "zz", "ésumé", "42", "-7", "007",
               "a@b.co", "not-an-email", "x" * 20, "café au lait"]
    for i in range(N_ROWS):
        s = rng.choice([None] + strings)
        n = rng.choice([None, -50, -1, 0, 1, 50, 100, 101, 10**9])
        d = rng.choice([None, -1.5, 0.0, 24.99, 50.0, 50.01, 1e6])
        arr = rng.choice([None, [], ["a"], ["a", "b", "c"]])
        s2 = rng.choice([None, "", "a@b.co", "u.name+tag@mail.example.org", "@bad",
                         "no-at-sign", "x@y", "x@y.z"])
        s3 = rng.choice([None, "", "a", "b", "c", "d", "A"])
        s4 = rng.choice([None, "", "0", "42", "-7", "007", "1.5", "+3", "abc"])
        twin = s if rng.random() < 0.5 else rng.choice([None] + strings)
        rows.append((str(i), s, n, d, arr, s2, s3, s4, twin))
    return rows


SCHEMA = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("s", T.StringType()),
    T.StructField("n", T.LongType()),
    T.StructField("d", T.DoubleType()),
    T.StructField("arr", T.ArrayType(T.StringType())),
    T.StructField("s2", T.StringType()),
    T.StructField("s3", T.StringType()),
    T.StructField("s4", T.StringType()),
    T.StructField("twin", T.StringType()),
])

RULES = {
    "s": "required|minLength:3|maxLength:10",
    "n": "required|min:0|max:100",
    "d": "between:0,50",
    "arr": "required|minLength:2",
    "s2": "email",
    "s3": "enum:a,b,c",
    "s4": "intStr",
    "twin": "eqField:s",
}


# ---- mini-oracle: reference semantics in plain Python ----------------------

def _empty(v):
    return v is None or v == "" or (isinstance(v, list) and len(v) == 0)


def _blen(v):
    if isinstance(v, list):
        return len(v)
    if v is None:
        return None
    return len(v.encode("utf-8"))  # Go len(string) is BYTES


def _numcmp(v, a, op):
    # valueCompare funnel: numeric column → numeric; string column →
    # numeric when the arg parses, else lexicographic; unparseable
    # string value → fail (validators.go:62-145)
    if isinstance(v, (int, float)):
        x = float(v)
    else:
        try:
            float(a)
        except ValueError:
            return op(v, a)  # lexicographic
        try:
            x = float(v)
        except (TypeError, ValueError):
            return False
    return op(x, float(a))


def _check(field, name, args, row):
    v = row[field]
    if name == "required":
        return not _empty(v)
    if _empty(v):  # skipEmpty gate for non-required validators
        return True
    if name == "minLength":
        return _blen(v) >= int(args[0])
    if name == "maxLength":
        return _blen(v) <= int(args[0])
    if name == "min":
        return _numcmp(v, args[0], lambda x, a: x >= a)
    if name == "max":
        return _numcmp(v, args[0], lambda x, a: x <= a)
    if name == "between":
        return _numcmp(v, args[0], lambda x, a: x >= a) and _numcmp(
            v, args[1], lambda x, a: x <= a
        )
    if name == "isEmail":
        return v != "" and bool(EMAIL_RE_PY.match(v))
    if name == "enum":
        return v in args
    if name == "isIntString":
        return v != "" and bool(INT_RE.match(v))
    if name == "eqField":
        return v == row[args[0]]
    raise AssertionError(f"mini-oracle has no {name}")


_PARSED = {
    "s": [("required", ()), ("minLength", ("3",)), ("maxLength", ("10",))],
    "n": [("required", ()), ("min", ("0",)), ("max", ("100",))],
    "d": [("between", ("0", "50"))],
    "arr": [("required", ()), ("minLength", ("2",))],
    "s2": [("isEmail", ())],
    "s3": [("enum", ("a", "b", "c"))],
    "s4": [("isIntString", ())],
    "twin": [("eqField", ("s",))],
}


def _oracle_violations(rows):
    out = set()
    cols = [f.name for f in SCHEMA.fields]
    for r in rows:
        row = dict(zip(cols, r))
        for field, checks in _PARSED.items():
            for name, args in checks:
                if not _check(field, name, args, row):
                    out.add((row["id"], field, name))
    return out


def test_engine_matches_mini_oracle(spark):
    rows = _make_corpus()
    df = spark.createDataFrame(rows, SCHEMA)
    res = validate(df, RuleSet(rules=RULES), key_cols=["id"])
    got = {
        (r["id"], r["field"], r["validator"])
        for r in res.violations().collect()
    }
    want = _oracle_violations(rows)
    only_engine = got - want
    only_oracle = want - got
    assert not only_engine and not only_oracle, (
        f"engine-only: {sorted(only_engine)[:10]}  "
        f"oracle-only: {sorted(only_oracle)[:10]}"
    )
    # sanity: the corpus actually exercises both outcomes of every rule
    fields_violated = {f for _, f, _ in want}
    assert fields_violated == set(RULES), f"corpus too tame: {fields_violated}"


# ---- nested / wildcard differential (the flagship interleaved shape) -------

NESTED_SCHEMA = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("spans", T.ArrayType(T.StructType([
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]))),
])

NESTED_RULES = {
    "spans": "required|minLength:1",
    "spans.*.kind": "required|in:text,image,audio",
    "spans.*.offset": "min:0",
    "spans.*.media_ref": "regexp:^m-[0-9]{4}$",
}

MREF_RE = re.compile(r"^m-[0-9]{4}$")


def _span_ok(name, span):
    kind, off, mref = span[0], span[3], span[2]
    if name == "kind_required":
        return not _empty(kind)
    if name == "kind_in":
        return True if _empty(kind) else kind in ("text", "image", "audio")
    if name == "offset_min":
        # numeric zero is NOT empty by default (zero_as_empty=False)
        return True if off is None else off >= 0
    if name == "mref_regexp":
        return True if _empty(mref) else bool(MREF_RE.match(mref))
    raise AssertionError(name)


def _nested_oracle(rows):
    out = set()
    checks = [
        ("spans.*.kind", "required", "kind_required"),
        ("spans.*.kind", "enum", "kind_in"),
        ("spans.*.offset", "min", "offset_min"),
        ("spans.*.media_ref", "regexp", "mref_regexp"),
    ]
    for rid, spans in rows:
        if _empty(spans):
            out.add((rid, "spans", "required"))
            # required over wildcard: empty/missing parent FAILS the
            # required child (validating.go:497-516); non-required
            # children — and non-required validators on the empty parent
            # itself (minLength) — pass via the skipEmpty gate
            out.add((rid, "spans.*.kind", "required"))
            continue
        for field, validator, key in checks:
            if not all(_span_ok(key, s) for s in spans):
                out.add((rid, field, validator))
    return out


def test_nested_wildcard_matches_mini_oracle(spark):
    rng = random.Random(11)
    kinds = [None, "", "text", "image", "audio", "video"]
    refs = [None, "", "m-0001", "m-99", "x-0001", "m-12345"]
    rows = []
    for i in range(N_ROWS):
        if rng.random() < 0.08:
            spans = rng.choice([None, []])
        else:
            spans = [
                (rng.choice(kinds), "t", rng.choice(refs), rng.choice([None, -1, 0, 5]))
                for _ in range(rng.randint(1, 4))
            ]
        rows.append((str(i), spans))
    df = spark.createDataFrame(rows, NESTED_SCHEMA)
    res = validate(df, RuleSet(rules=NESTED_RULES), key_cols=["id"])
    got = {(r["id"], r["field"], r["validator"]) for r in res.violations().collect()}
    want = _nested_oracle(rows)
    assert got == want, (
        f"engine-only: {sorted(got - want)[:8]}  oracle-only: {sorted(want - got)[:8]}"
    )


# ---- formats / cross-field / dates differential -----------------------------

UUID4_RE = re.compile(r"^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$")
_BOOLS = {"1", "on", "yes", "true", "0", "off", "no", "false"}
_DATE_LAYOUTS_BY_LEN = {19: ["%Y-%m-%d %H:%M:%S", "%Y/%m/%d %H:%M:%S"],
                        16: ["%Y-%m-%d %H:%M"],
                        10: ["%Y-%m-%d", "%Y/%m/%d"],
                        8: ["%Y%m%d"]}


def _parse_dt(v):
    import datetime
    for fmt in _DATE_LAYOUTS_BY_LEN.get(len(v), []):
        try:
            return datetime.datetime.strptime(v, fmt)
        except ValueError:
            continue
    return None


def _fmt_oracle(rows):
    import datetime
    out = set()
    lim = datetime.datetime(2020, 1, 1)
    for rid, role, token, b, sw, ct, u, d in rows:
        # requiredIf:role,admin,root (validators.go:268-303)
        if role in ("admin", "root") and _empty(token):
            out.add((rid, "token", "requiredIf"))
        if not _empty(b) and b.lower() not in _BOOLS:
            out.add((rid, "b", "isBool"))
        if not _empty(sw) and not sw.startswith("pre"):
            out.add((rid, "sw", "startsWith"))
        if not _empty(ct) and "xy" not in ct:
            out.add((rid, "ct", "contains"))
        if not _empty(u) and not UUID4_RE.match(u):
            out.add((rid, "u", "isUUID4"))
        if not _empty(d):
            ts = _parse_dt(d)
            if ts is None:
                out.add((rid, "d", "isDate"))
                out.add((rid, "d", "afterOrEqualDate"))  # unparseable fails compare too
            elif ts < lim:
                out.add((rid, "d", "afterOrEqualDate"))
    return out


def test_formats_crossfield_dates_match_mini_oracle(spark):
    rng = random.Random(23)
    roles = [None, "", "admin", "root", "user", "guest"]
    tokens = [None, "", "t1", "tok-9"]
    bools = [None, "", "1", "on", "Yes", "TRUE", "0", "off", "No", "false", "x", "2"]
    sws = [None, "", "prefix", "pre", "xpre", "PRE"]
    cts = [None, "", "xy", "axyb", "x-y", "XY"]
    us = [None, "", "550e8400-e29b-41d4-a716-446655440000",
          "550e8400-e29b-11d4-a716-446655440000",  # version 1, not 4
          "550E8400-E29B-41D4-A716-446655440000",  # uppercase fails (regex is lowercase)
          "not-a-uuid"]
    ds = [None, "", "2019-05-01", "2021-02-03", "not-a-date", "2021/02/03",
          "20210203", "2021-02-03 04:05:06", "2021-13-45"]
    rows = [
        (str(i), rng.choice(roles), rng.choice(tokens), rng.choice(bools),
         rng.choice(sws), rng.choice(cts), rng.choice(us), rng.choice(ds))
        for i in range(N_ROWS)
    ]
    df = spark.createDataFrame(
        rows,
        "id string, role string, token string, b string, sw string, "
        "ct string, u string, d string",
    )
    rules = {
        "token": "requiredIf:role,admin,root",
        "b": "bool",
        "sw": "startsWith:pre",
        "ct": "contains:xy",
        "u": "uuid4",
        "d": "date|gteDate:2020-01-01",
    }
    res = validate(df, RuleSet(rules=rules), key_cols=["id"])
    got = {(r["id"], r["field"], r["validator"]) for r in res.violations().collect()}
    want = _fmt_oracle(rows)
    assert got == want, (
        f"engine-only: {sorted(got - want)[:8]}  oracle-only: {sorted(want - got)[:8]}"
    )


# ---- corpus 4: default substitution × CheckDefault --------------------------

def test_defaults_checkdefault_match_mini_oracle(spark):
    """validating.go:225-247: empty value + default → substitute; then
    either commit WITHOUT checks (!CheckDefault, the reference default)
    or validate the substituted value (CheckDefault=true). Differential
    over both flag values × passing and failing default values."""
    import random as _random

    rng = _random.Random(11)
    values = [None, "", "5", "200", "abc", "42", "007", "-3"]
    rows = [(str(i), rng.choice(values)) for i in range(200)]
    schema = "id string, v string"
    checks = [("required", ()), ("isIntString", ()), ("min", ("1",)), ("max", ("99",))]

    def oracle(default, check_default):
        viols, safe = set(), {}
        for rid, v in rows:
            val = v
            substituted = False
            if _empty(val):
                val, substituted = default, True
            row = {"id": rid, "v": val}
            if substituted and not check_default:
                safe[rid] = val
                continue
            bad = {
                (rid, "v", name)
                for name, args in checks
                if not _check("v", name, args, row)
            }
            viols |= bad
            if not bad:
                safe[rid] = val
        return viols, safe

    df = spark.createDataFrame(rows, schema)
    for default in ("42", "999"):
        for check_default in (False, True):
            rs = RuleSet(
                rules={"v": f"default:{default}|required|intStr|min:1|max:99"},
                check_default=check_default,
            )
            res = validate(df, rs, key_cols=["id"])
            got_viols = {
                (r["id"], r["field"], r["validator"])
                for r in res.violations().collect()
            }
            want_viols, want_safe = oracle(default, check_default)
            # engine reports isIntString under its canonical name
            assert got_viols == want_viols, (default, check_default)
            got_safe = {r["id"]: r["v"] for r in res.safe_rows().collect()}
            assert got_safe == want_safe, (default, check_default)


# ---- corpus 5: query-string parser vs urllib --------------------------------

def test_query_parser_matches_urllib(spark):
    """parse_query_column vs Python's urllib.parse on a seeded corpus of
    WELL-FORMED query strings: first occurrence per bracket-normalized
    key must win (FormData.Get parity). Malformed %-escapes are
    excluded — there the engine's documented try_-semantics (NULL ≡
    empty) intentionally diverge from urllib's pass-through."""
    import random as _random
    from urllib.parse import quote_plus, unquote_plus

    rng = _random.Random(23)
    keys = ["a", "b", "tag", "addr[street]", "addr.city", "x[y][z]", "k[]"]
    vals = ["", "1", "hello world", "a=b", "percent%", "ümlaut", "c,d", "+plus+"]

    def norm_key(k):
        if "[]" in k:
            return k
        return k.replace("[", ".").replace("]", "")

    rows = []
    expected = []
    fields = ["a", "b", "tag", "addr.street", "addr.city", "x.y.z"]
    for i in range(120):
        n = rng.randint(1, 6)
        pairs = [
            (rng.choice(keys), rng.choice(vals)) for _ in range(n)
        ]
        qs = "&".join(f"{quote_plus(k, safe='[].')}={quote_plus(v)}" for k, v in pairs)
        first: dict = {}
        for k, v in pairs:
            first.setdefault(norm_key(k), v)
        rows.append((str(i), qs))
        expected.append({f: first.get(f) for f in fields})

    df = spark.createDataFrame(rows, "rid string, q string")
    from validate_spark.sources.formsrc import parse_query_column

    parsed = {r["rid"]: r["_form"] for r in parse_query_column(df, "q", fields).collect()}

    def leaf(form, path):
        cur = form
        for p in path.split("."):
            cur = cur[p] if cur is not None else None
        return cur

    for i, exp in enumerate(expected):
        form = parsed[str(i)]
        for f in fields:
            assert leaf(form, f) == exp[f], (i, f, rows[i][1], leaf(form, f), exp[f])


def test_debounce_matches_python_reference(spark):
    """debounce_first vs a direct single-threaded reference over a
    deterministic pseudo-random event set (chained-gap semantics)."""
    import datetime as dt
    import hashlib

    from validate_spark.operators.temporal import debounce_first

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(400):
        h = int(hashlib.md5(f"db:{i}".encode()).hexdigest()[:8], 16)
        key = h % 5
        sec = (h // 7) % 3600
        rows.append((key, t0 + dt.timedelta(seconds=sec), i))
    df = spark.createDataFrame(rows, "k long, ts timestamp, eid long")
    got = {(r["key"], r["kept_id"]): (r["kept_ts"], r["n_folded"])
           for r in debounce_first(df, "k", "ts", "eid", gap="120 seconds").collect()}

    ref = {}
    by_key = {}
    for k, ts, eid in rows:
        by_key.setdefault(k, []).append((ts, eid))
    for k, evs in by_key.items():
        evs.sort()
        burst = None
        for ts, eid in evs:
            if burst is None or (ts - prev_ts).total_seconds() > 120:
                if burst is not None:
                    ref[(k, burst[1])] = (burst[0], n - 1)
                burst = (ts, eid)
                n = 0
            n += 1
            prev_ts = ts
        ref[(k, burst[1])] = (burst[0], n - 1)
    assert got == ref


def test_group_percentiles_match_numpy(spark):
    """Spark percentile vs numpy linear interpolation on a
    deterministic value set (the SQL-standard (n-1)*p formula)."""
    import hashlib

    import numpy as np

    from validate_spark.operators.stats import group_percentiles

    rows = []
    for i in range(500):
        h = int(hashlib.md5(f"gp:{i}".encode()).hexdigest()[:8], 16)
        rows.append((h % 3, h % 1000))
    df = spark.createDataFrame(rows, "g int, v int")
    got = {r["g"]: r for r in group_percentiles(
        df, group_cols=["g"], value_col="v").collect()}
    for g in (0, 1, 2):
        vals = np.array([v for gg, v in rows if gg == g], dtype=float)
        for p, col in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75"), (0.95, "p95")):
            expect = round(float(np.percentile(vals, p * 100)), 6)
            assert got[g][col] == expect, (g, col)
