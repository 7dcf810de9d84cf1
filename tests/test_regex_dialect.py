"""Regex dialect differential: every RX pattern evaluated by Spark's
``rlike`` (Java java.util.regex) must agree with Python ``re`` on a
tricky corpus. The reference compiles these patterns with Go RE2; for
the constructs used (character classes, alternation, bounded repeats)
RE2 ⊂ Java regex ⊂ Python re semantics, so tri-engine agreement on the
corpus is the practical parity check (SURVEY.md §7.3 "Go RE2 vs Java
regex dialect — audit each pattern").

One Spark job evaluates ALL patterns as boolean columns over the whole
corpus in a single projection (no per-pattern actions).
"""

import re

from pyspark.sql import Row, functions as F

from validate_spark.functions.validators import RX

# corpus built to poke dialect edges: anchors, \d vs [0-9], \w unicode
# semantics, hex escapes, empty string, long runs, unicode text
CORPUS = [
    "",
    " ",
    "abc",
    "ABC",
    "abc123",
    "abc_123",
    "abc-123",
    "Ünïcode",
    "日本語テキスト",
    "123",
    "0",
    "-0",
    "+42",
    "007",
    "3.14",
    "-3.14e10",
    ".5",
    "1e",
    "a@b.co",
    "user.name+tag@example.org",
    "@bad",
    "x@y",
    "192.168.0.1",
    "256.1.1.1",
    "::1",
    "2001:db8::ff00:42:8329",
    "10.0.0.0/8",
    "aa:bb:cc:dd:ee:ff",
    "aabb.ccdd.eeff",
    "#fff",
    "#A1B2C3",
    "rgb(255, 0, 10)",
    "rgb(256,0,0)",
    "SGVsbG8=",
    "SGVsbG8",
    "data:image/png;base64,iVBOR",
    "550e8400-e29b-41d4-a716-446655440000",
    "550E8400-E29B-41D4-A716-446655440000",
    "/usr/local/bin",
    "//double//slash/",
    "C:\\Users\\test\\file.txt",
    "C:/Users/test",
    "example.com",
    "sub-domain.example.co.uk",
    "-bad.example.com",
    "13800138000",
    "023800138000",
    "90",
    "90.0001",
    "-90",
    "180.0",
    "180.1",
    "123456789X",
    "1234567890123",
    "\x7f",
    "tab\there",
    "line\nbreak",
    "https://example.com/path?q=1",
    "ftp://files.example.org",
    "notaurl",
    "a" * 300,
]


def test_rlike_agrees_with_python_re_on_corpus(spark):
    df = spark.createDataFrame([Row(idx=i, s=s) for i, s in enumerate(CORPUS)])
    cols = [
        F.col("s").rlike(pat).alias(name) for name, pat in sorted(RX.items())
    ]
    got_rows = df.select("idx", "s", *cols).collect()
    mismatches = []
    for r in got_rows:
        for name, pat in sorted(RX.items()):
            # re.ASCII: Go RE2 and Java both treat \w/\d/\s as ASCII
            # classes; Python defaults them to Unicode (this test's
            # first run caught exactly that on alpha_dash + "Ünïcode")
            want = bool(re.search(pat, r["s"], re.ASCII))
            if bool(r[name]) != want:
                mismatches.append((name, r["s"][:30], bool(r[name]), want))
    assert not mismatches, f"dialect divergence: {mismatches[:10]}"


def test_round4_patterns_dialect_parity(spark):
    """Round-4 pattern sets (pattern_profile ladder, mojibake/ctrl
    classes, C4 cues, Gopher counters, CJK script ranges) — same
    tri-engine discipline. Java/RE2 codepoint escapes ``\\x{..}``
    are translated to Python ``\\uXXXX`` for the re side (Python re
    does not parse the braced form); the DuckDB/RE2 leg of the parity
    is exercised by the oracle gate itself."""
    import re as _re

    from validate_spark.operators.suggest import PATTERN_CLASSES
    from validate_spark.operators.textstats import (
        CTRL_RX,
        MOJIBAKE_RX,
        REPLACEMENT_RX,
        SCRIPT_RANGES,
        _C4_POLICY_RX,
        _SENTENCE_RX,
    )

    def to_py(pat):
        return _re.sub(
            r"\\x\{([0-9a-fA-F]+)\}",
            lambda m: "\\u" + m.group(1).zfill(4),
            pat,
        )

    pats = dict(PATTERN_CLASSES)
    pats.update(
        mojibake=MOJIBAKE_RX, replacement=REPLACEMENT_RX, ctrl=CTRL_RX,
        c4_policy=_C4_POLICY_RX, sentence=_SENTENCE_RX,
        alpha_word=r"\s[^\s]*[A-Za-z]",
        bullet=r"(^|\n)[ \t]*[\x{2022}*-]",
        ellipsis_end=r"(\.\.\.|\x{2026})[ \t]*(\n|$)",
    )
    pats.update({f"script_{k}": v for k, v in SCRIPT_RANGES.items()})

    corpus = [
        "", " ", "42", "-7", "3.14", ".5", "TRUE", "off", "2024-02-29",
        "0f3a2b1c-9d8e-4f5a-8b7c-612345abcdef", "a@b.co", "x@y",
        "https://x.io/p", "notaurl", "deadbeef", "123", "plain words",
        "caf\u00c3\u00a9", "it\u00e2\u20ac\u2122s", "r\u00e9sum\u00e9",
        "\ufffd", "bell\u0007", "tab\there", "line\nbreak",
        "privacy policy", "Uses Cookies", "lorem ipsum dolor",
        "One. Two! Three?", "ends...", "dots... then more",
        "\u2022 bullet", "- dash line", "* star\n- dash",
        "\u65e5\u672c\u8a9e", "\ud55c\uad6d\uc5b4",
        "\u0440\u0443\u0441\u0441\u043a\u0438\u0439",
        "\u0627\u0644\u0639\u0631\u0628\u064a\u0629",
        "\u30ab\u30bf\u30ab\u30ca", "mixed \u4e2d\u6587 text",
        "a" * 120,
    ]
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(idx=i, s=s) for i, s in enumerate(corpus)])
    cols = [F.col("s").rlike(p).alias(n) for n, p in sorted(pats.items())]
    rows = df.select("idx", "s", *cols).collect()
    mismatches = []
    for r in rows:
        for name, pat in sorted(pats.items()):
            want = bool(_re.search(to_py(pat), r["s"], _re.ASCII))
            if bool(r[name]) != want:
                mismatches.append((name, r["s"][:24], bool(r[name]), want))
    assert not mismatches, f"dialect divergence: {mismatches[:10]}"
