"""Property-based tests for the rule-string DSL (split/parse grammar,
util.go:74-95 + rule.go:171-217 parity). Pure Python — no Spark session
— so hypothesis can run hundreds of cases cheaply. The reference has no
property tests; this guards the grammar corners its unit tests pin
(escaped pipes, raw regexp args, list-arg splitting) against the whole
input space.
"""

from hypothesis import given, settings, strategies as st

from validate_spark.plans.dsl import parse_segment, parse_rules, split_segments
from validate_spark.functions.validators import resolve_alias, ALIASES, VALIDATORS

# segment text that contains no separator metacharacters
_plain = st.text(
    alphabet=st.characters(blacklist_characters="|\\:"), min_size=1, max_size=20
).map(str.strip).filter(bool)


@given(st.lists(_plain, min_size=1, max_size=8))
@settings(max_examples=300)
def test_split_roundtrip_without_escapes(segs):
    assert split_segments("|".join(segs)) == segs


@given(st.lists(_plain, min_size=1, max_size=6))
@settings(max_examples=300)
def test_escaped_pipe_joins_segments(segs):
    # every '|' escaped → ONE segment containing literal pipes
    joined = "\\|".join(segs)
    assert split_segments(joined) == ["|".join(segs)]


@given(_plain)
@settings(max_examples=300)
def test_regexp_keeps_raw_arg(pat):
    # everything after the first ':' is ONE argument, colons/commas kept
    name, args = parse_segment(f"regex:{pat}:a,b")
    assert name == "regexp"
    assert args == (f"{pat}:a,b",)


@given(st.lists(st.text(alphabet="abcdef", min_size=0, max_size=4), min_size=1, max_size=6))
@settings(max_examples=300)
def test_list_arg_validators_drop_empty_entries(vals):
    name, args = parse_segment("notIn:" + ",".join(vals))
    assert name == "notIn"
    assert args == tuple(v for v in (x.strip() for x in vals) if v)


# side-effecting probes the engine deliberately does NOT implement:
# isActiveURL = network HEAD/GET (validators_string.go:90-119);
# path probes = local filesystem (validators_compare.go:22-28). Their
# table-scale replacement is the referential catalog anti-join
# (SURVEY.md §2.9, §7.4). Aliases stay registered so the compile error
# names the validator rather than "unknown alias".
_UNIMPLEMENTED_PROBES = {"isActiveURL", "isFilePath", "isDirPath", "pathExists"}


@given(st.sampled_from(sorted(ALIASES)))
def test_every_alias_resolves_to_registered_validator(alias):
    canon = resolve_alias(alias)
    assert (
        canon in VALIDATORS
        or canon in ("default", "optional", "safe", "-")
        or canon in _UNIMPLEMENTED_PROBES
    ), f"alias {alias!r} resolves to unregistered {canon!r}"


@given(
    st.lists(
        st.sampled_from(["required", "min:1", "max:9", "email", "enum:a,b"]),
        min_size=1,
        max_size=5,
    )
)
@settings(max_examples=200)
def test_parse_rules_preserves_declaration_order(segs):
    fr = parse_rules("f", "|".join(segs))
    got = [r.name for r in fr.rules]
    want = [parse_segment(s)[0] for s in segs]
    assert got == want


def test_default_and_optional_are_directives_not_rules():
    fr = parse_rules("f", "optional|default:7|min:1")
    assert fr.optional and fr.default == "7"
    assert [r.name for r in fr.rules] == ["min"]
    assert all(r.optional for r in fr.rules)
