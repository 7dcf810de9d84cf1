"""Issue-driven regression corpus transliterated from the reference
(issues_test.go / issues_x2 / issues_x3) — the cases that pinned down
tricky semantics there must hold here too."""

import pytest
from pyspark.sql import Row

from validate_spark import RuleSet, validate


# --- Issue #292: rule_one_of (issues_x3_test.go:178-230) -------------------

@pytest.mark.parametrize(
    "addr,ok",
    [("1.2.3.4", True), ("10.0.0.0/8", True), ("not-an-addr", False), ("abc", False)],
)
def test_issue_292_rule_one_of(spark, addr, ok):
    df = spark.createDataFrame([Row(rid=1, Addr=addr)])
    res = validate(df, RuleSet(rules={"Addr": "rule_one_of:ip,cidr"}), key_cols=["rid"])
    assert res.verdicts().collect()[0]["pass"] is ok
    if not ok:
        assert "did not satisfy any" in res.field_one(1, "Addr")


def test_issue_292_alias_resolution(spark):
    # uppercase/alias names resolve inside rule_one_of too
    df = spark.createDataFrame([Row(rid=1, Addr="1.2.3.4")])
    res = validate(df, RuleSet(rules={"Addr": "rule_one_of:isIP,isCIDR"}), key_cols=["rid"])
    assert res.verdicts().collect()[0]["pass"] is True


# --- Issue #283: wildcard scene entries (issues_x2_test.go:362-401) --------

ISSUE283_SCHEMA = (
    "rid int, Name string, Code string, Test int, "
    "Tags array<struct<Id:string,Name:string,Date:string>>"
)
ISSUE283_RULES = {
    "Name": "required|minLen:7",
    "Tags.*.Id": "required",
    "Tags.*.Name": "required",
    "Tags.0.Date": "required",
}
ISSUE283_SCENES = {  # mirrors TestIssue_283_v2 (issues_x2_test.go:362-401)
    "update": ["Tags.Id", "Test"],       # index-less: must NOT match
    "updateStar": ["Tags.*.Id"],         # wildcard: EXACT normalized match
    "updateIdx": ["Tags.0.Date"],        # explicit index matches
}


def _issue283_df(spark):
    return spark.createDataFrame(
        [(1, "inhere", "asd", 1, [("", "", "")])], ISSUE283_SCHEMA
    )


def test_issue_283_indexless_scene_misses(spark):
    res = validate(
        _issue283_df(spark),
        RuleSet(rules=ISSUE283_RULES, scenes=ISSUE283_SCENES),
        key_cols=["rid"],
        scene="update",
    )
    fields = {r["field"] for r in res.violations().collect()}
    assert not any(f.startswith("Tags") for f in fields)


def test_issue_283_wildcard_scene_hits(spark):
    res = validate(
        _issue283_df(spark),
        RuleSet(rules=ISSUE283_RULES, scenes=ISSUE283_SCENES),
        key_cols=["rid"],
        scene="updateStar",
    )
    fields = {r["field"] for r in res.violations().collect()}
    # wildcard entry 'Tags.*.Id' selects exactly that slice rule —
    # sibling 'Tags.*.Name' and indexed 'Tags.0.Date' stay out of scene
    assert fields == {"Tags.*.Id"}


def test_scene_parent_entry_admits_descendants(spark):
    # isNotNeedToCheck ancestor-prefix rule (validation.go:916-921): a
    # plain scene entry equal to a PARENT name checks every dotted
    # descendant, at any depth — but never partial segment prefixes
    df = spark.createDataFrame(
        [(1, ("", ""), "")],
        "rid int, addr struct<city:string,zip:string>, addrX string",
    )
    rs = RuleSet(
        rules={"addr.city": "required", "addr.zip": "required", "addrX": "required"},
        scenes={"s": ["addr"]},
    )
    res = validate(df, rs, key_cols=["rid"], scene="s")
    fields = {r["field"] for r in res.violations().collect()}
    # 'addr' admits addr.city/addr.zip; 'addrX' only shares a CHARACTER
    # prefix and must stay out of scene
    assert fields == {"addr.city", "addr.zip"}


def test_scene_wildcard_entry_has_no_prefix_semantics(spark):
    # scene entry 'Tags.*' must NOT admit 'Tags.*.Id' (wildcard entries
    # match only exact normalized forms; reference scope note in
    # TestIssue_283_v2) but DOES admit an element rule 'Tags.*' itself
    df = spark.createDataFrame(
        [(1, [("", "x", "")])], ISSUE283_SCHEMA.replace("rid int, Name string, Code string, Test int, ", "rid int, ")
    )
    rs = RuleSet(
        rules={"Tags.*.Id": "required", "Tags.*": "minLength:1"},
        scenes={"s": ["Tags.*"]},
    )
    res = validate(df, rs, key_cols=["rid"], scene="s")
    fields = {r["field"] for r in res.violations().collect()}
    assert "Tags.*.Id" not in fields


def test_issue_283_explicit_index_scene(spark):
    res = validate(
        _issue283_df(spark),
        RuleSet(rules=ISSUE283_RULES, scenes=ISSUE283_SCENES),
        key_cols=["rid"],
        scene="updateIdx",
    )
    got = {(r["field"], r["validator"]) for r in res.violations().collect()}
    assert got == {("Tags.0.Date", "required")}


# --- Issue #125: nil value must not blow up (issues_test.go:904-928) --------

def test_issue_125_null_values_are_safe(spark):
    df = spark.createDataFrame(
        [Row(rid=1, name=None, age=None, tags=None)],
        "rid int, name string, age int, tags array<string>",
    )
    rs = RuleSet(
        rules={"name": "minLen:3|email", "age": "min:1|max:99", "tags": "minLen:1"}
    )
    res = validate(df, rs, key_cols=["rid"])  # must not raise
    # all rules skip on empty (non-required) → row passes
    assert res.verdicts().collect()[0]["pass"] is True


# --- Issue #262: interior `.*` filter applies per element -------------------

def test_issue_262_wildcard_filter_per_element(spark):
    df = spark.createDataFrame(
        [(1, [(" a ", 1), ("b ", 2)])],
        "rid int, items array<struct<name:string,v:int>>",
    )
    rs = RuleSet(
        rules={"items.*.name": "required|minLen:1"},
        filters={"items.*.name": "trim"},
    )
    res = validate(df, rs, key_cols=["rid"])
    assert res.verdicts().collect()[0]["pass"] is True
    safe = res.safe_rows().collect()[0]
    assert [x["name"] for x in safe["items"]] == ["a", "b"]


def test_issue_217_false_bool_is_present(spark):
    # #217 (data_source.go:446): a present-but-zero bool (ptr to false)
    # PASSES required; only a missing value (nil ptr → NULL) fails
    df = spark.createDataFrame(
        [("1", False), ("2", True), ("3", None)], "id string, val boolean"
    )
    res = validate(df, {"val": "required"}, key_cols=["id"])
    verd = {r["id"]: r["pass"] for r in res.verdicts().collect()}
    assert verd == {"1": True, "2": True, "3": False}
    # the zero-as-empty carve-out is an explicit opt-in flag
    res2 = validate(
        df, RuleSet(rules={"val": "required"}, zero_as_empty=True), key_cols=["id"]
    )
    verd2 = {r["id"]: r["pass"] for r in res2.verdicts().collect()}
    assert verd2 == {"1": False, "2": True, "3": False}


def test_issue_217_nested_slice_of_bools(spark):
    df = spark.createDataFrame(
        [("1", [{"val": False}, {"val": True}]), ("2", [{"val": None}])],
        "id string, samples array<struct<val:boolean>>",
    )
    res = validate(df, {"samples.*.val": "required"}, key_cols=["id"])
    verd = {r["id"]: r["pass"] for r in res.verdicts().collect()}
    assert verd == {"1": True, "2": False}


def test_issue_221_deep_wildcard_through_maps(spark):
    # #221: clinics.*.doctors.*.dates.*.date — wildcards through arrays
    # of maps, leaf addressed by key
    df = spark.createDataFrame(
        [
            ("1", [{"doctors": [{"dates": [{"date": "2023-01-01"}]}]}]),
            ("2", [{"doctors": [{"dates": [{"date": "nope"}]}]}]),
        ],
        "id string, clinics array<struct<doctors:array<struct<dates:array<map<string,string>>>>>>",
    )
    res = validate(
        df,
        {"clinics.*.doctors.*.dates.*.date": "required|date"},
        key_cols=["id"],
    )
    verd = {r["id"]: r["pass"] for r in res.verdicts().collect()}
    assert verd == {"1": True, "2": False}


# --- Issue #266: `in` on a whole slice fails, `S.*` per-element works -------

def test_issue_266_enum_on_slice_fails_whole(spark):
    # TestIssue_266_v2 (issues_x2_test.go): tag 'in' on []string checks
    # the WHOLE slice and fails — must be a violation row, never an
    # AnalysisException on a legal rule set
    df = spark.createDataFrame([(1, ["a", "b"])], "rid int, S array<string>")
    res = validate(df, RuleSet(rules={"S": "required|in:a,b"}), key_cols=["rid"])
    got = {(r["field"], r["validator"]) for r in res.violations().collect()}
    assert got == {("S", "enum")}
    # workaround: programmatic 'S.*' validates each element
    res2 = validate(df, RuleSet(rules={"S.*": "in:a,b"}), key_cols=["rid"])
    assert res2.verdicts().collect()[0]["pass"]
    # notIn = !enum: a container is never in a scalar list -> passes
    res3 = validate(df, RuleSet(rules={"S": "notIn:a,b"}), key_cols=["rid"])
    assert res3.verdicts().collect()[0]["pass"]


# --- Issue #301: escaped pipes in rule strings ------------------------------

def test_issue_301_escaped_pipes(spark):
    df = spark.createDataFrame(
        [("abc.json", "123", "a|b", "a\\|b")],
        "field string, other string, escape string, escape2 string",
    )
    rs = RuleSet(rules={
        "field": "required|regex:^[a-zA-Z0-9_.-]+\\.(yaml\\|yml\\|json)$|maxLen:50",
        "other": "required|regex:^\\d{3}$",
        "escape": "in: a\\|b",
        "escape2": "in: a\\\\|b",
    })
    res = validate(df, rs, key_cols=["field"])
    assert res.verdicts().collect()[0]["pass"]


# --- Issue #302: required family with numeric zero --------------------------

def test_issue_302_required_zero_int(spark):
    # zero is NOT empty unless zero_as_empty is set — every required_*
    # variant passes on 0 (issues_x2_test.go TestIssue_302)
    df = spark.createDataFrame([(0, 0, 0, 0)], "a long, b long, c long, d long")
    rs = RuleSet(rules={
        "a": "required|isUint|in:0,1,2",
        "b": "requiredIf:a,0",
        "c": "requiredWith:a",
        "d": "requiredUnless:a,1",
    })
    res = validate(df, rs, key_cols=["a"])
    assert res.verdicts().collect()[0]["pass"]


# --- Issue #162: requiredIf chained with a format validator ------------------

def test_issue_162_requiredif_uuid4_chain(spark):
    df = spark.createDataFrame(
        [("B", "94e48bd3-e990-405e-bd10-304e767cd3fd"), ("B", ""),
         ("C", ""), ("B", "notauuid")],
        "Type string, ID string",
    )
    rs = RuleSet(rules={"Type": "in:B,C", "ID": "requiredIf:Type,B|uuid4"})
    res = validate(df, rs, key_cols=["Type", "ID"])
    verd = {(r["Type"], r["ID"]): r["pass"] for r in res.verdicts().collect()}
    assert verd == {
        ("B", "94e48bd3-e990-405e-bd10-304e767cd3fd"): True,
        ("B", ""): False,      # required when Type=B
        ("C", ""): True,       # skipEmpty: uuid4 skips empty, not required
        ("B", "notauuid"): False,
    }


# --- Issue #152 / #111: labels inside cross-field messages -------------------

def test_issue_152_labels_in_requiredif_messages(spark):
    # the referenced field's LABEL renders in the message, and the value
    # list is bracketed (messages.go:473-533 arg translation, #111)
    df = spark.createDataFrame([(1, "")], "Type long, Data string")
    rs = RuleSet(
        rules={"Data": "requiredIf:Type,1"},
        labels={"Type": "类型", "Data": "数据"},
        locale="zh-CN",
    )
    res = validate(df, rs, key_cols=["Type"])
    assert res.violations().collect()[0]["message"] == "当 类型 为 [1] 时 数据 不能为空。"

    df2 = spark.createDataFrame([(0, "")], "Type long, Data string")
    rs2 = RuleSet(
        rules={"Data": "requiredUnless:Type,1"},
        labels={"Type": "类型", "Data": "数据"},
        locale="zh-CN",
    )
    res2 = validate(df2, rs2, key_cols=["Type"])
    assert res2.violations().collect()[0]["message"] == "当 类型 不为 [1] 时 数据 不能为空。"


def test_issue_140_requiredif_message_text(spark):
    # exact builtin English text incl. bracketed list (TestIssue_140)
    df = spark.createDataFrame([("value", "")], "Field1 string, Field2 string")
    res = validate(df, {"Field2": "requiredIf:Field1,value"}, key_cols=["Field1"])
    assert res.violations().collect()[0]["message"] == (
        "Field2 is required when Field1 is in [value]"
    )


# --- Issue #60: custom message keyed by an ALIAS validator name --------------

def test_issue_60_alias_message_key(spark):
    # AddMessages({"in": ...}) must hit the enum validator (the rule was
    # written as 'in'); same for field-scoped alias keys
    df = spark.createDataFrame([("1",)], "title string")
    res = validate(
        df,
        RuleSet(rules={"title": "in:2,3"}, messages={"in": "自定义错误"}),
        key_cols=["title"],
    )
    assert [v["message"] for v in res.violations().collect()] == ["自定义错误"]
    res2 = validate(
        df,
        RuleSet(rules={"title": "in:2,3"}, messages={"title.in": "field scoped"}),
        key_cols=["title"],
    )
    assert [v["message"] for v in res2.violations().collect()] == ["field scoped"]


def test_bare_field_message_key(spark):
    # findMessage order (messages.go:541-578): a bare FIELD key overrides
    # the builtin for ANY failing validator of that field
    df = spark.createDataFrame([("",)], "title string")
    res = validate(
        df,
        RuleSet(rules={"title": "required"}, messages={"title": "title is invalid"}),
        key_cols=["title"],
    )
    assert [v["message"] for v in res.violations().collect()] == ["title is invalid"]


def test_argcount_message_templates(spark):
    # isInt with 2 args renders the isInt2 template (validator+lenStr
    # selection, messages.go:547-563)
    df = spark.createDataFrame([("abc",)], "age string")
    res = validate(df, {"age": "int:1,99"}, key_cols=["age"])
    assert [v["message"] for v in res.violations().collect()] == [
        "age value must be an integer and in the range 1 - 99"
    ]
    # count-suffixed CUSTOM key in alias form ("int2")
    res2 = validate(
        df,
        RuleSet(rules={"age": "int:1,99"}, messages={"int2": "bad ranged int"}),
        key_cols=["age"],
    )
    assert [v["message"] for v in res2.violations().collect()] == ["bad ranged int"]


# --- Issue #172: element filter via trailing `.*` path ----------------------

def test_issue_172_trailing_star_filter(spark):
    # StringRule("Domains.*", "", "trimStrings"): scalar chain applied
    # to each array element (issues_test.go TestIssues_172)
    df = spark.createDataFrame(
        [(1, ["   test.com   ", "oof.com", " foobar.com"])],
        "rid int, domains array<string>",
    )
    rs = RuleSet(rules={"domains.*": "required"}, filters={"domains.*": "trim"})
    res = validate(df, rs, key_cols=["rid"])
    assert res.verdicts().collect()[0]["pass"]
    assert res.safe_rows().collect()[0]["domains"] == [
        "test.com", "oof.com", "foobar.com"
    ]


def test_trailing_star_filter_nested(spark):
    df = spark.createDataFrame(
        [(1, ([" a ", "b "],))], "rid int, o struct<tags:array<string>>"
    )
    rs = RuleSet(rules={"o.tags.*": "required"}, filters={"o.tags.*": "trim"})
    res = validate(df, rs, key_cols=["rid"])
    assert res.safe_rows().collect()[0]["o"]["tags"] == ["a", "b"]


# --- Issue #159: gteField compares date strings lexicographically ------------

def test_issue_159_gtefield_date_strings(spark):
    df = spark.createDataFrame(
        [("2021-12-17", "2020-12-16"), ("2021-01-01", "2021-06-30")],
        "start string, end string",
    )
    res = validate(
        df,
        {"start": "date|minLen:10", "end": "date|minLen:10|gteField:start"},
        key_cols=["start"],
    )
    verd = {r["start"]: r["pass"] for r in res.verdicts().collect()}
    assert verd == {"2021-12-17": False, "2021-01-01": True}


# --- Issue #30: str_num on a numeric JSON member -----------------------------

def test_issue_30_strnum_coerces_numbers(spark):
    from validate_spark.sources.jsonsrc import validate_json

    df = spark.createDataFrame([('{"cost_type": 10}',)], "j string")
    res = validate_json(df, "j", "cost_type int", {"cost_type": "str_num"}, key_cols=["j"])
    assert res.verdicts().collect()[0]["pass"]


# --- Issue #242: mutually-dependent requiredWithoutAll chains ----------------

def test_issue_242_requiredwithoutall_mutual(spark):
    df = spark.createDataFrame([(None, None, None)], "ID string, NewID string, OldID string")
    res = validate(
        df,
        {
            "ID": "requiredWithoutAll:NewID|uuid4",
            "NewID": "requiredWithoutAll:OldID|uuid4",
            "OldID": "requiredWithoutAll:NewID|string",
        },
        key_cols=["ID"],
    )
    assert res.verdicts().collect()[0]["pass"] is False
    got = {(v["field"], v["validator"]) for v in res.violations().collect()}
    assert got == {
        ("ID", "requiredWithoutAll"),
        ("NewID", "requiredWithoutAll"),
        ("OldID", "requiredWithoutAll"),
    }


def test_issue_22_custom_message_with_verb(spark):
    df = spark.createDataFrame([("tom", "x" * 48)], "Nickname string, Avatar string")
    rs = RuleSet(
        rules={"Nickname": "minLen:6", "Avatar": "maxLen:6"},
        messages={
            "Nickname.minLength": "OO! nickname min len is 6",
            "Avatar.maxLength": "OO! avatar max len is %d",
        },
    )
    res = validate(df, rs, key_cols=["Nickname"])
    msgs = {v["field"]: v["message"] for v in res.violations().collect()}
    assert msgs == {
        "Nickname": "OO! nickname min len is 6",
        "Avatar": "OO! avatar max len is 6",
    }


# --- Issue #189: tag-style per-validator message specs ----------------------

def test_issue_189_per_validator_message_spec(spark):
    # StringMessage("name", "required:...|minLen:...") — one field-keyed
    # string carrying per-validator messages (rule.go:265-293)
    df = spark.createDataFrame([("",), ("ab",)], "name string")
    rs = RuleSet(
        rules={"name": "required|minLen:5"},
        messages={"name": "required:name is required|minLen:name is too short"},
    )
    res = validate(df, rs, key_cols=["name"])
    msgs = {(r["name"], r["validator"]): r["message"] for r in res.violations().collect()}
    assert msgs[("", "required")] == "name is required"
    assert msgs[("ab", "minLength")] == "name is too short"


def test_issue_189_field_fallback_and_trimming(spark):
    df = spark.createDataFrame([("ab",)], "name string")
    # plain value: field-level fallback for any failing validator
    rs = RuleSet(rules={"name": "minLen:5"}, messages={"name": "name is invalid"})
    res = validate(df, rs, key_cols=["name"])
    assert [r["message"] for r in res.violations().collect()] == ["name is invalid"]
    # whitespace around segments and parts is trimmed
    rs2 = RuleSet(
        rules={"name": "required"},
        messages={"name": "  required : name is required  "},
    )
    df2 = spark.createDataFrame([("",)], "name string")
    res2 = validate(df2, rs2, key_cols=["name"])
    assert [r["message"] for r in res2.violations().collect()] == ["name is required"]
    # fallback text containing ':' with a NON-validator prefix is kept
    # whole (safer than the reference's blind split)
    rs3 = RuleSet(rules={"name": "minLen:5"}, messages={"name": "error: too short"})
    df3 = spark.createDataFrame([("ab",)], "name string")
    res3 = validate(df3, rs3, key_cols=["name"])
    assert [r["message"] for r in res3.violations().collect()] == ["error: too short"]
