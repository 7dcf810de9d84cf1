"""Extension-surface tests: quantile-sketch drift (applyInPandas path),
Iceberg-aware table IO shim, custom vectorized validators and filters
(the reference's AddValidator/AddFilter surface, §2.11)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from validate_spark import RuleSet, register_validator, register_filter, validate
from validate_spark.operators import drift as dr
from validate_spark.sources import tables as tb


# ---------------------------------------------------------------------------
# sketch drift
# ---------------------------------------------------------------------------

def test_sketch_drift_same_distribution(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    rep = dr.sketch_drift(a, b, "value")
    assert rep.method == "ks_sketch"
    assert not rep.drifted, f"false drift: {rep}"


def test_sketch_drift_detects_shift(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    shifted = ev.withColumn("value", F.col("value") * 3 + 100)
    rep = dr.sketch_drift(ev, shifted, "value")
    assert rep.drifted and rep.statistic > 0.3


def test_sketch_rows_are_tiny(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    sk = dr.partition_quantile_sketches(ev, "value", n_quantiles=16).collect()
    assert all(len(r["q"]) == 16 for r in sk)
    assert sum(r["n"] for r in sk) == ev.count()


# ---------------------------------------------------------------------------
# table IO shim
# ---------------------------------------------------------------------------

def test_read_table_parquet_path(spark):
    df = tb.read_table(spark, "/root/testdata/sf0.001/documents.parquet")
    assert df.count() > 0


def test_read_table_snapshot_requires_iceberg(spark):
    with pytest.raises(ValueError):
        tb.read_table(spark, "/root/testdata/sf0.001/documents.parquet", snapshot_id=1)


def test_write_table_parquet_roundtrip(spark, tmp_path):
    out = str(tmp_path / "out_tbl")
    df = spark.range(5)
    tb.write_table(df, out)
    assert spark.read.parquet(out).count() == 5
    tb.write_table(df, out)  # append
    assert spark.read.parquet(out).count() == 10


def test_iceberg_not_available_here(spark):
    # sandbox has no Iceberg jar — the shim must report that honestly
    assert tb.iceberg_available(spark) is False


# ---------------------------------------------------------------------------
# custom validator / filter surface (§2.11)
# ---------------------------------------------------------------------------

def test_custom_vectorized_validator(spark):
    """AddValidator parity: a pandas-UDF-backed validator plugs into the
    rule DSL by name and runs Arrow-vectorized."""

    @F.pandas_udf("boolean")
    def _pal(s: pd.Series) -> pd.Series:
        return s.fillna("").map(lambda x: x == x[::-1])

    register_validator("palindrome", lambda col, args, ctx: _pal(col))

    df = spark.createDataFrame(
        [("1", "level"), ("2", "spark"), ("3", None)], "id string, w string"
    )
    res = validate(df, RuleSet(rules={"w": "required|palindrome"}), key_cols=["id"])
    got = {r["id"]: r["pass"] for r in res.verdicts().collect()}
    assert got == {"1": True, "2": False, "3": False}


def test_custom_validator_with_args(spark):
    register_validator(
        "divisibleBy", lambda col, args, ctx: col % int(args[0]) == 0
    )
    df = spark.createDataFrame([(3,), (4,), (9,)], "n int")
    res = validate(df, RuleSet(rules={"n": "divisibleBy:3"}), key_cols=["n"])
    got = {r["n"]: r["pass"] for r in res.verdicts().collect()}
    assert got == {3: True, 4: False, 9: True}


def test_custom_filter(spark):
    register_filter("reverse", lambda col, args: F.reverse(col))
    df = spark.createDataFrame([("1", "abc")], "id string, w string")
    res = validate(
        df,
        RuleSet(rules={"w": "required"}, filters={"w": "reverse|upper"}),
        key_cols=["id"],
    )
    assert res.safe_rows().collect()[0]["w"] == "CBA"


# ---------------------------------------------------------------------------
# one-shot Val() parity (value.go:38-106)
# ---------------------------------------------------------------------------

def test_check_value_oneshot(spark):
    from validate_spark import check_value

    ok, msgs = check_value(spark, "inhere", "required|minLen:7")
    assert not ok and msgs == ["v min length is 7"]
    ok, msgs = check_value(spark, "long enough", "required|minLen:7")
    assert ok and msgs == []
    ok, _ = check_value(spark, 120, "int:0,100")
    assert not ok
    ok, _ = check_value(spark, None, "required", dtype="string")
    assert not ok


# ---------------------------------------------------------------------------
# k-means IVF centroids, rule suggestion, IQR outliers, media validators
# ---------------------------------------------------------------------------

def test_kmeans_fit_deterministic_and_improves_recall(spark):
    from validate_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    c1 = sim.kmeans_fit(emb, 8, n_iters=2)
    c2 = sim.kmeans_fit(emb, 8, n_iters=2)
    assert c1 == c2  # deterministic
    q = emb.limit(5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = sim.brute_force_topk(emb, q, k=5)
    sampled = sim.sample_centroids(emb, 8)
    r_sampled = sim.recall_at_k(sim.ivf_topk(emb, q, sampled, k=5, nprobe=3), exact)
    r_kmeans = sim.recall_at_k(sim.ivf_topk(emb, q, c1, k=5, nprobe=3), exact)
    # fitted centroids should not be worse than raw samples (tolerance:
    # random 64-dim vectors are a hard case; assert no collapse)
    assert r_kmeans >= r_sampled - 0.15
    assert r_kmeans > 0


def test_suggest_rules_snapshot_passes(spark):
    from validate_spark.operators.suggest import suggest_rules

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rs = suggest_rules(docs)
    assert "required" in rs.rules["doc_id"]
    assert rs.rules["lang"].count("enum:") == 1
    res = validate(docs, rs, key_cols=["doc_id"])
    assert res.verdicts().filter("NOT pass").count() == 0  # snapshot passes

    # perturbed data violates the learned rules
    bad = docs.withColumn(
        "lang", F.when(F.col("doc_id") % 10 == 0, F.lit("xx")).otherwise(F.col("lang"))
    )
    res2 = validate(bad, rs, key_cols=["doc_id"])
    viol = {(r["field"], r["validator"]) for r in res2.violations().collect()}
    assert ("lang", "enum") in viol


def test_iqr_outliers(spark):
    from validate_spark.operators.drift import count_outliers, iqr_outlier_bounds

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    lo, hi = iqr_outlier_bounds(ev, "value")
    assert lo < hi
    # inject gross outliers; they must be counted
    spiked = ev.withColumn(
        "value",
        F.when(F.col("event_id") % 100 == 0, F.lit(1e9)).otherwise(F.col("value")),
    )
    base = count_outliers(ev, "value")
    assert count_outliers(spiked, "value") >= base + 5


def test_media_mime_validators(spark):
    from validate_spark.operators import multimodal as mmod

    df = mmod.media_metadata(
        mmod.attach_fake_media(
            spark.createDataFrame([(str(i),) for i in range(40)], "doc_id string")
        )
    ).select("doc_id", F.col("media_meta.mime").alias("mime"))
    rs = RuleSet(
        rules={"mime": "required|inMimeTypes:image/jpeg,image/png,audio/wav"}
    )
    res = validate(df, rs, key_cols=["doc_id"])
    assert res.verdicts().filter("NOT pass").count() == 0
    # isImage rejects the audio rows
    res2 = validate(df, RuleSet(rules={"mime": "image"}), key_cols=["doc_id"])
    fails = res2.verdicts().filter("NOT pass").count()
    audio = df.filter(F.col("mime") == "audio/wav").count()
    assert fails == audio and audio > 0


def test_schema_diff(spark):
    from validate_spark.operators.suggest import schema_diff
    from pyspark.sql import types as T

    before = T.StructType.fromDDL(
        "doc_id string, n int, spans array<struct<kind:string,offset:int>>"
    )
    after = T.StructType.fromDDL(
        "doc_id string, n bigint, spans array<struct<kind:string>>, extra string"
    )
    d = {x["path"]: x["kind"] for x in schema_diff(before, after)}
    assert d == {
        "n": "type_changed",
        "spans.*.offset": "removed",
        "extra": "added",
    }
    assert schema_diff(before, before) == []
    # DataFrames accepted directly
    df = spark.createDataFrame([], before)
    assert schema_diff(df, df) == []


# --- AddCustomType extractor registry (register_type.go:30-68) ------------

def test_custom_type_extractor_validates_underlying_value(spark):
    from pyspark.sql import types as T
    from validate_spark import register_custom_type, reset_custom_types

    # the sql.NullString analogue: struct<val:string, valid:boolean>
    null_string = T.StructType(
        [T.StructField("val", T.StringType()), T.StructField("valid", T.BooleanType())]
    )

    def extract(col, dt):
        # nil contract: invalid wrapper → NULL → treated as unset
        return F.when(col.getField("valid"), col.getField("val")), T.StringType()

    register_custom_type(null_string, extract)
    try:
        df = spark.createDataFrame(
            [(1, ("hello", True)), (2, ("x", True)), (3, ("ignored", False))],
            "id long, name struct<val:string,valid:boolean>",
        )
        res = validate(
            df, RuleSet(rules={"name": "required|minLen:3"}), key_cols=["id"]
        )
        verd = {r["id"]: r["pass"] for r in res.verdicts().collect()}
        # 1: extracted 'hello' passes; 2: 'x' fails minLen on the
        # EXTRACTED value; 3: invalid wrapper → NULL → required fails
        assert verd == {1: True, 2: False, 3: False}
    finally:
        reset_custom_types()


def test_custom_type_registration_invalidates_plan_cache(spark):
    from pyspark.sql import types as T
    from validate_spark import register_custom_type, reset_custom_types

    df = spark.createDataFrame(
        [(1, ("ok", True))], "id long, name struct<val:string,valid:boolean>"
    )
    rs = RuleSet(rules={"name": "required"})
    # without an extractor: struct is non-null → required passes
    assert validate(df, rs, key_cols=["id"]).verdicts().collect()[0]["pass"]
    wrapper = T.StructType(
        [T.StructField("val", T.StringType()), T.StructField("valid", T.BooleanType())]
    )
    register_custom_type(
        wrapper, lambda c, dt: (F.lit(None).cast("string"), T.StringType())
    )
    try:
        # same RuleSet + schema: a stale cached plan would still pass
        assert not validate(df, rs, key_cols=["id"]).verdicts().collect()[0]["pass"]
    finally:
        reset_custom_types()
    assert validate(df, rs, key_cols=["id"]).verdicts().collect()[0]["pass"]


# --- per-instance validator overlay (validation.go:387-411) ----------------

def test_per_instance_validator_overlay(spark):
    df = spark.createDataFrame([("abc",), ("xyz",)], "code string")
    starts_a = RuleSet(
        rules={"code": "required|isShiny"},
        validators={"isShiny": lambda col, args, ctx: col.startswith("a")},
    )
    starts_x = RuleSet(
        rules={"code": "required|isShiny"},
        validators={"isShiny": lambda col, args, ctx: col.startswith("x")},
    )
    # two concurrent rule sets carry CONFLICTING validators of the same
    # name without touching the global registry
    va = {r["code"]: r["pass"] for r in validate(df, starts_a, key_cols=["code"]).verdicts().collect()}
    vx = {r["code"]: r["pass"] for r in validate(df, starts_x, key_cols=["code"]).verdicts().collect()}
    assert va == {"abc": True, "xyz": False}
    assert vx == {"abc": False, "xyz": True}
    from validate_spark import VALIDATORS

    assert "isShiny" not in VALIDATORS


def test_instance_overlay_shadows_global(spark):
    df = spark.createDataFrame([("abc",)], "s string")
    rs = RuleSet(
        rules={"s": "minLen:2"},
        validators={"minLength": lambda col, args, ctx: F.lit(False)},
    )
    assert not validate(df, rs).verdicts().collect()[0]["pass"]
    # global registry untouched
    assert validate(df, RuleSet(rules={"s": "minLen:2"})).verdicts().collect()[0]["pass"]


# --- snapshot-catalog probe validators (pathExists family, isActiveURL) ----

def test_snapshot_path_validators(spark):
    from validate_spark import RuleSet, validate
    from validate_spark.functions.catalogs import register_snapshot_validators
    from validate_spark.functions.validators import VALIDATORS

    register_snapshot_validators(
        files=["/data/a.txt", "/data/b.txt"],
        dirs=["/data/imgs"],
        urls=["https://ok.example.com"],
    )
    try:
        df = spark.createDataFrame(
            [
                (1, "/data/a.txt", "https://ok.example.com"),
                (2, "/data/imgs/x.png", "https://dead.example.com"),  # dir containment
                (3, "/nope", "https://ok.example.com"),
                (4, None, None),  # empty skips (non-required)
            ],
            "rid int, path string, url string",
        )
        res = validate(df, RuleSet(rules={"url": "isActiveURL"}), key_cols=["rid"])
        verd = {r["rid"]: r["pass"] for r in res.verdicts().collect()}
        assert verd == {1: True, 2: False, 3: True, 4: True}
        # isFilePath is strict membership: the dir-contained file fails it
        res2 = validate(df, RuleSet(rules={"path": "isFilePath"}), key_cols=["rid"])
        verd2 = {r["rid"]: r["pass"] for r in res2.verdicts().collect()}
        assert verd2 == {1: True, 2: False, 3: False, 4: True}
        # pathExists admits files, dirs AND dir-contained descendants
        res3 = validate(df, RuleSet(rules={"path": "pathExists"}), key_cols=["rid"])
        verd3 = {r["rid"]: r["pass"] for r in res3.verdicts().collect()}
        assert verd3 == {1: True, 2: True, 3: False, 4: True}
    finally:
        for name in ("pathExists", "isFilePath", "isDirPath", "isActiveURL"):
            VALIDATORS.pop(name, None)


def test_snapshot_catalog_size_guard():
    import pytest as _pytest
    from validate_spark.functions.catalogs import membership_validator

    with _pytest.raises(ValueError, match="anti-join"):
        membership_validator(str(i) for i in range(100_001))


def test_prefix_membership_scales_by_depth_not_entries(spark):
    """10k-dir containment must compile to O(max_depth) InSet probes,
    not a 10k-term startswith Or-chain (analyzer/codegen blowup). Checks
    both the expression size and the membership semantics."""
    import time

    from validate_spark.functions.catalogs import prefix_membership_validator

    dirs = [f"/data/shard{i:02d}/bucket{j:03d}" for i in range(10) for j in range(1000)]
    t0 = time.monotonic()
    builder = prefix_membership_validator(dirs)
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "/data/shard03/bucket777/img.png"),   # contained
            (2, "/data/shard03/bucket777"),           # exact member
            (3, "/data/shard03/bucketXYZ/img.png"),   # miss
            (4, "/data/shard03"),                     # ancestor, not member
        ],
        "rid int, path string",
    )
    out = df.select("rid", builder(F.col("path"), [], None).alias("ok"))
    got = {r["rid"]: r["ok"] for r in out.collect()}
    elapsed = time.monotonic() - t0
    assert got == {1: True, 2: True, 3: False, 4: False}
    # compile+run stays interactive (the Or-chain version stack-dives or
    # takes many minutes); generous bound — this VM's throughput swings
    # ±2-4x under co-tenant load (CLAUDE.md), and the expression-size
    # assertion below is the structural guard
    assert elapsed < 120
    # expression tree is depth-bounded: one isin per distinct depth + 1
    expr = out.schema[1].name and str(out._jdf.queryExecution().analyzed())
    assert expr.count("substring_index") <= 4


def test_struct_method_validator_discovery(spark):
    """discover_validators: public methods of a model object become
    per-instance validators named with a lower-cased first letter —
    the reference's CustomValidator-method lookup re-expressed over the
    RuleSet.validators overlay."""
    from validate_spark import RuleSet, validate
    from validate_spark.functions.validators import discover_validators

    class Checks:
        def CustomValidator(self, col, args, ctx):
            return col.startswith("u-")

        def MinWords(self, col, args, ctx):
            from pyspark.sql import functions as F

            return F.size(F.split(col, " ")) >= int(args[0])

    df = spark.createDataFrame(
        [(1, "u-1", "a b c"), (2, "x-2", "a")], "rid int, uid string, bio string"
    )
    rs = RuleSet(
        rules={"uid": "required|customValidator", "bio": "minWords:2"},
        validators=discover_validators(Checks()),
    )
    res = validate(df, rs, key_cols=["rid"])
    got = {
        (r["rid"], r["validator"]) for r in res.violations().collect()
    }
    assert got == {(2, "customValidator"), (2, "minWords")}


def test_prefix_membership_property_vs_reference_semantics(spark):
    """Property check: the depth-grouped substring_index compile must
    agree with the definitional semantics (value ∈ dirs OR value starts
    with some dir + '/') on a randomized corpus of dirs and probes —
    including multi-slash, root, equal-prefix and near-miss shapes."""
    import random

    from pyspark.sql import functions as F

    from validate_spark.functions.catalogs import prefix_membership_validator

    rng = random.Random(7)
    segs = ["a", "b", "cc", "d1", "x"]

    def rand_path(depth):
        return "/".join(rng.choice(segs) for _ in range(depth))

    dirs = list({rand_path(rng.randint(1, 4)) for _ in range(60)})
    probes = list(
        {
            p
            for _ in range(250)
            for p in [
                rand_path(rng.randint(1, 6)),
                rng.choice(dirs),
                rng.choice(dirs) + "/" + rand_path(rng.randint(1, 2)),
                rng.choice(dirs) + rng.choice(segs),  # prefix WITHOUT slash
            ]
        }
    )

    def ref_semantics(v):
        return v in set(dirs) or any(v.startswith(d + "/") for d in dirs)

    builder = prefix_membership_validator(dirs)
    df = spark.createDataFrame([(p,) for p in probes], "p string")
    got = {
        r["p"]: r["ok"]
        for r in df.select("p", builder(F.col("p"), [], None).alias("ok")).collect()
    }
    for p in probes:
        assert got[p] == ref_semantics(p), f"divergence at {p!r}"


def test_ruleset_json_roundtrip():
    """to_json/from_json preserve the declarative surface AND the
    manifest identity hash; per-instance validators re-bind by name or
    fail loudly."""
    from validate_spark import RuleSet

    rs = RuleSet(
        rules={"a": "required|min:3", "b.*": "enum:x,y"},
        filters={"a": "trim|int"},
        messages={"a.min": "too small"},
        labels={"a": "Alpha"},
        scenes={"ingest": ["a"]},
        stop_on_error=True,
        zero_as_empty=True,
        locale="zh-CN",
    )
    back = RuleSet.from_json(rs.to_json())
    assert back == rs
    assert back.hash() == rs.hash()

    def my_validator(col, args, ctx):  # pragma: no cover - never called
        return col.isNotNull()

    rs2 = RuleSet(rules={"a": "myCheck"}, validators={"myCheck": my_validator})
    payload = rs2.to_json()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="myCheck"):
        RuleSet.from_json(payload)
    back2 = RuleSet.from_json(payload, validators={"myCheck": my_validator})
    assert back2.hash() == rs2.hash()
    assert back2.validators["myCheck"] is my_validator


def test_ngram_udtf_lateral_join(spark):
    from pyspark.sql import functions as F

    from validate_spark.functions.validators import make_ngram_udtf

    spark.udtf.register("t_bigrams", make_ngram_udtf(2))
    spark.createDataFrame(
        [(1, "The quick, quick fox!"), (2, None), (3, "one")],
        "id long, text string",
    ).createOrReplaceTempView("t_udtf_docs")
    rows = spark.sql(
        "SELECT d.id, g.pos, g.gram FROM t_udtf_docs d, "
        "LATERAL t_bigrams(d.text) g ORDER BY d.id, g.pos"
    ).collect()
    got = [(r["id"], r["pos"], r["gram"]) for r in rows]
    # normalization: lowercase, punctuation stripped; NULL and
    # single-word docs emit nothing
    assert got == [(1, 0, "the quick"), (1, 1, "quick quick"),
                   (1, 2, "quick fox")]
