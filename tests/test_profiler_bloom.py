"""Profile-to-rules suggestion engine + bloom-prefilter referential."""
import pytest
from pyspark.sql import functions as F

from mds_provider_spark.operators import profiler as PR


def _src(spark):
    return spark.range(200).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).cast("double").alias("num"),
        F.concat(F.lit("t"), (F.col("id") % 3).cast("string")).alias("cat"),
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.concat(F.lit("u"), F.col("id").cast("string")))
        .alias("sparse"),
        F.lit(0).alias("part_id"),
    )


def test_suggest_rules_kinds(spark):
    df = _src(spark)
    rows = {(r.rule_kind, r.column_name): r
            for r in PR.suggest_rules(df, ["k", "num", "cat", "sparse"]).collect()}
    assert ("required", "k") in rows and ("range", "k") in rows
    r = rows[("range", "num")]
    assert r.lo == 0.0 and r.hi == 4.0
    e = rows[("enum", "cat")]
    assert e.enum_vals == "t0,t1,t2" and e.n_distinct == 3
    s = rows[("null_rate", "sparse")]
    assert s.null_rate == 0.1
    # high-cardinality string: no enum suggestion
    assert ("enum", "sparse") not in rows and ("required", "sparse") not in rows


def test_suggest_rules_roundtrip_zero_violations(spark):
    """Rules suggested FROM a table must produce ZERO violations ON it."""
    df = _src(spark)
    sugg = PR.suggest_rules(df, ["k", "num", "cat"])
    rs = PR.to_ruleset(sugg, key_col="k", part_col="part_id")
    assert rs.violations(df).count() == 0


def test_suggest_rules_enforces_on_drifted_data(spark):
    """...and must FIRE on data that breaks the inferred envelope."""
    df = _src(spark)
    rs = PR.to_ruleset(
        PR.suggest_rules(df, ["num", "cat"]), key_col="k", part_col="part_id"
    )
    bad = spark.range(5).select(
        F.col("id").alias("k"),
        F.lit(99.0).alias("num"),          # outside [0, 4]
        F.lit("zz").alias("cat"),          # outside the enum
        F.lit(0).alias("part_id"),
    )
    kinds = {r.rule_id.split(":")[0] for r in rs.violations(bad).collect()}
    assert kinds == {"out_of_range", "bad_enum"}


def test_suggest_rules_approx_mode(spark):
    df = _src(spark)
    got = PR.suggest_rules(df, ["cat"], exact_distinct=False).collect()
    assert any(r.rule_kind == "enum" for r in got)  # HLL of 3 <= 20 gate


# ------------------------------------------- bloom referential screen

from mds_provider_spark.operators import referential as REF


def _parent(spark, n=3000):
    return spark.range(n).select((F.col("id") * 7 + 1).alias("pk"))


def test_bloom_soundness_no_false_flags(spark):
    """Every child key present in the parent must PASS the bloom —
    a Bloom filter has no false negatives, so a clean child yields
    zero definite orphans."""
    p = _parent(spark)
    bloom = REF.bloom_build(p, "pk")
    child = p.select(F.col("pk").alias("k"))
    assert REF.bloom_definite_orphans(child, bloom, "k").count() == 0


def test_bloom_recall_on_planted_orphans(spark):
    p = _parent(spark)
    bloom = REF.bloom_build(p, "pk", words=4096)
    # orphans: keys congruent 3 mod 7 never appear in the parent
    child = spark.range(2000).select((F.col("id") * 7 + 3).alias("k"))
    got = REF.bloom_definite_orphans(child, bloom, "k", words=4096)
    n = got.count()
    assert n >= 0.95 * 2000, n          # fp ~1.2% at this sizing
    # soundness: nothing flagged is actually present
    assert got.join(p, got["k"] == p["pk"], "inner").count() == 0


def test_bloom_empty_parent_flags_everything(spark):
    p = _parent(spark).where(F.lit(False))
    bloom = REF.bloom_build(p, "pk")
    child = spark.range(50).select(F.col("id").alias("k"))
    assert REF.bloom_definite_orphans(child, bloom, "k").count() == 50


def test_bloom_null_child_keys_excluded(spark):
    p = _parent(spark)
    bloom = REF.bloom_build(p, "pk")
    child = spark.range(100).select(
        F.when(F.col("id") % 2 == 0, None).otherwise(F.lit(999999999)).alias("k")
    )
    # only the 50 non-null unseen keys are orphan-flagged
    assert REF.bloom_definite_orphans(child, bloom, "k").count() == 50


def test_bloom_probe_plan_no_data_shuffle(spark):
    """The probe path must be scan + two BROADCAST joins — no
    hash-partitioned exchange of the child anywhere (that is the whole
    point vs the exact anti-join)."""
    p = _parent(spark)
    bloom = REF.bloom_build(p, "pk")
    child = spark.range(1000).select(F.col("id").alias("k"))
    plan = REF.bloom_definite_orphans(child, bloom, "k")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 2, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_suite_save_load_roundtrip(spark, tmp_path):
    """profile -> to_config -> save_config JSON -> load_config builds a
    RuleSet that enforces identically to the in-memory to_ruleset path
    (same rule_ids, zero violations on the profiled table, identical
    violations on drifted data)."""
    import json

    from mds_provider_spark import rules as R

    df = _src(spark)
    sugg = PR.suggest_rules(df, ["k", "num", "cat"])
    spec = PR.to_config(sugg)
    path = str(tmp_path / "suite.json")
    R.save_config(spec, path, key_col="k", part_col="part_id")

    doc = json.loads(open(path).read())
    assert doc["version"] == 1 and doc["key_col"] == "k"

    loaded = R.load_config(path)
    direct = PR.to_ruleset(sugg, key_col="k", part_col="part_id")
    assert loaded.violations(df).count() == 0

    drifted = spark.createDataFrame(
        [(999, 42.0, "t9", 0)], "k long, num double, cat string, part_id int"
    )
    got = sorted(
        (r.clip_id, r.rule_id) for r in loaded.violations(drifted).collect()
    )
    want = sorted(
        (r.clip_id, r.rule_id) for r in direct.violations(drifted).collect()
    )
    assert got == want and len(got) > 0


def test_save_config_rejects_bad_kind(tmp_path):
    from mds_provider_spark import rules as R

    with pytest.raises(ValueError, match="unknown rule kind"):
        R.save_config(
            [{"kind": "no_such_rule", "column": "x"}],
            str(tmp_path / "bad.json"), key_col="k",
        )
    assert not (tmp_path / "bad.json").exists()


def test_load_config_rejects_unknown_version(tmp_path):
    import json

    from mds_provider_spark import rules as R

    p = tmp_path / "v9.json"
    p.write_text(json.dumps({"version": 9, "key_col": "k",
                             "part_col": "p", "rules": []}))
    with pytest.raises(ValueError, match="unsupported rule-suite version"):
        R.load_config(str(p))


def test_suggest_rules_robust_range_resists_outlier(spark):
    # 999 values in [0, 100] plus one 10^9 glitch: the plain range
    # suggestion swallows the glitch forever; the robust one does not
    rows = [(i, float(i % 101), 0) for i in range(999)] + [(999, 1e9, 0)]
    df = spark.createDataFrame(rows, "k long, num double, part_id int")
    sugg = PR.suggest_rules(df, ["num"], robust_k=10.0)
    kinds = {r.rule_kind: r for r in sugg.where(
        sugg.column_name == "num").collect()}
    assert kinds["range"].hi == 1e9                 # corrupted by design
    rr = kinds["robust_range"]
    assert rr.hi < 1000.0 and rr.lo > -1000.0       # glitch-proof bounds
    assert rr.lo < 0 < 50 < rr.hi                   # still covers the mass
    # robust_range maps to an enforceable in_range and catches the glitch
    rs = PR.to_ruleset(
        sugg.where(sugg.rule_kind == "robust_range"),
        key_col="k", part_col="part_id",
    )
    bad = {r.clip_id for r in rs.violations(df).collect()}
    assert "999" in {str(b) for b in bad}


def test_suggest_rules_robust_absent_by_default(spark):
    df = spark.createDataFrame([(1, 2.0)], "k long, num double")
    kinds = {r.rule_kind for r in PR.suggest_rules(df, ["num"]).collect()}
    assert "robust_range" not in kinds
