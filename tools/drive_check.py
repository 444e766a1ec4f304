"""End-to-end drive script for the packaged engine — the /verify
recipe's executable form. Run from OUTSIDE the repo so `import
mds_provider_spark` resolves through --py-files (the packaging
contract under test), e.g.:

    zip -qr /tmp/engine.zip mds_provider_spark
    cd /tmp && spark-submit --py-files /tmp/engine.zip \
        /root/repo/tools/drive_check.py 2>/dev/null | tail -3

Prints DRIVE-OK-15..45, one per leg (any assertion failure aborts the
run): legs 1-14's assertions were superseded when the script was
rebuilt mid-round-5 — their surfaces are covered inside later legs and
pytest — and the numbering is kept for cross-session continuity. Add
new legs at the end, never renumber. Leg inventory:
.claude/skills/verify/SKILL.md.
"""
import shutil, tempfile, os
from pyspark.sql import SparkSession, functions as F
from mds_provider_spark.sources.fixtures import generate_clips, default_fault_plan
from mds_provider_spark import rules as R
from mds_provider_spark.operators import drift as DR
from mds_provider_spark.streaming import stream as STR

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "16").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
clips = generate_clips(spark, 2000, seed=42, faults=default_fault_plan(2000))
rs = R.mds_clip_rules()
rs.violations(clips).groupBy("rule_id").count().orderBy("rule_id").show(30, False)

# round-5c: marker-borne streaming histogram PSI, end-to-end via the zip
tmp = tempfile.mkdtemp()
src, out, ckpt = os.path.join(tmp, "src"), os.path.join(tmp, "out"), os.path.join(tmp, "ckpt")
os.makedirs(src)
ddl = "clip_id string, dur_ms int, part_id int"
base = spark.createDataFrame([(f"b{i}", i % 100, 0) for i in range(400)], ddl)
base.coalesce(1).write.parquet(os.path.join(src, "f_a"))
st = spark.readStream.schema(ddl).parquet(os.path.join(src, "f_*"))
rs2 = R.RuleSet().add(R.in_range("dur_ms", lo=0))
STR.validate_stream_committed(st, rs2, out, ckpt,
                              hist_bins={"dur_ms": (0.0, 100.0)}).awaitTermination(120)
spark.createDataFrame([(f"s{i}", (5 if i % 2 else 95), 0) for i in range(400)], ddl) \
    .coalesce(1).write.parquet(os.path.join(src, "f_b"))
st2 = spark.readStream.schema(ddl).parquet(os.path.join(src, "f_*"))
STR.validate_stream_committed(st2, rs2, out, ckpt,
                              hist_bins={"dur_ms": (0.0, 100.0)}).awaitTermination(120)
hd = STR.committed_stream_histogram_drift(spark, out, base)
hd.show(5, False)
got = [(r.batch_id, r.verdict) for r in hd.collect()]
assert got == [(0, "ok"), (1, "drift")], got
shutil.rmtree(tmp)
print("DRIVE-OK-15")

# round-5d: changepoint over an hourly rollup, via the zip
import datetime as dt
from mds_provider_spark.operators import sessions as SES
rows = []
for h in range(12):
    n = 10 if h < 6 else 50
    rows += [(dt.datetime(2024, 1, 1, h, 1), "a")] * n
ev = spark.createDataFrame(rows, "ts timestamp, event_type string")
cp = SES.changepoint_mean_shift(
    SES.time_rollup(ev, keys=("event_type",)), ["event_type"], "n_rows")
r = cp.collect()
assert len(r) == 1 and r[0].split_after.hour == 5 and r[0].shift == 40.0, r
print("DRIVE-OK-16")

# round-5e: structural integrity trio via the zip
from mds_provider_spark.operators import integrity as ING
seq = spark.createDataFrame(
    [("a", 1), ("a", 2), ("a", 2), ("a", 5), ("b", 1), ("b", 2)],
    "k string, pos int")
r = {x.k: x for x in ING.sequence_integrity(seq, ["k"], "pos").collect()}
assert set(r) == {"a"} and r["a"].n_missing == 2 and r["a"].n_dup_positions == 1
iv = spark.createDataFrame(
    [("u", 0, 10), ("u", 5, 12), ("u", 20, 25)], "k string, s long, e long")
x = ING.interval_integrity(iv, ["k"], "s", "e").collect()[0]
assert (x.n_overlaps, x.n_gaps, x.covered_s) == (1, 1, 17.0), x
samp = ING.sample_per_group(
    spark.range(1000).select(
        (F.col("id") % 4).cast("string").alias("g"),
        F.md5(F.col("id").cast("string")).alias("h"),
        F.col("id")),
    ["g"], ["h", "id"], k=3)
assert samp.count() == 12
print("DRIVE-OK-17")

# round-5f: category drift + Wilson rates via the zip
from mds_provider_spark.operators import drift as DR2
from mds_provider_spark import rules as R2
b = spark.createDataFrame([("a",)] * 50 + [("gone",)] * 5, "c string")
c = spark.createDataFrame([("a",)] * 50 + [("fresh",)] * 5, "c string")
cd = {r.category: r.status for r in DR2.category_drift(c, b, "c").collect()}
assert cd == {"fresh": "new", "gone": "vanished"}, cd
vr = R2.violation_rates(
    spark.createDataFrame([("r1",)] * 7, "rule_id string"), n_rows=100
).collect()[0]
assert vr.rate == 0.07 and 0.0 < vr.ci_low < 0.07 < vr.ci_high < 1.0, vr
print("DRIVE-OK-18")

# round-5g: quarantine gate (emit_clean) via the zip
import tempfile as _tf
from mds_provider_spark.plans.runner import ValidationRun
_out = _tf.mkdtemp()
_run = ValidationRun(spark, out_dir=_out, ref_wave_fn=None, n_parts=8,
                     group_size=4, emit_clean=True)
_clips2 = generate_clips(spark, 500, n_parts=8, seed=7,
                         faults=default_fault_plan(500))
_s = _run.run(_clips2)
_cl = _run.clean()
_bad = {r.clip_id for r in _run.violations().select("clip_id").collect()
        if r.clip_id is not None}
_got = {r.clip_id for r in _cl.select("clip_id").collect()}
assert _got and not (_got & _bad)
assert _cl.count() + len(_bad) <= 500  # nulls quarantined too
shutil.rmtree(_out)
print("DRIVE-OK-19")

# round-5h: MAD robust outliers via the zip (z-masking case)
rows = []
for h, n in enumerate([10, 12, 9, 11, 10, 13, 2000]):
    rows += [(dt.datetime(2024, 1, 1, h, 1), "a")] * n
ev2 = spark.createDataFrame(rows, "ts timestamp, event_type string")
roll2 = SES.time_rollup(ev2, keys=("event_type",))
assert SES.anomalous_buckets(roll2, ["event_type"], "n_rows").count() == 0
rb = SES.robust_anomalous_buckets(roll2, ["event_type"], "n_rows").collect()
assert len(rb) == 1 and rb[0].n_rows == 2000 and rb[0].mad == 1, rb
print("DRIVE-OK-20")

# round-5i: schema contract gate via the zip
from mds_provider_spark.operators.diff import schema_drift, enforce_schema
_exp = spark.createDataFrame([], "clip_id string, dur_ms int")
_act = spark.createDataFrame([], "clip_id string, dur_ms bigint")
assert [f["status"] for f in schema_drift(_act, _exp)] == ["type_changed"]
try:
    enforce_schema(_act, _exp); raise SystemExit("gate did not raise")
except ValueError:
    pass
print("DRIVE-OK-21")

# round-5j: domain-weighted mix via the zip
from mds_provider_spark.operators import text as TX2
_mixdf = spark.createDataFrame([(i, "en" if i % 2 else "zh") for i in range(400)],
                               "doc_id long, lang string")
_m = TX2.mix_sample(_mixdf, "lang", {"en": 1.0, "zh": 0.0}, id_col="doc_id")
assert _m.count() == 200 and {r.lang for r in _m.collect()} == {"en"}
print("DRIVE-OK-22")

# round-5k: completeness gaps + partition health via the zip
from mds_provider_spark.operators import stats as ST2
rows = [(dt.datetime(2024, 1, 1, h, 1), "a") for h in (0, 1, 4)]
r3 = SES.time_rollup(spark.createDataFrame(rows, "ts timestamp, event_type string"),
                     keys=("event_type",))
mb = sorted(r.bucket_start.hour for r in
            SES.missing_buckets(r3, ["event_type"]).collect())
assert mb == [2, 3], mb
ph_rows = [(p, None if (p == 1 and i % 4 == 0) else 1.0)
           for p in range(3) for i in range(40)]
ph = ST2.partition_health(
    spark.createDataFrame(ph_rows, "part_id int, value double"),
    "part_id", ["value"], ratio_threshold=2.0).collect()
assert len(ph) == 1 and ph[0].part == 1 and ph[0].n_null == 10, ph
print("DRIVE-OK-23")

# round-5l: monotonicity audit via the zip
mono = spark.createDataFrame(
    [("a", 1, 10), ("a", 2, 5), ("b", 1, 1), ("b", 2, 2)],
    "k string, ord int, val int")
mv = ING.monotonicity_violations(mono, ["k"], "ord", "val").collect()
assert len(mv) == 1 and mv[0].k == "a" and mv[0].n_inversions == 1, mv
print("DRIVE-OK-24")

# round-5m: segment tiling audit on the real segmentation path
from mds_provider_spark.functions import audio as AU
_c3 = generate_clips(spark, 100, n_parts=4, seed=9)
_segs = (AU.segment_clips(_c3, segment_ms=50).where(F.col("clip_id").isNotNull())
         .join(_c3.select("clip_id", "sr_hz").dropDuplicates(["clip_id"]), "clip_id")
         .where(F.col("sr_hz") != 22050))  # 50 ms is not an integer sample count at 22.05k
_audit = ING.interval_integrity(
    _segs.select("clip_id", F.col("start_ms").cast("long").alias("s"),
                 (F.col("start_ms") + 50).cast("long").alias("e")),
    ["clip_id"], "s", "e")
_bad = _audit.where((F.col("n_gaps") > 0) | (F.col("n_overlaps") > 0)
                    | (F.col("n_invalid") > 0)).count()
assert _bad == 0, _bad   # un-tampered segmentation tiles perfectly
print("DRIVE-OK-25")

# round-5n: runner schema gate via the zip
_run2 = ValidationRun(spark, out_dir=_tf.mkdtemp(), ref_wave_fn=None,
                      n_parts=8, group_size=8, expected_schema=_clips2)
try:
    _run2.run(_clips2.withColumn("dur_ms", F.col("dur_ms").cast("long")))
    raise SystemExit("schema gate did not raise")
except ValueError:
    pass
print("DRIVE-OK-26")

# round-5o: keyed parquet upsert via the zip
from mds_provider_spark.plans.upsert import upsert_parquet
_tp = os.path.join(_tf.mkdtemp(), "t")
spark.createDataFrame([(k, f"v{k}", k % 2) for k in range(20)],
                      "k long, v string, part_id int") \
    .repartition("part_id").write.partitionBy("part_id").parquet(_tp)
_res = upsert_parquet(
    spark, _tp,
    spark.createDataFrame([(0, "NEW", 0), (99, "INS", 1)],
                          "k long, v string, part_id int"), ["k"])
assert _res["upserted"] == 2 and _res["parts"] == [0, 1], _res
_g = {r.k: r.v for r in spark.read.parquet(_tp).collect()}
assert len(_g) == 21 and _g[0] == "NEW" and _g[99] == "INS" and _g[1] == "v1"
print("DRIVE-OK-27")

# round-5p: robust range suggestion via the zip
from mds_provider_spark.operators import profiler as PR2
_pdf = spark.createDataFrame(
    [(i, float(i % 50), 0) for i in range(500)] + [(500, 1e9, 0)],
    "k long, num double, part_id int")
_sg = {r.rule_kind: r for r in PR2.suggest_rules(_pdf, ["num"], robust_k=10.0)
       .where(F.col("column_name") == "num").collect()}
assert _sg["range"].hi == 1e9 and _sg["robust_range"].hi < 1000.0
print("DRIVE-OK-28")

# round-5q: facade round-5 surfaces via the zip
from mds_provider_spark.api import Validator
_vdf = spark.createDataFrame([(f"c{i}", -1 if i < 5 else 10, 0) for i in range(100)],
                             "clip_id string, dur_ms int, part_id int")
_v = Validator(ruleset=R.RuleSet(key_col="clip_id", part_col="part_id")
               .add(R.in_range("dur_ms", lo=0, lo_inclusive=False)))
_res = _v.validate(_vdf)
assert _res.rates(100).collect()[0].n_violations == 5
assert _res.examples(k=2).count() == 2
_vp = Validator.from_profile(_vdf.where(F.col("dur_ms") > 0),
                             key_col="clip_id", columns=["dur_ms"])
assert _vp.validate(_vdf.where(F.col("dur_ms") > 0)).is_valid()
print("DRIVE-OK-29")

# round-5r: acoustic fingerprint near-dup via the zip
from mds_provider_spark.functions import audio as AUD
import numpy as _np
_w = (0.4 * _np.sin(2 * _np.pi * (300 * _np.arange(6400) / 16000
      + 900 * (_np.arange(6400) / 16000) ** 2))).astype(_np.float32)
_rows = [("a-orig", bytearray(AUD.encode_pcm_s16le(_w)), 16000, 400, "pcm_s16le"),
         ("b-gain", bytearray(AUD.encode_pcm_s16le(0.6 * _w)), 16000, 400, "pcm_s16le"),
         ("c-other", bytearray(AUD.encode_pcm_s16le(
             _np.sin(2 * _np.pi * 777 * _np.arange(6400) / 16000)
             .astype(_np.float32))), 16000, 400, "pcm_s16le")]
_cdf = spark.createDataFrame(
    _rows, "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string")
_fp = AUD.fingerprint_clips(_cdf)
assert _fp.count() == 3
_prs = {(r.id_a, r.id_b) for r in AUD.fingerprint_near_dup(_fp).collect()}
assert ("a-orig", "b-gain") in _prs and ("a-orig", "c-other") not in _prs, _prs
print("DRIVE-OK-30")

# round-5s: duration integrity + split leakage + keep-one materialize via the zip
_w2 = (0.4 * _np.sin(2 * _np.pi * (250 * _np.arange(6400) / 16000
       + 700 * (_np.arange(6400) / 16000) ** 2))).astype(_np.float32)
_rows2 = [
    ("d-ok",    bytearray(AUD.encode_pcm_s16le(_w2)), 16000, 400, "pcm_s16le", "t", 0),
    ("d-drift", bytearray(AUD.encode_pcm_s16le(_w2)), 16000, 440, "pcm_s16le", "t", 0),
    ("d-copy",  bytearray(AUD.encode_pcm_s16le(_w2)), 16000, 400, "pcm_s16le", "t", 0),
]
_cdf2 = spark.createDataFrame(
    _rows2, "clip_id string, bytes binary, sr_hz int, dur_ms int, "
            "codec string, transcript string, part_id int")
_dv = {r.clip_id for r in AUD.duration_violations(_cdf2, tol_ms=10).collect()}
assert _dv == {"d-drift"}, _dv
print("DRIVE-OK-31")

from mds_provider_spark.operators import dedup as DD
_fp2 = AUD.fingerprint_clips(_cdf2)
_pr2 = AUD.fingerprint_near_dup(_fp2).select("id_a", "id_b")
_kept = sorted(r.clip_id for r in
               DD.deduplicate(_cdf2.select("clip_id"), _pr2, "clip_id").collect())
# all three rows share byte-identical audio -> ONE group; the
# min-id exemplar is d-copy and the other two are dropped
assert _kept == ["d-copy"], _kept
print("DRIVE-OK-32")

_lk = AUD.split_leakage_pairs(
    _cdf2.select("clip_id", "bytes", "codec", "sr_hz"), train_pct=80)
for _r in _lk.collect():
    assert {_r.split_a, _r.split_b} == {"train", "eval"}
print("DRIVE-OK-33")

# round-6a: bridge-graph star contraction (strengthened star-forest
# termination test) via the zip
_pairs6 = spark.createDataFrame(
    [(1, 3), (3, 4), (4, 5), (2, 5)], "id_a long, id_b long")
_g6 = {r.doc_id: r.group_id
       for r in DD.resolve_duplicate_groups(_pairs6).collect()}
assert _g6 == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}, _g6
print("DRIVE-OK-34")

# round-6b: two-fold partition fingerprint catches even-multiplicity swap
from mds_provider_spark.operators import incremental as INC6
_b6 = spark.createDataFrame(
    [(0, 1, "a"), (0, 1, "a"), (0, 2, "b"), (0, 2, "b")],
    "part int, k long, v string")
_c6 = spark.createDataFrame([(0, 1, "a")] * 4, "part int, k long, v string")
_d6 = INC6.partition_delta(
    INC6.partition_fingerprints(_c6, "part", ["k", "v"]),
    INC6.partition_fingerprints(_b6, "part", ["k", "v"])).collect()
assert _d6[0].status == "changed", _d6
print("DRIVE-OK-35")

# round-6c: stage-and-swap upsert — crash state (bak present, final
# gone) repaired, retry converges, no _upsert_* residue
import os as _os6, shutil as _sh6, tempfile as _tmp6
from mds_provider_spark.plans.upsert import upsert_parquet as _ups6
_t6 = _tmp6.mkdtemp()
_tp6 = _os6.path.join(_t6, "tbl")
spark.createDataFrame([(k, f"v{k}", k % 2) for k in range(20)],
                      "k long, v string, part_id int") \
    .repartition("part_id").write.partitionBy("part_id").parquet(_tp6)
_os6.rename(_os6.path.join(_tp6, "part_id=0"),
            _os6.path.join(_tp6, "_upsert_bak__part_id=0"))
_u6 = spark.createDataFrame([(0, "NEW", 0)], "k long, v string, part_id int")
_r6 = _ups6(spark, _tp6, _u6, ["k"])
assert _r6["parts"] == [0] and _r6["existing_kept"] == 9, _r6
_g6b = {r.k: r.v for r in spark.read.parquet(_tp6).collect()}
assert len(_g6b) == 20 and _g6b[0] == "NEW" and _g6b[2] == "v2", _g6b
assert not any(d.startswith("_upsert") for d in _os6.listdir(_tp6))
_sh6.rmtree(_t6)
print("DRIVE-OK-36")

# round-6d: frequent_items — distributed candidate cutoff, same result
from mds_provider_spark.operators import stats as ST6
_hh6 = spark.createDataFrame(
    [("hot",)] * 400 + [(f"v{i}",) for i in range(300)], "k string"
).repartition(8)
_got6 = {r.value: r.cnt
         for r in ST6.frequent_items(_hh6, "k", threshold_frac=0.3,
                                     mg_capacity=64).collect()}
assert _got6 == {"hot": 400}, _got6
print("DRIVE-OK-37")

# round-6e: IVF+PQ full-probe/full-shortlist == brute force, via the zip
from mds_provider_spark.operators import similarity as SIM6
import numpy as _np6
_rng6 = _np6.random.default_rng(5)
_base6 = _rng6.standard_normal((60, 8)).astype("float32")
_e6 = spark.createDataFrame(
    [(int(i), [float(x) for x in _base6[i]]) for i in range(60)],
    "vec_id long, embedding array<float>")
_q6b = _e6.where("vec_id < 3")
_ex6 = sorted((r.query_id, r.rank, r.neighbor_id, r.cosine_sim)
              for r in SIM6.brute_force_topk(_e6, _q6b, k=3).collect())
_pq6 = sorted((r.query_id, r.rank, r.neighbor_id, r.cosine_sim)
              for r in SIM6.ivfpq_topk(_e6, _q6b, k=3, n_lists=4, nprobe=4,
                                       m=4, ksub=16, shortlist=10**6).collect())
assert _pq6 == _ex6
print("DRIVE-OK-38")

# round-6f: tokenizer-faithful packing via the zip
from mds_provider_spark.operators import text as TX6
_pdf6 = spark.createDataFrame(
    [(i, "same text", 10 * (1 + i % 3)) for i in range(30)],
    "doc_id long, text string, n_ext long")
_pk6 = TX6.pack_token_budget(_pdf6, "doc_id", "text", budget=35,
                             n_packers=2, token_count_col="n_ext").collect()
assert {r.n_tokens for r in _pk6} == {10, 20, 30}
print("DRIVE-OK-39")

# round-6g: marker-borne streaming heavy hitters via the zip
_t7 = _tmp6.mkdtemp()
_src7, _out7, _ck7 = [_os6.path.join(_t7, d) for d in ("src", "out", "ck")]
_os6.makedirs(_src7)
_ddl7 = "clip_id string, codec string, part_id int"
spark.createDataFrame(
    [(f"x{i}", "opus" if i % 4 == 0 else f"c{i}", 0) for i in range(200)],
    _ddl7).coalesce(1).write.parquet(_os6.path.join(_src7, "f_a"))
_st7 = spark.readStream.schema(_ddl7).parquet(_os6.path.join(_src7, "f_*"))
import mds_provider_spark.rules as R7
STR.validate_stream_committed(
    _st7, R7.RuleSet().add(R7.not_null("codec")), _out7, _ck7,
    hh_col="codec", hh_capacity=16).awaitTermination(120)
_hh7 = STR.committed_stream_heavy_hitters(spark, _out7, 0.2).collect()
assert [(r.batch_id, r.value, r.verdict) for r in _hh7
        if r.verdict == "hot"] == [(0, "opus", "hot")], _hh7
_sh6.rmtree(_t7)
print("DRIVE-OK-40")

# round-6h: persisted PQ index build/search/append via the zip
_t8 = _tmp6.mkdtemp()
_idx8 = _os6.path.join(_t8, "pqidx")
_old8 = _e6.where("vec_id < 50")
_new8 = _e6.where("vec_id >= 50")
SIM6.build_pq_index(_old8, _idx8, n_lists=4, m=4, ksub=16)
_ap8 = SIM6.append_pq_index(_new8, _idx8)
assert _ap8["n_vectors_total"] == 60 and _ap8["n_appended"] == 10
_c8 = SIM6.load_ivf_index(spark, _idx8 + "/centroids")
_b8 = SIM6.load_pq_index(spark, _idx8 + "/codebooks")
_one8 = sorted(map(tuple, SIM6.ivfpq_topk(
    _e6, _q6b, k=3, nprobe=4, m=4, shortlist=10**6,
    centroids=_c8, codebooks=_b8).collect()))
_srch8 = sorted(map(tuple, SIM6.pq_search(
    spark, _idx8, _q6b, _e6, k=3, nprobe=4, shortlist=10**6).collect()))
assert _srch8 == _one8
_sh6.rmtree(_t8)
print("DRIVE-OK-41")

# round-6i: leak-proof group split routing via the zip
_gs9 = spark.createDataFrame(
    [(i, "dup text %d" % (i % 7)) for i in range(100)],
    "doc_id long, text string")
_out9 = TX6.group_split_assign(_gs9, "doc_id", "text")
assert _out9.groupBy(TX6.fingerprint("text")).agg(
    F.count_distinct("split").alias("ns")).where("ns > 1").count() == 0
print("DRIVE-OK-42")

# round-6j: embedding-space drift via the zip
from mds_provider_spark.operators import drift as DR6
_ed = spark.createDataFrame(
    [(i, "g", [1.0, 0.0, 0.0]) for i in range(20)],
    "vec_id long, grp string, embedding array<float>")
_ec = spark.createDataFrame(
    [(i, "g", [0.0, 2.0, 0.0]) for i in range(20)],
    "vec_id long, grp string, embedding array<float>")
_er = DR6.embedding_drift(_ec, _ed, group_col="grp", dim=3).collect()[0]
assert _er.centroid_cosine == 0.0 and abs(_er.mean_norm_cur - 2.0) < 1e-4
print("DRIVE-OK-43")

# round-6k: marker-borne streaming embedding drift via the zip
_t9 = _tmp6.mkdtemp()
_src9, _out9b, _ck9 = [_os6.path.join(_t9, d) for d in ("src", "out", "ck")]
_os6.makedirs(_src9)
_ddl9 = "clip_id string, grp string, embedding array<float>, part_id int"
spark.createDataFrame(
    [(f"a{i}", "g", [1.0, 0.0, 0.0], 0) for i in range(10)],
    _ddl9).coalesce(1).write.parquet(_os6.path.join(_src9, "f_a"))
_st9 = spark.readStream.schema(_ddl9).option("maxFilesPerTrigger", "1") \
    .parquet(_os6.path.join(_src9, "f_*"))
STR.validate_stream_committed(
    _st9, R7.RuleSet().add(R7.not_null("grp")), _out9b, _ck9,
    emb_col="embedding", emb_group_col="grp", emb_dim=3).awaitTermination(120)
spark.createDataFrame(
    [(f"b{i}", "g", [0.0, 2.0, 0.0], 0) for i in range(10)],
    _ddl9).coalesce(1).write.parquet(_os6.path.join(_src9, "f_b"))
_st9b = spark.readStream.schema(_ddl9).option("maxFilesPerTrigger", "1") \
    .parquet(_os6.path.join(_src9, "f_*"))
STR.validate_stream_committed(
    _st9b, R7.RuleSet().add(R7.not_null("grp")), _out9b, _ck9,
    emb_col="embedding", emb_group_col="grp", emb_dim=3).awaitTermination(120)
_ed9 = STR.committed_stream_embedding_drift(spark, _out9b).collect()
assert [(r.batch_id, r.group_value, r.centroid_cosine)
        for r in _ed9] == [(1, "g", 0.0)], _ed9
_sh6.rmtree(_t9)
print("DRIVE-OK-44")

# round-6l: cross-modal acoustic embedding -> embedding drift via the zip
from mds_provider_spark.sources import fixtures as FX6
_cl10 = FX6.generate_clips(spark, 120, n_parts=4, seed=42)
_em10 = AU.audio_embedding_clips(_cl10)
_dr10 = DR6.embedding_drift(
    _em10.where("codec = 'pcm_s16le'").repartition(4), _em10,
    group_col="codec", dim=8).collect()
assert [r.group_value for r in _dr10] == ["pcm_s16le"]
assert _dr10[0].centroid_cosine > 0.99
print("DRIVE-OK-45")
