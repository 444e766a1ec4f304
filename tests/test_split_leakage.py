"""Acoustic train/eval leakage: gain-modified near-dup copies crossing
an id-hash split. Pins the cross-split filter, the md5 router
determinism, and gain-robust recall of the fingerprint pairing."""

import hashlib

from mds_provider_spark.functions import audio
from mds_provider_spark.sources import fixtures as FX


def _split(cid: str, pct: int = 80) -> str:
    return ("train"
            if int(hashlib.md5(cid.encode()).hexdigest()[:4], 16) % 100 < pct
            else "eval")


def _slim(spark, rows):
    return spark.createDataFrame(
        rows, "clip_id string, bytes binary, codec string, sr_hz int")


def _mk(cid, tone, gain_db=0.0, sr=16000, dur=400):
    w = FX.ref_waveform(tone, sr, dur)
    if gain_db:
        w = audio.augment_wave(w, sr, cid, gain_db=gain_db)
    return (cid, bytearray(audio.encode_pcm_s16le(w)), "pcm_s16le", sr)


def test_cross_split_pairs_only_and_gain_recall(spark):
    # find id pairs that land on OPPOSITE sides of the 80/20 split and
    # a pair on the SAME side, then plant gain-modified audio copies
    ids = [f"clip-{i:03d}" for i in range(200)]
    train = [c for c in ids if _split(c) == "train"]
    eval_ = [c for c in ids if _split(c) == "eval"]
    a_tr, b_tr = train[0], train[1]
    a_ev = eval_[0]
    rows = [
        _mk(a_tr, "tone-leak"),             # train
        _mk(a_ev, "tone-leak", gain_db=-3.0),   # eval: -3 dB copy -> LEAK
        _mk(b_tr, "tone-leak", gain_db=-3.0),   # train: same-side copy
        _mk(train[2], "tone-other"),        # unrelated
    ]
    out = audio.split_leakage_pairs(_slim(spark, rows), train_pct=80)
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    # every reported pair crosses the split
    for r in out.collect():
        assert {r["split_a"], r["split_b"]} == {"train", "eval"}
    # the -3 dB cross-split copy IS found (gain-robust recall)
    assert (min(a_tr, a_ev), max(a_tr, a_ev)) in got
    # the same-side copy pair is NOT reported (it is a dedup finding,
    # not a leakage finding)
    assert (min(a_tr, b_tr), max(a_tr, b_tr)) not in got


def test_split_router_matches_oracle_arithmetic(spark):
    rows = [_mk(f"r-{i}", f"tone-{i}") for i in range(12)]
    out = audio.split_leakage_pairs(_slim(spark, rows), train_pct=80)
    # no near-dups among 12 distinct tones -> empty, but the router
    # itself must agree with the driver-side md5 arithmetic on any id
    assert out.count() == 0
    from pyspark.sql import functions as F

    df = _slim(spark, rows).select("clip_id").withColumn(
        "s",
        F.when(
            F.conv(F.substring(F.md5("clip_id"), 1, 4), 16, 10)
            .cast("long") % 100 < 80, "train").otherwise("eval"),
    )
    for r in df.collect():
        assert r["s"] == _split(r["clip_id"])
