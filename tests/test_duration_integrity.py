"""Payload-vs-metadata duration audit: decoded sample count vs the
DECLARED (dur_ms, sr_hz). Pins the planted-drift detection, the exact
integer tolerance boundary, and the layered skip contract."""

import numpy as np

from mds_provider_spark.functions import audio
from mds_provider_spark.sources import fixtures as FX


def _row(cid, dur_declared_ms, dur_actual_ms, sr=16000, codec="pcm_s16le",
         buf=b"unset"):
    w = FX.ref_waveform(cid, sr, dur_actual_ms)
    b = bytearray(audio.encode_pcm_s16le(w)) if buf == b"unset" else buf
    return (cid, b, sr, dur_declared_ms, codec, "t", 0)


def _clips(spark, rows):
    ddl = ("clip_id string, bytes binary, sr_hz int, dur_ms int, "
           "codec string, transcript string, part_id int")
    return spark.createDataFrame(rows, ddl)


def test_flags_drift_and_exact_tolerance_boundary(spark):
    rows = [
        _row("ok", 400, 400),          # consistent -> pass
        _row("short", 440, 400),       # 40 ms over-declared -> flagged
        _row("long", 360, 400),        # 40 ms under-declared -> flagged
        # |n*1000 - dur*sr| == 10*sr exactly: strict > means NOT flagged
        _row("edge", 410, 400),
        _row("edge2", 411, 400),       # 11 ms -> flagged
    ]
    out = audio.duration_violations(_clips(spark, rows), tol_ms=10)
    got = {r["clip_id"]: r for r in out.collect()}
    assert set(got) == {"short", "long", "edge2"}
    assert got["short"]["n_samples"] == 6400
    assert got["short"]["expected_samples"] == 7040
    assert all(r["rule_id"] == "inconsistent:duration" for r in got.values())


def test_layered_skips(spark):
    rows = [
        _row("zero-dur", 0, 100),            # dur<=0: range rule's finding
        _row("neg-sr", 100, 100, sr=-1),     # sr<=0: range rule's finding
        _row("null-bytes", 100, 100, buf=None),   # decode stage skips
        _row("bad-codec", 100, 100, codec="xyz"),  # decode stage skips
        _row("caught", 200, 100),            # the real finding survives
    ]
    out = audio.duration_violations(_clips(spark, rows), tol_ms=10)
    assert [r["clip_id"] for r in out.collect()] == ["caught"]
