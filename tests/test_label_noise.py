"""Label-noise screen: near-identical audio whose transcripts disagree.

The operator composes the acoustic-fingerprint near-dup pairer with a
pure-Catalyst normalized token-set Jaccard over the transcript column —
the screen a 10^12-row clip+transcript table needs to catch mislabeled
duplicate uploads (same recording, different caption)."""

import numpy as np

from mds_provider_spark.functions import audio
from mds_provider_spark.sources import fixtures as FX


def _clip_rows(spark, rows):
    ddl = ("clip_id string, bytes binary, sr_hz int, dur_ms int, "
           "codec string, transcript string, part_id int")
    return spark.createDataFrame(rows, ddl)


def _mk(cid, txt, tone_id="tone-a", dur=400):
    w = FX.ref_waveform(tone_id, 16000, dur)
    return (cid, bytearray(audio.encode_pcm_s16le(w)), 16000, dur,
            "pcm_s16le", txt, 0)


def test_label_noise_flags_same_audio_different_transcript(spark):
    rows = [
        _mk("a1", "the quick brown fox"),
        _mk("a2", "totally different caption words"),   # same audio as a1
        _mk("a3", "the quick brown fox"),               # same audio + text
        _mk("b1", "unrelated clip", tone_id="tone-b"),  # different audio
    ]
    out = audio.label_noise_pairs(_clip_rows(spark, rows)).collect()
    got = {(r.id_a, r.id_b) for r in out}
    # a1/a2 and a2/a3 disagree on text over identical audio
    assert ("a1", "a2") in got
    assert ("a2", "a3") in got
    # identical audio AND identical transcript is NOT label noise
    assert ("a1", "a3") not in got
    # different audio never pairs
    assert not any("b1" in p for p in got)
    for r in out:
        assert r.rule_id == "label_noise:transcript"
        assert r.bits_differ == 0  # byte-identical plants
        assert 0.0 <= r.token_jaccard <= 0.5


def test_label_noise_jaccard_matches_python_set_math(spark):
    ta = "alpha beta gamma delta"
    tb = "alpha beta zz1 zz2 zz3 zz4"
    rows = [_mk("x1", ta), _mk("x2", tb)]
    out = audio.label_noise_pairs(
        _clip_rows(spark, rows), jaccard_max=0.9
    ).collect()
    assert len(out) == 1
    sa, sb = set(ta.split()), set(tb.split())
    expect = round(len(sa & sb) / len(sa | sb), 6)
    assert out[0].token_jaccard == expect


def test_label_noise_normalization_collapses_case_and_whitespace(spark):
    rows = [
        _mk("n1", "The  QUICK   brown fox "),
        _mk("n2", "the quick brown fox"),  # same token set after norm
    ]
    out = audio.label_noise_pairs(_clip_rows(spark, rows)).collect()
    assert out == []  # jaccard 1.0 -> not noise


def test_label_noise_null_transcript_rows_drop_out(spark):
    rows = [_mk("m1", "hello world"), _mk("m2", None)]
    out = audio.label_noise_pairs(_clip_rows(spark, rows)).collect()
    assert out == []


def test_filterbank_cache_identical_to_fresh_construction():
    fb = audio._mel_filterbank(16000, 17, 256)
    assert fb is audio._mel_filterbank(16000, 17, 256)  # cached
    # reconstruct by hand with the same formulation
    n_bins = 256 // 2 + 1
    mel_pts = audio._mel_inv(
        np.linspace(0.0, float(audio._mel(16000 / 2.0)), 17 + 2))
    bin_hz = np.fft.rfftfreq(256, d=1.0 / 16000.0)
    ref = np.zeros((17, n_bins))
    for m in range(17):
        lo, ctr, hi = mel_pts[m], mel_pts[m + 1], mel_pts[m + 2]
        up = (bin_hz - lo) / (ctr - lo) if ctr > lo else np.zeros(n_bins)
        down = (hi - bin_hz) / (hi - ctr) if hi > ctr else np.zeros(n_bins)
        ref[m] = np.clip(np.minimum(up, down), 0.0, None)
    assert np.array_equal(fb, ref)
    assert not fb.flags.writeable


def test_fingerprint_still_gain_invariant_after_kernel_change():
    w = FX.ref_waveform("gain-check", 16000, 500)
    fp = audio.fingerprint_of(w, 16000)
    assert fp.size > 0
    # power-of-two gain scales every float op exactly
    assert np.array_equal(fp, audio.fingerprint_of(w * 4.0, 16000))
