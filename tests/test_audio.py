"""Audio codec round-trips, SNR math, and the Arrow-batched PCM check."""

import numpy as np
import pytest

from mds_provider_spark.functions import audio
from mds_provider_spark.sources import fixtures as FX


@pytest.mark.parametrize("codec", ["pcm_s16le", "wav", "flac", "opus", "mp3"])
def test_codec_roundtrip_snr(codec):
    wave = FX.ref_waveform("test-clip", 16000, 200)
    enc = audio.ENCODERS[codec](wave)
    dec = audio.decode(codec, enc)
    assert dec.size == wave.size
    got = audio.snr_db(wave, dec)
    # lossless paths are bit-ish exact (>90 dB), lossy stand-ins >=30 dB
    assert got >= 35.0, (codec, got)


def test_snr_detects_corruption():
    wave = FX.ref_waveform("x", 8000, 100)
    noisy = wave + 0.5 * np.random.default_rng(0).standard_normal(wave.size).astype("f4")
    enc = audio.encode_pcm_s16le(noisy)
    dec = audio.decode_pcm_s16le(enc)
    assert audio.snr_db(wave, dec) < 10.0


def test_unknown_codec_raises():
    with pytest.raises(NotImplementedError):
        audio.decode("amr", b"\x00\x01")


def test_pcm_violations_finds_only_bad_rows(spark):
    faults = {5: "bad_pcm"}
    clips = FX.generate_clips(spark, 40, n_parts=4, seed=7, faults=faults)
    v = audio.pcm_violations(clips, FX.ref_waveform).collect()
    assert len(v) == 1
    assert v[0].rule_id == "bad_pcm:bytes"
    assert v[0].clip_id == FX.clip_id_at(7, 5)
    assert "SNR" in v[0].message


def test_pcm_check_owns_null_bytes_and_skips_unknown_codec(spark):
    clips = FX.generate_clips(
        spark, 30, n_parts=4, seed=7, faults={3: "null_bytes", 4: "bad_codec"}
    )
    v = audio.pcm_violations(clips, FX.ref_waveform).collect()
    # null bytes reported HERE (the only stage that scans the binary col);
    # unknown codec is the enum rule's finding -> skipped here
    assert [(r.rule_id, r.clip_id) for r in v] == [
        ("missing_field:bytes", FX.clip_id_at(7, 3))
    ]


def test_audio_features(spark):
    clips = FX.generate_clips(spark, 20, n_parts=4, seed=11)
    feats = audio.audio_features(clips).collect()
    assert len(feats) == 20
    for r in feats:
        assert r.n_samples > 0
        assert 0.1 < r.rms < 0.6
        assert r.zero_crossings > 0


def test_batch_snr_path_equals_row_path(spark):
    """Vectorized (grouped matrix) SNR checking must emit the IDENTICAL
    violation set as the scalar path, faults included."""
    from mds_provider_spark.sources import fixtures as FX

    n = 400
    # short durations so some (sr,dur) groups fall under _BATCH_MAX_SAMPLES
    # (matrix path) while others stay scalar — both paths exercised
    clips = FX.generate_clips(spark, n, n_parts=4, seed=42,
                              faults=FX.default_fault_plan(n),
                              sr_choices=[8000], dur_choices=[10, 20, 60]).cache()
    row = sorted(
        (r.rule_id, r.clip_id) for r in
        audio.pcm_violations(clips, FX.ref_waveform).collect()
    )
    batch = sorted(
        (r.rule_id, r.clip_id) for r in
        audio.pcm_violations(clips, FX.ref_waveform,
                             ref_wave_batch_fn=FX.ref_waveform_batch).collect()
    )
    assert row == batch and len(row) >= 2  # bad_pcm + null_bytes present
    clips.unpersist()


def test_ref_waveform_batch_bit_identical(spark):
    from mds_provider_spark.sources import fixtures as FX

    ids = [FX.clip_id_at(7, i) for i in range(5)]
    batch = FX.ref_waveform_batch(ids, 8000, 120)
    for i, cid in enumerate(ids):
        assert np.array_equal(batch[i], FX.ref_waveform(cid, 8000, 120))
