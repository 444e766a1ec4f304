"""End-to-end audio dedup materialization: fingerprint LSH pairs ->
connected components -> keep-one. The pair detector alone doesn't shrink
a corpus; this pins that the composed chain drops exactly the
non-exemplar members of every acoustic near-dup group."""

import numpy as np

from mds_provider_spark.functions import audio
from mds_provider_spark.operators import dedup as D
from mds_provider_spark.sources import fixtures as FX


def _clip_rows(spark, rows):
    ddl = ("clip_id string, bytes binary, sr_hz int, dur_ms int, "
           "codec string, transcript string, part_id int")
    return spark.createDataFrame(rows, ddl)


def _mk(cid, tone_id, dur=400):
    w = FX.ref_waveform(tone_id, 16000, dur)
    return (cid, bytearray(audio.encode_pcm_s16le(w)), 16000, dur,
            "pcm_s16le", f"transcript of {cid}", 0)


def test_keep_one_drops_copies_keeps_exemplar_and_uniques(spark):
    rows = [
        _mk("a1", "tone-a"),
        _mk("a2", "tone-a"),   # byte-identical to a1 -> same group
        _mk("a3", "tone-a"),   # third member of the group
        _mk("b1", "tone-b"),   # unique: survives untouched
        _mk("c1", "tone-c"),
        _mk("c2", "tone-c"),   # pair group {c1, c2}
    ]
    clips = _clip_rows(spark, rows)
    fps = audio.fingerprint_clips(clips)
    pairs = audio.fingerprint_near_dup(fps, band_frames=4).select(
        "id_a", "id_b")
    kept = D.deduplicate(clips.select("clip_id"), pairs, "clip_id")
    assert sorted(r["clip_id"] for r in kept.collect()) == [
        "a1", "b1", "c1"]


def test_chain_collapses_to_one_exemplar(spark):
    # a~b and b~c but never (a, c) directly: components must still
    # collapse the chain to the single min-id exemplar
    w = FX.ref_waveform("tone-x", 16000, 400)
    noisy = w + 0.002 * np.sin(
        2 * np.pi * 3000 * np.arange(w.size) / 16000).astype(np.float32)
    rows = [
        ("x1", bytearray(audio.encode_pcm_s16le(w)), 16000, 400,
         "pcm_s16le", "t", 0),
        ("x2", bytearray(audio.encode_pcm_s16le(w)), 16000, 400,
         "pcm_s16le", "t", 0),
        ("x3", bytearray(audio.encode_pcm_s16le(noisy)), 16000, 400,
         "pcm_s16le", "t", 0),
    ]
    clips = _clip_rows(spark, rows)
    fps = audio.fingerprint_clips(clips)
    pairs = audio.fingerprint_near_dup(fps, band_frames=4).select(
        "id_a", "id_b")
    # regardless of which pairs the LSH emitted, x1/x2 are identical;
    # if x3 also joined the group, the exemplar is still x1
    kept = sorted(r["clip_id"] for r in D.deduplicate(
        clips.select("clip_id"), pairs, "clip_id").collect())
    assert "x1" in kept and "x2" not in kept
