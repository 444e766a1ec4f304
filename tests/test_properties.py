"""Property-based tests (hypothesis) over the engine's pure functions —
codecs, t-digest compression, versions, fixture determinism. The
reference has no property tests (SURVEY.md §5.1); these harden exactly
the numeric kernels the distributed paths delegate to. No Spark session
needed: fast."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from mds_provider_spark.functions import audio
from mds_provider_spark.functions.versions import Version
from mds_provider_spark.operators.drift import (
    _compress,
    _quantile_from_centroids,
)
from mds_provider_spark.sources import fixtures as FX

waves = st.integers(min_value=0, max_value=2**31 - 1).map(
    lambda seed: (
        0.8
        * np.sin(
            2 * np.pi
            * (50 + seed % 500)
            * np.arange(400 + seed % 2000) / 8000.0
        )
    ).astype(np.float32)
)


@settings(max_examples=30, deadline=None)
@given(waves, st.sampled_from(sorted(audio.ENCODERS)))
def test_codec_roundtrip_meets_snr_floor(wave, codec):
    dec = audio.decode(codec, audio.ENCODERS[codec](wave))
    assert dec.size == wave.size
    assert audio.snr_db(wave, dec) >= 30.0


@settings(max_examples=30, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False), min_size=1, max_size=3000))
def test_tdigest_quantiles_bounded_and_ordered(xs):
    v = np.asarray(xs, dtype=np.float64)
    m, w = _compress(v, np.ones_like(v), delta=100.0)
    assert w.sum() == pytest.approx(len(xs))          # weight conservation
    assert np.all(np.diff(m) >= 0)                    # centroid order
    qs = [_quantile_from_centroids(m, w, p) for p in (0.1, 0.5, 0.9)]
    assert all(v.min() - 1e-9 <= q <= v.max() + 1e-9 for q in qs)
    assert qs == sorted(qs)                           # quantile monotonicity


@settings(max_examples=50, deadline=None)
@given(st.lists(st.floats(min_value=-1e3, max_value=1e3,
                          allow_nan=False), min_size=50, max_size=500))
def test_tdigest_median_accuracy(xs):
    v = np.asarray(xs, dtype=np.float64)
    m, w = _compress(v, np.ones_like(v), delta=200.0)
    got = _quantile_from_centroids(m, w, 0.5)
    span = max(v.max() - v.min(), 1e-9)
    assert abs(got - np.quantile(v, 0.5)) <= 0.05 * span


@settings(max_examples=50, deadline=None)
@given(
    st.tuples(st.integers(0, 20), st.integers(0, 20), st.integers(0, 99)),
    st.tuples(st.integers(0, 20), st.integers(0, 20), st.integers(0, 99)),
)
def test_version_ordering_total_and_consistent(a, b):
    va = Version(".".join(map(str, a)))
    vb = Version(".".join(map(str, b)))
    assert (va < vb) == (a < b)
    assert (va == vb) == (a == b)
    assert str(Version(str(va))) == str(va)  # parse/print round-trip


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 10_000), st.integers(0, 2**31 - 1))
def test_fixture_rows_are_pure_functions(i, seed):
    assert FX.clip_id_at(seed, i) == FX.clip_id_at(seed, i)
    assert FX.transcript_at(seed, i) == FX.transcript_at(seed, i)
    cid = FX.clip_id_at(seed, i)
    w1 = FX.ref_waveform(cid, 8000, 100)
    w2 = FX.ref_waveform(cid, 8000, 100)
    assert np.array_equal(w1, w2)
    assert 0 <= FX.part_id_of(cid, 16) < 16


@settings(max_examples=30, deadline=None)
@given(waves)
def test_snr_identity_and_symmetric_degradation(wave):
    assert audio.snr_db(wave, wave) == float("inf")
    noisy = wave + 0.3 * np.ones_like(wave)
    assert audio.snr_db(wave, noisy) < audio.snr_db(wave, wave)
