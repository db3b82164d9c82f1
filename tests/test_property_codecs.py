"""Property-based codec checks (hypothesis): encode->decode identity and
bounded-output invariants that unit vectors can miss."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from lasutility_spark.gridlib.wav import (
    audio_stats,
    decimate_mean,
    wav_decode,
    wav_encode,
)

int16s = arrays(
    np.int16, st.integers(min_value=0, max_value=400), elements=st.integers(-32768, 32767)
)


@settings(max_examples=200, deadline=None)
@given(s=int16s, rate=st.integers(min_value=1, max_value=384000))
def test_wav_roundtrip_identity(s, rate):
    dec, r = wav_decode(wav_encode(s, rate))
    assert r == rate
    assert dec.dtype == np.int16
    assert np.array_equal(dec, s)


@settings(max_examples=200, deadline=None)
@given(s=int16s, factor=st.integers(min_value=1, max_value=16))
def test_decimate_mean_bounds_and_floor(s, factor):
    out = decimate_mean(s, factor)
    assert out.size == s.size // factor
    assert out.dtype == np.int16
    if out.size:
        blocks = s[: out.size * factor].astype(np.int64).reshape(-1, factor)
        # floor-mean stays within each block's [min, max] (so int16-safe)
        assert (out >= blocks.min(axis=1)).all()
        assert (out <= blocks.max(axis=1)).all()
        assert np.array_equal(out, blocks.sum(axis=1) // factor)


@settings(max_examples=200, deadline=None)
@given(s=int16s)
def test_audio_stats_invariants(s):
    st_ = audio_stats(s)
    assert st_["n_samples"] == s.size
    assert 0 <= st_["peak"] <= 32768
    assert st_["sumsq"] >= 0
    assert 0 <= st_["zero_crossings"] <= max(0, s.size - 1)
    # stats survive the container round trip (codec transparency)
    if s.size:
        dec, _ = wav_decode(wav_encode(s, 8000))
        assert audio_stats(dec) == st_
