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


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=2, max_value=120),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    chunk=st.integers(min_value=2, max_value=50),
)
def test_laz14_roundtrip_property(n, seed, chunk):
    """POINT14 layered codec: encode->decode identity over randomized
    coordinates, classes, gps times, scanner channels, intensities,
    scan angles, point sources and user data, at arbitrary chunk sizes
    (multi-chunk whenever chunk < n)."""
    import numpy as np

    from lasutility_spark.gridlib import laz14

    rng = np.random.RandomState(seed)
    x = 385000 + rng.rand(n) * 1000
    y = 6672000 + rng.rand(n) * 1000
    z = rng.rand(n) * 500
    cls = rng.randint(0, 256, n).astype(np.uint8)
    gps = rng.rand(n) * 1e6
    chan = rng.randint(0, 4, n).astype(np.uint8)
    inten = rng.randint(0, 65536, n).astype(np.uint16)
    angle = rng.randint(-30000, 30000, n).astype(np.int16)
    psid = rng.randint(0, 65536, n).astype(np.uint16)
    user = rng.randint(0, 256, n).astype(np.uint8)
    blob = laz14.write_laz14(
        x, y, z, cls, gps_time=gps, channel=chan, chunk_size=chunk,
        intensity=inten, scan_angle=angle, point_source=psid,
        user_data=user,
    )
    h, x2, y2, z2, c2 = laz14.read_laz14(blob)
    sx = h["scale"][0]
    assert np.allclose(x2, x, atol=sx) and np.allclose(y2, y, atol=sx)
    assert np.allclose(z2, z, atol=sx)
    assert np.array_equal(c2, cls)
    assert np.array_equal(h["_gps_time"], gps)
    assert np.array_equal(h["_channel"], chan)
    assert np.array_equal(h["_intensity"], inten)
    assert np.array_equal(h["_scan_angle"], angle)
    assert np.array_equal(h["_point_source"], psid)
    assert np.array_equal(h["_user_data"], user)
