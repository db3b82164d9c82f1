"""PNG/WKB/clip/phash codecs + deterministic datagen."""

import numpy as np
import pytest

from lasutility_spark import datagen
from lasutility_spark.datagen import (
    ensure_images_table,
    gen_tile_rows,
    parse_caption,
    sample_points_from_tile,
    terrain_z,
    tile_names,
)
from lasutility_spark.gridlib.bounds import RasterBounds
from lasutility_spark.gridlib.clip import clip_polyline, clip_ring
from lasutility_spark.gridlib.phash import hamming64, phash64
from lasutility_spark.gridlib.png import (
    dem_to_png16,
    png16_to_dem,
    png_decode,
    png_encode,
)
from lasutility_spark.gridlib.raster import crop, get_value
from lasutility_spark.gridlib.wkb import (
    decode,
    encode_linestring,
    encode_multipolygon,
    encode_polygon,
)


def test_png8_roundtrip():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (37, 53), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(img)), img)


def test_png16_roundtrip():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 65536, (64, 64), dtype=np.uint16)
    out = png_decode(png_encode(img))
    assert out.dtype == np.uint16
    assert np.array_equal(out, img)


def test_dem_png16_psnr():
    # quantized DEM round-trip must beat the 40 dB gate (BASELINE input_hint)
    rng = np.random.RandomState(2)
    dem = (200 + 50 * rng.rand(128, 128)).astype(np.float32)
    dem[0, 0] = np.nan
    back = png16_to_dem(dem_to_png16(dem, 0.0, 500.0), 0.0, 500.0)
    assert np.isnan(back[0, 0])
    ok = ~np.isnan(dem)
    mse = float(np.mean((back[ok] - dem[ok]) ** 2))
    peak = 500.0
    psnr = 10 * np.log10(peak**2 / max(mse, 1e-12))
    assert psnr >= 40, psnr


def test_wkb_roundtrip():
    xs = np.array([0.0, 10.0, 10.0, 0.0, 0.0])
    ys = np.array([0.0, 0.0, 10.0, 10.0, 0.0])
    hole = (xs * 0.2 + 4, ys * 0.2 + 4)
    g = decode(encode_polygon([(xs, ys), hole]))
    assert g.kind == "Polygon" and len(g.parts) == 2
    assert np.allclose(g.parts[0][0], xs)
    mp = decode(encode_multipolygon([[(xs, ys)], [(xs + 20, ys)]]))
    assert mp.kind == "MultiPolygon" and len(mp.polygons()) == 2
    ls = decode(encode_linestring(xs, ys))
    assert ls.kind == "LineString"
    assert ls.envelope() == (0.0, 0.0, 10.0, 10.0)


def test_clip_ring_and_polyline():
    xs = np.array([-5.0, 15.0, 15.0, -5.0])
    ys = np.array([2.0, 2.0, 8.0, 8.0])
    cx, cy = clip_ring(xs, ys, 0, 0, 10, 10)
    assert cx.min() >= 0 and cx.max() <= 10
    assert clip_ring(xs, ys, 100, 100, 110, 110) is None

    lx = np.array([-5.0, 5.0, 5.0, 20.0])
    ly = np.array([5.0, 5.0, 9.0, 9.0])
    parts = clip_polyline(lx, ly, 0, 0, 10, 10)
    allx = np.concatenate([p[0] for p in parts])
    assert allx.min() >= 0 and allx.max() <= 10


def test_phash_properties():
    rng = np.random.RandomState(3)
    img = rng.rand(100, 100)
    h1 = phash64(img)
    assert h1 == phash64(img)  # deterministic
    noisy = img + rng.rand(100, 100) * 0.01
    assert hamming64(h1, phash64(noisy)) <= 6  # near-dup stays close
    other = rng.rand(100, 100)
    assert hamming64(h1, phash64(other)) > 10


def test_raster_crop_and_lookup():
    b = RasterBounds(10, 10, 0, 0, 10, 10)
    r = np.zeros((10, 10), dtype=np.uint8)
    r[3, 4] = 99
    sub, nb = crop(r, b, 2, 2, 6, 6)
    assert sub.shape == (4, 4) and sub[1, 2] == 99
    assert nb.minx == 2 and nb.maxx == 6
    v = get_value(r, b, np.array([4.5, 0.5, 50.0]), np.array([3.5, 0.5, 50.0]))
    assert v[0] == 99 and np.isnan(v[1]) and np.isnan(v[2])


def test_datagen_deterministic_and_decodable(tmp_path):
    names = tile_names(4)
    df1 = gen_tile_rows(names, px=64)
    df2 = gen_tile_rows(names, px=64)
    assert (df1["phash"] == df2["phash"]).all()
    assert (df1["bytes"] == df2["bytes"]).all()  # bit-identical

    row = df1.iloc[0]
    name, minx, miny, maxx, maxy, cs, nodata = parse_caption(row["caption"])
    assert name == row["image_id"]
    assert maxx - minx == 1000 and cs == 1000 / 64
    dem = png16_to_dem(row["bytes"], 0.0, 500.0)
    assert dem.shape == (64, 64)
    # decoded pixels ~= terrain at cell centers (quantization error only)
    cols, rows_ = np.meshgrid(np.arange(64), np.arange(64))
    expect = terrain_z(minx + (cols + 0.5) * cs, miny + (rows_ + 0.5) * cs)
    assert np.abs(dem - expect).max() < 0.01

    x, y, z, cls = sample_points_from_tile(name, dem, minx, miny, cs)
    assert len(x) > 100
    assert set(np.unique(cls)) <= {2, 3, 4, 5}
    assert ((x >= minx) & (x < maxx)).all()


def test_ensure_images_table(tmp_path):
    out = ensure_images_table(0.001, base_dir=str(tmp_path))
    import pyarrow.parquet as pq

    t = pq.read_table(f"{out}/images.parquet")
    assert t.num_rows == 9
    assert t.column_names == [
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash", "minx", "miny",
    ]
    p = pq.read_table(f"{out}/polygons.parquet")
    assert p.num_rows >= 40
    g = decode(p.column("geom_wkb")[0].as_py())
    assert g.kind == "Polygon"


def test_png_rgb8_mirrored_sink():
    """S9 WriteAsPng analog: mirrored rows, value on all 3 channels
    (ByteRaster.cs:124-153)."""
    from lasutility_spark.gridlib.png import png_decode, png_encode_rgb8_mirrored

    r = np.zeros((4, 3), dtype=np.uint8)
    r[0, 0] = 7   # southwest corner -> image bottom-left
    r[3, 2] = 99  # northeast corner -> image top-right
    img = png_decode(png_encode_rgb8_mirrored(r))
    assert img.shape == (4, 3, 3)
    assert tuple(img[3, 0]) == (7, 7, 7)
    assert tuple(img[0, 2]) == (99, 99, 99)
    assert img.sum() == 3 * (7 + 99)


# --- GIF (LZW) codec: the real m3 video container ------------------------


def test_lzw_roundtrip_all_regimes():
    from lasutility_spark.gridlib.gif import lzw_decode, lzw_encode

    rng = np.random.RandomState(7)
    for n in [0, 1, 10, 255, 256, 258, 511, 512, 513, 5000, 300000]:
        b = rng.randint(0, 256, n).astype(np.uint8)
        assert np.array_equal(b, lzw_decode(lzw_encode(b))), n
    # highly compressible (deep dictionary chains)
    b = np.tile(np.arange(16, dtype=np.uint8), 5000)
    assert np.array_equal(b, lzw_decode(lzw_encode(b)))


def test_lzw_decode_spec_pinned_streams():
    """Handcrafted bit streams straight from the GIF89a spec — pins the
    decoder independently of our encoder (no matched-bug blind spot)."""
    from lasutility_spark.gridlib.gif import lzw_decode

    def pack(codes):
        acc = nb = 0
        out = bytearray()
        for c, s in codes:
            acc |= c << nb
            nb += s
            while nb >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nb -= 8
        if nb:
            out.append(acc & 0xFF)
        return bytes(out)

    # clear, literals, eoi
    got = lzw_decode(pack([(256, 9), (5, 9), (6, 9), (7, 9), (257, 9)]), 8)
    assert got.tolist() == [5, 6, 7]
    # dictionary reference: 258 == [1, 2]
    got = lzw_decode(pack([(256, 9), (1, 9), (2, 9), (258, 9), (257, 9)]), 8)
    assert got.tolist() == [1, 2, 1, 2]
    # the cScSc special case: code == next_code (259 built from its own
    # prefix) -> entry = prev + prev[0]
    got = lzw_decode(
        pack([(256, 9), (1, 9), (2, 9), (258, 9), (260, 9), (257, 9)]), 8
    )
    assert got.tolist() == [1, 2, 1, 2, 1, 2, 1]
    # mid-stream clear resets table and code width
    got = lzw_decode(
        pack([(256, 9), (1, 9), (2, 9), (256, 9), (3, 9), (257, 9)]), 8
    )
    assert got.tolist() == [1, 2, 3]


def test_gif_container_roundtrip():
    from lasutility_spark.gridlib.gif import gif_decode, gif_decode_gray, gif_encode

    rng = np.random.RandomState(11)
    frames = [rng.randint(0, 256, (40, 56)).astype(np.uint8) for _ in range(4)]
    frames.append(np.zeros((40, 56), np.uint8))
    data = gif_encode(frames, delay_cs=4)
    assert data[:6] == b"GIF89a" and data[-1:] == b"\x3b"
    dec = gif_decode_gray(data)
    assert len(dec) == 5
    for a, b in zip(frames, dec):
        assert np.array_equal(a, b)
    _, pal = gif_decode(data)
    assert pal.shape == (256, 3) and np.array_equal(pal[:, 0], np.arange(256))


def test_video_fixture_oracle_independence():
    """The video_frames oracle rows come from the SOURCE planes; decoding
    the written GIF must reproduce them exactly (container proof, not
    plumbing)."""
    from lasutility_spark.gridlib.gif import gif_decode_gray
    from lasutility_spark.gridlib.phash import phash64

    names = datagen.tile_names(2)
    vids, stats = datagen.gen_video_tables(names)
    for _, v in vids.iterrows():
        frames = gif_decode_gray(bytes(v["bytes"]))
        assert len(frames) == v["n_frames"]
        sub = stats[stats["media_id"] == v["media_id"]]
        for k, fr in enumerate(frames):
            row = sub[sub["frame_idx"] == k].iloc[0]
            assert int(fr.astype(np.int64).sum()) == row["px_sum"]
            assert int((fr != 0).sum()) == row["px_nonzero"]
            assert phash64(fr) == row["phash"]


def test_wav_roundtrip_chunk_walk_and_errors():
    """RIFF/WAVE codec: exact PCM16 round trip; the decoder must walk
    chunk lists (unknown chunks skipped with odd-size pad alignment,
    fmt/data in either order) and name the offending field on bad input."""
    import struct

    import pytest

    from lasutility_spark.gridlib.wav import wav_decode, wav_encode

    s = np.concatenate(
        [
            np.arange(-500, 500, dtype=np.int16),
            np.array([-32768, 32767, 0, -1, 1], dtype=np.int16),
        ]
    )
    buf = wav_encode(s, 8000)
    dec, rate = wav_decode(buf)
    assert rate == 8000 and dec.dtype == np.int16 and np.array_equal(dec, s)

    # hand-build a spec-valid variant: LIST chunk with an ODD size (pad
    # byte), then data BEFORE fmt — a conforming decoder must accept it
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    data = s.astype("<i2").tobytes()
    body = (
        b"WAVE"
        + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
        + b"data" + struct.pack("<I", len(data)) + data
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    )
    weird = b"RIFF" + struct.pack("<I", len(body)) + body
    dec2, rate2 = wav_decode(weird)
    assert rate2 == 8000 and np.array_equal(dec2, s)

    with pytest.raises(ValueError, match="RIFF"):
        wav_decode(b"JUNK" + buf[4:])
    with pytest.raises(ValueError, match="channels"):
        stereo = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
        bad = (
            b"WAVE" + b"fmt " + struct.pack("<I", 16) + stereo
            + b"data" + struct.pack("<I", 4) + b"\x00" * 4
        )
        wav_decode(b"RIFF" + struct.pack("<I", len(bad)) + bad)
    with pytest.raises(ValueError, match="16-bit"):
        eight = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        bad = (
            b"WAVE" + b"fmt " + struct.pack("<I", 16) + eight
            + b"data" + struct.pack("<I", 4) + b"\x00" * 4
        )
        wav_decode(b"RIFF" + struct.pack("<I", len(bad)) + bad)
    with pytest.raises(ValueError, match="truncated|past end"):
        wav_decode(buf[:-10])
    with pytest.raises(ValueError, match="int16"):
        wav_encode(s.astype(np.float64))


def test_wav_decimate_and_stats_formulas():
    """Integer block-mean decimation (numpy floor semantics, negatives
    included) and the shared clip-stats formula on known vectors."""
    from lasutility_spark.gridlib.wav import audio_stats, decimate_mean

    s = np.array([-7, -7, -7, -7, 3, 3, 3, 4, 9], dtype=np.int16)
    out = decimate_mean(s, 4)
    # (-28)//4 = -7 ; 13//4 = 3 (floor); trailing remainder dropped
    assert np.array_equal(out, np.array([-7, 3], dtype=np.int16))

    st = audio_stats(np.array([1, -1, 2, 0, -3], dtype=np.int16))
    # crossings: 1->-1, -1->2, 2->0 is not (0 counts as >=0), 0->-3
    assert st == {
        "n_samples": 5, "peak": 3, "sumsq": 1 + 1 + 4 + 0 + 9,
        "zero_crossings": 3,
    }
    assert audio_stats(np.array([], dtype=np.int16))["peak"] == 0


def test_datagen_audio_oracle_independent_of_codec():
    """The audio side-table stats come from the SOURCE samples; decoding
    the emitted WAV bytes must reproduce them exactly (m3 pattern)."""
    from lasutility_spark import datagen
    from lasutility_spark.gridlib.wav import audio_stats, decimate_mean, wav_decode

    names = datagen.tile_names(2)
    clips, stats, rstats = datagen.gen_audio_tables(names)
    assert len(clips) == len(stats) == len(rstats) == 2
    for i in range(2):
        samples, rate = wav_decode(bytes(clips["bytes"][i]))
        assert rate == datagen.AUDIO_RATE
        got = audio_stats(samples)
        row = stats.iloc[i]
        assert got["n_samples"] == row["n_samples"] == 128 * 128
        assert got["peak"] == row["peak"]
        assert got["sumsq"] == row["sumsq"]
        assert got["zero_crossings"] == row["zero_crossings"]
        # clips must actually differ and actually oscillate
        assert row["zero_crossings"] > 0
        rrow = rstats.iloc[i]
        rgot = audio_stats(decimate_mean(samples, datagen.AUDIO_DECIMATE))
        assert rgot["sumsq"] == rrow["sumsq"]
        assert rrow["sample_rate"] == datagen.AUDIO_RATE // datagen.AUDIO_DECIMATE
    assert stats["sumsq"][0] != stats["sumsq"][1]
