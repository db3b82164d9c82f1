"""Real file-format IO: LAS reader/writer + shapefile reader, including
byte parity of the full reference fixture rasterization
(RasteriserEvenOdd.Tests.cs AddShapefileAndSave -> terraintype.asp)."""

import os
import struct

import numpy as np
import pandas as pd
import pytest

from lasutility_spark.engine import pip_stage
from lasutility_spark.gridlib import asc, topodb
from lasutility_spark.gridlib.las import read_las, read_las_file, write_las
from lasutility_spark.gridlib.shp import read_dbf_column, read_shapefile
from lasutility_spark.gridlib import wkb
from lasutility_spark.gridlib.tilenamer import cell_id as cid, tile_decode

FIXTURE_DIR = (
    "/root/reference/LasUtility.Tests/TestFiles/RasteriserEvenOdd/"
    "AddShapefileAndSave/Input"
)
needs_fixture = pytest.mark.skipif(
    not os.path.isdir(FIXTURE_DIR), reason="reference fixtures not present"
)


def test_las_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    n = 10_000
    x = 380000 + rng.random(n) * 3000
    y = 6666000 + rng.random(n) * 3000
    z = rng.random(n) * 300
    cls = rng.integers(0, 16, n).astype(np.uint8)
    data = write_las(x, y, z, cls)
    h, rx, ry, rz, rcls = read_las(data)
    assert h["version"] == (1, 2)
    assert h["point_count"] == n == h["legacy_count"]
    # scale 0.001 => round-trip within half an LSB
    assert np.abs(rx - x).max() < 5.1e-4
    assert np.abs(ry - y).max() < 5.1e-4
    assert np.abs(rz - z).max() < 5.1e-4
    assert (rcls == cls).all()
    # header extent matches the data (ILasFileReader Min/Max surface)
    assert h["minx"] == pytest.approx(x.min())
    assert h["maxy"] == pytest.approx(y.max())
    p = tmp_path / "pts.las"
    p.write_bytes(data)
    h2, fx, _, _, _ = read_las_file(str(p))
    assert h2 == h and (fx == rx).all()


def test_las_count_is_max_of_legacy_and_extended():
    """LAS 1.4 files with zeroed legacy counts must still stream every
    point: count = max(legacy, extended) (LasZipNetReader.cs:73)."""
    n = 57
    core = write_las(
        np.arange(n) + 0.5, np.arange(n) + 1.5, np.arange(n) * 0.25,
        np.full(n, 2, np.uint8),
    )
    h12 = read_las(core)[0]
    points = core[h12["offset_to_points"]:]
    hdr = bytearray(375)
    hdr[: h12["header_size"]] = core[: h12["header_size"]]
    hdr[25] = 4  # version 1.4
    struct.pack_into("<HI", hdr, 94, 375, 375)
    struct.pack_into("<I", hdr, 107, 0)  # legacy count zeroed
    struct.pack_into("<Q", hdr, 247, n)  # extended 64-bit count
    h, x, _, _, _ = read_las(bytes(hdr) + points)
    assert h["legacy_count"] == 0 and h["extended_count"] == n
    assert h["point_count"] == n and len(x) == n
    assert x[0] == pytest.approx(0.5, abs=1e-3)


def test_las_spark_scan_matches_numpy(spark, tmp_path):
    from lasutility_spark.engine.sources import read_las_points

    rng = np.random.default_rng(3)
    paths = []
    want_n = 0
    for i in range(3):
        n = 1000 + 17 * i
        data = write_las(
            380000 + rng.random(n) * 1000, 6666000 + rng.random(n) * 1000,
            rng.random(n) * 100, np.full(n, 2 + i % 3, np.uint8),
        )
        p = tmp_path / f"f{i}.las"
        p.write_bytes(data)
        paths.append(str(p))
        want_n += n
    df = read_las_points(spark, paths)
    assert df.count() == want_n
    got_cls = {r["cls"] for r in df.select("cls").distinct().collect()}
    assert got_cls == {2, 3, 4}


@needs_fixture
def test_shapefile_fixture_scan():
    p = read_shapefile(os.path.join(FIXTURE_DIR, "m_L4133L_p.shp"))
    v = read_shapefile(os.path.join(FIXTURE_DIR, "m_L4133L_v.shp"))
    assert len(p) == 2044 and len(v) == 5052  # reference fixture counts
    assert p["seq"].tolist() == list(range(2044))  # strict file order
    kinds = {wkb.decode(bytes(g)).kind for g in p["geom_wkb"]}
    assert kinds <= {"Polygon", "MultiPolygon"}
    # some fixture polygons are holed — the V6 two-pass path is exercised
    assert any(
        len(wkb.decode(bytes(g)).parts) > 1
        for g in p["geom_wkb"]
        if wkb.decode(bytes(g)).kind == "Polygon"
    )
    luokka = read_dbf_column(os.path.join(FIXTURE_DIR, "m_L4133L_p.dbf"), "LUOKKA")
    assert p["luokka"].tolist() == [int(x) for x in luokka]


@needs_fixture
def test_shapefile_rasterize_matches_reference_output():
    """The strongest parity gate: engine kernel over the REAL fixture
    shapefiles reproduces the reference's committed terraintype.asp
    bit-for-bit (all 144M cells of the 12000^2 L4133L raster)."""
    p = read_shapefile(os.path.join(FIXTURE_DIR, "m_L4133L_p.shp"))
    v = read_shapefile(os.path.join(FIXTURE_DIR, "m_L4133L_v.shp"))
    v = v.assign(seq=v["seq"] + len(p))  # files sorted: polygons first
    allf = pd.concat([p, v])
    feats = [
        (int(s), int(l), bytes(g))
        for s, l, g in zip(allf["seq"], allf["luokka"], allf["geom_wkb"])
    ]
    classmap = {
        **topodb.WATER_POLYGON, **topodb.WATER_LINE, **topodb.SWAMP_POLYGON,
        **topodb.FIELD_POLYGON, **topodb.ROCK_POLYGON, **topodb.SAND_POLYGON,
    }  # RasteriserEvenOdd.Tests.cs:66-71
    minx, miny, _, _ = tile_decode("L4133L")
    cell = int(cid(np.array([minx]), np.array([miny]), 12000)[0])
    out = pip_stage._rasterize_tile(cell, 12000, 12000, feats, classmap)

    from lasutility_spark.gridlib.png import png_decode

    mine = png_decode(bytes(out["bytes"]))
    with open(os.path.join(FIXTURE_DIR, "terraintype.asp")) as f:
        ref, bounds = asc.ascii_to_byte_raster(f.read(), compressed=True)
    assert bounds.rows == 12000 and bounds.cols == 12000
    assert mine.shape == ref.shape
    assert (mine == ref).all()  # bit-for-bit, 144M cells


# --- LAZ: full LASzip decompression of the reference's own fixture -------

LAZ_FIXTURE = (
    "/root/reference/LasUtility.Tests/TestFiles/Triangulation/"
    "AddPointCloudAndTriangulate/Input/Q5232E1_cropped.laz"
)


def test_read_laz_reference_fixture():
    """Decode the reference's compressed fixture end to end: point count
    = header count (LasZipNetReader.cs:73 max(legacy, extended)), decoded
    coordinate extrema EXACTLY equal the header bbox
    (LasZipNetReader.cs:54-61 exposes header min/max), and the per-return
    histogram equals the header's by-return counts — a full-stream
    consistency proof (any arithmetic-coder desync destroys all three)."""
    import struct

    from lasutility_spark.gridlib.laz import read_laz_file

    h, x, y, z, cls = read_laz_file(LAZ_FIXTURE)
    assert len(x) == 1481 == h["point_count"]
    assert (x.min(), x.max()) == (h["minx"], h["maxx"])
    assert (y.min(), y.max()) == (h["miny"], h["maxy"])
    assert abs(z.min() - h["minz"]) < 5e-3 and abs(z.max() - h["maxz"]) < 5e-3
    with open(LAZ_FIXTURE, "rb") as f:
        raw = f.read()
    by_return = struct.unpack_from("<5I", raw, 111)
    import collections

    got = collections.Counter(h["_returns"].tolist())
    assert [got.get(r, 0) for r in (1, 2, 3, 4, 5)] == list(by_return)
    # LAS classes: ground + vegetation only in this tile
    assert set(np.unique(cls)) <= {2, 3, 4, 5}


def test_las_reader_rejects_laz():
    from lasutility_spark.gridlib.las import read_las

    with open(LAZ_FIXTURE, "rb") as f:
        raw = f.read()
    with pytest.raises(ValueError, match="laz"):
        read_las(raw)


def test_laz_to_tin_pipeline_a(spark, tmp_path):
    """Pipeline A end to end FROM THE REAL FIXTURE: .laz -> distributed
    point source -> Delaunay TIN -> DEM raster tile (the reference's
    AddPointCloudAndTriangulate shape, Triangulation.Tests.cs:15-52)."""
    from lasutility_spark.engine import tin_stage
    from lasutility_spark.engine.sources import read_las_points

    pts = read_las_points(spark, [LAZ_FIXTURE])
    assert pts.count() == 1481
    tiles = tin_stage.rasterize_tin_tiles(pts, px=64, size_north=1000).collect()
    assert len(tiles) == 1  # the cropped fixture covers one 1 km cell
    t = tiles[0]
    assert t["n_points"] == 1481
    assert t["n_triangles"] > 0
    assert t["filled_cells"] > 0


def test_write_laz_roundtrip_multichunk():
    """LAZ encoder round trip across 3 chunks (raw first point + model
    reset per chunk, explicit chunk-size table, decoder lookahead padded
    in-chunk): quantized coords exact, classes exact, gps times exact."""
    from lasutility_spark.gridlib import laz

    rng = np.random.RandomState(3)
    n = 120_000  # 3 chunks at the 50k default
    x = 380000 + rng.rand(n) * 3000
    y = 6666000 + rng.rand(n) * 3000
    z = 100 + rng.rand(n) * 80
    cls = rng.choice([2, 3, 4, 5], n).astype(np.uint8)
    gps = np.sort(rng.rand(n) * 3600) + 300000.0
    data = laz.write_laz(x, y, z, cls, gps_time=gps)
    assert len(data) < n * 28  # actually compresses
    h, rx, ry, rz, rcls = laz.read_laz(data)
    assert len(rx) == n == h["point_count"]
    assert np.allclose(rx, x, atol=0.0051)
    assert np.allclose(ry, y, atol=0.0051)
    assert np.allclose(rz, z, atol=0.0051)
    assert np.array_equal(rcls, cls)
    assert np.array_equal(h["_gps_time"], gps)


def test_write_laz_format0_and_gps_extremes():
    from lasutility_spark.gridlib import laz

    rng = np.random.RandomState(5)
    n = 300
    x = 380000 + rng.rand(n) * 500
    y = 6666000 + rng.rand(n) * 500
    z = rng.rand(n) * 10
    cls = rng.choice([2, 5], n).astype(np.uint8)
    d0 = laz.write_laz(x, y, z, cls)  # point format 0, no gps
    _h, a, b, c, cc = laz.read_laz(d0)
    assert np.allclose(a, x, atol=0.0051) and np.array_equal(cc, cls)
    # gps sequences exercising every GPSTIME11 path: constant runs
    # (0diff), regular deltas (multi), and huge jumps (full retakes)
    g = np.concatenate([np.full(100, 5.0), np.arange(100) * 1e9,
                        np.full(100, 5.0)])
    d1 = laz.write_laz(x, y, z, cls, gps_time=g)
    h1, *_ = laz.read_laz(d1)
    assert np.array_equal(h1["_gps_time"], g)


def test_write_laz_rgb_roundtrip_multichunk():
    """Point formats 2/3 (RGB12 v2 item): multi-chunk round trip with
    color sequences exercising every symbol path — unchanged runs, gray
    (r==g==b, bit-6 clear), low/high-byte-only deltas, and full 16-bit
    jumps.  The reference accepts these through the native laszip
    library (LAS/LasZipNetReader.cs:63-89)."""
    from lasutility_spark.gridlib import laz

    rng = np.random.RandomState(11)
    n = 4_000
    x = 380000 + rng.rand(n) * 800
    y = 6666000 + rng.rand(n) * 800
    z = 100 + rng.rand(n) * 40
    cls = rng.choice([2, 3, 4], n).astype(np.uint8)
    rgb = np.empty((n, 3), np.uint16)
    rgb[0::4] = rng.randint(0, 1 << 16, (len(rgb[0::4]), 3))  # full jumps
    gray = rng.randint(0, 1 << 16, len(rgb[1::4]))
    rgb[1::4] = np.stack([gray] * 3, axis=1)  # r==g==b, bit-6 clear
    rgb[2::4] = rgb[1::4]  # unchanged run (sym == 0)
    lowonly = rng.randint(0, 256, (len(rgb[3::4]), 3))
    rgb[3::4] = (rgb[2::4][: len(rgb[3::4])] & 0xFF00) | lowonly  # low bytes
    # format 2 (no gps), 4 chunks
    d2 = laz.write_laz(x, y, z, cls, chunk_size=1_000, rgb=rgb)
    h2, rx, ry, rz, rcls = laz.read_laz(d2)
    assert h2["point_format"] & 0x7F == 2
    assert np.allclose(rx, x, atol=0.0051) and np.array_equal(rcls, cls)
    assert np.array_equal(h2["_rgb"], rgb)
    # format 3 (gps + rgb, items interleave point/gps/rgb per point)
    gps = np.sort(rng.rand(n)) * 100.0
    d3 = laz.write_laz(x, y, z, cls, gps_time=gps, chunk_size=1_000, rgb=rgb)
    h3, *_ = laz.read_laz(d3)
    assert h3["point_format"] & 0x7F == 3
    assert np.array_equal(h3["_rgb"], rgb)
    assert np.array_equal(h3["_gps_time"], gps)


def test_laz_chunked_source_reads_rgb_file(spark, tmp_path):
    """read_laz_points_chunked over a format-2 multi-chunk file: the
    chunk plan accepts the RGB12 item and per-chunk decode stays exact."""
    from lasutility_spark.gridlib import laz
    from lasutility_spark.engine.sources import read_laz_points_chunked

    rng = np.random.RandomState(13)
    n = 3_000
    x = 380000 + rng.rand(n) * 400
    y = 6666000 + rng.rand(n) * 400
    z = rng.rand(n) * 20
    cls = rng.choice([2, 5], n).astype(np.uint8)
    rgb = rng.randint(0, 1 << 16, (n, 3)).astype(np.uint16)
    p = tmp_path / "rgb.laz"
    p.write_bytes(laz.write_laz(x, y, z, cls, chunk_size=1_000, rgb=rgb))
    header, _vlr, chunks = laz.laz_chunk_plan(p.read_bytes())
    assert len(chunks) == 3
    df = read_laz_points_chunked(spark, str(p))
    assert df.count() == n
    # compare against the sequential decoder's exact reconstruction;
    # sort BOTH frames on all row columns (raw-vs-quantized x collides
    # ~100x in 3000 pts at 0.01 scale, so a coordinate-only sort is
    # order-ambiguous) — this is a deterministic multiset equality
    h2, x2, y2, z2, cls2 = laz.read_laz(p.read_bytes())
    keys = ["x", "y", "z", "cls"]
    got = df.toPandas().sort_values(keys).reset_index(drop=True)
    want = pd.DataFrame({"x": x2, "y": y2, "z": z2, "cls": cls2.astype("int8")})
    want = want.sort_values(keys).reset_index(drop=True)
    for k in ("x", "y", "z"):
        assert np.array_equal(got[k].to_numpy(), want[k].to_numpy()), k
    assert np.array_equal(got["cls"].to_numpy(), want["cls"].to_numpy())
    assert np.allclose(np.sort(got["x"]), np.sort(x), atol=0.0051)


def test_laz_chunk_plan_rejects_point14():
    """POINT14 (formats 6+) stays a clear ValueError, not a bad decode."""
    from lasutility_spark.gridlib import laz

    rng = np.random.RandomState(17)
    n = 50
    d = laz.write_laz(
        380000 + rng.rand(n), 6666000 + rng.rand(n), rng.rand(n),
        np.full(n, 2, np.uint8),
    )
    d = bytearray(d)
    # patch the laszip VLR's first item type POINT10 -> POINT14 (10)
    off = d.index(struct.pack("<3H", laz.ITEM_POINT10, 20, 2))
    struct.pack_into("<H", d, off, 10)
    with pytest.raises(ValueError, match="POINT14"):
        laz.laz_chunk_plan(bytes(d))


def test_laz_source_reads_written_file(spark, tmp_path):
    """Distributed source over a file our own encoder wrote."""
    from lasutility_spark.gridlib import laz
    from lasutility_spark.engine.sources import read_las_points

    rng = np.random.RandomState(9)
    n = 5000
    x = 380000 + rng.rand(n) * 1000
    y = 6666000 + rng.rand(n) * 1000
    z = rng.rand(n) * 50
    cls = rng.choice([2, 3], n).astype(np.uint8)
    p = tmp_path / "own.laz"
    p.write_bytes(laz.write_laz(x, y, z, cls))
    df = read_las_points(spark, [str(p)])
    assert df.count() == n
    got = df.agg({"z": "max"}).collect()[0][0]
    assert abs(got - z.max()) < 0.0051


def test_laz_chunked_source_parallel_decode(spark, tmp_path):
    """One task per LASzip chunk: the chunked source over a 4-chunk file
    equals the single-pass decode row-for-row."""
    from lasutility_spark.engine.sources import read_laz_points_chunked
    from lasutility_spark.gridlib import laz

    rng = np.random.RandomState(21)
    n = 40_000
    x = 380000 + rng.rand(n) * 2000
    y = 6666000 + rng.rand(n) * 2000
    z = rng.rand(n) * 30
    cls = rng.choice([2, 3, 4, 5], n).astype(np.uint8)
    p = tmp_path / "chunky.laz"
    p.write_bytes(laz.write_laz(x, y, z, cls, chunk_size=10_000))
    _h, _vlr, chunks = laz.laz_chunk_plan(p.read_bytes())
    assert len(chunks) == 4
    df = read_laz_points_chunked(spark, str(p))
    got = sorted(
        (round(r["x"], 2), round(r["y"], 2), round(r["z"], 2), r["cls"])
        for r in df.collect()
    )
    _h2, rx, ry, rz, rcls = laz.read_laz(p.read_bytes())
    want = sorted(zip(np.round(rx, 2), np.round(ry, 2), np.round(rz, 2),
                      rcls.astype("int8")))
    assert got == want


def test_laz14_point14_roundtrip_multichunk():
    """LAS 1.4 format-6 POINT14 layered codec (compressor 3): synthetic
    multi-chunk file round-trips exactly — quantized coordinates,
    classes, gps times, and all four scanner-channel contexts
    (VERDICT r04 #5).  WAVEPACKET items stay a ValueError."""
    from lasutility_spark.gridlib import laz, laz14

    rng = np.random.RandomState(7)
    n = 9000
    x = 385000 + np.cumsum(rng.normal(0, 0.8, n))
    y = 6672000 + np.cumsum(rng.normal(0, 0.8, n))
    z = 100 + np.cumsum(rng.normal(0, 0.05, n))
    cls = rng.choice([2, 5, 6], n).astype(np.uint8)
    gps = 300000.0 + np.cumsum(rng.uniform(1e-6, 1e-4, n))
    chan = rng.choice([0, 1, 2, 3], n, p=[0.7, 0.1, 0.1, 0.1]).astype(np.uint8)

    blob = laz14.write_laz14(
        x, y, z, cls, gps_time=gps, channel=chan, chunk_size=2000
    )
    assert len(blob) < n * 30  # actually compresses
    h, x2, y2, z2, c2 = laz14.read_laz14(blob)
    assert h["version"] == (1, 4) and h["point_count"] == n
    assert h["legacy_count"] == 0  # formats 6+ zero the legacy field
    sx = h["scale"][0]
    assert np.allclose(x2, x, atol=sx) and np.allclose(y2, y, atol=sx)
    assert np.allclose(z2, z, atol=sx)
    assert np.array_equal(c2, cls)
    assert np.array_equal(h["_channel"], chan)
    assert np.array_equal(h["_gps_time"], gps)  # bit-exact doubles
    # the generic entry point dispatches by item type
    h3, x3, _y3, _z3, c3 = laz.read_laz(blob)
    assert np.array_equal(x3, x2) and np.array_equal(c3, c2)

    # native laszip POINT14 streams are REFUSED (no silent garbage):
    # strip the writer tag from the VLR description
    d = bytearray(blob)
    off = d.index(laz14._WRITER_TAG)
    d[off : off + len(laz14._WRITER_TAG)] = b"\0" * len(laz14._WRITER_TAG)
    with pytest.raises(ValueError, match="native laszip POINT14"):
        laz14.read_laz14(bytes(d))

    # WAVEPACKET refusal retained
    d = bytearray(blob)
    off = d.index(struct.pack("<3H", laz.ITEM_POINT14, 30, 3))
    struct.pack_into("<H", d, off, laz14.ITEM_WAVEPACKET14)
    with pytest.raises(ValueError, match="WAVEPACKET"):
        laz14.read_laz14(bytes(d))


def test_laz_extra_bytes_roundtrip():
    """BYTE v2 (extra-bytes) item: (n, k) uint8 payload rides every
    record through the compressed stream and round-trips exactly,
    multi-chunk (VERDICT r04 #5)."""
    from lasutility_spark.gridlib import laz

    rng = np.random.RandomState(11)
    n = 3000
    x = 385000 + np.cumsum(rng.normal(0, 0.5, n))
    y = 6672000 + np.cumsum(rng.normal(0, 0.5, n))
    z = 100 + rng.rand(n)
    cls = np.full(n, 2, np.uint8)
    gps = 1e5 + np.arange(n) * 1e-3
    extra = rng.randint(0, 256, (n, 5)).astype(np.uint8)
    blob = laz.write_laz(
        x, y, z, cls, gps_time=gps, extra_bytes=extra, chunk_size=1000
    )
    h, x2, _y2, _z2, c2 = laz.read_laz(blob)
    assert h["record_len"] == 28 + 5
    assert np.allclose(x2, x, atol=0.006)
    assert np.array_equal(h["_extra"], extra)
    assert np.array_equal(h["_gps_time"], gps)


def test_las14_uncompressed_formats_6_to_8():
    """Uncompressed LAS 1.4 point formats 6-8 read through read_las:
    classification at byte 16, gps/channel/returns attached; an
    unknown format id refuses."""
    from lasutility_spark.gridlib import las, laz14

    rng = np.random.RandomState(5)
    n = 80
    x = 385000 + rng.rand(n) * 100
    y = 6672000 + rng.rand(n) * 100
    z = 100 + rng.rand(n)
    cls = rng.choice([2, 5, 105], n).astype(np.uint8)  # >31: 1.4-only class
    gps = 1e5 + np.arange(n, dtype=np.float64)
    ox, oy, oz = (float(np.floor(v.min())) for v in (x, y, z))
    for fmt, pad in ((6, 0), (7, 6), (8, 8)):
        recs = b"".join(
            laz14._pack_point14(
                int(round((x[i] - ox) / 0.01)), int(round((y[i] - oy) / 0.01)),
                int(round((z[i] - oz) / 0.01)), 7, 2, 3, 1, i % 4,
                int(cls[i]), 9, -42, 17, float(gps[i]),
            ) + b"\xAB" * pad
            for i in range(n)
        )
        hdr = bytearray(375)
        hdr[0:4] = b"LASF"
        hdr[24], hdr[25] = 1, 4
        struct.pack_into("<HI", hdr, 94, 375, 375)
        struct.pack_into("<IBH", hdr, 100, 0, fmt, 30 + pad)
        struct.pack_into("<6d", hdr, 131, 0.01, 0.01, 0.01, ox, oy, oz)
        struct.pack_into("<Q", hdr, 247, n)
        h, x2, y2, z2, c2 = las.read_las(bytes(hdr) + recs)
        assert np.allclose(x2, x, atol=0.006), fmt
        assert np.array_equal(c2, cls)
        assert np.array_equal(h["_gps_time"], gps)
        assert np.array_equal(h["_channel"], np.arange(n) % 4)
        assert np.array_equal(h["_returns"], np.full(n, 2))
    hdr11 = bytearray(hdr)
    struct.pack_into("<IBH", hdr11, 100, 0, 11, 30)
    with pytest.raises(ValueError, match="unsupported point format"):
        las.read_las(bytes(hdr11) + recs)


def test_las_uncompressed_waveform_formats_4_5_9_10():
    """Uncompressed waveform formats: 4 (= 1 + wave), 5 (= 3 + wave),
    9 (= 6 + wave), 10 (= 8 + wave).  Coordinates/classification/GPS
    decode as in the base format and the 29-byte wave-packet
    descriptor trailer (LAS 1.4 spec: desc u1, offset u8, size u4,
    return-loc f4, Xt/Yt/Zt f4) is surfaced; the external waveform
    payload is out of scope by design."""
    from lasutility_spark.gridlib import las, laz14

    rng = np.random.RandomState(9)
    n = 60
    x = 385000 + rng.rand(n) * 100
    y = 6672000 + rng.rand(n) * 100
    z = 100 + rng.rand(n)
    cls = rng.choice([2, 5, 9], n).astype(np.uint8)
    gps = 2e5 + np.arange(n, dtype=np.float64)
    wave_desc = (rng.randint(1, 4, n)).astype(np.uint8)
    wave_size = (100 + rng.randint(0, 50, n)).astype(np.uint32)
    wave_loc = rng.rand(n).astype(np.float32)
    ox, oy, oz = (float(np.floor(v.min())) for v in (x, y, z))

    def wave_block(i):
        return struct.pack(
            "<BQIf3f", int(wave_desc[i]), 1000 + i, int(wave_size[i]),
            float(wave_loc[i]), 0.1, 0.2, 0.3,
        )

    def legacy_core(i):
        return struct.pack(
            "<3iHBBbBH",
            int(round((x[i] - ox) / 0.01)), int(round((y[i] - oy) / 0.01)),
            int(round((z[i] - oz) / 0.01)), 30, 0x11, int(cls[i]), -5, 0, 1,
        )

    cases = {
        # fmt: (version minor, per-point record bytes)
        4: (2, [legacy_core(i) + struct.pack("<d", gps[i]) + wave_block(i)
                for i in range(n)]),
        5: (2, [legacy_core(i) + struct.pack("<d", gps[i])
                + struct.pack("<3H", 1, 2, 3) + wave_block(i)
                for i in range(n)]),
        9: (4, [laz14._pack_point14(
                int(round((x[i] - ox) / 0.01)), int(round((y[i] - oy) / 0.01)),
                int(round((z[i] - oz) / 0.01)), 30, 1, 1, 0, 0,
                int(cls[i]), 0, -50, 1, float(gps[i])) + wave_block(i)
                for i in range(n)]),
        10: (4, [laz14._pack_point14(
                int(round((x[i] - ox) / 0.01)), int(round((y[i] - oy) / 0.01)),
                int(round((z[i] - oz) / 0.01)), 30, 1, 1, 0, 0,
                int(cls[i]), 0, -50, 1, float(gps[i]))
                + struct.pack("<4H", 1, 2, 3, 4) + wave_block(i)
                for i in range(n)]),
    }
    for fmt, (minor, recs) in cases.items():
        rec_len = len(recs[0])
        assert rec_len == (las._FORMAT14_SIZES.get(fmt)
                           or las._FORMAT_SIZES[fmt])
        hdr = bytearray(375 if minor == 4 else 227)
        hdr[0:4] = b"LASF"
        hdr[24], hdr[25] = 1, minor
        struct.pack_into("<HI", hdr, 94, len(hdr), len(hdr))
        struct.pack_into("<IBH", hdr, 100, 0, fmt, rec_len)
        struct.pack_into("<6d", hdr, 131, 0.01, 0.01, 0.01, ox, oy, oz)
        if minor == 4:
            struct.pack_into("<Q", hdr, 247, n)
        else:
            struct.pack_into("<I", hdr, 107, n)
        h, x2, y2, z2, c2 = las.read_las(bytes(hdr) + b"".join(recs))
        assert np.allclose(x2, x, atol=0.006), fmt
        assert np.allclose(z2, z, atol=0.006), fmt
        assert np.array_equal(c2, cls), fmt
        assert np.array_equal(h["_gps_time"], gps), fmt
        assert np.array_equal(h["_wave_desc"], wave_desc), fmt
        assert np.array_equal(h["_wave_size"], wave_size), fmt
        assert np.array_equal(h["_wave_return_loc"], wave_loc), fmt


def test_laz_single_and_zero_point_files():
    """Degenerate classic-item LAZ sizes round-trip (the laz14 twin of
    this test already existed; the classic path crashed on 0 points)."""
    from lasutility_spark.gridlib import laz

    blob1 = laz.write_laz(
        np.array([385000.25]), np.array([6672000.75]), np.array([101.5]),
        np.array([5], np.uint8), gps_time=np.array([42.5]),
    )
    h, x, _y, _z, c = laz.read_laz(blob1)
    assert len(x) == 1 and abs(x[0] - 385000.25) < 0.01
    assert c[0] == 5 and h["_gps_time"][0] == 42.5

    blob0 = laz.write_laz(
        np.array([]), np.array([]), np.array([]), np.array([], np.uint8)
    )
    h0, x0, y0, z0, c0 = laz.read_laz(blob0)
    assert len(x0) == len(y0) == len(z0) == len(c0) == 0
    assert len(h0["_gps_time"]) == 0 and len(h0["_returns"]) == 0


def test_laz_wavepacket13_roundtrip_formats_4_5():
    """WAVEPACKET13 v1 item (compressed point formats 4/5): the
    29-byte descriptor block rides every record both directions and
    round-trips exactly, multi-chunk, exercising all four offset
    classifier symbols (same / last+size / i32-delta / raw 64-bit).
    Read surface matches las.read_las on uncompressed 4/5."""
    from lasutility_spark.gridlib import laz

    rng = np.random.RandomState(17)
    n = 2000
    x = 385000 + rng.rand(n) * 500
    y = 6672000 + rng.rand(n) * 500
    z = 100 + rng.rand(n) * 30
    cls = rng.choice([2, 5, 6], n).astype(np.uint8)
    gps = 1e5 + np.cumsum(rng.rand(n))
    desc = rng.randint(0, 3, n).astype(np.uint8)
    size = (200 + rng.randint(0, 100, n)).astype(np.uint32)
    off = np.zeros(n, np.uint64)
    cur = 10000
    for i in range(n):
        r = i % 7
        if r in (1, 2):
            cur += int(size[i - 1])        # sequential -> sym 1
        elif r == 3:
            cur += 123456                  # small delta -> sym 2
        elif r == 4:
            cur = int(rng.randint(0, 2**31)) + (7 << 33)  # jump -> sym 3
        elif r != 0:                       # r == 0: same offset -> sym 0
            cur += 64
        off[i] = cur
    wave = np.zeros((n, 29), np.uint8)
    for i in range(n):
        wave[i] = np.frombuffer(
            struct.pack("<BQIf3f", int(desc[i]), int(off[i]), int(size[i]),
                        float(rng.rand()), 0.1, 0.2, 0.3), np.uint8,
        )
    for use_rgb in (False, True):
        rgb = (rng.randint(0, 65536, (n, 3)).astype(np.uint16)
               if use_rgb else None)
        blob = laz.write_laz(x, y, z, cls, gps_time=gps, chunk_size=700,
                             rgb=rgb, wavepacket=wave)
        h, x2, _y2, _z2, c2 = laz.read_laz(blob)
        assert (h["point_format"] & 0x3F) == (5 if use_rgb else 4)
        # formats 4/5 exist from LAS 1.3 (235-byte header); a 1.2 header
        # declaring them would fail spec validators
        assert h["version"] == (1, 3) and h["header_size"] == 235
        assert np.allclose(x2, x, atol=0.006)
        assert np.array_equal(c2, cls)
        assert np.allclose(h["_gps_time"], gps)
        assert np.array_equal(h["_wave_desc"], desc)
        assert np.array_equal(h["_wave_size"], size)
        if use_rgb:
            assert np.array_equal(h["_rgb"], rgb)
        hdr, vlr, chunks = laz.laz_chunk_plan(blob)
        assert len(chunks) == 3
        got = np.concatenate(
            [laz.decode_laz_chunk(blob, vlr, s, c)[8] for s, c in chunks]
        )
        assert np.array_equal(got, wave)
    with pytest.raises(ValueError, match="requires gps_time"):
        laz.write_laz(x, y, z, cls, wavepacket=wave)
    # a corrupt VLR size on a fixed-size item must refuse, not shift
    # the interleaved raw-first-point layout and decode garbage
    bad = bytearray(blob)
    # string(16) + record-id/length(4) + description(32) + body head(34)
    vlr_items_off = blob.index(b"laszip encoded\0\0") + 16 + 4 + 32 + 34
    struct.pack_into("<3H", bad, vlr_items_off + 6 * 3, 9, 28, 1)
    with pytest.raises(ValueError, match="spec size"):
        laz.laz_chunk_plan(bytes(bad))


def test_laz_wavepacket_through_distributed_source(spark, tmp_path):
    """A written format-4 (waveform) LAZ flows through the distributed
    sources.read_las_points scan unchanged — wave metadata rides the
    stream, coordinates/classes land in the DataFrame."""
    from lasutility_spark.engine import sources
    from lasutility_spark.gridlib import laz

    rng = np.random.RandomState(29)
    n = 900
    x = 385000 + rng.rand(n) * 100
    y = 6672000 + rng.rand(n) * 100
    z = 100 + rng.rand(n)
    cls = rng.choice([2, 5], n).astype(np.uint8)
    wave = rng.randint(0, 256, (n, 29)).astype(np.uint8)
    p = str(tmp_path / "wave4.laz")
    with open(p, "wb") as f:
        f.write(laz.write_laz(
            x, y, z, cls, gps_time=1e5 + np.arange(n, dtype=np.float64),
            wavepacket=wave, chunk_size=300,
        ))
    df = sources.read_las_points(spark, [p])
    rows = df.collect()
    assert len(rows) == n
    assert sorted(r["cls"] for r in rows) == sorted(cls.tolist())
    assert abs(min(r["x"] for r in rows) - x.min()) < 0.01


def test_laz14_through_distributed_source(spark, tmp_path):
    """A written format-6 POINT14 file flows through the distributed
    sources.read_las_points scan (read_laz dispatches by item type), so
    the engine ingests LAS 1.4 clouds with zero caller changes."""
    from lasutility_spark.engine import sources
    from lasutility_spark.gridlib import laz14

    rng = np.random.RandomState(23)
    n = 400
    x = 385000 + rng.rand(n) * 100
    y = 6672000 + rng.rand(n) * 100
    z = 100 + rng.rand(n)
    cls = rng.choice([2, 5], n).astype(np.uint8)
    p = str(tmp_path / "pts14.laz")
    with open(p, "wb") as f:
        f.write(laz14.write_laz14(x, y, z, cls, chunk_size=150))
    df = sources.read_las_points(spark, [p])
    rows = df.collect()
    assert len(rows) == n
    got_cls = sorted(r["cls"] for r in rows)
    assert got_cls == sorted(cls.tolist())
    assert abs(min(r["x"] for r in rows) - x.min()) < 0.01


def test_laz14_single_and_zero_point_files():
    """Degenerate sizes: a 1-point file (raw-only chunk, all layers
    empty) and a 0-point file (no chunks, empty chunk table) both
    round-trip."""
    from lasutility_spark.gridlib import laz14

    blob = laz14.write_laz14(
        np.array([385000.5]), np.array([6672000.5]), np.array([101.25]),
        np.array([7], np.uint8), gps_time=np.array([123.5]),
    )
    h, x, y, z, c = laz14.read_laz14(blob)
    assert len(x) == 1 and abs(x[0] - 385000.5) < 0.01
    assert c[0] == 7 and h["_gps_time"][0] == 123.5

    blob0 = laz14.write_laz14(
        np.array([]), np.array([]), np.array([]), np.array([], np.uint8)
    )
    h0, x0, _y0, _z0, c0 = laz14.read_laz14(blob0)
    assert len(x0) == 0 and len(c0) == 0 and h0["point_count"] == 0
