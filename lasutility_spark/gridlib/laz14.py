"""LAS 1.4 POINT14 (point formats 6+) layered LAZ codec — pure Python.

Extends :mod:`.laz` (formats 0-3, pointwise-chunked compressor 2) with
the LAS 1.4 point family the reference otherwise reads through the
native laszip library (LAS/LasZipNetReader.cs:63-89 accepts any laszip
stream; LasUtility itself never inspects the item layout).

What follows the PUBLIC LASzip layered layout (laszip.org format spec;
Isenburg, PE&RS 2013; the LASzip source's compressor-3 framing):

- LAS 1.4 header (375 bytes, u64 extended point count at offset 247),
  point format 6 with the compression bit, 30-byte POINT14 records,
- laszip VLR with compressor 3 ("layered chunked"), item
  (POINT14, 30, v3),
- chunk framing: i64 chunk-table offset, then per chunk the RAW first
  point followed by one u32 byte-count per layer and the layer blobs,
  each layer an independent adaptive arithmetic stream (so a reader
  can skip layers it does not need — the point of the v3 layout),
- the 9 POINT14 layers in spec order: channel_returns_XY, Z,
  classification, flags, intensity, scan_angle, user_data,
  point_source, gps_time,
- 4 scanner-channel contexts: the changed-channel symbol is coded in
  the PREVIOUS point's context, then the remaining fields in the new
  channel's context; a first-use context seeds its predictors from the
  previous point (cross-channel seeding),
- the trailing chunk table in the laszip-native version-0 layout
  (sizes arithmetic-coded, previous-size prediction — shared with
  :func:`.laz.write_laz`).

What is THIS MODULE'S OWN: the per-field probability models.  The
native POINT14 v3 model suite is not reproduced bit-for-bit here — the
reference repo carries no format-6 fixture to validate against, and a
"faithful" unvalidated port could silently decode garbage.  Files
written by :func:`write_laz14` therefore carry a writer tag in the VLR
description, and :func:`read_laz14` REFUSES native laszip POINT14
streams with a clear ValueError instead of risking silent wrongness.
WAVEPACKET13/14 items (formats 9/10) raise ValueError by design.

Per-field models (all built from the same FastAC-style primitives as
:mod:`.laz`, per scanner-channel context):

- channel delta: 4-symbol model; returns byte: same-bit + 256-symbol
  model; X/Y: 32-bit integer compressor on streaming median-of-5
  predictors keyed single/multi-return (the POINT10 v2 scheme),
- Z: 32-bit integer compressor, last-Z predictor per return class,
- classification / flags / user_data: same-bit + symbol model,
- intensity / scan_angle / point_source: same-bit + 16-bit integer
  compressor on the previous value,
- gps_time: the GPSTIME11 v2 multi-sequence delta coder
  (:class:`.laz.GpsTime11V2Reader`) running in its own layer stream.
"""

from __future__ import annotations

import struct

import numpy as np

from .las import read_header
from .laz import (
    ITEM_POINT14,
    ArithmeticBitModel,
    ArithmeticDecoder,
    ArithmeticEncoder,
    ArithmeticModel,
    GpsTime11V2Reader,
    GpsTime11V2Writer,
    IntegerCompressor,
    IntegerCompressorEnc,
    StreamingMedian5,
    parse_laszip_vlr,
)

ITEM_RGB14 = 11
ITEM_RGBNIR14 = 12
ITEM_WAVEPACKET14 = 13
ITEM_BYTE14 = 14

N_LAYERS = 9
_WRITER_TAG = b"lasutility layered v3"

_POINT14 = struct.Struct("<3iHBBBBhHd")  # 30 bytes


def _pack_point14(qx, qy, qz, intensity, ret, nret, flags6, channel,
                  cls, user, angle, psid, gps) -> bytes:
    b14 = (ret & 0x0F) | ((nret & 0x0F) << 4)
    b15 = (flags6 & 0x0F) | ((channel & 0x03) << 4) | ((flags6 & 0x30) << 2)
    return _POINT14.pack(qx, qy, qz, intensity, b14, b15, cls, user,
                         angle, psid, gps)


def _unpack_point14(raw: bytes) -> dict:
    qx, qy, qz, inten, b14, b15, cls, user, angle, psid, gps = (
        _POINT14.unpack(raw)
    )
    return {
        "X": qx, "Y": qy, "Z": qz, "intensity": inten,
        "ret": b14 & 0x0F, "nret": (b14 >> 4) & 0x0F,
        "flags6": (b15 & 0x0F) | ((b15 >> 2) & 0x30),
        "channel": (b15 >> 4) & 0x03,
        "cls": cls, "user": user, "angle": angle, "psid": psid,
        "gps": gps,
    }


class _Ctx:
    """Per-scanner-channel model set + predictor state (one of 4)."""

    def __init__(self, seed: dict) -> None:
        self.prev = dict(seed)
        self.md_x = [StreamingMedian5(), StreamingMedian5()]
        self.md_y = [StreamingMedian5(), StreamingMedian5()]
        # last Z per return class (single / multi)
        self.last_z = [seed["Z"], seed["Z"]]


def _ret_ctx(p: dict) -> int:
    """Predictor context: single-return (0) vs multi-return (1)."""
    return 0 if p["nret"] <= 1 else 1


class _LayerModels:
    """Models living inside one layer's arithmetic stream, per context."""

    def __init__(self) -> None:
        self.by_ctx: dict[int, dict] = {}

    def ctx(self, c: int, build) -> dict:
        if c not in self.by_ctx:
            self.by_ctx[c] = build()
        return self.by_ctx[c]


def read_laz14(data: bytes):
    """POINT14 LAZ bytes -> (header, x, y, z, classification); per-point
    gps time / scanner channel / return number attach on the header dict
    (``_gps_time``, ``_channel``, ``_returns``) like :func:`.laz.read_laz`."""
    header = read_header(data)
    if not (header["point_format"] & 0x80):
        raise ValueError("not LAZ (compression bit clear) — use las.read_las")
    vlr = parse_laszip_vlr(data, header)
    items = vlr["items"]
    if any(t == ITEM_WAVEPACKET14 for t, _s, _v in items):
        raise ValueError(
            "laszip item WAVEPACKET14 (point formats 9/10) is out of scope"
        )
    if [(t, v) for t, _s, v in items] != [(ITEM_POINT14, 3)]:
        raise ValueError(
            f"read_laz14 handles exactly one POINT14 v3 item, got {items}"
        )
    if vlr["compressor"] != 3:
        raise ValueError(
            f"POINT14 expects layered compressor 3, got {vlr['compressor']}"
        )
    if vlr.get("writer_tag") != _WRITER_TAG:
        raise ValueError(
            "native laszip POINT14 v3 model suite is not implemented — "
            "this layered reader only decodes files written by "
            "write_laz14 (writer tag missing from the laszip VLR "
            "description); no format-6 fixture exists to validate a "
            "native-parity port, and a silent mismatch would decode "
            "garbage coordinates"
        )
    n = header["point_count"]
    pos = header["offset_to_points"]
    (table_off,) = struct.unpack_from("<q", data, pos)
    pos += 8
    chunk_size = vlr["chunk_size"]
    # chunk table (shared version-0 layout)
    ver, cnt = struct.unpack_from("<2I", data, table_off)
    if ver != 0:
        raise ValueError(f"unsupported chunk table version {ver}")
    tdec = ArithmeticDecoder(data, table_off + 8)
    tdec.init()
    tic = IntegerCompressor(tdec, 32, 2)
    sizes = []
    prev = 0
    for _ in range(cnt):
        prev = tic.decompress(prev, 1)
        sizes.append(prev)
    starts = [pos]
    for s in sizes[:-1]:
        starts.append(starts[-1] + s)

    out = {k: np.empty(n, dt) for k, dt in (
        ("X", np.int64), ("Y", np.int64), ("Z", np.int64),
        ("cls", np.uint8), ("ret", np.uint8), ("channel", np.uint8),
        ("gps", np.float64), ("intensity", np.uint16),
        ("angle", np.int16), ("psid", np.uint16), ("user", np.uint8),
    )}
    i = 0
    for start, count in zip(starts, [min(chunk_size, n - k)
                                     for k in range(0, n, chunk_size)]):
        _decode_chunk14(data, start, count, out, i)
        i += count
    sx, sy, sz = header["scale"]
    ox, oy, oz = header["offset"]
    header["_returns"] = out["ret"]
    header["_gps_time"] = out["gps"]
    header["_channel"] = out["channel"]
    header["_intensity"] = out["intensity"]
    header["_scan_angle"] = out["angle"]
    header["_point_source"] = out["psid"]
    header["_user_data"] = out["user"]
    return (
        header,
        out["X"] * sx + ox,
        out["Y"] * sy + oy,
        out["Z"] * sz + oz,
        out["cls"].copy(),
    )


def _decode_chunk14(data: bytes, start: int, count: int, out, base: int):
    raw = data[start : start + 30]
    pos = start + 30
    nbytes = struct.unpack_from(f"<{N_LAYERS}I", data, pos)
    pos += 4 * N_LAYERS
    decs = []
    for nb in nbytes:
        d = ArithmeticDecoder(data, pos)
        d.init()
        decs.append(d)
        pos += nb
    (d_crxy, d_z, d_cls, d_flags, d_int, d_ang, d_user, d_psid,
     d_gps) = decs

    p0 = _unpack_point14(raw)
    _store(out, base, p0)
    ctxs: list[_Ctx | None] = [None] * 4
    cur = p0["channel"]
    ctxs[cur] = _Ctx(p0)

    # layer-0 models per context
    l0 = _LayerModels()

    def build_l0():
        return {
            "channel": ArithmeticModel(4),
            "ret_same": ArithmeticBitModel(),
            "ret": ArithmeticModel(256),
            "ic_x": IntegerCompressor(d_crxy, 32, 2),
            "ic_y": IntegerCompressor(d_crxy, 32, 2),
        }

    lz = _LayerModels()

    def build_z():
        return {"ic_z": IntegerCompressor(d_z, 32, 2)}

    lcls = _LayerModels()

    def build_cls():
        return {"same": ArithmeticBitModel(), "m": ArithmeticModel(256)}

    lflags = _LayerModels()

    def build_flags():
        return {"same": ArithmeticBitModel(), "m": ArithmeticModel(64)}

    lint = _LayerModels()

    def build_int():
        return {"same": ArithmeticBitModel(),
                "ic": IntegerCompressor(d_int, 16, 1)}

    lang = _LayerModels()

    def build_ang():
        return {"same": ArithmeticBitModel(),
                "ic": IntegerCompressor(d_ang, 16, 1)}

    luser = _LayerModels()

    def build_user():
        return {"same": ArithmeticBitModel(), "m": ArithmeticModel(256)}

    lpsid = _LayerModels()

    def build_psid():
        return {"same": ArithmeticBitModel(),
                "ic": IntegerCompressor(d_psid, 16, 1)}

    gps_by_ctx: dict[int, GpsTime11V2Reader] = {
        cur: GpsTime11V2Reader(d_gps, struct.pack("<d", p0["gps"]))
    }

    for j in range(1, count):
        c0 = cur
        m0 = l0.ctx(c0, build_l0)
        diff = d_crxy.decode_symbol(m0["channel"])
        cur = (c0 + diff) & 3
        if ctxs[cur] is None:
            ctxs[cur] = _Ctx(ctxs[c0].prev)
        ctx = ctxs[cur]
        m0 = l0.ctx(cur, build_l0)
        prev = ctx.prev
        if d_crxy.decode_bit(m0["ret_same"]):
            rbyte = (prev["ret"] & 0x0F) | ((prev["nret"] & 0x0F) << 4)
        else:
            rbyte = d_crxy.decode_symbol(m0["ret"])
        p = {"ret": rbyte & 0x0F, "nret": (rbyte >> 4) & 0x0F,
             "channel": cur}
        rc = _ret_ctx(p)
        dx = m0["ic_x"].decompress(ctx.md_x[rc].get(), rc)
        p["X"] = prev["X"] + dx
        ctx.md_x[rc].add(dx)
        dy = m0["ic_y"].decompress(ctx.md_y[rc].get(), rc)
        p["Y"] = prev["Y"] + dy
        ctx.md_y[rc].add(dy)
        p["Z"] = lz.ctx(cur, build_z)["ic_z"].decompress(ctx.last_z[rc], rc)
        ctx.last_z[rc] = p["Z"]
        mc = lcls.ctx(cur, build_cls)
        p["cls"] = (prev["cls"] if d_cls.decode_bit(mc["same"])
                    else d_cls.decode_symbol(mc["m"]))
        mf = lflags.ctx(cur, build_flags)
        p["flags6"] = (prev["flags6"] if d_flags.decode_bit(mf["same"])
                       else d_flags.decode_symbol(mf["m"]))
        mi = lint.ctx(cur, build_int)
        p["intensity"] = (prev["intensity"] if d_int.decode_bit(mi["same"])
                          else mi["ic"].decompress(prev["intensity"]) & 0xFFFF)
        ma = lang.ctx(cur, build_ang)
        p["angle"] = (prev["angle"] if d_ang.decode_bit(ma["same"])
                      else _i16(ma["ic"].decompress(prev["angle"] & 0xFFFF)))
        mu = luser.ctx(cur, build_user)
        p["user"] = (prev["user"] if d_user.decode_bit(mu["same"])
                     else d_user.decode_symbol(mu["m"]))
        mp = lpsid.ctx(cur, build_psid)
        p["psid"] = (prev["psid"] if d_psid.decode_bit(mp["same"])
                     else mp["ic"].decompress(prev["psid"]) & 0xFFFF)
        if cur not in gps_by_ctx:
            # first use of this channel: seed its time sequence from the
            # previous point (mirrors the writer exactly)
            gps_by_ctx[cur] = GpsTime11V2Reader(
                d_gps, struct.pack("<d", prev["gps"])
            )
        p["gps"] = gps_by_ctx[cur].read()
        ctx.prev = p
        _store(out, base + j, p)


def _i16(v: int) -> int:
    v &= 0xFFFF
    return v - (1 << 16) if v >= 0x8000 else v


def _store(out, i: int, p: dict) -> None:
    out["X"][i] = p["X"]
    out["Y"][i] = p["Y"]
    out["Z"][i] = p["Z"]
    out["cls"][i] = p["cls"]
    out["ret"][i] = p["ret"]
    out["channel"][i] = p["channel"]
    out["gps"][i] = p["gps"]
    out["intensity"][i] = p["intensity"]
    out["angle"][i] = p["angle"]
    out["psid"][i] = p["psid"]
    out["user"][i] = p["user"]


def write_laz14(
    x: np.ndarray,
    y: np.ndarray,
    z: np.ndarray,
    classification: np.ndarray,
    gps_time: np.ndarray | None = None,
    channel: np.ndarray | None = None,
    scale: tuple[float, float, float] = (0.01, 0.01, 0.01),
    chunk_size: int = 50000,
    intensity: np.ndarray | None = None,
    scan_angle: np.ndarray | None = None,
    point_source: np.ndarray | None = None,
    user_data: np.ndarray | None = None,
) -> bytes:
    """Arrays -> LAS 1.4 point-format-6 LAZ bytes (layered compressor 3).

    Round-trips :func:`read_laz14` exactly (quantized coordinates,
    classes, gps times, scanner channels, and the optional
    intensity / scan_angle / point_source / user_data fields).
    ``channel`` (uint8 0-3) exercises the 4-context machinery;
    all optional fields default to zero."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    z = np.asarray(z, np.float64)
    n = len(x)
    cls = np.asarray(classification, np.uint8)
    gps = (np.zeros(n) if gps_time is None
           else np.asarray(gps_time, np.float64))
    chan = (np.zeros(n, np.uint8) if channel is None
            else np.asarray(channel, np.uint8))
    inten = (np.zeros(n, np.uint16) if intensity is None
             else np.asarray(intensity, np.uint16))
    angle = (np.zeros(n, np.int16) if scan_angle is None
             else np.asarray(scan_angle, np.int16))
    psid = (np.zeros(n, np.uint16) if point_source is None
            else np.asarray(point_source, np.uint16))
    user = (np.zeros(n, np.uint8) if user_data is None
            else np.asarray(user_data, np.uint8))
    if n and chan.max() > 3:
        raise ValueError("scanner channel must be 0-3")
    sx, sy, sz = scale
    ox = float(np.floor(x.min())) if n else 0.0
    oy = float(np.floor(y.min())) if n else 0.0
    oz = float(np.floor(z.min())) if n else 0.0
    qx = np.round((x - ox) / sx).astype(np.int64)
    qy = np.round((y - oy) / sy).astype(np.int64)
    qz = np.round((z - oz) / sz).astype(np.int64)
    for q in (qx, qy, qz):
        if n and np.abs(q).max() >= 2**31:
            raise ValueError("extent exceeds int32 at this scale")

    def point(i: int) -> dict:
        return {
            "X": int(qx[i]), "Y": int(qy[i]), "Z": int(qz[i]),
            "intensity": int(inten[i]), "ret": 1, "nret": 1, "flags6": 0,
            "channel": int(chan[i]), "cls": int(cls[i]),
            "user": int(user[i]), "angle": int(angle[i]),
            "psid": int(psid[i]), "gps": float(gps[i]),
        }

    chunks = bytearray()
    sizes = []
    i = 0
    while i < n:
        count = min(chunk_size, n - i)
        start = len(chunks)
        chunks += _encode_chunk14([point(i + j) for j in range(count)])
        sizes.append(len(chunks) - start)
        i += count

    # laszip VLR: compressor 3, one POINT14 v3 item, writer tag in the
    # VLR description so read_laz14 can refuse native streams loudly
    vlr_body = struct.pack(
        "<HHBBHIIqqH", 3, 0, 3, 0, 0, 0, chunk_size, 0, -1, 1
    ) + struct.pack("<3H", ITEM_POINT14, 30, 3)
    desc = _WRITER_TAG.ljust(32, b"\0")
    vlr = struct.pack("<H16sHH", 0, b"laszip encoded\0\0", 22204,
                      len(vlr_body)) + desc + vlr_body

    header_size = 375
    offset_to_points = header_size + len(vlr)
    hdr = bytearray(header_size)
    hdr[0:4] = b"LASF"
    hdr[24] = 1
    hdr[25] = 4
    hdr[26:36] = b"lasutility"
    struct.pack_into("<HI", hdr, 94, header_size, offset_to_points)
    struct.pack_into("<IBH", hdr, 100, 1, 6 | 0x80, 30)
    # legacy count stays 0 for formats 6+ (spec); extended u64 at 247
    struct.pack_into("<6d", hdr, 131, sx, sy, sz, ox, oy, oz)
    if n:
        struct.pack_into(
            "<6d", hdr, 179,
            float(x.max()), float(x.min()), float(y.max()), float(y.min()),
            float(z.max()), float(z.min()),
        )
    struct.pack_into("<Q", hdr, 247, n)
    table_off = offset_to_points + 8 + len(chunks)
    out = bytes(hdr) + vlr + struct.pack("<q", table_off) + bytes(chunks)
    tenc = ArithmeticEncoder()
    tic = IntegerCompressorEnc(tenc, 32, 2)
    prev = 0
    for s in sizes:
        tic.compress(prev, s, 1)
        prev = s
    out += struct.pack("<2I", 0, len(sizes)) + tenc.done()
    return out


def _encode_chunk14(points: list[dict]) -> bytes:
    p0 = points[0]
    raw = _pack_point14(
        p0["X"], p0["Y"], p0["Z"], p0["intensity"], p0["ret"], p0["nret"],
        p0["flags6"], p0["channel"], p0["cls"], p0["user"], p0["angle"],
        p0["psid"], p0["gps"],
    )
    encs = [ArithmeticEncoder() for _ in range(N_LAYERS)]
    (e_crxy, e_z, e_cls, e_flags, e_int, e_ang, e_user, e_psid,
     e_gps) = encs

    ctxs: list[_Ctx | None] = [None] * 4
    cur = p0["channel"]
    ctxs[cur] = _Ctx(p0)
    l0 = _LayerModels()

    def build_l0():
        return {
            "channel": ArithmeticModel(4),
            "ret_same": ArithmeticBitModel(),
            "ret": ArithmeticModel(256),
            "ic_x": IntegerCompressorEnc(e_crxy, 32, 2),
            "ic_y": IntegerCompressorEnc(e_crxy, 32, 2),
        }

    lz = _LayerModels()

    def build_z():
        return {"ic_z": IntegerCompressorEnc(e_z, 32, 2)}

    lcls = _LayerModels()

    def build_cls():
        return {"same": ArithmeticBitModel(), "m": ArithmeticModel(256)}

    lflags = _LayerModels()

    def build_flags():
        return {"same": ArithmeticBitModel(), "m": ArithmeticModel(64)}

    lint = _LayerModels()

    def build_int():
        return {"same": ArithmeticBitModel(),
                "ic": IntegerCompressorEnc(e_int, 16, 1)}

    lang = _LayerModels()

    def build_ang():
        return {"same": ArithmeticBitModel(),
                "ic": IntegerCompressorEnc(e_ang, 16, 1)}

    luser = _LayerModels()

    def build_user():
        return {"same": ArithmeticBitModel(), "m": ArithmeticModel(256)}

    lpsid = _LayerModels()

    def build_psid():
        return {"same": ArithmeticBitModel(),
                "ic": IntegerCompressorEnc(e_psid, 16, 1)}

    gps_by_ctx: dict[int, GpsTime11V2Writer] = {
        cur: GpsTime11V2Writer(e_gps, struct.pack("<d", p0["gps"]))
    }

    for p in points[1:]:
        c0 = cur
        m0 = l0.ctx(c0, build_l0)
        cur = p["channel"]
        e_crxy.encode_symbol(m0["channel"], (cur - c0) & 3)
        if ctxs[cur] is None:
            ctxs[cur] = _Ctx(ctxs[c0].prev)
        ctx = ctxs[cur]
        m0 = l0.ctx(cur, build_l0)
        prev = ctx.prev
        rbyte = (p["ret"] & 0x0F) | ((p["nret"] & 0x0F) << 4)
        prev_rbyte = (prev["ret"] & 0x0F) | ((prev["nret"] & 0x0F) << 4)
        if rbyte == prev_rbyte:
            e_crxy.encode_bit(m0["ret_same"], 1)
        else:
            e_crxy.encode_bit(m0["ret_same"], 0)
            e_crxy.encode_symbol(m0["ret"], rbyte)
        rc = _ret_ctx(p)
        dx = p["X"] - prev["X"]
        m0["ic_x"].compress(ctx.md_x[rc].get(), dx, rc)
        ctx.md_x[rc].add(dx)
        dy = p["Y"] - prev["Y"]
        m0["ic_y"].compress(ctx.md_y[rc].get(), dy, rc)
        ctx.md_y[rc].add(dy)
        lz.ctx(cur, build_z)["ic_z"].compress(ctx.last_z[rc], p["Z"], rc)
        ctx.last_z[rc] = p["Z"]
        mc = lcls.ctx(cur, build_cls)
        if p["cls"] == prev["cls"]:
            e_cls.encode_bit(mc["same"], 1)
        else:
            e_cls.encode_bit(mc["same"], 0)
            e_cls.encode_symbol(mc["m"], p["cls"])
        mf = lflags.ctx(cur, build_flags)
        if p["flags6"] == prev["flags6"]:
            e_flags.encode_bit(mf["same"], 1)
        else:
            e_flags.encode_bit(mf["same"], 0)
            e_flags.encode_symbol(mf["m"], p["flags6"])
        mi = lint.ctx(cur, build_int)
        if p["intensity"] == prev["intensity"]:
            e_int.encode_bit(mi["same"], 1)
        else:
            e_int.encode_bit(mi["same"], 0)
            mi["ic"].compress(prev["intensity"], p["intensity"])
        ma = lang.ctx(cur, build_ang)
        if p["angle"] == prev["angle"]:
            e_ang.encode_bit(ma["same"], 1)
        else:
            e_ang.encode_bit(ma["same"], 0)
            ma["ic"].compress(prev["angle"] & 0xFFFF, p["angle"] & 0xFFFF)
        mu = luser.ctx(cur, build_user)
        if p["user"] == prev["user"]:
            e_user.encode_bit(mu["same"], 1)
        else:
            e_user.encode_bit(mu["same"], 0)
            e_user.encode_symbol(mu["m"], p["user"])
        mp = lpsid.ctx(cur, build_psid)
        if p["psid"] == prev["psid"]:
            e_psid.encode_bit(mp["same"], 1)
        else:
            e_psid.encode_bit(mp["same"], 0)
            mp["ic"].compress(prev["psid"], p["psid"])
        if cur not in gps_by_ctx:
            gps_by_ctx[cur] = GpsTime11V2Writer(
                e_gps, struct.pack("<d", prev["gps"])
            )
        gps_by_ctx[cur].write(p["gps"])
        ctx.prev = p

    blobs = [e.done() for e in encs]
    head = raw + struct.pack(f"<{N_LAYERS}I", *(len(b) for b in blobs))
    return head + b"".join(blobs)
