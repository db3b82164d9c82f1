"""LAZ (LASzip) point decompressor — pure Python, no native codec.

Implements the publicly specified LASzip compression scheme (Isenburg,
"LASzip: lossless compression of LiDAR data", PE&RS 2013; format spec at
laszip.org) for the record layout the reference's own fixture uses
(LasUtility.Tests `Q5232E1_cropped.laz`, read through
LAS/LasZipNetReader.cs:54-89 via the laszip P/Invoke):

- compressor 2 (pointwise-chunked), record version 2
- item POINT10 (the 20-byte LAS point-format-0 core)
- item GPSTIME11 (point format 1's 8-byte GPS time)

Components, all from the public spec:

- the FastAC-style adaptive arithmetic decoder (32-bit interval,
  renormalization at 2^24) with adaptive symbol models and bit models,
- the "integer compressor" (k-bit corrector scheme: an adaptive model
  picks k, the corrector is decoded in a k-bit model or model+raw-bits
  split, then folded into [-2^(k-1)-..., 2^(k-1)+1] style intervals),
- POINT10 v2 prediction contexts (changed-values mask, streaming
  median-of-5 dx/dy predictors keyed by the return-number map, per-level
  height contexts),
- GPSTIME11 v2 multi-sequence delta prediction.

Each chunk starts with one RAW point and re-initialized models, so
chunks are independently decodable — at scale, one Spark task per chunk
(the chunk table at the start of the point data gives the offsets); the
reference fixture holds a single chunk.

Scope boundary: other item types (RGB12, BYTE, the 1.4 POINT14 family)
and record version 1 raise ValueError with a clear message.
"""

from __future__ import annotations

import struct

import numpy as np

from .las import read_header

_U32 = 0xFFFFFFFF
AC_MIN_LENGTH = 0x01000000
AC_MAX_LENGTH = 0xFFFFFFFF
BM_LENGTH_SHIFT = 13
BM_MAX_COUNT = 1 << BM_LENGTH_SHIFT
DM_LENGTH_SHIFT = 15
DM_MAX_COUNT = 1 << DM_LENGTH_SHIFT


class ArithmeticBitModel:
    __slots__ = ("bit_0_count", "bit_count", "bit_0_prob", "update_cycle",
                 "bits_until_update")

    def __init__(self) -> None:
        self.bit_0_count = 1
        self.bit_count = 2
        self.bit_0_prob = 1 << (BM_LENGTH_SHIFT - 1)
        self.update_cycle = self.bits_until_update = 4

    def update(self) -> None:
        self.bit_count += self.update_cycle
        if self.bit_count > BM_MAX_COUNT:
            self.bit_count = (self.bit_count + 1) >> 1
            self.bit_0_count = (self.bit_0_count + 1) >> 1
            if self.bit_0_count == self.bit_count:
                self.bit_count += 1
        # exact spec arithmetic: scaled probability via the 2^31 quotient
        # (NOT (count << shift) // total — different integer rounding)
        scale = 0x80000000 // self.bit_count
        self.bit_0_prob = (self.bit_0_count * scale) >> (31 - BM_LENGTH_SHIFT)
        self.update_cycle = min((5 * self.update_cycle) >> 2, 64)
        self.bits_until_update = self.update_cycle


class ArithmeticModel:
    """Adaptive multi-symbol model (decode side; binary-search variant —
    the optional decoder lookup table is a pure speedup, not needed for
    correctness)."""

    __slots__ = ("symbols", "distribution", "symbol_count", "total_count",
                 "update_cycle", "symbols_until_update")

    def __init__(self, symbols: int) -> None:
        self.symbols = symbols
        self.distribution = [0] * symbols
        self.symbol_count = [1] * symbols
        self.total_count = 0
        self.update_cycle = symbols
        self.update()
        self.symbols_until_update = self.update_cycle = (symbols + 6) >> 1

    def update(self) -> None:
        self.total_count += self.update_cycle
        if self.total_count > DM_MAX_COUNT:
            self.total_count = 0
            for i in range(self.symbols):
                self.symbol_count[i] = (self.symbol_count[i] + 1) >> 1
                self.total_count += self.symbol_count[i]
        scale = 0x80000000 // self.total_count
        s = 0
        shift = 31 - DM_LENGTH_SHIFT
        dist = self.distribution
        cnt = self.symbol_count
        for i in range(self.symbols):
            dist[i] = (scale * s) >> shift
            s += cnt[i]
        self.update_cycle = (5 * self.update_cycle) >> 2
        max_cycle = (self.symbols + 6) << 3
        if self.update_cycle > max_cycle:
            self.update_cycle = max_cycle
        self.symbols_until_update = self.update_cycle


class ArithmeticDecoder:
    """FastAC-style range decoder over a byte stream."""

    __slots__ = ("data", "pos", "value", "length")

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos
        self.value = 0
        self.length = 0

    def init(self) -> None:
        d = self.data
        p = self.pos
        self.value = (d[p] << 24) | (d[p + 1] << 16) | (d[p + 2] << 8) | d[p + 3]
        self.pos = p + 4
        self.length = AC_MAX_LENGTH

    def _renorm(self) -> None:
        d = self.data
        while self.length < AC_MIN_LENGTH:
            b = d[self.pos] if self.pos < len(d) else 0
            self.pos += 1
            self.value = ((self.value << 8) | b) & _U32
            self.length = (self.length << 8) & _U32

    def decode_bit(self, m: ArithmeticBitModel) -> int:
        x = m.bit_0_prob * (self.length >> BM_LENGTH_SHIFT)
        if self.value >= x:
            sym = 1
            self.value -= x
            self.length -= x
        else:
            sym = 0
            self.length = x
        if self.length < AC_MIN_LENGTH:
            self._renorm()
        if sym == 0:
            m.bit_0_count += 1
        m.bits_until_update -= 1
        if m.bits_until_update == 0:
            m.update()
        return sym

    def decode_symbol(self, m: ArithmeticModel) -> int:
        y = self.length
        self.length >>= DM_LENGTH_SHIFT
        length = self.length
        value = self.value
        dist = m.distribution
        sym = 0
        x = 0
        n = m.symbols
        k = n >> 1
        while True:
            z = length * dist[k]
            if z > value:
                n = k
                y = z
            else:
                sym = k
                x = z
            k = (sym + n) >> 1
            if k == sym:
                break
        self.value = value - x
        self.length = y - x
        if self.length < AC_MIN_LENGTH:
            self._renorm()
        m.symbol_count[sym] += 1
        m.symbols_until_update -= 1
        if m.symbols_until_update == 0:
            m.update()
        return sym

    def read_bits(self, bits: int) -> int:
        if bits > 19:
            low = self.read_short()
            high = self.read_bits(bits - 16)
            return (high << 16) | low
        self.length >>= bits
        sym = self.value // self.length
        self.value -= self.length * sym
        if self.length < AC_MIN_LENGTH:
            self._renorm()
        return sym

    def read_short(self) -> int:
        self.length >>= 16
        sym = self.value // self.length
        self.value -= self.length * sym
        if self.length < AC_MIN_LENGTH:
            self._renorm()
        return sym

    def read_int(self) -> int:
        low = self.read_short()
        high = self.read_short()
        return (high << 16) | low


class IntegerCompressor:
    """k-bit corrector integer decompression (LASzip integercompressor)."""

    def __init__(self, dec: ArithmeticDecoder, bits: int = 32,
                 contexts: int = 1, bits_high: int = 8) -> None:
        self.dec = dec
        self.bits_high = bits_high
        if bits and bits < 32:
            self.corr_bits = bits
            self.corr_range = 1 << bits
            self.corr_min = -(self.corr_range >> 1)
        else:
            self.corr_bits = 32
            self.corr_range = 0
            self.corr_min = -0x80000000
        self.k = 0
        self.m_bits = [ArithmeticModel(self.corr_bits + 1) for _ in range(contexts)]
        self.m_corrector0 = ArithmeticBitModel()
        self.m_corrector = [None] + [
            ArithmeticModel(1 << min(k, bits_high))
            for k in range(1, self.corr_bits + 1)
        ]

    def _read_corrector(self, context: int) -> int:
        dec = self.dec
        k = dec.decode_symbol(self.m_bits[context])
        self.k = k
        if k:
            if k < 32:
                if k <= self.bits_high:
                    c = dec.decode_symbol(self.m_corrector[k])
                else:
                    k1 = k - self.bits_high
                    c = dec.decode_symbol(self.m_corrector[k])
                    c1 = dec.read_bits(k1)
                    c = (c << k1) | c1
                # fold back into the signed corrector interval
                if c >= (1 << (k - 1)):
                    c += 1
                else:
                    c -= (1 << k) - 1
            else:
                c = self.corr_min
        else:
            c = dec.decode_bit(self.m_corrector0)
        return c

    def decompress(self, pred: int, context: int = 0) -> int:
        real = pred + self._read_corrector(context)
        if self.corr_range:
            if real < 0:
                real += self.corr_range
            elif real >= self.corr_range:
                real -= self.corr_range
        else:  # 32-bit: wrap to int32
            real &= _U32
            if real >= 0x80000000:
                real -= 1 << 32
        return real


class StreamingMedian5:
    __slots__ = ("v", "high")

    def __init__(self) -> None:
        self.v = [0, 0, 0, 0, 0]
        self.high = True

    def add(self, x: int) -> None:
        v = self.v
        if self.high:
            if x < v[2]:
                v[4] = v[3]
                v[3] = v[2]
                if x < v[0]:
                    v[2] = v[1]
                    v[1] = v[0]
                    v[0] = x
                elif x < v[1]:
                    v[2] = v[1]
                    v[1] = x
                else:
                    v[2] = x
            else:
                if x < v[3]:
                    v[4] = v[3]
                    v[3] = x
                else:
                    v[4] = x
                self.high = False
        else:
            if v[2] < x:
                v[0] = v[1]
                v[1] = v[2]
                if v[4] < x:
                    v[2] = v[3]
                    v[3] = v[4]
                    v[4] = x
                elif v[3] < x:
                    v[2] = v[3]
                    v[3] = x
                else:
                    v[2] = x
            else:
                if v[1] < x:
                    v[0] = v[1]
                    v[1] = x
                else:
                    v[0] = x
                self.high = True

    def get(self) -> int:
        return self.v[2]


# return-number context tables (LASzip common v2)
NUMBER_RETURN_MAP = (
    (15, 14, 13, 12, 11, 10, 9, 8),
    (14, 0, 1, 3, 6, 10, 10, 9),
    (13, 1, 2, 4, 7, 11, 11, 10),
    (12, 3, 4, 5, 8, 12, 12, 11),
    (11, 6, 7, 8, 9, 13, 13, 12),
    (10, 10, 11, 12, 13, 14, 14, 13),
    (9, 10, 11, 12, 13, 14, 15, 14),
    (8, 9, 10, 11, 12, 13, 14, 15),
)
NUMBER_RETURN_LEVEL = (
    (0, 1, 2, 3, 4, 5, 6, 7),
    (1, 0, 1, 2, 3, 4, 5, 6),
    (2, 1, 0, 1, 2, 3, 4, 5),
    (3, 2, 1, 0, 1, 2, 3, 4),
    (4, 3, 2, 1, 0, 1, 2, 3),
    (5, 4, 3, 2, 1, 0, 1, 2),
    (6, 5, 4, 3, 2, 1, 0, 1),
    (7, 6, 5, 4, 3, 2, 1, 0),
)


class Point10V2Reader:
    """POINT10 item, record version 2 (the 20-byte format-0 core)."""

    def __init__(self, dec: ArithmeticDecoder, first: bytes) -> None:
        self.dec = dec
        (x, y, z, intensity, flags, classification, scan_angle, user_data,
         psid) = struct.unpack("<3iHBBbBH", first)
        self.x, self.y, self.z = x, y, z
        self.intensity = 0  # v2 quirk: last intensity starts at 0
        self.flags = flags
        self.classification = classification
        self.scan_angle = scan_angle
        self.user_data = user_data
        self.psid = psid

        self.m_changed_values = ArithmeticModel(64)
        self.m_scan_angle_rank = [ArithmeticModel(256), ArithmeticModel(256)]
        self.m_bit_byte: list[ArithmeticModel | None] = [None] * 256
        self.m_classification: list[ArithmeticModel | None] = [None] * 256
        self.m_user_data: list[ArithmeticModel | None] = [None] * 256
        self.ic_intensity = IntegerCompressor(dec, 16, 4)
        self.ic_psid = IntegerCompressor(dec, 16)
        self.ic_dx = IntegerCompressor(dec, 32, 2)
        self.ic_dy = IntegerCompressor(dec, 32, 22)
        self.ic_z = IntegerCompressor(dec, 32, 20)
        self.last_x_diff_median5 = [StreamingMedian5() for _ in range(16)]
        self.last_y_diff_median5 = [StreamingMedian5() for _ in range(16)]
        self.last_intensity = [0] * 16
        self.last_height = [0] * 8

    def read(self) -> tuple:
        dec = self.dec
        changed = dec.decode_symbol(self.m_changed_values)
        if changed:
            if changed & 32:
                if self.m_bit_byte[self.flags] is None:
                    self.m_bit_byte[self.flags] = ArithmeticModel(256)
                self.flags = dec.decode_symbol(self.m_bit_byte[self.flags])
            r = self.flags & 0x07
            n = (self.flags >> 3) & 0x07
            m = NUMBER_RETURN_MAP[n][r]
            level = NUMBER_RETURN_LEVEL[n][r]
            if changed & 16:
                self.intensity = self.ic_intensity.decompress(
                    self.last_intensity[m], m if m < 3 else 3
                )
                self.last_intensity[m] = self.intensity
            else:
                self.intensity = self.last_intensity[m]
            if changed & 8:
                if self.m_classification[self.classification] is None:
                    self.m_classification[self.classification] = ArithmeticModel(256)
                self.classification = dec.decode_symbol(
                    self.m_classification[self.classification]
                )
            if changed & 4:
                scan_dir = (self.flags >> 6) & 1
                val = dec.decode_symbol(self.m_scan_angle_rank[scan_dir])
                self.scan_angle = (val + self.scan_angle) & 0xFF
            if changed & 2:
                if self.m_user_data[self.user_data] is None:
                    self.m_user_data[self.user_data] = ArithmeticModel(256)
                self.user_data = dec.decode_symbol(self.m_user_data[self.user_data])
            if changed & 1:
                self.psid = self.ic_psid.decompress(self.psid)
        else:
            r = self.flags & 0x07
            n = (self.flags >> 3) & 0x07
            m = NUMBER_RETURN_MAP[n][r]
            level = NUMBER_RETURN_LEVEL[n][r]

        # positions: median-predicted dx, k-correlated dy/z contexts
        median = self.last_x_diff_median5[m].get()
        diff = self.ic_dx.decompress(median, 1 if n == 1 else 0)
        self.x += diff
        self.last_x_diff_median5[m].add(diff)

        median = self.last_y_diff_median5[m].get()
        k_bits = self.ic_dx.k
        ctx = (1 if n == 1 else 0) + ((k_bits & 0xFE) if k_bits < 20 else 20)
        diff = self.ic_dy.decompress(median, ctx)
        self.y += diff
        self.last_y_diff_median5[m].add(diff)

        k_bits = (self.ic_dx.k + self.ic_dy.k) // 2
        ctx = (1 if n == 1 else 0) + ((k_bits & 0xFE) if k_bits < 18 else 18)
        self.z = self.ic_z.decompress(self.last_height[level], ctx)
        self.last_height[level] = self.z

        return (self.x, self.y, self.z, self.intensity, self.flags,
                self.classification, self.scan_angle, self.user_data, self.psid)


GPSTIME_MULTI = 500
GPSTIME_MULTI_MINUS = -10
GPSTIME_MULTI_UNCHANGED = GPSTIME_MULTI - GPSTIME_MULTI_MINUS + 1  # 511
GPSTIME_MULTI_CODE_FULL = GPSTIME_MULTI - GPSTIME_MULTI_MINUS + 2  # 512
GPSTIME_MULTI_TOTAL = GPSTIME_MULTI - GPSTIME_MULTI_MINUS + 6  # 516


def _i32(v: int) -> int:
    v &= _U32
    return v - (1 << 32) if v >= 0x80000000 else v


class GpsTime11V2Reader:
    """GPSTIME11 item, record version 2 (multi-sequence delta coding)."""

    def __init__(self, dec: ArithmeticDecoder, first: bytes) -> None:
        self.dec = dec
        self.m_gpstime_multi = ArithmeticModel(GPSTIME_MULTI_TOTAL)
        self.m_gpstime_0diff = ArithmeticModel(6)
        self.ic_gpstime = IntegerCompressor(dec, 32, 9)
        self.last = 0
        self.next = 0
        self.last_gpstime = [0, 0, 0, 0]  # u64 bit patterns of the double
        self.last_gpstime_diff = [0, 0, 0, 0]
        self.multi_extreme_counter = [0, 0, 0, 0]
        self.last_gpstime[0] = struct.unpack("<Q", first)[0]

    def read(self) -> float:
        dec = self.dec
        lg = self.last_gpstime
        lgd = self.last_gpstime_diff
        mec = self.multi_extreme_counter
        if lgd[self.last] == 0:
            multi = dec.decode_symbol(self.m_gpstime_0diff)
            if multi == 1:  # 32-bit difference
                lgd[self.last] = self.ic_gpstime.decompress(0, 0)
                lg[self.last] = (lg[self.last] + lgd[self.last]) & ((1 << 64) - 1)
                mec[self.last] = 0
            elif multi == 2:  # full 64-bit retake
                self.next = (self.next + 1) & 3
                hi = self.ic_gpstime.decompress(_i32(lg[self.last] >> 32), 8)
                v = (hi & _U32) << 32
                v |= dec.read_int()
                lg[self.next] = v
                self.last = self.next
                lgd[self.last] = 0
                mec[self.last] = 0
            elif multi > 2:  # switch sequence
                self.last = (self.last + multi - 2) & 3
                return self.read()
        else:
            multi = dec.decode_symbol(self.m_gpstime_multi)
            if multi == 1:
                d = self.ic_gpstime.decompress(lgd[self.last], 1)
                lg[self.last] = (lg[self.last] + d) & ((1 << 64) - 1)
                mec[self.last] = 0
            elif multi < GPSTIME_MULTI_UNCHANGED:
                if multi == 0:
                    d = self.ic_gpstime.decompress(0, 7)
                    mec[self.last] += 1
                    if mec[self.last] > 3:
                        lgd[self.last] = d
                        mec[self.last] = 0
                elif multi < GPSTIME_MULTI:
                    ctx = 2 if multi < 10 else 3
                    d = self.ic_gpstime.decompress(
                        _i32(multi * lgd[self.last]), ctx
                    )
                elif multi == GPSTIME_MULTI:
                    d = self.ic_gpstime.decompress(
                        _i32(GPSTIME_MULTI * lgd[self.last]), 4
                    )
                    mec[self.last] += 1
                    if mec[self.last] > 3:
                        lgd[self.last] = d
                        mec[self.last] = 0
                else:
                    mneg = GPSTIME_MULTI - multi  # negative multiplier
                    if mneg > GPSTIME_MULTI_MINUS:
                        d = self.ic_gpstime.decompress(
                            _i32(mneg * lgd[self.last]), 5
                        )
                    else:
                        d = self.ic_gpstime.decompress(
                            _i32(GPSTIME_MULTI_MINUS * lgd[self.last]), 6
                        )
                        mec[self.last] += 1
                        if mec[self.last] > 3:
                            lgd[self.last] = d
                            mec[self.last] = 0
                lg[self.last] = (lg[self.last] + d) & ((1 << 64) - 1)
            elif multi == GPSTIME_MULTI_CODE_FULL:
                self.next = (self.next + 1) & 3
                hi = self.ic_gpstime.decompress(_i32(lg[self.last] >> 32), 8)
                v = (hi & _U32) << 32
                v |= dec.read_int()
                lg[self.next] = v
                self.last = self.next
                lgd[self.last] = 0
                mec[self.last] = 0
            elif multi > GPSTIME_MULTI_CODE_FULL:
                self.last = (self.last + multi - GPSTIME_MULTI_CODE_FULL) & 3
                return self.read()
        return struct.unpack("<d", struct.pack("<Q", lg[self.last]))[0]


# --- container level -------------------------------------------------------

LASZIP_VLR_RECORD_ID = 22204
ITEM_POINT10 = 6
ITEM_GPSTIME11 = 7
_ITEM_NAMES = {0: "BYTE", 1: "SHORT", 2: "INT", 3: "LONG", 4: "FLOAT",
               5: "DOUBLE", 6: "POINT10", 7: "GPSTIME11", 8: "RGB12",
               9: "WAVEPACKET13", 10: "POINT14", 11: "RGB14",
               12: "RGBNIR14", 13: "WAVEPACKET14", 14: "BYTE14"}


def parse_laszip_vlr(data: bytes, header: dict) -> dict:
    """Locate + parse the laszip VLR (record id 22204)."""
    pos = header["header_size"]
    for _ in range(header["n_vlrs"]):
        _res, _uid, rid, rlen = struct.unpack_from("<H16sHH", data, pos)
        body = data[pos + 54 : pos + 54 + rlen]
        pos += 54 + rlen
        if rid != LASZIP_VLR_RECORD_ID:
            continue
        (compressor, coder, vmaj, vmin, vrev, options, chunk_size,
         n_special, off_special, num_items) = struct.unpack_from(
            "<HHBBHIIqqH", body, 0
        )
        items = [
            struct.unpack_from("<3H", body, 34 + 6 * i) for i in range(num_items)
        ]
        return {
            "compressor": compressor,
            "coder": coder,
            "version": (vmaj, vmin, vrev),
            "chunk_size": chunk_size,
            "items": items,  # (type, size, version)
        }
    raise ValueError("no laszip VLR found — not a LAZ file?")


def read_laz(data: bytes):
    """LAZ bytes -> (header, x, y, z, classification) float64/uint8 arrays
    — the same surface as :func:`las.read_las`, via full LASzip
    decompression.  Also attaches per-point return numbers and gps times
    on the header dict (``_returns``, ``_gps_time``) for validation."""
    header = read_header(data)
    if not (header["point_format"] & 0x80):
        raise ValueError("not LAZ (compression bit clear) — use las.read_las")
    vlr = parse_laszip_vlr(data, header)
    if vlr["compressor"] not in (1, 2):
        raise ValueError(f"unsupported laszip compressor {vlr['compressor']}")
    for itype, isize, iver in vlr["items"]:
        if (itype, iver) not in ((ITEM_POINT10, 2), (ITEM_GPSTIME11, 2)):
            raise ValueError(
                "unsupported laszip item "
                f"{_ITEM_NAMES.get(itype, itype)} v{iver} (POINT10/GPSTIME11 "
                "v2 supported — the reference fixture's layout)"
            )
    n = header["point_count"]
    pos = header["offset_to_points"]
    if vlr["compressor"] == 2:  # chunked: chunk table offset precedes data
        pos += 8
    chunk_size = vlr["chunk_size"] if vlr["compressor"] == 2 else n

    has_gps = any(t == ITEM_GPSTIME11 for t, _s, _v in vlr["items"])
    xs = np.empty(n, np.int64)
    ys = np.empty(n, np.int64)
    zs = np.empty(n, np.int64)
    cls = np.empty(n, np.uint8)
    rets = np.empty(n, np.uint8)
    gps = np.zeros(n, np.float64)

    i = 0
    while i < n:
        count = min(chunk_size, n - i)
        # chunk: raw first point (all items), then arithmetic-coded rest
        raw10 = data[pos : pos + 20]
        pos += 20
        if has_gps:
            rawgps = data[pos : pos + 8]
            pos += 8
        dec = ArithmeticDecoder(data, pos)
        p10 = Point10V2Reader(dec, raw10)
        gpsr = GpsTime11V2Reader(dec, rawgps) if has_gps else None
        xs[i], ys[i], zs[i] = p10.x, p10.y, p10.z
        cls[i] = p10.classification
        rets[i] = p10.flags & 0x07
        if has_gps:
            gps[i] = struct.unpack("<d", rawgps)[0]
        dec.init()
        for j in range(i + 1, i + count):
            x, y, z, _inten, flags, c, _sa, _ud, _psid = p10.read()
            xs[j], ys[j], zs[j] = x, y, z
            cls[j] = c
            rets[j] = flags & 0x07
            if gpsr is not None:
                gps[j] = gpsr.read()
        pos = dec.pos
        i += count

    sx, sy, sz = header["scale"]
    ox, oy, oz = header["offset"]
    header["_returns"] = rets
    header["_gps_time"] = gps
    return header, xs * sx + ox, ys * sy + oy, zs * sz + oz, cls


def read_laz_file(path: str):
    with open(path, "rb") as f:
        return read_laz(f.read())
