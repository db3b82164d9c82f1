"""Multi-frame GIF (87a/89a) encoder/decoder, stdlib+numpy only.

Implements the public GIF89a specification — logical screen descriptor,
global color table, per-frame graphic control extension + image
descriptor, and the GIF variant of LZW (variable-width codes starting at
``min_code_size + 1`` bits, LSB-first bit packing, CLEAR/EOI codes,
dictionary capped at 4096 with an explicit CLEAR reset) — the same
discipline as the PNG codec in :mod:`lasutility_spark.gridlib.png`:
a real container format implemented from its public spec so the
multimodal video path (m3 frame sampling) decodes real bytes instead of
a stub.

Scope: 8-bit palettes, full-frame images, no interlace, no transparency
(everything the engine's deterministic video fixtures need).  The
decoder additionally tolerates local color tables, interlace-flag-less
sub-8-bit palettes, and deferred clear codes (dictionary full without a
reset), per spec.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE = 4096  # 12-bit cap (GIF89a spec appendix F)


# --- LZW (GIF variant) -----------------------------------------------------


def lzw_encode(indices: np.ndarray, min_code_size: int = 8) -> bytes:
    """Pixel indices -> GIF-LZW byte stream (without sub-block framing)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    seq = np.asarray(indices, dtype=np.uint8).ravel().tolist()

    out_bits = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out_bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    size = min_code_size + 1
    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    emit(clear, size)
    if not seq:
        emit(eoi, size)
    else:
        prefix = seq[0]
        for k in seq[1:]:
            key = (prefix, k)
            got = table.get(key)
            if got is not None:
                prefix = got
                continue
            emit(prefix, size)
            if next_code < _MAX_CODE:
                table[key] = next_code
                if next_code == (1 << size) and size < 12:
                    size += 1
                next_code += 1
            else:
                emit(clear, size)
                table.clear()
                size = min_code_size + 1
                next_code = eoi + 1
            prefix = k
        emit(prefix, size)
        emit(eoi, size)
    if nbits:
        out_bits.append(acc & 0xFF)
    return bytes(out_bits)


def lzw_decode(data: bytes, min_code_size: int = 8) -> np.ndarray:
    """GIF-LZW byte stream (sub-blocks already joined) -> uint8 indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [(i,) for i in range(clear)] + [(), ()]

    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    size = min_code_size + 1
    table = list(base)
    prev: int | None = None
    out: list[int] = []

    while True:
        while nbits < size:
            if pos >= n:
                return np.array(out, dtype=np.uint8)
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << size) - 1)
        acc >>= size
        nbits -= size

        if code == clear:
            table = list(base)
            size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("LZW: first code after clear not a literal")
            out.extend(table[code])
            prev = code
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = table[prev] + (table[prev][0],)
        else:
            raise ValueError(f"LZW: code {code} beyond table ({len(table)})")
        out.extend(entry)
        if len(table) < _MAX_CODE:
            table.append(table[prev] + (entry[0],))
            # the decoder runs one entry BEHIND the encoder (it needs the
            # next code's first symbol to finish an entry), so it must
            # widen when the table reaches 1<<size — one add earlier than
            # the encoder's own bump — to read the next code with the
            # width the encoder used to write it
            if len(table) == (1 << size) and size < 12:
                size += 1
        prev = code
    return np.array(out, dtype=np.uint8)


# --- container -------------------------------------------------------------


def _sub_blocks(data: bytes) -> bytes:
    """Frame data -> <=255-byte length-prefixed sub-blocks + terminator."""
    out = bytearray()
    for off in range(0, len(data), 255):
        chunk = data[off : off + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


GRAY_PALETTE = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)


def gif_encode(
    frames: list[np.ndarray],
    palette: np.ndarray | None = None,
    delay_cs: int = 10,
) -> bytes:
    """uint8 index frames (equal shapes) -> animated GIF89a bytes.

    ``palette``: (256, 3) uint8 RGB table; default grayscale identity
    (index i -> (i, i, i)), which makes index == gray value.
    """
    if not frames:
        raise ValueError("gif_encode: no frames")
    h, w = frames[0].shape
    pal = GRAY_PALETTE if palette is None else np.asarray(palette, np.uint8)
    if pal.shape != (256, 3):
        raise ValueError("palette must be (256, 3)")

    out = bytearray()
    out += b"GIF89a"
    # logical screen descriptor: global color table, 8-bit color res,
    # 256-entry table (packed 0xF7)
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    out += pal.tobytes()
    # NETSCAPE2.0 looping application extension (loop forever)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for fr in frames:
        if fr.shape != (h, w):
            raise ValueError("all frames must share the screen size")
        # graphic control extension: no disposal, no transparency
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        # image descriptor: full frame, no local table, no interlace
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(8)  # LZW min code size
        out += _sub_blocks(lzw_encode(fr, 8))
    out += b"\x3b"
    return bytes(out)


def gif_decode(data: bytes) -> tuple[list[np.ndarray], np.ndarray]:
    """GIF bytes -> (frames as uint8 index arrays, active palette RGB).

    Full-frame, non-interlaced images (what :func:`gif_encode` writes);
    frames placed at an offset are composited onto a zero canvas of the
    logical screen.
    """
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    w, h, packed, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    palette = GRAY_PALETTE
    if packed & 0x80:
        gct_n = 2 << (packed & 0x07)
        palette = (
            np.frombuffer(data, np.uint8, gct_n * 3, pos).reshape(gct_n, 3).copy()
        )
        pos += gct_n * 3

    frames: list[np.ndarray] = []
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks, skip
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected block 0x{b:02x} at {pos}")
        left, top, fw, fh, ipacked = struct.unpack_from("<HHHHB", data, pos + 1)
        pos += 10
        if ipacked & 0x80:  # local color table
            lct_n = 2 << (ipacked & 0x07)
            palette = (
                np.frombuffer(data, np.uint8, lct_n * 3, pos).reshape(lct_n, 3).copy()
            )
            pos += lct_n * 3
        if ipacked & 0x40:
            raise ValueError("interlaced GIF not supported")
        min_code = data[pos]
        pos += 1
        chunks = bytearray()
        while data[pos] != 0:
            ln = data[pos]
            chunks += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = lzw_decode(bytes(chunks), min_code)
        if len(idx) < fw * fh:
            raise ValueError("GIF frame truncated")
        fr = idx[: fw * fh].reshape(fh, fw)
        if (left, top, fw, fh) == (0, 0, w, h):
            frames.append(fr)
        else:
            canvas = np.zeros((h, w), dtype=np.uint8)
            canvas[top : top + fh, left : left + fw] = fr
            frames.append(canvas)
    return frames, palette


def gif_decode_gray(data: bytes) -> list[np.ndarray]:
    """GIF bytes -> grayscale uint8 frames (palette red channel)."""
    frames, palette = gif_decode(data)
    return [palette[f, 0] for f in frames]
