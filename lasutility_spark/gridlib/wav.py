"""RIFF/WAVE PCM codec — pure numpy, implemented from the public spec
(Microsoft/IBM "Multimedia Programming Interface and Data
Specifications 1.0", Aug 1991; format-tag registry per RFC 2361).

Scope: mono 16-bit little-endian integer PCM (format tag 1).  The
encoder emits the canonical RIFF(WAVE(fmt ,data)) layout; the decoder
walks the chunk list — skipping unknown chunks (LIST, fact, cue …) and
honoring the spec's 16-bit word alignment (odd-sized chunks carry a pad
byte) — so any conforming PCM16-mono file decodes, not just this
encoder's output.  Everything else raises ValueError with the offending
field named.

The reference engine has no audio path; this module serves the
multimodal training-data pipeline (SURVEY "beyond the reference"
scope), mirroring gridlib/gif.py for video and gridlib/png.py for
images.
"""

from __future__ import annotations

import struct

import numpy as np


def wav_encode(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Encode a mono int16 sample vector as a PCM16 WAV file."""
    s = np.asarray(samples)
    if s.dtype != np.int16:
        raise ValueError(f"wav_encode: int16 samples required, got {s.dtype}")
    if s.ndim != 1:
        raise ValueError(f"wav_encode: mono 1-D stream required, got ndim={s.ndim}")
    data = s.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(buf: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM16-mono WAV file -> (int16 samples, sample_rate).

    Chunk-walks the RIFF body: unknown chunks are skipped (with odd-size
    pad alignment), ``fmt `` and ``data`` may appear in any order, and
    declared sizes are validated against the buffer.
    """
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("wav_decode: not a RIFF/WAVE stream")
    riff_size = struct.unpack_from("<I", buf, 4)[0]
    if riff_size + 8 > len(buf):
        raise ValueError("wav_decode: truncated stream (RIFF size past end)")
    pos, end = 12, 8 + riff_size
    fmt = data = None
    while pos + 8 <= end:
        cid = buf[pos : pos + 4]
        size = struct.unpack_from("<I", buf, pos + 4)[0]
        pos += 8
        if pos + size > end:
            raise ValueError(f"wav_decode: chunk {cid!r} size past end")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("wav_decode: fmt chunk shorter than 16 bytes")
            fmt = struct.unpack_from("<HHIIHH", buf, pos)
        elif cid == b"data":
            data = buf[pos : pos + size]
        pos += size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("wav_decode: missing fmt or data chunk")
    tag, channels, rate, _byte_rate, _block_align, bits = fmt
    if tag != 1:
        raise ValueError(f"wav_decode: non-PCM format tag {tag}")
    if channels != 1:
        raise ValueError(f"wav_decode: {channels} channels (mono only)")
    if bits != 16:
        raise ValueError(f"wav_decode: {bits}-bit samples (16-bit only)")
    if len(data) % 2:
        raise ValueError("wav_decode: odd data-chunk byte length for PCM16")
    return np.frombuffer(data, dtype="<i2").astype(np.int16), int(rate)


def audio_stats(samples: np.ndarray) -> dict:
    """Integer-exact clip statistics — the shared formula both the
    datagen oracle (source samples, before container encoding) and the
    engine (samples recovered through a full WAV decode) apply; parity
    therefore proves the codec round trip, the m3 independence shape."""
    s = np.asarray(samples, dtype=np.int64)
    return {
        "n_samples": int(s.size),
        "peak": int(np.abs(s).max()) if s.size else 0,
        "sumsq": int((s * s).sum()),
        "zero_crossings": int(((s[:-1] >= 0) != (s[1:] >= 0)).sum()),
    }


def decimate_mean(samples: np.ndarray, factor: int) -> np.ndarray:
    """Block-mean decimation by an integer factor, integer-exact
    (floor-division mean, numpy semantics) — the audio analog of the m2
    block-mean image resize."""
    s = np.asarray(samples)
    n = (s.size // factor) * factor
    out = s[:n].astype(np.int64).reshape(-1, factor).sum(axis=1) // factor
    return out.astype(np.int16)
