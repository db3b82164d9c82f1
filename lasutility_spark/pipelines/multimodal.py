"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image decode is REAL here (the gridlib PNG codec); audio/video decode is
STUBBED behind a deterministic fake (this container ships no media
libraries) — the Spark-side plumbing (schema, Arrow batching,
partitioning, UDF signatures) is production-shaped and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..gridlib.phash import phash64
from ..gridlib.png import png_decode, png_encode

STATS_SCHEMA = (
    "image_id string, w int, h int, px_min double, px_max double, "
    "px_mean double, px_nonzero bigint, phash bigint"
)


def image_decode_stats(images: DataFrame) -> DataFrame:
    """Decode each image tile and emit pixel statistics — the canonical
    'feature extract' kernel shape (mapInPandas, column-pruned scan)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for img_id, data in zip(pdf["image_id"], pdf["bytes"]):
                a = png_decode(bytes(data)).astype(np.float64)
                rows.append(
                    {
                        "image_id": img_id,
                        "w": a.shape[1],
                        "h": a.shape[0],
                        "px_min": float(a.min()),
                        "px_max": float(a.max()),
                        "px_mean": float(a.mean()),
                        "px_nonzero": int((a != 0).sum()),
                        "phash": phash64(a),
                    }
                )
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                columns=[c.split()[0] for c in STATS_SCHEMA.split(", ")]
            )

    return images.select("image_id", "bytes").mapInPandas(run, STATS_SCHEMA)


RESIZE_SCHEMA = "image_id string, bytes binary, w int, h int, fmt string"


def image_resize(images: DataFrame, factor: int = 2) -> DataFrame:
    """Block-mean downsample by an integer factor — real pixels, real
    re-encode; the resize step of a multimodal ingest pipeline."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for img_id, data in zip(pdf["image_id"], pdf["bytes"]):
                a = png_decode(bytes(data))
                h, w = a.shape
                hh, ww = h // factor, w // factor
                small = (
                    a[: hh * factor, : ww * factor]
                    .reshape(hh, factor, ww, factor)
                    .mean(axis=(1, 3))
                    .astype(a.dtype)
                )
                rows.append(
                    {
                        "image_id": img_id,
                        "bytes": png_encode(small),
                        "w": ww,
                        "h": hh,
                        "fmt": "png16" if a.dtype == np.uint16 else "png8",
                    }
                )
            yield pd.DataFrame(rows)

    return images.select("image_id", "bytes").mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = (
    "media_id string, frame_idx int, byte_offset bigint, frame_hash bigint"
)


def frame_sample_stub(media: DataFrame, every_n_bytes: int = 4096) -> DataFrame:
    """STUB video frame sampler: real decoders are unavailable in this
    container, so 'frames' are deterministic fixed-stride byte windows
    hashed with splitmix64.  The Spark plumbing (schema, batching,
    per-media fan-out) is the real production shape; swap the body for a
    PyAV/ffmpeg call on a cluster with codecs installed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..datagen import _splitmix64

        for pdf in batches:
            out = []
            for mid, data in zip(pdf["image_id"], pdf["bytes"]):
                raw = bytes(data)
                for k, off in enumerate(range(0, len(raw), every_n_bytes)):
                    window = raw[off : off + 8].ljust(8, b"\0")
                    h = int(
                        _splitmix64(np.frombuffer(window, dtype=np.uint64))[0]
                        .astype(np.int64)
                    )
                    out.append(
                        {
                            "media_id": mid,
                            "frame_idx": k,
                            "byte_offset": off,
                            "frame_hash": h,
                        }
                    )
            yield pd.DataFrame(out)

    return media.select("image_id", "bytes").mapInPandas(run, FRAME_SCHEMA)
