"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference only handles HTML/text (it *detects* media by URL extension
and deletes it — Url::hasMediaExtension, Url.cpp:2470).  A training-data
pipeline instead carries media through: this module gives the Spark-side
plumbing — schema, partition-friendly batch shapes, Arrow-batched
``mapInPandas`` transforms — with the actual codec work behind
``try: import`` gates (PIL/libsndfile are not in this container, so the
decode step falls back to a deterministic metadata-only parser for the
formats the tests generate, and raises ``NotImplementedError`` for real
codec work; swap in the real decoder on a cluster with the libs).

Operators:
- ``attach_media_meta``  : sniff container format + dimensions from headers
                           (PNG/JPEG/GIF/WAV — pure byte parsing, no libs)
- ``decode_image``       : → (pixels array) — STUBBED (real: PIL)
- ``resize_image``       : → thumbnail bytes — STUBBED (real: PIL)
- ``sample_frames``      : video → frame offsets by fixed stride (byte-level
                           plumbing real; frame decode STUBBED)
- ``extract_features``   : deterministic fake embedding from content hash —
                           keeps the downstream ANN pipeline testable
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = ("format string, width int, height int, "
                     "n_channels int, sample_rate int, n_bytes long, ok boolean")


def _sniff(b: bytes | None) -> tuple[str, int, int, int, int]:
    """Header-only parse: (format, width, height, channels, sample_rate)."""
    if not b:
        return ("empty", 0, 0, 0, 0)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        w = int.from_bytes(b[16:20], "big")
        h = int.from_bytes(b[20:24], "big")
        return ("png", w, h, 3, 0)
    if b[:3] == b"\xff\xd8\xff":
        # walk JPEG segments for SOF0/SOF2
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            if marker in (0xC0, 0xC2):
                h = int.from_bytes(b[i + 5: i + 7], "big")
                w = int.from_bytes(b[i + 7: i + 9], "big")
                return ("jpeg", w, h, b[i + 9], 0)
            seglen = int.from_bytes(b[i + 2: i + 4], "big")
            i += 2 + seglen
        return ("jpeg", 0, 0, 0, 0)
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w = int.from_bytes(b[6:8], "little")
        h = int.from_bytes(b[8:10], "little")
        return ("gif", w, h, 3, 0)
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE" and len(b) >= 28:
        ch = int.from_bytes(b[22:24], "little")
        sr = int.from_bytes(b[24:28], "little")
        return ("wav", 0, 0, ch, sr)
    return ("unknown", 0, 0, 0, 0)


def attach_media_meta(df: DataFrame, bin_col: str = "content") -> DataFrame:
    """mapInPandas over Arrow batches: header sniffing, no full decode."""
    cols = df.columns
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", " + MEDIA_META_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_sniff(b) for b in pdf[bin_col]]
            pdf = pdf.copy()
            pdf["format"] = [m[0] for m in metas]
            pdf["width"] = np.array([m[1] for m in metas], dtype="int32")
            pdf["height"] = np.array([m[2] for m in metas], dtype="int32")
            pdf["n_channels"] = np.array([m[3] for m in metas],
                                         dtype="int32")
            pdf["sample_rate"] = np.array([m[4] for m in metas],
                                          dtype="int32")
            pdf["n_bytes"] = np.array(
                [len(b) if b is not None else 0 for b in pdf[bin_col]],
                dtype="int64")
            pdf["ok"] = [m[0] not in ("empty", "unknown") for m in metas]
            yield pdf

    _ = cols
    return df.mapInPandas(run, out_schema)


def decode_image(df: DataFrame, bin_col: str = "content") -> DataFrame:
    """Full pixel decode — requires PIL; STUB raises unless available."""
    try:
        from PIL import Image  # noqa: F401
        have_pil = True
    except ImportError:
        have_pil = False
    if not have_pil:
        raise NotImplementedError(
            "image decode needs PIL (not in this container); the Spark "
            "plumbing (schema/batching) is exercised via "
            "attach_media_meta + extract_features instead")
    raise NotImplementedError("PIL path intentionally deferred")


def sample_frames(df: DataFrame, bin_col: str = "content",
                  stride_bytes: int = 4096, max_frames: int = 8
                  ) -> DataFrame:
    """Video frame-sampling *plumbing*: emit (offset, chunk) rows per blob
    at a fixed byte stride — the real decoder replaces the chunker with
    keyframe extraction; partitioning/explode shape is identical."""
    out_schema = "media_id long, frame_idx int, offset long, chunk binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf[bin_col]):
                if blob is None:
                    continue
                for k in range(min(max_frames,
                                   max(1, len(blob) // stride_bytes))):
                    off = k * stride_bytes
                    rows.append((int(mid), k, off,
                                 bytes(blob[off: off + 64])))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx",
                                              "offset", "chunk"])

    return df.mapInPandas(run, out_schema)


def extract_features(df: DataFrame, bin_col: str = "content",
                     dim: int = 16) -> DataFrame:
    """Deterministic fake feature vector (hash-seeded) so the ANN/dedup
    tier can be tested end-to-end without codecs; a real extractor swaps
    in a model forward pass over the same batch shape."""
    out_schema = "media_id long, embedding array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            ids, vecs = [], []
            for mid, blob in zip(pdf["media_id"], pdf[bin_col]):
                seed = int.from_bytes(
                    hashlib.sha256(blob or b"").digest()[:8], "little")
                rng = np.random.default_rng(seed)
                ids.append(int(mid))
                vecs.append(rng.standard_normal(dim).astype(
                    np.float32).tolist())
            yield pd.DataFrame({"media_id": ids, "embedding": vecs})

    return df.mapInPandas(run, out_schema)


def media_table_schema() -> str:
    """Reference schema for a multimodal corpus table: opaque binary +
    typed metadata, partitioned by (modality, bucket(media_id))."""
    return ("media_id long, url string, modality string, "
            "content binary, warc_ts timestamp, meta map<string,string>")
