"""Multimodal plumbing tests: header sniffing, frame-sampling shape,
deterministic feature extraction (decode itself is stubbed — no codec libs
in this container)."""

import struct

import pytest
from pyspark.sql import functions as F


def _png(w, h):
    return (b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR" +
            struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00" + b"x" * 64)


def _gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"y" * 32


def _wav(ch, sr):
    return (b"RIFF" + b"\x00\x00\x00\x00" + b"WAVEfmt " +
            b"\x10\x00\x00\x00" + b"\x01\x00" + struct.pack("<H", ch) +
            struct.pack("<I", sr) + b"\x00" * 128)


def _jpeg(w, h):
    # SOI + SOF0 segment
    sof = b"\xff\xc0" + struct.pack(">H", 8 + 3) + b"\x08" + \
        struct.pack(">HH", h, w) + b"\x03"
    # APP0: len=0x0010 → 14 payload bytes after the length field
    return b"\xff\xd8\xff\xe0" + b"\x00\x10" + b"JFIF\x00" + b"\x00" * 9 + \
        sof + b"z" * 32


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, "http://a.com/i.png", "image", _png(64, 48)),
        (1, "http://a.com/i.gif", "image", _gif(10, 20)),
        (2, "http://a.com/a.wav", "audio", _wav(2, 44100)),
        (3, "http://a.com/i.jpg", "image", _jpeg(32, 16)),
        (4, "http://a.com/x.bin", "video", b"\x00" * 20000),
        (5, "http://a.com/none", "image", None),
    ]
    return spark.createDataFrame(
        rows, "media_id long, url string, modality string, content binary")


def test_attach_media_meta(media):
    from open_source_search_engine_spark.operators.multimodal import (
        attach_media_meta,
    )
    out = {r.media_id: r for r in attach_media_meta(media).collect()}
    assert (out[0].format, out[0].width, out[0].height) == ("png", 64, 48)
    assert (out[1].format, out[1].width, out[1].height) == ("gif", 10, 20)
    assert (out[2].format, out[2].n_channels,
            out[2].sample_rate) == ("wav", 2, 44100)
    assert (out[3].format, out[3].width, out[3].height) == ("jpeg", 32, 16)
    assert out[4].format == "unknown" and not out[4].ok
    assert out[5].format == "empty" and out[5].n_bytes == 0


def test_decode_image_is_stubbed(media):
    from open_source_search_engine_spark.operators.multimodal import (
        decode_image,
    )
    with pytest.raises(NotImplementedError):
        decode_image(media)


def test_sample_frames_shape(media):
    from open_source_search_engine_spark.operators.multimodal import (
        sample_frames,
    )
    out = sample_frames(media.filter("media_id = 4"),
                        stride_bytes=4096, max_frames=3).collect()
    assert [(r.frame_idx, r.offset) for r in out] == \
        [(0, 0), (1, 4096), (2, 8192)]
    assert all(len(r.chunk) == 64 for r in out)


def test_extract_features_deterministic(media, spark):
    from open_source_search_engine_spark.operators.multimodal import (
        extract_features,
    )
    a = {r.media_id: r.embedding
         for r in extract_features(media, dim=8).collect()}
    b = {r.media_id: r.embedding
         for r in extract_features(media, dim=8).collect()}
    assert a == b
    assert len(a[0]) == 8
    assert a[0] != a[1]
    # features feed the ANN operator end-to-end
    from open_source_search_engine_spark.operators.similarity import (
        brute_force_topk,
    )
    emb = extract_features(media, dim=8) \
        .withColumnRenamed("media_id", "vec_id")
    queries = emb.limit(1).select(F.col("vec_id").alias("qid"), "embedding")
    out = brute_force_topk(emb, queries, k=3)
    assert out.count() == 3
