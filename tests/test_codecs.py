"""Round-trip tests for the pure-Python media codecs and the multimodal
feature extractor over real encoded files."""

from __future__ import annotations

import pytest

from opentelemetry_collector_contrib_spark.training.codecs import (
    decode_bmp,
    decode_media,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
    sniff,
)
from opentelemetry_collector_contrib_spark.training.multimodal import (
    extract_features,
)

RGB = [
    [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
    [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
]


def test_png_round_trip_rgb():
    png = encode_png(RGB, channels=3)
    assert sniff(png) == "png"
    f = decode_png(png)
    assert (f["width"], f["height"], f["channels"]) == (3, 2, 3)
    total = sum(sum(px) for row in RGB for px in row)
    assert f["mean_q3"] == round(total / 18 * 1000)
    assert f["n_frames"] == 2


def test_png_grayscale_and_alpha():
    gray = [[(0,), (128,)], [(255,), (64,)]]
    f = decode_png(encode_png(gray, channels=1))
    assert (f["width"], f["height"], f["channels"]) == (2, 2, 1)
    assert f["mean_q3"] == round((0 + 128 + 255 + 64) / 4 * 1000)
    rgba = [[(1, 2, 3, 4), (5, 6, 7, 8)]]
    f = decode_png(encode_png(rgba, channels=4))
    assert (f["width"], f["height"], f["channels"]) == (2, 1, 4)


def test_png_all_filter_types_reconstruct():
    """Hand-build IDAT scanlines using filters 1-4; decode must undo
    them to the same pixels as the filter-0 encoding."""
    import struct
    import zlib

    from opentelemetry_collector_contrib_spark.training import codecs

    width, height, channels = 4, 5, 3
    # deterministic pixel field
    pixels = [
        [tuple(((x * 37 + y * 91 + c * 53) % 256) for c in range(channels)) for x in range(width)]
        for y in range(height)
    ]
    plain = decode_png(encode_png(pixels, channels=3))

    # re-encode with a different filter per row and verify identical stats
    def filt(ftype, line, prev, bpp):
        out = bytearray([ftype])
        for i, v in enumerate(line):
            left = line[i - bpp] if i >= bpp else 0
            up = prev[i]
            ul = prev[i - bpp] if i >= bpp else 0
            if ftype == 0:
                out.append(v)
            elif ftype == 1:
                out.append((v - left) & 0xFF)
            elif ftype == 2:
                out.append((v - up) & 0xFF)
            elif ftype == 3:
                out.append((v - ((left + up) >> 1)) & 0xFF)
            else:
                out.append((v - codecs._paeth(left, up, ul)) & 0xFF)
        return out

    stride = width * channels
    prev = bytearray(stride)
    raw = bytearray()
    for y, row in enumerate(pixels):
        line = bytearray(b for px in row for b in px)
        raw.extend(filt(y % 5, line, prev, channels))
        prev = line

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    png = (
        codecs._PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    filtered = decode_png(png)
    assert filtered == plain


def test_bmp_round_trip():
    bmp = encode_bmp(RGB)
    assert sniff(bmp) == "bmp"
    f = decode_bmp(bmp)
    assert (f["width"], f["height"], f["channels"]) == (3, 2, 3)
    total = sum(sum(px) for row in RGB for px in row)
    assert f["mean_q3"] == round(total / 18 * 1000)


def test_wav_round_trip():
    samples = [0, 1000, -1000, 32767, -32768, 500]
    wav = encode_wav(samples, sample_rate=16000, channels=2)
    assert sniff(wav) == "wav"
    f = decode_wav(wav)
    assert f["channels"] == 2 and f["sample_rate"] == 16000
    assert f["n_frames"] == 3
    total = sum(abs(s) for s in samples)
    assert f["mean_q3"] == round(total / 6 * 1000)


def test_decode_media_rejects_raw():
    with pytest.raises(ValueError):
        decode_media(b"plain text payload")


def test_truncated_media_raises():
    png = encode_png(RGB, channels=3)
    with pytest.raises(Exception):
        decode_png(png[:40])
    wav = encode_wav([1, 2, 3])
    with pytest.raises(ValueError):
        decode_wav(wav[:10])


def test_extract_features_real_media_in_spark(spark):
    """End-to-end: real encoded payloads flow through the Arrow-batched
    mapInPandas and come back with decoded dimensions; raw payloads take
    the deterministic fallback."""
    rows = [
        (0, bytearray(encode_png(RGB, channels=3))),
        (1, bytearray(encode_bmp(RGB))),
        (2, bytearray(encode_wav([100, -100, 200, -200], sample_rate=8000))),
        (3, bytearray(b"not media at all")),
    ]
    mm = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in extract_features(mm).collect()}
    assert out[0].format == "png" and (out[0].width, out[0].height) == (3, 2)
    assert out[1].format == "bmp" and out[1].channels == 3
    assert out[2].format == "wav" and out[2].sample_rate == 8000
    assert out[2].n_frames == 4
    assert out[3].format == "raw" and out[3].mean_q3 == 0
    assert out[3].n_bytes == len(b"not media at all")
    # image mean survives the full Spark path
    total = sum(sum(px) for row in RGB for px in row)
    assert out[0].mean_q3 == round(total / 18 * 1000)
    assert out[0].mean_q3 == out[1].mean_q3


def _tiny_jpeg(width=7, height=5):
    import struct
    sof = struct.pack(">BHHB", 8, height, width, 3) + b"\x01\x11\x00\x02\x11\x00\x03\x11\x00"
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    return (
        b"\xff\xd8"                                            # SOI
        + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0  # APP0
        + b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof    # SOF0
        + b"\xff\xd9"                                            # EOI
    )


def _tiny_gif(width=9, height=4):
    import struct
    return (
        b"GIF89a" + struct.pack("<HH", width, height)
        + b"\x00\x00\x00"          # packed, bg, aspect (no GCT)
        + b"\x2c" + b"\x00" * 9    # one image separator block stub
        + b"\x3b"                  # trailer
    )


def test_jpeg_header_decode():
    from opentelemetry_collector_contrib_spark.training.codecs import (
        decode_media, sniff,
    )

    p = _tiny_jpeg()
    assert sniff(p) == "jpeg"
    d = decode_media(p)
    assert (d["width"], d["height"], d["channels"]) == (7, 5, 3)


def test_gif_header_decode():
    from opentelemetry_collector_contrib_spark.training.codecs import (
        decode_media, sniff,
    )

    p = _tiny_gif()
    assert sniff(p) == "gif"
    d = decode_media(p)
    assert (d["width"], d["height"], d["n_frames"]) == (9, 4, 1)


def test_jpeg_missing_sof_rejected():
    import pytest as _pytest

    from opentelemetry_collector_contrib_spark.training.codecs import decode_media

    with _pytest.raises(ValueError):
        decode_media(b"\xff\xd8\xff\xd9")


# --- pixel/sample-level decodes + transforms --------------------------------


def _gif_frame(data=b"\x08\x07", x=0, y=0, w=2, h=2, lct=False):
    import struct

    packed = 0x80 if lct else 0
    body = b"\x2c" + struct.pack("<HHHHB", x, y, w, h, packed)
    if lct:
        body += b"\x00" * 6  # 2-entry local color table
    return body + b"\x02" + bytes([len(data)]) + data + b"\x00"


def _animated_gif(n_frames=3, with_ext=True):
    import struct

    out = b"GIF89a" + struct.pack("<HH", 2, 2) + b"\x00\x00\x00"
    for i in range(n_frames):
        if with_ext:
            # graphic control extension bound to the frame after it
            out += b"\x21\xf9\x04\x00\x0a\x00\x00\x00"
        out += _gif_frame(data=bytes([i + 1, i + 2]), lct=(i == 1))
    return out + b"\x3b"


def test_png_pixels_round_trip():
    from opentelemetry_collector_contrib_spark.training.codecs import (
        decode_png_pixels,
    )

    png = encode_png(RGB, channels=3)
    d = decode_png_pixels(png)
    assert (d["width"], d["height"], d["channels"]) == (3, 2, 3)
    assert d["rows"] == RGB


def test_bmp_pixels_round_trip_top_down_normalized():
    from opentelemetry_collector_contrib_spark.training.codecs import (
        decode_bmp_pixels,
    )

    bmp = encode_bmp(RGB)  # writer stores bottom-up BGR
    d = decode_bmp_pixels(bmp)
    assert (d["width"], d["height"], d["channels"]) == (3, 2, 3)
    assert d["rows"] == RGB  # normalized back to top-down RGB


def test_wav_samples_round_trip():
    from opentelemetry_collector_contrib_spark.training.codecs import (
        decode_wav_samples,
    )

    samples = [0, 100, -100, 32767, -32768, 7]
    wav = encode_wav(samples, sample_rate=16000, channels=2)
    d = decode_wav_samples(wav)
    assert d["channels"] == 2
    assert d["sample_rate"] == 16000
    assert d["samples"] == samples


def test_gif_frame_slices_structure():
    from opentelemetry_collector_contrib_spark.training.codecs import (
        decode_gif_header,
        gif_frame_slices,
    )

    gif = _animated_gif(n_frames=3)
    assert decode_gif_header(gif)["n_frames"] == 3
    slices = gif_frame_slices(gif)
    assert len(slices) == 3
    # each slice starts at its bound extension and reassembles the file
    for s in slices:
        assert s[0] == 0x21  # graphic control extension first
        assert 0x2C in s
    header = gif[: 6 + 4 + 3]
    assert header + b"".join(slices) + b"\x3b" == gif
    # reassembled single-frame gif still parses with 1 frame
    single = header + slices[1] + b"\x3b"
    assert decode_gif_header(single)["n_frames"] == 1
    assert gif_frame_slices(single) == [slices[1]]


def test_resize_images_nearest_neighbor(spark):
    from opentelemetry_collector_contrib_spark.training.multimodal import (
        resize_images,
    )
    from opentelemetry_collector_contrib_spark.training.codecs import (
        decode_png_pixels,
    )

    # 4x4 checkerboard of 2x2 blocks -> 2x2 resize picks block corners
    A, B = (255, 0, 0), (0, 0, 255)
    board = [
        [A, A, B, B],
        [A, A, B, B],
        [B, B, A, A],
        [B, B, A, A],
    ]
    rows = [
        (1, bytearray(encode_png(board, channels=3))),
        (2, bytearray(encode_bmp(board))),
        (3, bytearray(b"not an image")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in resize_images(df, 2, 2).collect()}
    assert got[1].ok and got[1].format == "png"
    assert got[2].ok and got[2].format == "bmp"
    assert not got[3].ok and got[3].payload is None and got[3].err
    for doc_id in (1, 2):
        d = decode_png_pixels(bytes(got[doc_id].payload))
        # nearest-neighbor src index floor(i*4/2) = {0,2} -> corners
        assert d["rows"] == [[A, B], [B, A]]


def test_sample_audio_decimates(spark):
    from opentelemetry_collector_contrib_spark.training.multimodal import (
        sample_audio,
    )
    from opentelemetry_collector_contrib_spark.training.codecs import (
        decode_wav_samples,
    )

    # stereo frames: (i, -i) for i in 0..9; every_k=2 keeps frames 0,2,4,6,8
    samples = []
    for i in range(10):
        samples += [i, -i]
    rows = [(7, bytearray(encode_wav(samples, sample_rate=8000, channels=2)))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    r = sample_audio(df, 2).collect()[0]
    assert r.ok and r.sample_rate == 4000 and r.n_frames == 5
    d = decode_wav_samples(bytes(r.payload))
    assert d["samples"] == [0, 0, 2, -2, 4, -4, 6, -6, 8, -8]
    # non-wav -> ok=false row kept
    bad = spark.createDataFrame(
        [(8, bytearray(b"xx"))], "doc_id long, payload binary"
    )
    rb = sample_audio(bad, 2).collect()[0]
    assert not rb.ok and rb.err


def test_sample_gif_frames_spark(spark):
    from opentelemetry_collector_contrib_spark.training.multimodal import (
        sample_gif_frames,
    )

    gif = _animated_gif(n_frames=5)
    rows = [(1, bytearray(gif)), (2, bytearray(b"png? no"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = sample_gif_frames(df, every_k=2).collect()
    # doc 2 is not a gif -> contributes no rows; doc 1 keeps frames 0,2,4
    assert sorted((r.doc_id, r.frame_idx) for r in got) == [(1, 0), (1, 2), (1, 4)]
    assert all(r.n_frames_total == 5 for r in got)
    assert all(r.frame[0] == 0x21 for r in got)
