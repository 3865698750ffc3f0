"""Dependency-free media codecs for the multimodal feature extractor.

Pure-Python (struct + zlib) decoders for the three classic uncompressed
/deflate container formats — PNG, BMP, WAV — plus matching encoders so
tests can round-trip real files without image/audio libraries. Derived
entirely from the public format specifications (PNG: RFC 2083 / ISO
15948; BMP: Windows BITMAPINFOHEADER layout; WAV: RIFF/WAVE PCM).

These run inside the Arrow-batched ``mapInPandas`` in
:mod:`.multimodal` — decode is inherently per-item work, but transfer
and scheduling stay batched, and nothing here touches Spark.

Each decoder returns a dict:

    format       'png' | 'bmp' | 'wav'
    width/height pixels (0 for audio)
    channels     color/audio channels
    sample_rate  Hz (0 for images)
    n_frames     pixel rows for images, PCM frames for audio
    mean_q3      mean decoded magnitude scaled by 1000 and rounded
                 half-up to a BIGINT (pixel byte value 0-255 for
                 images, abs 16-bit amplitude for audio) — integerized
                 so results are bit-stable across platforms

or raises ValueError on malformed / unsupported input (caller decides
whether to fall back).
"""

from __future__ import annotations

import struct
import zlib

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _q3(total: int, count: int) -> int:
    """floor(total/count * 1000 + 0.5) in exact integer arithmetic."""
    if count == 0:
        return 0
    return (total * 1000 * 2 + count) // (2 * count)


def sniff(payload: bytes) -> str:
    if payload[:8] == _PNG_MAGIC:
        return "png"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    return "raw"


# --- PNG ------------------------------------------------------------------


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_unfiltered_rows(payload: bytes) -> tuple[int, int, int, list[bytearray]]:
    """Parse IHDR, inflate IDAT, undo per-scanline filters (types 0-4).
    Returns (width, height, channels, unfiltered scanline bytes).
    Supports the common case: 8-bit depth, non-interlaced, color types
    0/2/4/6 (gray/RGB/gray+A/RGBA)."""
    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
        raise ValueError(
            f"unsupported PNG (depth={bit_depth} color={color_type} "
            f"interlace={interlace})"
        )
    channels = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) < height * (stride + 1):
        raise ValueError("PNG pixel data truncated")
    prev = bytearray(stride)
    rows: list[bytearray] = []
    for row in range(height):
        base = row * (stride + 1)
        ftype = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                ul = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        rows.append(line)
        prev = line
    return width, height, channels, rows


def decode_png(payload: bytes) -> dict:
    """PNG pixel stats over the unfiltered scanlines."""
    width, height, channels, rows = _png_unfiltered_rows(payload)
    total = sum(sum(line) for line in rows)
    n_px_bytes = height * width * channels
    return {
        "format": "png",
        "width": width,
        "height": height,
        "channels": channels,
        "sample_rate": 0,
        "n_frames": height,
        "mean_q3": _q3(total, n_px_bytes),
    }


def decode_png_pixels(payload: bytes) -> dict:
    """Full pixel decode: ``rows`` is height lists of width per-pixel
    tuples with ``channels`` components each (the shape
    :func:`encode_png` accepts, so decode->transform->encode
    round-trips)."""
    width, height, channels, lines = _png_unfiltered_rows(payload)
    rows = [
        [tuple(line[i * channels : (i + 1) * channels]) for i in range(width)]
        for line in lines
    ]
    return {"width": width, "height": height, "channels": channels, "rows": rows}


def encode_png(pixels: list[list[tuple]], channels: int = 3) -> bytes:
    """Minimal PNG writer (filter 0, 8-bit, non-interlaced) for tests.
    ``pixels`` is rows of per-pixel tuples with ``channels`` components."""
    height = len(pixels)
    width = len(pixels[0]) if height else 0
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = bytearray()
    for row in pixels:
        raw.append(0)  # filter type 0
        for px in row:
            raw.extend(px)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


# --- BMP ------------------------------------------------------------------


def _bmp_header(payload: bytes) -> tuple[int, int, int, int, int]:
    """Shared 24-bit BITMAPINFOHEADER validation/parse: returns
    (pix_off, width, height, height_raw, stride)."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP")
    (pix_off,) = struct.unpack("<I", payload[10:14])
    (hdr_size,) = struct.unpack("<I", payload[14:18])
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    width, height_raw = struct.unpack("<ii", payload[18:26])
    (bpp,) = struct.unpack("<H", payload[28:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp} comp={compression})")
    height = abs(height_raw)
    stride = (width * 3 + 3) & ~3
    if len(payload) < pix_off + stride * height:
        raise ValueError("BMP pixel data truncated")
    return pix_off, width, height, height_raw, stride


def decode_bmp(payload: bytes) -> dict:
    """24-bit uncompressed BITMAPINFOHEADER BMP (rows 4-byte padded,
    bottom-up or top-down)."""
    pix_off, width, height, _height_raw, stride = _bmp_header(payload)
    row_bytes = width * 3
    total = 0
    for row in range(height):
        base = pix_off + row * stride
        total += sum(payload[base : base + row_bytes])  # padding excluded
    return {
        "format": "bmp",
        "width": width,
        "height": height,
        "channels": 3,
        "sample_rate": 0,
        "n_frames": height,
        "mean_q3": _q3(total, height * row_bytes),
    }


def decode_bmp_pixels(payload: bytes) -> dict:
    """Full pixel decode for the 24-bit BMP subset of
    :func:`decode_bmp`: ``rows`` is top-down lists of (r, g, b) tuples
    (storage is BGR and usually bottom-up; both are normalized)."""
    pix_off, width, height, height_raw, stride = _bmp_header(payload)
    rows = []
    for row in range(height):
        base = pix_off + row * stride
        rows.append(
            [
                (
                    payload[base + i * 3 + 2],
                    payload[base + i * 3 + 1],
                    payload[base + i * 3],
                )
                for i in range(width)
            ]
        )
    if height_raw > 0:  # bottom-up storage -> top-down rows
        rows.reverse()
    return {"width": width, "height": height, "channels": 3, "rows": rows}


def encode_bmp(pixels: list[list[tuple]]) -> bytes:
    """Minimal bottom-up 24-bit BMP writer for tests; pixel tuples are
    (r, g, b) and are stored BGR per the format."""
    height = len(pixels)
    width = len(pixels[0]) if height else 0
    stride = (width * 3 + 3) & ~3
    body = bytearray()
    for row in reversed(pixels):  # bottom-up
        line = bytearray()
        for r, g, b in row:
            line.extend((b, g, r))
        line.extend(b"\x00" * (stride - len(line)))
        body.extend(line)
    pix_off = 14 + 40
    file_size = pix_off + len(body)
    return (
        b"BM"
        + struct.pack("<IHHI", file_size, 0, 0, pix_off)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0)
        + bytes(body)
    )


# --- WAV ------------------------------------------------------------------


def _wav_pcm16(payload: bytes) -> tuple[int, int, tuple]:
    """Shared RIFF chunk walk for the PCM-16 subset: returns
    (channels, sample_rate, interleaved 16-bit samples)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    channels = sample_rate = bits = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt, channels, sample_rate = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
            if fmt != 1:
                raise ValueError(f"unsupported WAV format {fmt}")
        elif cid == b"data":
            data = body
    if channels is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if bits != 16:
        raise ValueError(f"unsupported WAV bit depth {bits}")
    n_samples = len(data) // 2
    return channels, sample_rate, struct.unpack(f"<{n_samples}h", data[: n_samples * 2])


def decode_wav(payload: bytes) -> dict:
    """RIFF/WAVE, PCM (format 1), 16-bit samples."""
    channels, sample_rate, samples = _wav_pcm16(payload)
    total = sum(abs(s) for s in samples)
    return {
        "format": "wav",
        "width": 0,
        "height": 0,
        "channels": channels,
        "sample_rate": sample_rate,
        "n_frames": len(samples) // channels,
        "mean_q3": _q3(total, len(samples)),
    }


def decode_wav_samples(payload: bytes) -> dict:
    """Full sample decode for the PCM-16 subset of :func:`decode_wav`:
    ``samples`` is the interleaved 16-bit integer list (the shape
    :func:`encode_wav` accepts)."""
    channels, sample_rate, samples = _wav_pcm16(payload)
    return {
        "channels": channels,
        "sample_rate": sample_rate,
        "samples": list(samples),
    }


def encode_wav(samples: list[int], sample_rate: int = 8000, channels: int = 1) -> bytes:
    """Minimal PCM-16 WAV writer for tests; ``samples`` are interleaved
    16-bit integers."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    riff_body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


# --- JPEG / GIF (header-only: dimensions + layout; entropy-coded pixel
# data is out of scope for a dependency-free codec — a training-data
# pipeline's filter/bucket stages need dimensions, not pixels) --------------


def decode_jpeg_header(payload: bytes) -> dict:
    """Walk JFIF markers to the first SOF0/1/2 frame header and read
    (precision, height, width, components)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = payload[pos + 1]
        if marker == 0xFF:
            pos += 1  # 0xFF fill/padding byte before the real marker
            continue
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2  # standalone markers carry no length
            continue
        if pos + 4 > len(payload):
            break
        (length,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if marker in (0xC0, 0xC1, 0xC2):  # SOF0 baseline / ext / progressive
            _prec, height, width, comps = struct.unpack(
                ">BHHB", payload[pos + 4 : pos + 10]
            )
            return {
                "format": "jpeg",
                "width": width,
                "height": height,
                "channels": comps,
                "sample_rate": 0,
                "n_frames": 1,
                "mean_q3": 0,  # pixel stats need entropy decode
            }
        if marker == 0xD9:  # EOI
            break
        pos += 2 + length
    raise ValueError("JPEG missing SOF frame header")


def _gif_prologue(payload: bytes):
    """Shared GIF header validation: returns (width, height, pos past
    the logical screen descriptor + global color table) and a sub-block
    skipper bound to this payload."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(payload) < 13:
        raise ValueError("GIF header truncated")
    width, height = struct.unpack("<HH", payload[6:10])
    packed = payload[10]
    pos = 13
    if packed & 0x80:  # global color table present
        pos += 3 * (2 << (packed & 0x07))

    def skip_subblocks(p: int) -> int:
        while p < len(payload):
            size = payload[p]
            p += 1
            if size == 0:
                return p
            p += size
        return p

    return width, height, pos, skip_subblocks


def decode_gif_header(payload: bytes) -> dict:
    """GIF87a/89a logical screen descriptor: width/height (LE) +
    global-color-table depth."""
    # walk the block structure for an EXACT frame count: 0x2C image
    # descriptors (skip 9-byte descriptor + optional local color table
    # + LZW sub-blocks), 0x21 extensions (label + sub-blocks), 0x3B
    # trailer — a bare byte-scan would count 0x2C bytes inside color
    # tables and pixel data
    width, height, pos, _skip_subblocks = _gif_prologue(payload)
    n_frames = 0

    while pos < len(payload):
        block = payload[pos]
        if block == 0x2C:  # image descriptor
            n_frames += 1
            if pos + 10 > len(payload):
                break
            img_packed = payload[pos + 9]
            pos += 10
            if img_packed & 0x80:  # local color table
                pos += 3 * (2 << (img_packed & 0x07))
            pos += 1  # LZW minimum code size
            pos = _skip_subblocks(pos)
        elif block == 0x21:  # extension: label byte + sub-blocks
            pos = _skip_subblocks(pos + 2)
        elif block == 0x3B:  # trailer
            break
        else:
            break  # malformed tail — keep what we counted
    return {
        "format": "gif",
        "width": width,
        "height": height,
        "channels": 3,  # palette-indexed -> RGB
        "sample_rate": 0,
        "n_frames": max(n_frames, 1),
        "mean_q3": 0,
    }


def gif_frame_slices(payload: bytes) -> list[bytes]:
    """Split an animated GIF into per-frame byte slices WITHOUT LZW
    decompression — frame boundaries are pure block structure (GIF89a
    spec §20-22): each frame is one 0x2C image descriptor (9 bytes),
    an optional local color table, the LZW minimum code size byte, and
    its data sub-blocks through the 0-size terminator. The slice for a
    frame also includes any immediately preceding 0x21 extension blocks
    (graphic control extensions bind to the frame that follows).
    Returns the raw slices in frame order; [] for a GIF with no image
    descriptors."""
    _w, _h, pos, _skip_subblocks = _gif_prologue(payload)

    frames: list[bytes] = []
    pending_ext_start = None  # start of extensions bound to the next frame
    while pos < len(payload):
        block = payload[pos]
        if block == 0x2C:
            start = pending_ext_start if pending_ext_start is not None else pos
            pending_ext_start = None
            if pos + 10 > len(payload):
                break
            img_packed = payload[pos + 9]
            pos += 10
            if img_packed & 0x80:
                pos += 3 * (2 << (img_packed & 0x07))
            pos += 1  # LZW minimum code size
            pos = _skip_subblocks(pos)
            frames.append(bytes(payload[start:pos]))
        elif block == 0x21:
            if pending_ext_start is None:
                pending_ext_start = pos
            pos = _skip_subblocks(pos + 2)
        elif block == 0x3B:
            break
        else:
            break
    return frames


DECODERS = {
    "png": decode_png,
    "bmp": decode_bmp,
    "wav": decode_wav,
    "jpeg": decode_jpeg_header,
    "gif": decode_gif_header,
}


def decode_media(payload: bytes) -> dict:
    """Sniff + decode; raises ValueError for raw/unsupported payloads."""
    fmt = sniff(payload)
    if fmt == "raw":
        raise ValueError("unknown media format")
    return DECODERS[fmt](payload)
