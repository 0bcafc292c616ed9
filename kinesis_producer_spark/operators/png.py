"""Pure-Python + stdlib-zlib PNG codec (no PIL).

Closes the "PNG inflate" decode stub in ``multimodal.decode_media``:
PNG's compression is DEFLATE, which the Python standard library
already ships (``zlib``), so a complete, real PNG decode needs no
external codec — only the chunk walk, the inflate call, and the five
scanline unfilters from the public PNG specification (RFC 2083 /
ISO 15948):

decode: signature + chunk parse (CRC-validated) → concatenate IDAT →
``zlib.decompress`` → per-scanline unfilter (None/Sub/Up/Average/
Paeth) → de-interlace (Adam7) if needed → palette expansion for
color type 3 → uint8 array (H,W) gray or (H,W,C) for RGB/LA/RGBA.

encode (the minimal sibling, used to synthesize deterministic test
and query inputs): per-row filter (caller-chosen, so tests can force
every unfilter path) → ``zlib.compress`` → IHDR/IDAT/IEND.

Supported: all spec bit-depth/color-type combinations — gray (0) at
1/2/4/8/16, RGB (2) at 8/16, palette (3) at 1/2/4/8, gray+alpha (4)
and RGBA (6) at 8/16 — plus tRNS and both interlace methods. Depth
≤8 decodes to uint8, depth 16 to uint16; sub-byte gray samples are
raw unscaled values (a depth-1 white pixel is 1, not 255). Any
combination outside the spec table returns None (the operator seam
in ``multimodal.decode_media`` reports undecodable blobs as nulls).

Scale posture: per-blob Python invoked inside Arrow-batched
``mapInPandas`` stages; blobs never leave executors. The inflate hot
loop is C (stdlib zlib); only the unfilter walk is Python — swap
libpng/PIL in production via the same operator seam.

Reference parity note: the reference repo has no media path (this
family is the LLM-pipeline mandate, not file_flattener.py); format
knowledge is the public PNG spec only.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel (palette is 1 index per pixel)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# color type → legal bit depths (PNG spec §11.2.2)
_ALLOWED_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                   4: (8, 16), 6: (8, 16)}


def _samples(flat: bytes, width: int, height: int, depth: int, chans: int) -> np.ndarray:
    """Unfiltered row bytes → (H, W, C) sample array. depth 8/16 are
    direct views; sub-byte depths (gray/palette, C == 1) unpack MSB-
    first within each scanline, discarding row-padding bits."""
    if depth == 8:
        return np.frombuffer(flat, np.uint8).reshape(height, width, chans)
    if depth == 16:
        return np.frombuffer(flat, ">u2").astype(np.uint16).reshape(
            height, width, chans
        )
    stride = (width * depth + 7) // 8
    rows = np.frombuffer(flat, np.uint8).reshape(height, stride)
    bits = np.unpackbits(rows, axis=1)[:, : width * depth]
    weights = 1 << np.arange(depth - 1, -1, -1)
    vals = (bits.reshape(height, width, depth) * weights).sum(axis=2)
    return vals.astype(np.uint8).reshape(height, width, 1)


# Adam7 pass layout: (x_start, y_start, x_step, y_step)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, stride: int, height: int, bpp: int) -> bytearray | None:
    """Reverse the five PNG scanline filters. ``raw`` is the inflated
    stream: height rows of (1 filter byte + ``stride`` data bytes);
    ``bpp`` is the filter delta distance in BYTES (max(1,
    channels*depth/8) per the spec, so sub-byte depths use 1)."""
    if len(raw) < height * (stride + 1):
        return None
    out = bytearray(height * stride)
    prior = bytearray(stride)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        row = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for x in range(bpp, stride):
                row[x] = (row[x] + row[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                row[x] = (row[x] + prior[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + ((left + prior[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                ul = prior[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + _paeth(left, prior[x], ul)) & 0xFF
        else:
            return None
        out[y * stride : (y + 1) * stride] = row
        prior = row
    return out


def decode_png(b: bytes, max_bytes: int = 4 << 20) -> np.ndarray | None:
    """Decode a PNG blob to pixels: (H,W) for grayscale, else (H,W,C);
    dtype uint8 for bit depth ≤8 (sub-byte gray samples are raw,
    unscaled values) and uint16 for depth 16. Returns None for
    non-PNG, corrupt, oversized, or spec-invalid depth/color input —
    the operator layer reports null rows rather than failing the
    Spark task."""
    if b is None or len(b) > max_bytes or not b.startswith(_SIG):
        return None
    try:
        return _decode_inner(b)
    except Exception:
        return None


def _decode_inner(b: bytes) -> np.ndarray | None:
    pos = len(_SIG)
    ihdr = None
    palette = None
    trns = None
    idat = bytearray()
    while pos + 8 <= len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(b):
            return None
        (crc,) = struct.unpack(">I", b[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            return None
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(data, np.uint8)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        return None
    width, height, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0 or color not in _CHANNELS:
        return None
    if depth not in _ALLOWED_DEPTHS.get(color, ()):
        return None
    if width <= 0 or height <= 0 or interlace not in (0, 1):
        return None
    chans = _CHANNELS[color]
    bpp = max(1, chans * depth // 8)  # filter distance in bytes
    dtype = np.uint16 if depth == 16 else np.uint8
    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        stride = (width * chans * depth + 7) // 8
        flat = _unfilter(raw, stride, height, bpp)
        if flat is None:
            return None
        img = _samples(bytes(flat), width, height, depth, chans)
    else:  # Adam7: each pass is an independently filtered sub-image
        img = np.zeros((height, width, chans), dtype)
        off = 0
        for x0, y0, xs, ys in _ADAM7:
            pw = (width - x0 + xs - 1) // xs
            ph = (height - y0 + ys - 1) // ys
            if pw == 0 or ph == 0:
                continue
            stride = (pw * chans * depth + 7) // 8
            span = ph * (1 + stride)
            flat = _unfilter(raw[off : off + span], stride, ph, bpp)
            if flat is None:
                return None
            off += span
            img[y0::ys, x0::xs] = _samples(bytes(flat), pw, ph, depth, chans)
    if color == 3:
        if palette is None:
            return None
        idx = img[:, :, 0].astype(np.int64)
        if int(idx.max(initial=0)) >= len(palette):
            return None
        rgb = palette[idx]
        if trns is not None:  # palette alpha → RGBA
            alpha = np.full(len(palette), 255, np.uint8)
            alpha[: len(trns)] = trns
            return np.dstack([rgb, alpha[idx]])
        return rgb
    if chans == 1:
        return img[:, :, 0]
    return img


def encode_png(
    arr: np.ndarray,
    filter_type: int = 0,
    interlace: bool = False,
    level: int = 6,
) -> bytes:
    """Encode uint8 (depth 8) or uint16 (depth 16) pixels as PNG.
    ``filter_type`` applies one of the five spec filters to every
    scanline (tests use this to force each unfilter path in the
    decoder); ``interlace`` emits Adam7."""
    a = np.asarray(arr)
    depth = 16 if a.dtype == np.uint16 else 8
    a = a.astype(np.uint16 if depth == 16 else np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if depth == 16:  # big-endian sample bytes, per spec
        a = a.astype(">u2").view(np.uint8).reshape(a.shape[0], a.shape[1], -1)
    height, width, bpp = a.shape
    chans = bpp // 2 if depth == 16 else bpp
    color = {1: 0, 2: 4, 3: 2, 4: 6}[chans]

    def filter_image(sub: np.ndarray) -> bytes:
        ph, pw = sub.shape[:2]
        stride = pw * bpp
        out = bytearray()
        prior = bytearray(stride)
        for y in range(ph):
            row = bytearray(sub[y].tobytes())
            filt = bytearray(stride)
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                up = prior[x]
                ul = prior[x - bpp] if x >= bpp else 0
                if filter_type == 0:
                    filt[x] = row[x]
                elif filter_type == 1:
                    filt[x] = (row[x] - left) & 0xFF
                elif filter_type == 2:
                    filt[x] = (row[x] - up) & 0xFF
                elif filter_type == 3:
                    filt[x] = (row[x] - ((left + up) >> 1)) & 0xFF
                else:
                    filt[x] = (row[x] - _paeth(left, up, ul)) & 0xFF
            out.append(filter_type)
            out += filt
            prior = row
        return bytes(out)

    if not interlace:
        raw = filter_image(a)
    else:
        parts = []
        for x0, y0, xs, ys in _ADAM7:
            sub = a[y0::ys, x0::xs]
            if sub.shape[0] and sub.shape[1]:
                parts.append(filter_image(np.ascontiguousarray(sub)))
        raw = b"".join(parts)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(
        ">IIBBBBB", width, height, depth, color, 0, 0, int(interlace)
    )
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, level))
        + chunk(b"IEND", b"")
    )
