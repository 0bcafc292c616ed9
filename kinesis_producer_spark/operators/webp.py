"""VP8L (lossless WebP) codec — pure Python, no libwebp.

Upgrades the WebP path from header-parse-only to REAL pixel decode for
the lossless flavor. Everything here derives from the public WebP
lossless bitstream specification (RFC 9649 / the VP8L spec):

decode: RIFF/WEBP container walk → VP8L chunk → LSB-first bitstream:
14-bit dimensions; up to four transforms (predictor, color transform,
subtract-green, color-indexing — each with its own recursively
entropy-coded tile/palette image); optional color cache; optional
meta-Huffman tiling; five canonical prefix codes per entropy group
(green+length+cache, red, blue, alpha, distance); LZ77 backward
references with the prefix-coded length/distance scheme and the
120-entry 2D distance neighborhood map; then the inverse transforms
applied in reverse read order.

encode (the coverage sibling — synthesizes deterministic test/query
inputs, not a compression contender): literals with flat complete
canonical codes (simple 1/2-symbol codes where legal), run-length
LZ77 (distance 1) to exercise length/distance prefix coding, optional
color cache, and optional subtract-green / constant-mode predictor /
constant-element color transform / palette(color-indexing incl.
sub-byte pixel packing) — so every inverse-transform path in the
decoder is round-trip coverable, parametrized over all 14 predictor
modes.

Lossy WebP (VP8 chunks — boolean-coder intra frames) still needs
libwebp and stays a dependency-gated None at the operator seam.

Scale posture: identical to the other codecs — per-blob kernels
inside Arrow ``mapInPandas`` stages via the multimodal kernel seam;
swap libwebp in production through the same seam.

Reference parity note: the reference repo has no media path; format
knowledge is the public WebP lossless spec only.
"""

from __future__ import annotations

import numpy as np

__all__ = ["decode_webp_lossless", "encode_webp_lossless"]


# ---------------------------------------------------------------------------
# Bit I/O (VP8L is LSB-first)
# ---------------------------------------------------------------------------


class _LSBReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.byte_pos = 0
        self.bit_pos = 0

    def read_bit(self) -> int:
        if self.byte_pos >= len(self.data):
            raise EOFError("VP8L bitstream exhausted")
        bit = (self.data[self.byte_pos] >> self.bit_pos) & 1
        self.bit_pos += 1
        if self.bit_pos == 8:
            self.bit_pos = 0
            self.byte_pos += 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            v |= self.read_bit() << i
        return v


class _LSBWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write_bits(self, v: int, n: int) -> None:
        for i in range(n):
            self.acc |= ((v >> i) & 1) << self.nbits
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def write_code(self, code: int, length: int) -> None:
        """Huffman codes pack MSB-of-code first (DEFLATE convention)."""
        for i in range(length - 1, -1, -1):
            self.write_bits((code >> i) & 1, 1)

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


# ---------------------------------------------------------------------------
# Canonical prefix codes (DEFLATE-style assignment)
# ---------------------------------------------------------------------------


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol → (length, code), canonical: by length then symbol."""
    by_len: dict[int, list[int]] = {}
    for sym, ln in lengths.items():
        if ln > 0:
            by_len.setdefault(ln, []).append(sym)
    code = 0
    out: dict[int, tuple[int, int]] = {}
    for ln in range(1, 16):
        for sym in sorted(by_len.get(ln, [])):
            out[sym] = (ln, code)
            code += 1
        code <<= 1
    return out


class _PrefixCode:
    """Decoder-side canonical prefix code; single-symbol codes consume
    zero bits (the VP8L simple-code degenerate case)."""

    def __init__(self, lengths: dict[int, int]) -> None:
        nz = [s for s, ln in lengths.items() if ln > 0]
        if len(nz) == 1:
            self.single = nz[0]
            self.table = {}
            return
        self.single = None
        self.table = {
            (ln, code): sym for sym, (ln, code) in _canonical_codes(lengths).items()
        }
        if not self.table:
            raise ValueError("empty prefix code")

    def read(self, r: _LSBReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, 16):
            code = (code << 1) | r.read_bit()
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid VP8L prefix code")


def _flat_lengths(symbols: list[int]) -> dict[int, int]:
    """Complete (Kraft-equality) canonical lengths independent of
    frequency: with k symbols and L = ceil(log2(k)), the first
    2^L − k symbols get length L−1 and the rest length L — suboptimal
    but always a COMPLETE code, which VP8L requires."""
    syms = sorted(set(symbols))
    k = len(syms)
    if k == 1:
        return {syms[0]: 1}
    L = (k - 1).bit_length()
    n_short = (1 << L) - k
    return {s: (L - 1 if i < n_short else L) for i, s in enumerate(syms)}


# code-length-code symbol transmission order (spec constant)
_CLCL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

# prefix-coded value scheme shared by LZ77 lengths and distances
def _prefix_decode_value(code: int, r: _LSBReader) -> int:
    if code < 4:
        return code + 1
    n_extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << n_extra
    return offset + r.read_bits(n_extra) + 1


def _prefix_encode_value(v: int) -> tuple[int, int, int]:
    """value ≥ 1 → (code, n_extra_bits, extra)."""
    shifted = v - 1
    if shifted < 4:
        return shifted, 0, 0
    highest = shifted.bit_length() - 1
    second = (shifted >> (highest - 1)) & 1
    code = 2 * highest + second
    n_extra = highest - 1
    extra = shifted & ((1 << n_extra) - 1)
    return code, n_extra, extra


# 120-entry 2D distance neighborhood: the spec's code→(dx, dy) table,
# generated by its own ordering rule — offsets in the window
# dx ∈ [-8, 8], dy ∈ [0, 8] (strictly before the current pixel),
# sorted by squared euclidean distance, then larger dy first, then
# positive dx before negative. The first 120 entries ARE the table
# (the generated prefix matches the spec's explicit listing).
_DIST_MAP = sorted(
    (
        (dx, dy)
        for dy in range(0, 9)
        for dx in range(-8, 9)
        if dy > 0 or dx > 0
    ),
    key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], 0 if p[0] >= 0 else 1),
)[:120]


def _plane_code_to_distance(xsize: int, code: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    dist = dx + dy * xsize
    return dist if dist >= 1 else 1


# ---------------------------------------------------------------------------
# Pixel helpers (ARGB as uint32)
# ---------------------------------------------------------------------------


def _argb(a: int, r: int, g: int, b: int) -> int:
    return (a << 24) | (r << 16) | (g << 8) | b


def _split(p: int) -> tuple[int, int, int, int]:
    return (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF


def _add_px(x: int, y: int) -> int:
    """Per-channel modular add."""
    return (
        (((x >> 24) + (y >> 24)) & 0xFF) << 24
        | (((x >> 16 & 0xFF) + (y >> 16 & 0xFF)) & 0xFF) << 16
        | (((x >> 8 & 0xFF) + (y >> 8 & 0xFF)) & 0xFF) << 8
        | (((x & 0xFF) + (y & 0xFF)) & 0xFF)
    )


def _sub_px(x: int, y: int) -> int:
    return (
        (((x >> 24) - (y >> 24)) & 0xFF) << 24
        | (((x >> 16 & 0xFF) - (y >> 16 & 0xFF)) & 0xFF) << 16
        | (((x >> 8 & 0xFF) - (y >> 8 & 0xFF)) & 0xFF) << 8
        | (((x & 0xFF) - (y & 0xFF)) & 0xFF)
    )


def _avg2(x: int, y: int) -> int:
    return (
        (((x >> 24) + (y >> 24)) >> 1) << 24
        | ((((x >> 16) & 0xFF) + ((y >> 16) & 0xFF)) >> 1) << 16
        | ((((x >> 8) & 0xFF) + ((y >> 8) & 0xFF)) >> 1) << 8
        | (((x & 0xFF) + (y & 0xFF)) >> 1)
    )


def _clamp255(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _select(t: int, l_: int, tl: int) -> int:
    pa = sum(abs((l_ >> s & 0xFF) - (tl >> s & 0xFF)) for s in (24, 16, 8, 0))
    pb = sum(abs((t >> s & 0xFF) - (tl >> s & 0xFF)) for s in (24, 16, 8, 0))
    return t if pa <= pb else l_


def _clamp_add_sub_full(a: int, b: int, c: int) -> int:
    out = 0
    for s in (24, 16, 8, 0):
        out |= _clamp255((a >> s & 0xFF) + (b >> s & 0xFF) - (c >> s & 0xFF)) << s
    return out


def _clamp_add_sub_half(ave: int, c: int) -> int:
    out = 0
    for s in (24, 16, 8, 0):
        a = ave >> s & 0xFF
        d = a - (c >> s & 0xFF)
        # C truncation toward zero, not Python floor
        half = -((-d) >> 1) if d < 0 else d >> 1
        out |= _clamp255(a + half) << s
    return out


def _predict(mode: int, l_: int, t: int, tr: int, tl: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l_
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l_, tr), t)
    if mode == 6:
        return _avg2(l_, tl)
    if mode == 7:
        return _avg2(l_, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l_, tl), _avg2(t, tr))
    if mode == 11:
        return _select(t, l_, tl)
    if mode == 12:
        return _clamp_add_sub_full(l_, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(_avg2(l_, t), tl)
    raise ValueError(f"predictor mode {mode}")


def _s8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: signed-int8 product >> 5."""
    return (_s8(t) * _s8(c)) >> 5


_CACHE_MULT = 0x1E35A7BD


def _cache_key(pix: int, bits: int) -> int:
    return ((_CACHE_MULT * pix) & 0xFFFFFFFF) >> (32 - bits)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_webp_lossless(b: bytes, max_bytes: int = 4 << 20) -> np.ndarray | None:
    """Decode a lossless (VP8L) WebP blob to a uint8 (H, W, 4) RGBA
    array. None for non-WebP, lossy-VP8, corrupt, or oversized input
    (PERMISSIVE poisoned-blob contract, like the other codecs)."""
    if b is None or len(b) > max_bytes or len(b) < 20:
        return None
    if b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        return None
    try:
        payload = None
        pos = 12
        while pos + 8 <= len(b):
            fourcc = b[pos : pos + 4]
            size = int.from_bytes(b[pos + 4 : pos + 8], "little")
            if fourcc == b"VP8L":
                payload = b[pos + 8 : pos + 8 + size]
                break
            pos += 8 + size + (size & 1)
        if payload is None or not payload or payload[0] != 0x2F:
            return None
        r = _LSBReader(payload[1:])
        w = r.read_bits(14) + 1
        h = r.read_bits(14) + 1
        r.read_bits(1)  # alpha hint
        if r.read_bits(3) != 0:  # version
            return None
        pixels = _decode_image_stream(r, w, h, is_level0=True)
        arr = np.zeros((h, w, 4), np.uint8)
        for y in range(h):
            row = pixels[y * w : (y + 1) * w]
            for x, p in enumerate(row):
                a, red, g, blue = _split(p)
                arr[y, x] = (red, g, blue, a)
        return arr
    except (ValueError, EOFError, IndexError, KeyError, OverflowError):
        return None


def _read_prefix_code(r: _LSBReader, alphabet_size: int) -> _PrefixCode:
    if r.read_bit():  # simple code
        num_symbols = r.read_bit() + 1
        if r.read_bit():
            sym0 = r.read_bits(8)
        else:
            sym0 = r.read_bits(1)
        lengths = {sym0: 1}
        if num_symbols == 2:
            lengths[r.read_bits(8)] = 1
        if num_symbols == 1:
            return _PrefixCode({sym0: 1})
        return _PrefixCode(lengths)
    # code-length-coded
    num_codes = r.read_bits(4) + 4
    clcl = {}
    for i in range(num_codes):
        clcl[_CLCL_ORDER[i]] = r.read_bits(3)
    cl_code = _PrefixCode({s: ln for s, ln in clcl.items() if ln > 0})
    if r.read_bit():  # use max_symbol
        length_nbits = 2 + 2 * r.read_bits(3)
        max_symbol = 2 + r.read_bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths: dict[int, int] = {}
    prev_len = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        code_len = cl_code.read(r)
        if code_len < 16:
            if code_len:
                lengths[symbol] = code_len
                prev_len = code_len
            symbol += 1
        elif code_len == 16:
            rep = r.read_bits(2) + 3
            for _ in range(rep):
                if symbol < alphabet_size:
                    lengths[symbol] = prev_len
                    symbol += 1
        elif code_len == 17:
            symbol += r.read_bits(3) + 3
        else:
            symbol += r.read_bits(7) + 11
    return _PrefixCode(lengths)


def _decode_image_stream(
    r: _LSBReader, xsize: int, ysize: int, is_level0: bool
) -> list[int]:
    transforms = []
    if is_level0:
        seen = set()
        while r.read_bit():
            ttype = r.read_bits(2)
            if ttype in seen:
                raise ValueError("duplicate transform")
            seen.add(ttype)
            if ttype == 0 or ttype == 1:  # predictor / color transform
                size_bits = r.read_bits(3) + 2
                bx = -(-xsize // (1 << size_bits))
                by = -(-ysize // (1 << size_bits))
                tiles = _decode_image_stream(r, bx, by, False)
                transforms.append((ttype, size_bits, tiles))
            elif ttype == 2:  # subtract green
                transforms.append((2, None, None))
            else:  # color indexing
                num_colors = r.read_bits(8) + 1
                deltas = _decode_image_stream(r, num_colors, 1, False)
                palette = []
                acc = 0
                for d in deltas:
                    acc = _add_px(acc, d) if palette else d
                    palette.append(acc)
                if num_colors > 16:
                    width_bits = 0
                elif num_colors > 4:
                    width_bits = 1
                elif num_colors > 2:
                    width_bits = 2
                else:
                    width_bits = 3
                transforms.append((3, (width_bits, xsize), palette))
                if width_bits:
                    xsize = -(-xsize // (1 << width_bits))

    cache_bits = 0
    if r.read_bit():
        cache_bits = r.read_bits(4)
        if not (1 <= cache_bits <= 11):
            raise ValueError("bad cache bits")
    cache_size = (1 << cache_bits) if cache_bits else 0

    meta = None
    n_groups = 1
    huff_bits = 0
    if is_level0 and r.read_bit():  # meta-Huffman
        huff_bits = r.read_bits(3) + 2
        mx = -(-xsize // (1 << huff_bits))
        my = -(-ysize // (1 << huff_bits))
        meta = _decode_image_stream(r, mx, my, False)
        n_groups = max(((p >> 8) & 0xFFFF) for p in meta) + 1

    green_alpha = 256 + 24 + cache_size
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_prefix_code(r, green_alpha),
                _read_prefix_code(r, 256),
                _read_prefix_code(r, 256),
                _read_prefix_code(r, 256),
                _read_prefix_code(r, 40),
            )
        )

    n = xsize * ysize
    pixels: list[int] = []
    cache = [0] * cache_size
    mx_tiles = -(-xsize // (1 << huff_bits)) if meta is not None else 0
    while len(pixels) < n:
        if meta is not None:
            i = len(pixels)
            tx = (i % xsize) >> huff_bits
            ty = (i // xsize) >> huff_bits
            gp = (meta[ty * mx_tiles + tx] >> 8) & 0xFFFF
            g_code, r_code, b_code, a_code, d_code = groups[gp]
        else:
            g_code, r_code, b_code, a_code, d_code = groups[0]
        sym = g_code.read(r)
        if sym < 256:  # literal
            red = r_code.read(r)
            blue = b_code.read(r)
            alpha = a_code.read(r)
            pix = _argb(alpha, red, sym, blue)
            pixels.append(pix)
            if cache_size:
                cache[_cache_key(pix, cache_bits)] = pix
        elif sym < 256 + 24:  # LZ77 backward reference
            length = _prefix_decode_value(sym - 256, r)
            dcode = _prefix_decode_value(d_code.read(r), r)
            dist = _plane_code_to_distance(xsize, dcode)
            if dist > len(pixels):
                raise ValueError("LZ77 distance before image start")
            for _ in range(length):
                pix = pixels[-dist]
                pixels.append(pix)
                if cache_size:
                    cache[_cache_key(pix, cache_bits)] = pix
            if len(pixels) > n:
                raise ValueError("LZ77 overrun")
        else:  # color-cache hit
            if not cache_size:
                raise ValueError("cache symbol without cache")
            pixels.append(cache[sym - 256 - 24])

    for t in reversed(transforms):
        pixels, xsize = _inverse_transform(t, pixels, xsize, ysize)
    return pixels


def _inverse_transform(t, pixels: list[int], xsize: int, ysize: int):
    ttype, arg, data = t
    if ttype == 2:  # add green
        out = []
        for p in pixels:
            g = (p >> 8) & 0xFF
            out.append(
                (p & 0xFF000000)
                | ((((p >> 16 & 0xFF) + g) & 0xFF) << 16)
                | (g << 8)
                | (((p & 0xFF) + g) & 0xFF)
            )
        return out, xsize
    if ttype == 0:  # predictor
        size_bits, tiles = arg, data
        bx = -(-xsize // (1 << size_bits))
        out: list[int] = []
        for y in range(ysize):
            for x in range(xsize):
                if x == 0 and y == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = out[-1]  # left
                elif x == 0:
                    pred = out[(y - 1) * xsize]  # top
                else:
                    mode = (tiles[(y >> size_bits) * bx + (x >> size_bits)] >> 8) & 0xFF
                    l_ = out[-1]
                    t_ = out[(y - 1) * xsize + x]
                    tl = out[(y - 1) * xsize + x - 1]
                    # TR at the rightmost column follows the contiguous-
                    # buffer semantics of the spec: buffer[(y-1)*w+x+1],
                    # which is the CURRENT row's first (already decoded)
                    # pixel
                    tr = out[(y - 1) * xsize + x + 1]
                    pred = _predict(mode, l_, t_, tr, tl)
                out.append(_add_px(pixels[y * xsize + x], pred))
        return out, xsize
    if ttype == 1:  # color transform
        size_bits, tiles = arg, data
        bx = -(-xsize // (1 << size_bits))
        out = []
        for y in range(ysize):
            for x in range(xsize):
                cte = tiles[(y >> size_bits) * bx + (x >> size_bits)]
                g2r = cte & 0xFF  # blue byte holds green_to_red
                g2b = (cte >> 8) & 0xFF
                r2b = (cte >> 16) & 0xFF
                p = pixels[y * xsize + x]
                a, red, g, blue = _split(p)
                red = (red + _ct_delta(g2r, g)) & 0xFF
                blue = (blue + _ct_delta(g2b, g) + _ct_delta(r2b, red)) & 0xFF
                out.append(_argb(a, red, g, blue))
        return out, xsize
    if ttype == 3:  # color indexing
        (width_bits, orig_xsize), palette = arg, data
        out = []
        if width_bits == 0:
            for p in pixels:
                idx = (p >> 8) & 0xFF
                out.append(palette[idx] if idx < len(palette) else 0)
            return out, xsize
        ppp = 1 << width_bits  # pixels per packed byte
        bpp = 8 >> width_bits  # bits per pixel index
        mask = (1 << bpp) - 1
        packed_x = xsize
        for y in range(ysize):
            for x in range(orig_xsize):
                packed = pixels[y * packed_x + (x >> width_bits)]
                idx = ((packed >> 8) & 0xFF) >> (bpp * (x % ppp)) & mask
                out.append(palette[idx] if idx < len(palette) else 0)
        return out, orig_xsize
    raise ValueError(f"transform {ttype}")


# ---------------------------------------------------------------------------
# Encoder (coverage sibling)
# ---------------------------------------------------------------------------


class _CodeSet:
    """One of the five per-group codes, encoder side."""

    def __init__(self, symbols: list[int], alphabet_size: int) -> None:
        self.lengths = _flat_lengths(symbols if symbols else [0])
        self.codes = _canonical_codes(self.lengths)
        self.alphabet_size = alphabet_size
        self.single = symbols[0] if len(set(symbols)) == 1 and symbols else None
        if len(self.lengths) == 1:
            self.single = next(iter(self.lengths))

    def emit_definition(self, w: _LSBWriter) -> None:
        syms = sorted(self.lengths)
        if len(syms) <= 2 and all(s < 256 for s in syms):
            w.write_bits(1, 1)  # simple
            w.write_bits(len(syms) - 1, 1)
            if syms[0] > 1:
                w.write_bits(1, 1)
                w.write_bits(syms[0], 8)
            else:
                w.write_bits(0, 1)
                w.write_bits(syms[0], 1)
            if len(syms) == 2:
                w.write_bits(syms[1], 8)
            return
        # full code-length-coded definition
        w.write_bits(0, 1)
        per_symbol = [self.lengths.get(s, 0) for s in range(self.alphabet_size)]
        # trim trailing zeros via max_symbol
        last_nz = max(i for i, ln in enumerate(per_symbol) if ln > 0)
        used_cl = sorted(set(per_symbol[: last_nz + 1]))
        cl_lengths = _flat_lengths(used_cl)
        cl_codes = _canonical_codes(cl_lengths)
        # emit the code-length code: all 19 slots in spec order
        w.write_bits(19 - 4, 4)
        for sym in _CLCL_ORDER:
            w.write_bits(cl_lengths.get(sym, 0), 3)
        # max_symbol: use the length+max_symbol form
        n_symbols = last_nz + 1
        length_nbits_code = 0
        while (2 + (1 << (2 + 2 * length_nbits_code))) - 1 < n_symbols + 1:
            length_nbits_code += 1
            if length_nbits_code > 7:
                raise ValueError("alphabet too large for max_symbol field")
        w.write_bits(1, 1)
        w.write_bits(length_nbits_code, 3)
        w.write_bits(n_symbols - 2, 2 + 2 * length_nbits_code)
        single_cl = len(cl_lengths) == 1  # single-symbol CL code reads 0 bits
        for ln in per_symbol[: last_nz + 1]:
            if not single_cl:
                cln, ccode = cl_codes[ln]
                w.write_code(ccode, cln)

    def emit_symbol(self, w: _LSBWriter, sym: int) -> None:
        if self.single is not None:
            if len(self.lengths) == 1:
                return  # zero-bit code
        ln, code = self.codes[sym]
        w.write_code(code, ln)


def _encode_subimage(w: _LSBWriter, pixels: list[int], xsize: int) -> None:
    """Entropy-coded sub-image (tile/palette data): cache-flag bit off,
    no meta-Huffman bit at this level, then the shared tokenize+emit
    body (one implementation — the former standalone copy of the
    pipeline drifted from the main path and was deleted in review)."""
    w.write_bits(0, 1)  # no color cache
    _encode_pixel_stream_body(w, pixels, xsize, use_cache=0, use_lz77=False)


def encode_webp_lossless(
    arr: np.ndarray,
    use_cache: int = 0,
    use_lz77: bool = True,
    subtract_green: bool = False,
    predictor_mode: int | None = None,
    predictor_size_bits: int = 4,
    color_transform: tuple[int, int, int] | None = None,
    palette: bool = False,
    use_2d_distance: bool = False,
    meta_huffman_bits: int | None = None,
) -> bytes:
    """Encode a uint8 (H, W, 3|4) or (H, W) array as a lossless VP8L
    WebP. Coverage knobs: ``use_cache`` (color-cache bits, 0=off),
    ``use_lz77`` (distance-1 run refs), ``subtract_green``,
    ``predictor_mode`` (constant mode 0–13 over
    ``2**predictor_size_bits`` tiles), ``color_transform`` = constant
    (green_to_red, green_to_blue, red_to_blue) element, ``palette``
    (color-indexing; requires ≤256 distinct colors, exercises sub-byte
    packing for small palettes)."""
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    h, w_, c = arr.shape
    if c == 3:
        alpha = np.full((h, w_), 255, np.uint8)
        rgba = np.dstack([arr, alpha])
    else:
        rgba = arr
    pixels = [
        _argb(int(rgba[y, x, 3]), int(rgba[y, x, 0]), int(rgba[y, x, 1]), int(rgba[y, x, 2]))
        for y in range(h)
        for x in range(w_)
    ]
    xsize = w_

    wtr = _LSBWriter()
    wtr.write_bits(w_ - 1, 14)
    wtr.write_bits(h - 1, 14)
    wtr.write_bits(1 if (c == 4) else 0, 1)
    wtr.write_bits(0, 3)  # version

    # ---- transforms (read order = application order at decode is
    # reversed, so emit in the order that matches our forward pipeline)
    if predictor_mode is not None:
        if not (0 <= predictor_mode <= 13):
            raise ValueError("predictor_mode must be 0..13")
        wtr.write_bits(1, 1)
        wtr.write_bits(0, 2)
        wtr.write_bits(predictor_size_bits - 2, 3)
        bx = -(-xsize // (1 << predictor_size_bits))
        by = -(-h // (1 << predictor_size_bits))
        tile_px = _argb(0xFF, 0, predictor_mode, 0)
        _encode_subimage(wtr, [tile_px] * (bx * by), bx)
        # forward-predict: residual = pixel - pred
        res: list[int] = []
        recon: list[int] = []
        for y in range(h):
            for x in range(xsize):
                if x == 0 and y == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = recon[-1]
                elif x == 0:
                    pred = recon[(y - 1) * xsize]
                else:
                    l_ = recon[-1]
                    t_ = recon[(y - 1) * xsize + x]
                    tl = recon[(y - 1) * xsize + x - 1]
                    tr = recon[(y - 1) * xsize + x + 1]  # contiguous-buffer TR
                    pred = _predict(predictor_mode, l_, t_, tr, tl)
                p = pixels[y * xsize + x]
                res.append(_sub_px(p, pred))
                recon.append(p)
        pixels = res

    if color_transform is not None:
        g2r, g2b, r2b = color_transform
        size_bits = 4
        wtr.write_bits(1, 1)
        wtr.write_bits(1, 2)
        wtr.write_bits(size_bits - 2, 3)
        bx = -(-xsize // (1 << size_bits))
        by = -(-h // (1 << size_bits))
        cte_px = _argb(0xFF, r2b, g2b, g2r)
        _encode_subimage(wtr, [cte_px] * (bx * by), bx)
        out = []
        for p in pixels:
            a, red, g, blue = _split(p)
            new_red = (red - _ct_delta(g2r, g)) & 0xFF
            # forward transform uses the FINAL (decoded) red value in
            # the red→blue term; at encode time that's the input red
            blue = (blue - _ct_delta(g2b, g) - _ct_delta(r2b, red)) & 0xFF
            out.append(_argb(a, new_red, g, blue))
        pixels = out

    if subtract_green:
        wtr.write_bits(1, 1)
        wtr.write_bits(2, 2)
        out = []
        for p in pixels:
            g = (p >> 8) & 0xFF
            out.append(
                (p & 0xFF000000)
                | ((((p >> 16 & 0xFF) - g) & 0xFF) << 16)
                | (g << 8)
                | (((p & 0xFF) - g) & 0xFF)
            )
        pixels = out

    if palette:
        colors = sorted(set(pixels))
        if len(colors) > 256:
            raise ValueError("palette transform needs <= 256 distinct colors")
        wtr.write_bits(1, 1)
        wtr.write_bits(3, 2)
        wtr.write_bits(len(colors) - 1, 8)
        deltas = [colors[0]] + [
            _sub_px(colors[i], colors[i - 1]) for i in range(1, len(colors))
        ]
        _encode_subimage(wtr, deltas, len(colors))
        index = {p: i for i, p in enumerate(colors)}
        nc = len(colors)
        if nc > 16:
            width_bits = 0
        elif nc > 4:
            width_bits = 1
        elif nc > 2:
            width_bits = 2
        else:
            width_bits = 3
        if width_bits == 0:
            pixels = [_argb(0xFF, 0, index[p], 0) for p in pixels]
        else:
            ppp = 1 << width_bits
            bpp = 8 >> width_bits
            packed_x = -(-xsize // ppp)
            packed = []
            for y in range(h):
                for px in range(packed_x):
                    gval = 0
                    for j in range(ppp):
                        x = px * ppp + j
                        if x < xsize:
                            gval |= index[pixels[y * xsize + x]] << (bpp * j)
                    packed.append(_argb(0xFF, 0, gval, 0))
            pixels = packed
            xsize = packed_x

    wtr.write_bits(0, 1)  # end of transforms

    # main image, spec order: color-cache info, meta-Huffman info,
    # prefix-code definitions (×5 per entropy group), token data
    if meta_huffman_bits is None:
        _encode_pixel_stream_with_meta(
            wtr, pixels, xsize, use_cache, use_lz77, use_2d_distance
        )
    else:
        _encode_with_meta_groups(
            wtr, pixels, xsize, use_cache, meta_huffman_bits
        )

    payload = b"\x2f" + wtr.finish()
    if len(payload) & 1:
        chunk = payload + b"\x00"
    else:
        chunk = payload
    riff = b"WEBP" + b"VP8L" + len(payload).to_bytes(4, "little") + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


def _encode_pixel_stream_with_meta(
    w: _LSBWriter, pixels, xsize, use_cache, use_lz77, use_2d_distance=False
) -> None:
    # cache info
    if use_cache:
        w.write_bits(1, 1)
        w.write_bits(use_cache, 4)
    else:
        w.write_bits(0, 1)
    w.write_bits(0, 1)  # no meta-Huffman
    _encode_pixel_stream_body(w, pixels, xsize, use_cache, use_lz77, use_2d_distance)


def _encode_pixel_stream_body(
    w, pixels, xsize, use_cache, use_lz77, use_2d_distance=False
) -> None:
    """Codes + token data (cache/meta flags already written)."""
    # re-tokenize exactly as _encode_pixel_stream does
    saved = _TokenStream(pixels, use_cache, use_lz77, use_2d_distance)
    green_alpha = 256 + 24 + ((1 << use_cache) if use_cache else 0)
    gset = _CodeSet(saved.g_syms or [0], green_alpha)
    rset = _CodeSet(saved.r_syms or [0], 256)
    bset = _CodeSet(saved.b_syms or [0], 256)
    aset = _CodeSet(saved.a_syms or [0], 256)
    dset = _CodeSet(saved.d_syms or [0], 40)
    for cs in (gset, rset, bset, aset, dset):
        cs.emit_definition(w)
    for kind, v in saved.tokens:
        if kind == "lit":
            a, red, g, blue = _split(v)
            gset.emit_symbol(w, g)
            rset.emit_symbol(w, red)
            bset.emit_symbol(w, blue)
            aset.emit_symbol(w, a)
        elif kind == "copy":
            code, n_extra, extra = _prefix_encode_value(v)
            gset.emit_symbol(w, 256 + code)
            w.write_bits(extra, n_extra)
            dcode, dn, dex = _prefix_encode_value(saved.dist_code_one)
            dset.emit_symbol(w, dcode)
            w.write_bits(dex, dn)
        else:
            gset.emit_symbol(w, 256 + 24 + v)


class _TokenStream:
    def __init__(self, pixels, use_cache, use_lz77, use_2d_distance=False) -> None:
        cache_size = (1 << use_cache) if use_cache else 0
        # distance 1 as a 2D neighborhood code: offset (1, 0) is entry 2
        # of the spec map, vs the plain form distance + 120 = 121 — both
        # legal; the 2D form exercises the decoder's neighbor-map path
        self.dist_code_one = 2 if use_2d_distance else 121
        self.tokens = []
        self.g_syms, self.r_syms, self.b_syms = [], [], []
        self.a_syms, self.d_syms = [], []
        cache = [0] * cache_size
        cache_valid = [False] * cache_size
        i, n = 0, len(pixels)
        while i < n:
            pix = pixels[i]
            if use_lz77 and i > 0 and pixels[i - 1] == pix:
                run = 0
                while i + run < n and pixels[i + run] == pix:
                    run += 1
                if run >= 3:
                    self.tokens.append(("copy", run))
                    code, _, _ = _prefix_encode_value(run)
                    self.g_syms.append(256 + code)
                    dcode, _, _ = _prefix_encode_value(self.dist_code_one)
                    self.d_syms.append(dcode)
                    if cache_size:
                        k = _cache_key(pix, use_cache)
                        cache[k] = pix
                        cache_valid[k] = True
                    i += run
                    continue
            if cache_size:
                k = _cache_key(pix, use_cache)
                if cache_valid[k] and cache[k] == pix:
                    self.tokens.append(("cache", k))
                    self.g_syms.append(256 + 24 + k)
                    i += 1
                    continue
                cache[k] = pix
                cache_valid[k] = True
            self.tokens.append(("lit", pix))
            a, red, g, blue = _split(pix)
            self.g_syms.append(g)
            self.r_syms.append(red)
            self.b_syms.append(blue)
            self.a_syms.append(a)
            i += 1


def _encode_with_meta_groups(
    w: _LSBWriter, pixels, xsize, use_cache, huff_bits
) -> None:
    """Two-entropy-group meta-Huffman emission (checkerboard over
    2^huff_bits tiles): exercises the decoder's per-tile group lookup
    and multi-group code tables. Literals + optional cache only — an
    LZ77 token would need group attribution at its start pixel, which
    this coverage path doesn't bother with."""
    if not (2 <= huff_bits <= 9):
        raise ValueError("meta_huffman_bits must be in [2, 9]")
    ysz = len(pixels) // xsize
    mx = -(-xsize // (1 << huff_bits))
    my = -(-ysz // (1 << huff_bits))

    def group_of(i: int) -> int:
        x, y = i % xsize, i // xsize
        return ((x >> huff_bits) + (y >> huff_bits)) % 2

    # cache info, then the meta-Huffman header + tile image
    if use_cache:
        w.write_bits(1, 1)
        w.write_bits(use_cache, 4)
    else:
        w.write_bits(0, 1)
    w.write_bits(1, 1)
    w.write_bits(huff_bits - 2, 3)
    meta_px = [
        _argb(0xFF, 0, (tx + ty) % 2, 0) for ty in range(my) for tx in range(mx)
    ]
    _encode_subimage(w, meta_px, mx)
    # the decoder reads max(group)+1 code sets — a single-tile image
    # has only group 0, so only one set may be emitted
    n_groups = max((px >> 8) & 0xFF for px in meta_px) + 1

    cache_size = (1 << use_cache) if use_cache else 0
    cache = [0] * cache_size
    valid = [False] * cache_size
    toks = []  # (group, kind, value)
    for i, pix in enumerate(pixels):
        g = group_of(i)
        if cache_size:
            k = _cache_key(pix, use_cache)
            if valid[k] and cache[k] == pix:
                toks.append((g, "cache", k))
                continue
            cache[k] = pix
            valid[k] = True
        toks.append((g, "lit", pix))

    green_alpha = 256 + 24 + cache_size
    sets = []
    for g in range(n_groups):
        g_syms, r_syms, b_syms, a_syms = [], [], [], []
        for gg, kind, v in toks:
            if gg != g:
                continue
            if kind == "cache":
                g_syms.append(256 + 24 + v)
            else:
                a, red, gr, blue = _split(v)
                g_syms.append(gr)
                r_syms.append(red)
                b_syms.append(blue)
                a_syms.append(a)
        sets.append(
            (
                _CodeSet(g_syms or [0], green_alpha),
                _CodeSet(r_syms or [0], 256),
                _CodeSet(b_syms or [0], 256),
                _CodeSet(a_syms or [0], 256),
                _CodeSet([0], 40),
            )
        )
    for g in range(n_groups):
        for cs in sets[g]:
            cs.emit_definition(w)
    for gg, kind, v in toks:
        gset, rset, bset, aset, _dset = sets[gg]
        if kind == "cache":
            gset.emit_symbol(w, 256 + 24 + v)
        else:
            a, red, gr, blue = _split(v)
            gset.emit_symbol(w, gr)
            rset.emit_symbol(w, red)
            bset.emit_symbol(w, blue)
            aset.emit_symbol(w, a)
