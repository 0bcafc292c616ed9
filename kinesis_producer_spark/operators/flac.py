"""Pure-Python FLAC decoder + encoder subset (no libFLAC).

Closes the "compressed audio" decode stub in
``multimodal.decode_audio_pcm`` for the FLAC container: FLAC's
lossless pipeline (fixed polynomial predictors + Rice-coded
residuals) is specified publicly (RFC 9639) and needs no codec
library — only bit-level parsing.

decode: ``fLaC`` magic → metadata block walk (STREAMINFO) → per
frame: header (sync, block size / sample rate / channel assignment /
sample size codes, UTF-8 frame number, CRC-8) → per channel
subframe: CONSTANT | VERBATIM | FIXED order 0–4 | quantized LPC
(any order, truncating-shift feedback) with Rice-coded residuals
(partitions + escape-to-raw) → stereo decorrelation (left/side,
right/side, mid/side) → int32 sample matrix
(n_frames_samples, n_channels). The Rice hot path is vectorized
over a cached whole-blob bit array.

encode (minimal sibling for synthesizing deterministic inputs):
16-bit PCM → per-block fixed-predictor order 0–2 chosen by residual
magnitude (or CONSTANT for flat blocks), single Rice partition;
opt-in quantized-LPC subframes with caller-chosen coefficients and
all four stereo modes — so every decoder path is exercised by
round-trip tests. Correct CRC-8/CRC-16 throughout: a genuine,
compliant compressed stream, not a stored-only shortcut.

Wasted bits (shifted low-precision samples) decode per spec and are
emittable by the encoder for round-trip coverage. Unsupported
(returns None — the operator layer yields null rows): sample sizes
other than 8/12/16/20/24.

Scale posture: per-blob Python inside Arrow-batched ``mapInPandas``
stages; blobs never leave executors.

Reference parity note: the reference repo has no media path (this is
the LLM-pipeline mandate); format knowledge is public RFC 9639 only.
"""

from __future__ import annotations

import numpy as np

_BLOCK_SIZE_CODES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_SAMPLE_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SAMPLE_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}

# FIXED predictor coefficients by order: s[i] ≈ Σ coef[j]*s[i-1-j]
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _make_crc8_table() -> list[int]:
    table = []
    for byte in range(256):
        crc = byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07 if crc & 0x80 else crc << 1) & 0xFF
        table.append(crc)
    return table


def _make_crc16_table() -> list[int]:
    table = []
    for byte in range(256):
        crc = byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005 if crc & 0x8000 else crc << 1) & 0xFFFF
        table.append(crc)
    return table


_CRC8_TABLE = _make_crc8_table()
_CRC16_TABLE = _make_crc16_table()


def _crc8(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc = _CRC8_TABLE[crc ^ byte]
    return crc


def _crc16_scalar(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc = _CRC16_TABLE[((crc >> 8) ^ byte) & 0xFF] ^ ((crc << 8) & 0xFFFF)
    return crc


_CRC16_NPTAB = np.array(_CRC16_TABLE, np.uint16)
# _CRC16_SHIFT[j] = (lo, hi): 256-entry uint16 tables applying the
# GF(2)-linear "advance this CRC register by 2**j zero bytes" map as
# lo[v & 0xFF] ^ hi[v >> 8]. Built lazily as longer inputs arrive.
_CRC16_SHIFT: list[tuple[np.ndarray, np.ndarray]] = []


def _crc16_shift_tables(levels: int) -> list[tuple[np.ndarray, np.ndarray]]:
    t = np.arange(256, dtype=np.uint16)
    if not _CRC16_SHIFT:
        # advance by ONE zero byte: A(v) = TABLE[v >> 8] ^ (v << 8)
        _CRC16_SHIFT.append((t << 8, _CRC16_NPTAB[t]))
    while len(_CRC16_SHIFT) < levels:
        plo, phi = _CRC16_SHIFT[-1]

        def _twice(v: np.ndarray) -> np.ndarray:
            w = plo[v & 0xFF] ^ phi[v >> 8]
            return plo[w & 0xFF] ^ phi[w >> 8]

        _CRC16_SHIFT.append((_twice(t), _twice(t << 8)))
    return _CRC16_SHIFT


def _crc16(data: bytes) -> int:
    """CRC-16/BUYPASS (poly 0x8005, init 0) of a byte string.

    The per-byte table loop is the FLAC codec's hot spot (~64% of
    encode wall at frame sizes); for long inputs the same CRC is
    computed as a GF(2) tree fold instead: per-byte register images
    from one vectorized table gather, then log2(n) pairwise combines
    crc(A||B) = shift_{|B|}(crc(A)) ^ crc(B), each a two-gather
    linear-map application. Leading zero bytes map to register 0 and
    shift to 0, so front-padding to a power of two is free. Identical
    output to the scalar loop for every input (pinned in tests)."""
    n = len(data)
    if n <= 1024:  # measured crossover: numpy fixed overhead ~45 µs
        return _crc16_scalar(data)
    c = _CRC16_NPTAB[np.frombuffer(data, np.uint8)]
    size = 1 << (n - 1).bit_length()
    if size != n:
        c = np.concatenate([np.zeros(size - n, np.uint16), c])
    tables = _crc16_shift_tables((size - 1).bit_length())
    level = 0
    while len(c) > 1:
        lo, hi = tables[level]
        left = c[0::2]
        c = (lo[left & 0xFF] ^ hi[left >> 8]) ^ c[1::2]
        level += 1
    return int(c[0])


class _BitReader:
    def __init__(self, b: bytes, pos: int = 0, bits=None, ones=None):
        self.b = b
        self.pos = pos  # byte position
        self.bit = 0  # bits consumed in current byte (MSB first)
        # optional whole-buffer bit cache (np.unpackbits result and the
        # indices of its set bits) enabling vectorized Rice decode
        self.bits = bits
        self.ones = ones

    def read(self, n: int) -> int:
        v = 0
        while n > 0:
            if self.pos >= len(self.b):
                raise EOFError
            avail = 8 - self.bit
            take = min(n, avail)
            cur = self.b[self.pos]
            v = (v << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            n -= take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        """Count leading zero bits up to the next 1 (consumed). Scans
        byte-at-a-time: the remaining bits of the current byte are
        checked with one bit_length() instead of per-bit reads."""
        q = 0
        while True:
            if self.pos >= len(self.b):
                raise EOFError
            avail = 8 - self.bit
            chunk = self.b[self.pos] & ((1 << avail) - 1)
            if chunk == 0:
                q += avail
                self.bit = 0
                self.pos += 1
                if q > 1 << 20:
                    raise EOFError
                continue
            zeros = avail - chunk.bit_length()
            self.bit += zeros + 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
            return q + zeros

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def write_bits(self, bits: np.ndarray) -> None:
        """Append a 0/1 uint8 bit array in bulk (numpy packbits does
        the byte assembly; only the sub-byte seams stay in Python)."""
        if self.nbits:
            pend = np.array(
                [(self.acc >> (self.nbits - 1 - i)) & 1 for i in range(self.nbits)],
                np.uint8,
            )
            bits = np.concatenate([pend, bits])
            self.acc = 0
            self.nbits = 0
        packed = np.packbits(bits)
        rem = len(bits) % 8
        if rem:
            self.out += packed[:-1].tobytes()
            self.acc = int(packed[-1]) >> (8 - rem)
            self.nbits = rem
        else:
            self.out += packed.tobytes()

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)


def _utf8_number(r: _BitReader) -> int:
    first = r.read(8)
    if first < 0x80:
        return first
    n_extra = 0
    mask = 0x40
    while first & mask:
        n_extra += 1
        mask >>= 1
    if n_extra == 0 or n_extra > 6:
        raise ValueError
    v = first & (mask - 1)
    for _ in range(n_extra):
        byte = r.read(8)
        if byte & 0xC0 != 0x80:
            raise ValueError
        v = (v << 6) | (byte & 0x3F)
    return v


def _encode_utf8_number(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    n = 1
    while v >= (1 << (5 * n + 6 - n)) or v >> (6 * n) >= (1 << (6 - n)):
        n += 1
        if n > 6:
            raise ValueError
    lead = (0xFF << (7 - n)) & 0xFF | (v >> (6 * n))
    rest = [0x80 | ((v >> (6 * i)) & 0x3F) for i in range(n - 1, -1, -1)]
    return bytes([lead] + rest)


def _decode_subframe(r: _BitReader, n: int, bits: int) -> np.ndarray | None:
    if r.read(1):  # mandatory zero pad bit
        return None
    stype = r.read(6)
    wasted = 0
    if r.read(1):  # wasted-bits flag: k = unary+1 trailing zero bits
        wasted = r.read_unary() + 1
        if wasted >= bits:
            return None
        out = _decode_subframe_body(r, n, bits - wasted, stype)
        return None if out is None else out << wasted
    return _decode_subframe_body(r, n, bits, stype)


def _decode_subframe_body(
    r: _BitReader, n: int, bits: int, stype: int
) -> np.ndarray | None:
    if stype == 0:  # CONSTANT
        return np.full(n, r.read_signed(bits), np.int64)
    if stype == 1:  # VERBATIM
        return np.array([r.read_signed(bits) for _ in range(n)], np.int64)
    if 8 <= stype <= 12:  # FIXED, order = stype - 8
        order = stype - 8
        warm = [r.read_signed(bits) for _ in range(order)]
        res = _read_residuals_fixed(r, n, order)
        if res is None:
            return None
        if order == 0:
            return np.asarray(res, np.int64)
        # Vectorized inverse of the order-o difference operator: the
        # residual is Δ^o s, so o successive cumulative sums — each
        # seeded with the last warmup value of that difference level —
        # reconstruct the signal (exact int64, no per-sample loop).
        warm_arr = np.asarray(warm, np.int64)
        cur = np.asarray(res, np.int64)
        for level in range(order - 1, -1, -1):
            seed = int(np.diff(warm_arr, level)[-1]) if level else int(warm_arr[-1])
            cur = seed + np.cumsum(cur)
        return np.concatenate([warm_arr, cur])
    if stype >= 32:  # LPC, order = (stype & 31) + 1
        order = (stype & 31) + 1
        warm = [r.read_signed(bits) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:  # 0b1111 is invalid per spec
            return None
        shift = r.read_signed(5)
        if shift < 0:
            return None
        coefs = [r.read_signed(precision) for _ in range(order)]
        res = _read_residuals_fixed(r, n, order)
        if res is None:
            return None
        # quantized-LPC feedback: s[i] = res[i] + (Σ c_j·s[i-1-j] >> shift).
        # The shift truncates toward -inf (arithmetic >>), which is why
        # this loop cannot be a linear filter call — plain Python ints.
        samples = list(warm)
        res_list = res.tolist()
        for value in res_list:
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * samples[-1 - j]
            samples.append(value + (acc >> shift))
        return np.asarray(samples, np.int64)
    return None  # reserved subframe types


def _read_rice_block(r: _BitReader, count: int, param: int) -> np.ndarray | None:
    """Fast Rice decode of one partition using the reader's cached
    whole-blob bit array: terminator '1's are found by walking the
    precomputed ones-index (skipping the ones that sit inside
    remainder fields), then all quotients and remainders are
    reconstructed with vectorized numpy — no per-sample bit reads."""
    bits, ones = r.bits, r.ones
    start = r.pos * 8 + r.bit
    i = int(np.searchsorted(ones, start))
    step = 1 + param
    # a code consumes at most one terminator plus param remainder
    # bits' worth of ones, so this slice bounds the whole partition
    seg = ones[i : i + count * step + 1]
    if len(seg) == 0:
        return None
    # Terminator positions form the orbit of a monotone successor map
    # (next terminator = first one >= this one + step); binary lifting
    # computes all `count` of them in log2(count) vectorized gathers
    # instead of a per-code Python walk. Index len(seg) is an
    # absorbing "ran off the slice" sentinel (invalid stream).
    succ = np.append(np.searchsorted(seg, seg + step), len(seg))
    seq = np.zeros(1, np.int64)  # first terminator: seg[0] (>= start)
    while len(seq) < count:
        seq = np.concatenate([seq, succ[seq]])
        if len(seq) < count:
            succ = succ[succ]  # square the jump: succ_2l = succ_l∘succ_l
    seq = seq[:count]
    if int(seq[-1]) >= len(seg):  # monotone orbit: last index is max
        return None
    term = seg[seq]
    end = int(term[-1]) + step
    if end > len(bits):
        return None
    prev_end = np.empty(count, np.int64)
    prev_end[0] = start
    prev_end[1:] = term[:-1] + step
    q = term - prev_end
    if (q < 0).any():
        return None
    u = q << param
    if param:
        idx = term[:, None] + 1 + np.arange(param)
        weights = 1 << np.arange(param - 1, -1, -1, dtype=np.int64)
        u = u | (bits[idx] @ weights)
    r.pos, r.bit = end >> 3, end & 7
    return (u >> 1) ^ -(u & 1)


def _read_residuals_fixed(r: _BitReader, n: int, order: int) -> np.ndarray | None:
    """Residuals for a FIXED subframe: the first partition holds
    (n / parts - order) residuals, the rest hold n / parts."""
    try:
        method = r.read(2)
        if method > 1:
            return None
        pbits, escape = (4, 0xF) if method == 0 else (5, 0x1F)
        porder = r.read(4)
        n_parts = 1 << porder
        if n % n_parts or (n >> porder) <= order:
            return None
        parts: list[np.ndarray] = []
        for part in range(n_parts):
            param = r.read(pbits)
            count = (n >> porder) - (order if part == 0 else 0)
            if param == escape:
                raw = r.read(5)
                parts.append(
                    np.array(
                        [r.read_signed(raw) if raw else 0 for _ in range(count)],
                        np.int64,
                    )
                )
            elif r.bits is not None:
                block = _read_rice_block(r, count, param)
                if block is None:
                    return None
                parts.append(block)
            else:  # no cached bit array (standalone reader) — slow path
                vals = np.empty(count, np.int64)
                for t in range(count):
                    q = r.read_unary()
                    u = (q << param) | (r.read(param) if param else 0)
                    vals[t] = (u >> 1) ^ -(u & 1)
                parts.append(vals)
        return np.concatenate(parts) if parts else np.empty(0, np.int64)
    except (EOFError, ValueError):
        return None


def parse_streaminfo(b: bytes) -> dict | None:
    """STREAMINFO metadata block → dict (rate, channels, bits,
    total_samples), or None."""
    if len(b) < 8 or b[:4] != b"fLaC":
        return None
    pos = 4
    while pos + 4 <= len(b):
        header = b[pos]
        length = int.from_bytes(b[pos + 1 : pos + 4], "big")
        body = b[pos + 4 : pos + 4 + length]
        if header & 0x7F == 0 and length >= 34:
            rate = (body[10] << 12) | (body[11] << 4) | (body[12] >> 4)
            return {
                "min_block": int.from_bytes(body[0:2], "big"),
                "max_block": int.from_bytes(body[2:4], "big"),
                "sample_rate": rate,
                "n_channels": ((body[12] >> 1) & 0x07) + 1,
                "bits_per_sample": (((body[12] & 1) << 4) | (body[13] >> 4)) + 1,
                "total_samples": ((body[13] & 0x0F) << 32)
                | int.from_bytes(body[14:18], "big"),
                "frames_at": pos + 4 + length if header & 0x80 else None,
            }
        pos += 4 + length
        if header & 0x80:
            break
    return None


def decode_flac(b: bytes, max_bytes: int = 8 << 20) -> tuple[np.ndarray, int] | None:
    """Decode a FLAC blob → (samples, sample_rate) with samples an
    int32 (n, n_channels) array. Constant/verbatim/fixed AND LPC
    subframes, wasted bits, and all stereo decorrelation modes are
    supported; None for non-FLAC / corrupt / unsupported sample
    sizes (anything outside 8/12/16/20/24 bits)."""
    if b is None or len(b) > max_bytes:
        return None
    info = parse_streaminfo(b)
    if info is None:
        return None
    try:
        return _decode_frames(b, info)
    except Exception:
        return None


def _decode_frames(b: bytes, info: dict) -> tuple[np.ndarray, int] | None:
    # find first frame: skip all metadata blocks
    pos = 4
    while pos + 4 <= len(b):
        header = b[pos]
        length = int.from_bytes(b[pos + 1 : pos + 4], "big")
        pos += 4 + length
        if header & 0x80:
            break
    chunks: list[np.ndarray] = []
    rate = info["sample_rate"]
    # one unpackbits per blob feeds the vectorized Rice fast path
    bit_cache = np.unpackbits(np.frombuffer(b, np.uint8)).astype(np.int64)
    ones_cache = np.flatnonzero(bit_cache)
    while pos + 5 <= len(b):
        r = _BitReader(b, pos, bits=bit_cache, ones=ones_cache)
        sync = r.read(14)
        if sync != 0x3FFE:
            return None
        r.read(1)  # reserved
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        chan_code = r.read(4)
        size_code = r.read(3)
        r.read(1)  # reserved
        _utf8_number(r)
        if bs_code == 6:
            block_size = r.read(8) + 1
        elif bs_code == 7:
            block_size = r.read(16) + 1
        elif bs_code in _BLOCK_SIZE_CODES:
            block_size = _BLOCK_SIZE_CODES[bs_code]
        else:
            return None
        if sr_code == 12:
            rate = r.read(8) * 1000
        elif sr_code == 13:
            rate = r.read(16)
        elif sr_code == 14:
            rate = r.read(16) * 10
        elif sr_code in _SAMPLE_RATE_CODES:
            rate = _SAMPLE_RATE_CODES[sr_code]
        elif sr_code == 0:
            rate = info["sample_rate"]
        else:
            return None
        bits = (
            info["bits_per_sample"] if size_code == 0
            else _SAMPLE_SIZE_CODES.get(size_code)
        )
        if bits is None:
            return None
        r.align()
        if _crc8(b[pos : r.pos]) != r.read(8):
            return None
        if chan_code < 8:
            n_chan = chan_code + 1
            chans = []
            for _ in range(n_chan):
                sub = _decode_subframe(r, block_size, bits)
                if sub is None:
                    return None
                chans.append(sub)
        elif chan_code in (8, 9, 10):  # stereo decorrelation modes;
            # the side (difference) channel carries one extra bit
            if chan_code == 8:  # left + side
                left = _decode_subframe(r, block_size, bits)
                side = _decode_subframe(r, block_size, bits + 1)
                if left is None or side is None:
                    return None
                chans = [left, left - side]
            elif chan_code == 9:  # side + right
                side = _decode_subframe(r, block_size, bits + 1)
                right = _decode_subframe(r, block_size, bits)
                if side is None or right is None:
                    return None
                chans = [right + side, right]
            else:  # mid + side (RFC 9639 §5.3: left = mid*2 + (side&1) + side, /2)
                mid = _decode_subframe(r, block_size, bits)
                side = _decode_subframe(r, block_size, bits + 1)
                if mid is None or side is None:
                    return None
                left = (mid * 2 + (side & 1) + side) // 2
                chans = [left, left - side]
        else:
            return None
        r.align()
        footer_crc = (b[r.pos] << 8) | b[r.pos + 1]
        if _crc16(b[pos : r.pos]) != footer_crc:
            return None
        chunks.append(np.stack(chans, axis=1))
        pos = r.pos + 2
        total = sum(c.shape[0] for c in chunks)
        if info["total_samples"] and total >= info["total_samples"]:
            break
    if not chunks:
        return None
    samples = np.concatenate(chunks, axis=0).astype(np.int32)
    if info["total_samples"]:
        samples = samples[: info["total_samples"]]
    return samples, rate


# ---------------------------------------------------------------------------
# Encoder (synthesizes compliant fixed-predictor streams for tests)
# ---------------------------------------------------------------------------


def _best_fixed_order(x: np.ndarray, max_order: int = 2) -> int:
    best, best_cost = 0, int(np.abs(x).sum())
    for order in range(1, max_order + 1):
        if len(x) <= order:
            break
        cost = int(np.abs(np.diff(x, order)).sum())
        if cost < best_cost:
            best, best_cost = order, cost
    return best


def _rice_param(res: np.ndarray) -> int:
    if len(res) == 0:
        return 0
    mean = max(int(np.abs(res).mean()), 1)
    k = 0
    while (1 << (k + 1)) <= mean and k < 14:
        k += 1
    return k


def _write_rice(w: _BitWriter, res: np.ndarray, param: int) -> None:
    """Vectorized Rice coder: compute every code's bit layout with
    numpy (terminator positions + remainder bits scattered into one
    bit array), then bulk-append. No per-sample Python bit loop."""
    res = np.asarray(res, np.int64)
    if res.size == 0:
        return
    u = np.where(res >= 0, res << 1, ((-res) << 1) - 1)
    q = u >> param
    ends = np.cumsum(q + 1 + param)
    bits = np.zeros(int(ends[-1]), np.uint8)
    bits[ends - 1 - param] = 1  # unary terminators
    for j in range(param):
        bits[ends - param + j] = (u >> (param - 1 - j)) & 1
    w.write_bits(bits)


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 44100,
    block_size: int = 4096,
    lpc: tuple[list[int], int, int] | None = None,
    stereo_mode: str = "independent",
    wasted_bits: int = 0,
    bits: int = 16,
) -> bytes:
    """Encode int16 PCM (n,) or (n, n_channels) as a compliant FLAC
    stream: fixed predictors (order 0–2, per-block choice), CONSTANT
    for flat blocks, single Rice partition.

    ``lpc=(coefs, shift, precision)`` switches every non-constant
    subframe to a quantized-LPC subframe with those exact parameters
    (residual computed against the same truncating-shift predictor
    the decoder runs) — used to exercise the decoder's LPC path with
    known coefficients. ``stereo_mode`` in {'independent',
    'left-side', 'right-side', 'mid-side'} selects the 2-channel
    decorrelation (non-independent modes require exactly 2 channels;
    the side channel is coded at bits+1 per spec). ``wasted_bits=k``
    codes every non-constant subframe with the spec's wasted-bits
    header (samples must carry k trailing zero bits — the shifted
    representation real encoders use for e.g. 12-bit sources stored
    as 16)."""
    x = np.asarray(samples, np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, n_chan = x.shape
    if not (1 <= n_chan <= 8):
        raise ValueError("1..8 channels")
    if bits not in (8, 12, 16, 20, 24):
        raise ValueError("bits must be one of 8/12/16/20/24")
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    if x.size and (int(x.min()) < lo or int(x.max()) > hi):
        raise ValueError(f"samples exceed {bits}-bit range")
    out = bytearray(b"fLaC")
    info = bytearray()
    info += block_size.to_bytes(2, "big") * 2
    info += b"\x00\x00\x00" * 2  # min/max frame size unknown
    info += bytes(
        [
            (sample_rate >> 12) & 0xFF,
            (sample_rate >> 4) & 0xFF,
            ((sample_rate & 0xF) << 4) | ((n_chan - 1) << 1) | ((bits - 1) >> 4),
            (((bits - 1) & 0xF) << 4) | ((n >> 32) & 0xF),
        ]
    )
    info += (n & 0xFFFFFFFF).to_bytes(4, "big")
    info += b"\x00" * 16  # md5 unset
    out += bytes([0x80]) + len(info).to_bytes(3, "big") + bytes(info)

    for frame_idx, start in enumerate(range(0, n, block_size)):
        blk = x[start : start + block_size]
        bs = blk.shape[0]
        sr_code = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5,
                   22050: 6, 24000: 7, 32000: 8, 44100: 9, 48000: 10,
                   96000: 11}.get(sample_rate)
        follow_rate = None if sr_code is not None else sample_rate
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 2)  # reserved + fixed blocking
        w.write(7, 4)  # 16-bit block size follows
        w.write(sr_code if sr_code is not None else 13, 4)  # 13: Hz follows
        chan_code = {
            "independent": n_chan - 1,
            "left-side": 8,
            "right-side": 9,
            "mid-side": 10,
        }[stereo_mode]
        w.write(chan_code, 4)
        w.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bits], 3)  # sample size code
        w.write(0, 1)
        for byte in _encode_utf8_number(frame_idx):
            w.write(byte, 8)
        w.write(bs - 1, 16)
        if follow_rate is not None:
            w.write(follow_rate, 16)
        w.align()
        hdr = bytes(w.out)
        w.write(_crc8(hdr), 8)
        if stereo_mode == "independent":
            subframes = [(blk[:, ch], bits) for ch in range(n_chan)]
        else:
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            if stereo_mode == "left-side":
                subframes = [(left, bits), (side, bits + 1)]
            elif stereo_mode == "right-side":
                subframes = [(side, bits + 1), (right, bits)]
            else:  # mid-side: mid = floor((l+r)/2), side carries the lsb
                mid = (left + right) >> 1
                subframes = [(mid, bits), (side, bits + 1)]
        for sig, sbits in subframes:
            if bs and (sig == sig[0]).all():
                w.write(0, 1)
                w.write(0, 6)  # CONSTANT
                w.write(0, 1)
                w.write(int(sig[0]), sbits)
                continue
            if wasted_bits:
                if ((sig & ((1 << wasted_bits) - 1)) != 0).any():
                    raise ValueError(
                        "wasted_bits requires samples with that many "
                        "trailing zero bits"
                    )
                sig = sig >> wasted_bits
                sbits -= wasted_bits
            if lpc is not None:
                coefs, shift, precision = lpc
                order = len(coefs)
                if bs <= order:
                    raise ValueError("block too short for LPC order")
                w.write(0, 1)
                w.write(32 + order - 1, 6)  # LPC
                if wasted_bits:
                    w.write(1, 1)
                    w.write_unary(wasted_bits - 1)
                else:
                    w.write(0, 1)
                for warm in sig[:order]:
                    w.write(int(warm), sbits)
                w.write(precision - 1, 4)
                w.write(shift, 5)
                for c in coefs:
                    w.write(int(c), precision)
                # residual against the decoder's exact truncating shift
                samples_list = sig.tolist()
                res = np.array(
                    [
                        samples_list[i]
                        - (
                            sum(
                                c * samples_list[i - 1 - j]
                                for j, c in enumerate(coefs)
                            )
                            >> shift
                        )
                        for i in range(order, bs)
                    ],
                    np.int64,
                )
            else:
                order = _best_fixed_order(sig)
                res = np.diff(sig, order) if order else sig.copy()
                w.write(0, 1)
                w.write(8 + order, 6)  # FIXED
                if wasted_bits:
                    w.write(1, 1)
                    w.write_unary(wasted_bits - 1)
                else:
                    w.write(0, 1)
                for warm in sig[:order]:
                    w.write(int(warm), sbits)
            w.write(0, 2)  # rice method 0
            w.write(0, 4)  # partition order 0
            param = min(_rice_param(res), 14)
            w.write(param, 4)
            _write_rice(w, res, param)
        w.align()
        body = bytes(w.out)
        w.write(_crc16(body), 16)
        out += bytes(w.out)
    return bytes(out)
