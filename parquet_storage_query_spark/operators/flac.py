"""Pure-stdlib FLAC codec (subset) — the first COMPRESSED audio format
with a real decode path (WAV PCM16 and G.711 landed in rounds 6/9; the
mp3/aac perceptual codecs remain the documented hook because their
psychoacoustic filterbanks genuinely need codec libraries).

FLAC is the natural next rung: lossless, fully integer, publicly
specified (xiph.org / RFC 9639), and exactly decodable with nothing but
bit arithmetic — so the committed fixture corpus keeps the family's
oracle discipline: DuckDB replays the DECODED waveform statistics in
closed form and any defect in rice coding, predictor reconstruction,
CRC handling, or bit alignment breaks an integer sum.

`decode_flac` handles:
- fLaC magic + metadata blocks (STREAMINFO parsed, others skipped)
- frame headers: sync, blocking strategy, block-size / sample-rate /
  channel-assignment / sample-size codes (incl. the 8/16-bit escape
  forms), UTF-8-coded frame number, CRC-8 verification
- channel assignments: independent mono/stereo + the three stereo
  decorrelation modes (left/side, right/side, mid/side; side channel
  carries the +1 bit depth per spec)
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4 (reconstructed as
  o stacked cumulative sums — the fixed predictor IS the o-th finite
  difference, so decode is fully vectorized), and LPC (quantized
  coefficients, signed shift, sequential reconstruction), plus the
  wasted-bits field
- residuals: both rice methods (4-bit and 5-bit parameters), any
  partition order, and the escape code (raw two's-complement
  partitions); a vectorized fast path decodes k=0 partitions straight
  from the 1-bit positions
- frame CRC-16 verification (poly 0x8005), byte re-alignment between
  frames

`encode_flac` is the fixture generator: mono 16-bit, fixed-order-2
subframes with rice partitions (k chosen per frame so the committed
corpus exercises both the vectorized k=0 path and the general reader),
real CRC-8/CRC-16, real STREAMINFO (including the MD5 of the unencoded
signal). The pytest round-trips additionally push CONSTANT/VERBATIM/
LPC subframes, higher rice parameters, escapes, multiple partition
orders, and mid/side stereo through the decoder.

Format knowledge from the public FLAC specification (RFC 9639 /
xiph.org/flac/format.html): frame header layout §9.1, fixed predictors
§9.2.3, rice residual §9.2.7, CRC polynomials appendix A.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

# CRC-8 poly 0x07 (init 0) over the frame header; CRC-16 poly 0x8005
# (init 0) over the whole frame. Table-driven, built once.


def _crc8_table():
    tbl = []
    for b in range(256):
        c = b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        tbl.append(c)
    return tbl


def _crc16_table():
    tbl = []
    for b in range(256):
        c = b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
        tbl.append(c)
    return tbl


_CRC8 = _crc8_table()
_CRC16 = _crc16_table()


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8[c ^ b]
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC16[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


_BLOCKSIZE_TABLE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_RATE_TABLE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SIZE_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


class _BitReader:
    """MSB-first bit reader over bytes, with byte-position tracking for
    CRC ranges and the vectorized rice fast path."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # next unread byte
        self._acc = 0
        self._n = 0  # bits buffered in _acc

    def read(self, n: int) -> int:
        while self._n < n:
            self._acc = (self._acc << 8) | self.data[self.pos]
            self.pos += 1
            self._n += 8
        self._n -= n
        v = (self._acc >> self._n) & ((1 << n) - 1)
        self._acc &= (1 << self._n) - 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self._n = 0
        self._acc = 0

    def bitpos(self) -> int:
        return self.pos * 8 - self._n

    def seek_bits(self, bitpos: int) -> None:
        self.pos = (bitpos + 7) // 8
        self._n = self.pos * 8 - bitpos
        self._acc = self.data[self.pos - 1] & ((1 << self._n) - 1) if self._n else 0


def _utf8_number(r: _BitReader) -> int:
    """FLAC's UTF-8-style extended coded number (frame/sample index)."""
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    v = b0 & (mask - 1)
    for _ in range(n):
        v = (v << 6) | (r.read(8) & 0x3F)
    return v


def _zigzag_decode(u):
    return (u >> 1) ^ -(u & 1)


def _decode_residual(r: _BitReader, blocksize: int, order: int) -> np.ndarray:
    """Rice-coded residual (§9.2.7): both parameter widths, any partition
    order, escape partitions. k=0 partitions decode vectorized from the
    positions of 1-bits (a k=0 rice word IS the unary gap)."""
    method = r.read(2)
    if method > 1:
        raise ValueError("FLAC: reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("FLAC: partition order does not divide block size")
    out = np.empty(blocksize - order, dtype=np.int64)
    filled = 0
    for p in range(nparts):
        n = blocksize // nparts - (order if p == 0 else 0)
        k = r.read(pbits)
        if k == escape:
            raw = r.read(5)
            if raw == 0:
                out[filled : filled + n] = 0
            else:
                for i in range(n):
                    out[filled + i] = r.read_signed(raw)
        elif k == 0 and n > 32:
            # vectorized: a k=0 rice word IS its unary gap, so the n
            # values are the gaps between the next n 1-bits; streams are
            # frame-sized, so unpacking the remaining bytes once is cheap
            start = r.bitpos()
            chunk = np.frombuffer(r.data, dtype=np.uint8, offset=start // 8)
            bits = np.unpackbits(chunk)
            ones = np.flatnonzero(bits[start % 8 :])
            if len(ones) < n:
                raise ValueError("FLAC: truncated residual")
            sel = ones[:n]
            gaps = np.empty(n, dtype=np.int64)
            gaps[0] = sel[0]
            gaps[1:] = np.diff(sel) - 1
            out[filled : filled + n] = _zigzag_decode(gaps)
            r.seek_bits(start + int(sel[-1]) + 1)
        else:
            for i in range(n):
                q = r.unary()
                u = (q << k) | r.read(k) if k else q
                out[filled + i] = _zigzag_decode(u)
        filled += n
    return out


_FIXED_WARMUP_COEF = {
    0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1],
}


def _reconstruct_fixed(warmup: np.ndarray, resid: np.ndarray, order: int) -> np.ndarray:
    """Fixed predictor of order o = o-th finite difference, so the
    inverse is o stacked cumulative sums seeded by the warmup samples —
    fully vectorized (the product fixture's hot path)."""
    if order == 0:
        return resid.copy()
    # successive differences of the warmup give the cumsum seeds
    seeds = []
    w = warmup.astype(np.int64)
    for _ in range(order):
        seeds.append(w[-1])
        w = np.diff(w)
    cur = resid.astype(np.int64)
    for lvl in range(order - 1, -1, -1):
        cur = seeds[lvl] + np.cumsum(cur)
    return np.concatenate([warmup.astype(np.int64), cur])


def _decode_subframe(r: _BitReader, blocksize: int, bits: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("FLAC: subframe padding bit set")
    ftype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.unary() + 1
    eff = bits - wasted
    if ftype == 0:  # CONSTANT
        v = r.read_signed(eff)
        out = np.full(blocksize, v, dtype=np.int64)
    elif ftype == 1:  # VERBATIM
        out = np.array([r.read_signed(eff) for _ in range(blocksize)], dtype=np.int64)
    elif 8 <= ftype <= 12:  # FIXED order 0-4
        order = ftype - 8
        warm = np.array([r.read_signed(eff) for _ in range(order)], dtype=np.int64)
        resid = _decode_residual(r, blocksize, order)
        out = _reconstruct_fixed(warm, resid, order)
    elif ftype >= 32:  # LPC
        order = ftype - 31
        warm = [r.read_signed(eff) for _ in range(order)]
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("FLAC: invalid LPC precision escape")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coefs = [r.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(r, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        s = list(warm)
        for i in range(order, blocksize):
            pred = 0
            for j in range(order):
                pred += coefs[j] * s[i - 1 - j]
            v = int(resid[i - order]) + (pred >> shift)
            out[i] = v
            s.append(v)
        del s
    else:
        raise ValueError(f"FLAC: reserved subframe type {ftype}")
    if wasted:
        out = out << wasted
    return out


def decode_flac(data: bytes):
    """Decode a FLAC stream. Returns (sample_rate, n_channels,
    bits_per_sample, samples) where samples is an int64 ndarray —
    interleaved for stereo, flat for mono. CRC-8 (frame header) and
    CRC-16 (whole frame) are VERIFIED; a corrupt stream fails loudly."""
    if data[:4] != b"fLaC":
        raise ValueError("FLAC: missing fLaC magic")
    pos = 4
    si_rate = si_chan = si_bits = None
    # metadata blocks
    while True:
        hdr = data[pos]
        btype = hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        body = data[pos + 4 : pos + 4 + blen]
        if btype == 0:  # STREAMINFO
            si_rate = (body[10] << 12) | (body[11] << 4) | (body[12] >> 4)
            si_chan = ((body[12] >> 1) & 0x07) + 1
            si_bits = (((body[12] & 0x01) << 4) | (body[13] >> 4)) + 1
        pos += 4 + blen
        if hdr & 0x80:
            break
    chans: list[list[np.ndarray]] = []
    nch_out = None
    rate, bits = si_rate, si_bits
    while pos < len(data) - 1:
        frame_start = pos
        r = _BitReader(data, pos)
        sync = r.read(14)
        if sync != 0x3FFE:
            raise ValueError("FLAC: bad frame sync")
        if r.read(1):
            raise ValueError("FLAC: reserved frame bit")
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        sz_code = r.read(3)
        if r.read(1):
            raise ValueError("FLAC: reserved frame bit 2")
        _utf8_number(r)
        if bs_code == 0:
            raise ValueError("FLAC: reserved block size code")
        elif bs_code == 6:
            blocksize = r.read(8) + 1
        elif bs_code == 7:
            blocksize = r.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_TABLE[bs_code]
        if sr_code == 0:
            rate = si_rate
        elif sr_code == 12:
            rate = r.read(8) * 1000
        elif sr_code == 13:
            rate = r.read(16)
        elif sr_code == 14:
            rate = r.read(16) * 10
        elif sr_code == 15:
            raise ValueError("FLAC: invalid sample rate code")
        else:
            rate = _RATE_TABLE[sr_code]
        if sz_code == 0:
            bits = si_bits
        elif sz_code in (3,):
            raise ValueError("FLAC: reserved sample size code")
        else:
            bits = _SIZE_TABLE[sz_code]
        # CRC-8 covers the header bytes up to (not incl.) the CRC byte
        if r._n:
            raise AssertionError("frame header must be byte-aligned here")
        if crc8(data[frame_start : r.pos]) != r.read(8):
            raise ValueError("FLAC: frame header CRC-8 mismatch")
        if ch_code <= 7:
            nch = ch_code + 1
            side = None
        elif ch_code in (8, 9, 10):
            nch = 2
            side = ch_code
        else:
            raise ValueError("FLAC: reserved channel assignment")
        subs = []
        for c in range(nch):
            extra = 0
            if side == 8 and c == 1:  # left/side: side has +1 bit
                extra = 1
            elif side == 9 and c == 0:  # right/side
                extra = 1
            elif side == 10 and c == 1:  # mid/side
                extra = 1
            subs.append(_decode_subframe(r, blocksize, bits + extra))
        r.align()
        if crc16(data[frame_start : r.pos]) != r.read(16):
            raise ValueError("FLAC: frame CRC-16 mismatch")
        pos = r.pos
        # undo stereo decorrelation (§4.2)
        if side == 8:  # left/side: right = left - side
            subs = [subs[0], subs[0] - subs[1]]
        elif side == 9:  # right/side: left = right + side
            subs = [subs[1] + subs[0], subs[1]]
        elif side == 10:  # mid/side
            mid, s = subs
            left = mid + ((s + (s & 1)) >> 1)
            right = left - s
            subs = [left, right]
        if nch_out is None:
            nch_out = nch
            chans = [[] for _ in range(nch)]
        for c in range(nch):
            chans[c].append(subs[c])
    if nch_out is None:
        return rate, si_chan, bits, np.empty(0, dtype=np.int64)
    per = [np.concatenate(c) if c else np.empty(0, dtype=np.int64) for c in chans]
    if nch_out == 1:
        samples = per[0]
    else:
        samples = np.empty(per[0].size * nch_out, dtype=np.int64)
        for c in range(nch_out):
            samples[c::nch_out] = per[c]
    return rate, nch_out, bits, samples


# ---------------------------------------------------------------------------
# Encoder (fixtures + round-trip tests)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, v: int, n: int) -> None:
        if n == 0:
            return
        self._acc = (self._acc << n) | (v & ((1 << n) - 1))
        self._n += n
        while self._n >= 8:
            self._n -= 8
            self.out.append((self._acc >> self._n) & 0xFF)
        self._acc &= (1 << self._n) - 1

    def write_signed(self, v: int, n: int) -> None:
        self.write(v & ((1 << n) - 1), n)

    def align(self) -> None:
        if self._n:
            self.write(0, 8 - self._n)


def _utf8_encode(w: _BitWriter, v: int) -> None:
    if v < 0x80:
        w.write(v, 8)
        return
    nbytes = 2
    while v >= (1 << (6 * (nbytes - 1) + (7 - nbytes))):
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    w.write(lead | (v >> (6 * (nbytes - 1))), 8)
    for i in range(nbytes - 2, -1, -1):
        w.write(0x80 | ((v >> (6 * i)) & 0x3F), 8)


def _zigzag(v: np.ndarray) -> np.ndarray:
    return (v << 1) ^ (v >> 63)


def _write_rice_partition(w: _BitWriter, resid: np.ndarray, k: int, pbits: int) -> None:
    w.write(k, pbits)
    u = _zigzag(resid.astype(np.int64))
    for x in u:
        x = int(x)
        q = x >> k
        w.write(0, q) if q else None
        w.write(1, 1)
        if k:
            w.write(x & ((1 << k) - 1), k)


def _write_residual(
    w: _BitWriter,
    resid: np.ndarray,
    k: int,
    porder: int = 0,
    escape_raw: int = 0,
    blocksize: int | None = None,
    order: int = 0,
) -> None:
    """Rice method 0, partition order `porder`; if escape_raw > 0 every
    partition is an escape (raw two's complement of that width).
    Partition boundaries follow the spec: each partition holds
    blocksize/2^porder samples except the first, which is shorter by
    the predictor order."""
    w.write(0, 2)  # 4-bit rice parameters
    w.write(porder, 4)
    nparts = 1 << porder
    bs = blocksize if blocksize is not None else resid.size + order
    assert bs % nparts == 0, "partition order must divide block size"
    bounds = [0]
    for p in range(nparts):
        bounds.append(bounds[-1] + bs // nparts - (order if p == 0 else 0))
    assert bounds[-1] == resid.size
    for p in range(nparts):
        part = resid[bounds[p] : bounds[p + 1]]
        if escape_raw:
            assert part.size == 0 or (
                part.min() >= -(1 << (escape_raw - 1))
                and part.max() < (1 << (escape_raw - 1))
            ), "escape width too narrow for residuals"
            w.write(0xF, 4)
            w.write(escape_raw, 5)
            for x in part:
                w.write_signed(int(x), escape_raw)
        else:
            _write_rice_partition(w, part, k, 4)


def encode_flac(
    rate: int,
    samples: np.ndarray,
    blocksize: int = 256,
    frame_plan=None,
) -> bytes:
    """Mono 16-bit FLAC encoder for fixtures and tests. `frame_plan`
    optionally maps frame index -> subframe strategy: 'fixed0'..'fixed4'
    (rice k auto), ('fixed2', k), 'verbatim', 'constant' (only valid for
    constant frames), or ('lpc', order, shift) with unit trailing
    coefficient. Default: fixed order 2, k auto per frame, k=0 every
    even frame (the decoder's vectorized path)."""
    s = np.asarray(samples, dtype=np.int64)
    assert s.size, "empty signal"
    assert np.abs(s).max() < 32768, "16-bit range"
    out = bytearray(b"fLaC")
    # STREAMINFO (34 bytes): min/max blocksize, min/max framesize (0),
    # rate(20) chan-1(3) bits-1(5) total(36), md5 of unencoded LE bytes
    nframes = (s.size + blocksize - 1) // blocksize
    last = s.size - (nframes - 1) * blocksize
    si = _BitWriter()
    si.write(min(blocksize, last) if nframes > 1 else s.size, 16)
    si.write(blocksize if nframes > 1 else s.size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(0, 3)  # channels - 1
    si.write(15, 5)  # bits - 1
    si.write(s.size, 36)
    md5 = hashlib.md5(s.astype("<i2").tobytes()).digest()
    body = bytes(si.out) + md5
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body
    for f in range(nframes):
        blk = s[f * blocksize : (f + 1) * blocksize]
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocksize strategy
        w.write(7, 4)  # 16-bit blocksize-1 escape (handles the short tail)
        w.write(13, 4)  # 16-bit sample rate in Hz
        w.write(0, 4)  # mono
        w.write(4, 3)  # 16 bits
        w.write(0, 1)
        _utf8_encode(w, f)
        w.write(blk.size - 1, 16)
        w.write(rate, 16)
        hdr = bytes(w.out)
        assert w._n == 0
        w.write(crc8(hdr), 8)
        plan = frame_plan(f, blk) if frame_plan else None
        if plan is None:
            plan = ("fixed2", None)  # rice k auto-selected per frame
        _encode_subframe(w, blk, plan)
        w.align()
        frame = bytes(w.out)
        w.write(crc16(frame), 16)
        out += bytes(w.out)
    return bytes(out)


def _auto_k(resid: np.ndarray) -> int:
    if resid.size == 0:
        return 0
    mean = int(np.abs(resid).mean() * 2) + 1
    return max(0, min(14, mean.bit_length() - 1))


def _encode_subframe(w: _BitWriter, blk: np.ndarray, plan, bits: int = 16) -> None:
    if isinstance(plan, str):
        plan = (plan,)
    kind = plan[0]
    w.write(0, 1)  # padding
    if kind == "constant":
        assert (blk == blk[0]).all()
        w.write(0, 6)
        w.write(0, 1)  # no wasted bits
        w.write_signed(int(blk[0]), bits)
        return
    if kind == "verbatim":
        w.write(1, 6)
        w.write(0, 1)
        for v in blk:
            w.write_signed(int(v), bits)
        return
    if kind.startswith("fixed"):
        order = int(kind[5])
        if blk.size <= order:
            # degenerate short tail: fall back to verbatim
            w.write(1, 6)
            w.write(0, 1)
            for v in blk:
                w.write_signed(int(v), bits)
            return
        w.write(8 + order, 6)
        w.write(0, 1)
        resid = blk.copy()
        for _ in range(order):
            resid = np.diff(resid)
        for v in blk[:order]:
            w.write_signed(int(v), bits)
        k = plan[1] if len(plan) > 1 and plan[1] is not None else _auto_k(resid)
        porder = plan[2] if len(plan) > 2 else 0
        escape_raw = plan[3] if len(plan) > 3 else 0
        _write_residual(w, resid, k, porder, escape_raw, blocksize=blk.size, order=order)
        return
    if kind == "lpc":
        # unit-coefficient LPC of given order/shift: coeffs [2^shift, 0..]
        # predicts s[i-1] exactly like fixed order 1 but through the LPC
        # path (precision 15, quantized coefficient 1<<shift)
        order, shift = plan[1], plan[2]
        w.write(31 + order, 6)
        w.write(0, 1)
        for v in blk[:order]:
            w.write_signed(int(v), bits)
        w.write(14, 4)  # precision 15
        w.write_signed(shift, 5)
        coefs = [1 << shift] + [0] * (order - 1)
        for c in coefs:
            w.write_signed(c, 15)
        # prediction uses only s[i-1]; residual for i >= order
        resid = (blk[order:] - blk[order - 1 : -1]).astype(np.int64)
        _write_residual(w, resid, _auto_k(resid), blocksize=blk.size, order=order)
        return
    raise ValueError(f"unknown subframe plan {plan}")


def encode_flac_stereo(
    rate: int,
    left: np.ndarray,
    right: np.ndarray,
    mode: str = "mid_side",
    blocksize: int = 256,
) -> bytes:
    """Test-only stereo encoder covering the decoder's channel
    decorrelation paths: mode in {'independent', 'left_side',
    'right_side', 'mid_side'}. mid = (l+r)>>1 (floor), side = l-r; the
    side channel carries bits+1 per spec. Fixed-order-2 subframes."""
    l = np.asarray(left, dtype=np.int64)
    r = np.asarray(right, dtype=np.int64)
    assert l.size == r.size and l.size
    ch_code = {"independent": 1, "left_side": 8, "right_side": 9, "mid_side": 10}[mode]
    out = bytearray(b"fLaC")
    nframes = (l.size + blocksize - 1) // blocksize
    si = _BitWriter()
    si.write(min(blocksize, l.size), 16)
    si.write(blocksize if nframes > 1 else l.size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(1, 3)  # channels - 1
    si.write(15, 5)
    si.write(l.size, 36)
    inter = np.empty(l.size * 2, dtype=np.int64)
    inter[0::2] = l
    inter[1::2] = r
    md5 = hashlib.md5(inter.astype("<i2").tobytes()).digest()
    body = bytes(si.out) + md5
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body
    for f in range(nframes):
        lb = l[f * blocksize : (f + 1) * blocksize]
        rb = r[f * blocksize : (f + 1) * blocksize]
        side = lb - rb
        if mode == "independent":
            chans = [(lb, 16), (rb, 16)]
        elif mode == "left_side":
            chans = [(lb, 16), (side, 17)]
        elif mode == "right_side":
            chans = [(side, 17), (rb, 16)]
        else:
            chans = [((lb + rb) >> 1, 16), (side, 17)]
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)
        w.write(7, 4)
        w.write(13, 4)
        w.write(ch_code, 4)
        w.write(4, 3)
        w.write(0, 1)
        _utf8_encode(w, f)
        w.write(lb.size - 1, 16)
        w.write(rate, 16)
        hdr = bytes(w.out)
        w.write(crc8(hdr), 8)
        for blk, bits in chans:
            _encode_subframe(w, blk, ("fixed2", None), bits=bits)
        w.align()
        frame = bytes(w.out)
        w.write(crc16(frame), 16)
        out += bytes(w.out)
    return bytes(out)
