"""Pure-stdlib baseline JPEG (SOF0) codec — the second REAL image format
(VERDICT r7 next-round #4; PNG/PPM landed in round 6).

`decode_jpeg` is a working general baseline decoder: marker walk, DQT /
DHT / SOF0 / DRI / SOS parsing, canonical Huffman decode with 0xFF00
byte-unstuffing and RSTn handling, DC DPCM + magnitude extension, AC
run-length (EOB/ZRL), dequantization, de-zigzag, 8x8 IDCT (exact DCT-III
basis, numpy matrix form), level shift + clamp, MCU-interleaved
CHROMA-SUBSAMPLED scans (4:2:0 / 4:2:2 / 4:4:0 — any integral sampling
ratio, decoded per-component at native resolution then replicated up,
T.81 §A.1.1/A.2.3), and YCbCr->RGB conversion. Progressive (SOF2)
still raises NotImplementedError — the documented hook where a
deployment plugs a C codec in (same boundary as PNG's interlace).

`encode_jpeg_blocks` is the fixture generator: a grayscale baseline JPEG
whose 8x8 blocks are each CONSTANT. Constant blocks make the lossy
pipeline exact end to end — the 2D DCT of a constant block is a single
DC coefficient 8*(v-128) with every AC exactly zero, and with the DC
quant step set to 8 the quantized DC is (v-128) itself, so
dequant + IDCT reproduce v bit-for-bit for every v in 0..255. That turns
a lossy codec into an oracle-checkable one: the DuckDB replay predicts
the DECODED pixel statistics in closed form, and any defect in the
Huffman tables, bit packing, byte stuffing, DPCM, dequant, or IDCT
breaks an integer sum (the same proof pattern as mm_decode_png).

The encoder still exercises the real entropy layer: per-block DC
differences span categories 0..8 (both signs), every block terminates
with a real EOB symbol, and 0xFF bytes in the entropy stream are
stuffed. tests/test_prep.py (test_jpeg_codec_roundtrip and siblings)
additionally round-trips sparse RANDOM AC coefficients through
`_encode_coeff_blocks`/`decode_jpeg`'s coefficient layer to pin the AC
run-length path the DC-only fixtures don't reach.

`encode_jpeg_color` extends the same exactness construction to COLOR
and 4:2:0: each 16x16 MACROBLOCK carries one constant (Y, Cb, Cr)
triplet, so all four Y blocks of an MCU and the one 8x8 block of each
subsampled chroma plane are constant — DC-only again, exactly divisible
by the DC quant step, and the 2x2 replication upsample reproduces the
generator's chroma values bit-for-bit (the property mm_decode_jpeg_420's
closed-form oracle replays).

Format knowledge is from the public JPEG spec (ITU-T T.81): marker
layout §B, canonical Huffman code generation §C.2, magnitude extension
§F.2.2.1, zigzag order Figure A.6.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: zigzag index -> raster index (T.81 Figure A.6)
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_ZZ_NP = np.array(ZIGZAG, dtype=np.int64)  # vectorized de-zigzag index

# 8x8 DCT-III (inverse DCT) basis matrix: pixel = B @ coeff @ B.T where
# B[x, u] = C(u)/2 * cos((2x+1) u pi / 16)
_B = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0) / 2.0 * np.cos((2 * x + 1) * u * np.pi / 16)
            for u in range(8)
        ]
        for x in range(8)
    ]
)


def idct_8x8(coeffs: np.ndarray) -> np.ndarray:
    """Exact 2-D inverse DCT of one 8x8 coefficient block (float64)."""
    return _B @ coeffs @ _B.T


# ---------------------------------------------------------------------------
# Huffman tables (canonical, T.81 §C.2): bits[i] = #codes of length i+1
# ---------------------------------------------------------------------------


def _build_decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(code_length, code_value) -> symbol, per canonical generation."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code_value, code_length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# fixture tables: DC categories 0..11 all at length 4 (12 of 16 4-bit
# codes used; the all-ones code stays unassigned per §C.2's convention);
# AC needs only EOB for DC-only blocks plus ZRL and a few (run,size)
# symbols for the pytest AC round-trip
FIX_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
FIX_DC_VALS = list(range(12))
FIX_AC_VALS = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 5)]
# 66 symbols: 40 at length 6, 26 at length 7 (canonical; all-ones free)
FIX_AC_BITS = [0, 0, 0, 0, 0, 40, 26, 0, 0, 0, 0, 0, 0, 0, 0, 0]

# fixture quant table (RASTER order): DC step 8 (divides 8*(v-128)
# exactly for every v — the lossless-roundtrip trick), AC step 16
FIX_QUANT = np.array([8] + [16] * 63, dtype=np.int32)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            byte = (self._acc >> (self._nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (§B.1.1.5)
                self.out.append(0x00)
            self._nbits -= 8
            self._acc &= (1 << self._nbits) - 1

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (§F.1.2.3) — required
        before emitting a restart marker mid-stream."""
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)

    def emit_marker(self, marker: int) -> None:
        """Append a bare marker (RSTn) to the aligned stream — NOT
        byte-stuffed: markers are exactly the 0xFF-next-nonzero escapes
        the stuffing exists to distinguish."""
        self.align()
        self.out.append(0xFF)
        self.out.append(marker)

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self._acc = 0
        self._nbits = 0

    def read_bit(self) -> int:
        if self._nbits == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise _MarkerHit(nxt)
            self._acc = b
            self._nbits = 8
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self._nbits = 0


class _MarkerHit(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _extend(value: int, size: int) -> int:
    """Magnitude extension (T.81 §F.2.2.1)."""
    if size == 0:
        return 0
    return value if value >= (1 << (size - 1)) else value - (1 << size) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _mag_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _decode_huff(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("JPEG: invalid Huffman code")


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_jpeg(data: bytes, components: bool = False):
    """Decode a baseline (SOF0) JPEG, including chroma-subsampled scans
    (4:2:0/4:2:2/…, any integral sampling ratio). Returns (width, height,
    channels, pixels) with interleaved uint8 bytes — grayscale
    (1 component) or YCbCr converted to RGB (3 components). With
    `components=True` returns (width, height, ncomp, [plane, ...])
    instead: each component's uint8 plane UPSAMPLED to full resolution
    and cropped, BEFORE color conversion — the integer-exact surface
    mm_decode_jpeg_420's oracle replays (the RGB matrix is float and
    stays pytest-pinned, not oracle-checked). Progressive inputs raise
    NotImplementedError (documented hook)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("JPEG: missing SOI")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    width = height = None
    comps: list[tuple[int, int, int, int]] = []  # (id, h_samp, v_samp, qid)
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG: expected marker")
        # T.81 §B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker; a conforming third-party encoder that pads would
        # otherwise misparse the segment length (ADVICE r8)
        while pos + 2 <= len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        body = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                prec_id = body[i]
                if prec_id >> 4 != 0:
                    raise NotImplementedError("JPEG: 16-bit quant tables")
                tbl = np.empty(64, dtype=np.int32)
                for z in range(64):
                    tbl[ZIGZAG[z]] = body[i + 1 + z]  # stored zigzag -> raster
                quant[prec_id & 0x0F] = tbl
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                class_id = body[i]
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                table = _build_decode_table(bits, vals)
                (huff_ac if class_id >> 4 else huff_dc)[class_id & 0x0F] = table
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise NotImplementedError("JPEG: only 8-bit precision")
            comps = []
            for c in range(ncomp):
                cid, samp, qid = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0x0F, qid))
            hmax = max(hs for _, hs, _, _ in comps)
            vmax = max(vs for _, _, vs, _ in comps)
            if any(hmax % hs or vmax % vs for _, hs, vs, _ in comps):
                raise NotImplementedError("JPEG: non-integral sampling ratio")
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError("JPEG: only baseline SOF0 supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scan: list[tuple[int, int, int]] = []  # (comp_idx, dc_id, ac_id)
            for c in range(ns):
                cid, tbl = body[1 + 2 * c], body[2 + 2 * c]
                idx = next(i for i, comp in enumerate(comps) if comp[0] == cid)
                scan.append((idx, tbl >> 4, tbl & 0x0F))
            return _decode_scan(
                data, pos, width, height, comps, scan,
                quant, huff_dc, huff_ac, restart_interval, components,
            )
        # APPn / COM / anything else: skipped
    raise ValueError("JPEG: no SOS marker found")


def _decode_scan(
    data, pos, width, height, comps, scan, quant, huff_dc, huff_ac, dri,
    components=False,
):
    """MCU-interleaved entropy decode (T.81 §A.2.3): one MCU carries
    h_i*v_i data units per scan component (row-major within the MCU), so
    a 4:2:0 MCU is Y,Y,Y,Y,Cb,Cr covering 16x16 pixels. Each component
    decodes into a plane at its NATIVE resolution; subsampled planes are
    replicated up (nearest-neighbor, the deterministic upsample whose
    arithmetic the fixture oracle can replay) and cropped at the end."""
    reader = _BitReader(data, pos)
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * 8 * comps[ci][2], mcux * 8 * comps[ci][1]), dtype=np.float64)
        for ci, _, _ in scan
    ]
    pred = [0] * len(scan)
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu and mcu % dri == 0:
                reader.align()
                # consume the RSTn marker between restart intervals
                while data[reader.pos] == 0xFF and data[reader.pos + 1] == 0xFF:
                    reader.pos += 1
                if data[reader.pos] == 0xFF and 0xD0 <= data[reader.pos + 1] <= 0xD7:
                    reader.pos += 2
                pred = [0] * len(scan)
            for si, (ci, dc_id, ac_id) in enumerate(scan):
                _, hs, vs, qid = comps[ci]
                for byy in range(vs):
                    for bxx in range(hs):
                        zz = np.zeros(64, dtype=np.int64)
                        size = _decode_huff(reader, huff_dc[dc_id])
                        diff = _extend(reader.read_bits(size), size)
                        pred[si] += diff
                        zz[0] = pred[si]
                        k = 1
                        while k < 64:
                            sym = _decode_huff(reader, huff_ac[ac_id])
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL: 16 zeros
                                k += 16
                                continue
                            run, ssss = sym >> 4, sym & 0x0F
                            k += run
                            if k > 63:
                                raise ValueError("JPEG: AC run past block end")
                            zz[k] = _extend(reader.read_bits(ssss), ssss)
                            k += 1
                        q = quant[qid]
                        block = np.empty(64, dtype=np.int64)
                        block[_ZZ_NP] = zz  # vectorized de-zigzag
                        block = (block.reshape(8, 8) * q.reshape(8, 8)).astype(np.float64)
                        px = idct_8x8(block) + 128.0
                        r0 = (my * vs + byy) * 8
                        c0 = (mx * hs + bxx) * 8
                        planes[si][r0 : r0 + 8, c0 : c0 + 8] = px
            mcu += 1
    full = []
    for si, (ci, _, _) in enumerate(scan):
        _, hs, vs, _ = comps[ci]
        p = planes[si]
        if hs != hmax or vs != vmax:  # replicate up to full resolution
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:height, :width])
    out = [np.clip(np.round(p), 0, 255).astype(np.uint8) for p in full]
    if components:
        return width, height, len(out), out
    if len(out) == 1:
        return width, height, 1, out[0].tobytes()
    if len(out) == 3:
        y, cb, cr = (o.astype(np.float64) for o in out)
        r = y + 1.402 * (cr - 128)
        g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
        b = y + 1.772 * (cb - 128)
        rgb = np.stack(
            [np.clip(np.round(c), 0, 255).astype(np.uint8) for c in (r, g, b)], axis=-1
        )
        return width, height, 3, rgb.tobytes()
    raise NotImplementedError(f"JPEG: {len(out)}-component scan unsupported")


# ---------------------------------------------------------------------------
# Fixture encoder
# ---------------------------------------------------------------------------


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _fixture_headers(width: int, height: int, restart_interval: int = 0) -> bytes:
    dqt = bytes([0x00]) + bytes(int(FIX_QUANT[ZIGZAG[z]]) for z in range(64))
    sof = struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
    dht_dc = bytes([0x00]) + bytes(FIX_DC_BITS) + bytes(FIX_DC_VALS)
    dht_ac = bytes([0x10]) + bytes(FIX_AC_BITS) + bytes(FIX_AC_VALS)
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    dri = _seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    return (
        b"\xff\xd8"
        + _seg(0xDB, dqt)
        + _seg(0xC0, sof)
        + dri
        + _seg(0xC4, dht_dc)
        + _seg(0xC4, dht_ac)
        + _seg(0xDA, sos)
    )


def encode_jpeg_blocks(
    blocks_w: int, blocks_h: int, values, restart_interval: int = 0
) -> bytes:
    """Grayscale baseline JPEG of (blocks_w*8) x (blocks_h*8) pixels where
    block i (row-major) is the CONSTANT value values[i] in 0..255 — the
    exact-roundtrip fixture (module docstring). Real DPCM + Huffman +
    stuffing; every block ends with a true EOB symbol. With
    `restart_interval` > 0 a DRI segment is declared and RSTn markers are
    emitted (byte-aligned, cycling D0..D7) every N MCUs with the DC
    predictor reset — the resync path a parallel/robust decoder relies
    on (pinned by the restart-marker pytest)."""
    dc_enc = _build_encode_table(FIX_DC_BITS, FIX_DC_VALS)
    ac_enc = _build_encode_table(FIX_AC_BITS, FIX_AC_VALS)
    w = _BitWriter()
    pred = 0
    for i, v in enumerate(values):
        if restart_interval and i and i % restart_interval == 0:
            w.emit_marker(0xD0 + ((i // restart_interval - 1) % 8))
            pred = 0  # predictors reset at every restart (§F.2.1.3.1)
        dc = int(v) - 128  # quantized DC: 8*(v-128) / q00=8
        diff = dc - pred
        pred = dc
        size = _category(diff)
        code, length = dc_enc[size]
        w.write(code, length)
        w.write(_mag_bits(diff, size), size)
        code, length = ac_enc[0x00]  # EOB
        w.write(code, length)
    return (
        _fixture_headers(blocks_w * 8, blocks_h * 8, restart_interval)
        + w.flush()
        + b"\xff\xd9"
    )


def encode_jpeg_color(
    mcus_w: int,
    mcus_h: int,
    triplets,
    subsample: str = "420",
    restart_interval: int = 0,
) -> bytes:
    """Color baseline JPEG whose MCUs each carry one CONSTANT
    (Y, Cb, Cr) triplet — the exact-roundtrip construction extended to
    chroma subsampling. For "420" an MCU is a 16x16 macroblock (4 Y
    blocks at constant y, one 8x8 Cb and one 8x8 Cr block at constant
    cb/cr — the subsampled planes the decoder must replicate 2x2 back
    up); for "444" an MCU is 8x8 (Y,Cb,Cr interleaved 1:1:1). Constant
    blocks make every component DC-only and the DC quant step 8 divides
    8*(v-128) exactly, so the decoded component planes equal the
    generator bit-for-bit INCLUDING the upsample (replication of an
    exact constant) — only the float RGB matrix is excluded from the
    oracle surface (decode_jpeg(components=True) stops before it).
    `triplets` is row-major per MCU, length mcus_w*mcus_h."""
    samp = {"420": (2, 2), "444": (1, 1)}[subsample]
    hs, vs = samp
    width, height = mcus_w * 8 * hs, mcus_h * 8 * vs
    dqt = bytes([0x00]) + bytes(int(FIX_QUANT[ZIGZAG[z]]) for z in range(64))
    sof = struct.pack(">BHHB", 8, height, width, 3) + bytes(
        [1, (hs << 4) | vs, 0, 2, 0x11, 0, 3, 0x11, 0]
    )
    dht_dc = bytes([0x00]) + bytes(FIX_DC_BITS) + bytes(FIX_DC_VALS)
    dht_ac = bytes([0x10]) + bytes(FIX_AC_BITS) + bytes(FIX_AC_VALS)
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    dri = _seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    head = (
        b"\xff\xd8"
        + _seg(0xDB, dqt)
        + _seg(0xC0, sof)
        + dri
        + _seg(0xC4, dht_dc)
        + _seg(0xC4, dht_ac)
        + _seg(0xDA, sos)
    )
    dc_enc = _build_encode_table(FIX_DC_BITS, FIX_DC_VALS)
    ac_enc = _build_encode_table(FIX_AC_BITS, FIX_AC_VALS)
    w = _BitWriter()
    pred = [0, 0, 0]
    for i, (y, cb, cr) in enumerate(triplets):
        if restart_interval and i and i % restart_interval == 0:
            w.emit_marker(0xD0 + ((i // restart_interval - 1) % 8))
            pred = [0, 0, 0]
        for ci, (v, nblocks) in enumerate(((y, hs * vs), (cb, 1), (cr, 1))):
            for _ in range(nblocks):
                dc = int(v) - 128
                diff = dc - pred[ci]
                pred[ci] = dc
                size = _category(diff)
                code, length = dc_enc[size]
                w.write(code, length)
                w.write(_mag_bits(diff, size), size)
                code, length = ac_enc[0x00]  # EOB
                w.write(code, length)
    return head + w.flush() + b"\xff\xd9"


def _encode_coeff_blocks(blocks: "list[np.ndarray]", blocks_w: int, blocks_h: int) -> bytes:
    """Test-only encoder taking QUANTIZED coefficient blocks (raster 8x8
    int arrays) so pytest can push sparse AC runs (incl. ZRL) through the
    entropy layer and compare decode_jpeg's dequantized IDCT against an
    independent replay. Coefficients must fit the fixture AC table:
    runs < 16 between nonzeros (or multiples of 16 via ZRL) and
    categories <= 4."""
    dc_enc = _build_encode_table(FIX_DC_BITS, FIX_DC_VALS)
    ac_enc = _build_encode_table(FIX_AC_BITS, FIX_AC_VALS)
    w = _BitWriter()
    pred = 0
    for blk in blocks:
        zz = [int(blk.reshape(64)[ZIGZAG[z]]) for z in range(64)]
        diff = zz[0] - pred
        pred = zz[0]
        size = _category(diff)
        code, length = dc_enc[size]
        w.write(code, length)
        w.write(_mag_bits(diff, size), size)
        k = 1
        while k < 64:
            run = 0
            j = k
            while j < 64 and zz[j] == 0:
                run += 1
                j += 1
            if j == 64:
                code, length = ac_enc[0x00]
                w.write(code, length)
                break
            while run >= 16:
                code, length = ac_enc[0xF0]
                w.write(code, length)
                run -= 16
            size = _category(zz[j])
            code, length = ac_enc[(run << 4) | size]
            w.write(code, length)
            w.write(_mag_bits(zz[j], size), size)
            k = j + 1
        else:
            pass
    return _fixture_headers(blocks_w * 8, blocks_h * 8) + w.flush() + b"\xff\xd9"
