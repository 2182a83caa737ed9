"""Pure-stdlib baseline JPEG (SOF0) codec — the second REAL image format
(VERDICT r7 next-round #4; PNG/PPM landed in round 6).

`decode_jpeg` is a working general Huffman JPEG decoder: marker walk,
DQT / DHT / SOF0 / SOF2 / DRI / SOS parsing, canonical Huffman decode
with 0xFF00 byte-unstuffing and RSTn handling, DC DPCM + magnitude
extension, AC run-length (EOB/ZRL), dequantization, de-zigzag, 8x8 IDCT
(exact DCT-III basis, numpy matrix form), level shift + clamp,
MCU-interleaved CHROMA-SUBSAMPLED scans (4:2:0 / 4:2:2 / 4:4:0 — any
integral sampling ratio, decoded per-component at native resolution
then replicated up, T.81 §A.1.1/A.2.3), PROGRESSIVE (SOF2) multi-scan
streams (Annex G: spectral selection, successive approximation with DC
refinement bits and §G.1.2.3 AC correction-bit refinement, EOB-run
batching — round 9), ARITHMETIC-CODED frames both sequential (SOF9 +
DAC, QM coder in operators/jpeg_arith.py — round 9) and PROGRESSIVE
(SOF10, the Annex-G scan kinds through the QM coder — round 10),
LOSSLESS predictive frames (SOF3, Annex-H DPCM with all seven
predictors — round 10), HIERARCHICAL streams (Annex J: DHP progression,
§J.8 reference expansion, SOF5 differential frames — round 10), and
YCbCr->RGB conversion. The arithmetic differential/lossless frame
types (SOF11/13-15)
raise NotImplementedError — the documented
hook where a deployment plugs a C codec in (same boundary as PNG's
interlace).

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
# high-precision lossless DC table: SSSS 0..16 (a 16-bit DPCM diff can
# reach category 16, the no-magnitude-bits 32768 escape); 17 canonical
# codes at length 5 (32 >= 17, all-ones free)
LL16_DC_BITS = [0, 0, 0, 0, 17, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
LL16_DC_VALS = list(range(17))
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
    """Decode a baseline (SOF0) or PROGRESSIVE (SOF2) JPEG, including
    chroma-subsampled scans (4:2:0/4:2:2/…, any integral sampling
    ratio). Returns (width, height, channels, pixels) with interleaved
    uint8 bytes — grayscale (1 component) or YCbCr converted to RGB
    (3 components). With `components=True` returns (width, height,
    ncomp, [plane, ...]) instead: each component's uint8 plane UPSAMPLED
    to full resolution and cropped, BEFORE color conversion — the
    integer-exact surface the mm_decode_jpeg_* oracles replay (the RGB
    matrix is float and stays pytest-pinned, not oracle-checked).

    Progressive decode (T.81 Annex G, round 9): coefficients accumulate
    across scans in a per-component zigzag store — spectral selection
    (Ss/Se bands per scan), successive approximation (DC point
    transform + refinement bits, AC first/refine with EOB-run batching,
    §G.1.2.2-3) — and one dequant+IDCT pass reconstructs after EOI.
    Arithmetic-coded frames (SOF9 sequential, SOF10 progressive + DAC
    conditioning) decode through the QM coder in jpeg_arith.py;
    lossless (SOF3 Huffman, SOF11 arithmetic) decodes via the Annex-H
    predictive scan; hierarchical streams (DHP/EXP + differential
    frames SOF5/6/7 Huffman and SOF13/14/15 arithmetic) walk the
    Annex-J frame sequence. As of round 11 EVERY T.81 frame type
    decodes at 8-bit precision (SOF1 extended-sequential is baseline
    at 8 bits); the remaining loud failures are genuine stream errors
    (differential frame without DHP, 12/16-bit precision, non-integral
    sampling)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("JPEG: missing SOI")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    width = height = None
    comps: list[tuple[int, int, int, int]] = []  # (id, h_samp, v_samp, qid)
    restart_interval = 0
    progressive = False
    arith = False
    lossless = False
    differential = False
    hier_full: tuple[int, int] | None = None  # DHP-declared final dims
    hier_ref: np.ndarray | None = None  # reconstructed reference plane
    arith_dc_cond: dict[int, tuple[int, int]] = {}  # tbl -> (L, U)
    arith_ac_cond: dict[int, int] = {}  # tbl -> Kx
    coeffs: list[np.ndarray] = []  # per component: (gh, gw, 64) zigzag ints

    def _finalize_hier_prog():
        """Fold a pending DIFFERENTIAL PROGRESSIVE frame (SOF6/SOF14)
        into the hierarchical reference: a progressive frame's scans
        accumulate coefficients until the next frame boundary (another
        SOF, an EXP, or EOI — T.81 Annex J frames have no explicit end
        marker), at which point one dequant+IDCT pass reconstructs the
        residual (no +128 level shift, DC coded with PRED = 0) and adds
        it onto the reference, clamping per frame."""
        nonlocal hier_ref, coeffs, progressive, differential
        if hier_full is None or not (progressive and differential and coeffs):
            return
        q = quant[comps[0][3]]
        store = coeffs[0]
        gh, gw = store.shape[:2]
        out = hier_ref.astype(np.float64).copy()
        for by in range(gh):
            for bx in range(gw):
                block = np.empty(64, dtype=np.int64)
                block[_ZZ_NP] = store[by, bx]
                res = idct_8x8(
                    (block.reshape(8, 8) * q.reshape(8, 8)).astype(np.float64)
                )
                r0, c0 = by * 8, bx * 8
                h8 = min(8, height - r0)
                w8 = min(8, width - c0)
                if h8 > 0 and w8 > 0:
                    out[r0 : r0 + h8, c0 : c0 + w8] += res[:h8, :w8]
        hier_ref = np.clip(np.round(out), 0, 255).astype(np.int64)
        coeffs = []
        progressive = differential = False

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
                pq = prec_id >> 4  # 0 = 8-bit entries, 1 = 16-bit (§B.2.4.1)
                if pq not in (0, 1):
                    raise ValueError(f"JPEG: bad quant-table precision {pq}")
                tbl = np.empty(64, dtype=np.int32)
                if pq:  # 16-bit entries: the 12-bit-sample table format
                    for z in range(64):
                        tbl[ZIGZAG[z]] = struct.unpack(
                            ">H", body[i + 1 + 2 * z : i + 3 + 2 * z]
                        )[0]
                    i += 129
                else:
                    for z in range(64):
                        tbl[ZIGZAG[z]] = body[i + 1 + z]  # stored zigzag -> raster
                    i += 65
                quant[prec_id & 0x0F] = tbl
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
        elif marker == 0xDE:  # DHP: hierarchical progression (T.81 Annex J)
            _prec, fh, fw, fn = struct.unpack(">BHHB", body[:6])
            if fn != 1:
                raise NotImplementedError(
                    "JPEG hierarchical: single-component streams only"
                )
            hier_full = (fw, fh)
        elif marker == 0xDF:  # EXP: expand reference (J.8) before a frame
            _finalize_hier_prog()  # a pending prog-diff frame ends here
            if hier_ref is None:
                raise ValueError("JPEG: EXP before any reference frame")
            hier_ref = _exp_expand(hier_ref, body[0] >> 4, body[0] & 0x0F)
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC9, 0xCA, 0xCB) or (
            marker in (0xC5, 0xC6, 0xC7, 0xCD, 0xCE, 0xCF)
            and hier_full is not None
        ):
            # Every T.81 8-bit frame type (round 11 closes the set):
            # SOF0/1 baseline+extended-seq Huffman, SOF2 progressive,
            # SOF3 lossless, SOF9/10/11 their arithmetic twins, and —
            # inside a hierarchical process only — the differential
            # types SOF5/6/7 (Huffman seq/prog/lossless) and
            # SOF13/14/15 (arithmetic seq/prog/lossless).
            _finalize_hier_prog()  # a pending prog-diff frame ends here
            if hier_full is not None and marker in (0xC2, 0xCA):
                raise NotImplementedError(
                    "JPEG hierarchical: initial frame must be "
                    "non-progressive (sequential or lossless)"
                )
            if hier_full is not None and body[0] != 8:
                raise NotImplementedError(
                    "JPEG hierarchical: 8-bit sample planes only"
                )
            progressive = marker in (0xC2, 0xCA, 0xC6, 0xCE)
            arith = marker in (0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF)
            lossless = marker in (0xC3, 0xCB, 0xC7, 0xCF)
            differential = marker in (0xC5, 0xC6, 0xC7, 0xCD, 0xCE, 0xCF)
            precision, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            if lossless:
                # T.81 lossless allows P in 2..16 (the DICOM archives the
                # SOF3 docstring cites are typically 12/16-bit); DCT modes
                # stay 8-bit (extended 12-bit DCT is a quant-table format
                # change this decoder does not claim)
                if not 2 <= precision <= 16:
                    raise ValueError(f"JPEG: bad lossless precision {precision}")
            elif precision not in (8, 12):
                # T.81 Table B.2: DCT modes carry 8- or 12-bit samples only
                raise NotImplementedError("JPEG: DCT-mode precision must be 8 or 12")
            elif precision == 12 and marker == 0xC0:
                raise ValueError("JPEG: baseline (SOF0) is 8-bit by definition")
            comps = []
            for c in range(ncomp):
                cid, samp, qid = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0x0F, qid))
            hmax = max(hs for _, hs, _, _ in comps)
            vmax = max(vs for _, _, vs, _ in comps)
            if any(hmax % hs or vmax % vs for _, hs, vs, _ in comps):
                raise NotImplementedError("JPEG: non-integral sampling ratio")
            if progressive:
                mcux = (width + 8 * hmax - 1) // (8 * hmax)
                mcuy = (height + 8 * vmax - 1) // (8 * vmax)
                coeffs = [
                    np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int64)
                    for _, hs, vs, _ in comps
                ]
        elif marker in (0xC5, 0xC6, 0xC7, 0xCD, 0xCE, 0xCF):
            # differential frames are only legal inside a hierarchical
            # process (T.81 Annex J: they refine a DHP-declared reference)
            raise ValueError(
                "JPEG: differential frame outside a hierarchical process "
                "(no DHP marker seen)"
            )
        elif marker == 0xCC:  # DAC: arithmetic conditioning (§B.2.4.3)
            i = 0
            while i + 1 < len(body):
                tc_tb, cs = body[i], body[i + 1]
                if tc_tb >> 4 == 0:
                    arith_dc_cond[tc_tb & 0x0F] = (cs & 0x0F, cs >> 4)  # (L, U)
                else:
                    arith_ac_cond[tc_tb & 0x0F] = cs  # Kx
                i += 2
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scan: list[tuple[int, int, int]] = []  # (comp_idx, dc_id, ac_id)
            for c in range(ns):
                cid, tbl = body[1 + 2 * c], body[2 + 2 * c]
                idx = next(i for i, comp in enumerate(comps) if comp[0] == cid)
                scan.append((idx, tbl >> 4, tbl & 0x0F))
            if hier_full is not None:
                # hierarchical frame scan: build/refine the reference
                # plane, then keep walking the frame sequence to EOI
                if len(scan) != 1:
                    raise NotImplementedError(
                        "JPEG hierarchical: single-component scans only"
                    )
                ss = body[1 + 2 * ns]
                se = body[2 + 2 * ns]
                ah_al = body[3 + 2 * ns]
                if differential and progressive:
                    # SOF6/SOF14: scans accumulate into the coefficient
                    # store; _finalize_hier_prog folds it at the next
                    # frame boundary / EOI
                    if arith:
                        from .jpeg_arith import decode_arith_prog_scan

                        pos = decode_arith_prog_scan(
                            data, pos, width, height, comps, scan, coeffs,
                            arith_dc_cond, arith_ac_cond, restart_interval,
                            ss, se, ah_al >> 4, ah_al & 0x0F,
                            differential=True,
                        )
                    else:
                        pos = _decode_progressive_scan(
                            data, pos, width, height, comps, scan, coeffs,
                            huff_dc, huff_ac, restart_interval,
                            ss, se, ah_al >> 4, ah_al & 0x0F,
                            differential=True,
                        )
                    continue
                if differential and lossless:
                    # SOF7/SOF15: per-sample residuals against the
                    # reference, mod-2^16 reconstruction (Annex J)
                    if arith:
                        from .jpeg_arith import decode_lossless_arith_scan

                        hier_ref = decode_lossless_arith_scan(
                            data, pos, width, height, comps, scan,
                            arith_dc_cond, restart_interval, ss,
                            ah_al & 0x0F, True, ref=hier_ref,
                        )
                    else:
                        hier_ref = _decode_differential_lossless_scan(
                            data, pos, width, height, comps, scan,
                            huff_dc, restart_interval, hier_ref,
                        )
                elif differential:
                    if arith:  # SOF13
                        from .jpeg_arith import decode_arith_differential_scan

                        hier_ref = decode_arith_differential_scan(
                            data, pos, width, height, comps, scan, quant,
                            arith_dc_cond, arith_ac_cond, restart_interval,
                            hier_ref,
                        )
                    else:  # SOF5
                        hier_ref = _decode_differential_scan(
                            data, pos, width, height, comps, scan,
                            quant, huff_dc, huff_ac, restart_interval,
                            hier_ref,
                        )
                elif lossless:
                    if arith:  # SOF11 initial frame
                        from .jpeg_arith import decode_lossless_arith_scan

                        _w, _h, _n, planes = decode_lossless_arith_scan(
                            data, pos, width, height, comps, scan,
                            arith_dc_cond, restart_interval, ss,
                            ah_al & 0x0F, True,
                        )
                        hier_ref = planes[0].astype(np.int64)
                    else:  # SOF3 initial frame
                        _w, _h, _n, planes = _decode_lossless_scan(
                            data, pos, width, height, comps, scan, huff_dc,
                            restart_interval, ss, ah_al & 0x0F, True,
                        )
                        hier_ref = planes[0].astype(np.int64)
                elif arith:  # SOF9 initial frame
                    from .jpeg_arith import decode_arith_scan

                    _w, _h, _n, planes = decode_arith_scan(
                        data, pos, width, height, comps, scan,
                        quant, arith_dc_cond, arith_ac_cond,
                        restart_interval, True,
                    )
                    hier_ref = planes[0].astype(np.int64)
                else:  # SOF0/SOF1 initial frame
                    _w, _h, _n, planes = _decode_scan(
                        data, pos, width, height, comps, scan,
                        quant, huff_dc, huff_ac, restart_interval,
                        components=True,
                    )
                    hier_ref = planes[0].astype(np.int64)
                pos = _next_marker_pos(data, pos)
                continue
            if lossless:  # SOF3/SOF11: single predictive scan, returns directly
                ss = body[1 + 2 * ns]  # predictor selector (T.81 H.1)
                ah_al = body[3 + 2 * ns]
                if arith:  # SOF11
                    from .jpeg_arith import decode_lossless_arith_scan

                    return decode_lossless_arith_scan(
                        data, pos, width, height, comps, scan,
                        arith_dc_cond, restart_interval, ss,
                        ah_al & 0x0F, components, precision=precision,
                    )
                return _decode_lossless_scan(
                    data, pos, width, height, comps, scan, huff_dc,
                    restart_interval, ss, ah_al & 0x0F, components,
                    precision=precision,
                )
            if arith and progressive:  # SOF10
                from .jpeg_arith import decode_arith_prog_scan

                ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
                ah_al = body[3 + 2 * ns]
                pos = decode_arith_prog_scan(
                    data, pos, width, height, comps, scan, coeffs,
                    arith_dc_cond, arith_ac_cond, restart_interval,
                    ss, se, ah_al >> 4, ah_al & 0x0F,
                )
                continue
            if arith:
                from .jpeg_arith import decode_arith_scan

                return decode_arith_scan(
                    data, pos, width, height, comps, scan,
                    quant, arith_dc_cond, arith_ac_cond, restart_interval,
                    components, precision=precision,
                )
            if not progressive:
                return _decode_scan(
                    data, pos, width, height, comps, scan,
                    quant, huff_dc, huff_ac, restart_interval, components,
                    precision,
                )
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah_al = body[3 + 2 * ns]
            pos = _decode_progressive_scan(
                data, pos, width, height, comps, scan, coeffs,
                huff_dc, huff_ac, restart_interval,
                ss, se, ah_al >> 4, ah_al & 0x0F,
            )
        # APPn / COM / anything else: skipped
    _finalize_hier_prog()  # a prog-diff final frame ends at EOI
    if hier_ref is not None:
        fw, fh = hier_full
        if hier_ref.shape != (fh, fw):
            raise ValueError(
                f"JPEG hierarchical: reference {hier_ref.shape[::-1]} != "
                f"DHP dims {(fw, fh)} at EOI"
            )
        plane = np.clip(hier_ref, 0, 255).astype(np.uint8)
        if components:
            return fw, fh, 1, [plane]
        return fw, fh, 1, plane.tobytes()
    if progressive and coeffs:
        return _reconstruct_progressive(
            width, height, comps, coeffs, quant, components, precision
        )
    raise ValueError("JPEG: no SOS marker found")


def _decode_scan(
    data, pos, width, height, comps, scan, quant, huff_dc, huff_ac, dri,
    components=False, precision=8,
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
                        px = idct_8x8(block) + float(1 << (precision - 1))
                        r0 = (my * vs + byy) * 8
                        c0 = (mx * hs + bxx) * 8
                        planes[si][r0 : r0 + 8, c0 : c0 + 8] = px
            mcu += 1
    samps = [(comps[ci][1], comps[ci][2]) for ci, _, _ in scan]
    return _assemble_output(planes, samps, width, height, components, precision)


def _assemble_output(planes, samps, width, height, components, precision=8):
    """Shared output tail (baseline + progressive): upsample each
    component's native-resolution float plane by replication, crop,
    clamp, and either return the planes (`components=True`) or convert
    YCbCr->RGB / emit grayscale bytes."""
    hmax = max(hs for hs, _ in samps)
    vmax = max(vs for _, vs in samps)
    full = []
    for p, (hs, vs) in zip(planes, samps):
        if hs != hmax or vs != vmax:  # replicate up to full resolution
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:height, :width])
    maxval = (1 << precision) - 1
    dtype = np.uint8 if precision <= 8 else np.uint16
    out = [np.clip(np.round(p), 0, maxval).astype(dtype) for p in full]
    if components:
        return width, height, len(out), out
    if len(out) == 1:
        return width, height, 1, out[0].tobytes()
    if len(out) == 3 and precision != 8:
        # the float RGB matrix contract is 8-bit; 12-bit color callers
        # take the integer-exact planes via components=True
        raise NotImplementedError("JPEG: 12-bit color output is plane-only")
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
# Progressive (SOF2) decoding — T.81 Annex G
# ---------------------------------------------------------------------------


def _decode_progressive_scan(
    data, pos, width, height, comps, scan, coeffs, huff_dc, huff_ac, dri,
    ss, se, ah, al, differential=False,
):
    """Decode ONE progressive scan's entropy segment into the coefficient
    store and return the stream position of the next marker. Four scan
    kinds (T.81 §G.1.2): DC first (DPCM of the point-transformed DC,
    interleaved or not), DC refinement (one raw bit per data unit), AC
    first (run-length with EOB-run batching, always non-interleaved),
    AC refinement (correction bits for already-significant coefficients
    woven between newly-significant ones, §G.1.2.3)."""
    reader = _BitReader(data, pos)
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    pred = [0] * len(scan)
    eobrun = 0

    def restart():
        nonlocal pred, eobrun
        reader.align()
        p = reader.pos
        while data[p] == 0xFF and data[p + 1] == 0xFF:
            p += 1
        if data[p] == 0xFF and 0xD0 <= data[p + 1] <= 0xD7:
            reader.pos = p + 2
        pred = [0] * len(scan)
        eobrun = 0

    def dc_first(zz, dc_tbl, si):
        size = _decode_huff(reader, dc_tbl)
        diff = _extend(reader.read_bits(size), size)
        if differential:  # T.81 differential frames: PRED fixed at 0
            zz[0] = diff << al
        else:
            pred[si] += diff
            zz[0] = pred[si] << al

    def dc_refine(zz):
        # two's-complement |= appends the next magnitude bit for either
        # sign (the same trick libjpeg documents; the encoder sends
        # bit (coeff >> al) & 1)
        if reader.read_bit():
            zz[0] |= 1 << al

    def ac_first(zz, ac_tbl):
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = _decode_huff(reader, ac_tbl)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.read_bits(r)
                break
            k += r
            if k > se:
                raise ValueError("JPEG: AC run past band end")
            zz[k] = _extend(reader.read_bits(s), s) << al
            k += 1

    def ac_refine(zz, ac_tbl):
        nonlocal eobrun
        p1, m1 = 1 << al, -1 << al
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = _decode_huff(reader, ac_tbl)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += reader.read_bits(r)
                        break
                    val = 0  # ZRL: cross 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError("JPEG: AC refine magnitude must be 1")
                    val = p1 if reader.read_bit() else m1
                # advance: correction bits for nonzero-history positions,
                # counting down r across zero-history ones
                while k <= se:
                    if zz[k] != 0:
                        if reader.read_bit() and (zz[k] & p1) == 0:
                            zz[k] += p1 if zz[k] >= 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    zz[k] = val
                k += 1
        if eobrun > 0:
            # EOB phase: the rest of this block still carries correction
            # bits for its already-significant coefficients
            while k <= se:
                if zz[k] != 0:
                    if reader.read_bit() and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] >= 0 else m1
                k += 1
            eobrun -= 1

    if len(scan) > 1:
        # interleaved — legal only for DC scans (T.81 §G.1.1.1)
        if ss != 0:
            raise ValueError("JPEG: interleaved progressive AC scan")
        mcux = (width + 8 * hmax - 1) // (8 * hmax)
        mcuy = (height + 8 * vmax - 1) // (8 * vmax)
        mcu = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if dri and mcu and mcu % dri == 0:
                    restart()
                for si, (ci, dc_id, _ac_id) in enumerate(scan):
                    _, hs, vs, _ = comps[ci]
                    for byy in range(vs):
                        for bxx in range(hs):
                            zz = coeffs[ci][my * vs + byy, mx * hs + bxx]
                            if ah == 0:
                                dc_first(zz, huff_dc[dc_id], si)
                            else:
                                dc_refine(zz)
                mcu += 1
    else:
        ci, dc_id, ac_id = scan[0]
        _, hs, vs, _ = comps[ci]
        cw = -(-width * hs // hmax)  # component's own dims (ceil)
        ch = -(-height * vs // vmax)
        bw, bh = (cw + 7) // 8, (ch + 7) // 8
        unit = 0
        for by in range(bh):
            for bx in range(bw):
                if dri and unit and unit % dri == 0:
                    restart()
                zz = coeffs[ci][by, bx]
                if ss == 0 and ah == 0:
                    dc_first(zz, huff_dc[dc_id], 0)
                elif ss == 0:
                    dc_refine(zz)
                elif ah == 0:
                    ac_first(zz, huff_ac[ac_id])
                else:
                    ac_refine(zz, huff_ac[ac_id])
                unit += 1

    # advance to the next marker (skip pad bits, stuffed bytes, RSTn)
    p = reader.pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] != 0x00:
            if 0xD0 <= data[p + 1] <= 0xD7:
                p += 2
                continue
            break
        p += 1
    return p


# ---------------------------------------------------------------------------
# Hierarchical (DHP/EXP/SOF5) decoding — T.81 Annex J
# ---------------------------------------------------------------------------


def _next_marker_pos(data: bytes, p: int) -> int:
    """Position of the next marker after an entropy segment starting at
    p — skips stuffed 0xFF00 pairs, fill bytes and RSTn, exactly the
    progressive-scan tail's rule (used by the hierarchical frame walk,
    whose scan decoders return pixels rather than stream positions)."""
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] != 0x00:
            if 0xD0 <= data[p + 1] <= 0xD7:
                p += 2
                continue
            if data[p + 1] == 0xFF:  # fill byte run — resolve at its end
                p += 1
                continue
            break
        p += 1
    return p


def _exp_expand(ref: np.ndarray, eh: int, ev: int) -> np.ndarray:
    """T.81 §J.8.1 reference expansion: double a dimension by placing
    input samples at even positions and the rounded mean of each
    neighbor pair at odd ones, replicating the last sample at the edge
    — out[2i] = in[i]; out[2i+1] = (in[i] + in[i+1] + 1) >> 1;
    out[2W-1] = in[W-1]. Integer-exact, which is what lets the
    hierarchical oracle replay it in closed form."""
    ref = ref.astype(np.int64)
    if eh:
        h, w = ref.shape
        out = np.empty((h, 2 * w), dtype=np.int64)
        out[:, 0::2] = ref
        if w > 1:
            out[:, 1 : 2 * w - 1 : 2] = (ref[:, :-1] + ref[:, 1:] + 1) >> 1
        out[:, 2 * w - 1] = ref[:, w - 1]
        ref = out
    if ev:
        h, w = ref.shape
        out = np.empty((2 * h, w), dtype=np.int64)
        out[0::2, :] = ref
        if h > 1:
            out[1 : 2 * h - 1 : 2, :] = (ref[:-1, :] + ref[1:, :] + 1) >> 1
        out[2 * h - 1, :] = ref[h - 1, :]
        ref = out
    return ref


def _decode_differential_scan(
    data, pos, width, height, comps, scan, quant, huff_dc, huff_ac, dri, ref,
):
    """Decode a DIFFERENTIAL sequential frame's scan (SOF5, T.81 Annex
    J/F.2.1.3.1) and return the refined reference: each 8x8 block codes
    the DCT of the RESIDUAL between the source and the (expanded)
    reference — DC coded directly with NO predictor (differential
    frames fix PRED = 0), AC exactly as sequential — and reconstruction
    adds the residual IDCT (no +128 level shift) onto the reference,
    clamping to the sample range per frame."""
    if ref is None:
        raise ValueError("JPEG: differential frame before any reference frame")
    if ref.shape != (height, width):
        raise ValueError(
            f"JPEG hierarchical: frame dims {(width, height)} do not match "
            f"the reference {ref.shape[::-1]} (missing/extra EXP?)"
        )
    if dri:
        raise NotImplementedError(
            "JPEG hierarchical: restart intervals in differential frames"
        )
    reader = _BitReader(data, pos)
    ci, dc_id, ac_id = scan[0]
    q = quant[comps[ci][3]]
    out = ref.astype(np.float64).copy()
    bw, bh = (width + 7) // 8, (height + 7) // 8
    for by in range(bh):
        for bx in range(bw):
            zz = np.zeros(64, dtype=np.int64)
            size = _decode_huff(reader, huff_dc[dc_id])
            zz[0] = _extend(reader.read_bits(size), size)  # PRED = 0
            k = 1
            while k < 64:
                sym = _decode_huff(reader, huff_ac[ac_id])
                if sym == 0x00:
                    break
                if sym == 0xF0:
                    k += 16
                    continue
                run, ssss = sym >> 4, sym & 0x0F
                k += run
                if k > 63:
                    raise ValueError("JPEG: AC run past block end")
                zz[k] = _extend(reader.read_bits(ssss), ssss)
                k += 1
            block = np.empty(64, dtype=np.int64)
            block[_ZZ_NP] = zz
            res = idct_8x8((block.reshape(8, 8) * q.reshape(8, 8)).astype(np.float64))
            r0, c0 = by * 8, bx * 8
            h8, w8 = min(8, height - r0), min(8, width - c0)
            out[r0 : r0 + h8, c0 : c0 + w8] += res[:h8, :w8]
    return np.clip(np.round(out), 0, 255).astype(np.int64)


def _decode_differential_lossless_scan(
    data, pos, width, height, comps, scan, huff_dc, dri, ref,
):
    """Decode a DIFFERENTIAL LOSSLESS frame's scan (SOF7, T.81 Annex J):
    each sample is a Huffman-coded residual (the DC category/magnitude
    coding, sample-wise) between the frame input and the REFERENCE —
    no spatial predictor (the SOS predictor field is 0 in differential
    lossless frames) — and reconstruction is (ref + diff) mod 2^16,
    clipped to the sample range at EOI like every hierarchical plane."""
    if ref is None:
        raise ValueError("JPEG: differential frame before any reference frame")
    if ref.shape != (height, width):
        raise ValueError(
            f"JPEG hierarchical: frame dims {(width, height)} do not match "
            f"the reference {ref.shape[::-1]} (missing/extra EXP?)"
        )
    if dri:
        raise NotImplementedError(
            "JPEG hierarchical: restart intervals in differential frames"
        )
    reader = _BitReader(data, pos)
    tbl = huff_dc[scan[0][1]]
    out = np.zeros((height, width), dtype=np.int64)
    for r in range(height):
        for c in range(width):
            size = _decode_huff(reader, tbl)
            if size == 16:
                diff = 32768
            elif size == 0:
                diff = 0
            else:
                diff = _extend(reader.read_bits(size), size)
            out[r, c] = (int(ref[r, c]) + diff) & 0xFFFF
    return out


def encode_jpeg_hierarchical(
    blocks_w: int, blocks_h: int, v0, residuals, kind: str = "sof5"
) -> bytes:
    """HIERARCHICAL (Annex J) grayscale fixture: a DHP header declaring
    the full 16·bw x 16·bh frame, an INITIAL half-resolution SOF0 frame
    that is globally constant v0 (so the J.8 expansion — whose averaging
    path the random-image pytest pins — reproduces a constant exactly),
    an EXP(1,1) doubling both dimensions, and one DIFFERENTIAL frame
    whose full-resolution 8x8 blocks each add the constant residuals[b].
    Decoded output is therefore v0 + residuals[b] per block in closed
    form, with every hierarchical structure real: multi-frame walk,
    reference expansion, differential DC-without-predictor, residual
    reconstruction without level shift.

    `kind` selects the differential frame type (round 11 closes all
    six): 'sof5' Huffman sequential (DC-only residual DCTs, exact),
    'sof6' Huffman progressive (a DC scan then an all-EOB AC scan),
    'sof7' Huffman lossless (per-SAMPLE residuals, mod-2^16),
    'sof13'/'sof14'/'sof15' their QM-arithmetic twins with a DAC
    segment. All six decode to the identical closed form.

    v0 may also be a LIST of per-lowres-block constants (pytest surface):
    the expansion then genuinely averages across block boundaries and the
    expected image is the J.8 replay of the blocky reference plus the
    residual grid — the composition the registered constant fixture
    cannot reach."""
    res = [int(r) for r in residuals]
    v0s = (
        [int(v) for v in v0]
        if isinstance(v0, (list, tuple))
        else [int(v0)] * (blocks_w * blocks_h)
    )
    if len(v0s) != blocks_w * blocks_h:
        raise ValueError("v0 list must cover the lowres block grid")
    if len(res) != (2 * blocks_w) * (2 * blocks_h):
        raise ValueError("residuals must cover the full-res 8x8 block grid")
    full_w, full_h = 16 * blocks_w, 16 * blocks_h
    dqt = bytes([0x00]) + bytes(int(FIX_QUANT[ZIGZAG[z]]) for z in range(64))
    dht_dc = bytes([0x00]) + bytes(FIX_DC_BITS) + bytes(FIX_DC_VALS)
    dht_ac = bytes([0x10]) + bytes(FIX_AC_BITS) + bytes(FIX_AC_VALS)
    dc_enc = _build_encode_table(FIX_DC_BITS, FIX_DC_VALS)
    ac_enc = _build_encode_table(FIX_AC_BITS, FIX_AC_VALS)
    dhp = struct.pack(">BHHB", 8, full_h, full_w, 1) + bytes([1, 0x11, 0])
    sof0 = struct.pack(">BHHB", 8, full_h // 2, full_w // 2, 1) + bytes([1, 0x11, 0])
    out = bytearray(
        b"\xff\xd8"
        + _seg(0xDE, dhp)
        + _seg(0xDB, dqt)
        + _seg(0xC4, dht_dc)
        + _seg(0xC4, dht_ac)
        + _seg(0xC0, sof0)
    )
    # initial frame: per-block constants (DPCM across blocks)
    w = _BitWriter()
    pred = 0
    eob_code, eob_len = ac_enc[0x00]
    for v in v0s:
        diff = (v - 128) - pred
        pred = v - 128
        size = _category(diff)
        code, length = dc_enc[size]
        w.write(code, length)
        if size:
            w.write(_mag_bits(diff, size), size)
        w.write(eob_code, eob_len)
    out += _sos_seg([(1, 0x00)], 0, 63, 0, 0) + w.flush()
    # expand the reference to full resolution, then the differential frame
    marker_by_kind = {
        "sof5": 0xC5, "sof6": 0xC6, "sof7": 0xC7,
        "sof13": 0xCD, "sof14": 0xCE, "sof15": 0xCF,
    }
    if kind not in marker_by_kind:
        raise ValueError(f"unknown hierarchical differential kind: {kind}")
    out += _seg(0xDF, bytes([0x11]))
    sof_d = struct.pack(">BHHB", 8, full_h, full_w, 1) + bytes([1, 0x11, 0])
    if kind in ("sof13", "sof14", "sof15"):
        from .jpeg_arith import (
            AC_KX_DEFAULT,
            DC_L_DEFAULT,
            DC_U_DEFAULT,
            FIXED_STATE,
            _enc_ac,
            _enc_dc,
            _ll_arith_entropy,
            _QMEncoder,
        )

        dac = bytes(
            [0x00, (DC_U_DEFAULT << 4) | DC_L_DEFAULT, 0x10, AC_KX_DEFAULT]
        )
        out += _seg(marker_by_kind[kind], sof_d) + _seg(0xCC, dac)
    else:
        out += _seg(marker_by_kind[kind], sof_d)
    if kind == "sof5":
        w = _BitWriter()
        for r in res:  # DC coded directly (PRED = 0), AC all-zero -> EOB
            size = _category(r)
            code, length = dc_enc[size]
            w.write(code, length)
            if size:
                w.write(_mag_bits(r, size), size)
            w.write(eob_code, eob_len)
        out += _sos_seg([(1, 0x00)], 0, 63, 0, 0) + w.flush()
    elif kind == "sof6":
        # progressive differential, two scans: DC (PRED = 0) then all-EOB AC
        w = _BitWriter()
        for r in res:
            size = _category(r)
            code, length = dc_enc[size]
            w.write(code, length)
            if size:
                w.write(_mag_bits(r, size), size)
        out += _sos_seg([(1, 0x00)], 0, 0, 0, 0) + w.flush()
        w = _BitWriter()
        for _ in res:  # AC scan: every block is one EOB0
            w.write(eob_code, eob_len)
        out += _sos_seg([(1, 0x00)], 1, 63, 0, 0) + w.flush()
    elif kind == "sof13":
        enc = _QMEncoder()
        dc_st = bytearray(64)
        ac_st = bytearray(256)
        fixed = bytearray([FIXED_STATE])
        ctx = 0
        zz0 = np.zeros(64, dtype=np.int64)
        for r in res:
            ctx = _enc_dc(enc, dc_st, ctx, r, DC_L_DEFAULT, DC_U_DEFAULT)
            _enc_ac(enc, ac_st, fixed, zz0, AC_KX_DEFAULT)
        out += _sos_seg([(1, 0x00)], 0, 63, 0, 0) + enc.flush()
    elif kind == "sof14":
        enc = _QMEncoder()
        dc_st = bytearray(64)
        ctx = 0
        for r in res:
            ctx = _enc_dc(enc, dc_st, ctx, r, DC_L_DEFAULT, DC_U_DEFAULT)
        out += _sos_seg([(1, 0x00)], 0, 0, 0, 0) + enc.flush()
        enc = _QMEncoder()
        ac_st = bytearray(256)
        fixed = bytearray([FIXED_STATE])
        zz0 = np.zeros(64, dtype=np.int64)
        for _ in res:
            _enc_ac(enc, ac_st, fixed, zz0, AC_KX_DEFAULT)
        out += _sos_seg([(1, 0x00)], 1, 63, 0, 0) + enc.flush()
    else:
        # lossless differential: per-sample residuals vs the expanded
        # reference — constant r within each full-res 8x8 block
        res_grid = np.zeros((full_h, full_w), dtype=np.int64)
        for b, r in enumerate(res):
            by, bx = divmod(b, 2 * blocks_w)
            res_grid[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = r
        if kind == "sof7":
            w = _BitWriter()
            for rr in range(full_h):
                for cc in range(full_w):
                    d = int(res_grid[rr, cc])
                    size = _category(d)
                    code, length = dc_enc[size]
                    w.write(code, length)
                    if size:
                        w.write(_mag_bits(d, size), size)
            out += _sos_seg([(1, 0x00)], 0, 0, 0, 0) + w.flush()
        else:  # sof15: residuals through the QM lossless model (ref = 0
            # plane makes coded diffs equal the residuals; conditioning
            # replays the decoder's Da/Db chain exactly)
            vals = res_grid & 0xFFFF
            zref = np.zeros((full_h, full_w), dtype=np.int64)
            out += _sos_seg([(1, 0x00)], 0, 0, 0, 0)
            out += _ll_arith_entropy(
                vals, full_w, full_h, None, 0, zref, DC_L_DEFAULT, DC_U_DEFAULT
            )
    return bytes(out + b"\xff\xd9")


# ---------------------------------------------------------------------------
# Lossless (SOF3) decoding — T.81 Annex H (predictive DPCM, Huffman)
# ---------------------------------------------------------------------------

#: T.81 Table H.1 predictor selections (a=left, b=above, c=above-left)
_LL_PREDICTORS = {
    1: lambda a, b, c: a,
    2: lambda a, b, c: b,
    3: lambda a, b, c: c,
    4: lambda a, b, c: a + b - c,
    5: lambda a, b, c: a + ((b - c) >> 1),
    6: lambda a, b, c: b + ((a - c) >> 1),
    7: lambda a, b, c: (a + b) >> 1,
}


def _decode_lossless_scan(
    data, pos, width, height, comps, scan, huff_dc, dri, predictor, pt,
    components, precision=8,
):
    """Decode a LOSSLESS (SOF3) scan — T.81 Annex H: each sample is a
    Huffman-coded DPCM residual (the DC category/magnitude coding reused
    sample-wise, plus the SSSS=16 no-bits escape for 32768) against one
    of the seven Table-H.1 predictors; reconstruction is modulo 2^16, so
    a conforming encoder/decoder pair is bit-exact by construction. The
    first line (and the first line of every restart interval) falls back
    to the left-neighbor predictor, its first sample to the midpoint
    2^(P-Pt-1) (§H.1.1); first column of later lines predicts from
    above. Single-component 8-bit scans with line-aligned restarts —
    the shape our fixtures and DICOM-style grayscale archives use;
    anything else raises loudly."""
    if len(scan) != 1 or len(comps) != 1:
        raise NotImplementedError("JPEG lossless: single-component scans only")
    if dri and dri % width != 0:
        raise NotImplementedError(
            "JPEG lossless: restart interval must be a whole number of lines"
        )
    if predictor not in _LL_PREDICTORS:
        raise ValueError(f"JPEG lossless: bad predictor {predictor}")
    pred_fn = _LL_PREDICTORS[predictor]
    reader = _BitReader(data, pos)
    tbl = huff_dc[scan[0][1]]
    out = np.zeros((height, width), dtype=np.int64)
    default = 1 << (precision - pt - 1)
    seg_row = 0  # first row of the current restart segment
    n = 0
    for r in range(height):
        if dri and n and n % dri == 0:
            # byte-aligned RSTn between intervals, then prediction restarts
            reader.align()
            pp = reader.pos
            # bounds-guarded (ADVICE r10 #4): a stream truncated mid-restart
            # must raise the parser's uniform ValueError, not IndexError
            while pp + 1 < len(data) and data[pp] == 0xFF and data[pp + 1] == 0xFF:
                pp += 1
            if pp + 1 >= len(data):
                raise ValueError("JPEG: truncated stream at restart marker")
            if data[pp] == 0xFF and 0xD0 <= data[pp + 1] <= 0xD7:
                reader.pos = pp + 2
            seg_row = r
        for c in range(width):
            size = _decode_huff(reader, tbl)
            if size == 16:  # SSSS=16: diff is 32768, no magnitude bits
                diff = 32768
            elif size == 0:
                diff = 0
            else:
                diff = _extend(reader.read_bits(size), size)
            if r == seg_row:
                pred = default if c == 0 else int(out[r, c - 1])
            elif c == 0:
                pred = int(out[r - 1, c])
            else:
                pred = pred_fn(
                    int(out[r, c - 1]), int(out[r - 1, c]), int(out[r - 1, c - 1])
                )
            out[r, c] = (pred + diff) & 0xFFFF
            n += 1
    dtype = np.uint8 if precision <= 8 else np.uint16
    plane = ((out & 0xFFFF) << pt).astype(dtype)
    if components:
        return width, height, 1, [plane]
    return width, height, 1, plane.tobytes()


def encode_jpeg_lossless(
    width: int, height: int, pix, predictor: int = 1, restart_interval: int = 0,
    precision: int = 8,
) -> bytes:
    """LOSSLESS (SOF3) grayscale encoder over arbitrary 8-bit pixels
    (row-major iterable) — unlike every DCT fixture encoder this one is
    exact for ANY image by definition of the mode, which is what lets
    the registered query sweep all 7 predictors per document against
    one closed-form oracle. Restart intervals must cover whole lines
    (the decoder's documented contract); diffs wrap to signed 16-bit
    exactly as §H.1.2.1's mod-2^16 reconstruction expects."""
    if predictor not in _LL_PREDICTORS:
        raise ValueError(f"JPEG lossless: bad predictor {predictor}")
    if restart_interval and restart_interval % width != 0:
        raise ValueError("JPEG lossless: restart interval must cover whole lines")
    if not 2 <= precision <= 16:
        raise ValueError(f"JPEG lossless: bad precision {precision}")
    pred_fn = _LL_PREDICTORS[predictor]
    vals = np.asarray(list(pix), dtype=np.int64).reshape(height, width)
    sof = struct.pack(">BHHB", precision, height, width, 1) + bytes([1, 0x11, 0])
    # P > 8 diffs reach SSSS 16; the 8-bit fixture table stops at 11
    bits, vv = (LL16_DC_BITS, LL16_DC_VALS) if precision > 8 else (FIX_DC_BITS, FIX_DC_VALS)
    dht_dc = bytes([0x00]) + bytes(bits) + bytes(vv)
    dc_enc = _build_encode_table(bits, vv)
    dri_seg = (
        _seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    )
    out = bytearray(b"\xff\xd8" + _seg(0xC3, sof) + _seg(0xC4, dht_dc) + dri_seg)
    out += _sos_seg([(1, 0x00)], predictor, 0, 0, 0)
    w = _BitWriter()
    default = 1 << (precision - 1)
    seg_row = 0
    n = 0
    rst = 0
    for r in range(height):
        if restart_interval and n and n % restart_interval == 0:
            out += w.flush()
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            w = _BitWriter()
            seg_row = r
        for c in range(width):
            if r == seg_row:
                pred = default if c == 0 else int(vals[r, c - 1])
            elif c == 0:
                pred = int(vals[r - 1, c])
            else:
                pred = pred_fn(
                    int(vals[r, c - 1]), int(vals[r - 1, c]), int(vals[r - 1, c - 1])
                )
            diff = ((int(vals[r, c]) - pred + 0x8000) & 0xFFFF) - 0x8000
            if diff == -32768:
                diff = 32768  # the SSSS=16 escape codes +32768 (≡ mod 2^16)
            size = _category(diff)
            code, length = dc_enc[size]
            w.write(code, length)
            if size and size != 16:  # SSSS=16 carries no magnitude bits
                w.write(_mag_bits(diff, size), size)
            n += 1
    out += w.flush()
    return bytes(out + b"\xff\xd9")


def _reconstruct_progressive(width, height, comps, coeffs, quant, components,
                             precision=8):
    """One dequant + IDCT pass over the accumulated coefficient store
    (all scans applied), vectorized per component: de-zigzag by fancy
    indexing, broadcast dequant, batched matmul IDCT (the same
    _B @ block @ _B.T contraction as the baseline path)."""
    planes = []
    for (_cid, hs, vs, qid), cf in zip(comps, coeffs):
        q = quant[qid].astype(np.float64)
        gh, gw, _ = cf.shape
        raster = np.zeros((gh, gw, 64), dtype=np.float64)
        raster[..., _ZZ_NP] = cf
        raster *= q[None, None, :]
        blocks = raster.reshape(gh, gw, 8, 8)
        px = np.matmul(np.matmul(_B, blocks), _B.T) + float(1 << (precision - 1))
        planes.append(px.transpose(0, 2, 1, 3).reshape(gh * 8, gw * 8))
    samps = [(hs, vs) for _, hs, vs, _ in comps]
    return _assemble_output(planes, samps, width, height, components, precision)


# ---------------------------------------------------------------------------
# Fixture encoder
# ---------------------------------------------------------------------------


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


# 12-bit DC table: SSSS 0..12 (a 12-bit DPCM diff spans +-4095), 13
# codes of length 5. The AC table is shared with the 8-bit fixtures —
# constant blocks emit only EOB.
FIX12_DC_BITS = [0, 0, 0, 0, 13, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
FIX12_DC_VALS = list(range(13))
# AC steps > 255 force the Pq=1 16-bit DQT wire format — the quant-table
# format change that WAS the documented 12-bit boundary. ACs are all
# zero in the fixture, so the large steps never touch pixel values.
FIX12_QUANT = np.array([8] + [516] * 63, dtype=np.int32)


def _fixture_headers(width: int, height: int, restart_interval: int = 0,
                     precision: int = 8) -> bytes:
    if precision == 8:
        dqt = bytes([0x00]) + bytes(int(FIX_QUANT[ZIGZAG[z]]) for z in range(64))
        sof_marker = 0xC0
        dht_dc = bytes([0x00]) + bytes(FIX_DC_BITS) + bytes(FIX_DC_VALS)
    else:  # 12-bit: Pq=1 16-bit quant entries, SOF1 extended sequential
        dqt = bytes([0x10]) + b"".join(
            struct.pack(">H", int(FIX12_QUANT[ZIGZAG[z]])) for z in range(64)
        )
        sof_marker = 0xC1
        dht_dc = bytes([0x00]) + bytes(FIX12_DC_BITS) + bytes(FIX12_DC_VALS)
    sof = struct.pack(">BHHB", precision, height, width, 1) + bytes([1, 0x11, 0])
    dht_ac = bytes([0x10]) + bytes(FIX_AC_BITS) + bytes(FIX_AC_VALS)
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    dri = _seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    return (
        b"\xff\xd8"
        + _seg(0xDB, dqt)
        + _seg(sof_marker, sof)
        + dri
        + _seg(0xC4, dht_dc)
        + _seg(0xC4, dht_ac)
        + _seg(0xDA, sos)
    )


def encode_jpeg_blocks(
    blocks_w: int, blocks_h: int, values, restart_interval: int = 0,
    precision: int = 8,
) -> bytes:
    """Grayscale baseline JPEG of (blocks_w*8) x (blocks_h*8) pixels where
    block i (row-major) is the CONSTANT value values[i] in 0..255 — the
    exact-roundtrip fixture (module docstring). Real DPCM + Huffman +
    stuffing; every block ends with a true EOB symbol. With
    `restart_interval` > 0 a DRI segment is declared and RSTn markers are
    emitted (byte-aligned, cycling D0..D7) every N MCUs with the DC
    predictor reset — the resync path a parallel/robust decoder relies
    on (pinned by the restart-marker pytest)."""
    if precision == 8:
        dc_enc = _build_encode_table(FIX_DC_BITS, FIX_DC_VALS)
    else:  # 12-bit samples: DPCM diffs reach category 12
        dc_enc = _build_encode_table(FIX12_DC_BITS, FIX12_DC_VALS)
    ac_enc = _build_encode_table(FIX_AC_BITS, FIX_AC_VALS)
    level = 1 << (precision - 1)
    w = _BitWriter()
    pred = 0
    for i, v in enumerate(values):
        if restart_interval and i and i % restart_interval == 0:
            w.emit_marker(0xD0 + ((i // restart_interval - 1) % 8))
            pred = 0  # predictors reset at every restart (§F.2.1.3.1)
        dc = int(v) - level  # quantized DC: 8*(v-level) / q00=8
        diff = dc - pred
        pred = dc
        size = _category(diff)
        code, length = dc_enc[size]
        w.write(code, length)
        w.write(_mag_bits(diff, size), size)
        code, length = ac_enc[0x00]  # EOB
        w.write(code, length)
    return (
        _fixture_headers(blocks_w * 8, blocks_h * 8, restart_interval, precision)
        + w.flush()
        + b"\xff\xd9"
    )


# progressive fixture AC table: EOBn (r<<4 | 0, r 0..14) for EOB-run
# batching, ZRL (0xF0), and (run 0..15, size 1..4) symbols — 80 symbols,
# canonical 32 at length 6 + 48 at length 7 (Kraft 32/64 + 48/128 < 1)
FIX_AC_PROG_VALS = [(r << 4) | s for r in range(16) for s in range(5)]
FIX_AC_PROG_BITS = [0, 0, 0, 0, 0, 32, 48, 0, 0, 0, 0, 0, 0, 0, 0, 0]


def _sos_seg(comp_specs, ss: int, se: int, ah: int, al: int) -> bytes:
    body = (
        bytes([len(comp_specs)])
        + b"".join(bytes([cid, tbl]) for cid, tbl in comp_specs)
        + bytes([ss, se, (ah << 4) | al])
    )
    return _seg(0xDA, body)


def _write_eobrun(w: "_BitWriter", ac_enc, n: int) -> None:
    """Emit one EOBn symbol covering an n-block end-of-band run
    (n in 1..32767): r = floor(log2 n), then r extra bits of n - 2^r."""
    assert 1 <= n < 32768, n
    r = n.bit_length() - 1
    code, length = ac_enc[r << 4]
    w.write(code, length)
    if r:
        w.write(n - (1 << r), r)


def encode_jpeg_progressive(blocks_w: int, blocks_h: int, values,
                            precision: int = 8) -> bytes:
    """PROGRESSIVE (SOF2) grayscale fixture with the same exactness
    construction as encode_jpeg_blocks — block i is the constant
    values[i] — rendered as a REAL three-scan progressive stream:

      scan 1  DC first        (Ss=0 Se=0  Ah=0 Al=1): DPCM of dc >> 1
      scan 2  DC refinement   (Ss=0 Se=0  Ah=1 Al=0): one raw bit/block
      scan 3  AC first        (Ss=1 Se=63 Ah=0 Al=0): all-zero band
              encoded as one EOB-run over every block (EOBn batching)

    Every progressive structure the constant fixture can reach is real:
    per-scan SOS headers with spectral selection + successive
    approximation, the split DC (coarse bits then refinement bits whose
    two's-complement reassembly must be exact for BOTH DPCM signs), and
    EOBn run batching. Nonzero-AC first/refine scans (incl. ZRL crossing
    and correction bits) are pinned by the sparse-coefficient pytest via
    _encode_progressive_coeff_blocks. Decoded output is bit-identical to
    the baseline encoding of the same values — which is what lets
    mm_decode_jpeg_progressive share the closed-form oracle algebra."""
    if precision == 8:
        dqt = bytes([0x00]) + bytes(int(FIX_QUANT[ZIGZAG[z]]) for z in range(64))
        dht_dc = bytes([0x00]) + bytes(FIX_DC_BITS) + bytes(FIX_DC_VALS)
        dc_enc = _build_encode_table(FIX_DC_BITS, FIX_DC_VALS)
    else:  # 12-bit progressive: 16-bit DQT + the category-12 DC table
        dqt = bytes([0x10]) + b"".join(
            struct.pack(">H", int(FIX12_QUANT[ZIGZAG[z]])) for z in range(64)
        )
        dht_dc = bytes([0x00]) + bytes(FIX12_DC_BITS) + bytes(FIX12_DC_VALS)
        dc_enc = _build_encode_table(FIX12_DC_BITS, FIX12_DC_VALS)
    sof = struct.pack(">BHHB", precision, blocks_h * 8, blocks_w * 8, 1) + bytes(
        [1, 0x11, 0]
    )
    dht_ac = bytes([0x10]) + bytes(FIX_AC_PROG_BITS) + bytes(FIX_AC_PROG_VALS)
    ac_enc = _build_encode_table(FIX_AC_PROG_BITS, FIX_AC_PROG_VALS)
    level = 1 << (precision - 1)
    out = bytearray(
        b"\xff\xd8" + _seg(0xDB, dqt) + _seg(0xC2, sof) + _seg(0xC4, dht_dc) + _seg(0xC4, dht_ac)
    )
    # scan 1: DC first, Al=1 (arithmetic shift matches the decoder's <<)
    w = _BitWriter()
    pred = 0
    for v in values:
        t = (int(v) - level) >> 1
        diff = t - pred
        pred = t
        size = _category(diff)
        code, length = dc_enc[size]
        w.write(code, length)
        w.write(_mag_bits(diff, size), size)
    out += _sos_seg([(1, 0x00)], 0, 0, 0, 1) + w.flush()
    # scan 2: DC refinement, one raw bit per block (bit 0 of dc)
    w = _BitWriter()
    for v in values:
        w.write((int(v) - level) & 1, 1)
    out += _sos_seg([(1, 0x00)], 0, 0, 1, 0) + w.flush()
    # scan 3: AC band 1..63, all zero -> a single EOB-run over all blocks
    w = _BitWriter()
    _write_eobrun(w, ac_enc, len(list(values)))
    out += _sos_seg([(1, 0x00)], 1, 63, 0, 0) + w.flush()
    return bytes(out + b"\xff\xd9")


def encode_jpeg_progressive_color(mcus_w: int, mcus_h: int, triplets) -> bytes:
    """PROGRESSIVE + 4:2:0 fixture: constant (Y, Cb, Cr) per 16x16
    macroblock (encode_jpeg_color's exactness construction) as a
    five-scan SOF2 stream — DC first INTERLEAVED over all three
    components (the ns>1 MCU path, Y,Y,Y,Y,Cb,Cr per MCU with
    per-component DPCM predictors, Al=1), DC refine interleaved, then
    one all-zero AC-first scan PER COMPONENT (progressive AC scans are
    always non-interleaved, iterated in the component's OWN block grid —
    ceil(comp_dim/8), not the MCU grid) batched as single EOB-runs."""
    width, height = mcus_w * 16, mcus_h * 16
    dqt = bytes([0x00]) + bytes(int(FIX_QUANT[ZIGZAG[z]]) for z in range(64))
    sof = struct.pack(">BHHB", 8, height, width, 3) + bytes(
        [1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]
    )
    dht_dc = bytes([0x00]) + bytes(FIX_DC_BITS) + bytes(FIX_DC_VALS)
    dht_ac = bytes([0x10]) + bytes(FIX_AC_PROG_BITS) + bytes(FIX_AC_PROG_VALS)
    dc_enc = _build_encode_table(FIX_DC_BITS, FIX_DC_VALS)
    ac_enc = _build_encode_table(FIX_AC_PROG_BITS, FIX_AC_PROG_VALS)
    out = bytearray(
        b"\xff\xd8" + _seg(0xDB, dqt) + _seg(0xC2, sof) + _seg(0xC4, dht_dc) + _seg(0xC4, dht_ac)
    )
    specs = [(1, 0x00), (2, 0x00), (3, 0x00)]

    def dc_scan(al: int, refine: bool) -> "_BitWriter":
        w = _BitWriter()
        pred = [0, 0, 0]
        for y, cb, cr in triplets:  # row-major MCUs
            for ci, (v, nblocks) in enumerate(((y, 4), (cb, 1), (cr, 1))):
                for _ in range(nblocks):
                    dc = int(v) - 128
                    if refine:
                        w.write((dc >> al) & 1, 1)
                        continue
                    t = dc >> al
                    diff = t - pred[ci]
                    pred[ci] = t
                    size = _category(diff)
                    code, length = dc_enc[size]
                    w.write(code, length)
                    w.write(_mag_bits(diff, size), size)
        return w

    out += _sos_seg(specs, 0, 0, 0, 1) + dc_scan(1, refine=False).flush()
    out += _sos_seg(specs, 0, 0, 1, 0) + dc_scan(0, refine=True).flush()
    # per-component AC scans over the component's own block grid
    comp_blocks = [(2 * mcus_w) * (2 * mcus_h), mcus_w * mcus_h, mcus_w * mcus_h]
    for cid, nblocks in zip((1, 2, 3), comp_blocks):
        w = _BitWriter()
        _write_eobrun(w, ac_enc, nblocks)
        out += _sos_seg([(cid, 0x00)], 1, 63, 0, 0) + w.flush()
    return bytes(out + b"\xff\xd9")


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


def _encode_progressive_coeff_blocks(
    blocks: "list[np.ndarray]", blocks_w: int, blocks_h: int
) -> bytes:
    """Test-only PROGRESSIVE encoder over QUANTIZED coefficient blocks
    (raster 8x8 int arrays): four-scan script exercising every
    progressive decode path the constant fixtures cannot —

      1. DC first  (Al=1)      3. AC first   (Ss=1..63, Al=1)
      2. DC refine (Al=0)      4. AC refine  (Ss=1..63, Ah=1, Al=0)

    The AC-refine bitstream is generated in exact decoder-consumption
    order (§G.1.2.3): per newly-significant coefficient, ZRLs cross 16
    zero-history positions each (with the crossed nonzero-history
    positions' correction bits embedded in position order), then the
    (r, 1) symbol + sign bit + the remaining crossed correction bits;
    blocks with no newly-significant coefficients batch into EOB-runs
    whose covered correction bits follow the EOBn symbol. Constraints:
    point-transformed categories <= 4 (|coeff| <= 31), AC magnitudes
    either |c| == 1 (newly significant at Al=0) or even histories…
    any |c| <= 31 works: history = sign(c)*(|c|>>1)<<1, correction
    bit = |c| & 1."""
    dqt = bytes([0x00]) + bytes(int(FIX_QUANT[ZIGZAG[z]]) for z in range(64))
    sof = struct.pack(">BHHB", 8, blocks_h * 8, blocks_w * 8, 1) + bytes([1, 0x11, 0])
    dht_dc = bytes([0x00]) + bytes(FIX_DC_BITS) + bytes(FIX_DC_VALS)
    dht_ac = bytes([0x10]) + bytes(FIX_AC_PROG_BITS) + bytes(FIX_AC_PROG_VALS)
    dc_enc = _build_encode_table(FIX_DC_BITS, FIX_DC_VALS)
    ac_enc = _build_encode_table(FIX_AC_PROG_BITS, FIX_AC_PROG_VALS)
    zzs = [[int(b.reshape(64)[ZIGZAG[z]]) for z in range(64)] for b in blocks]
    out = bytearray(
        b"\xff\xd8" + _seg(0xDB, dqt) + _seg(0xC2, sof) + _seg(0xC4, dht_dc) + _seg(0xC4, dht_ac)
    )

    def pt(v: int, al: int) -> int:  # AC point transform: truncate toward 0
        return -((-v) >> al) if v < 0 else v >> al

    # scan 1: DC first (Al=1, arithmetic shift per spec)
    w = _BitWriter()
    pred = 0
    for zz in zzs:
        t = zz[0] >> 1
        diff = t - pred
        pred = t
        size = _category(diff)
        code, length = dc_enc[size]
        w.write(code, length)
        w.write(_mag_bits(diff, size), size)
    out += _sos_seg([(1, 0x00)], 0, 0, 0, 1) + w.flush()
    # scan 2: DC refine — raw bit 0 of each DC
    w = _BitWriter()
    for zz in zzs:
        w.write(zz[0] & 1, 1)
    out += _sos_seg([(1, 0x00)], 0, 0, 1, 0) + w.flush()
    # scan 3: AC first at Al=1 over t[k] = pt(c[k], 1), per-block EOB0
    w = _BitWriter()
    for zz in zzs:
        k = 1
        while k <= 63:
            run = 0
            j = k
            while j <= 63 and pt(zz[j], 1) == 0:
                run += 1
                j += 1
            if j > 63:
                code, length = ac_enc[0x00]  # EOB (run of 1)
                w.write(code, length)
                break
            while run >= 16:
                code, length = ac_enc[0xF0]
                w.write(code, length)
                run -= 16
            t = pt(zz[j], 1)
            size = _category(t)
            code, length = ac_enc[(run << 4) | size]
            w.write(code, length)
            w.write(_mag_bits(t, size), size)
            k = j + 1
    out += _sos_seg([(1, 0x00)], 1, 63, 0, 1) + w.flush()
    # scan 4: AC refine at Al=0 (history = t << 1; corr bit = |c| & 1)
    w = _BitWriter()
    pending_eob = 0
    pending_bits: list[int] = []

    def flush_eob() -> None:
        nonlocal pending_eob, pending_bits
        if pending_eob:
            _write_eobrun(w, ac_enc, pending_eob)
            for bit in pending_bits:
                w.write(bit, 1)
            pending_eob = 0
            pending_bits = []

    for zz in zzs:
        hist = [pt(zz[k], 1) << 1 for k in range(64)]
        newsig = [k for k in range(1, 64) if zz[k] != 0 and hist[k] == 0]
        if not newsig:
            pending_eob += 1
            pending_bits += [abs(zz[k]) & 1 for k in range(1, 64) if hist[k] != 0]
            if pending_eob == 32767:
                flush_eob()
            continue
        flush_eob()
        cursor = 1
        for k in newsig:
            # positions cursor..k-1: zero-history slots + corr bits
            zeros = sum(1 for p in range(cursor, k) if hist[p] == 0)
            while zeros > 15:
                code, length = ac_enc[0xF0]
                w.write(code, length)
                crossed = 0
                while crossed < 16:  # cross 16 zero-history positions
                    if hist[cursor] != 0:
                        w.write(abs(zz[cursor]) & 1, 1)
                    else:
                        crossed += 1
                    cursor += 1
                zeros -= 16
            code, length = ac_enc[(zeros << 4) | 1]
            w.write(code, length)
            w.write(1 if zz[k] > 0 else 0, 1)  # sign bit of the new +-1
            for p in range(cursor, k):
                if hist[p] != 0:
                    w.write(abs(zz[p]) & 1, 1)
            cursor = k + 1
        # tail of this block rides the next EOB run's correction phase
        pending_eob = 1
        pending_bits = [abs(zz[p]) & 1 for p in range(cursor, 64) if hist[p] != 0]
    flush_eob()
    out += _sos_seg([(1, 0x00)], 1, 63, 1, 0) + w.flush()
    return bytes(out + b"\xff\xd9")


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
