"""Pure-stdlib baseline TIFF codec (8-bit RGB, strips; Compression 1 =
none and 5 = LZW; Predictor 1 = none and 2 = horizontal differencing;
both byte orders), written against the public TIFF 6.0 specification
(Adobe, 1992) — the fourth still-image container family in the decode
suite and the SECOND LZW dialect: TIFF's LZW packs codes MSB-FIRST with
the EarlyChange rule (the code width bumps one code EARLIER than the
table-size power of two), where GIF's LZW (operators/gif.py) is
LSB-first without early change — a decoder that reuses the GIF bit
reader verbatim desynchronizes within the first dozen codes, which is
exactly what the round-trip pytests pin.

Round 11 adds Compression 32773 = PackBits (TIFF 6.0 §9 / the Apple RLE:
literal runs for n in 0..127 emit the next n+1 bytes, replicate runs for
n in 129..255 repeat the next byte 257-n times, n = 128 is a no-op),
packed per ROW within each strip as the spec recommends — the third
compression mode in the sweep.

Scope hooks (documented NotImplementedError, same contract as the JPEG
hierarchical modes): tiled TIFFs, palette/grayscale photometric modes,
and >8-bit samples.

Reference parity: the reference repo's source surface is
format-conversion DTOs (see SURVEY.md S3/D3); image payload decode is an
extension family this repo adds for multimodal pipelines.
"""

from __future__ import annotations

import struct

_CLEAR, _EOI = 256, 257


def _lzw_decode(data: bytes) -> bytes:
    """TIFF-variant LZW: MSB-first bit order, initial 9-bit codes,
    EarlyChange (width grows when the NEXT code would not fit, i.e. at
    table sizes 511/1023/2047, one earlier than GIF)."""
    out = bytearray()
    table: list[bytes] = []

    def reset() -> None:
        table.clear()
        table.extend(bytes([i]) for i in range(256))
        table.extend((b"", b""))  # 256 clear, 257 EOI placeholders

    reset()
    width = 9
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == _CLEAR:
                reset()
                width = 9
                prev = None
                continue
            if code == _EOI:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt LZW stream: code beyond table")
            out += entry
            prev = entry
            # EarlyChange: the writer bumps when ITS next-free code hits
            # 2^w - 1, but the reader's table trails the writer by one
            # entry (the entry for code k is completed when code k+1
            # arrives), so the reader bumps at 510/1022/2046 — one entry
            # earlier than its own table-size power of two
            if len(table) >= (1 << width) - 2 and width < 12:
                width += 1
    return bytes(out)


def _lzw_encode(raw: bytes) -> bytes:
    """Matching TIFF-variant LZW encoder (fixture builder + round-trip
    tests): emits CLEAR, string codes with EarlyChange width bumps, a
    CLEAR on table-full, and EOI."""
    out = bytearray()
    acc = nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    width = 9
    put(_CLEAR, width)
    s = b""
    for b in raw:
        c = s + bytes([b])
        if c in table:
            s = c
            continue
        put(table[s], width)
        table[c] = nxt
        nxt += 1
        if nxt == (1 << width) - 1 and width < 12:
            width += 1
        elif nxt == 4094:  # table full: reset (keeps the stream short)
            put(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            width = 9
        s = bytes([b])
    if s:
        put(table[s], width)
    # the loop bumps width the moment nxt hits 2^w - 1, so the EOI's
    # width is already correct here
    put(_EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes) -> bytes:
    """PackBits expansion (TIFF 6.0 §9): agnostic to row boundaries —
    the encoder packs per row, the decoder just expands runs."""
    out = bytearray()
    i = 0
    n_data = len(data)
    while i < n_data:
        n = data[i]
        i += 1
        if n < 128:  # literal run: next n+1 bytes
            if i + n + 1 > n_data:
                raise ValueError("PackBits: truncated literal run")
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:  # replicate run: next byte 257-n times
            if i >= n_data:
                raise ValueError("PackBits: truncated replicate run")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op per spec
    return bytes(out)


def _packbits_encode_row(row: bytes) -> bytes:
    """Greedy PackBits for one row: replicate runs of >= 3 (or >= 2 when
    not breaking a literal), literals otherwise — the standard Apple
    packer shape, split at 128-byte run limits."""
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        # measure the replicate run at i
        j = i + 1
        while j < n and j - i < 128 and row[j] == row[i]:
            j += 1
        run = j - i
        if run >= 2:
            out.append(257 - run)
            out.append(row[i])
            i = j
            continue
        # literal run: until the next >= 3 replicate or 128 bytes
        lit_start = i
        while i < n and i - lit_start < 128:
            if i + 2 < n and row[i] == row[i + 1] == row[i + 2]:
                break
            i += 1
        out.append(i - lit_start - 1)
        out += row[lit_start:i]
    return bytes(out)


def _packbits_encode(seg: bytes, row_bytes: int) -> bytes:
    """Pack a strip per ROW (TIFF 6.0 §9 recommendation: rows never share
    a run, so a decoder that processes rows independently stays valid)."""
    return b"".join(
        _packbits_encode_row(seg[r : r + row_bytes])
        for r in range(0, len(seg), row_bytes)
    )


def decode_tiff(data: bytes) -> tuple[int, int, int, bytes]:
    """Baseline-TIFF decode to (width, height, 3, interleaved RGB)."""
    if data[:4] == b"II*\x00":
        e = "<"
    elif data[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF stream")
    (ifd_off,) = struct.unpack(e + "I", data[4:8])
    (n_entries,) = struct.unpack(e + "H", data[ifd_off : ifd_off + 2])
    tags: dict[int, list[int]] = {}
    type_size = {1: 1, 3: 2, 4: 4}
    type_fmt = {1: "B", 3: "H", 4: "I"}
    for i in range(n_entries):
        ent = data[ifd_off + 2 + 12 * i : ifd_off + 14 + 12 * i]
        tag, typ, cnt = struct.unpack(e + "HHI", ent[:8])
        if typ not in type_size:
            continue
        total = type_size[typ] * cnt
        payload = ent[8 : 8 + total] if total <= 4 else data[
            struct.unpack(e + "I", ent[8:12])[0] :
        ][:total]
        tags[tag] = list(struct.unpack(e + str(cnt) + type_fmt[typ], payload))
    if 322 in tags or 323 in tags or 324 in tags:
        raise NotImplementedError("tiled TIFF not supported")
    w, h = tags[256][0], tags[257][0]
    comp = tags.get(259, [1])[0]
    photo = tags.get(262, [2])[0]
    spp = tags.get(277, [1])[0]
    bps = tags.get(258, [1] * spp)
    pred = tags.get(317, [1])[0]
    rps = tags.get(278, [h])[0]
    if photo != 2 or spp != 3 or any(b != 8 for b in bps):
        raise NotImplementedError("only 8-bit RGB TIFF decodable here")
    if comp not in (1, 5, 32773):
        raise NotImplementedError(
            "only uncompressed, LZW, or PackBits TIFF supported"
        )
    if pred not in (1, 2):
        raise NotImplementedError("unsupported TIFF predictor")
    if tags.get(284, [1])[0] != 1:
        raise NotImplementedError("planar TIFF not supported")
    offs, cnts = tags[273], tags[279]
    out = bytearray()
    for off, cnt in zip(offs, cnts):
        strip = data[off : off + cnt]
        if comp == 5:
            out += _lzw_decode(strip)
        elif comp == 32773:
            out += _packbits_decode(strip)
        else:
            out += strip
    if len(out) != w * h * 3:
        raise ValueError("TIFF payload size mismatch")
    if pred == 2:  # undo horizontal differencing, per channel
        for r in range(h):
            base = r * w * 3
            for x in range(3, w * 3):
                out[base + x] = (out[base + x] + out[base + x - 3]) & 0xFF
    return w, h, 3, bytes(out)


def encode_tiff(
    w: int,
    h: int,
    pixels: bytes,
    compression: int = 5,
    predictor: int = 2,
    big_endian: bool = False,
    rows_per_strip: int = 4,
    exif: list[tuple[int, int, int]] | None = None,
) -> bytes:
    """Baseline-TIFF encoder: 8-bit RGB, strip-organized, optional LZW +
    horizontal differencing, either byte order. `exif` adds a real EXIF
    sub-IFD (tag 34665 LONG pointer) of (tag, type, value) entries with
    inline SHORT/LONG values — the layout every camera writes."""
    e = ">" if big_endian else "<"
    raw = bytearray(pixels)
    if predictor == 2:
        for r in range(h):
            base = r * w * 3
            for x in range(w * 3 - 1, 2, -1):
                raw[base + x] = (raw[base + x] - raw[base + x - 3]) & 0xFF
    strips = []
    for r0 in range(0, h, rows_per_strip):
        seg = bytes(raw[r0 * w * 3 : min(r0 + rows_per_strip, h) * w * 3])
        if compression == 5:
            strips.append(_lzw_encode(seg))
        elif compression == 32773:
            strips.append(_packbits_encode(seg, w * 3))
        else:
            strips.append(seg)
    n_strips = len(strips)

    entries: list[tuple[int, int, int, bytes | int]] = []
    extra = bytearray()  # out-of-line values, appended after the IFD
    header = 8
    n_main = 10 + (1 if exif else 0)
    ifd_size = 2 + 12 * n_main + 4
    sub_size = (2 + 12 * len(exif) + 4) if exif else 0

    def defer(fmt: str, values: list[int]) -> int:
        pos = header + ifd_size + len(extra)
        extra.extend(struct.pack(e + str(len(values)) + fmt, *values))
        return pos

    bps_off = defer("H", [8, 8, 8])
    # strip offset/count arrays live out-of-line only when there are
    # multiple strips (4+4 bytes per strip); a single strip inlines both;
    # the EXIF sub-IFD (if any) sits after the out-of-line block
    sub_off = header + ifd_size + len(extra) + (8 * n_strips if n_strips > 1 else 0)
    strip_data_start = sub_off + sub_size
    offsets = []
    pos = strip_data_start
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    off_off = defer("I", offsets) if n_strips > 1 else offsets[0]
    cnt_off = defer("I", [len(s) for s in strips]) if n_strips > 1 else len(
        strips[0]
    )

    def entry(tag: int, typ: int, cnt: int, val: int) -> bytes:
        if typ == 3 and cnt == 1:
            # SHORT values are left-justified in the 4-byte field (TIFF
            # 6.0 §2) — same layout in both byte orders
            return struct.pack(e + "HHI", tag, typ, cnt) + struct.pack(
                e + "H", val
            ) + b"\x00\x00"
        return struct.pack(e + "HHI" + {3: "H", 4: "I"}[typ], tag, typ, cnt, val)

    ents = [
        entry(256, 4, 1, w),
        entry(257, 4, 1, h),
        struct.pack(e + "HHII", 258, 3, 3, bps_off),
        entry(259, 3, 1, compression),
        entry(262, 3, 1, 2),
        struct.pack(e + "HHII", 273, 4, n_strips, off_off),
        entry(277, 3, 1, 3),
        entry(278, 4, 1, rows_per_strip),
        struct.pack(e + "HHII", 279, 4, n_strips, cnt_off),
        entry(317, 3, 1, predictor),
    ]
    sub = b""
    if exif:
        ents.append(entry(34665, 4, 1, sub_off))
        sub_ents = [entry(t, typ, 1, v) for t, typ, v in exif]
        sub = (
            struct.pack(e + "H", len(sub_ents))
            + b"".join(sub_ents)
            + struct.pack(e + "I", 0)
        )
        assert len(sub) == sub_size
    ifd = struct.pack(e + "H", len(ents)) + b"".join(ents) + struct.pack(
        e + "I", 0
    )
    assert len(ifd) == ifd_size
    magic = b"MM\x00*" if big_endian else b"II*\x00"
    head = magic + struct.pack(e + "I", header)
    return head + ifd + bytes(extra) + sub + b"".join(strips)


def read_tiff_metadata(data: bytes) -> dict:
    """IFD walk ONLY — never touches strip payloads: the image analog of
    a parquet footer-only scan (cf. ref_total_count_meta). Returns byte
    order, main-IFD entry census, the scalar tags a catalog needs, the
    StripOffsets count, and the EXIF sub-IFD (tag 34665) when present.
    """
    if data[:4] == b"II*\x00":
        e = "<"
    elif data[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF stream")

    type_size = {1: 1, 3: 2, 4: 4}
    type_fmt = {1: "B", 3: "H", 4: "I"}

    def walk(ifd_off: int) -> tuple[int, dict[int, tuple[int, int, int]]]:
        (n_entries,) = struct.unpack(e + "H", data[ifd_off : ifd_off + 2])
        out: dict[int, tuple[int, int, int]] = {}
        for i in range(n_entries):
            ent = data[ifd_off + 2 + 12 * i : ifd_off + 14 + 12 * i]
            tag, typ, cnt = struct.unpack(e + "HHI", ent[:8])
            if typ not in type_size:
                out[tag] = (typ, cnt, -1)
                continue
            if type_size[typ] * cnt <= 4:
                first = struct.unpack(e + type_fmt[typ], ent[8 : 8 + type_size[typ]])[0]
            else:
                (off,) = struct.unpack(e + "I", ent[8:12])
                first = struct.unpack(e + type_fmt[typ], data[off : off + type_size[typ]])[0]
            out[tag] = (typ, cnt, first)
        return n_entries, out

    (ifd_off,) = struct.unpack(e + "I", data[4:8])
    n_entries, tags = walk(ifd_off)
    exif: dict[int, tuple[int, int, int]] = {}
    n_exif = 0
    if 34665 in tags:
        n_exif, exif = walk(tags[34665][2])
    return {
        "byte_order": "MM" if e == ">" else "II",
        "n_entries": n_entries,
        "tags": tags,
        "n_exif": n_exif,
        "exif": exif,
    }
