"""Pure-stdlib GIF codec (87a/89a) — the third REAL image format with a
working decode path (PNG/PPM round 6, JPEG rounds 8-9). GIF earns its
slot for a different reason than JPEG: its entropy layer is LZW — the
dictionary-coding family — so the multimodal suite now covers all three
classic compression families an ingest pipeline meets (DEFLATE via PNG,
DCT+Huffman/QM via JPEG, LZW here), each behind the same Arrow-batched
mapInPandas plumbing and closed-form oracle discipline.

`decode_gif` handles:
- GIF87a/GIF89a headers, logical screen descriptor, global color table
- extension blocks (0x21: graphic control, comment, application —
  skipped by sub-block walk per spec)
- image descriptors with optional LOCAL color tables and INTERLACED
  row order (the four-pass 8/8-4/8-2/4-1/2 scheme, de-permuted after
  decode)
- the full LZW decoder: LSB-first variable-width codes across
  concatenated data sub-blocks, clear/end codes, dictionary growth with
  the deferred-clear 12-bit cap, and the KwKwK self-referencing case
  (code == next_code)
- output: (width, height, 3, rgb_bytes) via palette expansion — the
  same contract as decode_image's other formats; `indices=True`
  returns the raw palette indices (the integer-exact oracle surface)

`encode_gif` is a REAL LZW compressor (prefix-dictionary, emits clear
when the 12-bit code space fills), not an uncompressed shim — the
fixture streams exercise genuine dictionary growth through width
bumps at 512/1024/2048 entries. Interlaced encoding is supported for
the round-trip pytest.

Format knowledge from the public GIF89a specification (W3C/CompuServe,
1990): block layout §§17-23, LZW variant appendix F.

First decoded frame only (animation = repeated image descriptors; a
pipeline treats later frames as the video family's frame-sample
problem). Transparency (GCE bit) is metadata the caller can read; the
decode returns the palette color as stored.
"""

from __future__ import annotations

import struct

import numpy as np


class _LSBReader:
    """LSB-first bit reader over the concatenated LZW sub-block bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def read(self, n: int) -> int:
        while self._n < n:
            if self.pos >= len(self.data):
                raise ValueError("GIF: truncated LZW stream")
            self._acc |= self.data[self.pos] << self._n
            self.pos += 1
            self._n += 8
        v = self._acc & ((1 << n) - 1)
        self._acc >>= n
        self._n -= n
        return v


def _lzw_decode(data: bytes, min_code_size: int, npixels: int) -> np.ndarray:
    """GIF-variant LZW (spec appendix F): variable width starting at
    min+1, clear = 2^min, end = clear+1, width bumps when next_code
    fills the current width, capped at 12 bits (further codes decode
    against the frozen dictionary until a clear)."""
    r = _LSBReader(data)
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(npixels, dtype=np.uint8)
    filled = 0

    def reset():
        return list(bytes([i]) for i in range(clear)) + [b"", b""], min_code_size + 1

    table, width = reset()
    prev: bytes | None = None
    while filled < npixels:
        code = r.read(width)
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError("GIF: invalid LZW code")
        n = len(entry)
        if filled + n > npixels:
            raise ValueError("GIF: LZW output overruns image")
        out[filled : filled + n] = np.frombuffer(entry, dtype=np.uint8)
        filled += n
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if filled != npixels:
        raise ValueError("GIF: LZW stream ended early")
    return out


def _deinterlace(idx: np.ndarray, width: int, height: int) -> np.ndarray:
    """Invert the GIF 4-pass interlace row permutation."""
    rows = np.empty(height, dtype=np.int64)
    src = 0
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        for y in range(start, height, step):
            rows[y] = src
            src += 1
    return idx.reshape(height, width)[rows].reshape(-1)


def decode_gif(data: bytes, indices: bool = False):
    """Decode the first image of a GIF87a/89a stream. Returns
    (width, height, 3, rgb_bytes); with `indices=True` returns
    (width, height, 1, palette_index_array) — the integer surface the
    mm_decode_gif oracle replays (palette mapping is a table lookup the
    round-trip pytest pins)."""
    for w, h, idx, pal, _delay in _iter_gif_frames(data):
        if indices:
            return w, h, 1, idx
        return w, h, 3, pal[idx].tobytes()
    raise ValueError("GIF: no image descriptor")


def decode_gif_frames(data: bytes):
    """Decode ALL frames of an (animated) GIF: list of (width, height,
    index_array, delay_cs) — the REAL multi-frame decode path behind
    the video family's frame sampling (delay is the graphic-control
    extension's centisecond field, 0 when absent). Frames are returned
    at their own descriptor sizes; compositing/disposal is the
    renderer's job, per-frame statistics are the pipeline's."""
    return [(w, h, idx, delay) for w, h, idx, _pal, delay in _iter_gif_frames(data)]


def _iter_gif_frames(data: bytes):
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("GIF: bad magic")
    try:
        yield from _gif_frames_body(data)
    except (IndexError, struct.error) as e:  # truncated stream: fail loudly
        raise ValueError(f"GIF: truncated stream ({e})") from e


def _gif_frames_body(data: bytes):
    sw, sh, packed, _bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    global_pal = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_pal = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    delay = 0
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            label = data[pos + 1]
            pos += 2
            if label == 0xF9 and data[pos] >= 4:  # graphic control
                delay = struct.unpack("<H", data[pos + 2 : pos + 4])[0]
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"GIF: unexpected block 0x{b:02x}")
        left, top, w, h, ipacked = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
        pos += 10
        pal = global_pal
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF: no color table")
        min_code_size = data[pos]
        pos += 1
        chunks = []
        while data[pos] != 0:
            ln = data[pos]
            chunks.append(data[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(b"".join(chunks), min_code_size, w * h)
        if ipacked & 0x40:
            idx = _deinterlace(idx, w, h)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("GIF: pixel index outside color table")
        yield w, h, idx, pal, delay
        delay = 0


# ---------------------------------------------------------------------------
# Encoder (fixtures + round-trip tests)
# ---------------------------------------------------------------------------


class _LSBWriter:
    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, v: int, n: int) -> None:
        self._acc |= (v & ((1 << n) - 1)) << self._n
        self._n += n
        while self._n >= 8:
            self.out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def flush(self) -> bytes:
        if self._n:
            self.out.append(self._acc & 0xFF)
            self._acc = 0
            self._n = 0
        return bytes(self.out)


def _lzw_encode(idx: np.ndarray, min_code_size: int) -> bytes:
    """Real LZW compression (prefix dictionary keyed by (prefix_code,
    byte)), clear emitted when the 12-bit space fills — decoders see
    genuine width growth and dictionary resets."""
    w = _LSBWriter()
    clear = 1 << min_code_size
    end = clear + 1

    def fresh():
        return {(-1, i): i for i in range(clear)}, end + 1, min_code_size + 1

    table, next_code, width = fresh()
    w.write(clear, width)
    cur = -1
    for px in idx:
        px = int(px)
        key = (cur, px)
        if key in table:
            cur = table[key]
            continue
        w.write(cur, width)
        table[key] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        elif next_code > 4095:
            w.write(clear, width)
            table, next_code, width = fresh()
        cur = table[(-1, px)]
    w.write(cur, width)
    w.write(end, width)
    return w.flush()


def _interlace_rows(height: int) -> list[int]:
    rows = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        rows.extend(range(start, height, step))
    return rows


def encode_gif(
    width: int,
    height: int,
    idx: np.ndarray,
    palette: np.ndarray | None = None,
    interlace: bool = False,
    min_code_size: int = 8,
) -> bytes:
    """GIF89a with one image: `idx` is the palette-index array
    (row-major, length width*height); default palette is the 256-entry
    grayscale identity (i,i,i) — the fixture's exact luminance surface."""
    return encode_gif_animation(
        width, height, [np.asarray(idx)], palette, interlace, min_code_size
    )


def encode_gif_animation(
    width: int,
    height: int,
    frames: "list[np.ndarray]",
    palette: np.ndarray | None = None,
    interlace: bool = False,
    min_code_size: int = 8,
    delay_cs: int = 10,
) -> bytes:
    """GIF89a with one image descriptor per frame (full-size frames, a
    graphic-control extension carrying `delay_cs` before each) — the
    animated fixture the multi-frame decode path reads back."""
    if palette is None:
        g = np.arange(256, dtype=np.uint8)
        palette = np.stack([g, g, g], axis=1)
    npal = len(palette)
    assert npal in (2, 4, 8, 16, 32, 64, 128, 256)
    size_bits = npal.bit_length() - 2  # 2<<size_bits == npal
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | size_bits, 0, 0)
    out += palette.astype(np.uint8).tobytes()
    animated = len(frames) > 1
    for fi, idx in enumerate(frames):
        idx = np.asarray(idx, dtype=np.uint8).reshape(-1)
        assert idx.size == width * height
        if animated:  # GCE: disposal=none, no transparency, delay
            out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0x00, delay_cs, 0, 0)
        out += struct.pack(
            "<BHHHHB", 0x2C, 0, 0, width, height, 0x40 if interlace else 0x00
        )
        if interlace:
            idx = idx.reshape(height, width)[_interlace_rows(height)].reshape(-1)
        out.append(min_code_size)
        lzw = _lzw_encode(idx, min_code_size)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
