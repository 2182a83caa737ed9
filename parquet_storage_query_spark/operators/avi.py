"""Pure-stdlib AVI/MJPEG container codec (mux + demux), written against
the public AVI RIFF specification (Microsoft "AVI RIFF File Reference" /
OpenDML) — the SECOND RIFF container family in the suite (WAV is the
first; the RIFF chunk walk is re-implemented here rather than shared
because AVI adds LIST recursion) and the first REAL video container:
frames are genuine baseline JPEGs (operators/jpeg.py), so the demux
composes two independently verified layers — container walk + codec.

Layout muxed: RIFF('AVI ') { LIST('hdrl') { 'avih', LIST('strl') {
'strh'(vids/MJPG), 'strf'(BITMAPINFOHEADER) } }, LIST('movi') {
'00dc' = one JPEG per frame, even-padded }, 'idx1' }.

Scope hooks (documented ValueError/NotImplementedError): audio streams,
OpenDML indexes, and non-MJPG video handlers.

Reference parity: none — the reference repo has no media surface; this
extends the multimodal family (SURVEY §2.12).
"""

from __future__ import annotations

import struct


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(
    w: int,
    h: int,
    jpeg_frames: list[bytes],
    fps: int = 25,
    pcm_frames: list[bytes] | None = None,
    sample_rate: int = 8000,
) -> bytes:
    """Mux ready-made JPEG frames into a minimal valid AVI. With
    `pcm_frames` (one little-endian PCM16 blob per video frame) a
    second `auds` stream is declared and the movi chunks INTERLEAVE
    00dc/01wb per frame — the A/V muxing contract players rely on."""
    n = len(jpeg_frames)
    max_bytes = max((len(f) for f in jpeg_frames), default=0)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        2 if pcm_frames is not None else 1,  # dwStreams
        max_bytes,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved[4]
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4H",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1, fps,  # dwScale / dwRate
            0,  # dwStart
            n,  # dwLength (frames)
            max_bytes,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (default)
            0,  # dwSampleSize (0: varies)
            0, 0, w, h,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        w,
        h,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        w * h * 3,  # biSizeImage
        0, 0, 0, 0,
    )
    strls = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    if pcm_frames is not None:
        total_samples = sum(len(a) // 2 for a in pcm_frames)
        strh_a = (
            b"auds"
            + b"\x00\x00\x00\x00"
            + struct.pack(
                "<IHHIIIIIIII4H",
                0, 0, 0, 0,
                1, sample_rate,  # dwScale / dwRate: samples per second
                0,
                total_samples,  # dwLength (samples)
                max(len(a) for a in pcm_frames),
                0xFFFFFFFF,
                2,  # dwSampleSize: PCM16 mono block
                0, 0, 0, 0,
            )
        )
        # WAVEFORMATEX: PCM, mono, 16-bit
        strf_a = struct.pack(
            "<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16
        )
        strls += _list(
            b"strl", _chunk(b"strh", strh_a) + _chunk(b"strf", strf_a)
        )
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strls)
    movi_payload = b""
    idx_entries = []
    for i, f in enumerate(jpeg_frames):
        # idx1 offsets are relative to the first byte of the 'movi'
        # list type field (the de-facto convention players expect)
        idx_entries.append((b"00dc", len(movi_payload) + 4, len(f)))
        movi_payload += _chunk(b"00dc", f)
        if pcm_frames is not None:
            a = pcm_frames[i]
            idx_entries.append((b"01wb", len(movi_payload) + 4, len(a)))
            movi_payload += _chunk(b"01wb", a)
    movi = _list(b"movi", movi_payload)
    idx1 = _chunk(
        b"idx1",
        b"".join(
            cc + struct.pack("<III", 0x10, off, size)
            for cc, off, size in idx_entries
        ),
    )
    riff_payload = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def decode_avi_mjpeg(data: bytes) -> dict:
    """Demux: RIFF walk with LIST recursion. Returns the header dims /
    frame count, the BITMAPINFOHEADER dims, the '00dc' JPEG payloads,
    and the idx1 entry count — each parsed independently so a caller
    can cross-check container self-consistency."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI stream")
    (riff_size,) = struct.unpack("<I", data[4:8])
    if riff_size + 8 > len(data):
        raise ValueError("AVI: truncated RIFF payload")

    return _demux(data, riff_size, allow_audio=False)


def decode_avi_interleaved(data: bytes) -> dict:
    """Demux an interleaved A/V AVI: like decode_avi_mjpeg but the
    '01wb' PCM16 audio chunks are COLLECTED (with their interleave
    positions) instead of raising — the full-container path."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI stream")
    (riff_size,) = struct.unpack("<I", data[4:8])
    if riff_size + 8 > len(data):
        raise ValueError("AVI: truncated RIFF payload")
    return _demux(data, riff_size, allow_audio=True)


def _demux(data: bytes, riff_size: int, allow_audio: bool) -> dict:
    out: dict = {"frames": [], "audio": [], "order": [], "n_idx1": 0}
    last_stream = [b""]  # strf layout depends on the preceding strh type

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            fourcc = data[pos : pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body_start = pos + 8
            body_end = body_start + size
            if body_end > end:
                raise ValueError("AVI: chunk overruns its parent")
            if fourcc == b"LIST":
                ltype = data[body_start : body_start + 4]
                if ltype in (b"hdrl", b"strl", b"movi"):
                    walk(body_start + 4, body_end)
                # unknown LISTs skipped (OpenDML odml etc.)
            elif fourcc == b"avih":
                vals = struct.unpack("<14I", data[body_start : body_start + 56])
                out["hdr_n_frames"] = vals[4]
                out["hdr_w"], out["hdr_h"] = vals[8], vals[9]
            elif fourcc == b"strh":
                st = data[body_start : body_start + 4]
                last_stream[0] = st
                if st == b"vids" and data[
                    body_start + 4 : body_start + 8
                ] not in (b"MJPG", b"mjpg"):
                    raise NotImplementedError("AVI: only MJPG video streams")
                if st == b"auds" and not allow_audio:
                    raise NotImplementedError("AVI: audio streams not supported")
            elif fourcc == b"strf" and last_stream[0] == b"vids":
                bw, bh = struct.unpack("<ii", data[body_start + 4 : body_start + 12])
                out["bmp_w"], out["bmp_h"] = bw, abs(bh)
            elif fourcc == b"strf" and last_stream[0] == b"auds":
                tag, nch, rate = struct.unpack(
                    "<HHI", data[body_start : body_start + 8]
                )
                if tag != 1 or nch != 1:
                    raise NotImplementedError("AVI: only mono PCM audio")
                out["audio_rate"] = rate
            elif fourcc == b"00dc":
                out["frames"].append(data[body_start:body_end])
                out["order"].append("v")
            elif fourcc == b"01wb":
                if not allow_audio:
                    raise NotImplementedError("AVI: audio streams not supported")
                out["audio"].append(data[body_start:body_end])
                out["order"].append("a")
            elif fourcc == b"idx1":
                out["n_idx1"] = size // 16
            pos = body_end + (body_end & 1)  # even alignment

    walk(12, 8 + riff_size)
    if "hdr_n_frames" not in out:
        raise ValueError("AVI: missing avih header")
    return out
