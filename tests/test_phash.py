"""Spectral perceptual hash (mm_image_spectral_hash) kernel + banding
properties that the DuckDB oracle replay cannot distinguish on its own:
the frequency-domain claims in the docstring (brightness shifts touch
only the DC bit) and the pigeonhole recall claim of the banded pair join
(every hamming<=3 pair is found), verified against an O(n^2) brute force
over the real corpus hashes."""

from __future__ import annotations

import numpy as np
import pandas as pd

from parquet_storage_query_spark.operators.multimodal import (
    _phash_batch,
    dedup_image_phash_pairs,
    mm_image_spectral_hash,
)


def _png_of(pixels: np.ndarray, w: int, h: int) -> bytes:
    from parquet_storage_query_spark.operators.multimodal import encode_png

    return encode_png(w, h, 3, pixels.astype(np.uint8).tobytes())


def test_brightness_shift_touches_only_the_dc_bit():
    # a global +c luma shift adds 64c to the (0,0) WHT coefficient and
    # leaves every AC coefficient (and therefore the AC median) exactly
    # unchanged -> bits 1..63 must be identical; only bit 0 (DC vs the
    # AC median) may flip. Keep values in [0, 195] so +60 cannot wrap.
    rng = np.random.RandomState(7)
    w, h = 19, 13
    base = rng.randint(0, 196, size=w * h * 3)
    shifted = base + 60
    hi, lo, _ = _phash_batch(
        pd.Series([_png_of(base, w, h), _png_of(shifted, w, h)])
    )
    # mask off bit 0 (the DC bit lives in the low half at position 0)
    assert hi[0] == hi[1]
    assert lo[0] >> 1 == lo[1] >> 1


def test_constant_image_sets_only_the_dc_bit():
    # all-constant image: every AC coefficient is 0, the median is 0,
    # and the strict > threshold (ties -> 0) leaves all 63 AC bits off;
    # the DC coefficient (64 * luma) exceeds the zero median, so exactly
    # bit 0 is on — the documented DC-vs-AC-median convention
    w, h = 16, 16
    flat = np.full(w * h * 3, 77)
    hi, lo, nb = _phash_batch(pd.Series([_png_of(flat, w, h)]))
    assert (int(hi[0]), int(lo[0]), int(nb[0])) == (0, 1, 1)


def test_banded_pairs_match_bruteforce_hamming(spark, sf_dir):
    # pigeonhole recall: the 4x16-band join must surface EXACTLY the
    # pairs an O(n^2) xor+popcount scan finds at hamming <= 3
    fps = mm_image_spectral_hash(spark, sf_dir).toPandas()
    h = (
        fps["phash_hi"].to_numpy(np.uint64) << np.uint64(32)
    ) | fps["phash_lo"].to_numpy(np.uint64)
    ids = fps["doc_id"].to_numpy(np.int64)
    x = h[:, None] ^ h[None, :]
    pc = np.zeros_like(x, dtype=np.int64)
    for k in range(64):
        pc += ((x >> np.uint64(k)) & np.uint64(1)).astype(np.int64)
    iu, ju = np.triu_indices(len(ids), 1)
    keep = pc[iu, ju] <= 3
    expected = {
        (min(a, b), max(a, b), int(d))
        for a, b, d in zip(ids[iu[keep]], ids[ju[keep]], pc[iu, ju][keep])
    }
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in dedup_image_phash_pairs(spark, sf_dir).collect()
    }
    assert got == expected
    assert expected, "fixture must contain at least one near-dup pair"
