"""30x headroom probe (VERDICT r7 next-round #7): time the metrics with
the steepest 10x ratios — plus the frozen cross-round reference subset —
at /tmp/sf1 (10x sf0.1) AND /tmp/sf3 (3 replicas of sf1 via
tools/make_scaled_sf.py = 30x sf0.1), and report the sf3/sf1 ratios.
3.0 at 3x data is EXACTLY linear; anything materially above it is a
super-linear scale smell.

Both scales run in the SAME session back-to-back (crowding cancels in
the ratio) against a FRESH index dir so every *_build metric times a
real build at both scales. The frozen subset runs in its own fresh JVM
per scale (bench.py --subset-only), matching the cross-round protocol.

Usage: python tools/probe_30x.py [sf1_dir] [sf3_dir]
Writes BENCH_30x_probe.json at the repo root.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

# steepest round-7 10x ratios (BENCH_sf1_headroom.json worst-10 plus the
# co-listing kNN build at #12), in shared-artifact attribution order:
# fixture/model builds first so downstream ops time marginal work, same
# ordering contract as bench.py's HEADLINE comments
ORDER = [
    "dedup_embedding_cosine",  # cos_lsh_index_build (10x worst #2)
    "text_ngram_lm_score",  # lm_model_build (#9)
    "text_novelty_curve",  # (#3)
    "mm_decode_png",  # png_fixture_build feeds the mm_image_* ops
    "mm_image_ahash",  # (#10)
    "mm_image_edge_density",  # (#7)
    "mm_image_resize_pool",  # (#5)
    "mm_decode_wav",  # wav_fixture_build (#4) feeds the mm_audio_* ops
    "mm_audio_energy",  # (#8)
    "mm_audio_vad",  # (10x worst #1, pre-fix)
    "mm_audio_zero_crossings",  # (#6)
    "graph_common_neighbors",  # graph_co_knn_build (#12)
    # round-9 additions: this round's steepest 10x ratios plus the new
    # binary fixtures (the 1-file-trap candidates) and the guard census
    "text_tfidf_keywords",  # r9 10x #3
    "dedup_paragraphs",  # r9 10x #4
    "dedup_minhash_lsh",  # minhash_sig_build; r9 10x #5
    "join_interval_bucketed",  # density-guard census linearity
    "mm_decode_jpeg",  # jpeg_fixture_build
    "mm_decode_jpeg_420",  # jpeg420_fixture_build
    "mm_decode_jpeg_progressive",  # jpeg_prog_fixture_build
    "sim_pq_refine_topk",  # shortlist+refine serving
    # round-9 continuation: the three new codec families
    "mm_decode_jpeg_arith",  # jpeg_arith_fixture_build (QM coder)
    "mm_decode_flac",  # flac_fixture_build (rice/LZ decode slope)
    "mm_decode_gif",  # gif_fixture_build (LZW decode slope)
    # round-9 continuation, second block: new join/hash/codec families
    "dedup_setsim_prefix",  # prefix-filter shingle join (bucket growth)
    "mm_image_spectral_hash",  # WHT hash over the shared png fixture
    "dedup_image_phash_pairs",  # banded Hamming pair join
    "mm_decode_bmp",  # bmp_fixture_build
    "mm_decode_tiff",  # tiff_fixture_build (LZW MSB dialect slope)
    "mm_audio_adpcm",  # adpcm_fixture_build (block state machine)
    "mm_audio_spectral_hash",  # WHT landmark over the shared wav fixture
    "profile_embedding_covariance",  # Gram partial shuffle linearity
    # round-9 continuation, third block
    "mm_image_blur_metric",  # Laplacian gather over the shared png fixture
    "mm_video_shot_detect",  # gif_shots_fixture_build + SAD profile
    "sql_recursive_ledger",  # constant-depth recursion, width growth only
    "source_jsonl_stream",  # driver-funnel stream read (documented tail path)
    # round-10 additions: the registered cap consumers (bounded-work
    # claim under 3x bucket densification), the two new JPEG frame
    # families' fixture builds, and the multi-probe recall tier
    "dedup_minhash_capped",  # force-capped banding (work must flatten)
    "dedup_setsim_capped",  # force-capped prefix join
    "join_interval_capped",  # force-capped time-bucket join
    "mm_decode_jpeg_lossless",  # jpeg_lossless_fixture_build (DPCM slope)
    "mm_decode_jpeg_hierarchical",  # jpeg_hier_fixture_build (frame walk)
    "sim_lsh_multiprobe_topk",  # 7x probe rows, bucket-bounded candidates
    # round-11 additions: the sentinel-gated PQ tier (sentinel cost must
    # stay constant-probe), the final two JPEG frame families, the skew
    # audit (one keyed shuffle + top-k), and the bounded-state stream dedup
    "sim_pq_adaptive_topk",
    "mm_decode_jpeg_lossless_arith",  # jpeg_lossless_arith_fixture_build
    "mm_decode_jpeg_hier_kinds",  # jpeg_hier_kinds_fixture_build
    "profile_shuffle_skew",
    "stream_dedup_watermarked",
    "mm_decode_jpeg_lossless16",  # jpeg_lossless16_fixture_build
    "mm_decode_png_variants",  # png_variants_fixture_build (palette/Adam7)
    "mm_audio_pcm_depths",  # pcm_depth_fixture_build (24-bit/float32)
    "mm_decode_bmp_indexed",  # bmp_indexed_fixture_build (palette/RLE8)
    # round-11 second session: the two steepest new 10x ratios (letterbox
    # 3.98 / resample 3.68 on ~0.35 s sf0.1 bases — small-base noise or
    # slope?), the 12-bit DCT fixture build, the SQ8 encode+serve, the
    # per-shot sampler, the fixed-width carve, and the batch+stream
    # incremental-join-view pair (delta work must stay delta-sized)
    "mm_image_letterbox",
    "mm_audio_resample",
    "mm_decode_jpeg12",  # jpeg12_fixture_build (16-bit DQT wire)
    "sim_sq8_topk",  # sq8 stats+encode scans + reconstruction serve
    "mm_video_keyframes",
    "source_fixedwidth_roundtrip",
    "prep_incremental_join_view",
    "stream_join_view",
    "agg_hll_sketch_audit",  # exact-pairs scan + sketch audit linearity
    # round-11 wave 5/6: star-contraction round growth, bucket-bounded
    # kNN-graph candidates, CDC fold, footer-only IFD walk (must be flat
    # per blob), StAX parse slope, cell-density-bounded spatial join,
    # preference fold, geohash codegen fold
    "graph_connected_components",
    "sim_knn_graph",
    "stream_cdc_apply",
    "mm_exif_metadata",
    "source_xml_roundtrip",
    "join_spatial_grid",
    "train_preference_pairs",
    "scalar_geohash",
]
BUILDS = {
    "dedup_embedding_cosine": "cos_lsh_index_build",
    "text_ngram_lm_score": "lm_model_build",
    "mm_decode_png": "png_fixture_build",
    "mm_decode_wav": "wav_fixture_build",
    "graph_common_neighbors": "graph_co_knn_build",
    "dedup_minhash_lsh": "minhash_sig_build",
    "mm_decode_jpeg": "jpeg_fixture_build",
    "mm_decode_jpeg_420": "jpeg420_fixture_build",
    "mm_decode_jpeg_progressive": "jpeg_prog_fixture_build",
    "mm_decode_jpeg_arith": "jpeg_arith_fixture_build",
    "mm_decode_flac": "flac_fixture_build",
    "mm_decode_gif": "gif_fixture_build",
    "mm_decode_bmp": "bmp_fixture_build",
    "mm_decode_tiff": "tiff_fixture_build",
    "mm_audio_adpcm": "adpcm_fixture_build",
    "mm_video_shot_detect": "gif_shots_fixture_build",
    "mm_decode_jpeg_lossless": "jpeg_lossless_fixture_build",
    "mm_decode_jpeg_hierarchical": "jpeg_hier_fixture_build",
    "mm_decode_jpeg_lossless_arith": "jpeg_lossless_arith_fixture_build",
    "mm_decode_jpeg_hier_kinds": "jpeg_hier_kinds_fixture_build",
    "mm_decode_jpeg_lossless16": "jpeg_lossless16_fixture_build",
    "mm_decode_png_variants": "png_variants_fixture_build",
    "mm_audio_pcm_depths": "pcm_depth_fixture_build",
    "mm_decode_bmp_indexed": "bmp_indexed_fixture_build",
}


def _force(df) -> int:
    return df._jdf.queryExecution().toRdd().count()


def run_scale(spark, qs, sf_dir: str) -> dict[str, float]:
    timings: dict[str, float] = {}
    for name in ORDER:
        qd = qs[name]
        if name in BUILDS:
            t0 = time.perf_counter()
            _force(qd.builder(spark, sf_dir))
            timings[BUILDS[name]] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        n = _force(qd.builder(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {sf_dir} {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)
    return timings


def subset_total(sf_dir: str) -> float | None:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    try:
        proc = subprocess.run(
            [sys.executable, str(ROOT / "bench.py"), "--subset-only"],
            capture_output=True, text=True, timeout=3600, env=env,
        )
        for line in reversed(proc.stdout.strip().splitlines()):
            if line.startswith("{"):
                return json.loads(line)["reference_subset_total"]
    except Exception:  # noqa: BLE001
        pass
    return None


def main() -> int:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    sf3 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf3"
    idx = tempfile.mkdtemp(prefix="probe30x_idx_")
    os.environ["SPARK_GRAFT_INDEX_DIR"] = idx
    import atexit

    atexit.register(lambda: shutil.rmtree(idx, ignore_errors=True))

    sub1 = subset_total(sf1)
    sub3 = subset_total(sf3)

    from parquet_storage_query_spark.registry import all_queries
    from parquet_storage_query_spark.session import get_spark

    spark = get_spark("probe30x")
    qs = all_queries()
    spark.range(1).count()
    _force(qs["ref_total_count"].builder(spark, sf1))
    t1 = run_scale(spark, qs, sf1)
    t3 = run_scale(spark, qs, sf3)
    # fold per-metric minima across this round's probe runs (same best-of
    # protocol as make_headroom_report): sub-second metrics are scheduler-
    # noise-dominated in a single run and their ratios whipsaw
    out_path = ROOT / "BENCH_30x_probe.json"
    if out_path.exists():
        prev = json.loads(out_path.read_text())
        for k, v in prev.get("sf1_sec", {}).items():
            if k in t1 and isinstance(v, (int, float)):
                t1[k] = min(t1[k], v)
        for k, v in prev.get("sf3_sec", {}).items():
            if k in t3 and isinstance(v, (int, float)):
                t3[k] = min(t3[k], v)
    ratios = {
        k: round(t3[k] / t1[k], 2)
        for k in sorted(t1)
        if k in t3 and t1[k] >= 0.05
    }
    worst = sorted(ratios.items(), key=lambda kv: -kv[1])[:5]
    sub_ratio = round(sub3 / sub1, 2) if sub1 and sub3 else None
    report = {
        "metric": "headroom_30x_probe",
        "note": (
            "sf3 = 3 replicas of /tmp/sf1 (30x sf0.1, make_scaled_sf). "
            "ratios are sf3/sf1 wall per metric (per-metric MINIMA folded "
            "across this round's probe runs), same session back-to-back, "
            "fresh index dir (real builds at both scales); 3.0 = exactly "
            "linear. reference_subset_* is the frozen 64-query set in its "
            f"own fresh JVM per scale. Worst 5 ratios: {worst}. "
            f"Subset ratio: {sub_ratio}."
        ),
        "sf1_sec": t1,
        "sf3_sec": t3,
        "ratios_sf3_over_sf1": ratios,
        "reference_subset_sf1_sec": sub1,
        "reference_subset_sf3_sec": sub3,
        "reference_subset_ratio": sub_ratio,
    }
    (ROOT / "BENCH_30x_probe.json").write_text(json.dumps(report, indent=1, sort_keys=True))
    print(json.dumps({"worst": worst, "subset_ratio": sub_ratio}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
