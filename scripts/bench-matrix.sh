#!/bin/bash
# Full bench matrix (one JSON line per config) — run on the real TPU.
# Each row is a bench.py env-knob configuration; see bench.py's header
# for the knob meanings.  Compiles are cached under /tmp/umx_tpu_xla_cache.
cd "$(dirname "$0")/.."
run() { echo "== $1 =="; shift; timeout 2400 env "$@" python bench.py 2>/dev/null | tail -1; }
run headline_420s_fused_streaming
run batch4_whole_tracks      UMX_BENCH_BATCH=4 UMX_BENCH_TRACK_SECS=420
run batch4_whole_nostream    UMX_BENCH_BATCH=4 UMX_BENCH_TRACK_SECS=420 UMX_BENCH_STREAMING=0
run batch4_segments          UMX_BENCH_BATCH=4
run nostream_cb16            UMX_BENCH_STREAMING=0 UMX_BENCH_CHUNK_BATCH=16
run per_segment_batch16      UMX_BENCH_TRACK_SECS=0 UMX_BENCH_BATCH=16
run quantized_hbm            UMX_BENCH_QUANTIZED=1
run umxhq                    UMX_BENCH_HIDDEN=512
run track_30min              UMX_BENCH_TRACK_SECS=1800
run batch6_whole_tracks      UMX_BENCH_BATCH=6 UMX_BENCH_TRACK_SECS=420
run track_60min_windowed     UMX_BENCH_TRACK_SECS=3600
