#!/usr/bin/env python
"""Serving load test: drive the HTTP demix service with concurrent
clients and report aggregate throughput, latency percentiles, and the
server's own autoscaling signals.

Evidence for the cross-request batching design (engine/batcher.py): the
BLSTM latency floor is batch-width independent, so aggregate xRT should
grow well past 1-client xRT as clients are added, and /info's
avg_batch_fill should approach min(clients, max_batch).

Usage:
  python scripts/serve-bench.py [--model ggml.bin.gz] [--clients 4]
         [--track-secs 30] [--segment-secs 60] [--requests 1]
         [--max-batch 4] [--port 0] [--cpu]
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default=None, help="ggml path (default: synthetic UMX-L)")
    p.add_argument("--hidden-size", type=int, default=1024)
    p.add_argument("--clients", type=int, default=4)
    p.add_argument("--requests", type=int, default=1, help="requests per client")
    p.add_argument("--track-secs", type=float, default=30.0)
    p.add_argument("--segment-secs", type=float, default=60.0)
    p.add_argument("--max-batch", type=int, default=4)
    p.add_argument("--port", type=int, default=0)
    p.add_argument("--cpu", action="store_true", help="force CPU (hermetic test)")
    p.add_argument(
        "--ttl-probe", action="store_true",
        help="after the timed window, demonstrate session TTL eviction "
        "under abandonment: start sessions on a 2 s-TTL server, abandon "
        "them, and show the table drain + 404 on a stale push",
    )
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

        try:
            jax.config.update("jax_compilation_cache_dir", "/tmp/umx_tpu_xla_cache")
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass

    import urllib.request

    import numpy as np
    from scipy.io import wavfile

    from umx_tpu.serve import serve

    model_path = args.model
    if model_path is None:
        import tempfile

        from umx_tpu.config import ModelConfig
        from umx_tpu.io.ggml import write_ggml
        from umx_tpu.models.umx import synthetic_state_dicts

        model_path = tempfile.mktemp(suffix=".bin.gz")
        write_ggml(
            model_path,
            args.hidden_size,
            synthetic_state_dicts(ModelConfig(hidden_size=args.hidden_size), seed=0),
        )

    srv = serve(
        model_path,
        port=args.port,
        segment_secs=args.segment_secs,
        max_batch=args.max_batch,
    )
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    print(f"# serving {model_path} at {base}", file=sys.stderr)

    # warmup compiles both batch sizes (1 and max_batch) via /warmup +
    # one concurrent probe round
    with urllib.request.urlopen(base + "/warmup", timeout=3600) as r:
        print(f"# warmup: {json.loads(r.read())}", file=sys.stderr)

    rng = np.random.default_rng(0)
    n = int(args.track_secs * 44100)
    wav_buf = io.BytesIO()
    wavfile.write(
        wav_buf, 44100, rng.uniform(-0.5, 0.5, (n, 2)).astype(np.float32)
    )
    body = wav_buf.getvalue()

    def one_request():
        req = urllib.request.Request(
            base + "/demix?shifts=0&wiener=1", data=body, method="POST"
        )
        t0 = time.perf_counter()
        with urllib.request.urlopen(req, timeout=3600) as r:
            r.read()
        return time.perf_counter() - t0

    # compile warm passes with full concurrency (pays the batched
    # compile).  TWO passes: in the first, the lead request can race
    # ahead as a solo batch before the others enqueue, leaving the
    # padded-to-max_batch program uncompiled — the second pass, issued
    # while the server is already hot, reliably coalesces.
    for i in range(2):
        warm_threads = [
            threading.Thread(target=one_request) for _ in range(args.clients)
        ]
        t0 = time.perf_counter()
        [t.start() for t in warm_threads]
        [t.join() for t in warm_threads]
        print(f"# concurrent warm pass {i}: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)

    # zero the batcher clock so busy_fraction/busy_s reflect the timed
    # window only (not warmup compiles)
    urllib.request.urlopen(
        urllib.request.Request(base + "/stats/reset", method="POST"), timeout=60
    ).read()

    # timed
    latencies: list[float] = []
    lock = threading.Lock()

    def client():
        for _ in range(args.requests):
            dt = one_request()
            with lock:
                latencies.append(dt)

    threads = [threading.Thread(target=client) for _ in range(args.clients)]
    t0 = time.perf_counter()
    [t.start() for t in threads]
    [t.join() for t in threads]
    wall = time.perf_counter() - t0

    total_audio = args.clients * args.requests * args.track_secs
    lat = sorted(latencies)
    pct = lambda q: lat[min(len(lat) - 1, int(q * len(lat)))]  # noqa: E731
    with urllib.request.urlopen(base + "/info", timeout=60) as r:
        info = json.loads(r.read())

    # device_xrt uses the batcher's measured device-busy seconds over the
    # timed window; on a tunneled dev backend wall time is dominated by
    # host<->device audio transfers (~35 MB/s here vs GB/s PCIe on real
    # TPU hosts), so device_xrt is the hardware-meaningful number and
    # aggregate_xrt the end-to-end one for THIS link.
    busy_s = info["batching"].get("busy_s", 0.0)
    print(json.dumps({
        "clients": args.clients,
        "requests": len(latencies),
        "track_secs": args.track_secs,
        "wall_s": round(wall, 2),
        "aggregate_xrt": round(total_audio / wall, 1),
        "device_xrt": round(total_audio / busy_s, 1) if busy_s else None,
        "latency_p50_s": round(pct(0.5), 2),
        "latency_p95_s": round(pct(0.95), 2),
        "latency_p99_s": round(pct(0.99), 2),
        "batching": info["batching"],
        "autoscaling": info["autoscaling"],
    }))
    srv.shutdown()

    if args.ttl_probe:
        # abandoned-session behavior on a short-TTL server: 3 sessions
        # started and dropped; after the TTL the next session operation
        # lazily evicts them, and a push to an evicted id is a 404.
        import urllib.error

        srv2 = serve(model_path, port=0, segment_secs=args.segment_secs,
                     max_batch=args.max_batch, session_ttl_s=2.0)
        threading.Thread(target=srv2.serve_forever, daemon=True).start()
        base2 = f"http://127.0.0.1:{srv2.server_address[1]}"
        sids = []
        for _ in range(3):
            with urllib.request.urlopen(
                urllib.request.Request(base2 + "/stream/start", method="POST"),
                timeout=600,
            ) as r:
                sids.append(json.loads(r.read())["session"])
        with urllib.request.urlopen(base2 + "/info", timeout=60) as r:
            before = json.loads(r.read())["streaming_sessions"]
        time.sleep(2.5)  # all three idle past the TTL
        with urllib.request.urlopen(
            urllib.request.Request(base2 + "/stream/start", method="POST"),
            timeout=600,
        ) as r:
            json.loads(r.read())
        with urllib.request.urlopen(base2 + "/info", timeout=60) as r:
            after = json.loads(r.read())["streaming_sessions"]
        try:
            urllib.request.urlopen(
                urllib.request.Request(
                    base2 + f"/stream/push?session={sids[0]}",
                    data=b"\x00" * 8, method="POST",
                ),
                timeout=60,
            )
            stale = "NO ERROR (bug)"
        except urllib.error.HTTPError as e:
            stale = f"HTTP {e.code}"
        print(json.dumps({
            "ttl_probe": {
                "ttl_s": 2.0,
                "abandoned_sessions": before,
                "sessions_after_ttl_plus_start": after,
                "stale_push": stale,
            }
        }))
        srv2.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
