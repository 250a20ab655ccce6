"""Serving throughput: sequential requests vs dynamic batching.

Measures the cli/serve.py service directly (no HTTP) under concurrent
load: N independent single-sample requests fired from `--concurrency`
threads coalesce into padded device batches (power-of-two buckets), vs
the same N requests issued one at a time. Each request carries a fresh
seed, so every device call computes on new noise (relay-cache-safe), and
image bytes are fetched per request (ACK-safe) — the honest-timing
protocol from PERFORMANCE.md. Operand upload per request (~4 MB of
pixels through the tunnel) is part of real serving cost and is included
deliberately.

Usage (on the TPU):
  python scripts/bench_serving_throughput.py --model_path /path/to/sd15 \
      --fast --steps 25 --requests 24 --concurrency 8 --max_batch 8
CPU smoke:
  python scripts/bench_serving_throughput.py --model_path <tiny> --cpu \
      --resolution 32 --steps 2 --requests 6 --concurrency 3 --max_batch 4
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--checkpoint_path", type=str, default=None)
    p.add_argument("--encoder_layers_idx", nargs="+", type=int,
                   default=[4, 8, 12, 16])
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--steps", type=int, default=25)
    p.add_argument("--guidance_scale", type=float, default=6.0)
    p.add_argument("--requests", type=int, default=24)
    p.add_argument("--concurrency", type=int, default=8)
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--batch_wait_ms", type=int, default=25)
    p.add_argument("--fast", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    if args.cpu:
        from photoverse_tpu.utils.platform import force_cpu

        force_cpu()

    import numpy as np
    from PIL import Image

    from photoverse_tpu.cli.serve import PhotoVerseService, build_parser

    import tempfile

    rng = np.random.RandomState(0)
    face = tempfile.NamedTemporaryFile(suffix=".jpg", delete=False)
    Image.fromarray(
        (rng.rand(args.resolution, args.resolution, 3) * 255).astype(np.uint8)
    ).save(face.name)

    serve_args = [
        "--model_path", args.model_path,
        "--resolution", str(args.resolution),
        "--default_steps", str(args.steps),
        "--encoder_layers_idx", *[str(i) for i in args.encoder_layers_idx],
        "--max_batch", str(args.max_batch),
        "--batch_wait_ms", str(args.batch_wait_ms),
        "--dynamic_batching",
    ]
    if args.checkpoint_path:
        serve_args += ["--checkpoint_path", args.checkpoint_path]
    if args.fast:
        serve_args += ["--fast"]
    service = PhotoVerseService(build_parser().parse_args(serve_args))

    def request(seed):
        return service.generate({
            "image_path": face.name,
            "prompt": "a photo of a {}",
            "num_samples": 1,
            "steps": args.steps,
            "guidance_scale": args.guidance_scale,
            "seed": seed,
        })

    def burst(n_requests, concurrency, seed0):
        """Fire n_requests from `concurrency` threads; return (wall_s, rows)."""
        seeds = list(range(seed0, seed0 + n_requests))
        lock = threading.Lock()
        rows = []

        def worker():
            while True:
                with lock:
                    if not seeds:
                        return
                    s = seeds.pop()
                rows.append(request(s)["batch_rows"])

        threads = [threading.Thread(target=worker) for _ in range(concurrency)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        return time.perf_counter() - t0, rows

    # warmup: compile EVERY power-of-two bucket the timed burst can hit
    # (grouping is timing-dependent, so a straggler pair can land in a
    # bucket the warmup burst never formed), then prime the request path
    print("[bench] warmup (compiles all buckets)...", flush=True)
    service.warmup(steps=args.steps, guidance=args.guidance_scale)
    burst(args.requests, args.concurrency, 20_000)

    # timed sequential: the true non-batched baseline — requests take the
    # direct device route (no queue, no batch_wait), one at a time. The
    # bucket-1 pipeline is shared with the warmup compile.
    print("[bench] sequential phase...", flush=True)
    q = service._queue
    service._queue = None
    try:
        t0 = time.perf_counter()
        for s in range(100, 100 + args.requests):
            request(s)
        seq_wall = time.perf_counter() - t0
    finally:
        service._queue = q

    # timed concurrent burst
    print("[bench] concurrent phase...", flush=True)
    bat_wall, rows = burst(args.requests, args.concurrency, 1_000)

    result = {
        "requests": args.requests,
        "steps": args.steps,
        "guidance_scale": args.guidance_scale,
        "sequential_imgs_per_s": round(args.requests / seq_wall, 4),
        "batched_imgs_per_s": round(args.requests / bat_wall, 4),
        "speedup": round(seq_wall / bat_wall, 4),
        "mean_rows_per_request_batch": round(
            float(np.mean(rows)) if rows else 0.0, 3
        ),
        "sequential_wall_s": round(seq_wall, 3),
        "batched_wall_s": round(bat_wall, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
