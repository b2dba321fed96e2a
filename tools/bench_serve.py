#!/usr/bin/env python
"""Serving-daemon throughput benchmark: burst N concurrent clients at a live
tools/serve.py engine and report p50/p95 latency + served clips/sec.

The r3 validation ran the 100-step int8 engine at micro-batch 8 (10.91
clips/s, p50 3.6 s / p95 5.8 s at 64-way concurrency); VERDICT r4 #7 asks for
the fast25 static engine at the batch knee as a throughput serving mode —
this harness measures any configuration end to end through real HTTP.

Usage (throughput mode, the VERDICT ask):
  python tools/bench_serve.py --config_file configs/diffsound_audiocaps.yaml \
      --ckpt random --int8 --static --sample_type top0.85r,fast3 \
      --batch 32 --clients 64 --requests 128

Prints one JSON line: {"clips_per_sec": ..., "p50_s": ..., "p95_s": ...,
"ok": N, "errors": M, ...}.
"""

import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

CAPTIONS = [
    "a dog barks loudly in the distance",
    "rain falls steadily on a tin roof",
    "an engine revs and then idles",
    "birds chirp in the morning",
    "waves crash against the rocks",
    "a crowd applauds and cheers",
    "thunder rumbles during a storm",
    "a train passes blowing its horn",
]


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--config_file", default="configs/diffsound_audiocaps.yaml")
    p.add_argument("--ckpt", default="random")
    p.add_argument("--int8", action="store_true", default=True)
    p.add_argument("--no-int8", dest="int8", action="store_false")
    p.add_argument("--weight_bits", type=int, default=4, choices=[8, 4])
    p.add_argument("--static", action="store_true",
                   help="calibrate static activation scales first")
    p.add_argument("--sample_type", default="top0.85r,fast3")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--max_wait_ms", type=int, default=100)
    p.add_argument("--clients", type=int, default=64)
    p.add_argument("--requests", type=int, default=128)
    p.add_argument("--port", type=int, default=8931)
    args = p.parse_args()

    import serve as serve_mod

    calib = None
    if args.static:
        calib = tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False)
        calib.write("\n".join(CAPTIONS) + "\n")
        calib.close()

    srv_argv = ["--config_file", args.config_file, "--ckpt", args.ckpt,
                "--sample_type", args.sample_type, "--batch", str(args.batch),
                "--max_wait_ms", str(args.max_wait_ms),
                "--queue_limit", str(max(256, 4 * args.clients)),
                "--weight_bits", str(args.weight_bits),
                "--port", str(args.port)]
    if args.int8:
        srv_argv.append("--int8")
    if calib:
        srv_argv += ["--calibrate", calib.name]

    sargs = serve_mod.get_args(srv_argv)
    engine = serve_mod.Engine(sargs)          # loads + calibrates + jit-warms
    from http.server import ThreadingHTTPServer

    class _Server(ThreadingHTTPServer):
        request_queue_size = 256

    srv = _Server((sargs.host, args.port), serve_mod.make_handler(engine))
    threading.Thread(target=srv.serve_forever, daemon=True).start()

    import http.client

    def one(i, record):
        t0 = time.time()
        try:
            conn = http.client.HTTPConnection(sargs.host, args.port, timeout=300)
            body = json.dumps({"caption": CAPTIONS[i % len(CAPTIONS)],
                               "format": "mel"})
            conn.request("POST", "/generate", body,
                         {"Content-Type": "application/json"})
            resp = conn.getresponse()
            data = resp.read()
            ok = resp.status == 200 and len(data) > 1000
            conn.close()
        except Exception:  # noqa: BLE001
            ok = False
        record.append((ok, time.time() - t0))

    # warm probe (full batch so the padded shape is hit exactly once more)
    warm: list = []
    ws = [threading.Thread(target=one, args=(i, warm)) for i in range(args.batch)]
    t0 = time.time()
    [w.start() for w in ws]
    [w.join() for w in ws]
    print(f"warm batch: {time.time() - t0:.1f}s ({sum(o for o, _ in warm)}/"
          f"{len(warm)} ok)", file=sys.stderr)

    # burst: args.requests total, at most args.clients in flight
    results: list = []
    sem = threading.Semaphore(args.clients)

    def worker(i):
        with sem:
            one(i, results)

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(args.requests)]
    t0 = time.time()
    [t.start() for t in ts]
    [t.join() for t in ts]
    wall = time.time() - t0

    lats = sorted(l for ok, l in results if ok)
    n_ok = len(lats)
    out = {
        "mode": f"{'int8' if args.int8 else 'bf16'}"
                f"{'_w4' if args.int8 and args.weight_bits == 4 else ''}"
                f"{'_static' if args.static else ''}",
        "sample_type": args.sample_type,
        "batch": args.batch,
        "clients": args.clients,
        "requests": args.requests,
        "ok": n_ok,
        "errors": len(results) - n_ok,
        "wall_s": round(wall, 2),
        "clips_per_sec": round(n_ok / wall, 2) if wall > 0 else None,
        "p50_s": round(lats[n_ok // 2], 2) if n_ok else None,
        "p95_s": round(lats[min(n_ok - 1, int(n_ok * 0.95))], 2) if n_ok else None,
    }
    print(json.dumps(out))
    srv.shutdown()


if __name__ == "__main__":
    main()
