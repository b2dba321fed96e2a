#!/usr/bin/env python
"""Text-to-sound HTTP serving daemon — the production serving surface.

The reference ships batch scripts only (``generate_samples_batch.py``); a
production deployment needs a long-lived process that keeps the compiled
model warm and amortizes the TPU batch dimension across concurrent callers.
This server does exactly that:

* loads config + checkpoint once, jit-warms the full generate path (int8
  serving engine by default on TPU — ``models/diffusion/int8_runtime.py``),
* micro-batches concurrent requests: callers block while the collector waits
  up to ``--max_wait_ms`` for up to ``--batch`` captions, then one TPU batch
  serves them all (padded to a fixed batch so there is exactly ONE compiled
  shape),
* returns WAV bytes (MelGAN vocoder / Griffin-Lim / raw mel ``.npy``).

API:
  POST /generate   {"caption": "...", "format": "wav"|"mel"}
      -> audio/wav bytes (or application/octet-stream .npy for "mel")
      (sampling keys advance server-side per dispatched batch; per-request
      seeds are not exposed — requests share a batch draw)
  GET  /healthz    -> {"status": "ok", "batch": N, "served": count}

Usage:
  python tools/serve.py --config_file configs/diffsound_audiocaps.yaml \
      --ckpt converted/diffsound --vocoder vocoder_logs/ --port 8900 \
      [--int8] [--batch 8] [--max_wait_ms 50]
"""

import argparse
import io
import json
import os
import queue
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config_file", required=True)
    p.add_argument("--ckpt", required=True, help="converted orbax dir, torch .pth, or 'random'")
    p.add_argument("--vocoder", default=None, help="MelGAN logdir (args.yml + best_netG.pt)")
    p.add_argument("--griffin_lim", action="store_true")
    p.add_argument("--sample_type", default="top0.85r")
    p.add_argument("--int8", action="store_true",
                   help="serve through the int8 engine (recommended on TPU)")
    p.add_argument("--weight_bits", type=int, default=4, choices=[8, 4],
                   help="with --int8: weight storage width. 4 (default) = "
                        "nibble-packed W4A8, fastest measured serving config "
                        "(docs/ROOFLINE.md round 5); 8 = plain int8")
    p.add_argument("--calibrate", default=None, metavar="CAPTIONS_TXT",
                   help="with --int8: calibrate static activation scales on "
                        "these captions (one per line) and serve the "
                        "abs-max-free static-quant engine "
                        "(models/diffusion/calibrate.py)")
    p.add_argument("--batch", type=int, default=8,
                   help="max micro-batch (the single compiled batch shape)")
    p.add_argument("--max_wait_ms", type=int, default=50,
                   help="batcher linger before dispatching a partial batch")
    p.add_argument("--queue_limit", type=int, default=64,
                   help="max pending requests; beyond this POSTs get 429")
    p.add_argument("--request_timeout_s", type=float, default=120.0,
                   help="max seconds a request waits for its batch; 503 after")
    p.add_argument("--sample_rate", type=int, default=22050,
                   help="output WAV sample rate (the mel recipe's 22050)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8900)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


class Overloaded(Exception):
    """Request queue full — caller should back off (HTTP 429)."""


class DispatchTimeout(Exception):
    """Batch did not complete within --request_timeout_s (HTTP 503)."""


class Engine:
    """Warm model + micro-batching dispatcher. Thread-safe."""

    def __init__(self, args):
        import jax
        import jax.numpy as jnp

        from generate import load_params  # tools/generate.py
        from text_to_sound_synthesis_tpu.models.diffsound import build_model
        from text_to_sound_synthesis_tpu.utils.config import load_yaml_config

        self.args = args
        self.jnp = jnp
        self.jax = jax
        self.model = build_model(load_yaml_config(args.config_file))
        self.params = load_params(self.model, args.ckpt, args.seed)

        self.vocoder = None
        if args.vocoder:
            from text_to_sound_synthesis_tpu.models.melgan.interface import load_vocoder

            self.vocoder = load_vocoder(args.vocoder)
        elif args.griffin_lim:
            from text_to_sound_synthesis_tpu.ops.signal import mel_to_wav_np

            self.vocoder = lambda spec: np.stack([mel_to_wav_np(s) for s in spec])

        ndev = len(jax.devices())
        if args.int8 and ndev > 1 and args.batch % ndev != 0:
            import warnings

            warnings.warn(
                f"--batch {args.batch} does not divide the {ndev} available "
                f"devices; serving on ONE chip and idling {ndev - 1}. Pick a "
                "batch size divisible by the device count for sharded serving.",
                RuntimeWarning, stacklevel=2)
        if args.int8 and ndev > 1 and args.batch % ndev == 0:
            # multi-chip data-parallel serving: Pallas kernels are opaque to
            # GSPMD, so the batch is split across chips via shard_map
            from text_to_sound_synthesis_tpu.models.diffusion.int8_runtime import (
                sample_tokens_int8_sharded,
            )
            from text_to_sound_synthesis_tpu.parallel.mesh import make_mesh

            from text_to_sound_synthesis_tpu.models.diffsound import (
                parse_sample_type,
            )

            head = args.sample_type.split(",")[0]
            if not (head.startswith("top") and head.endswith("r")):
                raise ValueError("int8 serving supports top-r sampling only, "
                                 f"got {args.sample_type!r}")
            r = float(head[3:-1])
            _, skip, resample_q = parse_sample_type(args.sample_type)
            if resample_q:
                raise ValueError("int8 serving does not support q-resample")
            qp = self._maybe_calibrate(self.model.quantize_for_serving(self.params, weight_bits=args.weight_bits))
            sched = self.model.diffusion.schedule()
            mesh = make_mesh(data=ndev)
            print(f"[serve] int8 sharded over {ndev} devices", flush=True)

            # qp as a jit ARGUMENT, not a closure constant: captured arrays
            # are embedded in the HLO and blow the remote-compile relay's
            # request-size cap (HTTP 413 — CLAUDE.md)
            @jax.jit
            def run_sharded(params, qp, key, toks):
                cond_emb = self.model.embed_condition(params, toks)
                tokens = sample_tokens_int8_sharded(
                    mesh, qp, sched, key, cond_emb, truncation_r=r,
                    skip_step=skip)
                return self.model.decode_tokens(params, tokens)

            qp = jax.device_put(qp)
            run = lambda params, key, toks: run_sharded(params, qp, key, toks)  # noqa: E731
        elif args.int8:
            qp = self._maybe_calibrate(self.model.quantize_for_serving(self.params, weight_bits=args.weight_bits))

            @jax.jit
            def run_int8(params, qp, key, toks):
                return self.model.generate_int8(params, qp, key, toks,
                                                sample_type=args.sample_type)

            qp = jax.device_put(qp)
            run = lambda params, key, toks: run_int8(params, qp, key, toks)  # noqa: E731
        else:
            @jax.jit
            def run(params, key, toks):
                return self.model.generate(params, key, toks,
                                           sample_type=args.sample_type)

        self._run = run
        # bounded: under sustained overload we reject (429) instead of
        # growing the backlog without bound (ADVICE r2)
        self._q: "queue.Queue" = queue.Queue(maxsize=args.queue_limit)
        self._key = jax.random.PRNGKey(args.seed)
        self.served = 0
        self._warm()
        # pipelined dispatch: the collector only ENQUEUES device work (JAX
        # dispatch is async), a separate fetcher thread does the blocking
        # device->host transfer — so batch N's result fetch overlaps batch
        # N+1's device compute. Depth 2 bounds in-flight device memory.
        self._fetch_q: "queue.Queue" = queue.Queue(maxsize=2)
        threading.Thread(target=self._collector, daemon=True).start()
        threading.Thread(target=self._fetcher, daemon=True).start()

    def _maybe_calibrate(self, qp):
        """--calibrate: bake static activation scales from a caption file."""
        if not self.args.calibrate:
            return qp
        import time as _time

        with open(self.args.calibrate) as f:
            caps = [ln.strip() for ln in f if ln.strip()]
        if not caps:
            raise ValueError(f"no captions in {self.args.calibrate}")
        caps = [caps[i % len(caps)] for i in range(self.args.batch)]
        toks = self.jnp.asarray(self.model.text_to_tokens(caps)["token"])
        t0 = _time.time()
        qp = self.model.calibrate_serving_engine(
            self.params, qp, self._calib_key(), toks,
            sample_type=self.args.sample_type)
        print(f"[serve] static calibration: {_time.time() - t0:.1f}s "
              f"({len(set(caps))} captions)", flush=True)
        return qp

    def _calib_key(self):
        import jax

        return jax.random.PRNGKey(self.args.seed + 7777)

    def _warm(self):
        toks = self.jnp.asarray(
            self.model.text_to_tokens(["warmup"] * self.args.batch)["token"])
        t0 = time.time()
        mel = self._run(self.params, self._key, toks)
        np.asarray(mel[0, :1, :1, 0])
        print(f"[serve] warm compile: {time.time() - t0:.1f}s "
              f"(batch {self.args.batch})", flush=True)

    def _collector(self):
        while True:
            first = self._q.get()           # block for the first request
            batch = [first]
            deadline = time.time() + self.args.max_wait_ms / 1000.0
            while len(batch) < self.args.batch:
                timeout = deadline - time.time()
                if timeout <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=timeout))
                except queue.Empty:
                    break
            try:
                self._dispatch(batch)
            except Exception as e:  # noqa: BLE001 — a bad batch must not kill the loop
                for _, done in batch:
                    done["error"] = repr(e)
                    done["event"].set()

    def _dispatch(self, batch):
        caps = [req["caption"] for req, _ in batch]
        # pad to the single compiled batch shape
        caps = caps + [""] * (self.args.batch - len(caps))
        toks = self.jnp.asarray(self.model.text_to_tokens(caps)["token"])
        self._key, k = self.jax.random.split(self._key)
        # async dispatch: returns a device array immediately; the fetcher
        # thread blocks on the transfer while the NEXT batch computes
        mel_dev = self._run(self.params, k, toks)
        self._fetch_q.put((batch, mel_dev))

    def _fetcher(self):
        while True:
            batch, mel_dev = self._fetch_q.get()
            try:
                mel = np.asarray(mel_dev)
                spec = (mel[..., 0] + 1.0) / 2.0  # [0, 1] TRANSFORMS spec
                for i, (req, done) in enumerate(batch):
                    done["spec"] = spec[i]
                    done["event"].set()
                self.served += len(batch)
            except Exception as e:  # noqa: BLE001 — a bad fetch must not kill the loop
                for _, done in batch:
                    done["error"] = repr(e)
                    done["event"].set()

    def generate(self, caption: str) -> np.ndarray:
        done = {"event": threading.Event()}
        try:
            self._q.put_nowait(({"caption": caption}, done))
        except queue.Full:
            raise Overloaded(
                f"request queue full ({self.args.queue_limit} pending)")
        if not done["event"].wait(timeout=self.args.request_timeout_s):
            # a wedged TPU dispatch must not hang the handler thread forever
            raise DispatchTimeout(
                f"generation did not complete in {self.args.request_timeout_s}s")
        if "error" in done:
            raise RuntimeError(done["error"])
        return done["spec"]


def make_handler(engine):
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *hargs):  # quiet
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok", "batch": engine.args.batch,
                                 "served": engine.served})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/generate":
                self._json(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n) or b"{}")
                caption = req.get("caption")
                if not caption or not isinstance(caption, str):
                    self._json(400, {"error": "missing 'caption'"})
                    return
                fmt = req.get("format", "wav" if engine.vocoder else "mel")
                if fmt not in ("wav", "mel"):
                    self._json(400, {"error": f"unknown format {fmt!r} "
                                              "(expected 'wav' or 'mel')"})
                    return
                if fmt == "wav" and engine.vocoder is None:
                    self._json(400, {"error": "format='wav' requested but the "
                                              "server has no vocoder (start "
                                              "with --vocoder or --griffin_lim)"})
                    return
                spec = engine.generate(caption)
                if fmt == "mel":
                    buf = io.BytesIO()
                    np.save(buf, spec.astype(np.float32))
                    body, ctype = buf.getvalue(), "application/octet-stream"
                else:
                    from text_to_sound_synthesis_tpu.utils.io import wav_bytes

                    wav = engine.vocoder(spec[None])[0]
                    body = wav_bytes(engine.args.sample_rate, wav, subtype="PCM_24")
                    ctype = "audio/wav"
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except Overloaded as e:
                self._json(429, {"error": str(e)})
            except DispatchTimeout as e:
                self._json(503, {"error": str(e)})
            except Exception as e:  # noqa: BLE001
                self._json(500, {"error": repr(e)})

    return Handler


def main(argv=None):
    args = get_args(argv)
    engine = Engine(args)
    from http.server import ThreadingHTTPServer

    class _Server(ThreadingHTTPServer):
        # stdlib default accept backlog is 5: a 64-way burst of connects gets
        # connection resets before the handler ever runs (measured)
        request_queue_size = 256

    srv = _Server((args.host, args.port), make_handler(engine))
    print(f"[serve] listening on http://{args.host}:{args.port} "
          f"(int8={args.int8}, vocoder={'yes' if engine.vocoder else 'mel-only'})",
          flush=True)
    srv.serve_forever()


if __name__ == "__main__":
    main()
