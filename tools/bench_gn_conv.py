"""A/B the fused GroupNorm+swish+conv3x3 Pallas kernel vs the XLA composition.

RESULT (v5e-1, bf16, batch 8 — the reason ops/fused_gn_conv.py is default
OFF): XLA already fuses the normalize+swish chain into the conv's operand
read (`convolution_convert_fusion`) and runs at ~94% of bf16 nameplate
(215.7 us vs a 203 us MXU floor at (8,20,212,256)); the Pallas kernel
reaches ~68-73% because its scatter/normalize/emit VPU phases serialize
against the MXU.  Measured 0.76-0.91x across the decoder stages.  Set
T2S_GN_VERBOSE=1 to print the per-op rows that show the fusion.

Timing is DEVICE time from the Chrome trace (wall-clock through the axon
relay is untrustworthy even for scan-chained runs — r2/r3 ledger).  Each
variant runs as a lax.scan-chained repeat inside one jit; per-iteration cost
is total device OP time / repeats (wrapper rows excluded by
utils/trace.DeviceTrace).

Usage: python tools/bench_gn_conv.py [repeats] [shape_idx...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from text_to_sound_synthesis_tpu.ops.fused_gn_conv import (
    gn_swish_conv, gn_swish_conv_reference)
from text_to_sound_synthesis_tpu.utils.trace import DeviceTrace

# (H, W, C) stages of the flagship decoder (batch 8, bf16), C == Co.
SHAPES = [
    (5, 53, 512),
    (10, 106, 256),
    (20, 212, 256),
    (40, 424, 128),
    (80, 848, 128),
]
B = 8
GROUPS = 32


def device_time_us(run, x, repeats, tag):
    r = run(x); np.asarray(r)                      # compile + warm
    tr = DeviceTrace.capture(lambda: np.asarray(run(x)),
                             f"/tmp/t2s_gnconv/{tag}")
    per = {name: us for name, (us, _) in tr.by_name()}
    return tr.total_us() / repeats, per


def bench_one(H, W, C, repeats, dtype=jnp.bfloat16, verbose=False):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, C), dtype)
    gamma = jnp.ones((C,), jnp.float32)
    beta = jnp.zeros((C,), jnp.float32)
    k = (jax.random.normal(key, (3, 3, C, C), jnp.float32) * 0.05)
    b = jnp.zeros((C,), jnp.float32)

    def chain(fn):
        # weights as jit ARGUMENTS, not closure constants (CLAUDE.md: baked-in
        # arrays blow the remote-compile relay's request-size cap)
        @jax.jit
        def run(x, gamma, beta, k, b):
            def body(h, _):
                return fn(h, gamma, beta, k, b), ()
            h, _ = jax.lax.scan(body, x, None, length=repeats)
            return h[0, 0, 0, :4]
        return lambda x_: run(x_, gamma, beta, k, b)

    out = {}
    for name, fn in [
        ("fused", lambda *a: gn_swish_conv(*a, groups=GROUPS)),
        ("xla", lambda *a: gn_swish_conv_reference(*a, groups=GROUPS)),
    ]:
        us, per = device_time_us(chain(fn), x, repeats, f"{name}_{H}x{W}x{C}")
        out[name] = us
        if verbose:
            rows = sorted(per.items(), key=lambda kv: -kv[1])[:6]
            for n, u in rows:
                print(f"      {u/repeats:9.1f} us/iter  {n[:80]}")
    return out


def main():
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    idxs = [int(a) for a in sys.argv[2:]] or range(len(SHAPES))
    verbose = bool(os.environ.get("T2S_GN_VERBOSE"))
    print(f"backend={jax.default_backend()} batch={B} repeats={repeats} "
          f"(device-trace time)")
    tot_f = tot_x = 0.0
    for i in idxs:
        H, W, C = SHAPES[i]
        r = bench_one(H, W, C, repeats, verbose=verbose)
        tot_f += r["fused"]; tot_x += r["xla"]
        mb = B * H * W * C * 2 / 1e6
        print(f"({H:3d},{W:3d},{C:3d}) act {mb:6.1f} MB  fused {r['fused']:8.1f} us"
              f"  xla {r['xla']:8.1f} us  speedup {r['xla']/r['fused']:.2f}x")
    print(f"TOTAL per-site pass: fused {tot_f:.0f} us, xla {tot_x:.0f} us, "
          f"speedup {tot_x/tot_f:.2f}x")


if __name__ == "__main__":
    main()
