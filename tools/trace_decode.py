#!/usr/bin/env python
"""Device-trace budget for the VQGAN decode (bench.py's non-sampler 31 ms):
one decode_code call at batch 8, per-op aggregation from the Chrome trace.

Usage: python tools/trace_decode.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 8


def main():
    import jax
    import jax.numpy as jnp

    from text_to_sound_synthesis_tpu.models.vqgan import VQModel

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass

    codec = VQModel(
        ddconfig=dict(double_z=False, z_channels=256, resolution=848,
                      in_channels=1, out_ch=1, ch=128, ch_mult=[1, 1, 2, 2, 4],
                      num_res_blocks=2, attn_resolutions=[53], dropout=0.0),
        n_embed=256, embed_dim=256, dtype=jnp.bfloat16,
    )
    k = jax.random.PRNGKey(0)
    cshapes = jax.eval_shape(lambda: codec.init(k, jnp.zeros((1, 80, 848, 1))))
    cnt = [0]

    def mk(s):
        cnt[0] += 1
        return (jax.random.normal(jax.random.PRNGKey(cnt[0]), s.shape, jnp.float32)
                * 0.02).astype(s.dtype)

    cparams = jax.tree_util.tree_map(mk, cshapes)
    grid = jax.random.randint(jax.random.PRNGKey(9), (BATCH, 5, 53), 0, 256)

    @jax.jit
    def dec(cparams, grid):
        return codec.apply(cparams, grid, method=codec.decode_code)

    t0 = time.time()
    out = dec(cparams, grid)
    _ = np.asarray(out[0, :2, :2, 0])
    print(f"compile+first {time.time() - t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    for i in range(5):
        out = dec(cparams, grid)
        _ = np.asarray(out[0, :2, :2, 0])
    print(f"decode wall: {(time.time() - t0)/5*1e3:.1f} ms/batch{BATCH}")

    from text_to_sound_synthesis_tpu.utils.trace import DeviceTrace

    tr = DeviceTrace.capture(
        lambda: np.asarray(dec(cparams, grid)[0, :2, :2, 0]),
        "/tmp/t2s_trace_dec")
    print(f"device total {tr.total_us()/1e3:.2f} ms "
          f"[jit dispatch {tr.jit_wrapper_us()/1e3:.2f} ms]")
    for nm, (us, n) in tr.by_name(strip_instance=True, top=20):
        print(f"{us/1e3:9.3f} ms x{n:5d}  {nm[:80]}")
    print("by hlo_category:")
    for nm, (us, n) in tr.by_category()[:6]:
        print(f"{us/1e3:9.3f} ms x{n:5d}  {nm}")


if __name__ == "__main__":
    main()
