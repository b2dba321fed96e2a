"""Numeric check for the split-calls probe: T2S_SPLIT_CALLS=2 == unsplit, bitwise.

The probe (``T2S_SPLIT_CALLS=k`` in models/diffusion/int8_runtime.py) runs the
int8 pallas backbone once per batch shard — identical per-program work, k× the
invocations and k× the weight DMA — to isolate the per-invocation cost of the
57-kernel step (docs/ROOFLINE.md "The invocation tax, quantified").  Measured
on v5e-1: +1 pass +57 calls = +0.456 ms/step; passes 2→4 cost +0.318 ms/step
each (pure 266 MB weight-stream bandwidth), leaving ~2.4 µs/call of true
dispatch overhead.  Run this first to confirm the split path is bitwise
identical (TPU; 2-layer flagship dims, ~1 min):

    python tools/probe_split_calls.py

The TPU-gated regression test wrapper is
tests/test_int8_runtime.py::test_split_calls_probe_bitwise_identical.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_check(splits=(2,), n_layer=2):
    """Return ({split: max_abs_diff_vs_unsplit}, bf16_ulp_of_max_logit).

    The ULP scale makes the gate magnitude-relative: a one-ULP layout
    difference stays one ULP even if logit magnitudes shift with init scale
    or layer count (bf16 ULP = 2^(exponent-7), not a fixed constant)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from text_to_sound_synthesis_tpu.models.diffusion import DiscreteDiffusion
    from text_to_sound_synthesis_tpu.models.diffusion.int8_runtime import (
        int8_backbone_logits,
        precompute_cond_kvs,
        quantize_denoiser,
    )

    denoiser = DiscreteDiffusion(
        transformer_config={"params": dict(
            n_layer=n_layer, n_embd=1024, n_head=16, content_seq_len=265,
            condition_dim=512, content_spatial_size=(5, 53),
            block_activate="GELU2")},
        content_emb_config={"params": dict(num_embed=256, embed_dim=1024,
                                           spatial_size=(5, 53))},
        diffusion_step=100, dtype=jnp.bfloat16)

    k = jax.random.PRNGKey(0)
    tokens0 = jnp.zeros((1, 265), jnp.int32)
    cond0 = jnp.zeros((1, 77, 512), jnp.float32)
    shapes = jax.eval_shape(lambda: denoiser.init(
        k, tokens0, cond0, jnp.zeros((1,), jnp.int32)))
    cnt = [0]

    def mk(s):
        cnt[0] += 1
        return (jax.random.normal(jax.random.PRNGKey(cnt[0]), s.shape,
                                  jnp.float32) * 0.02).astype(s.dtype)

    params = jax.tree_util.tree_map(mk, shapes)
    qp = jax.device_put(quantize_denoiser(params, n_head=16, seq_len=265,
                                          num_timesteps=100))

    B = 8
    tokens = jax.random.randint(jax.random.PRNGKey(5), (B, 265), 0, 257)
    cond = jax.random.normal(jax.random.PRNGKey(7), (B, 77, 512), jnp.float32)
    cond = cond / jnp.linalg.norm(cond, axis=-1, keepdims=True)
    t = jnp.int32(37)  # sampler path: one shared timestep per step
    kvs = precompute_cond_kvs(qp, cond)

    prev = os.environ.get("T2S_SPLIT_CALLS")

    def logits_with(split):
        os.environ["T2S_SPLIT_CALLS"] = str(split)
        fn = jax.jit(lambda qp, tokens, t, kvs: int8_backbone_logits(
            qp, tokens, t, kvs, impl="pallas"))
        return np.asarray(fn(qp, tokens, t, kvs))

    try:
        base = logits_with(1)
        diffs = {s: float(np.abs(base - logits_with(s)).max()) for s in splits}
    finally:
        if prev is None:
            os.environ.pop("T2S_SPLIT_CALLS", None)
        else:
            os.environ["T2S_SPLIT_CALLS"] = prev
    max_abs = float(np.abs(base).max())
    ulp = 2.0 ** (np.floor(np.log2(max_abs)) - 7) if max_abs > 0 else 0.0
    return diffs, float(ulp)


if __name__ == "__main__":
    diffs, ulp = run_check(splits=(2, 4))
    print("max abs diff vs unsplit:", diffs, "bf16 ulp(max logit):", ulp)
    # split=2 bitwise; split=4 is one bf16 ULP (Mosaic layout choice at the
    # 2-rows-per-call grids) — see the pinned test in test_int8_runtime.py
    assert diffs[2] == 0.0 and diffs[4] <= ulp, (diffs, ulp)
    print("OK: split==unsplit (bitwise at 2, <=1 bf16 ULP at 4)")
