"""Headline benchmark: AudioCaps 10 s clips/sec/chip, 100-step Diffsound sampler.

BASELINE config 4: "Diffsound 100-step discrete diffusion sampling, batch 8
AudioCaps captions". WHAT IS TIMED: the flagship denoiser (19L x 1024d)
served through the W8A8 int8 engine (models/diffusion/int8_runtime.py —
block-fused Pallas kernels; the TPU analogue of serving the reference through
TensorRT int8) with STATIC calibrated activation scales
(models/diffusion/calibrate.py — the calibration pass itself is a one-off
engine-build cost, run before timing exactly like jit compilation, as a
production deployment would at model-load time), driven by the fused
100-step ``lax.scan`` reverse sampler with top-0.85r truncation, followed by
the VQGAN decode to an 80x848 mel. WHAT IS NOT: host text BPE, the CLIP
text-tower forward (a precomputed random ``cond_emb`` stands in; ~1-2
ms/batch on-device), the MelGAN vocode (~6 ms/batch) and the host wav
write — the caption-in -> wav-out number including all of those is the
``e2e_caption_to_wav`` row of ``tools/bench_suite.py``. Random weights
(throughput is weight-agnostic). Accuracy of the int8 engine vs the bf16
model is gated by tests/test_int8_runtime.py + tests/test_static_quant.py;
kernel-vs-oracle exactness by tests/test_quant.py and
tests/test_int8_blocks.py; distribution-level drift by
tools/eval_int8_drift.py (--static) and the pinned TPU gate
tests/test_int8_drift_gate.py. ``BENCH_DYNAMIC=1`` benches the dynamic
per-token-quant engine instead; ``BENCH_BF16=1`` the bf16 path.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the repo publishes no reference numbers (BASELINE.md); the divisor
is an engineering estimate of the PyTorch reference on one H100 — 22.8 TFLOP
per clip (100 steps x 19-layer/1024d forward over 265+77 tokens) in eager fp32
with a Python-loop sampler (~30% effective utilization + launch overhead)
=> ~3.0 clips/sec. Replace when a measured reference lands.
"""

from __future__ import annotations

import json
import os
import sys
import time

H100_REFERENCE_CLIPS_PER_SEC = 3.0
BATCH = 8
STEPS = 100
TIMED_ITERS = 8  # ~0.7 s each; more iters amortize the per-dispatch relay sync


def main() -> None:
    import jax
    import jax.numpy as jnp

    from text_to_sound_synthesis_tpu.models.diffusion import DiscreteDiffusion
    from text_to_sound_synthesis_tpu.models.diffusion.int8_runtime import (
        quantize_denoiser,
        sample_tokens_int8,
    )
    from text_to_sound_synthesis_tpu.models.diffusion.process import (
        sample_tokens_fused,
    )
    from text_to_sound_synthesis_tpu.models.vqgan import VQModel

    dev = jax.devices()[0]
    print(f"bench device: {dev}", file=sys.stderr)

    denoiser = DiscreteDiffusion(
        transformer_config={
            "params": dict(
                n_layer=19, n_embd=1024, n_head=16, content_seq_len=265,
                condition_dim=512, content_spatial_size=(5, 53),
                block_activate="GELU2",
            )
        },
        content_emb_config={"params": dict(num_embed=256, embed_dim=1024,
                                           spatial_size=(5, 53))},
        diffusion_step=STEPS,
        dtype=jnp.bfloat16,
    )
    codec = VQModel(
        ddconfig=dict(double_z=False, z_channels=256, resolution=848,
                      in_channels=1, out_ch=1, ch=128, ch_mult=[1, 1, 2, 2, 4],
                      num_res_blocks=2, attn_resolutions=[53], dropout=0.0),
        n_embed=256, embed_dim=256, dtype=jnp.bfloat16,
    )

    try:  # persistent compile cache: later rounds skip the big first compile
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    tokens0 = jnp.zeros((1, 265), jnp.int32)
    cond0 = jnp.zeros((1, 77, 512), jnp.float32)
    t0 = time.time()
    # zeros via eval_shape: throughput is data-independent on TPU and this skips
    # an expensive random-init compile.
    dshapes = jax.eval_shape(lambda: denoiser.init(k1, tokens0, cond0, jnp.zeros((1,), jnp.int32)))
    cshapes = jax.eval_shape(lambda: codec.init(k2, jnp.zeros((1, 80, 848, 1))))
    # small random values, not zeros: zero weights would quantize to degenerate
    # int8 scales and unrepresentative value distributions
    cnt = [0]

    def mk(s):
        cnt[0] += 1
        return (jax.random.normal(jax.random.PRNGKey(cnt[0]), s.shape,
                                  jnp.float32) * 0.02).astype(s.dtype)

    dparams = jax.tree_util.tree_map(mk, dshapes)
    cparams = jax.tree_util.tree_map(mk, cshapes)
    print(f"init: {time.time() - t0:.1f}s", file=sys.stderr)

    use_bf16 = bool(int(os.environ.get("BENCH_BF16", "0")))
    use_dynamic = bool(int(os.environ.get("BENCH_DYNAMIC", "0")))
    # W4A8 nibble-packed weight storage is the serving DEFAULT since round 5:
    # it halves the per-step HBM weight stream (the split-calls probe's
    # 0.318 ms/step irreducible term) for a small in-kernel VPU unpack cost —
    # measured +1.2% in context, drift-gated (docs/ROOFLINE.md round 5).
    # BENCH_W8=1 restores plain int8 weight storage.
    w_bits = 8 if os.environ.get("BENCH_W8", "0") == "1" else 4
    if use_bf16:
        weights = dparams

        def sample(weights, key, cond_emb):
            return sample_tokens_fused(denoiser, weights, key, cond_emb,
                                       truncation_r=0.85)
    else:
        weights = jax.device_put(
            quantize_denoiser(dparams, n_head=16, seq_len=265,
                              num_timesteps=STEPS, weight_bits=w_bits))
        sched = denoiser.schedule()
        if not use_dynamic:
            # one-off engine-build step, untimed (like jit compile): bake
            # static activation scales calibrated on the bench conditioning
            from text_to_sound_synthesis_tpu.models.diffusion.calibrate import (
                calibrate_act_scales,
            )

            cond_c = jax.random.normal(jax.random.PRNGKey(7),
                                       (BATCH, 77, 512), jnp.float32)
            cond_c = cond_c / jnp.linalg.norm(cond_c, axis=-1, keepdims=True)
            t0 = time.time()
            # calibration's stacked-jnp amax pass needs plain int8 values;
            # for W4 run it on the unpacked twin (bit-identical weights)
            from text_to_sound_synthesis_tpu.models.diffusion.int8_runtime import (
                unpack_denoiser,
            )
            scales = calibrate_act_scales(unpack_denoiser(weights), sched,
                                          jax.random.PRNGKey(99), cond_c,
                                          truncation_r=0.85)
            weights = weights.replace(act_scales=scales)
            print(f"static calibration (one-off): {time.time() - t0:.1f}s",
                  file=sys.stderr)

        def sample(weights, key, cond_emb):
            return sample_tokens_int8(weights, sched, key, cond_emb,
                                      truncation_r=0.85)

    @jax.jit
    def generate(weights, cparams, key, cond_emb):
        toks = sample(weights, key, cond_emb)
        grid = toks.reshape(-1, 53, 5).swapaxes(1, 2)  # reverse ColumnMajor
        return codec.apply(cparams, grid, method=codec.decode_code)

    @jax.jit
    def generate_many(weights, cparams, keys, cond_emb):
        """TIMED_ITERS batches in ONE dispatch (lax.scan over seeds): through
        the axon relay every dispatch costs ~30 ms of pure enqueue artifact
        that a production host does not pay; scanning removes it.  Each
        iteration's full mel is folded into a sum so no batch element or
        pixel is dead code."""
        def body(carry, key):
            mel = generate(weights, cparams, key, cond_emb)
            return carry + jnp.sum(mel.astype(jnp.float32)), ()
        total, _ = jax.lax.scan(body, jnp.float32(0.0), keys)
        return total

    cond = jax.random.normal(jax.random.PRNGKey(7), (BATCH, 77, 512), jnp.float32)
    cond = cond / jnp.linalg.norm(cond, axis=-1, keepdims=True)

    import numpy as np

    t0 = time.time()
    full = generate(weights, cparams, jax.random.PRNGKey(1), cond)
    _ = np.asarray(full[0, :2, :2, 0])
    print(f"compile+first run: {time.time() - t0:.1f}s; mel {full.shape}", file=sys.stderr)

    # NOTE: sync via a TINY host transfer of a value that depends on the whole
    # computation — block_until_ready can return early through the axon relay,
    # and fetching the full mel would time the ~57 MB/s relay link instead of
    # the chip. All timed iterations run in ONE dispatch (generate_many):
    # through the relay each dispatch costs ~30 ms of enqueue artifact on top
    # of the trace-verified ~633 ms/batch of device time; a production host
    # pays microseconds. BENCH_DISPATCH_LOOP=1 restores the per-batch
    # dispatch loop for comparison.
    keys = jnp.stack([jax.random.PRNGKey(2 + i) for i in range(TIMED_ITERS)])
    if os.environ.get("BENCH_DISPATCH_LOOP", "0") == "1":
        t0 = time.time()
        outs = [generate(weights, cparams, keys[i], cond)
                for i in range(TIMED_ITERS)]
        for out in outs:
            _ = np.asarray(out[0, :2, :2, 0])
        elapsed = time.time() - t0
    else:
        total = generate_many(weights, cparams, keys, cond)  # compile
        _ = np.asarray(total)
        t0 = time.time()
        total = generate_many(weights, cparams, keys, cond)
        _ = np.asarray(total)
        elapsed = time.time() - t0

    clips_per_sec = BATCH * TIMED_ITERS / elapsed
    print(
        f"{BATCH * TIMED_ITERS} clips in {elapsed:.2f}s "
        f"({elapsed / (BATCH * TIMED_ITERS) * 1000:.0f} ms/clip)",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "audiocaps_10s_clips_per_sec_per_chip_100step",
        "value": round(clips_per_sec, 3),
        "unit": "clips/sec/chip",
        "vs_baseline": round(clips_per_sec / H100_REFERENCE_CLIPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
