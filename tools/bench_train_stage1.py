#!/usr/bin/env python
"""Stage-1 + vocoder training-throughput benchmarks (VERDICT r2 #4).

Two rows, both at reference geometry/batch on one chip:
  * vqgan_train_step_batch8 — the full adversarial SpecVQGAN step: encode ->
    VQ -> decode, L1 + LPAPS perceptual + hinge PatchGAN with the adaptive
    disc weight (single-vjp), BOTH optimizers, disc ACTIVE (steady state past
    disc_start). Reference: Codebook/specvqgan/models/vqgan.py:88-144 with
    audioset_codebook.yaml batch_size 8, mel 80x848.
  * melgan_train_step_batch16 — hinge GAN + 10x feature matching, both
    optimizers, 8192-sample crops. Reference: vocoder/scripts/train.py:49-233
    (batch 16, seq_len 8192).

Usage: python tools/bench_train_stage1.py [bfloat16|float32] [vqgan|melgan]...
Prints one JSON line per row.
"""

import json
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__))))

import numpy as np


def bench_vqgan(dtype):
    import jax
    import jax.numpy as jnp
    import optax

    from text_to_sound_synthesis_tpu.engine.vqgan_solver import (
        VQGANLossConfig,
        VQGANTrainState,
        make_vqgan_train_step,
    )
    from text_to_sound_synthesis_tpu.models.discriminator import (
        NLayerDiscriminator,
    )
    from text_to_sound_synthesis_tpu.models.lpaps import LPAPS
    from text_to_sound_synthesis_tpu.models.vqgan import VQModel

    B = 8
    codec = VQModel(
        ddconfig=dict(double_z=False, z_channels=256, resolution=848,
                      in_channels=1, out_ch=1, ch=128, ch_mult=[1, 1, 2, 2, 4],
                      num_res_blocks=2, attn_resolutions=[53], dropout=0.0),
        n_embed=256, embed_dim=256, dtype=dtype)
    disc = NLayerDiscriminator(input_nc=1, ndf=64, n_layers=3, dtype=dtype)
    lpaps = LPAPS(dtype=dtype)

    key = jax.random.PRNGKey(0)
    mel0 = jnp.zeros((1, 80, 848, 1))
    cnt = [0]

    def mk(s):
        cnt[0] += 1
        return (jax.random.normal(jax.random.PRNGKey(cnt[0]), s.shape,
                                  jnp.float32) * 0.02).astype(s.dtype)

    ae_params = jax.tree_util.tree_map(
        mk, jax.eval_shape(lambda: codec.init(key, mel0)))
    disc_vars = jax.tree_util.tree_map(
        mk, jax.eval_shape(lambda: disc.init(key, mel0)))
    lp_params = jax.tree_util.tree_map(
        mk, jax.eval_shape(lambda: lpaps.init(key, mel0, mel0)))

    lr = 1e-6 * B  # reference lr scaling accum*ngpu*bs*base_lr
    tx_ae = optax.adam(lr, b1=0.5, b2=0.9)
    tx_disc = optax.adam(lr, b1=0.5, b2=0.9)
    # disc_start=0: steady-state adversarial phase (the expensive one)
    step = make_vqgan_train_step(codec, lpaps, disc, tx_ae, tx_disc,
                                 VQGANLossConfig(disc_start=0))
    state = VQGANTrainState.create(ae_params, disc_vars, tx_ae, tx_disc)

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.uniform(-1, 1, (B, 80, 848, 1)), jnp.float32)
    t0 = time.time()
    state, metrics = step(state, lp_params, mel, lr)
    _ = float(jax.device_get(metrics["total_loss"]))
    print(f"vqgan compile+first: {time.time() - t0:.1f}s", file=sys.stderr)

    iters = 10
    t0 = time.time()
    for _ in range(iters):
        state, metrics = step(state, lp_params, mel, lr)
    _ = jax.device_get(jax.tree_util.tree_leaves(metrics)[0])
    dt = (time.time() - t0) / iters
    print(json.dumps({"config": f"vqgan_train_step_batch{B}_{dtype}",
                      "steps_per_sec": round(1.0 / dt, 3),
                      "clips_per_sec_per_chip": round(B / dt, 2)}))

    if "--trace" in sys.argv:
        _trace_step("vqgan", lambda: step(state, lp_params, mel, lr))


def _trace_step(name, run_once, top=25):
    """Aggregate per-op-type + per-hlo_category device time for one step
    (utils/trace.py; category attribution is the truth — fusion names lie)."""
    import jax

    from text_to_sound_synthesis_tpu.utils.trace import DeviceTrace

    def once():
        out = run_once()
        _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])

    tr = DeviceTrace.capture(once, f"/tmp/t2s_train_trace/{name}")
    print(f"device step: {tr.jit_wrapper_us()/1e3:.2f} ms", file=sys.stderr)
    for k, (us, n) in tr.by_name(strip_instance=True, top=top):
        print(f"{us/1e3:9.2f} ms x{n:<5d} {k[:90]}", file=sys.stderr)
    print("by hlo_category:", file=sys.stderr)
    for k, (us, n) in tr.by_category()[:8]:
        print(f"{us/1e3:9.2f} ms x{n:<5d} {k}", file=sys.stderr)


def bench_melgan(dtype):
    import jax
    import jax.numpy as jnp
    import optax

    from text_to_sound_synthesis_tpu.engine.vocoder_solver import (
        VocoderTrainState,
        make_vocoder_train_step,
    )
    from text_to_sound_synthesis_tpu.models.melgan import (
        MelGANDiscriminator,
        MelGANGenerator,
    )

    B, T = 16, 8192
    gen = MelGANGenerator(dtype=dtype)
    disc = MelGANDiscriminator(dtype=dtype)
    key = jax.random.PRNGKey(0)
    cnt = [0]

    def mk(s):
        cnt[0] += 1
        return (jax.random.normal(jax.random.PRNGKey(cnt[0]), s.shape,
                                  jnp.float32) * 0.02).astype(s.dtype)

    g_params = jax.tree_util.tree_map(mk, jax.eval_shape(
        lambda: gen.init(key, jnp.zeros((1, T // 256, 80)))))
    d_params = jax.tree_util.tree_map(mk, jax.eval_shape(
        lambda: disc.init(key, jnp.zeros((1, T, 1)))))

    tx_g = optax.adam(1e-4, b1=0.5, b2=0.9)
    tx_d = optax.adam(1e-4, b1=0.5, b2=0.9)
    step = make_vocoder_train_step(gen, disc, tx_g, tx_d)
    state = VocoderTrainState.create(g_params, d_params, tx_g, tx_d)

    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.uniform(-0.5, 0.5, (B, T)), jnp.float32)
    t0 = time.time()
    state, metrics = step(state, wav)
    _ = jax.device_get(jax.tree_util.tree_leaves(metrics)[0])
    print(f"melgan compile+first: {time.time() - t0:.1f}s", file=sys.stderr)

    iters = 20
    t0 = time.time()
    for _ in range(iters):
        state, metrics = step(state, wav)
    _ = jax.device_get(jax.tree_util.tree_leaves(metrics)[0])
    dt = (time.time() - t0) / iters
    secs_audio = B * T / 22050.0
    print(json.dumps({"config": f"melgan_train_step_batch{B}_{dtype}",
                      "steps_per_sec": round(1.0 / dt, 3),
                      "audio_secs_per_sec_per_chip": round(secs_audio / dt, 1)}))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    import jax.numpy as jnp

    args = sys.argv[1:]
    dtype = jnp.dtype("float32" if "float32" in args else "bfloat16")
    which = [a for a in args if a in ("vqgan", "melgan")] or ["vqgan", "melgan"]
    if "vqgan" in which:
        bench_vqgan(dtype)
    if "melgan" in which:
        bench_melgan(dtype)


if __name__ == "__main__":
    main()
