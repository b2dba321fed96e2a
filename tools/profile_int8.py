#!/usr/bin/env python
"""Component budget for the int8 100-step sampler (flagship config, batch 8).

Times each piece with an in-jit ``lax.scan`` repeat (CLAUDE.md: never time
sub-30ms ops by dispatch, sync on a tiny dependent slice):

  full        one sampler step (transformer + algebra), as in production
  transformer int8_backbone_logits alone
  self_blk    19x self_attn_block
  cross_blk   19x cross_attn_block
  mlp_blk     19x mlp_block
  embed_head  embedding gather + pos add + final LN + head matmul
  algebra     step_coeffs + fused_p_sample on fixed logits

Usage: python tools/profile_int8.py [reps=50]

CAVEAT (measured, see CLAUDE.md round-2 ledger): isolated scan-loop timings of
sub-components OVERESTIMATE their in-context cost (e.g. embed_head measured
0.65 ms isolated vs ~0 in the full step; block sums exceeded the full
transformer). Use tools/trace_int8.py (device trace) for ground truth; this
tool is only good for quick relative A/Bs of the full step.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 8
STEPS = 100


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 50

    import jax
    import jax.numpy as jnp

    from text_to_sound_synthesis_tpu.models.diffusion import DiscreteDiffusion
    from text_to_sound_synthesis_tpu.models.diffusion.int8_runtime import (
        _pad_plan,
        int8_backbone_logits,
        precompute_cond_kvs,
        _flatten_cond_kvs,
        quantize_denoiser,
    )
    from text_to_sound_synthesis_tpu.ops import fused_sampler as fs
    from text_to_sound_synthesis_tpu.ops.int8_block import (
        cross_attn_block,
        mlp_block,
        self_attn_block,
    )

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

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
    key = jax.random.PRNGKey(0)
    tokens0 = jnp.zeros((1, 265), jnp.int32)
    cond0 = jnp.zeros((1, 77, 512), jnp.float32)
    dshapes = jax.eval_shape(lambda: denoiser.init(key, tokens0, cond0,
                                                   jnp.zeros((1,), jnp.int32)))
    cnt = [0]

    def mk(s):
        cnt[0] += 1
        return (jax.random.normal(jax.random.PRNGKey(cnt[0]), s.shape, jnp.float32)
                * 0.02).astype(s.dtype)

    dparams = jax.tree_util.tree_map(mk, dshapes)
    qp = jax.device_put(quantize_denoiser(dparams, n_head=16, seq_len=265,
                                          num_timesteps=STEPS))
    sched = denoiser.schedule()

    cond = jax.random.normal(jax.random.PRNGKey(7), (BATCH, 77, 512), jnp.float32)
    cond = cond / jnp.linalg.norm(cond, axis=-1, keepdims=True)
    kvs = precompute_cond_kvs(qp, cond)

    L = 265
    D = 1024
    H = 16
    K = qp.tok_emb.shape[0]
    L_pad, block_m = _pad_plan(BATCH, L)
    M = BATCH * L_pad
    print(f"L_pad={L_pad} block_m={block_m} M={M}", file=sys.stderr)

    tokens = jnp.full((BATCH, L), K - 1, jnp.int32)
    t = jnp.asarray(57, jnp.int32)
    mods = tuple((lyr.ada1[t].reshape(2, D), lyr.ada2[t].reshape(2, D))
                 for lyr in qp.layers)
    s_valid = 77
    kv_flat = _flatten_cond_kvs(kvs, -(-s_valid // 8) * 8)
    x0 = jax.random.normal(jax.random.PRNGKey(3), (M, D), jnp.float32).astype(jnp.bfloat16)
    logits0 = jax.random.normal(jax.random.PRNGKey(4), (BATCH, L, K - 1),
                                jnp.float32).astype(jnp.bfloat16)
    coeffs0 = fs.step_coeffs(sched, t)
    mlp_bm = max(bm for bm in (128, 64, 32, 16, 8) if M % bm == 0)

    def timed(name, fn, *args):
        f = jax.jit(fn)
        out = f(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:2]
        t0 = time.time()
        out = f(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:2]
        dt = (time.time() - t0) / reps * 1000
        print(f"{name:12s} {dt:7.3f} ms/iter   ({dt*19:7.2f} ms if x19)")
        return dt

    def scan_over(body, init):
        def fn(*args):
            def step(c, _):
                return body(c, *args), ()
            out, _ = jax.lax.scan(step, init, None, length=reps)
            return out
        return fn

    # full production step (transformer + algebra), carry = tokens
    def full_body(toks, qp, kvs):
        lg = int8_backbone_logits(qp, toks, t, kvs, impl="pallas", mods=mods)
        return fs.fused_p_sample(lg, toks, coeffs0, jnp.int32(7), truncation_r=0.85)

    # transformer only (carry tokens -> argmax to keep dependency)
    def tf_body(toks, qp, kvs):
        lg = int8_backbone_logits(qp, toks, t, kvs, impl="pallas", mods=mods)
        return jnp.argmax(lg, -1).astype(jnp.int32)

    # block types: carry x
    def self_body(x, qp):
        for lyr, (m1, _) in zip(qp.layers, mods):
            x = self_attn_block(x, m1, lyr.q, lyr.k, lyr.v, lyr.proj,
                                batch=BATCH, n_head=H, q_valid=L)
        return x

    def cross_body(x, qp, kv_flat):
        for lyr, (ck, cv), (_, m2) in zip(qp.layers, kv_flat, mods):
            x = cross_attn_block(x, m2, ck, cv, lyr.crossq, lyr.crossproj,
                                 batch=BATCH, n_head=H, kv_valid=s_valid)
        return x

    def mlp_body(x, qp):
        for lyr in qp.layers:
            x = mlp_block(x, lyr.ln2_mod, lyr.fc1, lyr.fc2, block_m=mlp_bm)
        return x

    def embed_head_body(toks, qp):
        pos = jnp.pad(qp.pos_emb, ((0, L_pad - L), (0, 0)))
        tpad = jnp.pad(toks, ((0, 0), (0, L_pad - L)))
        x = (qp.tok_emb[jnp.maximum(tpad, 0)] + pos[None]).reshape(M, D)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        xn = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
        xn = xn * qp.norm_out[0] + qp.norm_out[1]
        lg = xn.astype(jnp.bfloat16) @ qp.head_w + qp.head_b.astype(jnp.bfloat16)
        return jnp.argmax(lg.reshape(BATCH, L_pad, -1)[:, :L], -1).astype(jnp.int32)

    def algebra_body(toks, logits):
        c = fs.step_coeffs(sched, t)
        return fs.fused_p_sample(logits, toks, c, jnp.int32(7), truncation_r=0.85)

    full = timed("full", scan_over(full_body, tokens), qp, kvs)
    tf = timed("transformer", scan_over(tf_body, tokens), qp, kvs)
    timed("self_blk", scan_over(self_body, x0), qp)
    timed("cross_blk", scan_over(cross_body, x0), qp, kv_flat)
    timed("mlp_blk", scan_over(mlp_body, x0), qp)
    timed("embed_head", scan_over(embed_head_body, tokens), qp)
    alg = timed("algebra", scan_over(algebra_body, tokens), logits0)
    print(f"\nfull={full:.3f}  transformer={tf:.3f}  algebra={alg:.3f}  "
          f"tf+alg={tf+alg:.3f}")


if __name__ == "__main__":
    main()
