"""Int8 (W8A8) serving runtime for the Diffsound denoiser.

A quantized-inference engine for the flagship ``Text2SpecTransformer``
(backbone.py; parity target ``transformer_utils.py:276-443``): all six dense
matmuls per block run as fused int8 Pallas kernels (ops/quant.py) at the v5e
int8 MXU rate, with the LayerNorm/AdaLN prologue and dequant/GELU2/residual
epilogue resident in VMEM. Attention stays bf16 (≈4% of FLOPs). The bf16/f32
paths and all training are untouched — this is an opt-in serving mode, the
TPU analogue of TensorRT/ONNX int8 deployment of the reference model.

Numerics: symmetric per-output-channel weights, symmetric per-token dynamic
activations. Accuracy is validated against the bf16 path in
tests/test_int8_runtime.py (logit error + sampled-token agreement) — with no
released checkpoints in this environment, random-weight agreement plus the
exact kernel-vs-oracle tests in tests/test_quant.py are the gate.

Layout: tokens are padded from L to ``L_pad`` so every row-block is int8
tile-aligned; pad keys are masked out of attention and pad rows dropped at the
head. The per-layer weights are kept UNSTACKED (a tuple of per-layer pytrees,
iterated with a Python loop): Pallas operands must be dense HBM buffers, so a
rolled ``lax.scan`` over stacked (n_layer, K, N) weights would materialize a
fresh HBM copy of every weight slice per layer per step (profiled ~0.9
ms/step). Only the timestep dimension runs as a ``lax.scan``.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ...ops import diffusion as dd
from ...ops import fused_sampler as fs
from ...ops.quant import (
    QuantizedWeight,
    fused_quant_dense_multi,
    quant_dense_reference,
    quant_dense_xla,
    quantize_weight,
    quantize_weight_w4,
    unpack_weight_w4,
)

__all__ = [
    "Int8Denoiser",
    "quantize_denoiser",
    "unpack_denoiser",
    "int8_backbone_logits",
    "sample_tokens_int8",
    "sample_tokens_int8_sharded",
]


class Int8Layer(NamedTuple):
    """One SelfCrossBlock's weights (``Int8Denoiser.layers`` holds a TUPLE of
    these, one per layer — deliberately unstacked, see module docstring).

    q/k/v are separate (not packed): a packed (D, 3D) matmul forces minor-dim
    slices + physical copies when splitting heads for attention — profiled at
    ~3 ms/step of pure copy/reshape at flagship scale. Separate dots share one
    quantized input (XLA CSEs the quantize) and reshape for free.
    """

    q: QuantizedWeight          # (D, D)
    k: QuantizedWeight          # (D, D)
    v: QuantizedWeight          # (D, D)
    proj: QuantizedWeight       # (D, D)
    crossq: QuantizedWeight     # (D, D)
    crossproj: QuantizedWeight  # (D, D)
    fc1: QuantizedWeight        # (D, 4D)
    fc2: QuantizedWeight        # (4D, D)
    ln2_mod: jnp.ndarray        # (2, D) f32 — LayerNorm gamma; beta
    ada1: jnp.ndarray           # (T, 2D) f32 — ln1 modulation table
    ada2: jnp.ndarray           # (T, 2D) f32 — ln1_1 modulation table
    ck_w: jnp.ndarray           # (Dc, D) bf16 — cross key weight
    ck_b: jnp.ndarray           # (D,) f32
    cv_w: jnp.ndarray           # (Dc, D) bf16 — cross value weight
    cv_b: jnp.ndarray           # (D,) f32


class Int8Denoiser(struct.PyTreeNode):
    layers: Tuple[Int8Layer, ...]   # one entry per layer (unstacked)
    tok_emb: jnp.ndarray        # (num_classes, D) bf16
    pos_emb: jnp.ndarray        # (L, D) bf16
    norm_out: jnp.ndarray       # (2, D) f32 — gamma; beta
    head_w: jnp.ndarray         # (D, num_classes - 1) bf16
    head_b: jnp.ndarray         # (num_classes - 1,) f32
    # static metadata (not traced): safe to pass the engine through jit
    n_head: int = struct.field(pytree_node=False)
    seq_len: int = struct.field(pytree_node=False)
    num_timesteps: int = struct.field(pytree_node=False)
    # optional CALIBRATED static activation scales: per-layer 6-tuples of
    # Python floats (attn_in, attn_out, cross_in, cross_out, mlp_in, mlp_mid)
    # from models/diffusion/calibrate.py. Static (not traced) — baked into
    # the kernels as constants, deleting the dynamic abs-max VPU passes.
    # None (the default) = per-token dynamic quantization.
    act_scales: Optional[Tuple[Tuple[float, ...], ...]] = struct.field(
        pytree_node=False, default=None)
    # weight storage width: 8 (int8, default) or 4 (nibble-packed int4 —
    # W4A8, halved HBM weight stream; quantize_denoiser(weight_bits=4)).
    # Measured trade on v5e: docs/ROOFLINE.md round 5.
    weight_bits: int = struct.field(pytree_node=False, default=8)


def _ada_table(ln: dict, num_steps: int) -> jnp.ndarray:
    """Learned-table AdaLN modulation for every t: linear(silu(emb)) (T, 2D).

    Mirrors ``AdaLayerNorm.table`` (backbone.py:84-87) straight from arrays.
    """
    emb = ln["emb"]["embedding"].astype(jnp.float32)        # (T, D)
    h = jax.nn.silu(emb)
    return h @ ln["linear"]["kernel"].astype(jnp.float32) + ln["linear"]["bias"]


def _qw(dense: dict, bits: int = 8) -> QuantizedWeight:
    quant = quantize_weight if bits == 8 else quantize_weight_w4
    return quant(dense["kernel"], dense.get("bias"))


def quantize_denoiser(params: Any, *, n_head: int, seq_len: int,
                      num_timesteps: int, weight_bits: int = 8) -> Int8Denoiser:
    """Flax param tree (DiscreteDiffusion or its backbone) -> int8 engine.

    Accepts either the full ``{'params': {'backbone': ...}}`` tree of
    ``DiscreteDiffusion`` or the backbone subtree directly.
    ``weight_bits=4`` stores the eight dense weights per layer nibble-packed
    int4 (W4A8) — halved HBM weight stream, coarser weight grid (amax/7).
    """
    assert weight_bits in (8, 4), weight_bits
    p = params.get("params", params)
    p = p.get("backbone", p)

    n_layer = len([k for k in p if k.startswith("block_")])
    per_layer = []
    for i in range(n_layer):
        b = p[f"block_{i}"]
        ln2 = jnp.stack([b["ln2"]["scale"], b["ln2"]["bias"]]).astype(jnp.float32)
        per_layer.append(Int8Layer(
            q=_qw(b["attn1"]["query"], weight_bits),
            k=_qw(b["attn1"]["key"], weight_bits),
            v=_qw(b["attn1"]["value"], weight_bits),
            proj=_qw(b["attn1"]["proj"], weight_bits),
            crossq=_qw(b["attn2"]["query"], weight_bits),
            crossproj=_qw(b["attn2"]["proj"], weight_bits),
            fc1=_qw(b["mlp_fc1"], weight_bits),
            fc2=_qw(b["mlp_fc2"], weight_bits),
            ln2_mod=ln2,
            ada1=_ada_table(b["ln1"], num_timesteps),
            ada2=_ada_table(b["ln1_1"], num_timesteps),
            ck_w=b["attn2"]["key"]["kernel"].astype(jnp.bfloat16),
            ck_b=b["attn2"]["key"]["bias"].astype(jnp.float32),
            cv_w=b["attn2"]["value"]["kernel"].astype(jnp.bfloat16),
            cv_b=b["attn2"]["value"]["bias"].astype(jnp.float32),
        ))
    # layers stay UNSTACKED (tuple of per-layer pytrees): Pallas inputs need
    # dense buffers, so per-layer slices of stacked (n, K, N) weights would be
    # materialized as fresh HBM copies every step (profiled ~0.9 ms/step)
    layers = tuple(per_layer)

    emb = p["content_emb"]
    tok = emb["emb"]["embedding"]
    # pos_emb_type='embedding' stores nn.Embed subtrees {'embedding': arr};
    # pos_emb_type='parameter' stores the arrays directly (embeddings.py:48-52)
    from collections.abc import Mapping as _Mapping

    def _pos(leaf):
        return leaf["embedding"] if isinstance(leaf, _Mapping) else leaf

    h_emb = _pos(emb["height_emb"])
    w_emb = _pos(emb["width_emb"])
    pos = (h_emb[:, None, :] + w_emb[None, :, :]).reshape(-1, tok.shape[-1])
    return Int8Denoiser(
        layers=layers,
        tok_emb=tok.astype(jnp.bfloat16),
        pos_emb=pos[:seq_len].astype(jnp.bfloat16),
        norm_out=jnp.stack([p["norm_out"]["scale"], p["norm_out"]["bias"]]).astype(jnp.float32),
        head_w=p["head"]["kernel"].astype(jnp.bfloat16),
        head_b=p["head"]["bias"].astype(jnp.float32),
        n_head=n_head,
        seq_len=seq_len,
        num_timesteps=num_timesteps,
        weight_bits=weight_bits,
    )


def unpack_denoiser(qp: Int8Denoiser) -> Int8Denoiser:
    """W4 engine -> plain int8 engine (bit-identical dequantized values) —
    the jnp/CPU twin of the in-kernel unpack, used by the non-pallas impls
    and as the W4 test oracle."""
    if qp.weight_bits == 8:
        return qp
    dense_fields = ("q", "k", "v", "proj", "crossq", "crossproj", "fc1", "fc2")
    layers = tuple(
        lyr._replace(**{f: unpack_weight_w4(getattr(lyr, f))
                        for f in dense_fields})
        for lyr in qp.layers)
    return qp.replace(layers=layers, weight_bits=8)


def _pad_plan(batch: int, seq_len: int) -> Tuple[int, int]:
    """(L_pad, block_m): smallest padded length whose B*L_pad admits an
    int8-tile-aligned row block. Larger blocks measured faster (fewer grid
    programs, one prologue each): 544 beat 128 by ~0.6 ms/step at flagship
    scale. VMEM cap: block 544 x 4096 int32 acc still fits alongside the
    resident weights."""
    start = -(-seq_len // 8) * 8
    for l_pad in range(start, start + 64, 8):
        for bm in (544, 512, 272, 256, 128, 96, 64, 32):
            if (batch * l_pad) % bm == 0 and (batch * l_pad) // bm >= 2:
                return l_pad, bm
    return -(-seq_len // 32) * 32, 32


def precompute_cond_kvs(qp: Int8Denoiser, cond_emb: jnp.ndarray):
    """(B, S, Dc) condition -> per-layer cross K/V tuples ((B, S, H, hd) x2)."""
    cond = cond_emb.astype(jnp.bfloat16)
    H = qp.n_head

    def one(lyr):
        k = cond @ lyr.ck_w + lyr.ck_b.astype(jnp.bfloat16)
        v = cond @ lyr.cv_w + lyr.cv_b.astype(jnp.bfloat16)
        B, S, D = k.shape
        return (k.reshape(B, S, H, D // H), v.reshape(B, S, H, D // H))

    return tuple(one(lyr) for lyr in qp.layers)


def _flatten_cond_kvs(kvs, s_pad: int):
    """Per-layer 4-D K/V -> flat (B*s_pad, D) rows for the in-kernel MHA
    (done once per generation, outside the step scan)."""
    def flat(a):  # (B, S, H, hd)
        B, S, H, hd = a.shape
        a = jnp.pad(a, ((0, 0), (0, s_pad - S), (0, 0), (0, 0)))
        return a.reshape(B * s_pad, H * hd)

    return tuple((flat(k), flat(v)) for k, v in kvs)


def _attend(q, k, v, bias=None):
    """bf16 multi-head attention; softmax in f32. q (B,L,H,hd), k/v (B,S,H,hd)."""
    hd = q.shape[-1]
    att = jnp.einsum("blhd,bshd->bhls", q, k) / math.sqrt(hd)
    att = att.astype(jnp.float32)
    if bias is not None:
        att = att + bias
    att = jax.nn.softmax(att, axis=-1).astype(q.dtype)
    return jnp.einsum("bhls,bshd->blhd", att, v)


def _dense_xla_multi(x, ws, **kw):
    """quant_dense_xla lifted to the multi-output signature."""
    kw.pop("block_m", None)
    return tuple(quant_dense_xla(x, w, **kw) for w in ws)


def _dense_ref_multi(x, ws, **kw):
    kw.pop("block_m", None)
    return tuple(quant_dense_reference(x, w, **kw) for w in ws)


_DENSE_IMPLS = {
    "pallas_dense": fused_quant_dense_multi,  # per-dense kernels (ablation)
    "xla": _dense_xla_multi,             # no padding needed; portable
    "reference": _dense_ref_multi,       # bit-identical oracle (int32 dot)
}
# impl="pallas" uses the block kernels (ops/int8_block.py): 3 kernel
# boundaries per layer instead of 8 — the production serving path.


def _int8_backbone_hidden(
    qp: Int8Denoiser,
    tokens: jnp.ndarray,            # (B, L) int32
    t: jnp.ndarray,                 # scalar int32 (shared across batch)
    cond_kvs,                       # from precompute_cond_kvs, or pre-
                                    # flattened via _flatten_cond_kvs (then
                                    # pass s_valid)
    *,
    impl: str = "xla",
    mods=None,                      # per-layer ((2, D), (2, D)) AdaLN
                                    # modulations for this t, prefetched by
                                    # the sampler; defaults to per-layer
                                    # table gathers
    s_valid: Optional[int] = None,  # condition length when cond_kvs is flat
):
    """Pre-head backbone activations: returns (x (B*L_pad, D), L_pad)."""
    if qp.weight_bits == 4 and impl != "pallas":
        # only the block kernels unpack in-VMEM; the jnp/xla twins take the
        # bit-identical unpacked engine (test oracle / CPU path)
        qp = unpack_denoiser(qp)
    w4 = qp.weight_bits == 4
    B, L = tokens.shape
    D = qp.tok_emb.shape[-1]
    H = qp.n_head

    if impl in ("pallas", "pallas_dense"):
        # the hand kernels need int8-tile-aligned row blocks; attention runs
        # in-kernel on the flat (M, D) layout (pad keys masked, pad query
        # rows dropped at the head)
        from ...ops.attention import fused_mha

        L_pad, block_m = _pad_plan(B, L)
        dkw = dict(block_m=block_m)
        tokens = jnp.pad(tokens, ((0, 0), (0, L_pad - L)))
        pos = jnp.pad(qp.pos_emb, ((0, L_pad - L), (0, 0)))
    else:
        # XLA handles arbitrary M — no padding, no masking (mirrors the bf16
        # path exactly; padding was measured as pure overhead here)
        L_pad, dkw = L, {}
        pos = qp.pos_emb
    M = B * L_pad

    x = (qp.tok_emb[jnp.maximum(tokens, 0)] + pos[None]).reshape(M, D)

    def heads(y):
        return y.reshape(B, L_pad, H, D // H)

    if impl in ("pallas", "pallas_dense"):
        if cond_kvs[0][0].ndim == 2:
            # pre-flattened by the caller — REQUIRED on the sampling hot path:
            # flattening in here puts the pad/reshape/copy chain inside the
            # timestep scan, and XLA does not hoist it past the custom-call
            # layout constraints (trace: ~240 us/step = ~24 ms/batch at
            # flagship). ``s_valid`` must accompany flat K/V.
            assert s_valid is not None, "flat cond_kvs need s_valid"
            kv_seq = cond_kvs
        else:
            s_valid = cond_kvs[0][0].shape[1]
            kv_seq = _flatten_cond_kvs(cond_kvs, -(-s_valid // 8) * 8)
    else:
        s_valid = cond_kvs[0][0].shape[1]
        kv_seq = cond_kvs

    if mods is None:
        mods = tuple((lyr.ada1[t].reshape(2, D), lyr.ada2[t].reshape(2, D))
                     for lyr in qp.layers)

    # calibrated static activation scales (see calibrate.py): per-layer
    # 6-tuples (attn_in, attn_out, cross_in, cross_out, mlp_in, mlp_mid)
    act_s = qp.act_scales
    if act_s is None:
        act_s = ((None,) * 6,) * len(qp.layers)

    # python loop over UNSTACKED per-layer weights: a rolled/stacked scan
    # would dynamic-slice each weight into a fresh HBM copy per layer
    # (Pallas operands must be dense buffers; profiled ~0.9 ms/step)
    if impl == "pallas":
        from ...ops.int8_block import (
            attn_pair_block,
            cross_attn_block,
            mlp_block,
            mlp_block_chunked,
            mlp_block_streamed,
            self_attn_block,
        )

        import os as _os

        # MLP kernel choice (r4 A/B, tools/bench_mlp_ablate.py + in-context
        # traces, v5e-1): standalone, the chunked kernel at block_m=544 wins
        # (117.3 vs 126.1 us/layer static) — but IN CONTEXT both run at
        # ~138-140 us/layer (base 138.2 vs chunked 139.7): the in-context
        # cost is an invocation overhead both pay equally (the 8 MB weight
        # stream re-fetched per call), not program-count-bound, so the
        # simpler base-b272 stays the default. Skewed-issue software
        # pipelining == unskewed control everywhere (Mosaic schedules
        # strictly in order), and the streamed-weights variant (chunk grid
        # dim + prefetched weight blocks) is 3% WORSE in context (13.40 vs
        # 13.80 clips/s) — see docs/ROOFLINE.md round 4.
        mlp_impl = _os.environ.get("T2S_MLP_IMPL", "base")
        if w4:
            mlp_impl = "base"  # chunked/streamed don't take packed weights
        _bm_default = ("544" if mlp_impl == "chunked"
                       else "1088" if mlp_impl == "streamed" else "272")
        _bm_pref = int(_os.environ.get("T2S_MLP_BM", _bm_default))
        # T2S_SPLIT_CALLS shards the batch, so run_blocks sees M/split rows —
        # pick the block size from THAT row count or the kernel's M % block_m
        # assert trips when a custom/streamed block doesn't divide the shard.
        _split = int(_os.environ.get("T2S_SPLIT_CALLS", "1"))
        mlp_bm = max(bm for bm in (_bm_pref, 272, 128, 64, 32, 16, 8)
                     if (M // _split) % bm == 0)
        n_chunks = int(_os.environ.get(
            "T2S_MLP_CHUNKS", "16" if mlp_impl == "streamed" else "4"))
        # A/B'd on v5e-1 (CLAUDE.md round-2 ledger): split kernels 6183
        # us/step vs merged 6287 — boundaries are free, keep the split
        pair = _os.environ.get("T2S_ATTN_PAIR", "0") == "1" and not w4
        # r4 A/B (tools/bench_attn_ablate.py, v5e-1 trace): 2 batch rows per
        # program + pair-packed MHA with masks folded into the K/V dequants
        # takes self_attn 105.5 -> 93.6 us/layer (rows alone 101.7, pair
        # alone 102.3 — the levers compound). Pair needs head_dim 64
        # (2 heads per 128-lane group); rows needs B % rows == 0.
        from ...ops.int8_block import _pair_ok
        _rows_d = 2 if B % 2 == 0 else 1
        attn_rows = int(_os.environ.get("T2S_ATTN_ROWS", str(_rows_d)))
        attn_mha = _os.environ.get(
            "T2S_ATTN_MHA", "pair" if _pair_ok(H, D // H) else "base")
        def run_blocks(x, kv_seq, B):
            for lyr, (ck, cv), (mod1, mod2), ls in zip(qp.layers, kv_seq, mods,
                                                       act_s):
                if pair:
                    x = attn_pair_block(
                        x, jnp.concatenate([mod1, mod2], axis=0), ck, cv,
                        lyr.q, lyr.k, lyr.v, lyr.proj, lyr.crossq, lyr.crossproj,
                        batch=B, n_head=H, q_valid=L, kv_valid=s_valid,
                        static_s=ls[:4])
                else:
                    x = self_attn_block(x, mod1, lyr.q, lyr.k, lyr.v, lyr.proj,
                                        batch=B, n_head=H, q_valid=L,
                                        static_s=ls[:2],
                                        rows_per_program=attn_rows,
                                        mha_mode=attn_mha, w4=w4)
                    x = cross_attn_block(x, mod2, ck, cv, lyr.crossq, lyr.crossproj,
                                         batch=B, n_head=H, kv_valid=s_valid,
                                         static_s=ls[2:4],
                                         rows_per_program=attn_rows,
                                         mha_mode=attn_mha, w4=w4)
                if mlp_impl == "chunked":
                    x = mlp_block_chunked(x, lyr.ln2_mod, lyr.fc1, lyr.fc2,
                                          block_m=mlp_bm, n_chunks=n_chunks,
                                          static_s=ls[4:6])
                elif mlp_impl == "streamed":
                    x = mlp_block_streamed(x, lyr.ln2_mod, lyr.fc1, lyr.fc2,
                                           block_m=mlp_bm, n_chunks=n_chunks,
                                           static_s=ls[4:6])
                else:
                    x = mlp_block(x, lyr.ln2_mod, lyr.fc1, lyr.fc2, block_m=mlp_bm,
                                  pipeline_halves=_os.environ.get("T2S_MLP_PIPE", "0") == "1",
                                  static_s=ls[4:6], w4=w4)
            return x

        # PROBE (T2S_SPLIT_CALLS=k, docs/ROOFLINE.md round 4): run the whole
        # backbone once per batch shard — identical math and identical
        # per-program work (every grid shrinks with the batch; per-program
        # block shapes are unchanged), but k× the pallas invocations and k×
        # the weight-block DMA. One row-slice before the loop, one concat
        # after. Isolates the per-invocation cost that a grid-over-layers
        # megakernel could save.
        split = _split
        if split == 1:
            x = run_blocks(x, kv_seq, B)
        else:
            assert B % split == 0 and (B // split) % attn_rows == 0, (B, split)
            Bs, Ms = B // split, M // split
            Skv = kv_seq[0][0].shape[0] // B
            parts = []
            for i in range(split):
                kv_i = tuple((ck[i * Bs * Skv:(i + 1) * Bs * Skv],
                              cv[i * Bs * Skv:(i + 1) * Bs * Skv])
                             for ck, cv in kv_seq)
                parts.append(run_blocks(x[i * Ms:(i + 1) * Ms], kv_i, Bs))
            x = jnp.concatenate(parts, axis=0)
    else:
        dense = _DENSE_IMPLS[impl]
        for lyr, (ck, cv), (mod1, mod2), ls in zip(qp.layers, kv_seq, mods,
                                                   act_s):
            # q/k/v share one AdaLN + quantize (in-kernel / CSE'd for xla)
            q, k, v = dense(x, (lyr.q, lyr.k, lyr.v), norm="adaln", mod=mod1,
                            s_static=ls[0], **dkw)
            if impl == "pallas_dense":
                y = fused_mha(q, k, v, batch=B, n_head=H, kv_valid=L)
            else:
                y = _attend(heads(q), heads(k), heads(v)).reshape(M, D)
            (x,) = dense(y, (lyr.proj,), residual=x, s_static=ls[1], **dkw)

            (q2,) = dense(x, (lyr.crossq,), norm="adaln", mod=mod2,
                          s_static=ls[2], **dkw)
            if impl == "pallas_dense":
                y = fused_mha(q2, ck, cv, batch=B, n_head=H, kv_valid=s_valid)
            else:
                y = _attend(heads(q2), ck, cv).reshape(M, D)
            (x,) = dense(y, (lyr.crossproj,), residual=x, s_static=ls[3], **dkw)

            (h,) = dense(x, (lyr.fc1,), norm="ln", mod=lyr.ln2_mod,
                         act="gelu2", s_static=ls[4], **dkw)
            (x,) = dense(h, (lyr.fc2,), residual=x, s_static=ls[5], **dkw)

    return x, L_pad


def int8_backbone_logits(
    qp: Int8Denoiser,
    tokens: jnp.ndarray,            # (B, L) int32
    t: jnp.ndarray,                 # scalar int32 (shared across batch)
    cond_kvs,                       # from precompute_cond_kvs (or flat)
    *,
    impl: str = "xla",
    mods=None,
    s_valid: Optional[int] = None,
) -> jnp.ndarray:
    """Raw denoiser logits (B, L, num_classes - 1), int8 fused path."""
    B, L = tokens.shape
    x, L_pad = _int8_backbone_hidden(qp, tokens, t, cond_kvs, impl=impl,
                                     mods=mods, s_valid=s_valid)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
    xn = xn * qp.norm_out[0] + qp.norm_out[1]
    logits = xn.astype(jnp.bfloat16) @ qp.head_w + qp.head_b.astype(jnp.bfloat16)
    return logits.reshape(B, L_pad, -1)[:, :L]


def sample_tokens_int8(
    qp: Int8Denoiser,
    sched: dd.DiffusionSchedule,
    key: jax.Array,
    cond_emb: jnp.ndarray,
    *,
    truncation_r: float = 0.0,
    skip_step: int = 0,
    impl: Optional[str] = None,
    use_sampler_kernel: Optional[bool] = None,
) -> jnp.ndarray:
    """Int8 twin of ``process.sample_tokens_fused``: one scan over timesteps,
    int8 transformer (``impl``: pallas | pallas_dense | xla | reference;
    default: pallas block kernels on TPU, xla elsewhere) + the fused Pallas
    sampler step (TPU) or its jnp twin (elsewhere)."""
    from .process import _timestep_plan  # shared static plan

    on_tpu = jax.default_backend() == "tpu"
    if impl is None:
        impl = "pallas" if on_tpu else "xla"
    if use_sampler_kernel is None:
        use_sampler_kernel = on_tpu
    if qp.weight_bits == 4 and impl != "pallas":
        # hoist the W4 unpack OUT of the timestep scan: left to the
        # per-step check in _int8_backbone_hidden, the int32-shift/concat
        # unpack of every dense weight re-traces into the scan body and XLA
        # re-runs it all 100 steps (the LICM lesson, CLAUDE.md round 3)
        qp = unpack_denoiser(qp)
    K = qp.tok_emb.shape[0]  # num classes incl. MASK
    T = qp.num_timesteps
    L = qp.seq_len
    B = cond_emb.shape[0]

    tokens = jnp.full((B, L), K - 1, jnp.int32)  # all-MASK start
    ts, t_post = _timestep_plan(T, T, skip_step)
    seed_base = jax.random.randint(key, (), 0, jnp.iinfo(jnp.int32).max, jnp.int32)
    kvs = precompute_cond_kvs(qp, cond_emb)
    s_valid = cond_emb.shape[1]
    if impl in ("pallas", "pallas_dense"):
        # flatten to the kernels' (rows, D) layout HERE, outside the scan —
        # done per step, the pad/reshape/copy chain costs ~24 ms/batch
        # (not hoisted by XLA past the custom-call layout constraints)
        kvs = _flatten_cond_kvs(kvs, -(-s_valid // 8) * 8)

    # prefetch the AdaLN modulations for the whole timestep plan (per-step
    # table gathers inside the scan cost extra slice fusions)
    D = qp.tok_emb.shape[-1]
    S = ts.shape[0]
    mods_seq = tuple((lyr.ada1[ts].reshape(S, 2, D), lyr.ada2[ts].reshape(S, 2, D))
                     for lyr in qp.layers)

    def step(carry, inputs):
        tokens, key = carry
        (t_scalar, t_post_scalar), idx, mods = inputs
        coeffs = fs.step_coeffs(sched, t_post_scalar)
        if use_sampler_kernel and impl in ("pallas", "pallas_dense"):
            # fully fused tail: final LN + head matmul + sampler in one kernel
            # (the (M, K) logits never visit HBM)
            x, L_pad = _int8_backbone_hidden(qp, tokens, t_scalar, kvs,
                                             impl=impl, mods=mods,
                                             s_valid=s_valid)
            xt = jnp.pad(tokens, ((0, 0), (0, L_pad - L))).reshape(-1, 1)
            nxt = fs.fused_head_sample(x, xt, qp.norm_out, qp.head_w,
                                       qp.head_b, coeffs, seed_base + idx,
                                       truncation_r=truncation_r)
            tokens = nxt.reshape(B, L_pad)[:, :L]
            return (tokens, key), ()
        logits = int8_backbone_logits(qp, tokens, t_scalar, kvs, impl=impl,
                                      mods=mods, s_valid=s_valid)
        if use_sampler_kernel:
            tokens = fs.fused_p_sample(logits, tokens, coeffs, seed_base + idx,
                                       truncation_r=truncation_r)
        else:
            key, k = jax.random.split(key)
            tokens = fs.p_sample_from_indices(logits, tokens, coeffs, k,
                                              truncation_r=truncation_r)
        return (tokens, key), ()

    idxs = jnp.arange(ts.shape[0], dtype=jnp.int32)
    (tokens, _), _ = jax.lax.scan(step, (tokens, key),
                                  ((ts, t_post), idxs, mods_seq))
    return tokens


def sample_tokens_int8_sharded(
    mesh,
    qp: Int8Denoiser,
    sched: dd.DiffusionSchedule,
    key: jax.Array,
    cond_emb: jnp.ndarray,          # (B, S, Dc); B % mesh data size == 0
    *,
    axis: str = "data",
    truncation_r: float = 0.0,
    skip_step: int = 0,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """Data-parallel int8 serving over a ``jax.sharding.Mesh``.

    Pallas calls are opaque to GSPMD — XLA cannot auto-partition the fused
    kernels — so multi-chip serving goes through ``shard_map``: each device
    runs the full single-chip engine on its batch shard (no collectives
    needed; generation is embarrassingly batch-parallel). Per-shard PRNG is
    folded from the global key and the device's position along ``axis`` so
    shards draw independent samples.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    n = mesh.shape[axis]
    B = cond_emb.shape[0]
    if B % n:
        raise ValueError(
            f"batch {B} must be a multiple of the '{axis}' axis size {n}")

    def shard_fn(key, cond_shard):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        return sample_tokens_int8(qp, sched, key, cond_shard,
                                  truncation_r=truncation_r,
                                  skip_step=skip_step, impl=impl)

    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(P(), P(axis)), out_specs=P(axis),
                   check_rep=False)
    return fn(key, cond_emb)
