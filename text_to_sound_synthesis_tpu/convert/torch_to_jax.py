"""PyTorch -> JAX checkpoint conversion for the released reference artifacts.

Converts the reference's released weights into our flax param trees:

* Stage-1 SpecVQGAN ``.ckpt`` (PyTorch-Lightning ``state_dict``) -> ``VQModel``
* OpenAI CLIP ``ViT-B/32.pt`` text tower -> ``CLIPTextEmbedding``
* MelGAN ``best_netG.pt`` (weight-normalized) -> ``MelGANGenerator``
  (weight norm folded into plain kernels at conversion, SURVEY.md §7 phase 0)
* Stage-2 Diffsound ``.pth`` (``ckpt['model']`` / ``ckpt['ema']``) ->
  ``DiscreteDiffusion`` (+ codec + CLIP trees extracted from the same file)

Layout rules (verified numerically in tests/test_convert.py):
* Linear:          torch (out, in)        -> kernel (in, out)
* Conv2d:          torch (O, I, kH, kW)   -> kernel (kH, kW, I, O)   [NHWC/HWIO]
* Conv1d:          torch (O, I, k)        -> kernel (k, I, O)        [NWC/WIO]
* ConvTranspose1d: torch (I, O, k)        -> kernel (k, O, I)  (our module flips
  and transposes internally; see models/melgan/generator.py)
* weight-norm:     w = g * v / ||v||  (norm over all dims except 0)
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Mapping

import numpy as np

__all__ = [
    "load_torch_state_dict",
    "convert_vqgan",
    "convert_clip_text",
    "convert_clip_vision",
    "convert_melgan_generator",
    "convert_discriminator",
    "convert_rnn_embedder",
    "convert_diffusion",
    "convert_diffsound_checkpoint",
]


def load_torch_state_dict(path: str, key: str | None = None) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint into a flat {name: float32 ndarray} dict.

    ``key`` selects a sub-dict ('state_dict' for PL, 'model'/'ema' for the
    Stage-2 solver checkpoints).
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if key is not None:
        obj = obj[key]
    elif isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    out = {}
    for name, tensor in obj.items():
        if hasattr(tensor, "detach"):
            out[name] = tensor.detach().to(torch.float32).numpy()
    return out


# -- layout helpers ----------------------------------------------------------

def _linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _conv2d(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _conv1d(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


def _convtranspose1d(w: np.ndarray) -> np.ndarray:
    # torch (I, O, k) -> ours (k, O, I)
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


def fold_weight_norm(sd: Mapping[str, np.ndarray], base: str) -> np.ndarray:
    """weight_g/weight_v -> plain weight (torch weight_norm, dim=0)."""
    if base + ".weight" in sd:
        return sd[base + ".weight"]
    g = sd[base + ".weight_g"]
    v = sd[base + ".weight_v"]
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt((v**2).sum(axis=axes, keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


class _Filler:
    """Fills a flax param tree by path-driven lookup into a torch state dict."""

    def __init__(self, sd: Mapping[str, np.ndarray]):
        self.sd = dict(sd)
        self.used: set = set()

    def get(self, torch_name: str, transform: Callable[[np.ndarray], np.ndarray] | None = None) -> np.ndarray:
        if torch_name not in self.sd:
            raise KeyError(f"torch checkpoint has no tensor {torch_name!r}")
        self.used.add(torch_name)
        w = self.sd[torch_name]
        return (transform(w) if transform else w).astype(np.float32)

    def fill(self, params: Any, rule: Callable[[tuple, np.ndarray], np.ndarray]) -> Any:
        import jax

        def one(path, leaf):
            names = tuple(str(getattr(p, "key", getattr(p, "name", p))) for p in path)
            new = rule(names, leaf)
            if new.shape != leaf.shape:
                raise ValueError(f"shape mismatch at {'/'.join(names)}: "
                                 f"converted {new.shape} vs model {leaf.shape}")
            return new.astype(np.asarray(leaf).dtype)

        return jax.tree_util.tree_map_with_path(one, params)


def convert_discriminator(sd: Mapping[str, np.ndarray], params: Any,
                          prefix: str = "main.") -> Any:
    """torch PatchGAN ``main`` Sequential -> our discriminator param tree.

    Works for ``NLayerDiscriminator`` (2-D) and both 1-D variants
    (``discriminator/model.py:98,149,205``): convs map in order to
    conv_0, conv_1..conv_k, conv_out; BatchNorm affine+running stats map to
    norm_i params/batch_stats; ActNorm (1,C,1,1) loc/scale squeeze to (C,).
    Use prefix ``"loss.discriminator.main."`` for a Stage-1 PL checkpoint.
    """
    from flax.core import unfreeze
    import jax

    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    groups: Dict[int, Dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        idx_s, suffix = k.split(".", 1)
        groups.setdefault(int(idx_s), {})[suffix] = v

    convs, norms = [], []
    for idx in sorted(groups):
        g = groups[idx]
        if "running_mean" in g or "loc" in g:
            norms.append(g)
        elif "weight" in g and g["weight"].ndim >= 3:
            convs.append(g)

    out = unfreeze(jax.tree_util.tree_map(np.asarray, params))
    p = out["params"]
    conv_names = (["conv_0"] + [f"conv_{i}" for i in range(1, len(convs) - 1)]
                  + ["conv_out"])
    for name, g in zip(conv_names, convs):
        w = g["weight"]
        p[name]["kernel"] = (_conv2d(w) if w.ndim == 4 else _conv1d(w)).astype(np.float32)
        if "bias" in g and "bias" in p[name]:
            p[name]["bias"] = g["bias"].astype(np.float32)
    for i, g in enumerate(norms, start=1):
        name = f"norm_{i}"
        if "loc" in g:  # ActNorm
            p[name]["loc"] = g["loc"].reshape(-1).astype(np.float32)
            p[name]["scale"] = g["scale"].reshape(-1).astype(np.float32)
        else:
            p[name]["scale"] = g["weight"].astype(np.float32)
            p[name]["bias"] = g["bias"].astype(np.float32)
            out.setdefault("batch_stats", {}).setdefault(name, {})
            out["batch_stats"][name]["mean"] = g["running_mean"].astype(np.float32)
            out["batch_stats"][name]["var"] = g["running_var"].astype(np.float32)
    return out


def convert_rnn_embedder(sd: Mapping[str, np.ndarray], params: Any,
                         prefix: str = "", kind: str = "lstm") -> Any:
    """torch ``nn.LSTM``/``nn.GRU`` weights -> ``RNNEmbedder`` params.

    The reference's GPTFeats/GPTFeatsClass can use recurrent feature embedders
    (mingpt.py:266-282). torch packs gates row-wise in ``weight_ih_l{i}``:
    LSTM order [i, f, g, o], GRU order [r, z, n]. flax keeps per-gate Dense
    kernels; biases merge as noted per gate (GRU's new-gate hidden bias stays
    separate because it sits inside the reset product, matching flax).

    ``params``: the ``RNNEmbedder`` variables dict ({'params': {'cell_0': ...}}).
    """
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    import jax
    from flax.core import unfreeze

    out = unfreeze(jax.tree_util.tree_map(lambda x: x, params))
    p = out["params"]
    n_layers = len([k for k in sd if k.startswith("weight_ih_l")])
    for i in range(n_layers):
        w_ih, w_hh = sd[f"weight_ih_l{i}"], sd[f"weight_hh_l{i}"]
        b_ih = sd.get(f"bias_ih_l{i}")
        b_hh = sd.get(f"bias_hh_l{i}")
        cell = p[f"cell_{i}"]
        H = w_hh.shape[1]
        if kind == "lstm":
            for j, g in enumerate("ifgo"):
                rows = slice(j * H, (j + 1) * H)
                cell[f"i{g}"]["kernel"] = _linear(w_ih[rows])
                cell[f"h{g}"]["kernel"] = _linear(w_hh[rows])
                bias = np.zeros(H, np.float32)
                if b_ih is not None:
                    bias = bias + b_ih[rows]
                if b_hh is not None:
                    bias = bias + b_hh[rows]
                cell[f"h{g}"]["bias"] = bias.astype(np.float32)
        else:  # gru
            for j, g in enumerate("rzn"):
                rows = slice(j * H, (j + 1) * H)
                cell[f"i{g}"]["kernel"] = _linear(w_ih[rows])
                cell[f"h{g}"]["kernel"] = _linear(w_hh[rows])
                if g == "n":
                    # tanh(W_in x + b_in + r * (W_hn h + b_hn)): biases stay split
                    cell["in"]["bias"] = (b_ih[rows] if b_ih is not None
                                          else np.zeros(H)).astype(np.float32)
                    cell["hn"]["bias"] = (b_hh[rows] if b_hh is not None
                                          else np.zeros(H)).astype(np.float32)
                else:
                    bias = np.zeros(H, np.float32)
                    if b_ih is not None:
                        bias = bias + b_ih[rows]
                    if b_hh is not None:
                        bias = bias + b_hh[rows]
                    cell[f"i{g}"]["bias"] = bias.astype(np.float32)
    return out


# -- SpecVQGAN ---------------------------------------------------------------

def convert_vqgan(sd: Mapping[str, np.ndarray], params: Any, prefix: str = "") -> Any:
    """Fill a VQModel param tree from a SpecVQGAN state dict."""
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    filler = _Filler(sd)

    def rule(names, leaf):
        # our structural names: down_{i}_block_{j}, down_{i}_attn_{j},
        # down_{i}_downsample, mid_block_1, mid_attn_1, norm_out, conv_in/out
        torch_name, tf = _translate_vqgan(names)
        return filler.get(torch_name, tf)

    return filler.fill(params, rule)


def _translate_vqgan(names: tuple) -> tuple[str, Callable | None]:
    ns = [n for n in names if n != "params"]
    leaf = ns[-1]
    path = ns[:-1]

    segs = []
    for n in path:
        if n in ("encoder", "decoder", "quantize", "quant_conv", "post_quant_conv"):
            segs.append(n)
        elif n.startswith("down_") or n.startswith("up_"):
            # down_{i}_block_{j} -> down.{i}.block.{j}; down_{i}_downsample ->
            # down.{i}.downsample (same for up_/upsample)
            segs.append(n.replace("_", "."))
        elif n.startswith("mid_"):
            segs.append("mid." + n[len("mid_"):])
        elif (
            n == "norm"
            and segs
            and segs[-1].split(".")[-1] in ("norm", "norm1", "norm2", "norm_out")
        ):  # GroupNorm32's inner nn.GroupNorm level — transparent
            continue
        else:
            segs.append(n)

    if segs and segs[0] == "quantize":
        return "quantize.embedding.weight", None
    base = ".".join(segs)
    if leaf == "kernel":
        return base + ".weight", _conv2d
    if leaf == "scale":
        return base + ".weight", None
    if leaf == "bias":
        return base + ".bias", None
    raise KeyError(f"unmapped vqgan param {'/'.join(ns)}")


# -- CLIP text tower ---------------------------------------------------------

def convert_clip_text(sd: Mapping[str, np.ndarray], params: Any, prefix: str = "") -> Any:
    """Fill CLIPTextEmbedding params from a CLIP (or Diffsound condition_emb)
    state dict. Handles both full-CLIP names (``transformer.resblocks.N...``)
    and the wrapper's flattened names."""
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    filler = _Filler(sd)

    def rule(names, leaf):
        ns = [n for n in names if n != "params"]
        if ns[0] == "text":
            ns = ns[1:]
        if ns[0] == "token_embedding":
            return filler.get("token_embedding.weight")
        if ns[0] == "positional_embedding":
            return filler.get("positional_embedding")
        if ns[0] == "text_projection":
            return filler.get("text_projection")
        if ns[0] == "ln_final":
            return filler.get(f"ln_final.{'weight' if ns[-1] == 'scale' else 'bias'}")
        if ns[0].startswith("resblock_"):
            return _clip_resblock(filler, ns)
        raise KeyError(f"unmapped clip param {'/'.join(ns)}")

    return filler.fill(params, rule)


def _clip_resblock(filler: "_Filler", ns) -> np.ndarray:
    """Shared CLIP ResidualAttentionBlock mapping (text + vision towers)."""
    i = ns[0].split("_")[1]
    base = f"transformer.resblocks.{i}"
    sub, leaf_name = ns[1], ns[-1]
    if sub in ("ln_1", "ln_2"):
        return filler.get(f"{base}.{sub}.{'weight' if leaf_name == 'scale' else 'bias'}")
    if sub == "attn_in_proj":
        if leaf_name == "kernel":
            return _linear(filler.get(f"{base}.attn.in_proj_weight"))
        return filler.get(f"{base}.attn.in_proj_bias")
    if sub == "attn_out_proj":
        if leaf_name == "kernel":
            return _linear(filler.get(f"{base}.attn.out_proj.weight"))
        return filler.get(f"{base}.attn.out_proj.bias")
    if sub == "mlp_c_fc":
        t = "weight" if leaf_name == "kernel" else "bias"
        w = filler.get(f"{base}.mlp.c_fc.{t}")
        return _linear(w) if leaf_name == "kernel" else w
    if sub == "mlp_c_proj":
        t = "weight" if leaf_name == "kernel" else "bias"
        w = filler.get(f"{base}.mlp.c_proj.{t}")
        return _linear(w) if leaf_name == "kernel" else w
    raise KeyError(f"unmapped clip resblock param {'/'.join(ns)}")


def convert_clip_vision(sd: Mapping[str, np.ndarray], params: Any,
                        prefix: str = "visual.") -> Any:
    """Fill ClipVisionEncoder params from a CLIP checkpoint's ``visual.*``
    entries (model.py VisualTransformer:201-236)."""
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    filler = _Filler(sd)

    def rule(names, leaf):
        ns = [n for n in names if n != "params"]
        if ns[0] == "conv1":
            return _conv2d(filler.get("conv1.weight"))
        if ns[0] in ("class_embedding", "positional_embedding", "proj"):
            return filler.get(ns[0])
        if ns[0] in ("ln_pre", "ln_post"):
            return filler.get(f"{ns[0]}.{'weight' if ns[-1] == 'scale' else 'bias'}")
        if ns[0].startswith("resblock_"):
            return _clip_resblock(filler, ns)
        raise KeyError(f"unmapped clip vision param {'/'.join(ns)}")

    return filler.fill(params, rule)


# -- MelGAN generator --------------------------------------------------------

def convert_melgan_generator(
    sd: Mapping[str, np.ndarray], params: Any,
    ratios=(8, 8, 2, 2), n_residual_layers: int = 3, prefix: str = "",
) -> Any:
    """Fold weight norm and map the reference's flat ``model.N`` Sequential
    indices onto our named modules (vocoder/modules.py:95-126 layout)."""
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}

    # Sequential index map
    index_of: Dict[str, int] = {"conv_in": 1}
    idx = 2
    for i, _r in enumerate(ratios):
        idx += 1  # LeakyReLU
        index_of[f"up_{i}"] = idx
        idx += 1
        for j in range(n_residual_layers):
            index_of[f"res_{i}_{j}"] = idx
            idx += 1
    idx += 2  # LeakyReLU, ReflectionPad
    index_of["conv_out"] = idx

    def rule(names, leaf_val):
        ns = [n for n in names if n != "params"]
        mod, leaf = ns[0], ns[-1]
        if mod.startswith("res_"):
            seq = index_of[mod]
            sub = ns[1]
            tbase = {
                "conv1": f"model.{seq}.block.2",
                "conv2": f"model.{seq}.block.4",
                "shortcut": f"model.{seq}.shortcut",
            }[sub]
            if leaf == "kernel":
                return _conv1d(fold_weight_norm(sd, tbase))
            return sd[tbase + ".bias"]
        seq = index_of[mod]
        tbase = f"model.{seq}"
        if mod.startswith("up_"):
            if leaf == "kernel":
                return _convtranspose1d(fold_weight_norm(sd, tbase))
            return sd[tbase + ".bias"]
        if leaf == "kernel":
            return _conv1d(fold_weight_norm(sd, tbase))
        return sd[tbase + ".bias"]

    import jax

    def one(path, leaf):
        names = tuple(str(getattr(p, "key", getattr(p, "name", p))) for p in path)
        new = np.asarray(rule(names, leaf), dtype=np.float32)
        if new.shape != leaf.shape:
            raise ValueError(f"melgan shape mismatch at {'/'.join(names)}: {new.shape} vs {leaf.shape}")
        return new

    return jax.tree_util.tree_map_with_path(one, params)


def convert_melgan_discriminator(sd: Mapping[str, np.ndarray], params: Any,
                                 prefix: str = "") -> Any:
    """torch multi-scale ``Discriminator`` (vocoder/modules.py:182-199) ->
    our MelGANDiscriminator tree. Torch layout:
    ``model.disc_{i}.model.layer_0.1`` (Sequential: ReflectionPad, WNConv1d,
    LeakyReLU), ``layer_k.0`` for k in 1..n_layers+1, bare ``layer_{n+2}``.
    Weight norm is folded (plain ``.weight`` accepted too)."""
    import jax

    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    # per-disc layer count: highest layer_k index
    n_top: Dict[str, int] = {}
    for k in sd:
        parts = k.split(".")
        if len(parts) >= 4 and parts[0] == "model" and parts[3].startswith("layer_"):
            n_top[parts[1]] = max(n_top.get(parts[1], 0), int(parts[3][6:]))

    def one(path, leaf):
        names = [str(getattr(p, "key", getattr(p, "name", p))) for p in path
                 if str(getattr(p, "key", getattr(p, "name", p))) != "params"]
        disc, layer, kind = names[0], names[1], names[-1]
        top = n_top[disc]
        k = int(layer[6:])
        sub = "" if k == top else (".1" if k == 0 else ".0")
        tbase = f"model.{disc}.model.{layer}{sub}"
        if kind == "kernel":
            new = _conv1d(fold_weight_norm(sd, tbase))
        else:
            new = sd[tbase + ".bias"]
        new = np.asarray(new, np.float32)
        if new.shape != leaf.shape:
            raise ValueError(f"melgan disc shape mismatch at {disc}/{layer}: "
                             f"{new.shape} vs {leaf.shape}")
        return new

    return jax.tree_util.tree_map_with_path(one, params)


# -- Diffsound Stage-2 transformer ------------------------------------------

def convert_diffusion(sd: Mapping[str, np.ndarray], params: Any,
                      prefix: str = "transformer.") -> Any:
    """Fill DiscreteDiffusion params from a Stage-2 checkpoint's
    DiffusionTransformer entries. ``prefix`` strips the DALLE attribute path."""
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    filler = _Filler(sd)

    def rule(names, leaf_val):
        ns = [n for n in names if n != "params"]
        assert ns[0] == "backbone", ns
        ns = ns[1:]
        leaf = ns[-1]
        if ns[0] == "content_emb":
            sub = ns[1]
            return filler.get(f"transformer.content_emb.{sub}.weight")
        if ns[0] == "norm_out":
            return filler.get(f"transformer.to_logits.0.{'weight' if leaf == 'scale' else 'bias'}")
        if ns[0] == "head":
            w = filler.get(f"transformer.to_logits.1.{'weight' if leaf == 'kernel' else 'bias'}")
            return _linear(w) if leaf == "kernel" else w
        if ns[0].startswith("block_"):
            i = ns[0].split("_")[1]
            base = f"transformer.blocks.{i}"
            sub = ns[1]
            if sub in ("ln1", "ln1_1"):
                if ns[2] == "emb":  # learned timestep embedding table
                    return filler.get(f"{base}.{sub}.emb.weight")
                w = filler.get(f"{base}.{sub}.linear.{'weight' if leaf == 'kernel' else 'bias'}")
                return _linear(w) if leaf == "kernel" else w
            if sub == "ln2":
                return filler.get(f"{base}.ln2.{'weight' if leaf == 'scale' else 'bias'}")
            if sub in ("attn1", "attn2"):
                proj = ns[2]
                w = filler.get(f"{base}.{sub}.{proj}.{'weight' if leaf == 'kernel' else 'bias'}")
                return _linear(w) if leaf == "kernel" else w
            if sub == "mlp_fc1":
                w = filler.get(f"{base}.mlp.0.{'weight' if leaf == 'kernel' else 'bias'}")
                return _linear(w) if leaf == "kernel" else w
            if sub == "mlp_fc2":
                w = filler.get(f"{base}.mlp.2.{'weight' if leaf == 'kernel' else 'bias'}")
                return _linear(w) if leaf == "kernel" else w
        raise KeyError(f"unmapped diffusion param {'/'.join(ns)}")

    return filler.fill(params, rule)


# -- VGGishish / LPAPS -------------------------------------------------------

# conv positions inside the torch ``features`` Sequential (VGG16, no BN)
_VGG_FEATURE_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


def convert_vggishish(sd: Mapping[str, np.ndarray], params: Any, prefix: str = "") -> Any:
    """Fill VGGishish params from the released classifier checkpoint
    (names ``features.N.{weight,bias}`` + ``classifier.{0,2,4}``). Handles the
    NCHW->NHWC flatten permutation of the first classifier Linear."""
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    filler = _Filler(sd)

    def rule(names, leaf_val):
        ns = [n for n in names if n != "params"]
        mod, leaf = ns[0], ns[-1]
        if mod.startswith("conv_"):
            fi = _VGG_FEATURE_IDX[int(mod.split("_")[1])]
            if leaf == "kernel":
                return _conv2d(filler.get(f"features.{fi}.weight"))
            return filler.get(f"features.{fi}.bias")
        if mod in ("fc1", "fc2", "fc3"):
            ci = {"fc1": 0, "fc2": 2, "fc3": 4}[mod]
            if leaf == "bias":
                return filler.get(f"classifier.{ci}.bias")
            w = filler.get(f"classifier.{ci}.weight")
            if mod == "fc1":
                # torch flattens (C=512, 5, 10) C-major; ours flattens (5, 10, C)
                w = w.reshape(-1, 512, 5, 10).transpose(0, 2, 3, 1).reshape(w.shape[0], -1)
            return _linear(w)
        raise KeyError(f"unmapped vggishish param {'/'.join(ns)}")

    return filler.fill(params, rule)


def convert_lpaps(lin_path_or_sd, params: Any, vgg_sd: Mapping[str, np.ndarray] | None = None,
                  stats: np.ndarray | None = None) -> Any:
    """Fill LPAPS params from the released artifacts:

    * ``lin_vgg.pth`` — lin heads (``lin{i}.model.1.weight`` (1,C,1,1)),
      scaling buffers when present, and (in some releases) the vggish features
      under ``net.slice{s}.{featidx}.*``;
    * optional separate vggishish classifier state dict (``vgg_sd``);
    * optional ``stats`` (n_mels, 2) mean/std in [0,1] domain
      (``vggishish_mean_std_melspec_10s_22050hz`` file) -> shift=2m-1, scale=2s.
    """
    if isinstance(lin_path_or_sd, str):
        sd = load_torch_state_dict(lin_path_or_sd)
    else:
        sd = dict(lin_path_or_sd)

    # build a features.N view from net.sliceS.N entries if present
    feat_sd = {}
    for k, v in sd.items():
        if k.startswith("net.slice"):
            idx = k.split(".")[2]
            feat_sd[f"features.{idx}.{k.split('.')[-1]}"] = v
    if vgg_sd:
        for k, v in vgg_sd.items():
            if k.startswith("features."):
                feat_sd[k] = v

    def rule(names, leaf_val):
        ns = [n for n in names if n != "params"]
        mod = ns[0]
        if mod == "shift" or mod == "scale":
            if stats is not None:
                means, stds = np.asarray(stats, np.float64).T
                return (2 * means - 1 if mod == "shift" else 2 * stds).astype(np.float32)
            key = f"scaling_layer.{mod}"
            if key in sd:
                return sd[key].reshape(-1)
            raise KeyError(f"no scaling stats for {mod} (pass stats=...)")
        if mod.startswith("lin"):
            i = int(mod[3:])
            for cand in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
                if cand in sd:
                    return sd[cand].reshape(sd[cand].shape[1], 1)
            raise KeyError(f"missing lin head {i}")
        if mod == "net":
            sub = ns[1]
            fi = _VGG_FEATURE_IDX[int(sub.split("_")[1])]
            if ns[-1] == "kernel":
                return _conv2d(feat_sd[f"features.{fi}.weight"])
            return feat_sd[f"features.{fi}.bias"]
        raise KeyError(f"unmapped lpaps param {'/'.join(ns)}")

    import jax

    def one(path, leaf):
        names = tuple(str(getattr(p, "key", getattr(p, "name", p))) for p in path)
        new = np.asarray(rule(names, leaf), np.float32)
        if new.shape != leaf.shape:
            raise ValueError(f"lpaps shape mismatch at {'/'.join(names)}: {new.shape} vs {leaf.shape}")
        return new

    return jax.tree_util.tree_map_with_path(one, params)


# -- Melception (torchvision Inception3, eval-mode BN folded) ----------------

def convert_melception(sd: Mapping[str, np.ndarray], params: Any, prefix: str = "",
                       bn_eps: float = 1e-3) -> Any:
    """Fill Melception params from the released melception checkpoint
    (``ckpt['model']`` with torchvision Inception3 names). Eval-mode BatchNorm
    is folded: scale = gamma/sqrt(var+eps), shift = beta - mean*scale."""
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    filler = _Filler(sd)

    def rule(names, leaf_val):
        ns = [n for n in names if n != "params"]
        leaf = ns[-1]
        if ns[0] == "fc_kernel":
            return _linear(filler.get("fc.weight"))
        if ns[0] == "fc_bias":
            return filler.get("fc.bias")
        base = ".".join(ns[:-1])
        if leaf == "kernel":  # inside a BasicConv2d named ".../conv"
            assert ns[-2] == "conv"
            return _conv2d(filler.get(base + ".weight"))
        if leaf in ("bn_scale", "bn_shift"):
            bnb = base + ".bn" if base else "bn"
            gamma = filler.get(bnb + ".weight")
            beta = filler.get(bnb + ".bias")
            mean = filler.get(bnb + ".running_mean")
            var = filler.get(bnb + ".running_var")
            scale = gamma / np.sqrt(var + bn_eps)
            return scale if leaf == "bn_scale" else beta - mean * scale
        raise KeyError(f"unmapped melception param {'/'.join(ns)}")

    return filler.fill(params, rule)


# -- full Stage-2 checkpoint -------------------------------------------------

def convert_diffsound_checkpoint(path: str, model, params_template: dict,
                                 prefer_ema: bool = True) -> dict:
    """Released Diffsound ``.pth`` -> {'codec', 'cond', 'diffusion'} trees.

    The file contains the whole DALLE state (content_codec.*, transformer.*
    incl. the frozen CLIP condition_emb). Inference prefers EMA weights for the
    transformer (generate_samples_batch.py:82-86).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    model_sd = {k: v.detach().to(torch.float32).numpy()
                for k, v in ckpt["model"].items() if hasattr(v, "detach")}
    out = dict(params_template)
    out["codec"] = convert_vqgan(model_sd, params_template["codec"], prefix="content_codec.")
    out["cond"] = convert_clip_text(model_sd, params_template["cond"],
                                    prefix="transformer.condition_emb.")
    diff_sd = model_sd
    if prefer_ema and "ema" in ckpt and ckpt["ema"]:
        ema_sd = {k: v.detach().to(torch.float32).numpy()
                  for k, v in ckpt["ema"].items() if hasattr(v, "detach")}
        # the EMA tracks only the DiffusionTransformer (dalle_spec.py:68-69);
        # its keys are unprefixed relative to DALLE.transformer
        diff_sd = dict(model_sd)
        for k, v in ema_sd.items():
            diff_sd["transformer." + k] = v
    out["diffusion"] = convert_diffusion(diff_sd, params_template["diffusion"],
                                         prefix="transformer.")
    return out
