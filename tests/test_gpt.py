"""AR baseline tests: cached decode == full forward, fused sampler, Net2Net."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text_to_sound_synthesis_tpu.models.gpt import GPT, GPTFeats, Net2NetTransformer, ar_sample

GCFG = dict(vocab_size=12, block_size=18, n_layer=2, n_head=2, n_embd=16)


@pytest.fixture(scope="module")
def gpt_setup():
    model = GPT(**GCFG)
    idx = jnp.zeros((2, 5), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), idx)
    return model, params


def test_gpt_forward_shapes(gpt_setup, rng):
    model, params = gpt_setup
    idx = jnp.asarray(rng.integers(0, 12, (2, 7)), jnp.int32)
    emb = jnp.asarray(rng.standard_normal((2, 2, 16)), jnp.float32)
    out = model.apply(params, idx, emb)
    assert out.shape == (2, 9, 12)


def test_cached_decode_matches_full_forward(gpt_setup, rng):
    """KV-cache path must reproduce the full causal forward exactly."""
    model, params = gpt_setup
    T = 9
    idx = jnp.asarray(rng.integers(0, 12, (2, T)), jnp.int32)
    full = np.asarray(model.apply(params, idx))

    cache = model.apply(params, 2, method=model.init_cache)
    outs = []
    for t in range(T):
        logits, cache = model.apply(params, idx[:, t], cache, t, method=model.decode_token)
        outs.append(np.asarray(logits))
    stepped = np.stack(outs, axis=1)
    np.testing.assert_allclose(stepped, full, atol=2e-5)


def test_cached_decode_with_cond_prefix(gpt_setup, rng):
    model, params = gpt_setup
    emb = jnp.asarray(rng.standard_normal((2, 3, 16)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 12, (2, 4)), jnp.int32)
    full = np.asarray(model.apply(params, idx, emb))  # (2, 7, 12)

    cache = model.apply(params, 2, method=model.init_cache)
    outs = []
    for t in range(3):
        logits, cache = model.apply(params, emb[:, t : t + 1], cache, t,
                                    method=model.decode_embedded)
        outs.append(np.asarray(logits))
    for t in range(4):
        logits, cache = model.apply(params, idx[:, t], cache, 3 + t, method=model.decode_token)
        outs.append(np.asarray(logits))
    np.testing.assert_allclose(np.stack(outs, 1), full, atol=2e-5)


def test_ar_sample_shapes_and_support(rng):
    model = GPTFeats(
        feat_embedding_config={"target": "torch.nn.Conv1d",
                               "params": {"in_channels": 8, "out_channels": 16, "kernel_size": 1}},
        GPT_config=GCFG,
    )
    feats = jnp.asarray(rng.standard_normal((2, 8, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 4), jnp.int32), feats)
    tokens = ar_sample(model, params, jax.random.PRNGKey(1), feats, steps=10, top_k=5)
    assert tokens.shape == (2, 10)
    arr = np.asarray(tokens)
    assert ((arr >= 0) & (arr < 12)).all()


def test_ar_sample_jittable(rng):
    model = GPTFeats(
        feat_embedding_config={"target": "torch.nn.Conv1d",
                               "params": {"in_channels": 8, "out_channels": 16, "kernel_size": 1}},
        GPT_config=GCFG,
    )
    feats = jnp.asarray(rng.standard_normal((1, 8, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32), feats)

    @jax.jit
    def run(params, key, feats):
        return ar_sample(model, params, key, feats, steps=8, top_k=3)

    out = run(params, jax.random.PRNGKey(0), feats)
    assert out.shape == (1, 8)


@pytest.mark.slow
def test_net2net_loss_and_sample(rng):
    model = Net2NetTransformer(
        transformer_config={"params": {
            "feat_embedding_config": {"target": "torch.nn.Conv1d",
                                      "params": {"in_channels": 8, "out_channels": 16, "kernel_size": 1}},
            "GPT_config": dict(vocab_size=10, block_size=17, n_layer=1, n_head=2, n_embd=16),
        }},
        first_stage_config={
            "target": "text_to_sound_synthesis_tpu.models.vqgan.VQModel",
            "params": {"embed_dim": 16, "n_embed": 10,
                       "ddconfig": dict(double_z=False, z_channels=16, resolution=16,
                                        in_channels=1, out_ch=1, ch=8, ch_mult=[1, 2],
                                        num_res_blocks=1, attn_resolutions=[8], dropout=0.0)},
        },
        first_stage_permuter_config={
            "target": "text_to_sound_synthesis_tpu.ops.permuter.ColumnMajor",
            "params": {"H": 2, "W": 8},
        },
    )
    params = model.init_params(jax.random.PRNGKey(0), mel_shape=(1, 4, 16, 1),
                               cond_shape=(1, 8, 1))
    mel = jnp.asarray(rng.standard_normal((2, 4, 16, 1)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((2, 8, 1)), jnp.float32)
    loss, logits = model.loss(params, mel, cond)
    assert np.isfinite(float(loss))
    assert logits.shape == (2, 16, 10)

    out = model.sample(params, jax.random.PRNGKey(1), cond, hw=(2, 8), top_k=3)
    assert out.shape == (2, 4, 16, 1)


# -- conditioned-variant completeness (mingpt.py:263-349) ---------------------

def test_rnn_embedder_lstm_torch_parity(rng):
    """RNNEmbedder(kind=lstm) + convert_rnn_embedder == torch.nn.LSTM."""
    import torch

    from text_to_sound_synthesis_tpu.convert.torch_to_jax import convert_rnn_embedder
    from text_to_sound_synthesis_tpu.models.gpt import RNNEmbedder

    torch.manual_seed(0)
    ref = torch.nn.LSTM(input_size=8, hidden_size=16, num_layers=2, batch_first=True)
    x = rng.standard_normal((3, 6, 8)).astype(np.float32)
    with torch.no_grad():
        want, _ = ref(torch.from_numpy(x))

    model = RNNEmbedder(hidden_size=16, num_layers=2, kind="lstm")
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 8)))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_rnn_embedder(sd, params, kind="lstm")
    got = model.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


def test_rnn_embedder_gru_torch_parity(rng):
    import torch

    from text_to_sound_synthesis_tpu.convert.torch_to_jax import convert_rnn_embedder
    from text_to_sound_synthesis_tpu.models.gpt import RNNEmbedder

    torch.manual_seed(1)
    ref = torch.nn.GRU(input_size=5, hidden_size=12, num_layers=1, batch_first=True)
    x = rng.standard_normal((2, 7, 5)).astype(np.float32)
    with torch.no_grad():
        want, _ = ref(torch.from_numpy(x))

    model = RNNEmbedder(hidden_size=12, num_layers=1, kind="gru")
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 5)))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_rnn_embedder(sd, params, kind="gru")
    got = model.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


def test_gptfeats_lstm_embedder_forward_and_sample(rng):
    model = GPTFeats(
        feat_embedding_config={"target": "torch.nn.LSTM",
                               "params": {"input_size": 8, "hidden_size": 16,
                                          "num_layers": 1}},
        GPT_config=GCFG,
    )
    feats = jnp.asarray(rng.standard_normal((2, 8, 3)), jnp.float32)
    idx = jnp.zeros((2, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), idx, feats)
    logits = model.apply(params, idx, feats)
    assert logits.shape == (2, 3 + 4, 12)
    tokens = ar_sample(model, params, jax.random.PRNGKey(1), feats, steps=6, top_k=4)
    assert tokens.shape == (2, 6)


def test_gptfeatsclass_forward_and_sample(rng):
    """GPTFeatsClass: prefix = concat(feat emb, class emb) (mingpt.py:306-349)."""
    from text_to_sound_synthesis_tpu.models.gpt import GPTFeatsClass

    model = GPTFeatsClass(
        feat_embedding_config={"target": "torch.nn.Conv1d",
                               "params": {"in_channels": 8, "out_channels": 16,
                                          "kernel_size": 1}},
        token_embedding_config={"params": {"num_embeddings": 5, "features": 16}},
        GPT_config=GCFG,
    )
    cond = {"feature": jnp.asarray(rng.standard_normal((2, 8, 3)), jnp.float32),
            "target": jnp.asarray([[1], [4]], jnp.int32)}
    idx = jnp.zeros((2, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), idx, cond)
    logits = model.apply(params, idx, cond)
    # prefix length = T_feat + 1 class token
    assert logits.shape == (2, 3 + 1 + 4, 12)

    emb = model.apply(params, cond, method=model.embed_feats)
    assert emb.shape == (2, 4, 16)
    # tuple form (jit-friendly) matches the dict form
    emb2 = model.apply(params, (cond["feature"], cond["target"]),
                       method=model.embed_feats)
    np.testing.assert_allclose(np.asarray(emb), np.asarray(emb2))

    tokens = ar_sample(model, params, jax.random.PRNGKey(1), cond, steps=5, top_k=4)
    assert tokens.shape == (2, 5)


def test_prefill_matches_full_forward_with_n_unmasked(rng):
    """n_unmasked > 1 (the reference GPTFeats convention): prefix queries
    attend to FUTURE prefix keys, which sequential decode_step can never
    reproduce — decode_prefix must batch-prefill with the training mask and
    hand over a cache that continues identically to the full forward."""
    Tc = 3
    model = GPT(vocab_size=12, block_size=18, n_layer=2, n_head=2, n_embd=16,
                n_unmasked=Tc)
    emb = jnp.asarray(rng.standard_normal((2, Tc, 16)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 12, (2, 4)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), idx[:, :1])
    full = np.asarray(model.apply(params, idx, emb))  # (2, Tc+4, 12)

    cache = model.apply(params, 2, method=model.init_cache)
    logits, cache = model.apply(params, emb, cache, method=model.decode_prefix)
    outs = [np.asarray(logits)]  # logits at prefix position Tc-1
    for t in range(4):
        logits, cache = model.apply(params, idx[:, t], cache, Tc + t,
                                    method=model.decode_token)
        outs.append(np.asarray(logits))
    np.testing.assert_allclose(np.stack(outs, 1), full[:, Tc - 1:], atol=2e-5)

    # and the n_unmasked=0 prefill is equivalent to the old sequential path
    model0 = GPT(**GCFG)
    params0 = model0.init(jax.random.PRNGKey(0), idx[:, :1])
    full0 = np.asarray(model0.apply(params0, idx, emb))
    cache0 = model0.apply(params0, 2, method=model0.init_cache)
    lg, cache0 = model0.apply(params0, emb, cache0, method=model0.decode_prefix)
    np.testing.assert_allclose(np.asarray(lg), full0[:, Tc - 1], atol=2e-5)


def test_net2net_pkeep_token_corruption(rng):
    """pkeep < 1 (reference cond_transformer.py): input tokens are corrupted
    during training while targets stay clean — loss must differ from the
    clean-input loss and require a key."""
    from tests.test_gpt import GCFG  # self-import safe under pytest

    ddconfig = dict(double_z=False, z_channels=8, resolution=16, in_channels=1,
                    out_ch=1, ch=8, ch_mult=[1, 2], num_res_blocks=1,
                    attn_resolutions=[], dropout=0.0)
    common = dict(
        transformer_config={"params": {
            "feat_embedding_config": {
                "target": "torch.nn.Conv1d",
                "params": {"in_channels": 8, "out_channels": 16,
                           "kernel_size": 1}},
            "GPT_config": dict(vocab_size=10, block_size=40, n_layer=1,
                               n_head=2, n_embd=16),
        }},
        first_stage_config={"target":
                            "text_to_sound_synthesis_tpu.models.vqgan.VQModel",
                            "params": dict(ddconfig=ddconfig, n_embed=10,
                                           embed_dim=8)},
    )
    clean = Net2NetTransformer(**common, pkeep=1.0)
    corrupt = Net2NetTransformer(**common, pkeep=0.3)
    mel = jnp.asarray(rng.standard_normal((2, 8, 16, 1)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((2, 8, 3)), jnp.float32)
    params = clean.init_params(jax.random.PRNGKey(0), mel_shape=(1, 8, 16, 1),
                               cond_shape=(1, 8, 3))

    l_clean, _ = clean.loss(params, mel, feats)
    with pytest.raises(ValueError):
        corrupt.loss(params, mel, feats)
    l_a, _ = corrupt.loss(params, mel, feats, key=jax.random.PRNGKey(1))
    l_b, _ = corrupt.loss(params, mel, feats, key=jax.random.PRNGKey(2))
    assert float(l_a) != float(l_clean)
    assert float(l_a) != float(l_b)  # corruption is key-dependent
