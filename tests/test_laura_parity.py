"""LauraGenModel parity vs the PyTorch reference + KV-cache decode checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from funcodec_tpu.compat.torch_import import import_laura
from funcodec_tpu.models.laura import LauraConfig, LauraGenModel
from funcodec_tpu.models.transformer import TransformerConfig


def _build_pair(torch, predict_nq=2, sampling_ratio=0.0):
    """Matching (reference torch model, our model, imported params)."""
    from funcodec.models.encoder.conformer_encoder import ConformerEncoder
    from funcodec.models.audio_generation.laura_model import LauraGenModel as RefLaura

    input_size = 20
    att = 32
    cb_dim = 16
    enc_kw = dict(
        output_size=att, attention_heads=4, linear_units=48, num_blocks=2,
        dropout_rate=0.0, positional_dropout_rate=0.0, attention_dropout_rate=0.0,
        input_layer="linear", normalize_before=True, rel_pos_type="latest",
        pos_enc_layer_type="rel_pos", selfattention_layer_type="rel_selfattn",
        use_cnn_module=False,
    )
    text_enc = ConformerEncoder(input_size=input_size, **enc_kw)
    codec_enc = ConformerEncoder(input_size=cb_dim, **enc_kw)
    ref = RefLaura(
        input_size=input_size,
        text_encoder=text_enc,
        codec_encoder=codec_enc,
        codec_conf=dict(num_quantizers=8, codebook_size=1024, codebook_dim=cb_dim),
        codec_lm_conf=dict(
            name="transformer", pos_enc="rel_pos",
            selfattention_layer_type="rel_selfattn",
            embed_unit=cb_dim, att_unit=att, head=4, unit=48, layer=2,
            dropout_rate=0.0, pe_type="uni", bidirectional_inputs=True,
            codec_groups=1,
        ),
        codec_sampling_ratio=sampling_ratio,
        lsm_weight=0.0,
        length_normalized_loss=True,
        predict_nq=predict_nq,
    ).eval()
    # give the frozen codebooks real values
    import torch as _t

    with _t.no_grad():
        ref.quantizer_codebook.embed.normal_(0, 0.5)

    cfg = LauraConfig(
        input_size=input_size, num_quantizers=8, codebook_size=1024,
        codebook_dim=cb_dim, predict_nq=predict_nq,
        codec_sampling_ratio=sampling_ratio, lsm_weight=0.0,
    )
    enc_cfg = TransformerConfig(
        input_size=input_size, attention_dim=att, attention_heads=4,
        linear_units=48, num_blocks=2, input_layer="linear",
        pos_enc_type="rel_pos", activation="swish",
    )
    codec_enc_cfg = TransformerConfig(
        input_size=cb_dim, attention_dim=att, attention_heads=4,
        linear_units=48, num_blocks=2, input_layer="linear",
        pos_enc_type="rel_pos", activation="swish",
    )
    lm_cfg = TransformerConfig(
        input_size=cb_dim, attention_dim=att, attention_heads=4,
        linear_units=48, num_blocks=2, input_layer="linear_relu",
        pos_enc_type="rel_pos",
    )
    model = LauraGenModel(cfg, enc_cfg, codec_enc_cfg, lm_cfg)
    params = import_laura(ref.state_dict(), model)
    return ref, model, params


def test_laura_forward_parity(torch):
    ref, model, params = _build_pair(torch)
    B, Lt, Lc = 2, 6, 10
    text = torch.randn(B, Lt, 20)
    text_lengths = torch.tensor([6, 4])
    codec = torch.randint(0, 1024, (B, Lc, 8))
    codec_lengths = torch.tensor([10, 7])

    with torch.no_grad():
        loss_ref, stats_ref, _ = ref(text, text_lengths, codec, codec_lengths)

    loss, stats = model.forward(
        params,
        jnp.asarray(text.numpy()),
        jnp.asarray(text_lengths.numpy()),
        jnp.asarray(codec.numpy()),
        jnp.asarray(codec_lengths.numpy()),
        jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=2e-4)
    np.testing.assert_allclose(
        float(stats["nll_loss"]), float(stats_ref["nll_loss"]), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(stats["reg_loss"]), float(stats_ref["reg_loss"]), rtol=2e-4
    )
    for i in (1, 2):
        np.testing.assert_allclose(
            float(stats[f"out_acc_{i}"]), float(stats_ref[f"out_acc_{i}"]), atol=1e-6
        )


def test_laura_decode_matches_reference_greedy(torch):
    """Greedy KV-cache decode == the reference's full-recompute decode."""
    ref, model, params = _build_pair(torch)
    Lt = 5
    text = torch.randn(1, Lt, 20)
    text_lengths = torch.tensor([Lt])

    with torch.no_grad():
        ref_tokens = ref.decode_codec(
            ref.encode(text, text_lengths)[0], text_lengths,
            max_length=12, sampling=False,
        ).numpy()

    tokens = model.decode_codec(
        params,
        jnp.asarray(text.numpy()),
        jnp.asarray(text_lengths.numpy()),
        max_length=12,
        sampling=False,
        key=jax.random.PRNGKey(0),
    )
    assert tokens.shape == ref_tokens.shape, (tokens.shape, ref_tokens.shape)
    np.testing.assert_array_equal(tokens, ref_tokens)


def test_laura_decode_continual(torch):
    """Continual (zero-shot prompt) mode produces a prefix-preserving output."""
    ref, model, params = _build_pair(torch)
    text = torch.randn(1, 5, 20)
    text_lengths = torch.tensor([5])
    prompt = np.random.RandomState(0).randint(0, 1024, (3, 2)).astype(np.int64)

    tokens = model.decode_codec(
        params,
        jnp.asarray(text.numpy()),
        jnp.asarray(text_lengths.numpy()),
        max_length=8,
        sampling=False,
        continual=prompt,
        key=jax.random.PRNGKey(0),
    )
    assert tokens.shape[2] == 2
    np.testing.assert_array_equal(tokens[0, :3], prompt)

    with torch.no_grad():
        ref_tokens = ref.decode_codec(
            ref.encode(text, text_lengths)[0], text_lengths,
            max_length=8, sampling=False, continual=prompt.tolist(),
        ).numpy()
    np.testing.assert_array_equal(tokens, ref_tokens)


def test_laura_scheduled_sampling_path():
    """codec_sampling_ratio in (0,1) runs and stays finite (random path)."""
    import torch

    ref, model, params = _build_pair(torch, sampling_ratio=0.5)
    loss, stats = model.forward(
        params,
        jnp.asarray(np.random.RandomState(0).randn(2, 4, 20).astype(np.float32)),
        jnp.asarray([4, 3]),
        jnp.asarray(np.random.RandomState(1).randint(0, 1024, (2, 6, 8))),
        jnp.asarray([6, 5]),
        jax.random.PRNGKey(3),
    )
    assert np.isfinite(float(loss))
    g = jax.grad(
        lambda p: model.forward(
            p,
            jnp.asarray(np.random.RandomState(0).randn(2, 4, 20).astype(np.float32)),
            jnp.asarray([4, 3]),
            jnp.asarray(np.random.RandomState(1).randint(0, 1024, (2, 6, 8))),
            jnp.asarray([6, 5]),
            jax.random.PRNGKey(3),
        )[0]
    )(params)
    leaves = [float(jnp.abs(x).max()) for x in jax.tree_util.tree_leaves(g["codec_lm"])]
    assert max(leaves) > 0


def _build_pair_split(torch, predict_nq=2):
    """Pair with the LM in pe_type='split' + sinusoidal abs pos."""
    from funcodec.models.encoder.conformer_encoder import ConformerEncoder
    from funcodec.models.audio_generation.laura_model import LauraGenModel as RefLaura

    input_size, att, cb_dim = 20, 32, 16
    enc_kw = dict(
        output_size=att, attention_heads=4, linear_units=48, num_blocks=2,
        dropout_rate=0.0, positional_dropout_rate=0.0, attention_dropout_rate=0.0,
        input_layer="linear", normalize_before=True, rel_pos_type="latest",
        pos_enc_layer_type="rel_pos", selfattention_layer_type="rel_selfattn",
        use_cnn_module=False,
    )
    ref = RefLaura(
        input_size=input_size,
        text_encoder=ConformerEncoder(input_size=input_size, **enc_kw),
        codec_encoder=ConformerEncoder(input_size=cb_dim, **enc_kw),
        codec_conf=dict(num_quantizers=8, codebook_size=1024, codebook_dim=cb_dim),
        codec_lm_conf=dict(
            name="transformer", pos_enc="sinusoidal",
            selfattention_layer_type="selfattn",
            embed_unit=cb_dim, att_unit=att, head=4, unit=48, layer=2,
            dropout_rate=0.0, pe_type="split", bidirectional_inputs=True,
            codec_groups=1,
        ),
        codec_sampling_ratio=0.0, lsm_weight=0.0,
        length_normalized_loss=True, predict_nq=predict_nq,
    ).eval()
    import torch as _t

    with _t.no_grad():
        ref.quantizer_codebook.embed.normal_(0, 0.5)

    cfg = LauraConfig(
        input_size=input_size, num_quantizers=8, codebook_size=1024,
        codebook_dim=cb_dim, predict_nq=predict_nq, lsm_weight=0.0,
        lm_pe_type="split",
    )
    enc_cfg = TransformerConfig(
        input_size=input_size, attention_dim=att, attention_heads=4,
        linear_units=48, num_blocks=2, input_layer="linear",
        pos_enc_type="rel_pos", activation="swish",
    )
    codec_enc_cfg = TransformerConfig(
        input_size=cb_dim, attention_dim=att, attention_heads=4,
        linear_units=48, num_blocks=2, input_layer="linear",
        pos_enc_type="rel_pos", activation="swish",
    )
    lm_cfg = TransformerConfig(
        input_size=att, attention_dim=att, attention_heads=4,
        linear_units=48, num_blocks=2, input_layer="none", pos_enc_type="none",
    )
    model = LauraGenModel(cfg, enc_cfg, codec_enc_cfg, lm_cfg)
    params = import_laura(ref.state_dict(), model)
    return ref, model, params


def test_laura_split_pe_forward_parity(torch):
    ref, model, params = _build_pair_split(torch)
    text = torch.randn(2, 6, 20)
    text_lengths = torch.tensor([6, 4])
    codec = torch.randint(0, 1024, (2, 10, 8))
    codec_lengths = torch.tensor([10, 7])
    with torch.no_grad():
        loss_ref, stats_ref, _ = ref(text, text_lengths, codec, codec_lengths)
    loss, stats = model.forward(
        params,
        jnp.asarray(text.numpy()), jnp.asarray(text_lengths.numpy()),
        jnp.asarray(codec.numpy()), jnp.asarray(codec_lengths.numpy()),
        jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=3e-4)
    np.testing.assert_allclose(
        float(stats["nll_loss"]), float(stats_ref["nll_loss"]), rtol=3e-4
    )


def test_laura_split_pe_decode_parity(torch):
    ref, model, params = _build_pair_split(torch)
    text = torch.randn(1, 5, 20)
    text_lengths = torch.tensor([5])
    with torch.no_grad():
        ref_tokens = ref.decode_codec(
            ref.encode(text, text_lengths)[0], text_lengths,
            max_length=10, sampling=False,
        ).numpy()
    tokens = model.decode_codec(
        params, jnp.asarray(text.numpy()), jnp.asarray(text_lengths.numpy()),
        max_length=10, sampling=False, key=jax.random.PRNGKey(0),
    )
    np.testing.assert_array_equal(tokens, ref_tokens)


def test_laura_lm_input_aug():
    """input_aug/output_aug/input_normalize on the LM inputs: finite loss,
    gradients still flow, and the loss differs from the un-augmented run
    (transformer_lm.py:216-236)."""
    import torch

    ref, model, params = _build_pair(torch)
    aug_conf = dict(
        apply_freq_mask=True, freq_mask_width_range=(0, 4), num_freq_mask=1,
        apply_time_mask=True, time_mask_width_range=(1, 3), num_time_mask=1,
    )
    aug_model = LauraGenModel(
        model.cfg, model.text_encoder_cfg, model.codec_encoder_cfg,
        model.codec_lm_cfg,
        input_aug_conf=aug_conf, output_aug_conf=aug_conf, input_normalize=True,
    )
    args = (
        jnp.asarray(np.random.RandomState(0).randn(2, 4, 20).astype(np.float32)),
        jnp.asarray([4, 3]),
        jnp.asarray(np.random.RandomState(1).randint(0, 1024, (2, 6, 8))),
        jnp.asarray([6, 5]),
    )
    loss_plain, _ = model.forward(params, *args, jax.random.PRNGKey(3))
    loss_aug, stats = aug_model.forward(params, *args, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss_aug))
    assert abs(float(loss_aug) - float(loss_plain)) > 1e-6
    g = jax.grad(
        lambda p: aug_model.forward(p, *args, jax.random.PRNGKey(3))[0]
    )(params)
    for sub in ("codec_lm", "text_encoder"):
        leaves = [float(jnp.abs(x).max()) for x in jax.tree_util.tree_leaves(g[sub])]
        assert max(leaves) > 0, sub


def test_laura_batched_decode_matches_single(torch):
    """decode_codec_batch row-by-row == decode_codec (greedy), with ragged
    text lengths and ragged continual prompts."""
    ref, model, params = _build_pair(torch)
    rng = np.random.RandomState(0)
    texts = [rng.randn(1, L, 20).astype(np.float32) for L in (4, 7, 5)]
    prompts = [
        rng.randint(0, 1024, (n, 2)).astype(np.int64) for n in (2, 0, 4)
    ]

    singles = []
    for t, pr in zip(texts, prompts):
        singles.append(
            model.decode_codec(
                params, jnp.asarray(t), jnp.asarray([t.shape[1]]),
                max_length=10, sampling=False,
                continual=pr if len(pr) else None,
                key=jax.random.PRNGKey(0),
            )[0]
        )

    B, Lmax = len(texts), max(t.shape[1] for t in texts)
    Pmax = max(len(p) for p in prompts)
    text_pad = np.zeros((B, Lmax, 20), np.float32)
    tl = np.zeros((B,), np.int32)
    prompt_pad = np.zeros((B, Pmax, 2), np.int32)
    pl = np.zeros((B,), np.int32)
    for b, (t, pr) in enumerate(zip(texts, prompts)):
        text_pad[b, : t.shape[1]] = t[0]
        tl[b] = t.shape[1]
        prompt_pad[b, : len(pr)] = pr
        pl[b] = len(pr)

    batch_out = model.decode_codec_batch(
        params, jnp.asarray(text_pad), jnp.asarray(tl),
        max_length=10, sampling=False,
        continual=prompt_pad, continual_lengths=pl,
        key=jax.random.PRNGKey(0),
    )
    assert len(batch_out) == B
    for b in range(B):
        np.testing.assert_array_equal(
            batch_out[b], singles[b],
            err_msg=f"row {b} diverged from single decode",
        )
