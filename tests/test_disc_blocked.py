"""Exactness of the blocked-F (frequency space-to-depth) MS-STFT disc path.

BLOCKED_F=True reruns the conv tower with adjacent F-bin pairs folded into
channels (C 32->64) so the convs contract over a denser dim on the MXU
(motivation: artifacts/trace_train_b64_r5.json — the tower is 56% of the
B=64 train step). Contract:
  * logits equal the plain path to fp tolerance,
  * blocked fmaps reconstruct the plain fmaps exactly (unscale+unblock+slice),
  * mean(|r - f|) over fmap pairs — the only way the losses consume fmaps —
    equals the plain path's value.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import funcodec_tpu.models.discriminators as D


@pytest.fixture
def disc_and_params():
    disc = D.MultiScaleSTFTDiscriminator(filters=32)
    params = disc.init(jax.random.PRNGKey(0))
    return disc, params


def _run(disc, params, x, blocked, n=2):
    old, old_n = D.BLOCKED_F, D.BLOCK_F_N
    D.BLOCKED_F, D.BLOCK_F_N = blocked, n
    try:
        return disc(params, x)
    finally:
        D.BLOCKED_F, D.BLOCK_F_N = old, old_n


def _unblock(fb, plain):
    """Invert the blocked-fmap convention against the plain fmap's shape."""
    B, T, f_log, co = plain.shape
    gb = fb.shape[2]
    n = fb.shape[3] // co
    scale = (n * gb) / f_log
    fb = (fb / scale).reshape(B, T, n * gb, co)[:, :, :f_log]
    return fb


@pytest.mark.parametrize("n", [2, 3, 4])
def test_blocked_logits_and_fmaps_match_plain(disc_and_params, n):
    disc, params = disc_and_params
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16000), jnp.float32) * 0.1

    outs_p = _run(disc, params, x, blocked=False)
    outs_b = _run(disc, params, x, blocked=True, n=n)
    assert len(outs_p) == len(outs_b) == 3
    for (lp, fp), (lb, fb) in zip(outs_p, outs_b):
        np.testing.assert_allclose(lp, lb, rtol=2e-4, atol=2e-5)
        assert len(fp) == len(fb) == 5
        for p, b in zip(fp, fb):
            np.testing.assert_allclose(_unblock(b, p), p, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("n", [2, 4])
def test_blocked_fmap_means_match_losses(disc_and_params, n):
    """mean(|r-f|) per fmap — the feat-match/PIT consumption — is exact."""
    disc, params = disc_and_params
    rng = np.random.RandomState(1)
    real = jnp.asarray(rng.randn(2, 16000), jnp.float32) * 0.1
    fake = jnp.asarray(rng.randn(2, 16000), jnp.float32) * 0.1

    def fmap_means(blocked):
        ro = _run(disc, params, real, blocked, n=n)
        fo = _run(disc, params, fake, blocked, n=n)
        means = []
        for (_, rf), (_, ff) in zip(ro, fo):
            for r, f in zip(rf, ff):
                means.append(float(jnp.mean(jnp.abs(r - f))))
        return np.asarray(means)

    np.testing.assert_allclose(fmap_means(True), fmap_means(False), rtol=3e-4)


def test_blocked_under_jit_and_grad(disc_and_params):
    """The path is jittable and its hinge-loss grads match the plain path."""
    disc, params = disc_and_params
    x = jnp.asarray(np.random.RandomState(2).randn(2, 8000), jnp.float32) * 0.1

    def loss(params, x, blocked):
        old = D.BLOCKED_F
        D.BLOCKED_F = blocked
        try:
            outs = disc(params, x)
        finally:
            D.BLOCKED_F = old
        return sum(jnp.mean(jax.nn.relu(1.0 - l)) for l, _ in outs)

    lp, gp = jax.value_and_grad(lambda p: loss(p, x, False))(params)
    lb, gb = jax.jit(jax.value_and_grad(lambda p: loss(p, x, True)))(params)
    np.testing.assert_allclose(lp, lb, rtol=2e-4, atol=1e-6)
    flat_p = jax.tree_util.tree_leaves(gp)
    flat_b = jax.tree_util.tree_leaves(gb)
    for a, b in zip(flat_p, flat_b):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=2e-5)


def test_blocked_kernel_widths():
    """The static kernel rewrite hits the derived widths/pads."""
    w = jnp.asarray(np.random.RandomState(3).randn(3, 9, 32, 32), jnp.float32)
    wb, pbl, kbp_max = D._block2_kernel(w, stride_f=2, pf=4)
    assert wb.shape == (3, 6, 64, 64) and (pbl, kbp_max) == (2, 3)
    wb, pbl, kbp_max = D._block2_kernel(w, stride_f=1, pf=4)
    assert wb.shape == (3, 5, 64, 64) and (pbl, kbp_max) == (2, 2)
    w3 = jnp.asarray(np.random.RandomState(4).randn(3, 3, 32, 32), jnp.float32)
    wb, pbl, kbp_max = D._block2_kernel(w3, stride_f=1, pf=1)
    assert wb.shape == (3, 3, 64, 64) and (pbl, kbp_max) == (1, 1)
    # block-4: (3,9) kernels contract over 4*32 = 128 channels (full MXU lanes)
    wb, pbl, kbp_max = D._blockn_kernel(w, stride_f=2, pf=4, n=4)
    assert wb.shape[0] == 3 and wb.shape[2:] == (128, 128)
    wb, pbl, kbp_max = D._blockn_kernel(w, stride_f=1, pf=4, n=4)
    assert wb.shape[2:] == (128, 128)


def test_blocked_full_gan_step_matches_plain():
    """3 real shared GAN steps (tiny topology): trajectories with BLOCKED_F
    on/off must agree to fp tolerance — the flag changes layout, not math."""
    from funcodec_tpu.models.encodec import Encodec, EncodecConfig
    from funcodec_tpu.models.quantizer import Quantizer, QuantizerConfig
    from funcodec_tpu.models.seanet import (
        SEANetConfig, SEANetDecoder, SEANetEncoder,
    )
    from funcodec_tpu.train.step import (
        create_gan_train_state, make_gan_train_step, make_optimizer,
    )

    seanet = SEANetConfig(
        n_filters=4, dimension=16, ratios=(4, 2), norm="time_group_norm"
    )
    model = Encodec(
        EncodecConfig(odim=16, multi_spectral_window_powers_of_two=(5, 6)),
        SEANetEncoder(seanet),
        Quantizer(QuantizerConfig(
            input_size=16, codebook_size=32, num_quantizers=4,
            sampling_rate=16000, encoder_hop_length=8,
        )),
        SEANetDecoder(seanet),
    )
    disc = D.MultiScaleSTFTDiscriminator(
        filters=4, n_ffts=(256,), hop_lengths=(64,), win_lengths=(256,)
    )
    speech = jnp.asarray(
        np.random.RandomState(0).randn(2, 1024).astype(np.float32) * 0.3
    )

    def run(blocked):
        old = D.BLOCKED_F
        D.BLOCKED_F = blocked
        try:
            params, rvq_state = model.init(jax.random.PRNGKey(0))
            disc_params = disc.init(jax.random.PRNGKey(1))
            opt_g, opt_d = make_optimizer(lr=1e-3), make_optimizer(lr=1e-3)
            state = create_gan_train_state(
                params, disc_params, rvq_state, opt_g, opt_d)
            step = jax.jit(make_gan_train_step(
                model, disc, opt_g, opt_d, shared_forward=True))
            trail = []
            for _ in range(3):
                state, stats = step(state, {"speech": speech},
                                    jax.random.PRNGKey(7))
                trail.append(jax.device_get(stats))
            return state, trail
        finally:
            D.BLOCKED_F = old

    s_p, t_p = run(False)
    s_b, t_b = run(True)
    # per-step fp reassociation (~1e-7) compounds through optimizer updates;
    # after 3 steps stats agree to ~1e-3 relative
    for a, b in zip(t_p, t_b):
        for k in a:
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]), rtol=2e-3, atol=1e-4,
                err_msg=f"stat {k} diverged under BLOCKED_F",
            )
    # adam normalizes updates, so a ~1e-7 grad reassociation diff can move a
    # tiny-magnitude leaf by ~lr; 2e-2 still catches any layout/indexing bug
    # (those produce O(1) divergence immediately)
    for x, y in zip(jax.tree_util.tree_leaves(s_p.params),
                    jax.tree_util.tree_leaves(s_b.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-2, atol=2e-4)
