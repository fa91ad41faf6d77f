"""HiFiGAN generator parity vs the reference implementation."""

import numpy as np

import jax
import jax.numpy as jnp

from funcodec_tpu.models.hifigan_gen import HiFiGANConfig, HiFiGANGenerator
from funcodec_tpu.compat.torch_import import import_hifigan_generator


def test_hifigan_generator_parity(torch):
    from funcodec.models.discriminator.hifigan import HiFiGANGenerator as Ref

    kw = dict(
        in_channels=12, out_channels=1, channels=32,
        kernel_size=7, upsample_scales=[4, 5], upsample_kernel_sizes=[8, 10],
        resblock_kernel_sizes=[3, 5], resblock_dilations=[[1, 3], [1, 3]],
        use_additional_convs=True, use_weight_norm=True,
    )
    ref = Ref(**kw).eval()
    cfg = HiFiGANConfig(
        in_channels=12, out_channels=1, channels=32, kernel_size=7,
        upsample_scales=(4, 5), upsample_kernel_sizes=(8, 10),
        resblock_kernel_sizes=(3, 5), resblock_dilations=((1, 3), (1, 3)),
    )
    model = HiFiGANGenerator(cfg)
    params = import_hifigan_generator(ref.state_dict(), model)

    x = torch.randn(2, 12, 50)
    with torch.no_grad():
        y_ref = ref(x).numpy()  # (B, 1, T*20)
    y = model(params, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    assert y.shape == (2, 50 * 20, 1)
    np.testing.assert_allclose(
        np.asarray(y).transpose(0, 2, 1), y_ref, atol=2e-5, rtol=2e-5
    )


def test_hifigan_generator_init_and_global():
    cfg = HiFiGANConfig(
        in_channels=8, channels=16, upsample_scales=(2, 2),
        upsample_kernel_sizes=(4, 4), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),), global_channels=6,
    )
    model = HiFiGANGenerator(cfg)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 30, 8))
    g = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 6))
    y = model(params, x, g)
    assert y.shape == (2, 120, 1)
    assert np.isfinite(np.asarray(y)).all()
    assert cfg.upsample_factor == 4
