"""Numerical parity of streamable convs vs the PyTorch reference.

Instantiates the reference torch modules (funcodec.modules.normed_modules.conv)
with random weights, imports those weights into our pytrees, and compares
outputs elementwise.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from funcodec_tpu.ops.conv import ConvSpec, apply_conv
from funcodec_tpu.compat.torch_import import import_conv


def _to_jax_1d(x_torch):
    # torch (B, C, T) -> ours (B, T, C)
    return jnp.asarray(x_torch.detach().numpy().transpose(0, 2, 1))


def _from_jax_1d(y):
    return np.asarray(y).transpose(0, 2, 1)


def _to_jax_2d(x_torch):
    # torch (B, C, F, T) -> ours (B, F, T, C)
    return jnp.asarray(x_torch.detach().numpy().transpose(0, 2, 3, 1))


def _from_jax_2d(y):
    return np.asarray(y).transpose(0, 3, 1, 2)


@pytest.mark.parametrize(
    "cin,cout,k,stride,dilation,causal,norm,pad_mode,groups",
    [
        (1, 32, 7, 1, 1, False, "weight_norm", "reflect", 1),
        (32, 64, 16, 8, 1, False, "time_group_norm", "reflect", 1),
        (32, 16, 3, 1, 2, True, "weight_norm", "reflect", 1),
        (64, 64, 1, 1, 1, False, "none", "constant", 1),
        (16, 16, 4, 2, 1, True, "weight_norm", "replicate", 1),
        (32, 32, 3, 1, 1, False, "weight_norm", "reflect", 4),
        (8, 8, 7, 1, 1, False, "time_group_norm", "reflect", 1),
    ],
)
def test_sconv1d_parity(torch, cin, cout, k, stride, dilation, causal, norm, pad_mode, groups):
    from funcodec.modules.normed_modules.conv import SConv1d

    m = SConv1d(
        cin, cout, k, stride=stride, dilation=dilation, groups=groups,
        causal=causal, norm=norm, pad_mode=pad_mode,
    ).eval()
    spec = ConvSpec(
        cin, cout, k, stride=stride, dilation=dilation, groups=groups,
        causal=causal, norm=norm, pad_mode=pad_mode,
    )
    sd = {f"conv.{kk}": vv for kk, vv in m.state_dict().items()}
    params = import_conv(sd, "conv", spec)

    x = torch.randn(2, cin, 95)
    with torch.no_grad():
        y_ref = m(x).numpy()
    y = _from_jax_2d if False else _from_jax_1d
    y_ours = _from_jax_1d(apply_conv(spec, params, _to_jax_1d(x)))
    assert y_ours.shape == y_ref.shape
    np.testing.assert_allclose(y_ours, y_ref, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize(
    "cin,cout,k,stride,causal,norm,trim_right",
    [
        (64, 32, 16, 8, False, "weight_norm", 1.0),
        (64, 32, 16, 8, False, "time_group_norm", 1.0),
        (32, 16, 10, 5, True, "weight_norm", 1.0),
        (32, 16, 8, 4, True, "weight_norm", 0.5),
        (16, 1, 4, 2, False, "none", 1.0),
    ],
)
def test_sconvtranspose1d_parity(torch, cin, cout, k, stride, causal, norm, trim_right):
    from funcodec.modules.normed_modules.conv import SConvTranspose1d

    m = SConvTranspose1d(
        cin, cout, k, stride=stride, causal=causal, norm=norm,
        trim_right_ratio=trim_right,
    ).eval()
    spec = ConvSpec(
        cin, cout, k, stride=stride, causal=causal, norm=norm,
        transposed=True, trim_right_ratio=trim_right,
    )
    sd = {f"t.{kk}": vv for kk, vv in m.state_dict().items()}
    params = import_conv(sd, "t", spec)

    x = torch.randn(2, cin, 33)
    with torch.no_grad():
        y_ref = m(x).numpy()
    y_ours = _from_jax_1d(apply_conv(spec, params, _to_jax_1d(x)))
    assert y_ours.shape == y_ref.shape
    np.testing.assert_allclose(y_ours, y_ref, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize(
    "cin,cout,k,stride,dilation,causal,norm,groups",
    [
        (1, 32, (7, 7), (1, 1), (1, 1), False, "weight_norm", 1),
        (32, 64, (8, 2), (4, 1), (1, 1), False, "weight_norm", 1),
        (32, 32, (3, 3), (1, 1), (1, 2), True, "weight_norm", 1),
        (16, 32, (8, 4), (4, 2), (1, 1), False, "time_group_norm", 4),
    ],
)
def test_sconv2d_parity(torch, cin, cout, k, stride, dilation, causal, norm, groups):
    from funcodec.modules.normed_modules.conv import SConv2d

    m = SConv2d(
        cin, cout, k, stride=stride, dilation=dilation, groups=groups,
        causal=causal, norm=norm,
    ).eval()
    spec = ConvSpec(
        cin, cout, tuple(k), stride=tuple(stride), dilation=tuple(dilation),
        groups=groups, causal=causal, norm=norm,
    )
    sd = {f"c.{kk}": vv for kk, vv in m.state_dict().items()}
    params = import_conv(sd, "c", spec)

    x = torch.randn(2, cin, 17, 50)  # (B, C, F, T)
    with torch.no_grad():
        y_ref = m(x).numpy()
    y_ours = _from_jax_2d(apply_conv(spec, params, _to_jax_2d(x)))
    assert y_ours.shape == y_ref.shape
    np.testing.assert_allclose(y_ours, y_ref, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize(
    "cin,cout,k,stride,causal,out_padding,groups",
    [
        (64, 32, (8, 2), (4, 1), False, 0, 1),
        (32, 16, (8, 4), (4, 2), False, [(0, 1), (0, 0)], 1),
        (32, 16, (4, 2), (2, 1), True, 0, 1),
        (32, 16, (8, 2), (4, 1), False, 0, 4),
    ],
)
def test_sconvtranspose2d_parity(torch, cin, cout, k, stride, causal, out_padding, groups):
    from funcodec.modules.normed_modules.conv import SConvTranspose2d

    m = SConvTranspose2d(
        cin, cout, k, stride=stride, causal=causal, norm="weight_norm",
        out_padding=out_padding, groups=groups,
    ).eval()
    op = ((0, 0), (0, 0)) if out_padding == 0 else tuple(
        (tuple(p) for p in out_padding)
    )
    spec = ConvSpec(
        cin, cout, tuple(k), stride=tuple(stride), causal=causal,
        norm="weight_norm", transposed=True, groups=groups,
        out_padding=(tuple(op[0]), tuple(op[1])),
    )
    sd = {f"t.{kk}": vv for kk, vv in m.state_dict().items()}
    params = import_conv(sd, "t", spec)

    x = torch.randn(2, cin, 5, 30)
    with torch.no_grad():
        y_ref = m(x).numpy()
    y_ours = _from_jax_2d(apply_conv(spec, params, _to_jax_2d(x)))
    assert y_ours.shape == y_ref.shape
    np.testing.assert_allclose(y_ours, y_ref, atol=2e-5, rtol=2e-5)
