"""Import FunCodec PyTorch checkpoints into funcodec_tpu pytrees.

Maps the reference's state_dict names (e.g.
``encoder.model.3.block.1.conv.conv.weight_v``) onto our layer-list params.
Weight-norm parametrizations (weight_g/weight_v, torch dim=0 semantics,
including the per-*input*-channel norm of ConvTranspose) are fused into plain
kernels at import time — ideal for inference; training re-parametrizes.

Reference naming comes from the module trees built in
funcodec/models/encoder/seanet_encoder.py, .../decoder/seanet_decoder.py,
funcodec/modules/normed_modules/conv.py (SConv1d: .conv.conv, SConvTranspose:
.convtr.convtr) and funcodec/modules/quantization/ddp_core_vq.py:349-352
(stacked rq buffers).
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Sequence

import numpy as np
import jax.numpy as jnp

from funcodec_tpu.models.seanet import Layer
from funcodec_tpu.ops.conv import ConvSpec
from funcodec_tpu.quant.rvq import RVQState


Array = np.ndarray


def _np(x) -> Array:
    """torch tensor / array -> owned numpy array.

    Always copies: jnp.asarray on the CPU backend is zero-copy, and aliasing
    torch-owned memory breaks if the module is later mutated in place.
    """
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.array(x, copy=True)


def fuse_torch_weight_norm(g: Array, v: Array) -> Array:
    """w = g * v / ||v|| with the norm over all dims except dim 0 (torch default)."""
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt(np.sum(v.astype(np.float64) ** 2, axis=axes, keepdims=True))
    return (g * v / np.maximum(norm, 1e-12)).astype(v.dtype)


def _conv_kernel_from_torch(w: Array, spec: ConvSpec) -> Array:
    """Torch conv weight -> our gather-form kernel.

    forward 1D: (O, I/g, K) -> (K, I/g, O)
    forward 2D: (O, I/g, Kf, Kt) -> (Kf, Kt, I/g, O)
    transposed 1D: (I, O/g, K) -> (K, I/g, O) unflipped gather form
    transposed 2D: (I, O/g, Kf, Kt) -> (Kf, Kt, I/g, O)
    """
    if not spec.transposed:
        if spec.ndim == 1:
            return np.transpose(w, (2, 1, 0))
        return np.transpose(w, (2, 3, 1, 0))
    g = spec.groups
    if spec.ndim == 1:
        i_total, o_per_g, k = w.shape
        i_per_g = i_total // g
        # (g, I/g, O/g, K) -> (K, I/g, g, O/g) -> (K, I/g, O)
        wg = w.reshape(g, i_per_g, o_per_g, k)
        return np.transpose(wg, (3, 1, 0, 2)).reshape(k, i_per_g, g * o_per_g)
    i_total, o_per_g, kf, kt = w.shape
    i_per_g = i_total // g
    wg = w.reshape(g, i_per_g, o_per_g, kf, kt)
    return np.transpose(wg, (3, 4, 1, 0, 2)).reshape(kf, kt, i_per_g, g * o_per_g)


def import_conv(sd: Mapping[str, Any], base: str, spec: ConvSpec) -> Dict[str, Any]:
    """Import one NormConv/SConv (conv.py:144-221). `base` ends at the S-module."""
    inner = "convtr" if spec.transposed else "conv"
    wbase = f"{base}.{inner}.{inner}"
    if f"{wbase}.weight_v" in sd:
        w = fuse_torch_weight_norm(_np(sd[f"{wbase}.weight_g"]), _np(sd[f"{wbase}.weight_v"]))
    else:
        w = _np(sd[f"{wbase}.weight"])
    params: Dict[str, Any] = {"kernel": jnp.asarray(_conv_kernel_from_torch(w, spec))}
    if f"{wbase}.bias" in sd:
        params["bias"] = jnp.asarray(_np(sd[f"{wbase}.bias"]))
    nbase = f"{base}.{inner}.norm"
    if f"{nbase}.weight" in sd:
        params["norm_scale"] = jnp.asarray(_np(sd[f"{nbase}.weight"]))
        params["norm_bias"] = jnp.asarray(_np(sd[f"{nbase}.bias"]))
    return params


def import_lstm(sd: Mapping[str, Any], base: str, num_layers: int) -> List[Dict[str, Any]]:
    """Import torch nn.LSTM weights; transpose to right-multiplication layout."""
    out = []
    for l in range(num_layers):
        out.append(
            {
                "w_ih": jnp.asarray(_np(sd[f"{base}.weight_ih_l{l}"]).T),
                "w_hh": jnp.asarray(_np(sd[f"{base}.weight_hh_l{l}"]).T),
                "b_ih": jnp.asarray(_np(sd[f"{base}.bias_ih_l{l}"])),
                "b_hh": jnp.asarray(_np(sd[f"{base}.bias_hh_l{l}"])),
            }
        )
    return out


def import_seanet_layers(
    sd: Mapping[str, Any], prefix: str, layers: Sequence[Layer]
) -> List[Any]:
    """Import a SEANet encoder/decoder layer list from `{prefix}.model.{i}`."""
    params: List[Any] = []
    for i, (kind, spec) in enumerate(layers):
        base = f"{prefix}.model.{i}"
        if kind == "conv":
            params.append(import_conv(sd, base, spec))
        elif kind == "lstm":
            dim, nlayers, _skip = spec
            params.append(import_lstm(sd, f"{base}.lstm", nlayers))
        elif kind == "tfm":
            from funcodec_tpu.models.seanet import _seq_tfm_cfg
            from funcodec_tpu.models.transformer import import_encoder as imp_enc

            params.append(imp_enc(sd, base, _seq_tfm_cfg(spec)))
        elif kind == "snake":
            params.append({"alpha": jnp.asarray(_np(sd[f"{base}.alpha"]).reshape(-1))})
        elif kind == "resblock":
            block, shortcut = spec
            bp: List[Any] = []
            for j, (bkind, bspec) in enumerate(block):
                if bkind == "conv":
                    bp.append(import_conv(sd, f"{base}.block.{j}", bspec))
                elif bkind == "snake":
                    bp.append(
                        {"alpha": jnp.asarray(_np(sd[f"{base}.block.{j}.alpha"]).reshape(-1))}
                    )
                else:
                    bp.append(None)
            sp = None
            if shortcut is not None:
                sp = import_conv(sd, f"{base}.shortcut", shortcut)
            params.append({"block": bp, "shortcut": sp})
        elif kind in ("act", "squeeze", "unsqueeze"):
            params.append(None)
        else:
            raise ValueError(kind)
    return params


def import_rvq_state(sd: Mapping[str, Any], prefix: str = "quantizer.rq.model") -> RVQState:
    """Import stacked codebook buffers (ddp_core_vq.py:349-352)."""
    return RVQState(
        inited=jnp.asarray(_np(sd[f"{prefix}.inited"]).reshape(-1).astype(np.float32)),
        cluster_size=jnp.asarray(_np(sd[f"{prefix}.cluster_size"])),
        embed=jnp.asarray(_np(sd[f"{prefix}.embed"])),
        embed_avg=jnp.asarray(_np(sd[f"{prefix}.embed_avg"])),
    )


def import_quantizer(sd: Mapping[str, Any], prefix: str = "quantizer"):
    """Import CostumeQuantizer params (+ optional projections)."""
    params: Dict[str, Any] = {}
    if f"{prefix}.input_proj.weight" in sd:
        params["input_proj"] = {
            "kernel": jnp.asarray(_np(sd[f"{prefix}.input_proj.weight"]).T),
            "bias": jnp.asarray(_np(sd[f"{prefix}.input_proj.bias"])),
        }
        params["output_proj"] = {
            "kernel": jnp.asarray(_np(sd[f"{prefix}.output_proj.weight"]).T),
            "bias": jnp.asarray(_np(sd[f"{prefix}.output_proj.bias"])),
        }
    state = import_rvq_state(sd, prefix=f"{prefix}.rq.model")
    return params, state


def import_encodec(sd: Mapping[str, Any], model) -> Any:
    """Import a full Encodec checkpoint -> (params, rvq_state).

    `model` is funcodec_tpu.models.encodec.Encodec. Discriminator weights are
    imported separately by the training stack.
    """
    q_params, rvq_state = import_quantizer(sd, "quantizer")
    params = {
        "encoder": import_seanet_layers(sd, "encoder", model.encoder.layers),
        "quantizer": q_params,
        "decoder": import_seanet_layers(sd, "decoder", model.decoder.layers),
    }
    return params, rvq_state


def import_laura(sd: Mapping[str, Any], model) -> Dict[str, Any]:
    """Import a LauraGenModel checkpoint (laura_model.py:58-146 naming)."""
    from funcodec_tpu.models.transformer import import_encoder as imp_enc

    def lin(name):
        p = {"w": jnp.asarray(_np(sd[f"{name}.weight"]).T)}
        if f"{name}.bias" in sd:
            p["b"] = jnp.asarray(_np(sd[f"{name}.bias"]))
        return p

    params: Dict[str, Any] = {}
    if model.text_encoder_cfg is not None:
        params["text_encoder"] = imp_enc(sd, "text_encoder", model.text_encoder_cfg)
    params["text_enc_out_layer"] = lin("text_enc_out_layer")
    if "token_embedding.weight" in sd:
        params["token_embedding"] = jnp.asarray(_np(sd["token_embedding.weight"]))
    params["lm_embedding"] = jnp.asarray(_np(sd["lm_embedding.weight"]))
    params["codec_lm"] = imp_enc(sd, "codec_lm.encoder", model.codec_lm_cfg)
    if "codec_lm.input_layer.weight" in sd:
        params["lm_input_layer"] = lin("codec_lm.input_layer")
    params["lm_decoder"] = lin("codec_lm.decoder")
    params["codec_encoder"] = imp_enc(sd, "codec_encoder", model.codec_encoder_cfg)
    params["codec_encoder_out_layer"] = lin("codec_encoder_out_layer")
    params["quantizer_codebook"] = jnp.asarray(_np(sd["quantizer_codebook.embed"]))
    return params


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    """Load a .pth state_dict to numpy without CUDA."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd and all(
        not hasattr(v, "shape") for k, v in list(sd.items())[:1]
    ):
        sd = sd["model"]
    return {k: _np(v) for k, v in sd.items()}


def import_hifigan_generator(state_dict, model) -> dict:
    """Import a reference HiFiGANGenerator state dict (hifigan.py:108-247)
    into models/hifigan_gen.HiFiGANGenerator params (weights fused)."""
    import jax.numpy as jnp

    cfg = model.cfg
    sd = {k: _np(v) for k, v in state_dict.items()}

    def conv(prefix, transposed=False):
        if f"{prefix}.weight_v" in sd:
            w = fuse_torch_weight_norm(sd[f"{prefix}.weight_g"], sd[f"{prefix}.weight_v"])
        else:
            w = sd[f"{prefix}.weight"]
        if transposed:
            # torch ConvTranspose1d weight (Cin, Cout, K) -> (K, Cin, Cout)
            w = np.transpose(w, (2, 0, 1))
        else:
            w = np.transpose(w, (2, 1, 0))
        p = {"kernel": jnp.asarray(w)}
        if f"{prefix}.bias" in sd:
            p["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
        return p

    nb = len(cfg.resblock_kernel_sizes)
    params = {"input_conv": conv("input_conv")}
    params["upsamples"] = [
        conv(f"upsamples.{i}.1", transposed=True)
        for i in range(len(cfg.upsample_scales))
    ]
    blocks = []
    for k in range(len(cfg.upsample_scales) * nb):
        dils = cfg.resblock_dilations[k % nb]
        blk = {
            "convs1": [conv(f"blocks.{k}.convs1.{j}.1") for j in range(len(dils))],
            "convs2": [],
        }
        if cfg.use_additional_convs:
            blk["convs2"] = [
                conv(f"blocks.{k}.convs2.{j}.1") for j in range(len(dils))
            ]
        blocks.append(blk)
    params["blocks"] = blocks
    params["output_conv"] = conv("output_conv.1")
    if cfg.global_channels > 0:
        params["global_conv"] = conv("global_conv")
    return params
