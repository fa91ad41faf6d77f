"""Small shared utilities: one-shot hints, parameter census, FLOPs estimate.

Behavioral reference: funcodec/utils/hinter.py:8-13 (hint_once),
funcodec/torch_utils/model_summary.py (parameter census logged at
abs_task.py:1276; thop-style FLOPs tree for --stat_flops,
gan_speech_codec.py:345-355).
"""

from __future__ import annotations

import logging
from typing import Any, Dict

import numpy as np

_hinted = set()


def hint_once(message: str, uid: str, rank: int = 0) -> None:
    """Log a message once per uid (utils/hinter.py:8-13)."""
    if uid not in _hinted:
        _hinted.add(uid)
        logging.info(message)


def count_parameters(tree: Any) -> int:
    import jax

    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def model_summary(params: Any, name: str = "model") -> str:
    """Parameter census with per-top-level-branch breakdown."""
    lines = [f"{name} summary:"]
    total = count_parameters(params)
    if isinstance(params, dict):
        for k, v in params.items():
            n = count_parameters(v)
            lines.append(f"  {k}: {n:,} params ({100.0 * n / max(total, 1):.1f}%)")
    lines.append(f"  TOTAL: {total:,} params ({total * 4 / 1e6:.2f} MB fp32)")
    return "\n".join(lines)


def estimate_flops(fn, *example_args) -> Dict[str, float]:
    """XLA cost analysis of a jitted callable (thop/--stat_flops role)."""
    import jax

    lowered = jax.jit(fn).lower(*example_args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    return {
        "flops": float(cost.get("flops", -1)),
        "bytes_accessed": float(cost.get("bytes accessed", -1)),
    }


def _clever_format(n: float) -> str:
    """thop.clever_format's unit scaling ('%.2f')."""
    for thresh, unit in ((1e12, "T"), (1e9, "G"), (1e6, "M"), (1e3, "K")):
        if abs(n) >= thresh:
            return f"{n / thresh:.2f}{unit}"
    return f"{n:.2f}B" if n else "0.00B"


def _layer_label(i: int, kind: str, spec: Any) -> str:
    if kind == "conv":
        shape = "x".join(str(s) for s in np.atleast_1d(spec.kernel_size))
        tag = "convtr" if getattr(spec, "transposed", False) else "conv"
        return (f"{i}.{tag} k{shape} s{spec.stride} "
                f"{spec.in_channels}->{spec.out_channels}")
    if kind == "resblock":
        block, shortcut = spec
        c = block[1][1].in_channels if len(block) > 1 else "?"
        return f"{i}.resblock C{c}" + ("" if shortcut is not None else " (true_skip)")
    if kind in ("act", "snake"):
        name = spec[0] if isinstance(spec, tuple) else kind
        return f"{i}.act {name}"
    return f"{i}.{kind}"


def layer_cost_rows(layers, params, x, apply_one=None):
    """Per-layer (label, flops, params, out_shape) for a seanet-style layer
    list, by lowering each layer at its propagated input shape and reading
    XLA's compiled cost analysis (the thop-per-module role of
    torch_utils/model_summary.py:tree_layer_info).
    """
    import jax.numpy as jnp

    if apply_one is None:
        from funcodec_tpu.models.seanet import apply_layers

        def apply_one(layer, p, xx):
            return apply_layers([layer], [p], xx)

    rows = []
    for i, (layer, p) in enumerate(zip(layers, params)):
        kind, spec = layer
        cost = estimate_flops(lambda pp, xx: apply_one(layer, pp, xx), p, x)
        x = apply_one(layer, p, x)
        rows.append((_layer_label(i, kind, spec), cost["flops"],
                     count_parameters(p), tuple(x.shape)))
    return rows, x


def codec_flops_tree(model, params, rvq_state, batch: int = 1, samples: int = 16000) -> str:
    """Per-layer FLOPs/params tree for a codec model's serving path
    (encoder layers -> quantizer -> decoder layers), formatted like the
    reference's tree_layer_info (model_summary.py:74-98): each line
    'name: flops X(p%), param. Y(p%)'. Printed by --stat_flops
    (gan_speech_codec.py:345-355, codec_inference.py:328-342).
    """
    import jax.numpy as jnp

    x = jnp.zeros((batch, samples, 1), jnp.float32)
    enc_rows, z = layer_cost_rows(model.encoder.layers, params["encoder"], x)

    q_cost = estimate_flops(
        lambda p, s, zz: model.quantizer.inference(p, s, zz),
        params["quantizer"], rvq_state, z,
    )
    q_params = count_parameters(params["quantizer"]) + count_parameters(
        getattr(rvq_state, "embed", None)
    )
    quantized, _, _ = model.quantizer.inference(params["quantizer"], rvq_state, z)

    dec_rows, _ = layer_cost_rows(model.decoder.layers, params["decoder"], quantized)

    groups = [("encoder", enc_rows), ("decoder", dec_rows)]
    total_flops = sum(f for _, rows in groups for _, f, _, _ in rows) + q_cost["flops"]
    total_params = sum(p for _, rows in groups for _, _, p, _ in rows) + q_params

    def fmt(depth, name, flops, nparams, shape=None):
        tail = f"  out={shape}" if shape else ""
        return ("  " * depth + f"{name}: flops {_clever_format(flops)}"
                f"({flops / max(total_flops, 1) * 100.0:.2f}%), "
                f"param. {_clever_format(nparams)}"
                f"({nparams / max(total_params, 1) * 100.0:.2f}%)" + tail)

    lines = [f"serving-path cost tree (B={batch}, {samples} samples, XLA cost analysis):"]
    for gname, rows in (("encoder", enc_rows),):
        lines.append(fmt(0, gname, sum(r[1] for r in rows), sum(r[2] for r in rows)))
        lines += [fmt(1, n, f, p, s) for n, f, p, s in rows]
    lines.append(fmt(0, "quantizer", q_cost["flops"], q_params))
    lines.append(fmt(0, "decoder", sum(r[1] for r in dec_rows), sum(r[2] for r in dec_rows)))
    lines += [fmt(1, n, f, p, s) for n, f, p, s in dec_rows]
    lines.append(fmt(0, "TOTAL", total_flops, total_params))
    return "\n".join(lines)
