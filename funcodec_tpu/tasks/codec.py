"""GAN speech-codec task: build models from (reference-compatible) configs.

Behavioral reference: funcodec/tasks/gan_speech_codec.py:51-414 — string
registries for encoder/quantizer/decoder/discriminator/model driven by a
config.yaml. The SAME yaml files that ship with FunCodec checkpoints
construct our models, so a released checkpoint's config.yaml round-trips
(abs_task.py:1896-1947 contract).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

from funcodec_tpu.models.discriminators import MultipleDiscriminator
from funcodec_tpu.models.encodec import Encodec, EncodecConfig
from funcodec_tpu.models.quantizer import Quantizer, QuantizerConfig
from funcodec_tpu.models.seanet import SEANetConfig, SEANetDecoder, SEANetEncoder


def _freeze(v):
    """yaml lists -> hashable tuples (recursively) for frozen dataclasses."""
    if isinstance(v, list):
        return tuple(_freeze(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _freeze(x)) for k, x in v.items()))
    return v


def _filter_fields(cls, conf: Dict[str, Any], rename=(), drop=()) -> Dict[str, Any]:
    names = {f.name for f in dataclasses.fields(cls)}
    rename = dict(rename)
    out = {}
    for k, v in conf.items():
        k = rename.get(k, k)
        if k in drop:
            continue
        if k not in names:
            continue
        if isinstance(v, list):
            v = _freeze(v)
        out[k] = v
    return out


def build_seanet_config(conf: Dict[str, Any], defaults: Dict[str, Any]) -> SEANetConfig:
    merged = dict(defaults)
    merged.update(
        _filter_fields(
            SEANetConfig,
            conf,
            rename={"channels": "input_size", "activation_params": "activation_params"},
            drop=("norm_params",),
        )
    )
    ap = conf.get("activation_params")
    if isinstance(ap, dict):
        merged["activation_params"] = tuple(sorted(ap.items()))
    return SEANetConfig(**merged)


def build_quantizer(conf: Dict[str, Any], input_size: int, name: str = "costume_quantizer"):
    kw = _filter_fields(QuantizerConfig, conf, drop=("use_ddp",))
    kw.setdefault("input_size", input_size)
    if "rand_num_quant" in kw and kw["rand_num_quant"] is not None:
        kw["rand_num_quant"] = tuple(kw["rand_num_quant"])
    if name == "identity_quantizer":
        from funcodec_tpu.models.quantizer import IdentityQuantizer

        return IdentityQuantizer(QuantizerConfig(**kw))
    if name == "residual_quantizer":
        # lucidrains-surface config (residual_quantizer.py:5-34): its kwargs
        # differ from CostumeQuantizer's, so filter against that surface
        from funcodec_tpu.models.quantizer import ResidualQuantizer

        rq_kw = {
            k: v for k, v in conf.items()
            if k in (
                "input_size", "codebook_size", "num_quantizers",
                "commitment_weight", "ema_decay", "quantize_dropout_multiple_of",
                "quantize_dropout_cutoff_index", "kmeans_init", "sync_kmeans",
                "sync_codebook", "quantize_dropout",
            )
        }
        rq_kw.setdefault("input_size", input_size)
        return ResidualQuantizer(**rq_kw)
    return Quantizer(QuantizerConfig(**kw))


def build_discriminator(conf: Optional[Dict[str, Any]]):
    """Discriminators are built from discriminator_conf alone and always see
    the 1-channel waveform (gan_speech_codec.py:331-332 passes no input_size;
    multiple_discriminator.py:13 defaults to 1) — the model's input_size is
    the ENCODER's channel count (e.g. 3 for 2D freq domains), not the
    discriminator's."""
    conf = conf or {"disc_conf_list": [{"name": "encodec_multi_scale_stft_discriminator", "filters": 32}]}
    return MultipleDiscriminator(
        input_size=conf.get("input_size", 1), disc_conf_list=conf["disc_conf_list"]
    )


def build_codec_model(config: Dict[str, Any]):
    """Build (model, discriminator) from a FunCodec-style config dict.

    Mirrors GANSpeechCodecTask.build_model (gan_speech_codec.py:300-358):
    encoder/quantizer/decoder choices instantiated from `*_conf` and threaded
    into the end-to-end model named by `model`.
    """
    input_size = config.get("input_size", 1)

    encoder_name = config.get("encoder", "encodec_seanet_encoder")
    decoder_name = config.get("decoder", "encodec_seanet_decoder")
    model_name = config.get("model", "encodec")
    model_conf = dict(config.get("model_conf", {}))
    odim = model_conf.get("odim", 128)

    if encoder_name == "encodec_seanet_encoder":
        enc_cfg = build_seanet_config(
            config.get("encoder_conf", {}),
            dict(input_size=input_size, dimension=odim),
        )
        encoder = SEANetEncoder(enc_cfg)
    elif encoder_name == "encodec_seanet_encoder_2d":
        from funcodec_tpu.models.seanet2d import SEANetConfig2d, SEANetEncoder2d

        enc_cfg2 = SEANetConfig2d.from_conf(
            config.get("encoder_conf", {}), input_size=input_size, dimension=odim
        )
        encoder = SEANetEncoder2d(enc_cfg2)
    else:
        raise ValueError(f"unknown encoder {encoder_name}")

    if decoder_name == "encodec_seanet_decoder":
        dec_conf = dict(config.get("decoder_conf", {}))
        out_channels = dec_conf.pop("channels", input_size)
        dec_cfg = build_seanet_config(
            dec_conf, dict(input_size=out_channels, dimension=odim)
        )
        decoder = SEANetDecoder(dec_cfg)
    elif decoder_name == "encodec_seanet_decoder_2d":
        from funcodec_tpu.models.seanet2d import SEANetConfig2d, SEANetDecoder2d

        dec_conf = dict(config.get("decoder_conf", {}))
        out_channels = dec_conf.pop("channels", input_size)
        dec_cfg2 = SEANetConfig2d.from_conf(
            dec_conf, input_size=out_channels, dimension=odim
        )
        decoder = SEANetDecoder2d(dec_cfg2)
    else:
        raise ValueError(f"unknown decoder {decoder_name}")

    quantizer = build_quantizer(
        config.get("quantizer_conf", {}), input_size=odim,
        name=config.get("quantizer", "costume_quantizer"),
    )
    discriminator = build_discriminator(config.get("discriminator_conf"))

    if model_name == "encodec":
        ec_kw = _filter_fields(EncodecConfig, model_conf, drop=("context_loss_conf",))
        ec_kw["input_size"] = input_size
        cc = model_conf.get("context_loss_conf")
        if cc and model_conf.get("context_loss_weight", 0) > 0:
            # reference layout: {model, model_conf, mask_conf, *_weight...}
            flat: Dict[str, Any] = {"model": cc.get("model", "transformer")}
            mc = cc.get("model_conf", {}) or {}
            for src_k, dst_k in (
                ("attention_heads", "attention_heads"),
                ("linear_units", "linear_units"),
                ("num_blocks", "num_blocks"),
                ("num_layers", "lstm_layers"),
                ("output_size", "odim"),
            ):
                if src_k in mc:
                    flat[dst_k] = mc[src_k]
            mask_conf = cc.get("mask_conf", {}) or {}
            if "mask_ratio_range" in mask_conf:
                flat["mask_ratio_range"] = tuple(mask_conf["mask_ratio_range"])
            if "num_mask" in mask_conf:
                flat["num_mask"] = mask_conf["num_mask"]
            for k in ("use_quant_for_context", "mask_pred_weight",
                      "ce_loss_weight", "lm_loss_weight", "contrast_loss_weight"):
                if k in cc:
                    flat[k] = cc[k]
            ec_kw["context_loss_conf"] = tuple(sorted(flat.items()))
        model = Encodec(EncodecConfig(**ec_kw), encoder, quantizer, decoder)
    elif model_name == "freq_codec":
        from funcodec_tpu.models.freqcodec import FreqCodec, FreqCodecConfig

        fc_kw = _filter_fields(FreqCodecConfig, model_conf)
        fc_kw["input_size"] = input_size
        domain_conf = model_conf.get("domain_conf", {}) or {}
        if "n_fft" in domain_conf:
            fc_kw["domain_n_fft"] = domain_conf["n_fft"]
        if "hop_length" in domain_conf:
            fc_kw["domain_hop_length"] = domain_conf["hop_length"]
        model = FreqCodec(FreqCodecConfig(**fc_kw), encoder, quantizer, decoder)
    elif model_name == "codec_semantic_aug":
        from funcodec_tpu.models.semantic import CodecSemanticAug, SemanticCodecConfig

        sc_kw = _filter_fields(SemanticCodecConfig, model_conf)
        sc_kw["input_size"] = input_size
        ppg_conf = model_conf.get("ppg_conf", {}) or {}
        for k in ("ppg_dim", "ppg_ds_rate", "ppg_ds_type", "ppg_usage_mod"):
            if k in ppg_conf:
                sc_kw[k] = ppg_conf[k]
        model = CodecSemanticAug(SemanticCodecConfig(**sc_kw), encoder, quantizer, decoder)
    else:
        raise ValueError(f"unknown model {model_name}")

    return model, discriminator


def load_config(path: str) -> Dict[str, Any]:
    import yaml

    with open(path) as f:
        return yaml.safe_load(f)
