"""Per-layer FLOPs/params tree (torch_utils/model_summary.py:tree_layer_info
role, --stat_flops at gan_speech_codec.py:345-355)."""

import jax
import re

from funcodec_tpu.models.encodec import Encodec, EncodecConfig
from funcodec_tpu.models.quantizer import Quantizer, QuantizerConfig
from funcodec_tpu.models.seanet import SEANetConfig, SEANetDecoder, SEANetEncoder
from funcodec_tpu.utils.misc import codec_flops_tree


def test_codec_flops_tree_small():
    scfg = dict(n_filters=8, dimension=16, norm="time_group_norm", ratios=(4, 2))
    enc = SEANetEncoder(SEANetConfig(input_size=1, **scfg))
    dec = SEANetDecoder(SEANetConfig(input_size=1, **scfg))
    q = Quantizer(QuantizerConfig(input_size=16, codebook_size=32, num_quantizers=2))
    model = Encodec(EncodecConfig(target_sample_hz=16000), enc, q, dec)
    params, state = model.init(jax.random.PRNGKey(0))
    tree = codec_flops_tree(model, params, state, samples=1600)

    assert "encoder" in tree and "decoder" in tree and "quantizer" in tree
    assert "TOTAL" in tree
    # every per-layer row carries flops + param percentages
    rows = [l for l in tree.splitlines() if l.startswith("  ") and "flops" in l]
    assert len(rows) >= 10
    for row in rows:
        assert re.search(r"flops .*\(\d+\.\d+%\), param\. .*\(\d+\.\d+%\)", row), row
    # percentages of the top-level groups + quantizer sum to ~100
    pcts = [float(m) for m in re.findall(r"flops [^(]+\((\d+\.\d+)%\)",
                                         "\n".join(l for l in tree.splitlines()
                                                   if not l.startswith("  ")))]
    total_pct = sum(p for p in pcts[:-1])  # exclude TOTAL row's 100%
    assert abs(total_pct - 100.0) < 1.0, pcts
