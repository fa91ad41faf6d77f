# LauraTTS-scale AR decode timing (in-graph while_loop decode).
# Measured on v5e: 250 tokens in 5.14s warm (49 tok/s, batch 1, 6-block LM);
# the old per-token dispatch path paid >=6.5s in tunnel dispatch alone.
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

from funcodec_tpu.models.laura import LauraConfig, LauraGenModel
from funcodec_tpu.models.transformer import TransformerConfig

cfg = LauraConfig(input_size=512, vocab_size=0, num_quantizers=32, codebook_size=1024,
                  codebook_dim=128, predict_nq=2, lm_pe_type="split")
enc_kw = dict(attention_dim=512, attention_heads=8, linear_units=2048, num_blocks=6,
              input_layer="linear", pos_enc_type="rel_pos", activation="swish")
text_cfg = TransformerConfig(input_size=512, **enc_kw)
codec_cfg = TransformerConfig(input_size=128, **enc_kw)
lm_cfg = TransformerConfig(input_size=512, attention_dim=512, attention_heads=8,
                           linear_units=2048, num_blocks=6, input_layer="none",
                           pos_enc_type="none", activation="relu")
model = LauraGenModel(cfg, text_cfg, codec_cfg, lm_cfg)
params = model.init(jax.random.PRNGKey(0))
params["quantizer_codebook"] = jax.random.normal(jax.random.PRNGKey(1), params["quantizer_codebook"].shape) * 0.5

text = jnp.asarray(np.random.RandomState(0).randn(1, 30, 512).astype(np.float32))
tl = jnp.asarray([30])

t0 = time.perf_counter()
toks = model.decode_codec(params, text, tl, max_length=250, sampling=25, key=jax.random.PRNGKey(2))
t_first = time.perf_counter() - t0  # incl. compile
t0 = time.perf_counter()
toks = model.decode_codec(params, text, tl, max_length=250, sampling=25, key=jax.random.PRNGKey(3))
t_warm = time.perf_counter() - t0
n = toks.shape[1]
print(f"decode: first={t_first:.2f}s warm={t_warm:.3f}s tokens={n} ({n/max(t_warm,1e-9):.0f} tok/s)", flush=True)
