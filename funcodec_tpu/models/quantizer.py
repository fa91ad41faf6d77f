"""Task-facing quantizer wrapper around the RVQ core.

Behavioral reference: funcodec/models/quantizer/costume_quantizer.py:6-122
(optional in/out projection, tanh range clamp, bandwidth -> n_q) and
funcodec/modules/quantization/vq.py:86-132.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from funcodec_tpu.quant.rvq import (
    RVQConfig,
    RVQState,
    init_rvq_state,
    rvq_decode,
    rvq_encode,
    rvq_inference,
    rvq_train_forward,
)


@dataclasses.dataclass(frozen=True)
class QuantizerConfig:
    """Mirrors CostumeQuantizer kwargs (costume_quantizer.py:7-22)."""

    input_size: int = 128
    codebook_size: int = 1024
    num_quantizers: int = 32
    ema_decay: float = 0.99
    kmeans_init: bool = True
    sampling_rate: int = 16_000
    quantize_dropout: bool = False
    rand_num_quant: Optional[Tuple[int, ...]] = None
    encoder_hop_length: int = 320
    q0_ds_ratio: int = 1
    codec_dim: Optional[int] = None
    codec_range: Optional[float] = None
    expiry_mode: str = "reference"

    @property
    def effective_dim(self) -> int:
        return self.codec_dim if self.codec_dim is not None else self.input_size

    def rvq(self) -> RVQConfig:
        return RVQConfig(
            dim=self.effective_dim,
            codebook_size=self.codebook_size,
            num_quantizers=self.num_quantizers,
            decay=self.ema_decay,
            kmeans_init=self.kmeans_init,
            quantize_dropout=self.quantize_dropout,
            rand_num_quant=tuple(self.rand_num_quant) if self.rand_num_quant else None,
            q0_ds_ratio=self.q0_ds_ratio,
            sampling_rate=self.sampling_rate,
            encoder_hop_length=self.encoder_hop_length,
            expiry_mode=self.expiry_mode,
        )


class Quantizer:
    """Functional quantizer: params (projections) + RVQState (codebooks)."""

    def __init__(self, cfg: QuantizerConfig):
        self.cfg = cfg
        self.rvq_cfg = cfg.rvq()

    # -- state/params ------------------------------------------------------

    def init(self, key) -> Tuple[Dict[str, Any], RVQState]:
        params: Dict[str, Any] = {}
        cfg = self.cfg
        if cfg.codec_dim is not None and cfg.codec_dim != cfg.input_size:
            k1, k2, key = jax.random.split(key, 3)
            bound_in = 1.0 / math.sqrt(cfg.input_size)
            bound_out = 1.0 / math.sqrt(cfg.codec_dim)
            params["input_proj"] = {
                "kernel": jax.random.uniform(
                    k1, (cfg.input_size, cfg.codec_dim), minval=-bound_in, maxval=bound_in
                ),
                "bias": jnp.zeros((cfg.codec_dim,)),
            }
            params["output_proj"] = {
                "kernel": jax.random.uniform(
                    k2, (cfg.codec_dim, cfg.input_size), minval=-bound_out, maxval=bound_out
                ),
                "bias": jnp.zeros((cfg.input_size,)),
            }
        state = init_rvq_state(self.rvq_cfg, key if not self.rvq_cfg.kmeans_init else None)
        return params, state

    # -- helpers -----------------------------------------------------------

    def _pre(self, params, x):
        if "input_proj" in params:
            p = params["input_proj"]
            x = x @ p["kernel"] + p["bias"]
        if self.cfg.codec_range is not None:
            x = jnp.tanh(x) * self.cfg.codec_range
        return x

    def _post(self, params, x):
        if "output_proj" in params:
            p = params["output_proj"]
            x = x @ p["kernel"] + p["bias"]
        return x

    def n_q_for_bandwidth(self, bandwidth: Optional[float]) -> int:
        return self.rvq_cfg.num_quantizers_for_bandwidth(bandwidth)

    # -- forward modes (all take/return (B, T, C)) --------------------------

    def train_forward(self, params, state: RVQState, x, key, bandwidth=None):
        """Returns (quantized, indices (n_q,B,T), commit_loss scalar, sub_quants, new_state).

        commit_loss = mean over all n_q layer losses, dropped layers counting 0
        (vq.py:99-103: penalty = mean(commit_loss)).
        """
        n_q = self.n_q_for_bandwidth(bandwidth)
        x = self._pre(params, x)
        quantized, indices, commits, sub_quants, new_state = rvq_train_forward(
            self.rvq_cfg, state, x, key, n_q=n_q
        )
        quantized = self._post(params, quantized)
        return quantized, indices, jnp.mean(commits), sub_quants, new_state

    def inference(self, params, state: RVQState, x, bandwidth=None):
        """Eval forward (costume_quantizer.py:77-96)."""
        n_q = self.n_q_for_bandwidth(bandwidth)
        x = self._pre(params, x)
        quantized, indices, sub_quants = rvq_inference(self.rvq_cfg, state, x, n_q=n_q)
        quantized = self._post(params, quantized)
        return quantized, indices, sub_quants

    def encode(self, params, state: RVQState, x, bandwidth=None):
        """(B,T,C) -> indices (n_q, B, T) (costume_quantizer.py:98-112)."""
        n_q = self.n_q_for_bandwidth(bandwidth)
        x = self._pre(params, x)
        return rvq_encode(self.rvq_cfg, state, x, n_q=n_q)

    def decode(self, params, state: RVQState, indices):
        """indices (n_q', B, T) -> (B, T, C) (costume_quantizer.py:114-119)."""
        out = rvq_decode(self.rvq_cfg, state, indices)
        return self._post(params, out)


class ResidualQuantizer:
    """Lucidrains-surface residual VQ (residual_quantizer.py:5-49).

    The reference wraps the vendored `vector_quantize_pytorch.ResidualVQ`
    (funcodec/modules/vector_quantize_pytorch/residual_vq.py) behind a thin
    module whose forward contract is ``x -> (quantized, indices, commit_loss)``
    with indices shaped (B, T, n_q). It is registered in no task choice in the
    reference; we expose it anyway so configs written against that surface
    work, backed by the SAME `quant/rvq.py` core (identical EuclideanCodebook
    math: L2 argmax, EMA decay, Laplace smoothing, dead-code expiry at
    threshold 2 — the semantics the lucidrains module shares with
    ddp_core_vq.py).

    Config mapping (documented equivalences, not a port of the vendored file):
      * dim/num_quantizers/codebook_size/decay/kmeans_init — direct.
      * commitment_weight — scales the commit loss we return.
      * quantize_dropout + cutoff_index + multiple_of — the lucidrains dropout
        draws a cutoff in [cutoff_index, n_q) and rounds it up to
        `multiple_of`; we enumerate exactly that set of allowed depths into
        RVQConfig.rand_num_quant.
      * sync_kmeans/sync_codebook — obsolete under GSPMD: codebook statistics
        are psum-ed inside the jitted step, so every replica is always in sync.

    Known gradient divergence vs the vendored module: lucidrains'
    residual_vq.py subtracts `quantized` WITHOUT detach, so the encoder
    receives straight-through gradients and commit losses from EVERY layer's
    residual chain; this wrapper reuses the ddp_core_vq-style per-layer STE
    where residuals past layer 0 are gradient-free. Inference/encode/decode
    and the forward values are equivalent; training dynamics under
    name='residual_quantizer' will differ from the vendored reference in the
    gradient path. The ddp behavior is what every shipped recipe trains with.
    """

    def __init__(
        self,
        input_size: int = 512,
        codebook_size: int = 1024,
        num_quantizers: int = 8,
        commitment_weight: float = 1.0,
        ema_decay: float = 0.95,
        quantize_dropout_multiple_of: int = 1,
        quantize_dropout_cutoff_index: int = 1,
        kmeans_init: bool = False,
        sync_kmeans: bool = True,
        sync_codebook: bool = False,
        quantize_dropout: bool = False,
        **_: Any,
    ):
        rand_num_quant = None
        if quantize_dropout:
            m = max(1, quantize_dropout_multiple_of)
            # lucidrains (residual_vq.py dropout branch): draws
            # c = randrange(cutoff_index, n_q), then keeps
            # round_up(c + 1, m) layers (capped at n_q). We enumerate that as
            # a MULTISET — one entry per c, duplicates preserved — because
            # rvq_train_forward draws uniformly over rand_num_quant
            # (jax.random.choice), so duplicates reproduce randrange's
            # per-depth probabilities exactly even when multiple_of > 1.
            depths = sorted(
                min(-(-(c + 1) // m) * m, num_quantizers)
                for c in range(max(1, quantize_dropout_cutoff_index), num_quantizers)
            )
            rand_num_quant = tuple(depths) if depths else (num_quantizers,)
        self.commitment_weight = float(commitment_weight)
        self.code_dim = input_size
        self.cfg = QuantizerConfig(
            input_size=input_size,
            codebook_size=codebook_size,
            num_quantizers=num_quantizers,
            ema_decay=ema_decay,
            kmeans_init=kmeans_init,
            quantize_dropout=quantize_dropout,
            rand_num_quant=rand_num_quant,
            # lucidrains' threshold_ema_dead_code=2 expiry actually fires
            # (unlike ddp_core_vq's clobbered variant), so this surface gets
            # the working expiry, not the inert "reference" mode.
            expiry_mode="effective",
        )
        self.rvq_cfg = self.cfg.rvq()
        self._inner = Quantizer(self.cfg)

    def init(self, key):
        return self._inner.init(key)

    def output_size(self) -> int:
        return self.code_dim

    def n_q_for_bandwidth(self, bandwidth):
        return self.cfg.num_quantizers

    def __call__(self, params, state: RVQState, x, key):
        """Training forward: (B,T,C) -> (quantized, indices (B,T,n_q), loss, state)."""
        quantized, indices, commit, _, new_state = self._inner.train_forward(
            params, state, x, key
        )
        # lucidrains returns indices stacked last: (B, T, n_q), dropped = -1
        return (
            quantized,
            jnp.transpose(indices, (1, 2, 0)),
            self.commitment_weight * commit,
            new_state,
        )

    # Quantizer-interface passthroughs so the task layer can treat it like
    # CostumeQuantizer when registered as a quantizer choice.
    def train_forward(self, params, state, x, key, bandwidth=None):
        q, idx, c, sub, new_state = self._inner.train_forward(params, state, x, key)
        return q, idx, self.commitment_weight * c, sub, new_state

    def inference(self, params, state, x, bandwidth=None):
        return self._inner.inference(params, state, x)

    def encode(self, params, state, x, bandwidth=None):
        return self._inner.encode(params, state, x)

    def decode(self, params, state, indices):
        return self._inner.decode(params, state, indices)


class IdentityQuantizer:
    """Debug pass-through quantizer (identity_quantizer.py:5-23).

    Matches the Quantizer interface; codebook state is an empty RVQState.
    """

    def __init__(self, cfg: Optional[QuantizerConfig] = None, input_size: int = 128, **_):
        self.cfg = cfg or QuantizerConfig(input_size=input_size, num_quantizers=1)
        self.rvq_cfg = self.cfg.rvq()

    def init(self, key):
        return {}, init_rvq_state(self.rvq_cfg)

    def n_q_for_bandwidth(self, bandwidth):
        return 1

    def train_forward(self, params, state, x, key, bandwidth=None):
        import jax.numpy as jnp

        B, T, _ = x.shape
        indices = jnp.zeros((1, B, T), jnp.int32)
        return x, indices, jnp.float32(0.0), x[None], state

    def inference(self, params, state, x, bandwidth=None):
        import jax.numpy as jnp

        B, T, _ = x.shape
        return x, jnp.zeros((1, B, T), jnp.int32), x[None]

    def encode(self, params, state, x, bandwidth=None):
        import jax.numpy as jnp

        B, T, _ = x.shape
        return jnp.zeros((1, B, T), jnp.int32)

    def decode(self, params, state, indices):
        raise NotImplementedError("IdentityQuantizer has no codebooks to decode")
