"""Residual vector quantization with EMA codebooks, TPU-native.

Behavioral reference: funcodec/modules/quantization/ddp_core_vq.py
(EuclideanCodebook :110-241, VectorQuantization :244-324,
DistributedResidualVectorQuantization :327-453) and vq.py :29-133.

Design notes (TPU-first, not a port):

- All codebooks live in ONE stacked state pytree: embed (n_q, bins, dim) etc.
  The per-quantizer residual loop is a ``lax.scan`` whose xs are the stacked
  per-quantizer state slices; distances are a single (N, dim) x (dim, bins)
  matmul per step on the MXU.
- The whole training forward is written as a *global-batch* program. Under
  ``pjit`` over a data-sharded mesh, XLA/GSPMD inserts the collectives for the
  one-hot cluster statistics automatically, so every replica computes
  *identical* codebooks — strictly better than the reference's
  update-then-broadcast scheme, which admits small cross-GPU divergence
  (ddp_core_vq.py:238-239).
- State updates are functional: (state, x) -> (outputs, new_state). No
  buffers, no in-place mutation, exact resume from a checkpointed pytree.
- The reference's dead-code expiry is a no-op in its DDP implementation (the
  expired rows written at ddp_core_vq.py:161-178 are unconditionally
  overwritten by the EMA normalization at :236-237). ``expiry_mode`` keeps
  the choice explicit: "reference" reproduces the (inert) behavior, while
  "effective" actually resets embed/embed_avg/cluster_size for dead codes.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct
from jax import lax

# Route eval-mode codebook searches through the fused Pallas kernel
# (quant/rvq_pallas.py). Opt-in: bf16 search can flip near-tie tokens vs the
# bit-exact fp32 scan. bench.py enables it for the production serving path.
PALLAS_RVQ = False

# lax.scan unroll for the training layer loop. Measured on v5e (B=32,
# N=4096, 32 layers): unroll 1/8/32 are all ~28 ms — the ~0.9 ms/layer is
# serial kernel work, not loop-iteration overhead, so unrolling only bloats
# compile time. Kept as a knob with the honest measurement.
TRAIN_SCAN_UNROLL = 1

# Testing hook: force the full per-layer scan (kmeans-init-capable "slow"
# path) even when every codebook is initialized, so tests can assert the
# fast vectorized-EMA path is equivalent to it.
FORCE_SLOW_SCAN = False

# A/B hook (scripts/expiry_draw_ab.py): revert to the round-4 per-layer
# `random.permutation` expiry draw — n_scan independent sorts whose compile
# alone cost ~17 min on the axon remote compiler. The shipped draw (one
# shared permutation + per-layer offsets) is the default; this hook exists
# so the revival-trajectory equivalence stays re-measurable.
EXPIRY_PER_LAYER_DRAW = False


@dataclasses.dataclass(frozen=True)
class RVQConfig:
    """Static RVQ configuration (vq.py:42-84, CostumeQuantizer :6-53)."""

    dim: int = 128
    codebook_size: int = 1024
    num_quantizers: int = 32
    decay: float = 0.99
    epsilon: float = 1e-5
    threshold_ema_dead_code: float = 2.0
    kmeans_init: bool = True
    kmeans_iters: int = 50
    quantize_dropout: bool = False
    rand_num_quant: Optional[Tuple[int, ...]] = None
    q0_ds_ratio: int = 1
    sampling_rate: int = 16_000
    encoder_hop_length: int = 320
    commitment_weight: float = 1.0
    expiry_mode: str = "reference"  # reference (inert) | effective | none

    def bandwidth_per_quantizer(self) -> float:
        """kbps... actually bps per quantizer: log2(bins) * sr / hop (vq.py:114-117)."""
        return math.log2(self.codebook_size) * self.sampling_rate / self.encoder_hop_length

    def num_quantizers_for_bandwidth(self, bandwidth: Optional[float]) -> int:
        """n_q = max(1, floor(bw / bw_per_q)) (vq.py:105-112)."""
        if bandwidth is not None and bandwidth > 0.0:
            return int(max(1, math.floor(bandwidth / self.bandwidth_per_quantizer())))
        return self.num_quantizers


@struct.dataclass
class RVQState:
    """Stacked codebook state for all quantizers (ddp_core_vq.py:349-352)."""

    inited: jnp.ndarray  # (n_q,) float {0,1}
    cluster_size: jnp.ndarray  # (n_q, bins)
    embed: jnp.ndarray  # (n_q, bins, dim)
    embed_avg: jnp.ndarray  # (n_q, bins, dim)


def init_rvq_state(cfg: RVQConfig, key: Optional[jax.Array] = None) -> RVQState:
    n_q, bins, dim = cfg.num_quantizers, cfg.codebook_size, cfg.dim
    if cfg.kmeans_init:
        embed = jnp.zeros((n_q, bins, dim), jnp.float32)
        inited = jnp.zeros((n_q,), jnp.float32)
    else:
        # torch kaiming_uniform on (bins, dim): bound = sqrt(1/dim) * sqrt(3) * gain
        assert key is not None, "uniform init needs a PRNG key"
        gain = math.sqrt(2.0 / (1.0 + 5.0))
        bound = gain * math.sqrt(3.0 / dim)
        embed = jax.random.uniform(
            key, (n_q, bins, dim), jnp.float32, minval=-bound, maxval=bound
        )
        inited = jnp.ones((n_q,), jnp.float32)
    return RVQState(
        inited=inited,
        cluster_size=jnp.zeros((n_q, bins), jnp.float32),
        embed=embed,
        embed_avg=embed.copy(),
    )


# ---------------------------------------------------------------------------
# distance kernel
# ---------------------------------------------------------------------------


def nearest_codebook_indices(x: jnp.ndarray, embed: jnp.ndarray) -> jnp.ndarray:
    """argmax of -(||x||^2 - 2 x.e + ||e||^2) over the codebook.

    x: (N, D), embed: (bins, D) -> (N,) int32. Matches the fp32 expansion and
    first-max tie-breaking of ddp_core_vq.py:180-188 (torch .max picks the
    first maximal index; jnp.argmax does too).
    """
    x32 = x.astype(jnp.float32)
    e32 = embed.astype(jnp.float32)
    dist = -(
        jnp.sum(x32 * x32, axis=1, keepdims=True)
        - 2.0 * x32 @ e32.T
        + jnp.sum(e32 * e32, axis=1)[None, :]
    )
    return jnp.argmax(dist, axis=-1).astype(jnp.int32)


def _sample_vectors(key, samples: jnp.ndarray, num: int) -> jnp.ndarray:
    """Sample `num` rows; randperm if enough rows else randint (ddp :65-73)."""
    n = samples.shape[0]
    if n >= num:
        idx = jax.random.permutation(key, n)[:num]
    else:
        idx = jax.random.randint(key, (num,), 0, n)
    return samples[idx]


def kmeans(key, samples: jnp.ndarray, num_clusters: int, num_iters: int):
    """In-graph k-means (ddp_core_vq.py:76-98). samples: (N, D) fp32.

    Returns (means (k, D), bins (k,)). Distances via one-hot matmuls on MXU.
    """
    means = _sample_vectors(key, samples, num_clusters)

    def body(_, means):
        # nearest mean per sample
        idx = nearest_codebook_indices(samples, means)
        onehot = jax.nn.one_hot(idx, num_clusters, dtype=samples.dtype)  # (N, k)
        bins = jnp.sum(onehot, axis=0)  # (k,)
        sums = onehot.T @ samples  # (k, D)
        zero = bins == 0
        new_means = sums / jnp.maximum(bins, 1.0)[:, None]
        return jnp.where(zero[:, None], means, new_means)

    means = lax.fori_loop(0, num_iters, body, means)
    idx = nearest_codebook_indices(samples, means)
    bins = jnp.sum(jax.nn.one_hot(idx, num_clusters, dtype=samples.dtype), axis=0)
    return means, bins


# ---------------------------------------------------------------------------
# inference paths
# ---------------------------------------------------------------------------


def rvq_encode(
    cfg: RVQConfig, state: RVQState, x: jnp.ndarray, n_q: Optional[int] = None
) -> jnp.ndarray:
    """Greedy residual encode. x: (B, T, D) -> indices (n_q, B, T) int32.

    Reference: ddp_core_vq.py:420-440.
    """
    n_q = n_q or cfg.num_quantizers
    B, T, D = x.shape
    flat = x.reshape(B * T, D).astype(jnp.float32)

    def step(residual, embed_q):
        idx = nearest_codebook_indices(residual, embed_q)
        quantized = embed_q[idx]
        return residual - quantized, idx

    _, indices = lax.scan(step, flat, state.embed[:n_q])
    return indices.reshape(n_q, B, T)


def rvq_decode(cfg: RVQConfig, state: RVQState, indices: jnp.ndarray) -> jnp.ndarray:
    """indices (n_q', B, T) -> (B, T, D) sum of codebook vectors (ddp :442-453)."""
    n_q = indices.shape[0]

    def gather(embed_q, idx_q):
        return embed_q[idx_q]  # (B, T, D)

    quants = jax.vmap(gather)(state.embed[:n_q], indices)
    return jnp.sum(quants, axis=0)


# ---------------------------------------------------------------------------
# training forward (EMA codebook learning, quantizer dropout, kmeans init)
# ---------------------------------------------------------------------------


def _nearest_time_resize(x: jnp.ndarray, new_t: int) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') along time of (B, T, D)."""
    t = x.shape[1]
    # torch nearest: src_idx = floor(dst_idx * t / new_t)
    idx = jnp.floor(jnp.arange(new_t) * (t / new_t)).astype(jnp.int32)
    return x[:, idx, :]


def _train_one_quantizer(
    cfg: RVQConfig,
    residual: jnp.ndarray,  # (N, D) layer input, fp32, differentiable
    inited_q: jnp.ndarray,  # scalar
    cluster_size_q: jnp.ndarray,  # (bins,)
    embed_q: jnp.ndarray,  # (bins, D)
    embed_avg_q: jnp.ndarray,  # (bins, D)
    active: jnp.ndarray,  # scalar bool: is this layer on (dropout / n_q)?
    key: jax.Array,
    fresh_idx: Optional[jnp.ndarray] = None,  # (bins,) precomputed expiry rows
):
    """One EuclideanCodebook forward+EMA step (ddp_core_vq.py:212-241).

    Returns (quantized (N, D) gradient-free, indices (N,), new buffers).
    State updates are masked by `active` (dropped layers keep their buffers
    untouched, matching the `continue` at ddp_core_vq.py:389-393).
    """
    bins = cfg.codebook_size
    xs = lax.stop_gradient(residual)

    # --- kmeans init on first use (ddp :149-159) ---
    def do_init(_):
        k_key, _ = jax.random.split(key)
        means, counts = kmeans(k_key, xs, bins, cfg.kmeans_iters)
        return means, means, counts.astype(jnp.float32), jnp.float32(1.0)

    def no_init(_):
        return embed_q, embed_avg_q, cluster_size_q, inited_q

    if cfg.kmeans_init:
        need_init = jnp.logical_and(inited_q < 0.5, active)
        embed_q, embed_avg_q, cluster_size_q, inited_q = lax.cond(
            need_init, do_init, no_init, operand=None
        )
    # kmeans_init=False: buffers start uniform-initialized with inited=1
    # (init_rvq_state), so the init cond is statically dead — skip it

    # --- quantize ---
    idx = nearest_codebook_indices(xs, embed_q)
    quantized = embed_q[idx]  # (N, D)

    # --- EMA updates (ddp :225-237) ---
    onehot = jax.nn.one_hot(idx, bins, dtype=jnp.float32)  # (N, bins)
    counts = jnp.sum(onehot, axis=0)  # GSPMD all-reduces across data shards
    embed_sum = onehot.T @ xs  # (bins, D)

    decay = cfg.decay
    new_cluster_size = cluster_size_q * decay + counts * (1.0 - decay)
    new_embed_avg = embed_avg_q * decay + embed_sum * (1.0 - decay)
    total = jnp.sum(new_cluster_size)
    smoothed = (new_cluster_size + cfg.epsilon) / (total + bins * cfg.epsilon) * total
    new_embed = new_embed_avg / smoothed[:, None]

    if cfg.expiry_mode == "effective":
        # Reset genuinely dead codes to fresh batch samples (improvement over
        # the reference, whose expiry is clobbered — see module docstring).
        # The sampled ROW INDICES don't depend on the residual, so callers in
        # a scan precompute them (fresh_idx) — a jax.random.permutation here
        # would serialize a 32x sort chain inside the layer scan.
        expired = new_cluster_size < cfg.threshold_ema_dead_code
        if fresh_idx is not None:
            fresh = xs[fresh_idx]
        else:
            fresh = _sample_vectors(jax.random.fold_in(key, 1), xs, bins)
        new_embed = jnp.where(expired[:, None], fresh, new_embed)
        new_embed_avg = jnp.where(expired[:, None], fresh, new_embed_avg)
        new_cluster_size = jnp.where(
            expired,
            jnp.full_like(new_cluster_size, cfg.threshold_ema_dead_code),
            new_cluster_size,
        )

    def mix(new, old):
        return jnp.where(active, new, old)

    return (
        quantized,
        idx,
        inited_q,  # already conditioned on `active` via need_init
        mix(new_cluster_size, cluster_size_q),
        mix(new_embed, embed_q),
        mix(new_embed_avg, embed_avg_q),
    )


def rvq_train_forward(
    cfg: RVQConfig,
    state: RVQState,
    x: jnp.ndarray,  # (B, T, D)
    key: jax.Array,
    n_q: Optional[int] = None,
):
    """Full RVQ training forward (ddp_core_vq.py:367-418).

    Gradient semantics match the reference exactly: each layer applies its own
    straight-through estimator, so residuals past layer 0 are gradient-free
    and only layer 0's commit loss trains the encoder; the summed quantized
    output carries an identity gradient to `x`.

    Returns (quantized_out (B,T,D) straight-through,
    indices (n_q, B, T) int32 with -1 for dropped layers,
    commit_losses (n_q,) with 0 for dropped,
    sub_quants (n_q, B, T, D) with -1.0 for dropped,
    new_state).
    """
    n_q = n_q or cfg.num_quantizers
    B, T, D = x.shape
    x32 = x.astype(jnp.float32)
    flat = x32.reshape(B * T, D)

    # quantizer dropout: keep `cutoff` layers this step (ddp :378-380)
    if cfg.quantize_dropout and cfg.rand_num_quant:
        choice_key, key = jax.random.split(key)
        options = jnp.asarray(cfg.rand_num_quant, jnp.int32)
        cutoff = jax.random.choice(choice_key, options)
    else:
        cutoff = jnp.int32(n_q)

    keys = jax.random.split(key, n_q)
    layer_ids = jnp.arange(n_q)

    # q0 at reduced time resolution (ddp :354-356, :396-406): quantizer 0 runs
    # on a nearest-resized T//2 input and its outputs are nearest-upsampled
    # back; affects the TRAINING forward only (encode/decode treat all layers
    # uniformly, matching the reference).
    start_layer = 0
    q0_outputs = None
    if cfg.q0_ds_ratio > 1:
        t_ds = T // 2  # reference hardcodes tt//2 regardless of the ratio
        x_ds = _nearest_time_resize(x32, t_ds).reshape(B * t_ds, D)
        q0, idx0, i0, c0, e0, a0 = _train_one_quantizer(
            cfg, x_ds, state.inited[0], state.cluster_size[0],
            state.embed[0], state.embed_avg[0], jnp.bool_(True), keys[0],
        )
        q0_ste = x_ds + lax.stop_gradient(q0 - x_ds)
        commit0 = jnp.mean((lax.stop_gradient(q0) - x_ds) ** 2) * cfg.commitment_weight
        q0_up = _nearest_time_resize(q0_ste.reshape(B, t_ds, D), T)
        idx0_up = _nearest_time_resize(
            idx0.reshape(B, t_ds, 1).astype(jnp.float32), T
        )[..., 0].astype(jnp.int32)
        flat = (x32 - q0_up).reshape(B * T, D)
        q0_outputs = (idx0_up, commit0, q0_up, (i0, c0, e0, a0))
        start_layer = 1

    # hoist the expiry-resample row indices out of the scan (one vmapped
    # permutation instead of 32 serial sorts; _sample_vectors semantics)
    n_scan = n_q - start_layer
    N = flat.shape[0]
    bins = cfg.codebook_size
    if n_scan == 0:
        # n_q=1 with the q0 path active: everything came from quantizer 0
        idx0_up, commit0, q0_up, (i0, c0, e0, a0) = q0_outputs
        new_state = RVQState(
            inited=state.inited.at[0].set(jnp.maximum(i0, state.inited[0])),
            cluster_size=state.cluster_size.at[0].set(c0),
            embed=state.embed.at[0].set(e0),
            embed_avg=state.embed_avg.at[0].set(a0),
        )
        return (
            q0_up.reshape(B, T, D).astype(x.dtype),
            idx0_up[None],
            commit0[None],
            q0_up.reshape(1, B, T, D),
            new_state,
        )
    if cfg.expiry_mode == "effective":
        # One SHARED permutation + per-layer random offsets instead of a
        # fresh permutation per layer: n_scan vmapped `random.permutation`
        # draws lower to n_scan sort kernels whose compile alone cost ~17 min
        # on the axon remote compiler (vs ~4 min for the whole rest of the
        # step; see artifacts/expiry_compile_r5.json). Each layer still gets
        # `bins` DISTINCT, marginally-uniform row indices (a random window of
        # the shared permutation), which is all expiry resampling needs — the
        # reference itself falls back to sampling WITH replacement when the
        # batch is short (ddp_core_vq.py:65-73).
        e_key = jax.random.fold_in(key, 7)
        if EXPIRY_PER_LAYER_DRAW:  # round-4 draw, kept for the A/B hook
            e_keys = jax.vmap(lambda k: jax.random.fold_in(k, 1))(
                keys[start_layer:]
            )
            if N >= bins:
                fresh_idx_all = jax.vmap(
                    lambda k: jax.random.permutation(k, N)[:bins]
                )(e_keys)
            else:
                fresh_idx_all = jax.vmap(
                    lambda k: jax.random.randint(k, (bins,), 0, N)
                )(e_keys)
        elif N >= bins:
            perm = jax.random.permutation(e_key, N)
            offs = jax.random.randint(
                jax.random.fold_in(e_key, 1), (n_scan,), 0, N
            )
            windows = (offs[:, None] + jnp.arange(bins)[None, :]) % N
            fresh_idx_all = perm[windows]
        else:
            fresh_idx_all = jax.random.randint(e_key, (n_scan, bins), 0, N)
    else:
        fresh_idx_all = jnp.zeros((n_scan, bins), jnp.int32)

    # ---- Phase A: per-layer codebook search (serial, gradient-free) -------
    # The whole layer chain runs under stop_gradient: per the reference's STE
    # structure only layer 0's commit loss and the summed output's identity
    # path carry gradients (see docstring), and both are reconstructed
    # exactly in Phase C below. Two variants behind one runtime cond:
    #   slow — the full _train_one_quantizer scan (kmeans init mid-chain)
    #   fast — a 4-kernel scan body (distance, argmax, gather, subtract);
    #          EMA/expiry happen vectorized over all layers in Phase B,
    #          which removes ~2/3 of the serial per-layer kernel latency
    acts = layer_ids[start_layer:] < cutoff  # (n_scan,) monotone
    act_f = acts.astype(jnp.float32)[:, None, None]
    flat_sg = lax.stop_gradient(flat)
    embed_slice = state.embed[start_layer:n_q]
    cluster_slice = state.cluster_size[start_layer:n_q]
    avg_slice = state.embed_avg[start_layer:n_q]
    inited_slice = state.inited[start_layer:n_q]

    def slow_path(_):
        def step(residual, xs):
            layer_id, k, inited_q, cluster_q, embed_q, avg_q, fresh_idx = xs
            active = layer_id < cutoff
            quantized, idx, n_inited, n_cluster, n_embed, n_avg = (
                _train_one_quantizer(
                    cfg, residual, inited_q, cluster_q, embed_q, avg_q,
                    active, k, fresh_idx=fresh_idx,
                )
            )
            new_residual = residual - quantized * active.astype(residual.dtype)
            return new_residual, (idx, quantized, n_inited, n_cluster,
                                  n_embed, n_avg)

        xs = (
            layer_ids[start_layer:],
            keys[start_layer:],
            inited_slice,
            cluster_slice,
            embed_slice,
            avg_slice,
            fresh_idx_all,
        )
        _, ys = lax.scan(step, flat_sg, xs, unroll=TRAIN_SCAN_UNROLL)
        return ys

    def fast_path(_):
        def step(residual, xs):
            embed_q, act = xs
            idx = nearest_codebook_indices(residual, embed_q)
            q = embed_q[idx]
            return residual - q * act.astype(residual.dtype), (idx, q)

        _, (idxs, qs) = lax.scan(
            step, flat_sg, (embed_slice, acts), unroll=TRAIN_SCAN_UNROLL
        )

        # ---- Phase B: EMA + expiry for ALL layers at once ----
        contrib = qs * act_f
        r_stack = flat_sg[None] - (jnp.cumsum(contrib, axis=0) - contrib)
        onehot = jax.nn.one_hot(idxs, bins, dtype=jnp.float32)  # (n, N, bins)
        r_aug = jnp.concatenate(
            [r_stack, jnp.ones((n_scan, N, 1), jnp.float32)], axis=-1
        )
        # one batched matmul: [..., :D] = per-code sums, [..., D] = counts
        sums = jnp.einsum("qnb,qnd->qbd", onehot, r_aug)
        embed_sum, counts = sums[..., :D], sums[..., D]

        decay = cfg.decay
        new_cluster = cluster_slice * decay + counts * (1.0 - decay)
        new_avg = avg_slice * decay + embed_sum * (1.0 - decay)
        total = jnp.sum(new_cluster, axis=-1, keepdims=True)
        smoothed = (
            (new_cluster + cfg.epsilon) / (total + bins * cfg.epsilon) * total
        )
        new_embed = new_avg / smoothed[..., None]
        if cfg.expiry_mode == "effective":
            expired = new_cluster < cfg.threshold_ema_dead_code
            fresh = jnp.take_along_axis(
                r_stack, fresh_idx_all[:, :, None], axis=1
            )
            new_embed = jnp.where(expired[..., None], fresh, new_embed)
            new_avg = jnp.where(expired[..., None], fresh, new_avg)
            new_cluster = jnp.where(
                expired,
                jnp.full_like(new_cluster, cfg.threshold_ema_dead_code),
                new_cluster,
            )
        mix2 = lambda new, old: jnp.where(acts[:, None], new, old)
        mix3 = lambda new, old: jnp.where(acts[:, None, None], new, old)
        return (
            idxs,
            qs,
            inited_slice,
            mix2(new_cluster, cluster_slice),
            mix3(new_embed, embed_slice),
            mix3(new_avg, avg_slice),
        )

    # expiry_mode="reference" is the reference's clobbered (inert) expiry —
    # identical to no expiry, so the fast path covers every mode
    if FORCE_SLOW_SCAN:
        idxs, qs, n_inited, n_cluster, n_embed, n_avg = slow_path(None)
    elif cfg.kmeans_init:
        all_inited = jnp.all(inited_slice > 0.5)
        idxs, qs, n_inited, n_cluster, n_embed, n_avg = lax.cond(
            all_inited, fast_path, slow_path, None
        )
    else:
        idxs, qs, n_inited, n_cluster, n_embed, n_avg = fast_path(None)

    # ---- Phase C: differentiable reconstruction (STE + commit losses) -----
    contrib = qs * act_f
    r_stack_sg = flat_sg[None] - (jnp.cumsum(contrib, axis=0) - contrib)
    sum_q = jnp.sum(contrib, axis=0)  # (N, D)
    # summed STE: value = sum of active quantized, gradient = identity into
    # the scan input iff the scan's first layer is active (cutoff can turn
    # the whole scan off when q0 runs at reduced rate)
    act0 = acts[0].astype(flat.dtype)
    quantized_out = (act0 * flat + lax.stop_gradient(sum_q - act0 * flat)).reshape(
        B, T, D
    )
    # commit losses (ddp :317-320): layer 0 differentiates through its input;
    # deeper layers' inputs are gradient-free (per-layer STE chain)
    diff0 = qs[0] - flat
    commit_first = jnp.mean(diff0 * diff0) * cfg.commitment_weight
    diff_rest = qs[1:] - r_stack_sg[1:]
    commit_rest = jnp.mean(diff_rest * diff_rest, axis=(1, 2)) * cfg.commitment_weight
    commits = jnp.concatenate([commit_first[None], commit_rest], axis=0)
    commits = jnp.where(acts, commits, 0.0)

    indices = jnp.where(acts[:, None], idxs, -1).reshape(n_q - start_layer, B, T)
    sub_quants = jnp.where(act_f > 0, qs, -1.0).reshape(n_q - start_layer, B, T, D)

    new_state = RVQState(
        inited=state.inited.at[start_layer:n_q].set(n_inited),
        cluster_size=state.cluster_size.at[start_layer:n_q].set(n_cluster),
        embed=state.embed.at[start_layer:n_q].set(n_embed),
        embed_avg=state.embed_avg.at[start_layer:n_q].set(n_avg),
    )

    if q0_outputs is not None:
        idx0_up, commit0, q0_up, (i0, c0, e0, a0) = q0_outputs
        quantized_out = quantized_out + q0_up.reshape(B, T, D)
        indices = jnp.concatenate([idx0_up[None], indices], axis=0)
        commits = jnp.concatenate([commit0[None], commits], axis=0)
        sub_quants = jnp.concatenate(
            [q0_up.reshape(1, B, T, D), sub_quants], axis=0
        )
        new_state = RVQState(
            inited=new_state.inited.at[0].set(jnp.maximum(i0, state.inited[0])),
            cluster_size=new_state.cluster_size.at[0].set(c0),
            embed=new_state.embed.at[0].set(e0),
            embed_avg=new_state.embed_avg.at[0].set(a0),
        )

    quantized_out = quantized_out.astype(x.dtype)
    return quantized_out, indices, commits, sub_quants, new_state


def codebook_health(cfg: RVQConfig, state: RVQState):
    """Traced codebook-health scalars for training-loop monitoring.

    GAN+EMA failure modes (dead codes accumulating, codebook collapse) show
    up over thousands of steps; the reference surfaces nothing equivalent —
    its trainers log losses only. Returns:
      * dead_codes: total codes with EMA usage below threshold_ema_dead_code
        (summed over all layers);
      * usage_perplexity: exp(entropy) of the EMA cluster-size distribution,
        averaged over layers, normalized by codebook_size into (0, 1] —
        1.0 = perfectly uniform usage, ->0 = collapse onto few codes.
    """
    cs = state.cluster_size.astype(jnp.float32)  # (n_q, bins)
    dead = jnp.sum((cs < cfg.threshold_ema_dead_code).astype(jnp.float32))
    p = cs / jnp.maximum(jnp.sum(cs, axis=-1, keepdims=True), 1e-9)
    entropy = -jnp.sum(jnp.where(p > 0, p * jnp.log(jnp.maximum(p, 1e-12)), 0.0), axis=-1)
    perplexity = jnp.mean(jnp.exp(entropy)) / cfg.codebook_size
    return dead, perplexity


def rvq_inference(
    cfg: RVQConfig,
    state: RVQState,
    x: jnp.ndarray,  # (B, T, D)
    n_q: Optional[int] = None,
):
    """Eval-mode forward: quantize with no state updates, no dropout.

    Equivalent to the reference's rq forward under model.eval()
    (CostumeQuantizer.inference :77-96 -> ddp forward with training=False).
    Returns (quantized_out (B,T,D), indices (n_q,B,T), sub_quants (n_q,B,T,D)).

    With PALLAS_RVQ on, the codebook searches run in the fused Pallas kernel
    (quant/rvq_pallas.py: bf16 MXU distances, residual held in VMEM —
    measured ~16% faster on the op at 128k tokens/nq32). Tokens can differ
    from the fp32 scan near codebook-distance ties; the flag is therefore
    opt-in (production bf16 serving), default off for bit-exact parity.
    """
    n_q = n_q or cfg.num_quantizers
    B, T, D = x.shape
    if PALLAS_RVQ:
        from funcodec_tpu.quant.rvq_pallas import rvq_encode_pallas

        indices, quantized = rvq_encode_pallas(x, state.embed, n_q)
        # per-layer codewords as a lazy gather: DCE'd when the caller only
        # consumes (quantized, indices)
        subq = jax.vmap(lambda e, i: e[i])(state.embed[:n_q], indices)
        return quantized.astype(x.dtype), indices, subq.astype(x.dtype)
    flat = x.reshape(B * T, D).astype(jnp.float32)

    def step(residual, embed_q):
        idx = nearest_codebook_indices(residual, embed_q)
        quantized = embed_q[idx]
        return residual - quantized, (idx, quantized)

    _, (idxs, quants) = lax.scan(step, flat, state.embed[:n_q])
    quantized_out = jnp.sum(quants, axis=0).reshape(B, T, D).astype(x.dtype)
    return (
        quantized_out,
        idxs.reshape(n_q, B, T),
        quants.reshape(n_q, B, T, D).astype(x.dtype),
    )
