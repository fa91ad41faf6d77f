"""Worker for the 2-process REAL GAN step test (VERDICT r3 item 8).

Modes:
  single: one process, no mesh — the reference trajectory.
  dist:   2 processes x 2 virtual CPU devices (4 global); each process feeds
          its LOCAL half of the same seeded global batch through put_batch
          and runs the production shared-forward GAN step over the global
          mesh. Every process must observe the same losses and end in the
          same state as the single-process run — the last untested sentence
          of parallel/mesh.py ("the same mesh spans all hosts").

Output JSON: per-step stats trajectory + per-leaf [sum, sumsq] fingerprints
of params / disc_params / rvq_state.
"""

import json
import sys


def _fingerprint(tree):
    import jax
    import numpy as np

    leaves = jax.tree_util.tree_leaves(jax.device_get(tree))
    return [
        [float(np.sum(np.asarray(x, np.float64))),
         float(np.sum(np.asarray(x, np.float64) ** 2))]
        for x in leaves
    ]


def main():
    mode = sys.argv[1]
    out_path = sys.argv[2]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    if mode == "dist":
        port, pid = sys.argv[3], int(sys.argv[4])
        jax.config.update("jax_num_cpu_devices", 2)
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}", num_processes=2,
            process_id=pid,
        )
        assert jax.process_count() == 2 and len(jax.devices()) == 4
    else:
        pid = 0
        jax.config.update("jax_num_cpu_devices", 1)

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from funcodec_tpu.models.discriminators import MultiScaleSTFTDiscriminator
    from funcodec_tpu.models.encodec import Encodec, EncodecConfig
    from funcodec_tpu.models.quantizer import Quantizer, QuantizerConfig
    from funcodec_tpu.models.seanet import SEANetConfig, SEANetDecoder, SEANetEncoder
    from funcodec_tpu.parallel.mesh import put_batch
    from funcodec_tpu.train.step import (
        create_gan_train_state,
        make_gan_train_step,
        make_optimizer,
    )

    seanet = SEANetConfig(
        n_filters=4, dimension=16, ratios=(4, 2), norm="time_group_norm"
    )
    enc, dec = SEANetEncoder(seanet), SEANetDecoder(seanet)
    q = Quantizer(
        QuantizerConfig(
            input_size=16, codebook_size=16, num_quantizers=4, ema_decay=0.9,
            kmeans_init=True, sampling_rate=16000, encoder_hop_length=8,
        )
    )
    model = Encodec(
        EncodecConfig(odim=16, multi_spectral_window_powers_of_two=(5, 6)),
        enc, q, dec,
    )
    disc = MultiScaleSTFTDiscriminator(
        filters=4, n_ffts=(256,), hop_lengths=(64,), win_lengths=(256,)
    )

    class WrapDisc:
        def init(self, key):
            return disc.init(key)

        def __call__(self, params, x, precision=None):
            return disc(params, x, precision=precision)

    params, rvq_state = model.init(jax.random.PRNGKey(0))
    disc_params = WrapDisc().init(jax.random.PRNGKey(1))
    # sgd, same rationale as tests/test_dp_exactness.py:78-81
    opt_g = make_optimizer(lr=1e-2, name="sgd")
    opt_d = make_optimizer(lr=1e-2, name="sgd")
    state = create_gan_train_state(params, disc_params, rvq_state, opt_g, opt_d)
    raw_step = make_gan_train_step(model, WrapDisc(), opt_g, opt_d,
                                   shared_forward=True)

    if mode == "dist":
        mesh = Mesh(np.array(jax.devices()), axis_names=("data",))
        rep, dsh = NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))
        step = jax.jit(
            raw_step,
            in_shardings=(rep, {"speech": dsh}, rep),
            out_shardings=(rep, rep),
        )
    else:
        mesh = None
        step = jax.jit(raw_step)

    full = np.random.RandomState(0).randn(8, 1024).astype(np.float32) * 0.3
    local = full if mode == "single" else full[4 * pid : 4 * pid + 4]
    rng = jax.random.PRNGKey(7)
    trajectory = []
    for _ in range(3):
        batch = put_batch({"speech": local}, mesh)
        state, stats = step(state, batch, rng)
        trajectory.append({k: float(v) for k, v in stats.items()})

    res = {
        "pid": pid,
        "trajectory": trajectory,
        "params": _fingerprint(state.params),
        "disc_params": _fingerprint(state.disc_params),
        "rvq_state": _fingerprint(state.rvq_state),
    }
    with open(out_path, "w") as f:
        json.dump(res, f)
    print("worker", mode, pid, "done", flush=True)


if __name__ == "__main__":
    main()
