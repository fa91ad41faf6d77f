"""Worker for the 2-process multi-host feeding test (see test_multihost_feed).

Each process owns 2 virtual CPU devices (4 global). Process p contributes
the local half of a seeded global batch; put_batch must assemble the global
array from per-process addressable shards, and a jitted global reduction
must see ALL rows (a plain device_put of host data would either fail or
silently drop the other process's half).
"""

import json
import sys


def main():
    port, pid = sys.argv[1], int(sys.argv[2])
    out_path = sys.argv[3]

    import jax

    # sitecustomize pre-imports jax on the axon TPU platform; runtime config
    # updates still work before backend init (same trick as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from funcodec_tpu.parallel.mesh import put_batch

    assert jax.process_count() == 2
    assert len(jax.devices()) == 4, jax.devices()

    mesh = Mesh(np.array(jax.devices()), axis_names=("data",))

    # global batch rows 0..3 are seeded and known to both processes;
    # process p holds rows [2p, 2p+2) (reference rank-sharding semantics)
    full = np.arange(4 * 8, dtype=np.float32).reshape(4, 8) + 1.0
    local = full[2 * pid : 2 * pid + 2]
    batch = put_batch({"speech": local}, mesh)
    arr = batch["speech"]
    assert arr.shape == (4, 8), arr.shape

    # every process must see the GLOBAL reduction over all four rows
    rep = NamedSharding(mesh, P())
    dsh = NamedSharding(mesh, P("data"))

    @jax.jit
    def global_stats(x):
        return jnp.sum(x), jnp.sum(x * x)

    s, ss = jax.jit(
        global_stats, in_shardings=(dsh,), out_shardings=(rep, rep)
    )(arr)
    got = {"sum": float(s), "sumsq": float(ss)}
    want = {"sum": float(full.sum()), "sumsq": float((full * full).sum())}
    ok = all(abs(got[k] - want[k]) < 1e-3 for k in want)

    # addressable shards must hold exactly this process's rows
    for shard in arr.addressable_shards:
        row0 = shard.index[0].start or 0
        np.testing.assert_array_equal(np.asarray(shard.data), full[row0 : row0 + 1])

    with open(out_path, "w") as f:
        json.dump({"ok": bool(ok), "got": got, "want": want, "pid": pid}, f)
    print("worker", pid, "ok" if ok else "MISMATCH", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
