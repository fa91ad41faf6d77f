"""Decompose CLI serving wall time into stages (VERDICT r2 item 2 follow-up).

The e2e CLI number on this environment rides the axon tunnel (host<->TPU
over a network link), which is ~4 orders of magnitude slower than the PCIe
link of a real v5e host. This probe measures each stage of the serving
pipeline separately so the e2e number decomposes exactly:

  - construct : Speech2Token build (model init on device + jit setup)
  - compile   : first dispatch (trace + XLA compile, cached after)
  - h2d       : staging one padded batch onto the device (fp32 vs int16)
  - compute   : the encode+decode computation alone (device-resident args)
  - d2h       : fetching tokens + int16 PCM for one batch
  - host_read : wav decode + resample-check + wrap-pad for one batch
  - host_write: PCM/token writing for one batch

Writes /tmp/probe_cli_stages.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = "/tmp/probe_cli_stages.log"


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def main():
    import jax
    import jax.numpy as jnp

    from funcodec_tpu.cli.codec_inference import Speech2Token, _bucket_length
    from funcodec_tpu.data.wav_io import read_wav, write_wav

    config = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "egs/LibriTTS/codec/conf/encodec_16k_n32_600k_step.yaml",
    )
    root = "/tmp/cli_bench"
    assert os.path.exists(f"{root}/wav.scp"), "run bench_cli_serving first"
    keys = [l.split()[0] for l in open(f"{root}/wav.scp")][:64]
    paths = {l.split()[0]: l.split()[1] for l in open(f"{root}/wav.scp")}
    r = {}

    t0 = time.perf_counter()
    model = Speech2Token(config, "", dtype="bfloat16", bit_width=None)
    r["construct_s"] = time.perf_counter() - t0
    log(f"construct: {r['construct_s']:.2f}s")

    # Every stage below is best-of-N: the axon tunnel adds 4-9 s of
    # run-to-run wall spread (VERDICT r3 weak 3) and single-shot stage
    # numbers were internally inconsistent in round 3.
    N_REPS = 3

    def best_of(fn, n=N_REPS):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t0)
        return best, out

    # host read: decode + pad one B=64 batch
    def host_read():
        arrs = [read_wav(paths[k])[1] for k in keys]
        lengths = [a.shape[0] for a in arrs]
        target = _bucket_length(max(lengths), model.hop_length)
        batch = np.stack([
            np.pad(a, (0, target - a.shape[0]), mode="wrap") for a in arrs
        ]).astype(np.float32)
        return batch, lengths

    r["host_read_s"], (batch, lengths) = best_of(host_read)
    log(f"host_read (decode+pad B=64, best of {N_REPS}): {r['host_read_s']:.2f}s")
    nbytes_f32 = batch.nbytes

    # h2d fp32 vs int16 (fence via scalar fetch; block_until_ready is a
    # no-op on axon)
    def h2d_f32():
        dev = jnp.asarray(batch)
        float(jnp.sum(dev[0, :8]))
        return dev

    r["h2d_f32_s"], _ = best_of(h2d_f32)
    i16 = (batch * 32768.0).astype(np.int16)

    def h2d_i16():
        dev16 = jnp.asarray(i16)
        float(jnp.sum(dev16[0, :8].astype(jnp.float32)))
        return dev16

    r["h2d_i16_s"], _ = best_of(h2d_i16)
    log(f"h2d (best of {N_REPS}): fp32 {nbytes_f32/1e6:.1f}MB {r['h2d_f32_s']:.2f}s "
        f"({nbytes_f32/1e6/r['h2d_f32_s']:.1f} MB/s) | int16 {r['h2d_i16_s']:.2f}s")

    # compile (first dispatch) then compute-only (device-resident, no fetch)
    t0 = time.perf_counter()
    out = model.dispatch(batch, need_recon=True, bit_width=None,
                         pcm16_ilens=lengths)
    float(jnp.sum(out["recon_pcm16"][0, :8].astype(jnp.float32)))
    r["first_dispatch_s"] = time.perf_counter() - t0
    log(f"first dispatch (compile+run): {r['first_dispatch_s']:.2f}s")

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = model.dispatch(batch, need_recon=True, bit_width=None,
                             pcm16_ilens=lengths)
        float(jnp.sum(out["recon_pcm16"][0, :8].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    r["compute_s"] = best
    log(f"compute (steady, incl h2d of batch + dispatch overhead): {best:.3f}s")

    # d2h: tokens + pcm16. Each rep needs FRESH device buffers — jax caches
    # the host copy after the first np.asarray of a buffer, so collecting the
    # same `out` twice measures a host memcpy, not the tunnel/PCIe transfer.
    # Dispatch anew per rep and fence compute with the scalar fetch first, so
    # the timed collect() is transfer-only.
    def d2h():
        o = model.dispatch(batch, need_recon=True, bit_width=None,
                           pcm16_ilens=lengths)
        float(jnp.sum(o["recon_pcm16"][0, :8].astype(jnp.float32)))  # compute fence
        t0 = time.perf_counter()
        res = model.collect(o, need_sub_quants=False)
        return time.perf_counter() - t0, res

    best_d2h = float("inf")
    for _ in range(N_REPS):
        dt, (tok, _, recon, _) = d2h()
        best_d2h = min(best_d2h, dt)
    r["d2h_s"] = best_d2h
    down = sum(np.asarray(x).nbytes for x in tok) + recon.nbytes
    r["d2h_mb"] = down / 1e6
    log(f"d2h (best of {N_REPS}): {down/1e6:.1f}MB {r['d2h_s']:.2f}s "
        f"({down/1e6/r['d2h_s']:.1f} MB/s)")

    # host write: PCM + codecs.txt for the batch
    os.makedirs("/tmp/probe_out", exist_ok=True)

    def host_write():
        with open("/tmp/probe_out/codecs.txt", "w") as f:
            for i, k in enumerate(keys):
                clen = int(np.ceil(lengths[i] / model.hop_length))
                write_wav(f"/tmp/probe_out/{k}.wav", recon[i][: lengths[i]], 16000)
                f.write(k + " " + json.dumps(
                    [np.asarray(x)[:, i, :clen].tolist() for x in tok]) + "\n")

    r["host_write_s"], _ = best_of(host_write)
    log(f"host_write (B=64 wavs + tokens, best of {N_REPS}): "
        f"{r['host_write_s']:.2f}s")

    audio_s = sum(lengths) / 16000
    r["audio_s_per_batch"] = audio_s
    r["device_audio_s_per_s"] = audio_s / r["compute_s"]
    # Real-host projection: PCIe >= 8 GB/s makes transfer negligible, and
    # since round 4 the pipeline fans item decode over --num_reader_threads
    # and wav-encode over --num_writer_threads (cli/codec_inference.py), so
    # the host stages divide by the pool width on a multi-core host. Project
    # for a modest 8-core inference host (the reference's recipe forks
    # njob=8-32 processes for the same reason, encoding_decoding.sh:70-98).
    # The /cores division assumes PERFECT linear thread scaling; real wav
    # decode/encode contends on allocator + GIL-adjacent numpy paths, so this
    # is an UPPER BOUND, not a measurement (advisor r4) — re-measure the
    # threaded pipeline directly when the environment has >1 core.
    cores = 8
    r["real_host_cores_assumed"] = cores
    r["real_host_projection_is_upper_bound"] = True
    proj_read = r["host_read_s"] / cores
    proj_write = r["host_write_s"] / cores
    bottleneck = max(r["compute_s"], proj_read, proj_write)
    r["real_host_projection_audio_s_per_s_upper_bound"] = audio_s / bottleneck
    r["real_host_bottleneck_stage"] = (
        "compute" if bottleneck == r["compute_s"]
        else "host_read" if bottleneck == proj_read else "host_write"
    )
    with open("/tmp/probe_cli_stages.json", "w") as f:
        json.dump(r, f, indent=2)
    log("DONE " + json.dumps(r))


if __name__ == "__main__":
    main()
