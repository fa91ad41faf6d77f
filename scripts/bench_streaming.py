"""Streaming-session latency/throughput on the real TPU (models/streaming.py).

Measures, for a causal EnCodec (14.8M-param topology, weight_norm), the
steady-state per-chunk wall latency of encode_chunk+decode_chunk round trips
at live-audio chunk sizes, and the implied real-time factor. Run on a QUIET
TPU only.

Writes /tmp/bench_streaming.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from funcodec_tpu.models.encodec import Encodec, EncodecConfig
    from funcodec_tpu.models.quantizer import Quantizer, QuantizerConfig
    from funcodec_tpu.models.seanet import (
        SEANetConfig,
        SEANetDecoder,
        SEANetEncoder,
    )
    from funcodec_tpu.models.streaming import StreamingCodecSession

    sr = 16_000
    cfg = SEANetConfig(
        causal=True, norm="weight_norm", n_filters=32, dimension=128,
        ratios=(8, 5, 4, 2), seq_model="lstm",
    )
    quant = Quantizer(
        QuantizerConfig(input_size=128, codebook_size=1024, num_quantizers=32,
                        kmeans_init=False)
    )
    model = Encodec(
        EncodecConfig(target_sample_hz=sr, audio_normalize=False),
        SEANetEncoder(cfg), quant, SEANetDecoder(cfg),
    )
    params, rvq = model.init(jax.random.PRNGKey(0))
    rvq = rvq.replace(
        embed=jnp.asarray(
            np.random.RandomState(1).randn(*rvq.embed.shape), jnp.float32
        ),
        inited=jnp.ones_like(rvq.inited),
        cluster_size=jnp.ones_like(rvq.cluster_size),
    )
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    rvq = jax.device_put(rvq, dev)

    results = {"device": str(dev), "model": "encodec nq32ds320 causal 14.8M"}
    rng = np.random.RandomState(0)
    for batch in (1, 8):
        for chunk_ms in (20, 80, 320):
            L = sr * chunk_ms // 1000
            sess = StreamingCodecSession(model, params, rvq, batch=batch)
            wav = jnp.asarray(rng.randn(batch, L).astype(np.float32) * 0.1)
            # prime + compile both directions
            toks = sess.encode_chunk(wav)
            out = sess.decode_chunk(toks)
            float(jnp.sum(out))  # fence (axon: block_until_ready insufficient)
            toks = sess.encode_chunk(wav)
            out = sess.decode_chunk(toks)
            float(jnp.sum(out))
            best = float("inf")
            for _ in range(20):
                t0 = time.perf_counter()
                toks = sess.encode_chunk(wav)
                out = sess.decode_chunk(toks)
                float(jnp.sum(out))
                best = min(best, time.perf_counter() - t0)
            rtf = (chunk_ms / 1000.0) / best  # x realtime per stream
            key = f"b{batch}_chunk{chunk_ms}ms"
            results[key] = {
                "roundtrip_ms": round(best * 1e3, 2),
                "x_realtime_per_stream": round(rtf, 1),
                "x_realtime_total": round(rtf * batch, 1),
            }
            print(key, results[key], flush=True)
    with open("/tmp/bench_streaming.json", "w") as f:
        json.dump(results, f, indent=2)
    print("DONE -> /tmp/bench_streaming.json")


if __name__ == "__main__":
    main()
