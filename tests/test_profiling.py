"""StepTraceCapture writes a real jax.profiler trace around compiled steps."""

import glob

import jax
import jax.numpy as jnp

from funcodec_tpu.utils.profiling import StepTraceCapture


def test_trace_capture_window(tmp_path):
    out = str(tmp_path / "trace")
    tracer = StepTraceCapture(out, start_step=2, num_steps=2)

    @jax.jit
    def step(x):
        return x * 2.0 + 1.0

    x = jnp.ones((8, 8))
    for i in range(6):
        tracer.tick(i)
        x = step(x)
    x.block_until_ready()
    tracer.stop()
    assert not tracer._active and tracer._done
    # jax writes <out>/plugins/profile/<ts>/*.trace.json.gz (or .xplane.pb)
    files = glob.glob(out + "/plugins/profile/*/*")
    assert files, f"no trace artifacts under {out}"


def test_disabled_tracer_is_noop():
    tracer = StepTraceCapture(None)
    for i in range(3):
        tracer.tick(i)
    tracer.stop()
    assert tracer._done
