"""jax.profiler trace capture for the training/serving hot loops.

The reference's observability is thop MACs + host phase timers
(funcodec/tasks/gan_speech_codec.py:345-355, funcodec/train/reporter.py:263-280)
and ships no profiler traces. On TPU the actionable artifact is an XLA/TPU
trace (op-level timeline, HBM traffic, fusion boundaries) viewable in
TensorBoard's profile plugin or Perfetto — this module captures one around a
chosen window of already-compiled steps.

Usage (trainers): pass profile_dir + profile_start_step/profile_num_steps in
TrainerOptions; the trainer calls `tick(step)` once per iteration.
Standalone: scripts/capture_trace.py wraps the inference path.
"""

from __future__ import annotations

import logging
from typing import Optional


class StepTraceCapture:
    """Start/stop a jax.profiler trace across a window of host-loop steps.

    Starts BEFORE the first step in the window is dispatched and stops after
    the last one completes, so the trace covers whole jitted steps (per-op
    host timing is meaningless under async dispatch). Skips step 0 by default:
    tracing a compile produces a giant, useless trace.
    """

    def __init__(
        self,
        profile_dir: Optional[str],
        start_step: int = 10,
        num_steps: int = 5,
    ):
        self.profile_dir = profile_dir
        self.start_step = max(1, start_step)
        self.num_steps = max(1, num_steps)
        self._active = False
        self._done = profile_dir is None

    def tick(self, global_step: int) -> None:
        """Call once per host-loop iteration BEFORE dispatching that step."""
        if self._done:
            return
        import jax

        if not self._active and global_step >= self.start_step:
            jax.profiler.start_trace(self.profile_dir)
            self._active = True
            self._stop_at = global_step + self.num_steps
            logging.info(
                "profiler: tracing steps %d..%d -> %s",
                global_step, self._stop_at - 1, self.profile_dir,
            )
        elif self._active and global_step >= self._stop_at:
            self.stop()

    def stop(self) -> None:
        """Stop tracing if active (also call at epoch end for short epochs)."""
        if self._active:
            import jax

            # block so the trace includes completed device work, then flush
            jax.effects_barrier()
            jax.profiler.stop_trace()
            self._active = False
            self._done = True
            logging.info("profiler: trace written to %s", self.profile_dir)
