"""Tracing/profiling (SURVEY.md §5 tracing row): jax.profiler integration +
fence-based stage timing for the bench harness.

`trace(dir)` wraps a region in a jax.profiler trace (xprof/TensorBoard
compatible). `annotate(name)` marks host-side spans (decode, feed, write) so
they show up alongside device ops in the trace viewer.

`stage_times` measures per-stage wall time with *scalar-fetch fences* — on
the axon relay, `block_until_ready` does not actually block (see
.claude/skills/verify/SKILL.md), so each stage is forced by pulling a
scalar to host. Bench-harness only; never in the hot path.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str | None):
    """jax.profiler.trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(str(log_dir)):
        yield


def annotate(name: str):
    """Named host-span annotation visible in profiler traces."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def _force(x) -> float:
    """Fence: pull a scalar derived from x to host, forcing execution."""
    import jax.numpy as jnp

    return float(jnp.asarray(x).sum())


def stage_times(audio, lengths, cfg, backend: str = "pallas", reps: int = 3):
    """Wall time per chain stage (seconds), scalar-fetch fenced.

    Returns dict stage -> seconds for: preemph, logmel (fused kernel or
    rfft path), features (dct/lifter/deltas/cmvn). Includes the relay fetch
    latency per stage, so treat numbers as relative weights, not absolutes.
    """
    import jax

    from mfcc_tpu.ops import chain

    def run_preemph():
        return chain.zero_beyond(chain.preemphasis(audio, cfg.preemph), lengths)

    def run_logmel():
        if backend == "pallas":
            from mfcc_tpu.kernels import fused_logmel_stages

            return fused_logmel_stages(audio, lengths, cfg)["logmel"]
        return chain.logmel_stages(audio, lengths, cfg)["logmel"]

    def run_full():
        feat, _ = chain.extract_batch(audio, lengths, cfg, backend=backend)
        return feat

    out = {}
    for name, fn in [("preemph", run_preemph), ("logmel", run_logmel), ("full", run_full)]:
        jfn = jax.jit(fn)
        _force(jfn())  # compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _force(jfn())
            best = min(best, time.perf_counter() - t0)
        out[name] = best
    out["features_minus_logmel"] = max(0.0, out["full"] - out["logmel"])
    return out
