"""Serving-latency bench: per-step device latency of the single-utterance
(batch-1) offline chain and of the streaming blocks.

Throughput (bench.py) answers "how much audio per second per chip";
serving additionally cares about the latency of one utterance / one
streaming block. Device-side latency is measured with the chained-scan
slope method (see bench.py header — `block_until_ready` does not wait
through the relay; the slope between two chained iteration counts cancels
the relay fetch). True request round-trip on this dev relay adds ~40 ms
RTT, an environment artifact (E2E_r02.json decomposition); on a TPU VM the
H2D/D2H adds only PCIe microseconds.

Emits one JSON document; commit as LATENCY_r{N}.json.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def slope_ms(fn, i1=8, i2=108, reps=5):
    fn(i1), fn(i2)
    out = []
    for _ in range(reps):
        t0 = time.time(); fn(i1); a = time.time() - t0
        t0 = time.time(); fn(i2); b = time.time() - t0
        out.append((b - a) / (i2 - i1) * 1e3)
    return sorted(out)[len(out) // 2]


def main() -> int:
    import jax
    import jax.numpy as jnp

    from mfcc_tpu.config import named_config
    from mfcc_tpu.ops import chain
    from mfcc_tpu.pipeline import pad_batch
    from mfcc_tpu.pipeline.streaming import _make_base_block, _make_finalize

    cfg = named_config("classic13_deltas")
    platform = jax.default_backend()
    backend = "pallas" if platform == "tpu" else "jnp"
    g = np.random.default_rng(0)
    rows = {}

    # -- batch-1 offline latency per utterance length ------------------------
    for sec in (1, 10):
        n = 16000 * sec
        bb = pad_batch([g.standard_normal(n)], cfg, bucket_len=n)
        audio, lengths = jnp.asarray(bb.audio), jnp.asarray(bb.lengths)

        @partial(jax.jit, static_argnames=("iters",))
        def run(audio, lengths, iters):
            def body(_, i):
                f, _m = chain.extract_batch(
                    audio * (1 + 1e-6 * i), lengths, cfg, backend=backend
                )
                return 0, f.sum()
            _, outs = jax.lax.scan(body, 0, jnp.arange(iters, dtype=jnp.float32))
            return outs.sum()

        rows[f"offline_b1_{sec}s_ms"] = round(
            slope_ms(lambda it: float(run(audio, lengths, it))), 4)

    # -- streaming block latency (the push-path device work) -----------------
    for K in (16, 32, 128):
        base_fn, span = _make_base_block(cfg, K)
        fin_fn = _make_finalize(cfg, 2 * cfg.deltas * cfg.delta_window + K)
        xwin = jnp.asarray(g.standard_normal(span + 1), jnp.float32)
        c2 = 2 * cfg.deltas * cfg.delta_window

        @partial(jax.jit, static_argnames=("iters",))
        def run_blk(xwin, iters):
            def body(_, i):
                b = base_fn(xwin * (1 + 1e-6 * i), jnp.int32(span))
                w = jnp.pad(b, ((0, c2), (0, 0)))
                f = fin_fn(w, jnp.int32(w.shape[0]))
                return 0, f.sum()
            _, outs = jax.lax.scan(body, 0, jnp.arange(iters, dtype=jnp.float32))
            return outs.sum()

        ms = slope_ms(lambda it: float(run_blk(xwin, it)))
        rows[f"stream_block_K{K}_ms"] = round(ms, 4)
        rows[f"stream_block_K{K}_audio_ms"] = K * 10  # hop 10 ms

    doc = {
        "metric": "serving_latency_ms",
        "platform": platform,
        "backend": backend,
        "config": "classic13_deltas",
        "method": "chained-scan slope (device compute; excludes relay RTT)",
        "rows": rows,
        "note": ("streaming lookahead latency is algorithmic: "
                 "deltas*delta_window frames = 40 ms for delta+deltadelta, "
                 "plus one block of hop time"),
    }
    print(json.dumps(doc, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
