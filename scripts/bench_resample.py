"""48 kHz-path device bench (BASELINE config #5): mfcc39_48k vs
classic13_deltas step time, isolating the on-device resample stage, with
per-method rows (pallas kernel / XLA blocked matmul).

Chained-scan slope timing (see bench.py — block_until_ready does not block
through this dev environment's relay). Emits one JSON line.

    python scripts/bench_resample.py [--batch 64] [--seconds 10]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seconds", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mfcc_tpu.config import named_config
    from mfcc_tpu.ops import chain, resample
    from mfcc_tpu.pipeline import pad_batch

    B, SEC = args.batch, args.seconds

    def slope_ms(fn, x):
        @partial(jax.jit, static_argnames=("iters",))
        def chained(x, iters):
            def body(_, i):
                return 0, fn(x * (1.0 + 1e-6 * i)).sum()
            _, outs = jax.lax.scan(body, 0, jnp.arange(iters, dtype=jnp.float32))
            return outs.sum()

        chained(x, 2)

        def slope(i1, i2):
            t0 = time.time(); float(chained(x, i1)); a = time.time() - t0
            t0 = time.time(); float(chained(x, i2)); b = time.time() - t0
            return (b - a) / (i2 - i1)

        return sorted(slope(10, 410) for _ in range(5))[2] * 1e3

    g = np.random.default_rng(0)
    rows = {}
    for cname in ("mfcc39_48k", "classic13_deltas"):
        cfg = named_config(cname)
        sr_in = cfg.input_sample_rate or cfg.sample_rate
        bb = pad_batch([g.standard_normal(sr_in * SEC) for _ in range(B)],
                       cfg, bucket_len=sr_in * SEC)
        audio = jnp.asarray(bb.audio)
        lengths = jnp.asarray(bb.lengths)
        ms = slope_ms(
            lambda a, l=lengths, c=cfg: chain.extract_batch(
                a, l, c, backend="pallas")[0],
            audio,
        )
        rows[f"{cname}_ms_per_step"] = round(ms, 3)
        rows[f"{cname}_audio_s_per_s"] = round(B * SEC / (ms / 1e3), 0)

    x48 = jnp.asarray(
        g.standard_normal((B, 48000 * SEC)).astype(np.float32)
    )
    for method in ("pallas", "xla"):
        ms = slope_ms(
            lambda a, m=method: resample.resample_batch(a, 48000, 16000, method=m),
            x48,
        )
        rows[f"resample_{method}_ms_per_step"] = round(ms, 3)

    print(json.dumps({
        "metric": "resample_48k",
        "platform": jax.default_backend(),
        "batch": B, "utterance_s": SEC,
        **rows,
        "note": "r2 history at b64x10s: dilated conv 17.4 ms -> XLA blocked "
                "matmul 4.8 -> pallas kernel ~1.7 (0.54 of it pad/reshape); "
                "mfcc39_48k end-to-end 35k -> ~244k audio-s/s",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
