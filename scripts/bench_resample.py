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

    from mfcc_tpu.pipeline import resample_layout

    g = np.random.default_rng(0)
    rows = {}
    for cname in ("mfcc39_48k", "classic13_deltas"):
        cfg = named_config(cname)
        sr_in = cfg.input_sample_rate or cfg.sample_rate
        sigs = [g.standard_normal(sr_in * SEC) for _ in range(B)]
        lay = resample_layout(cfg, sr_in * SEC)
        variants = [("", None)] if lay is None else [
            ("_flat", None), ("", lay)]
        for tag, vlay in variants:
            bb = pad_batch(sigs, cfg, bucket_len=sr_in * SEC, layout=vlay)
            audio = jnp.asarray(bb.audio)
            lengths = jnp.asarray(bb.lengths)
            ms = slope_ms(
                lambda a, l=lengths, c=cfg: chain.extract_batch(
                    a, l, c, backend="pallas")[0],
                audio,
            )
            rows[f"{cname}{tag}_ms_per_step"] = round(ms, 3)
            rows[f"{cname}{tag}_audio_s_per_s"] = round(B * SEC / (ms / 1e3), 0)
            if vlay is not None:
                # production default: i16 feed rows (stream_batches_mp
                # dtype="i16"), converted on device — halves the feed
                # bytes the harness's perturbation pass touches too
                a16 = jnp.asarray(np.clip(
                    np.asarray(bb.audio) * 3000, -32768, 32767
                ).astype(np.int16))
                ms = slope_ms(
                    lambda a, l=lengths, c=cfg: chain.extract_batch(
                        a, l, c, backend="pallas")[0],
                    a16,
                )
                rows[f"{cname}_i16_ms_per_step"] = round(ms, 3)
                rows[f"{cname}_i16_audio_s_per_s"] = round(
                    B * SEC / (ms / 1e3), 0)

    x48 = jnp.asarray(
        g.standard_normal((B, 48000 * SEC)).astype(np.float32)
    )
    for method in ("pallas", "xla"):
        ms = slope_ms(
            lambda a, m=method: resample.resample_batch(a, 48000, 16000, method=m),
            x48,
        )
        rows[f"resample_{method}_ms_per_step"] = round(ms, 3)
    lay48 = resample_layout(named_config("mfcc39_48k"), 48000 * SEC)
    xb = jnp.asarray(resample.to_blocked_numpy(np.asarray(x48), lay48))
    ms = slope_ms(lambda a: resample.resample_blocked(a, lay48), xb)
    rows["resample_blocked_ms_per_step"] = round(ms, 3)

    print(json.dumps({
        "metric": "resample_48k",
        "platform": jax.default_backend(),
        "batch": B, "utterance_s": SEC,
        **rows,
        "note": "r3: host-blocked feed layout (pad_batch(layout=...)) makes "
                "the device resample two MXU dots at fp32-HIGHEST — no "
                "input relayout. History at b64x10s: dilated conv 17.4 ms "
                "-> XLA blocked matmul 4.8 -> pallas kernel 1.78 (0.54 "
                "host retile) -> blocked dots ~0.55; e2e 35k (r1) -> 244k "
                "(r2) -> ~420k audio-s/s i16 (r3). The *_flat rows keep "
                "the r2 flat-input path honest for comparison. r5: "
                "device_layout now routes to the IN-KERNEL fused resample "
                "(ResampleSlabLayout, docs/KERNEL.md 7c), so the "
                "mfcc39_48k/_i16 rows measure that path.",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
