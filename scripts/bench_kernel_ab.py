"""Interleaved A/B bench of kernel variants (relay jitter ~10% run-to-run,
so A and B are measured alternately and compared pairwise).

Currently wired to _RADIX4_SPLIT_MEL (per-stage mel projection vs the
[FBLK, 4N2] concat + full-width square). Usage: python scripts/bench_kernel_ab.py
"""

from __future__ import annotations

import pathlib
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

B, SECONDS, I1, I2, PAIRS = 64, 10, 5, 205, 9


def main() -> int:
    import jax
    import jax.numpy as jnp

    from mfcc_tpu.config import named_config
    from mfcc_tpu.kernels import frontend
    from mfcc_tpu.ops import chain
    from mfcc_tpu.pipeline import pad_batch

    cfg = named_config("classic13_deltas")
    g = np.random.default_rng(0)
    bb = pad_batch(
        [g.standard_normal(16000 * SECONDS) for _ in range(B)],
        cfg, bucket_len=16000 * SECONDS,
    )
    audio, lengths = jnp.asarray(bb.audio), jnp.asarray(bb.lengths)

    def build(split_mel: bool):
        frontend._RADIX4_SPLIT_MEL = split_mel

        @partial(jax.jit, static_argnames=("iters",))
        def chained(audio, lengths, iters):
            def body(_, i):
                f, _m = chain.extract_batch(
                    audio * (1.0 + 1e-6 * i), lengths, cfg, backend="pallas"
                )
                return 0, f.sum()
            _, outs = jax.lax.scan(body, 0, jnp.arange(iters, dtype=jnp.float32))
            return outs.sum()

        # trace/compile NOW, while the flag is set
        float(chained(audio, lengths, I1))
        float(chained(audio, lengths, I2))
        return chained

    fn_a = build(False)  # baseline: concat + full-width square
    fn_b = build(True)   # split per-stage mel projection

    # numerical check first: variants must agree to fp32 noise
    frontend._RADIX4_SPLIT_MEL = False
    fa, _ = jax.jit(lambda a, l: chain.extract_batch(a, l, cfg, backend="pallas"))(audio, lengths)
    frontend._RADIX4_SPLIT_MEL = True
    fb, _ = jax.jit(lambda a, l: chain.extract_batch(a, l, cfg, backend="pallas"))(audio, lengths)
    err = float(jnp.abs(fa - fb).max())
    print(f"max |A-B| on features: {err:.3e}")
    assert err == 0.0, f"kernel variants diverged: max|A-B| = {err:.3e}"

    def slope(fn):
        t0 = time.time(); float(fn(audio, lengths, I1)); a = time.time() - t0
        t0 = time.time(); float(fn(audio, lengths, I2)); b = time.time() - t0
        return (b - a) / (I2 - I1)

    rows = []
    for _ in range(PAIRS):
        rows.append((slope(fn_a), slope(fn_b)))
    ams = sorted(r[0] for r in rows)[PAIRS // 2] * 1e3
    bms = sorted(r[1] for r in rows)[PAIRS // 2] * 1e3
    print("pairs (ms A, ms B):", [(round(a * 1e3, 3), round(b * 1e3, 3)) for a, b in rows])
    print(f"median A (concat): {ams:.3f} ms   median B (split): {bms:.3f} ms   "
          f"B/A: {bms / ams:.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
