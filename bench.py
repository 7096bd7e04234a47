"""Benchmark: audio-seconds/s per chip for the fused Pallas front-end
(BASELINE.json metric), batch-64 × 10 s, classic13_deltas (13 MFCC + Δ + ΔΔ).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the measured reference-chain CPU speed (341
audio-s/s per core, BASELINE.md — the reference publishes no numbers).

Timing method (see .claude/skills/verify/SKILL.md): the relay platform's
block_until_ready does not wait, so steps are chained inside one jit via
lax.scan with per-iteration input perturbation (prevents hoisting), forced
by a scalar fetch, and timed as the slope between two iteration counts
(cancels the ~40 ms fetch latency). The perturbation is O(1) — one element
poked into the scan-carried (in-place-aliased) input buffer — so the
measured step is extraction only, not input rematerialization (r4;
docs/KERNEL.md §6).
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np

CPU_BASELINE_AUDIO_S_PER_S = 341.0  # BASELINE.md measured reference chain
B, SECONDS = 64, 10
I1, I2 = 5, 105
REPS = 5


def main() -> int:
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--config", default="classic13_deltas",
                   help="any named config (e.g. logmel80 for BASELINE #3)")
    p.add_argument("--batch", type=int, default=B)
    p.add_argument("--seconds", type=int, default=SECONDS)
    p.add_argument("--all", action="store_true",
                   help="sweep every fused-path named config (one JSON line "
                        "each; the flagship prints LAST so line-parsers that "
                        "read the final line still get the headline metric)")
    args = p.parse_args()

    if args.all:
        rc = 0
        for name in ("logmel80", "ssc26", "kaldi_mfcc", "kaldi_fbank",
                     "kaldi_plp", "kaldi_spectrogram", "whisper80", "mfcc39_48k", "mfcc39_44k",
                     "classic13", "classic13_deltas"):
            rc |= bench_one(name, args.batch, args.seconds)
        return rc
    return bench_one(args.config, args.batch, args.seconds)


def bench_one(config_name: str, batch: int, seconds: int) -> int:
    import jax
    import jax.numpy as jnp

    from mfcc_tpu.config import named_config
    from mfcc_tpu.ops import chain
    from mfcc_tpu.pipeline import device_layout, pad_batch

    cfg = named_config(config_name)
    B_, SECONDS_ = batch, seconds
    g = np.random.default_rng(0)
    sr = cfg.input_sample_rate or cfg.sample_rate
    backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    # the device-optimal host feed layout (what the production feeds emit):
    # blocked polyphase rows for resampling configs, kernel chunk slabs
    # otherwise; flat [B, T] for jnp-only configs / the CPU fallback
    layout = device_layout(cfg, sr * SECONDS_) if backend == "pallas" else None
    # int16-valued PCM (what real wav decode yields; the mp feed's native
    # row dtype is i16 — io.reader stream dtype="i16")
    bb = pad_batch(
        [(g.standard_normal(sr * SECONDS_) * 3000).astype(np.int16)
         .astype(np.float32) for _ in range(B_)],
        cfg,
        bucket_len=sr * SECONDS_,
        layout=layout,
    )
    host_audio = bb.audio
    if (
        backend == "pallas"
        and layout is not None
        and hasattr(layout, "chunk")
        and not layout.extended
    ):
        # standard-mode chunk slabs ride int16 end-to-end: half the H2D
        # bytes AND half the kernel's slab HBM reads (in-kernel convert,
        # bit-parity asserted in tests/test_pallas_kernels.py)
        host_audio = host_audio.astype(np.int16)
    audio, lengths = jnp.asarray(host_audio), jnp.asarray(bb.lengths)
    in_layout = bb.layout_kind

    @partial(jax.jit, static_argnames=("iters",))
    def chained(audio, lengths, iters):
        # Per-iteration input perturbation defeats hoisting at O(1) cost:
        # the audio buffer is the scan CARRY (XLA aliases it in place) and
        # one element is poked per step. The r1-r3 bench multiplied the
        # whole input instead — an O(B·T) copy per step that charged the
        # extraction step for input materialization (production overlaps
        # that with H2D double-buffering) and cost 15-20% at batch 64 and
        # ~25% at batch 256 (docs/KERNEL.md §6).
        def body(carry, i):
            slc = carry[:1, :1, :1] if carry.ndim == 3 else carry[:1, :1]
            if jnp.issubdtype(carry.dtype, jnp.integer):
                pert = slc + i.astype(carry.dtype)  # i16 slab feed
            else:
                pert = slc + 1e-7 * i
            a = jax.lax.dynamic_update_slice(carry, pert, (0,) * carry.ndim)
            feat, _ = chain.extract_batch(
                a, lengths, cfg, backend=backend, input_layout=in_layout
            )
            return a, feat.sum()
        _, outs = jax.lax.scan(
            body, audio, jnp.arange(iters, dtype=jnp.float32)
        )
        return outs.sum()

    # warm both programs (first remote compile can take minutes; retry once)
    for attempt in range(2):
        try:
            float(chained(audio, lengths, I1))
            float(chained(audio, lengths, I2))
            break
        except Exception:
            if attempt:
                raise
            time.sleep(5)

    # median of slope estimates: single runs jitter +-30% through the relay
    slopes = []
    for _ in range(REPS):
        t0 = time.time()
        float(chained(audio, lengths, I1))
        ta = time.time() - t0
        t0 = time.time()
        float(chained(audio, lengths, I2))
        tb = time.time() - t0
        slopes.append((tb - ta) / (I2 - I1))
    best = sorted(slopes)[len(slopes) // 2]

    value = B_ * SECONDS_ / best
    print(
        json.dumps(
            {
                "metric": "audio_seconds_per_s_per_chip",
                "value": round(value, 1),
                "unit": "audio-s/s",
                "vs_baseline": round(value / CPU_BASELINE_AUDIO_S_PER_S, 2),
                "platform": jax.default_backend(),
                "backend": backend,
                "config": config_name,
                "ms_per_step": round(best * 1e3, 4),
                "batch": B_,
                "utterance_s": SECONDS_,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
