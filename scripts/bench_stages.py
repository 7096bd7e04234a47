"""Stage-level timing of the TPU step (VERDICT r1 items 7/9: publish the
breakdown of the ~1 ms step; decide whether the XLA epilogue is worth
fusing into Pallas).

Each stage variant is timed with the chained-scan construction (the only
valid method through the relay — see bench.py): iterations chained inside
one jit with per-iteration input perturbation, scalar fetch, slope between
two iteration counts. Variants:

  full        — extract_batch (fused kernel + epilogue + deltas + masking)
  kernel      — fused Pallas kernel only (logmel stages)
  epilogue    — cepstral epilogue + deltas + masking, given a precomputed
                kernel output (captured as a constant input)
  jnp_full    — the rfft twin chain end-to-end
  jnp_hotloop — rfft→|·|²→mel→log→dct on PRE-STAGED frames (the "naive
                jnp chain" of BASELINE.md, re-measured honestly)

Prints one JSON document with ms/step per variant.
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


def slope_timer(fn, i1, i2, reps=5):
    """Median slope (seconds/iter) between two chained iteration counts."""
    fn(i1), fn(i2)  # warm/compile both programs
    slopes = []
    for _ in range(reps):
        t0 = time.time()
        fn(i1)
        ta = time.time() - t0
        t0 = time.time()
        fn(i2)
        tb = time.time() - t0
        slopes.append((tb - ta) / (i2 - i1))
    return sorted(slopes)[len(slopes) // 2]


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="classic13_deltas")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--seconds", type=int, default=10)
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--variants", default="full,kernel,epilogue,jnp_full,hotloop",
                   help="comma subset of: full,kernel,epilogue,jnp_full,hotloop")
    p.add_argument("--chunk", type=int, default=None,
                   help="max_kernel_batch for the kernel variant "
                        "(0 disables chunking; default: library default)")
    p.add_argument("--perturb", choices=["audio", "lengths"], default="audio",
                   help="anti-hoisting input variation: 'audio' multiplies "
                        "the whole [B,T] array per iteration (costs an "
                        "O(B·T) elementwise pass INSIDE the timed loop); "
                        "'lengths' varies the lengths vector only (O(B), "
                        "isolates the kernel itself)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mfcc_tpu.config import named_config
    from mfcc_tpu.ops import chain
    from mfcc_tpu.pipeline import pad_batch

    cfg = named_config(args.config)
    platform = jax.default_backend()
    backend = "pallas" if platform == "tpu" else "jnp"
    g = np.random.default_rng(0)
    sr = cfg.input_sample_rate or cfg.sample_rate
    bb = pad_batch(
        [g.standard_normal(sr * args.seconds) for _ in range(args.batch)],
        cfg,
        bucket_len=sr * args.seconds,
    )
    audio, lengths = jnp.asarray(bb.audio), jnp.asarray(bb.lengths)
    I1, I2 = max(2, args.iters // 10), args.iters

    def chained(body_fn):
        @partial(jax.jit, static_argnames=("iters",))
        def run(audio, lengths, iters):
            def body(_, i):
                if args.perturb == "audio":
                    return 0, body_fn(audio * (1.0 + 1e-6 * i), lengths)
                # O(B) perturbation: alternate every row's valid length by
                # one sample — changes kernel masks/results per iteration
                # (so nothing hoists) without an O(B·T) array copy
                l = lengths - (i.astype(jnp.int32) % 2)
                return 0, body_fn(audio, l)

            _, outs = jax.lax.scan(
                body, 0, jnp.arange(iters, dtype=jnp.float32)
            )
            return outs.sum()

        return lambda it: float(run(audio, lengths, it))

    variants = set(args.variants.split(","))
    out = {"platform": platform, "backend": backend, "config": args.config,
           "batch": args.batch, "utterance_s": args.seconds, "ms": {}}

    # full chain
    def full(a, l):
        feat, _ = chain.extract_batch(a, l, cfg, backend=backend)
        return feat.sum()

    if "full" in variants:
        out["ms"]["full"] = slope_timer(chained(full), I1, I2) * 1e3

    # kernel only (fused logmel stages)
    if backend == "pallas" and "kernel" in variants:
        from mfcc_tpu.kernels import fused_logmel_stages

        kw = {}
        if args.chunk is not None:
            kw["max_kernel_batch"] = args.chunk or None

        def kernel_only(a, l):
            st = fused_logmel_stages(a, l, cfg, **kw)
            x = st.get("prefix_fp", st.get("logmel"))
            return x.sum()

        out["ms"]["kernel"] = slope_timer(chained(kernel_only), I1, I2) * 1e3

    if backend == "pallas" and "epilogue" in variants:
        from mfcc_tpu.kernels import fused_logmel_stages

        # epilogue only: capture one kernel output, time the rest
        st0 = jax.jit(
            lambda a, l: fused_logmel_stages(a, l, cfg), static_argnums=()
        )(audio, lengths)
        st0 = {k: (jnp.asarray(v) if hasattr(v, "dtype") else v)
               for k, v in st0.items()}

        @partial(jax.jit, static_argnames=("iters",))
        def epi(iters):
            def body(_, i):
                st = dict(st0)
                key = "prefix_fp" if "prefix_fp" in st else "logmel"
                st[key] = st[key] * (1.0 + 1e-6 * i)
                feat = chain.features_from_logmel(st, cfg)
                return 0, feat.sum()

            _, outs = jax.lax.scan(
                body, 0, jnp.arange(iters, dtype=jnp.float32)
            )
            return outs.sum()

        out["ms"]["epilogue"] = slope_timer(
            lambda it: float(epi(it)), I1, I2
        ) * 1e3

    # jnp twin end-to-end
    def jnp_full(a, l):
        feat, _ = chain.extract_batch(a, l, cfg, backend="jnp")
        return feat.sum()

    if "jnp_full" in variants:
        out["ms"]["jnp_full"] = slope_timer(chained(jnp_full), I1, I2) * 1e3

    # "naive jnp" hot loop on pre-staged frames (BASELINE.md re-measure)
    from mfcc_tpu.ops.chain import device_constants

    if "hotloop" not in variants:
        for kk in out["ms"]:
            out["ms"][kk] = round(out["ms"][kk], 4)
        if "full" in out["ms"]:
            audio_s = args.batch * args.seconds
            out["audio_s_per_s_full"] = round(
                audio_s / (out["ms"]["full"] / 1e3), 1)
        print(json.dumps(out, indent=1))
        return 0

    k = device_constants(cfg)
    F = cfg.num_frames(audio.shape[-1])
    frames0 = jax.jit(
        lambda a: chain.frame_signal(a, F, cfg) * jnp.asarray(k["window"])
    )(audio)

    @partial(jax.jit, static_argnames=("iters",))
    def hotloop(frames, iters):
        def body(_, i):
            fr = frames * (1.0 + 1e-6 * i)
            spec = jnp.fft.rfft(fr, n=cfg.n_fft)
            ps = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
            if cfg.power_scale_nfft:
                ps = ps / cfg.n_fft
            mel = jnp.matmul(ps.astype(jnp.float32), jnp.asarray(k["mel"]),
                             precision=jax.lax.Precision.HIGHEST)
            lg = jnp.log(jnp.where(mel <= 0, 1e-16, mel))
            dct = jnp.matmul(lg, jnp.asarray(k["dct"]),
                             precision=jax.lax.Precision.HIGHEST)
            return 0, dct.sum()

        _, outs = jax.lax.scan(body, 0, jnp.arange(iters, dtype=jnp.float32))
        return outs.sum()

    out["ms"]["jnp_hotloop_prestaged"] = slope_timer(
        lambda it: float(hotloop(frames0, it)), I1, I2
    ) * 1e3

    for kk in out["ms"]:
        out["ms"][kk] = round(out["ms"][kk], 4)
    audio_s = args.batch * args.seconds
    out["audio_s_per_s_full"] = round(audio_s / (out["ms"]["full"] / 1e3), 1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
