"""Scaling-efficiency harness (VERDICT r1 item 6; BASELINE north-star
"≥90% efficiency 1 chip → N").

Weak scaling: per-device batch is held fixed while the mesh grows over
n = 1, 2, 4, ... devices, so perfect scaling is flat ms/step and linear
audio-s/s. The per-batch program is collective-free by construction
(tests/test_structure.py asserts it on the compiled HLO), so efficiency
loss can only come from launch overhead or hardware contention.

Also asserts NUMERICAL equality: the n-device sharded output must match
the 1-device output (same padded shapes → identical local programs).

Runs anywhere: on the CPU mesh (JAX_PLATFORMS=cpu +
XLA_FLAGS=--xla_force_host_platform_device_count=8) the numbers measure
*structure* only — the virtual devices contend for the same physical
cores, so sub-linear audio-s/s is expected and the honest metric is the
equality check + the collective-free program. On a real pod slice the
same harness measures true scaling. Timing uses the chained-scan
construction (block_until_ready does not wait on relayed TPUs).

Usage:
  python scripts/bench_scaling.py [--devices 1,2,4,8] [--config NAME]
      [--per-device-batch 8] [--seconds 2.0] [-o SCALING.json]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--devices", default=None,
                   help="comma list of mesh sizes (default: 1,2,..,#devices)")
    p.add_argument("--config", default="classic13_deltas")
    p.add_argument("--per-device-batch", type=int, default=8)
    p.add_argument("--seconds", type=float, default=2.0)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("-o", "--output", default=None, help="write JSON here")
    p.add_argument("--cpu", action="store_true",
                   help="force the virtual-CPU mesh (8 devices)")
    args = p.parse_args()

    if args.cpu:
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from mfcc_tpu.config import named_config
    from mfcc_tpu.parallel import data_mesh, sharded_extract_batch
    from mfcc_tpu.parallel.extract import sharded_extract_steps

    cfg = named_config(args.config)
    n_avail = jax.device_count()
    if args.devices:
        sizes = [int(x) for x in args.devices.split(",")]
    else:
        sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]
    backend = "pallas" if jax.default_backend() == "tpu" else "jnp"

    sr = cfg.input_sample_rate or cfg.sample_rate
    T = int(sr * args.seconds)
    g = np.random.default_rng(0)

    def batch_for(n):
        B = args.per_device_batch * n
        audio = g.standard_normal((B, T)).astype(np.float32)
        lengths = np.full(B, T, dtype=np.int32)
        return audio, lengths

    # numerical equality: n-device output == 1-device output on one batch
    audio, lengths = batch_for(1)
    ref_feat = None
    for n in sizes:
        mesh = data_mesh(n)
        # replicate the 1-device batch pattern n times so shapes per shard
        # and contents per row match the reference exactly
        a = np.tile(audio, (n, 1))
        l = np.tile(lengths, n)
        feat, _, _ = sharded_extract_batch(a, l, cfg, mesh, backend=backend)
        feat = np.asarray(feat)[: audio.shape[0]]
        if ref_feat is None:
            ref_feat = feat
        else:
            np.testing.assert_allclose(feat, ref_feat, atol=1e-5, rtol=1e-5)
    equality = "passed"

    rows = []
    base_rate = None
    for n in sizes:
        mesh = data_mesh(n)
        a, l = batch_for(n)
        # warm both iteration counts
        i1, i2 = max(2, args.iters // 10), args.iters
        sharded_extract_steps(a, l, cfg, mesh, backend=backend, iters=i1)
        sharded_extract_steps(a, l, cfg, mesh, backend=backend, iters=i2)
        slopes = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            sharded_extract_steps(a, l, cfg, mesh, backend=backend, iters=i1)
            ta = time.perf_counter() - t0
            t0 = time.perf_counter()
            sharded_extract_steps(a, l, cfg, mesh, backend=backend, iters=i2)
            tb = time.perf_counter() - t0
            slopes.append((tb - ta) / (i2 - i1))
        ms = sorted(slopes)[len(slopes) // 2] * 1e3
        rate = a.shape[0] * args.seconds / (ms / 1e3)
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * n)
        rows.append({
            "devices": n, "ms_per_step": round(ms, 3),
            "audio_s_per_s": round(rate, 1), "efficiency": round(eff, 3),
        })
        print(json.dumps(rows[-1]))

    result = {
        "metric": "weak_scaling",
        "platform": jax.default_backend(),
        "backend": backend,
        "config": args.config,
        "per_device_batch": args.per_device_batch,
        "utterance_s": args.seconds,
        "numerical_equality_vs_1dev": equality,
        "note": (
            "virtual CPU devices share physical cores; efficiency numbers "
            "are structural only off-TPU"
            if jax.default_backend() == "cpu" else ""
        ),
        "rows": rows,
    }
    print(json.dumps(result))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(result, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
