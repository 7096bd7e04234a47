"""Probe: effective MXU rate for fp32 HIGHEST matmuls at the resample
kernel's shapes, plain XLA vs the v1 pallas kernel (isolates pallas/grid
overhead from the chip's intrinsic pass rate)."""

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

B, M, K, N = 64, 1280, 384, 128
I1, I2, REPS = 5, 55, 5


def slope(fn, *args):
    @functools.partial(jax.jit, static_argnames=("iters",))
    def chained(x, iters):
        def body(_, i):
            return 0, fn(x * (1.0 + 1e-6 * i), *args).sum()
        _, outs = jax.lax.scan(body, 0, jnp.arange(iters, dtype=jnp.float32))
        return outs.sum()

    x = args0
    float(chained(x, I1)); float(chained(x, I2))
    ts = []
    for _ in range(REPS):
        t0 = time.time(); float(chained(x, I1)); ta = time.time() - t0
        t0 = time.time(); float(chained(x, I2)); tb = time.time() - t0
        ts.append((tb - ta) / (I2 - I1))
    return sorted(ts)[len(ts) // 2] * 1e3


rng = np.random.default_rng(0)
args0 = jnp.asarray(rng.standard_normal((B, M, K)).astype(np.float32))
W = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32))
Wb = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32))

hi = jax.lax.Precision.HIGHEST


def xla_hi(x, w):
    return jnp.matmul(x, w, preferred_element_type=jnp.float32, precision=hi)


def xla_def(x, w):
    return jnp.matmul(x, w, preferred_element_type=jnp.float32)


def perturb_only(x, w):
    return x[..., :N]


t_p = slope(perturb_only, W)
t_hi = slope(xla_hi, W)
t_def = slope(xla_def, W)
macs = B * M * K * N
print(f"perturb+slice floor:        {t_p:.3f} ms")
print(f"xla [64x1280,384]@[384,128] HIGHEST: {t_hi:.3f} ms "
      f"-> {macs * 6 / (t_hi - t_p) / 1e9:.1f} T MAC-passes/s (net of floor)")
print(f"xla same, default precision: {t_def:.3f} ms "
      f"-> {macs / (t_def - t_p) / 1e9:.1f} T MAC/s (net)")

# bigger N for comparison: does N=128 underuse the MXU?
W512 = jnp.asarray(rng.standard_normal((K, 512)).astype(np.float32))
t_hi512 = slope(xla_hi, W512)
print(f"xla @[384,512] HIGHEST:     {t_hi512:.3f} ms "
      f"-> {macs * 4 * 6 / (t_hi512 - t_p) / 1e9:.1f} T MAC-passes/s (net)")
