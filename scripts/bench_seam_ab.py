"""A/B measurements for the resample->frontend seam (VERDICT r2 item 1).

HISTORICAL (r2/r3 decision record): the variants below compare the
r2-era kernel formulations, and the "e2e" reference point feeds FLAT
audio — the fallback path, NOT the production layout. The shipped r5
path is the in-kernel fused resample (ResampleSlabLayout, ~1.3 ms/step
at b64 x 10 s — RESAMPLE_r05.json, bench.py --config mfcc39_48k);
numbers printed here are only comparable to each other.

Variants at batch-64 x 10 s x 48 kHz->16 kHz (up=1, down=3, J=128, step=384):
  v0       current resample_pallas (grid (B, n_sup), SUB=128, host pad+reshape)
  v0_prep  just the host-side pad+slice+reshape retile
  v1       one-dot-per-utterance: grid (B,), whole-slab [1280,384]@[384,128]
           main + rolled halo dot — no per-step loads/rolls
  v2       v1 + in-kernel reshape to the frontend's chunk-slab layout
           [pro8 + 1024 + tail8, 160] with zero prologue/tail rows
  e2e      current full mfcc39_48k extract_batch step (reference point)
"""

from __future__ import annotations

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mfcc_tpu.kernels import resample as KR
from mfcc_tpu.ops import resample as R

B = 64
SR_IN, SR_OUT = 48000, 16000
SECS = 10
N_IN = SR_IN * SECS
UP, DOWN = 1, 3


I1, I2, REPS = 5, 55, 5


def timeit(fn, *args):
    """Chained-scan slope timing (see bench.py): the relay's
    block_until_ready does not wait, so steps are chained inside one jit
    and timed as the slope between two iteration counts."""
    audio, rest = args[0], args[1:]

    @functools.partial(jax.jit, static_argnames=("iters",))
    def chained(audio, iters):
        def body(_, i):
            a = audio * (1.0 + 1e-6 * i)
            out = fn(a, *rest)
            if isinstance(out, tuple):
                out = out[0]
            return 0, out.sum()
        _, outs = jax.lax.scan(body, 0, jnp.arange(iters, dtype=jnp.float32))
        return outs.sum()

    float(chained(audio, I1))
    float(chained(audio, I2))
    slopes = []
    for _ in range(REPS):
        t0 = time.time(); float(chained(audio, I1)); ta = time.time() - t0
        t0 = time.time(); float(chained(audio, I2)); tb = time.time() - t0
        slopes.append((tb - ta) / (I2 - I1))
    return float(sorted(slopes)[len(slopes) // 2] * 1e3)


def make_audio():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((B, N_IN)).astype(np.float32))


# --- shared design ---------------------------------------------------------
M1, M2, ORIGIN, E, STEP, J = KR._kernel_design(UP, DOWN)
N_OUT = -(-N_IN * UP // DOWN)
N_BLK = -(-N_OUT // J)
N_SUP = -(-N_BLK // KR.SUB)
OUT_ROWS = N_SUP * KR.SUB  # 1280
ROWS = OUT_ROWS + 8
M2W = M2.shape[0]


def prep(audio):
    pad_lo = max(0, -ORIGIN)
    o = ORIGIN + pad_lo
    t_need = o + ROWS * STEP
    x = jnp.pad(audio, ((0, 0), (pad_lo, max(0, t_need - N_IN - pad_lo))))
    return x[:, o : o + ROWS * STEP].reshape(B, ROWS, STEP)


@jax.jit
def v0(audio):
    return KR.resample_pallas(audio, UP, DOWN, N_OUT)


@jax.jit
def v0_prep(audio):
    return prep(audio)


def _v1_kernel(slab_ref, m1_ref, m2_ref, out_ref):
    hi = jax.lax.Precision.HIGHEST
    full = slab_ref[0]  # [ROWS, STEP]
    main = full[:OUT_ROWS]
    rolled = pltpu.roll(full, shift=ROWS - 1, axis=0)  # r <- r+1
    halo = rolled[:OUT_ROWS, :M2W]
    out_ref[0] = jnp.dot(
        main, m1_ref[:], preferred_element_type=jnp.float32, precision=hi
    ) + jnp.dot(
        halo, m2_ref[:], preferred_element_type=jnp.float32, precision=hi
    )


@jax.jit
def v1(audio):
    slab = prep(audio)
    out = pl.pallas_call(
        _v1_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, ROWS, STEP), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((STEP, J), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(M2.shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, OUT_ROWS, J), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, OUT_ROWS, J), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * OUT_ROWS * (STEP + M2W) * J,
            bytes_accessed=(B * ROWS * STEP + B * OUT_ROWS * J) * 4,
            transcendentals=0,
        ),
    )(slab, jnp.asarray(M1, jnp.float32), jnp.asarray(M2, jnp.float32))
    return out.reshape(B, OUT_ROWS * J)[:, :N_OUT]


# --- v3: J = 160 -> the dot's output rows ARE frontend chunk rows ----------
S16 = 160
M3, ORIGIN3, W3, STEP3 = R._stream_design(UP, DOWN, S16)
E3 = W3 - STEP3
M31 = np.ascontiguousarray(M3.T[:STEP3])  # [480, 160]
M32 = np.zeros((128, S16), dtype=np.float64)
M32[:E3] = M3.T[STEP3:W3]
CH_ROWS = -(-N_OUT // S16)  # 1000
PRO, TAIL = 8, 8
ROWS3 = CH_ROWS + 8
# frontend slab layout for a 1024-frame block grid: pro + fp + slab_tail
OUT2_ROWS = PRO + 1024 + TAIL


def prep3(audio):
    pad_lo = max(0, -ORIGIN3)
    o = ORIGIN3 + pad_lo
    t_need = o + ROWS3 * STEP3
    x = jnp.pad(audio, ((0, 0), (pad_lo, max(0, t_need - N_IN - pad_lo))))
    return x[:, o : o + ROWS3 * STEP3].reshape(B, ROWS3, STEP3)


def _v3_kernel(slab_ref, m1_ref, m2_ref, out_ref):
    hi = jax.lax.Precision.HIGHEST
    full = slab_ref[0]  # [ROWS3, 480]
    main = full[:CH_ROWS]
    rolled = pltpu.roll(full, shift=ROWS3 - 1, axis=0)
    halo = rolled[:CH_ROWS, :128]
    res = jnp.dot(
        main, m1_ref[:], preferred_element_type=jnp.float32, precision=hi
    ) + jnp.dot(
        halo, m2_ref[:], preferred_element_type=jnp.float32, precision=hi
    )
    out_ref[0, :PRO, :] = jnp.zeros((PRO, S16), jnp.float32)
    out_ref[0, PRO : PRO + CH_ROWS, :] = res
    out_ref[0, PRO + CH_ROWS :, :] = jnp.zeros(
        (OUT2_ROWS - PRO - CH_ROWS, S16), jnp.float32
    )


@jax.jit
def v3(audio):
    slab = prep3(audio)
    return pl.pallas_call(
        _v3_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, ROWS3, STEP3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((STEP3, S16), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(M32.shape, lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, OUT2_ROWS, S16), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, OUT2_ROWS, S16), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * CH_ROWS * (STEP3 + 128) * S16,
            bytes_accessed=(B * ROWS3 * STEP3 + B * OUT2_ROWS * S16) * 4,
            transcendentals=0,
        ),
    )(slab, jnp.asarray(M31, jnp.float32), jnp.asarray(M32, jnp.float32))


# --- v5: roll the small halo PRODUCT, not the wide slab --------------------
def _v5_kernel(slab_ref, m1_ref, m2_ref, out_ref):
    hi = jax.lax.Precision.HIGHEST
    full = slab_ref[0]
    main = full[:OUT_ROWS]
    h = jnp.dot(full[:, :M2W], m2_ref[:],
                preferred_element_type=jnp.float32, precision=hi)  # [ROWS, J]
    halo_out = pltpu.roll(h, shift=ROWS - 1, axis=0)[:OUT_ROWS]
    out_ref[0] = jnp.dot(
        main, m1_ref[:], preferred_element_type=jnp.float32, precision=hi
    ) + halo_out


# --- v6: NO roll / no halo (wrong numerics; isolates roll + halo cost) -----
def _v6_kernel(slab_ref, m1_ref, m2_ref, out_ref):
    hi = jax.lax.Precision.HIGHEST
    main = slab_ref[0, :OUT_ROWS]
    out_ref[0] = jnp.dot(
        main, m1_ref[:], preferred_element_type=jnp.float32, precision=hi
    )


# --- v6c: manual bf16x3 main+halo (accuracy probe) -------------------------
from mfcc_tpu.kernels.frontend import _bf16_split, _bf16_split_np

M1H, M1L = _bf16_split_np(np.asarray(M1, np.float32))
M2H, M2L = _bf16_split_np(np.asarray(M2, np.float32))


def _dot3(x, bh, bl):
    xh, xl = _bf16_split(x)
    out = jnp.dot(xh, bh, preferred_element_type=jnp.float32)
    out = out + jnp.dot(xl, bh, preferred_element_type=jnp.float32)
    return out + jnp.dot(xh, bl, preferred_element_type=jnp.float32)


def _v6c_kernel(slab_ref, m1h_ref, m1l_ref, m2h_ref, m2l_ref, out_ref):
    full = slab_ref[0]
    main = full[:OUT_ROWS]
    h = _dot3(full[:, :M2W], m2h_ref[:], m2l_ref[:])
    halo_out = pltpu.roll(h, shift=ROWS - 1, axis=0)[:OUT_ROWS]
    out_ref[0] = _dot3(main, m1h_ref[:], m1l_ref[:]) + halo_out


@jax.jit
def v6c(audio):
    slab = prep(audio)
    consts = [jnp.asarray(a) for a in (M1H, M1L, M2H, M2L)]
    out = pl.pallas_call(
        _v6c_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, ROWS, STEP), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec(c.shape, lambda b: (0, 0), memory_space=pltpu.VMEM)
            for c in consts
        ],
        out_specs=pl.BlockSpec((1, OUT_ROWS, J), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, OUT_ROWS, J), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * OUT_ROWS * (STEP + M2W) * J,
            bytes_accessed=(B * ROWS * STEP + B * OUT_ROWS * J) * 4,
            transcendentals=0,
        ),
    )(slab, *consts)
    return out.reshape(B, OUT_ROWS * J)[:, :N_OUT]


def _call_v1_style(kernel, audio):
    slab = prep(audio)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, ROWS, STEP), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((STEP, J), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(M2.shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, OUT_ROWS, J), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, OUT_ROWS, J), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * OUT_ROWS * (STEP + M2W) * J,
            bytes_accessed=(B * ROWS * STEP + B * OUT_ROWS * J) * 4,
            transcendentals=0,
        ),
    )(slab, jnp.asarray(M1, jnp.float32), jnp.asarray(M2, jnp.float32))
    return out.reshape(B, OUT_ROWS * J)[:, :N_OUT]


v5 = jax.jit(functools.partial(_call_v1_style, _v5_kernel))
v6 = jax.jit(functools.partial(_call_v1_style, _v6_kernel))


def main():
    audio = make_audio()
    # correctness first: v1/v2 vs v0
    r0 = np.asarray(v0(audio))
    r1 = np.asarray(v1(audio))
    err1 = np.abs(r1 - r0).max()
    r3v = np.asarray(v3(audio))
    flat = r3v[:, PRO : PRO + CH_ROWS, :].reshape(B, -1)[:, :N_OUT]
    err3 = np.abs(flat - r0).max()
    print(f"v1 max|diff| vs v0: {err1:.3e}; v3: {err3:.3e}")
    assert err1 == 0.0, "v1 disagrees with v0"
    assert err3 < 2e-6, "v3 disagrees with v0"

    r5 = np.asarray(v5(audio))
    err5 = np.abs(r5 - r0).max()
    r6c = np.asarray(v6c(audio))
    err6c = np.abs(r6c - r0).max()
    print(f"v5 max|diff| vs v0: {err5:.3e}; v6c (3-pass): {err6c:.3e} "
          f"(signal rms {np.sqrt((r0**2).mean()):.3f})")

    print(f"v0_prep (pad+reshape retile): {timeit(v0_prep, audio):.3f} ms")
    print(f"v0 (current kernel):          {timeit(v0, audio):.3f} ms")
    print(f"v1 (one-dot-per-b):           {timeit(v1, audio):.3f} ms")
    print(f"v3 (J=160 chunk-slab out):    {timeit(v3, audio):.3f} ms")
    print(f"v5 (small-roll halo):         {timeit(v5, audio):.3f} ms")
    print(f"v6 (main only, no halo):      {timeit(v6, audio):.3f} ms")
    print(f"v6c (3-pass precision):       {timeit(v6c, audio):.3f} ms")

    from mfcc_tpu.config import named_config
    from mfcc_tpu.ops import chain

    cfg = named_config("mfcc39_48k")
    lengths = jnp.full((B,), N_IN, jnp.int32)
    f = jax.jit(functools.partial(chain.extract_batch, cfg=cfg, backend="pallas"))
    print(f"e2e mfcc39_48k (current):     {timeit(f, audio, lengths):.3f} ms")


if __name__ == "__main__":
    main()
