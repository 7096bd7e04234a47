"""Pallas TPU kernel for batched polyphase resampling (decimation).

The XLA formulations of `ops.resample.resample_batch` are data-movement
bound: `conv_general_dilated(lhs_dilation, stride)` lowers off the MXU
entirely (17.4 ms/step at batch-64 × 10 s × 48 kHz — 21× the whole feature
chain), and the blocked banded-matmul XLA fallback still pays ~4.5 ms of
pad/reshape/concat relayout around a 0.37 ms matmul. This kernel removes
the data movement: each utterance row sits resident in VMEM as a
[rows, step] slab (1.9 MB at 10 s × 48 kHz), overlapping block windows are
built with one sublane roll, and the polyphase apply is two MXU dots per
grid step ([SUB, step]×[step, J] main + [SUB, 128]×[128, J] halo) against
the same banded block matrix the streaming resampler uses
(`ops.resample._stream_design` — one algebra, three consumers).
Measured at batch-64 × 10 s × 48 kHz on v5e: 17.4 ms (dilated conv) →
4.8 ms (XLA blocked matmul) → 1.7 ms (this kernel, 0.54 ms of which is
the host-side pad+reshape retile); mfcc39_48k end-to-end 35k → 244k
audio-s/s.

Scope: integer decimation (up == 1 after gcd — e.g. 48 kHz→16 kHz, the
BASELINE #5 config; any integer factor — the halo always fits one extra
row since E ~ 20*down + 1 < step = 128*down) with step a lane multiple;
`applicable()` gates it and `ops.resample.resample_batch` falls back to
the XLA path otherwise (rational ratios, float64 certification,
oversized slabs). The halo rides a second dot against a mostly-zero M2
because Mosaic cannot concatenate a rolled vector.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# output blocks (of J samples) per grid step = the dot's row count: 128
# fills the MXU's sublane dimension (SUB=8 measured 7x slower — a
# [8, step] x [step, J] matmul uses 6% of the systolic array's rows)
SUB = 128
SLAB_VMEM_BUDGET_BYTES = 6 * 1024 * 1024


@functools.lru_cache(maxsize=16)
def _kernel_design(up: int, down: int):
    """Host-side constants for the kernel path (gcd-reduced ratio)."""
    from mfcc_tpu.ops import resample as R

    J = R._block_J(up)
    M, origin, W, step = R._stream_design(up, down, J)
    E = W - step
    M1 = np.ascontiguousarray(M.T[:step])  # [step, J] main taps
    # halo dot width: one lane register when the halo fits (E <= 128,
    # decimations < 7x), else the full next row (E <= step always for the
    # scipy designs: E ~ 20*down + 1 < 128*down = step)
    m2w = 128 if E <= 128 else step
    M2 = np.zeros((m2w, J), dtype=np.float64)
    if 0 < E <= step:
        M2[:E] = M.T[step:W]  # halo taps; rows [E, m2w) are zero
    M1.setflags(write=False)
    M2.setflags(write=False)
    return M1, M2, origin, E, step, J


def applicable(up: int, down: int, n_in: int, dtype) -> bool:
    """True when the kernel path handles this resample (see module doc)."""
    if up != 1 or dtype != jnp.float32 or n_in <= 0:
        return False
    M1, M2, origin, E, step, J = _kernel_design(up, down)
    if not (0 < E <= step and step % 128 == 0):
        return False
    n_out = -(-n_in * up // down)
    n_sup = -(-(-(-n_out // J)) // SUB)
    rows = n_sup * SUB + 8
    return rows * step * 4 <= SLAB_VMEM_BUDGET_BYTES


def _make_kernel(step: int, J: int):
    hi = jax.lax.Precision.HIGHEST

    def kernel(slab_ref, m1_ref, m2_ref, out_ref):
        s = pl.program_id(1)
        # rows [s*SUB, s*SUB + SUB + 1): SUB main rows + the halo source
        mat = slab_ref[0, pl.ds(s * SUB, SUB + 1), :]  # [SUB+1, step]
        main = mat[:SUB]
        # halo: row k's window continues into row k+1's first E lanes.
        # Mosaic can't concatenate a rolled (sublane-offset) vector onto
        # main, so the halo rides a SECOND dot against M2 (m2w lanes wide;
        # rows [E, m2w) zero -> exact-zero contributions). roll shift
        # must be non-negative: shift=SUB over SUB+1 rows sends row
        # k+1 -> k.
        m2w = m2_ref.shape[0]
        halo = pltpu.roll(mat, shift=SUB, axis=0)[:SUB, :m2w]
        out_ref[0] = jnp.dot(
            main, m1_ref[:], preferred_element_type=jnp.float32, precision=hi
        ) + jnp.dot(
            halo, m2_ref[:], preferred_element_type=jnp.float32, precision=hi
        )

    return kernel


def resample_pallas(
    audio: jnp.ndarray, up: int, down: int, n_out: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """[B, T] float32 -> [B, n_out]; caller guarantees `applicable()`.

    Semantics identical to the XLA path: zero samples beyond each row's
    data behave as scipy resample_poly's 'constant' padding."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    M1, M2, origin, E, step, J = _kernel_design(up, down)
    if not (0 < E <= step) or n_out <= 0:
        raise ValueError("design outside the kernel's scope; gate with "
                         "applicable() first")
    B, n_in = audio.shape
    n_blk = -(-n_out // J)
    n_sup = -(-n_blk // SUB)
    rows = n_sup * SUB + 8
    pad_lo = max(0, -origin)
    o = origin + pad_lo  # 0 for every real design (origin = -halo < 0)
    t_need = o + rows * step
    x = jnp.pad(audio, ((0, 0), (pad_lo, max(0, t_need - n_in - pad_lo))))
    slab = x[:, o : o + rows * step].reshape(B, rows, step)

    out = pl.pallas_call(
        _make_kernel(step, J),
        grid=(B, n_sup),
        in_specs=[
            pl.BlockSpec((1, rows, step), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((step, J), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(M2.shape, lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, SUB, J), lambda b, s: (b, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_sup * SUB, J), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n_sup * SUB * (step + 128) * J,
            bytes_accessed=(B * rows * step + B * n_sup * SUB * J) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(slab, jnp.asarray(M1, jnp.float32), jnp.asarray(M2, jnp.float32))
    return out.reshape(B, n_sup * SUB * J)[:, :n_out]
