"""The dither noise contract: counter-based gaussian noise shared by the
float64 oracle, the jnp twin, and the fused Pallas kernel.

Kaldi's dither (feature-window.cc ProcessWindow order: dither -> DC removal
-> pre-emphasis) draws from a stateful per-thread RNG, so no bit-level
Kaldi match is possible; what matters is ~N(0, dither) noise on every
sample a frame consumes. This module fixes OUR cross-backend contract:

    noise[t] = BoxMuller16(fmix32(fmix32((t // S) * GOLDEN ^ fmix32(seed)) + t % S))

with S = cfg.frame_step — i.e. **the SIGNAL is dithered, per absolute
sample position t**, before pre-emphasis, DC removal and framing. Design
choices, deliberate and load-bearing:

  * **signal-level, not frame-level.** Kaldi redraws noise for every
    extracted frame, so overlapping frames see independent noise on the
    same sample; we draw once per sample. Within any single frame the
    noise is still iid N(0, dither) — the purpose of dither (break digital
    silence / exact-zero bins before the log) is met identically — and the
    cost in the fused kernel drops ~4x: noise is generated on the
    [rows, S] chunk slab (one value per sample) instead of the
    frame-overlap matrix (L/S ~ 2.5-4 values per sample). Measured on v5e
    at batch-64 x 10 s (kaldi_mfcc): frame-level +0.90 ms/step, signal
    level +0.43, signal level with the polynomial cos +0.17 (0.74 ->
    0.92 ms/step, ~700k audio-s/s — VERDICT r2 item 3's >= 500k gate).
  * **counter-based (no RNG state):** noise is a pure function of the
    sample position, evaluable in any order and any block partition — what
    a gridded kernel needs. The (t // S, t % S) split exists so the
    kernel's slab rows (row = t // S, lane = t % S) key the hash directly;
    the per-row key hash runs at [rows, 1] width, only the final mix +
    transform run at full width.
  * **batch-position-invariant:** no batch term, so utterance features are
    identical whether extracted alone or inside any padded batch (the
    masking-invariance property, SURVEY.md section 4.2 item 4, survives
    dither). The same audio therefore gets the same noise; vary
    cfg.dither_seed for independent draws.
  * **dither precedes pre-emphasis in BOTH preemph modes** (the Kaldi
    ProcessWindow order) — for preemph_mode="signal" the noise is
    pre-emphasized along with the signal.
  * fmix32 is the murmur3 finalizer — 2 multiplies + 3 xor-shifts of pure
    uint32 arithmetic, bit-identical across numpy, XLA and Mosaic;
  * BoxMuller16 splits the 32 hash bits into two midpoint-offset 16-bit
    uniforms u1, u2 in (0, 1) and returns sqrt(-2 ln u1) * cos(2 pi u2):
    (cos via the exact-arithmetic polynomial _cos2pi): a gaussian
    truncated at |z| <= sqrt(-2 ln 2^-17) ~ 4.86 sigma with
    var = 1 to ~1e-4 (16-bit midpoint quantization) — gated in
    tests/test_kaldi_conventions.py::test_dither_statistics_and_determinism.

The float64 oracle (ops/reference_numpy.py) draws from the numpy twin of
this contract by default, so oracle == twin == kernel holds on dithered
configs without replaying noise. cos(2 pi u) is a quarter-period-reduced
polynomial (_cos2pi) in EXACT float arithmetic — bit-identical everywhere
and ~20x cheaper than Mosaic's cos, the dominant transform cost. The only
cross-backend nonequality left is ln/sqrt ulps (~1e-7 relative), far
inside every gate.
"""

from __future__ import annotations

import math as _math

import jax
import jax.numpy as jnp
import numpy as np

_GOLDEN = 0x9E3779B9  # 2^32 / phi, the Weyl increment
_M1 = 0x85EBCA6B  # murmur3 fmix32 constants
_M2 = 0xC2B2AE35


def _fmix32(x: jnp.ndarray) -> jnp.ndarray:
    """murmur3 32-bit finalizer (full avalanche) on uint32."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(_M1)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(_M2)
    x = x ^ (x >> 16)
    return x


# cos(2 pi b) Taylor coefficients in t = b^2, b in [0, 1/4]: sum_k C2PI[k]
# t^k = sum (-1)^k (2 pi)^{2k} / (2k)! t^k; the k=7 tail is <= (pi/2)^14/14!
# ~ 6.3e-9, below f32 rounding. Computed in float64, cast once.
_C2PI = [
    float((-1) ** k * (2.0 * np.pi) ** (2 * k) / _math.factorial(2 * k))
    for k in range(7)
]


def _cos2pi(u):
    """cos(2 pi u) for u in [0, 1) from EXACT float ops only (floor / abs /
    select / mult / add — no transcendental), so the twin, the kernel and
    the numpy oracle produce bit-identical values. Mosaic's native cos is
    the single most expensive op in the noise transform (micro-benched
    +0.42 ms/step at batch-64 x 10 s vs +0.02 for this polynomial);
    max abs error ~1e-7 (f32 rounding), distributionally irrelevant.

    Quarter-period reduction: a = u - round(u) in [-1/2, 1/2) has the same
    cos; for |a| > 1/4, cos(2 pi a) = -cos(2 pi (1/2 - |a|)). The degree-6
    polynomial in b^2 then covers b in [0, 1/4]."""
    f32 = u.dtype
    a = u - jnp.floor(u + jnp.asarray(0.5, f32))
    aa = jnp.abs(a)
    flip = aa > jnp.asarray(0.25, f32)
    b = jnp.where(flip, jnp.asarray(0.5, f32) - aa, aa)
    t = b * b
    acc = jnp.asarray(_C2PI[6], f32)
    for c in _C2PI[5::-1]:
        acc = acc * t + jnp.asarray(c, f32)
    return jnp.where(flip, -acc, acc)


def dither_field(
    seed: int, row_idx: jnp.ndarray, lane_idx: jnp.ndarray
) -> jnp.ndarray:
    """noise ~ N(0, 1) for sample positions t = row_idx * S + lane_idx
    (int32 arrays, broadcastable; lane_idx < S). Returns float32 of the
    broadcast shape."""
    kr = _fmix32(
        row_idx.astype(jnp.uint32) * jnp.uint32(_GOLDEN)
        ^ jnp.uint32(_fmix32_int(seed))
    )
    h = _fmix32(kr + lane_idx.astype(jnp.uint32))

    # midpoint-offset 16-bit uniforms in (0, 1): u = (k + 0.5) / 65536.
    # Mosaic has no uint32 -> float32 cast; both 16-bit halves fit int32
    # exactly, so bitcast first (a no-op relabel: values are < 2^16).
    def _u16_to_f32(v):
        return jax.lax.bitcast_convert_type(v, jnp.int32).astype(jnp.float32)

    u1 = (_u16_to_f32(h >> 16) + 0.5) * jnp.float32(1.0 / 65536.0)
    u2 = (_u16_to_f32(h & jnp.uint32(0xFFFF)) + 0.5) * jnp.float32(
        1.0 / 65536.0
    )
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * _cos2pi(u2)


def signal_noise(seed: int, t_samples: int, frame_step: int) -> jnp.ndarray:
    """The contract noise for signal positions [0, t_samples): float32
    [t_samples], computed on a [ceil(T/S), S] grid and flattened."""
    s = max(1, int(frame_step))
    rows = -(-t_samples // s)
    field = dither_field(
        seed,
        jnp.arange(rows, dtype=jnp.int32)[:, None],
        jnp.arange(s, dtype=jnp.int32)[None, :],
    )
    return field.reshape(rows * s)[:t_samples]


def add_signal_dither(audio: jnp.ndarray, cfg) -> tuple[jnp.ndarray, jnp.ndarray]:
    """audio [..., T] + cfg.dither * noise (contract noise broadcast over
    leading axes). Returns (dithered audio, the [..., T] noise in audio's
    dtype) — callers expose the noise for oracle replay."""
    field = signal_noise(cfg.dither_seed, audio.shape[-1], cfg.frame_step)
    noise = jnp.broadcast_to(field.astype(audio.dtype), audio.shape)
    return audio + jnp.asarray(cfg.dither, audio.dtype) * noise, noise


# ---------------------------------------------------------------------------
# numpy twin (float64 oracle default draw, host-side slab conditioning)
# ---------------------------------------------------------------------------


def _fmix32_int(x: int) -> int:
    """Host-side (Python int) fmix32 — pre-mixes the seed so it enters the
    row key NONLINEARLY. With the former linear entry (row*GOLDEN + seed),
    seeds differing by exactly GOLDEN produced identical noise fields
    shifted by one row (ADVICE r3); xor-ing a finalized seed breaks that
    additive aliasing for all seed pairs."""
    x &= 0xFFFFFFFF
    x ^= x >> 16
    x = (x * _M1) & 0xFFFFFFFF
    x ^= x >> 13
    x = (x * _M2) & 0xFFFFFFFF
    x ^= x >> 16
    return x


def _fmix32_np(x: np.ndarray) -> np.ndarray:
    x = x ^ (x >> np.uint32(16))
    x = x * np.uint32(_M1)
    x = x ^ (x >> np.uint32(13))
    x = x * np.uint32(_M2)
    x = x ^ (x >> np.uint32(16))
    return x


def signal_noise_np(seed: int, t_samples: int, frame_step: int) -> np.ndarray:
    """numpy twin of signal_noise (float32 [t_samples]): the integer hash
    is bit-identical; the Box-Muller transcendentals are ulp-close (numpy's
    f32 log/cos differ from XLA's by ~1e-7 relative). Exact-replay tests
    pass the jnp draw through the oracle's dither_noise arg instead."""
    s = max(1, int(frame_step))
    rows = -(-t_samples // s)
    row_idx = np.arange(rows, dtype=np.uint32)[:, None]
    lane_idx = np.arange(s, dtype=np.uint32)[None, :]
    with np.errstate(over="ignore"):
        kr = _fmix32_np((row_idx * np.uint32(_GOLDEN)) ^ np.uint32(_fmix32_int(seed)))
        h = _fmix32_np(kr + lane_idx)
    u1 = ((h >> np.uint32(16)).astype(np.float32) + np.float32(0.5)) * np.float32(
        1.0 / 65536.0
    )
    u2 = ((h & np.uint32(0xFFFF)).astype(np.float32) + np.float32(0.5)) * np.float32(
        1.0 / 65536.0
    )
    r = np.sqrt(np.float32(-2.0) * np.log(u1, dtype=np.float32))
    z = r * _cos2pi_np(u2)
    return z.reshape(rows * s)[:t_samples].astype(np.float32)


def _cos2pi_np(u: np.ndarray) -> np.ndarray:
    """numpy twin of _cos2pi — bit-identical (exact float ops only)."""
    u = u.astype(np.float32)
    a = u - np.floor(u + np.float32(0.5))
    aa = np.abs(a)
    flip = aa > np.float32(0.25)
    b = np.where(flip, np.float32(0.5) - aa, aa).astype(np.float32)
    t = b * b
    acc = np.full_like(t, np.float32(_C2PI[6]))
    for c in _C2PI[5::-1]:
        acc = acc * t + np.float32(c)
    return np.where(flip, -acc, acc).astype(np.float32)
