"""The fused front-end Pallas kernel: audio chunks → log-mel (+energy).

One kernel instance handles a block of `block_frames` frames of one
utterance and computes

    frames → ×window → real DFT → |·|² (/NFFT) → mel (+Σ energy) → log

entirely in VMEM, writing only the [block_frames, MP] log-mel block back to
HBM. This is the TPU-native replacement for the reference's per-frame
pocketfft loop (SURVEY.md §2.2: "DFT-as-matmul … two real GEMMs on the
MXU"), designed so that:

  * **Framing is free.** The overlap structure (hop S=160 < length L=400)
    never materializes: audio is viewed as hop-sized chunks [B, C, S], the
    kernel receives `nc = ceil(L/S)` chunk views shifted by 0..nc-1, and the
    DFT matrix is split row-wise into nc blocks of S rows — so

        re_im[f] = Σ_i chunks_i[f] @ dft_rows[i*S:(i+1)*S]

    reconstructs the windowed DFT of frame f with plain MXU matmuls: no
    gather, no concat, no 2.5× HBM blow-up (SURVEY.md §6).
  * **Window, 1/√NFFT and zero-padding are folded into the DFT matrices**
    on host in float64 (rows ≥ L are zero, so the chunk tail beyond the
    frame contributes nothing; cols ≥ n_bins are zero so lane padding stays
    zero).
  * **cos and sin halves are stacked** into one [S, 2*KB] matrix per chunk
    shift, so the whole spectrum needs nc matmuls instead of 2*nc.
  * **Energy rides the mel matmul**: the mel matrix gets an extra column of
    ones, making lane `n_mels` of the projection the frame energy
    Σ_k pspec[k] (the TF C++ kernel treats the filterbank as sparse 2-tap
    [TF mfcc_mel_filterbank.h:47-57]; at 257×26 dense-on-MXU is faster).

Equivalence twin: ops.chain.logmel_stages (tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mfcc_tpu.config import FrontendConfig
from mfcc_tpu.ops import chain
from mfcc_tpu.ops import constants as C

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Host-side constant folding
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def kernel_constants(cfg: FrontendConfig):
    """Float64-folded, fp32-cast kernel matrices.

    Returns dict with:
      dft:  [nc, S, 2*KB]  — per-chunk-shift rows of the windowed, scaled
                             DFT matrix; lanes [0:KB] = cos, [KB:2KB] = -sin.
      mel:  [2*KB? no, KB, MP] — mel filterbank (cols [0:M]) + energy column
                             (col M) + zero padding.
      dims: (nc, S, KB, MP)
    """
    L, S = cfg.frame_length, cfg.frame_step
    nc = max(1, -(-L // S))  # ceil(L/S) chunk shifts cover one frame
    KW = nc * S  # samples the kernel "sees" per frame (>= L; tail zeroed)
    KB = _round_up(cfg.n_bins, LANE)
    if cfg.n_mels + 1 > LANE:
        mp = _round_up(cfg.n_mels + 1, LANE)
    else:
        mp = LANE

    host = C.chain_constants(cfg)
    w = host["window"]  # [L] float64
    n = np.arange(L, dtype=np.float64)[:, None]
    k = np.arange(cfg.n_bins, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * n * k / cfg.n_fft
    scale = (1.0 / np.sqrt(cfg.n_fft)) if cfg.power_scale_nfft else 1.0
    cos = w[:, None] * np.cos(ang) * scale  # [L, n_bins]
    sin = w[:, None] * np.sin(ang) * scale

    dft = np.zeros((KW, 2 * KB), dtype=np.float64)
    dft[:L, : cfg.n_bins] = cos
    dft[:L, KB : KB + cfg.n_bins] = sin
    dft = dft.reshape(nc, S, 2 * KB)

    mel = np.zeros((KB, mp), dtype=np.float64)
    mel[: cfg.n_bins, : cfg.n_mels] = host["mel"]
    mel[: cfg.n_bins, cfg.n_mels] = 1.0  # energy column

    return {
        "dft": dft.astype(np.float32),
        "mel": mel.astype(np.float32),
        "dims": (nc, S, KB, mp),
    }


# ---------------------------------------------------------------------------
# Kernel body
# ---------------------------------------------------------------------------


def _make_kernel(cfg: FrontendConfig, nc: int, kb: int, mp: int, block_frames: int):
    eps = float(cfg.log_eps)
    n_mels = cfg.n_mels
    log_kind = cfg.log_kind

    def kernel(*refs):
        # refs: nc chunk refs [1, FBLK, S], dft ref [nc, S, 2KB],
        #       mel ref [KB, MP], out ref [1, FBLK, MP]
        chunk_refs = refs[:nc]
        dft_ref, mel_ref, out_ref = refs[nc], refs[nc + 1], refs[nc + 2]

        # precision=HIGHEST: the TPU MXU multiplies in bf16 by default, which
        # costs ~3 decimal digits and breaks the 1e-4 gate; HIGHEST selects
        # the multi-pass fp32 algorithm (measured: default gave 1.4e-3 rel
        # error on energy vs the fp32 twin; HIGHEST restores 1e-6 agreement).
        hi = jax.lax.Precision.HIGHEST
        reim = jnp.zeros((block_frames, 2 * kb), dtype=jnp.float32)
        for i in range(nc):
            reim = reim + jnp.dot(
                chunk_refs[i][0], dft_ref[i],
                preferred_element_type=jnp.float32, precision=hi,
            )
        re = reim[:, :kb]
        im = reim[:, kb:]
        pspec = re * re + im * im  # lanes >= n_bins are exactly zero
        proj = jnp.dot(
            pspec, mel_ref[:], preferred_element_type=jnp.float32, precision=hi
        )

        clamped = jnp.where(proj <= 0.0, eps, proj)
        if log_kind == "ln":
            logged = jnp.log(clamped)
        elif log_kind == "ln_stab":
            logged = jnp.log(proj + 1e-6)
        elif log_kind == "db":
            logged = 10.0 * jnp.log10(clamped)
        else:  # pragma: no cover - config validates
            raise ValueError(log_kind)

        lane = jax.lax.broadcasted_iota(jnp.int32, (block_frames, mp), 1)
        out = jnp.where(
            lane < n_mels, logged, jnp.where(lane == n_mels, clamped, 0.0)
        )
        out_ref[0] = out

    return kernel


# ---------------------------------------------------------------------------
# Caller
# ---------------------------------------------------------------------------


def _fused_logmel_energy(
    y: jnp.ndarray, cfg: FrontendConfig, num_frames: int, block_frames: int,
    interpret: bool,
) -> jnp.ndarray:
    """y: preemphasized, tail-zeroed audio [B, T] → [B, num_frames, MP] where
    lanes [0:M] are log-mel, lane M is (clamped, unlogged) frame energy."""
    k = kernel_constants(cfg)
    nc, S, kb, mp = k["dims"]
    B = y.shape[0]

    # Shrink the block for short batches so a 1-s utterance doesn't pay for
    # a 256-frame block of padding (sublane granularity is 8).
    block_frames = min(block_frames, max(8, _round_up(num_frames, 8)))
    fp = _round_up(max(num_frames, block_frames), block_frames)
    n_chunks = fp - 1 + nc  # chunk c covers samples [c*S, (c+1)*S)
    t_need = (fp + nc - 1) * S
    if y.shape[-1] < t_need:
        y = jnp.pad(y, ((0, 0), (0, t_need - y.shape[-1])))
    chunks = y[:, : n_chunks * S].reshape(B, n_chunks, S)
    # nc shifted chunk views: view i supplies chunk f+i for frame f.
    views = [jax.lax.slice_in_dim(chunks, i, i + fp, axis=1) for i in range(nc)]

    grid = (B, fp // block_frames)
    chunk_spec = pl.BlockSpec(
        (1, block_frames, S), lambda b, f: (b, f, 0), memory_space=pltpu.VMEM
    )
    in_specs = [chunk_spec] * nc + [
        pl.BlockSpec((nc, S, 2 * kb), lambda b, f: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((kb, mp), lambda b, f: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec(
        (1, block_frames, mp), lambda b, f: (b, f, 0), memory_space=pltpu.VMEM
    )

    flops_per_block = 2 * block_frames * (nc * S * 2 * kb + kb * mp)
    out = pl.pallas_call(
        _make_kernel(cfg, nc, kb, mp, block_frames),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, fp, mp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_block * B * (fp // block_frames),
            bytes_accessed=(B * fp * S * nc + B * fp * mp) * 4,
            transcendentals=B * fp * mp,
        ),
        interpret=interpret,
    )(*views, jnp.asarray(k["dft"]), jnp.asarray(k["mel"]))
    return out[:, :num_frames]


def fused_logmel_stages(
    audio: jnp.ndarray,
    lengths: jnp.ndarray,
    cfg: FrontendConfig,
    *,
    block_frames: int = 256,
    interpret: bool | None = None,
) -> dict[str, jnp.ndarray]:
    """Drop-in fused replacement for ops.chain.logmel_stages.

    Returns the stage dict consumed by chain.features_from_logmel: logmel,
    energy, n_valid, frame_mask. (frames/windowed/pspec never exist in HBM —
    that is the point; use the jnp twin when you need them.)

    interpret=None auto-enables Pallas interpreter mode off-TPU so the same
    code path runs under the CPU test mesh (SURVEY.md §4.2 item 6).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if cfg.dtype not in ("float32",):
        raise NotImplementedError(
            "fused kernel computes in float32; use backend='jnp' for "
            f"dtype={cfg.dtype!r}"
        )

    F = cfg.num_frames(audio.shape[-1])
    audio = audio.astype(jnp.float32)
    y = chain.zero_beyond(chain.preemphasis(audio, cfg.preemph), lengths)
    out = _fused_logmel_energy(y, cfg, F, block_frames, interpret)

    logmel = out[..., : cfg.n_mels]
    energy = out[..., cfg.n_mels]
    n_valid = chain.num_valid_frames(lengths, cfg)
    frame_mask = (
        jnp.arange(F)[None, :] < n_valid[:, None]
    ).astype(jnp.float32)
    return {
        "logmel": logmel,
        "energy": energy,
        "n_valid": n_valid,
        "frame_mask": frame_mask,
    }
