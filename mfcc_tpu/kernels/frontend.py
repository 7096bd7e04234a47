"""The fused front-end Pallas kernel: audio chunks → log-mel (+energy).

One kernel instance handles a block of `block_frames` frames of one
utterance and computes

    frames → ×window → real DFT → |·|² (/NFFT) → mel (+Σ energy) → log

entirely in VMEM, writing only the [block_frames, MP] output block back to
HBM. This is the TPU-native replacement for the reference's per-frame
pocketfft loop (SURVEY.md §2.2: "DFT-as-matmul … real GEMMs on the MXU"):

  * **Framing is free.** The overlap structure (hop S=160 < length L=400)
    never materializes in HBM: audio is viewed as hop-sized chunks
    [B, C, S]; in slab mode the whole utterance's chunks sit resident in
    VMEM (index map constant over frame blocks → fetched once) and each
    block takes one aligned [FBLK+8, S] load plus `pltpu.roll` shifts to
    form [FBLK, nc*S] frame rows; utterances too long for VMEM fall back
    to nc pre-shifted chunk views.
  * **Window, 1/√NFFT and zero-padding fold into the DFT constants** on
    host in float64 (rows ≥ L zero, lanes ≥ bins zero).
  * **Default DFT is a radix-4 DIF factorization** (radix4_constants):
    VPU butterflies on 128-aligned lane quarters, three dense DFT_{N/4}
    matmuls totalling 6·N2² MACs/frame — 3.1× fewer than the direct
    matmul. Real input makes s=3 the conjugate mirror of s=1 so it is
    never computed; the twiddle rotations and the Hermitian trim of the
    real s=0 sub-DFT are folded into the host-side matrices. The direct
    packed [nc*S, 2NB] matmul remains as the generic fallback and as
    `dft_passes="fp32"`.
  * **The packed spectrum layout needs no re/im slicing**: mel-filterbank
    rows are duplicated (or, for radix-4, permuted to the scrambled bin
    order) so melspec = reim² @ mel in one matmul, and **energy rides the
    same matmul** as an all-ones column (the TF C++ kernel's sparse 2-tap
    filterbank [TF mfcc_mel_filterbank.h:47-57] is slower than dense-on-MXU
    at these sizes).
  * **Downstream consumes only the contiguous [0:M+1] lane prefix** at
    block-padded length; the cepstral epilogue is one augmented matmul in
    ops.chain.features_from_logmel (lane slicing a [.., MP] output mid-tile
    measured ~0.45 ms/step at batch-64×10 s).

Accuracy: DFT matmuls run precision=HIGHEST (the MXU multiplies bf16 by
default; signed DFT sums amplify bf16 truncation ~20x and break the 1e-4
oracle gate). The mel/energy projection is all-positive, so it uses the
3-pass bf16 split (_dot_pos_bf16x3) at ~2^-16 relative error. Equivalence
twin: ops.chain.logmel_stages (tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import ml_dtypes

from mfcc_tpu.config import FrontendConfig
from mfcc_tpu.ops import chain
from mfcc_tpu.ops import constants as C
from mfcc_tpu.ops import dither as dither_mod

LANE = 128


def _bf16_split_np(a32: np.ndarray):
    """Host-side bf16 hi/lo split of an fp32 constant."""
    hi = a32.astype(ml_dtypes.bfloat16)
    lo = (a32 - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return hi, lo


def _bf16_split(x):
    """In-kernel bf16 hi/lo split of an fp32 value, fold-proof.

    The arithmetic form `x - x.astype(bf16).astype(f32)` is constant-folded
    to exactly zero by XLA when the kernel body is XLA-compiled (interpret
    mode on a TPU backend) — silently degrading 3-pass matmuls to 1-pass
    bf16 (measured 2.3e-3 log-mel error). The hi part is therefore built by
    integer-masking the low 16 mantissa bits (bf16 truncation, exactly
    bf16-representable), which no convert-fusion rewrite can collapse; the
    residual keeps the same ~2^-16 split quality.
    """
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    # round-half-up to the nearest bf16 (adding 0x8000 carries into the
    # exponent correctly at boundaries); plain truncation costs half a bit
    # of split quality
    hi_f32 = jax.lax.bitcast_convert_type(
        (u + jnp.uint32(0x8000)) & jnp.uint32(0xFFFF0000), jnp.float32
    )
    hi = hi_f32.astype(jnp.bfloat16)
    lo = (x - hi_f32).astype(jnp.bfloat16)
    return hi, lo


def _slab_tail(nc: int) -> int:
    """Extra pad rows a slab-mode block loads beyond block_frames (the
    chunk window of the block's last frame, rounded to sublanes). ONE
    definition: the kernel's load window and the caller's slab allocation
    must agree or the last block reads out of bounds."""
    return max(8, _round_up(nc - 1, 8))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _block_and_fp(num_frames: int, block_frames: int | None = None):
    '''THE block clamp + frame-capacity computation - the single
    definition every producer (slab_geometry, resample_slab_geometry),
    consumer (_fused_logmel_energy, resample_geometry_for_shape) and
    predictor (fused_tail_active) must share: hand-synced copies are how
    a producer/consumer geometry desync (and silent misrouting) would
    start. Returns (block_frames, fp).'''
    if block_frames is None:
        block_frames = _auto_block_frames(num_frames)
    block_frames = _round_up(block_frames, 8)
    block_frames = min(block_frames, max(8, _round_up(num_frames, 8)))
    fp = _round_up(max(num_frames, block_frames), block_frames)
    return block_frames, fp


# ---------------------------------------------------------------------------
# Host-side constant folding
# ---------------------------------------------------------------------------


def fused_tail_reason(cfg: FrontendConfig) -> str | None:
    """None if this config's cepstral epilogue (DCT·lifter·energy-c0 +
    Δ/ΔΔ + per-utterance CMVN/masking) can run INSIDE the kernel — the r4
    "fused tail". Requires the whole utterance in ONE frame block (checked
    at call time), so every delta/CMVN dependency is intra-block."""
    if cfg.features != "mfcc":
        return "fused tail exists for the mfcc cepstral epilogue only"
    if cfg.feat_dim > LANE:
        return f"feat_dim {cfg.feat_dim} > {LANE} output lanes"
    if cfg.n_mels + 1 > LANE:
        return f"n_mels {cfg.n_mels} needs a multi-tile mel prefix"
    return None


@functools.lru_cache(maxsize=32)
def fused_tail_constants(cfg: FrontendConfig):
    """dctaug3 [MP, LANE] fp32: ops.constants.dct_augmented replicated at
    lane offsets 0, C, 2C — one copy per delta order. One HIGHEST-precision
    matmul of the [FBLK, MP] log-mel/log-energy tile against it yields the
    base cepstra TRIPLICATED, so the in-kernel delta shifts read their own
    lane band and the final tile is a pure lane-select (no lane rolls)."""
    aug = C.chain_constants(cfg)["dct_aug"]  # [n_mels+1, n_ceps] float64
    c = cfg.n_ceps
    d = np.zeros((LANE, LANE), dtype=np.float64)
    for j in range(cfg.deltas + 1):
        d[: cfg.n_mels + 1, j * c : (j + 1) * c] = aug
    return {"dctaug3": d.astype(np.float32)}


@functools.lru_cache(maxsize=32)
def kernel_constants(cfg: FrontendConfig):
    """Float64-folded, fp32-cast kernel matrices in the packed 2*n_bins
    layout.

    Returns dict with:
      dft:   [KW, K2] — windowed, scaled DFT matrix; lanes [0:NB] = cos,
             [NB:2NB] = sin, rest zero; rows >= frame_length zero (so the
             chunk tail beyond the frame contributes nothing). KW = nc*S.
      dft_h/dft_l: bf16 hi/lo split of dft for the 3-pass path.
      mel:   [K2, MP] — mel filterbank rows DUPLICATED over the cos and sin
             blocks, so melspec = (re·re+im·im)@mel happens without ever
             slicing re/im apart: pspec-equivalent = reim² @ mel_dup.
             Column n_mels is all-ones over both blocks => frame energy.
      dims: (nc, S, K2, MP)
    """
    L, S = cfg.frame_length, cfg.frame_step
    nc = max(1, -(-L // S))  # ceil(L/S) chunk shifts cover one frame
    KW = nc * S  # samples the kernel "sees" per frame (>= L; tail zeroed)
    NB = cfg.n_bins
    K2 = _round_up(2 * NB, LANE)  # 640 for 257 bins (vs 768 if padded apart)
    if cfg.n_mels + 1 > LANE:
        mp = _round_up(cfg.n_mels + 1, LANE)
    else:
        mp = LANE

    host = C.chain_constants(cfg)
    # rfft(frames, n_fft) TRUNCATES frames longer than n_fft; the folded
    # matrix must do the same — rows beyond n_fft would otherwise alias the
    # tail back in (the DFT angles are periodic in n).
    Le = min(L, cfg.n_fft)
    w = host["window"][:Le]  # [Le] float64
    n = np.arange(Le, dtype=np.float64)[:, None]
    k = np.arange(NB, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * n * k / cfg.n_fft
    scale = (1.0 / np.sqrt(cfg.n_fft)) if cfg.power_scale_nfft else 1.0
    cos = w[:, None] * np.cos(ang) * scale  # [Le, NB]
    sin = w[:, None] * np.sin(ang) * scale

    dft = np.zeros((KW, K2), dtype=np.float64)
    dft[:Le, :NB] = cos
    dft[:Le, NB : 2 * NB] = sin

    mel = np.zeros((K2, mp), dtype=np.float64)
    mel[:NB, : cfg.n_mels] = host["mel"]
    mel[NB : 2 * NB, : cfg.n_mels] = host["mel"]
    if cfg.energy_source == "pspec":
        mel[: 2 * NB, cfg.n_mels] = 1.0  # energy column (sums re² and im²)
    # frame-local energy (Kaldi raw_energy): computed on the VPU inside the
    # conditioning pass (_make_conditioning) and written straight into the
    # epilogue's energy lane — the matmul energy column stays zero

    # bf16 hi/lo splits precomputed on host (the kernel splits only the
    # runtime operands)
    dft32 = dft.astype(np.float32)
    dft_h, dft_l = _bf16_split_np(dft32)
    mel32 = mel.astype(np.float32)
    mel_h, mel_l = _bf16_split_np(mel32)
    out = {
        "dft": dft32,
        "dft_h": dft_h,
        "dft_l": dft_l,
        "mel": mel32,
        "mel_h": mel_h,
        "mel_l": mel_l,
        "dims": (nc, S, K2, mp),
    }
    if cfg.features == "ssc":
        # SSC numerator matrix (freq-weighted mel rows, same duplicated
        # layout, no energy column) + the per-lane clamp vector: every bin
        # has exactly 2 lanes here, so eps/2 per lane reproduces the twin's
        # per-bin where(pspec <= 0, eps, pspec) on exact-zero bins
        melf = np.zeros((K2, mp), dtype=np.float64)
        fw = host["freqs"][:, None] * host["mel"]  # [NB, n_mels]
        melf[:NB, : cfg.n_mels] = fw
        melf[NB : 2 * NB, : cfg.n_mels] = fw
        melf_h, melf_l = _bf16_split_np(melf.astype(np.float32))
        eps_lane = np.zeros((1, K2), dtype=np.float32)
        eps_lane[0, : 2 * NB] = cfg.log_eps / 2.0
        out.update(melf_h=melf_h, melf_l=melf_l, eps_lane=eps_lane)
    if cfg.energy_source == "windowed_frame":
        out["win_energy"] = _win_energy_np(cfg, KW)
    return out


def _win_energy_np(cfg: FrontendConfig, kw: int) -> np.ndarray:
    """[1, KW] window row for the in-kernel windowed-frame energy
    (cfg.energy_source == "windowed_frame": E = Σ (w·frame)² over the FULL
    frame length — unlike the DFT fold, which truncates at n_fft)."""
    host = C.chain_constants(cfg)
    w = np.zeros((1, kw), dtype=np.float64)
    w[0, : cfg.frame_length] = host["window"]
    return w.astype(np.float32)


def radix4_applicable(cfg: FrontendConfig) -> bool:
    """The factorized DFT needs n_fft = 4*N2 with N2 even (h = N2/2 for the
    Hermitian trim of the real s=0 sub-DFT). N2 % 128 == 0 (512, 1024,
    2048-point FFTs) gives 128-aligned stage-1 lane slices; other even N2
    (e.g. whisper's 400-point FFT, N2=100) emit Mosaic lane-shift relayouts
    in stage 1 and pad the stage-2 matmuls to the next lane multiple —
    still ~2.5× fewer MAC-passes than the direct [KW, K2] matmul (measured:
    whisper80 1.87 → 1.40 ms/step, docs/KERNEL.md §4c). Frames longer than
    n_fft need no check: win4 zero-truncates them (= rfft(frames, n_fft)),
    verified in test_frame_longer_than_nfft_truncates."""
    n2 = cfg.n_fft // 4
    return cfg.n_fft % 4 == 0 and n2 % 2 == 0 and n2 >= 8


@functools.lru_cache(maxsize=32)
def radix4_constants(cfg: FrontendConfig):
    """Constants for the radix-4 DIF factorized real DFT.

    X[4q+s] = DFT_{N2}(z_s)[q] with z_s[n] = W_N^{ns} * Σ_{a<4} x[n+a*N2] W_4^{as}
    (N = n_fft, N2 = N/4). Real input ⇒ s=3 is the conjugate mirror of s=1
    (|X| equal), so only s ∈ {0,1,2} are computed: stage 1 is pure VPU work
    on 128-aligned lane blocks (window fold + butterflies), stage 2 is three
    dense MXU matmuls. Two algebraic reductions are folded into the host-side
    matrices (docs/KERNEL.md §2):

      * the per-lane twiddle rotations z_s = T_s · s_s are diagonal complex
        multiplies, so they move into stage 2 for free: f1 ← M1 @ f1 (same
        shape) and f2 ← D2 @ f2, which HALVES the s=2 matmul's K dim (the
        kernel feeds the real s2 directly, no [z2r|z2i] concat);
      * s0 is real, so DFT_{N2}(s0) is Hermitian — only q ≤ h = N2/2 is
        independent. f0 keeps re(q=0..h) and im(q=1..h-1) = exactly N2
        columns (q=0 and q=h are the DC/Nyquist of DFT_{N2}: exactly real).

    Stage-2 MACs: N2² + 4N2² + N2² = 6·N2² per frame (was 8·N2²; the direct
    [KW, 2NB] matmul is 400·514 ≈ 12.3·N2² — 3.1x fewer). The scrambled
    output ordering is absorbed by permuting the mel-matrix rows (bin k's
    weights land on the lanes that carry |X[k]|; conjugate-duplicate lanes
    get zero weight; real-only bins carry weight on a single lane).

    Returns: win4 [4, N2] (window slices, zero beyond frame_length),
    f0 [N2, N2], f1 [2N2, 2N2], f2 [N2, N2], mel [4N2, MP] (+ energy
    column), lanes_per_bin [NB], dims (nc, S, N2, MP).
    """
    assert radix4_applicable(cfg)
    L, S = cfg.frame_length, cfg.frame_step
    N = cfg.n_fft
    N2 = N // 4
    NB = cfg.n_bins
    nc = -(-N // S)  # chunk views needed to cover n_fft samples (4 for 512/160)
    if needs_conditioning(cfg):
        # frame-first conditioning (DC removal / frame preemph / frame
        # energy) operates on the FULL frame length, which may exceed n_fft
        # (rfft truncates; conditioning must not) — widen the chunk window
        nc = max(nc, -(-L // S))
    if cfg.n_mels + 1 > LANE:
        mp = _round_up(cfg.n_mels + 1, LANE)
    else:
        mp = LANE

    host = C.chain_constants(cfg)
    # frames longer than n_fft are truncated (rfft semantics); the window
    # fold keeps only the first n_fft samples
    Le = min(L, N)
    win4 = np.zeros((4, N2), dtype=np.float64)
    wfull = np.zeros(N, dtype=np.float64)
    wfull[:Le] = host["window"][:Le]
    win4[:] = wfull.reshape(4, N2)

    n = np.arange(N2, dtype=np.float64)
    c1, d1 = np.cos(2 * np.pi * n / N), np.sin(2 * np.pi * n / N)
    c2, d2 = np.cos(4 * np.pi * n / N), np.sin(4 * np.pi * n / N)

    scale = (1.0 / np.sqrt(N)) if cfg.power_scale_nfft else 1.0
    q = np.arange(N2, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * n[:, None] * q / N2
    Cm = np.cos(ang) * scale  # [N2, N2]
    Sm = np.sin(ang) * scale  # the IMAG part of W_{N2}^{nq} (already negative)
    h = N2 // 2

    # s=0: real input, Hermitian output -> keep re(q<=h) + im(0<q<h)
    f0 = np.concatenate([Cm[:, : h + 1], Sm[:, 1:h]], axis=1)  # [N2, N2]
    # s=1: complex input [z1r|z1i] @ [[C, S], [-S, C]]; twiddle z1 = T1·s1
    # folded: [z1r|z1i] = [s1r|s1i] @ M1 with M1 block-diagonal-of-diagonals
    f1 = np.block([[Cm, Sm], [-Sm, Cm]])  # [2N2, 2N2]
    M1 = np.block([
        [np.diag(c1), np.diag(-d1)],
        [np.diag(d1), np.diag(c1)],
    ])
    f1 = M1 @ f1
    # s=2: only q < h needed (bins 4q+2 <= N/2); z2 = (c2 - i·d2)·s2 folded
    # through D2 [N2, 2N2] -> f2 [N2, N2], fed by the REAL s2 directly
    f2_full = np.block([[Cm[:, :h], Sm[:, :h]], [-Sm[:, :h], Cm[:, :h]]])
    D2 = np.concatenate([np.diag(c2), np.diag(-d2)], axis=1)  # [N2, 2N2]
    f2 = D2 @ f2_full  # [N2, N2]

    # mel rows permuted to the scrambled lane order:
    # lanes [0,N2):    s=0, Xre q=0..h then Xim q=1..h-1
    # lanes [N2,3N2):  s=1, Xre then Xim (all q)
    # lanes [3N2,4N2): s=2, Xre q<h then Xim q<h
    melfb = host["mel"]  # [NB, n_mels]
    mel = np.zeros((4 * N2, mp), dtype=np.float64)
    covered = set()
    lanes_per_bin = np.zeros(NB, dtype=np.int32)

    def bin_of(s, qq):
        k = 4 * qq + s
        if k < NB:
            return k
        kc = N - k
        return kc if 0 <= kc < NB else None

    energy_rides_matmul = cfg.energy_source == "pspec"
    ssc = cfg.features == "ssc"
    if ssc:
        # SSC numerator (freq-weighted mel rows, same scrambled layout) +
        # the per-lane clamp: eps / lanes_per_bin reproduces the twin's
        # per-bin where(pspec <= 0, eps, pspec) on exact-zero bins (a bin
        # is zero iff ALL its lanes are zero); a zero lane of a nonzero
        # bin picks up a spurious <= eps/2 — ~1e-16 relative, documented
        melf = np.zeros((4 * N2, mp), dtype=np.float64)
        eps_lane = np.zeros((1, 4 * N2), dtype=np.float32)
        freqs = host["freqs"]

    def assign(lanes, s, qq):
        k = bin_of(s, qq)
        if k is None or k in covered:
            return
        covered.add(k)
        lanes_per_bin[k] = len(lanes)
        for lane in lanes:
            mel[lane, : cfg.n_mels] = melfb[k]
            if energy_rides_matmul:
                mel[lane, cfg.n_mels] = 1.0  # energy column
            if ssc:
                melf[lane, : cfg.n_mels] = freqs[k] * melfb[k]
                eps_lane[0, lane] = cfg.log_eps / len(lanes)
    for qq in range(h + 1):
        # q=0 / q=h have no imag lane (exactly real components)
        im = [h + qq] if 0 < qq < h else []
        assign([qq] + im, 0, qq)
    for qq in range(N2):
        assign([N2 + qq, 2 * N2 + qq], 1, qq)
    for qq in range(h):
        assign([3 * N2 + qq, 3 * N2 + h + qq], 2, qq)
    assert len(covered) == NB, (len(covered), NB)

    mel32 = mel.astype(np.float32)
    mel_h, mel_l = _bf16_split_np(mel32)
    out = {
        "win4": win4.astype(np.float32),
        "f0": f0.astype(np.float32),
        "f1": f1.astype(np.float32),
        "f2": f2.astype(np.float32),
        "mel": mel32,
        "mel_h": mel_h,
        "mel_l": mel_l,
        "lanes_per_bin": lanes_per_bin,
        "dims": (nc, S, N2, mp),
    }
    if ssc:
        melf_h, melf_l = _bf16_split_np(melf.astype(np.float32))
        out.update(melf_h=melf_h, melf_l=melf_l, eps_lane=eps_lane)
    if cfg.energy_source == "windowed_frame":
        out["win_energy"] = _win_energy_np(cfg, nc * S)
    return out


# ---------------------------------------------------------------------------
# Kernel body
# ---------------------------------------------------------------------------


# A per-utterance chunk slab larger than this falls back to per-block chunk
# views. The slab path reads the audio from HBM exactly once per utterance
# (the [1, C, S] block's index map is constant over frame blocks, so Mosaic
# keeps it resident in VMEM); the view path materializes nc shifted copies
# in HBM, ~3x the audio traffic (measured ~0.4 ms/step at batch-64 x 10 s).
SLAB_VMEM_BUDGET_BYTES = 8 * 1024 * 1024

# Batch chunking triggers only for batches STRICTLY larger than this.
# r4 NOTE: with the honest in-place (scan-carry) perturbation timing,
# chunking LOSES at every batch size measured (B=256: 2.91 ms unchunked
# vs 3.40 chunked; B=512: 6.21 vs 7.35 — classic13_deltas, b×10 s), so
# max_kernel_batch now defaults to None. The r1-r3 "working-set cliff"
# that motivated chunking was dominated by the old bench's own O(B·T)
# perturbation copy (docs/KERNEL.md §6). The machinery stays for callers
# that want to bound per-call HBM footprint explicitly.
CHUNK_TRIGGER_BATCH = 128


# In slab mode the chunk array carries PROLOGUE rows of zeros so that (a)
# each block's aligned window includes the row before its first frame (the
# pre-emphasis x[t-1] source crossing the block boundary) and (b) block 0
# sees x[-1] = 0. 8 rows keep every load base block-aligned.
SLAB_PROLOGUE_ROWS = 8


def _gather_frames(
    chunk_refs, nc: int, S: int, block_frames: int, slab_mode: bool,
    preemph: float, lengths_ref, dither: tuple[float, int] | None = None,
    convert_scale: float | None = None,
    resample_refs: tuple | None = None,
):
    """[FBLK, nc*S] frame block from either the resident chunk slab (sliced
    at dynamic sublane offsets) or nc pre-shifted chunk views.

    Slab mode consumes RAW audio and applies dither + pre-emphasis +
    beyond-length zeroing here (one VPU pass over the loaded window) — the
    XLA-side passes over [B, T] are skipped entirely. View mode receives
    audio already dithered/preemphasized/zeroed by the caller.

    convert_scale: set (to cfg.input_scale, usually 1.0) when the slab
    carries INT16 PCM rows: the loaded window converts to fp32 and scales
    here, in the same VPU pass that already does dither/preemph — the
    kernel then reads HALF the HBM bytes the fp32 slab cost (the feed's
    int16 rows reach the MXU without ever materializing an fp32 slab;
    i16→f32 is exact, so parity with the fp32-slab path is bitwise —
    VERDICT r4 item 1). None for fp32 slabs (scale already applied by the
    caller).

    dither: (stddev, seed) to add the signal-level contract noise
    (ops/dither.py) IN-KERNEL: the slab's (row, lane) indices are exactly
    the contract's (t // S, t % S) keys, so the hash costs one per-row mix
    at [rows, 1] plus one full-width mix + Box-Muller over the [rows, S]
    slab window — ~4x cheaper than noising the frame-overlap matrix
    (VERDICT r2 item 3: Kaldi's dither=1.0 default no longer forces the
    ~8x slower jnp fallback). Noise is masked to real samples
    (0 <= t < length) so prologue zeros — preemph's x[-1] — and padding
    stay exact; it precedes pre-emphasis like the twin.
    """
    if slab_mode:
        # One ALIGNED load (Mosaic requires sublane-aligned dynamic bases:
        # base is a block multiple, +i would not be), then static roll
        # shifts produce the nc chunk streams.
        slab = chunk_refs[0]  # [1, PRO + C, S] (or [1, R, step] resampling)
        pro = SLAB_PROLOGUE_ROWS
        tail = _slab_tail(nc)  # MUST match the caller's slab allocation
        base = pl.multiple_of(pl.program_id(1) * block_frames, block_frames)
        n_rows = block_frames + tail + pro
        if resample_refs is not None:
            # In-kernel fused resample (r5): the slab carries BLOCKED sr_in
            # PCM ([1, R, step] with input row pro+b = the window of output
            # chunk b); the resampled chunk rows are computed HERE, on the
            # MXU, from the VMEM-resident input — the sr_out signal never
            # exists in HBM. Polyphase block length J == S (one output
            # block per chunk row; ops.resample.slab_design), so the rest
            # of the gather — dither, preemph, zeroing, roll shifts — runs
            # on `big` unchanged. input_scale rides the tap matrices;
            # convert_scale (int16 slabs) is a pure dtype convert here.
            m1_ref, m2_ref, E = resample_refs
            xin = slab[0, pl.ds(base, n_rows + 1), :]  # [n_rows+1, step]
            if convert_scale is not None:
                xin = xin.astype(jnp.float32)
            hi = _RS_PRECISION
            big = jnp.dot(
                xin[:n_rows], m1_ref[:],
                preferred_element_type=jnp.float32, precision=hi,
            )
            # Next-row halo: dot ALL rows against m2 first, then shift the
            # small [n_rows+1, S] OUTPUT down one row. The naive
            # xin[1:, :E] slices the 2 MB matmul OPERAND at a misaligned
            # sublane base — a whole-window Mosaic relayout measured at
            # 0.12 ms/step (b64 x 10 s); the same misalignment on the
            # 3x-smaller output of an add is ~free (docs/KERNEL.md §7c).
            yh = jnp.dot(
                xin[:, :E], m2_ref[:],
                preferred_element_type=jnp.float32, precision=hi,
            )
            big = big + yh[1:]
            # The FIR is non-causal, so the dots give the prologue rows
            # (output samples t < 0) their nonzero backward extension —
            # they read the first real samples through the m2 halo. The
            # contract (and preemph's x[-1] = 0) needs them EXACTLY zero,
            # like the host-written prologue of the 16 kHz slab.
            grow = jax.lax.broadcasted_iota(jnp.int32, (n_rows, S), 0)
            big = jnp.where(base + grow >= pro, big, 0.0)
        else:
            big = slab[0, pl.ds(base, n_rows), :]  # rows [base, base+n_rows)
            if convert_scale is not None:
                big = big.astype(jnp.float32)
                if convert_scale != 1.0:
                    big = big * jnp.float32(convert_scale)

        if dither is not None:
            sigma, seed = dither
            g_row = base - pro + jax.lax.broadcasted_iota(
                jnp.int32, (n_rows, 1), 0
            )
            lane_d = jax.lax.broadcasted_iota(jnp.int32, (n_rows, S), 1)
            noise = dither_mod.dither_field(seed, g_row, lane_d)
            t_d = g_row * S + lane_d
            valid = (t_d >= 0) & (t_d < lengths_ref[pl.program_id(0)])
            big = big + jnp.where(valid, jnp.float32(sigma) * noise, 0.0)

        # y[t] = x[t] - a*x[t-1]; prev via row-roll + lane shift. Row 0's
        # rolled prev is wraparound garbage, but row 0 is prologue: parts
        # only consume rows >= pro, whose prev rows >= pro-1 are real.
        if preemph != 0.0:
            rolled = pltpu.roll(big, shift=1, axis=0)  # row r <- r-1
            prev = jnp.concatenate(
                [rolled[:, S - 1 : S], big[:, : S - 1]], axis=-1
            )
            y = big - jnp.float32(preemph) * prev
        else:
            y = big
        # zero beyond each utterance's length UNCONDITIONALLY (not only for
        # preemph's y[length] leak): callers are not required to pre-zero
        # the padding, and resample ringing extends past output_length.
        # Sample index of (row r, lane j) is (f*FBLK + r - pro)*S + j.
        row = jax.lax.broadcasted_iota(jnp.int32, (n_rows, S), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (n_rows, S), 1)
        t = (base + row - pro) * S + col
        y = jnp.where(t < lengths_ref[pl.program_id(0)], y, 0.0)
        parts = [
            pltpu.roll(y, shift=n_rows - (pro + i), axis=0)[:block_frames]
            for i in range(nc)
        ]
    else:
        parts = [c[0] for c in chunk_refs]
    # One wide matmul beats nc narrow ones: K=nc*S=480 uses 94% of the
    # MXU's K-tiling vs 62% for three K=160 passes (measured 1.3x).
    return jnp.concatenate(parts, axis=-1)


# In-kernel resample dot precision (perf-attribution knob; HIGHEST is the
# accuracy-gated default — bf16 variants were rejected at 8.5e-4 feature
# error, docs/KERNEL.md §7)
_RS_PRECISION = jax.lax.Precision.HIGHEST


# Experimental radix-4 variant: project each stage-2 output through its own
# mel row-group instead of concatenating to [FBLK, 4N2] first (A/B-measured
# in scripts/bench_kernel_ab.py; see docs/KERNEL.md).
_RADIX4_SPLIT_MEL = False


def _dot_pos_bf16x3(x, b_h, b_l, rows=None):
    """3-pass bf16 matmul for ALL-POSITIVE contractions (the mel/energy
    projection of |X|²): with no sign cancellation the relative error is the
    plain ~2^-16 operand truncation, well inside the 1e-4 log-mel gate —
    unlike the DFT, where cancellation amplifies the same truncation ~20x.
    Halves the mel-projection MXU passes vs precision=HIGHEST.

    rows=(lo, hi) contracts against that row slice of the matrix only."""
    xh, xl = _bf16_split(x)
    bh = b_h[:] if rows is None else b_h[rows[0] : rows[1], :]
    bl = b_l[:] if rows is None else b_l[rows[0] : rows[1], :]
    out = jnp.dot(xh, bh, preferred_element_type=jnp.float32)
    out = out + jnp.dot(xl, bh, preferred_element_type=jnp.float32)
    out = out + jnp.dot(xh, bl, preferred_element_type=jnp.float32)
    return out


def needs_conditioning(cfg: FrontendConfig) -> bool:
    """True when the config asks for frame-first conditioning (the Kaldi
    feature-window order): per-frame DC removal, per-frame pre-emphasis,
    or a frame-local (time-domain) energy source. (Dither is SIGNAL-level
    by contract — ops/dither.py — and happens in _gather_frames' slab
    pass, not here.)"""
    return (
        cfg.remove_dc_offset
        or cfg.preemph_mode == "frame"
        or cfg.energy_source != "pspec"
    )


def _make_conditioning(cfg: FrontendConfig):
    """In-kernel twin of the frame-domain ops in chain.logmel_stages (Kaldi
    ProcessWindow order): mask the chunk tail beyond frame_length → remove
    DC offset → raw-frame energy → per-frame pre-emphasis → windowed-frame
    energy. Returns None when the config has none of these, else
    f(frames [FBLK, KW], win_energy_ref|None) -> (frames, energy|None)
    with energy [FBLK, 1] = the un-clamped frame-local energy."""
    if not needs_conditioning(cfg):
        return None
    L = cfg.frame_length
    inv_l = 1.0 / L

    def condition(frames, win_energy_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, frames.shape, 1)
        mask = lane < L
        # the chunk window covers nc*S >= L samples; lanes >= L belong to
        # the NEXT frames and must not leak into means/energies (the DFT
        # fold zeroes them via its rows, but conditioning runs before it)
        f = jnp.where(mask, frames, 0.0)
        if cfg.remove_dc_offset:
            mu = jnp.sum(f, axis=-1, keepdims=True) * jnp.float32(inv_l)
            f = jnp.where(mask, f - mu, 0.0)
        energy = None
        if cfg.energy_source == "raw_frame":  # Kaldi raw_energy=true
            energy = jnp.sum(f * f, axis=-1, keepdims=True)
        if cfg.preemph_mode == "frame":
            # w[n] -= c*w[n-1] for n >= 1; w[0] *= (1-c) == w[0] - c*w[0]
            c = jnp.float32(cfg.preemph)
            prev = jnp.concatenate([f[:, :1], f[:, :-1]], axis=-1)
            f = jnp.where(mask, f - c * prev, 0.0)
        if cfg.energy_source == "windowed_frame":  # Kaldi raw_energy=false
            wf = f * win_energy_ref[0]  # [KW] row, zero beyond L
            energy = jnp.sum(wf * wf, axis=-1, keepdims=True)
        return f, energy

    return condition


def _make_epilogue(cfg: FrontendConfig, mp: int, block_frames: int):
    """proj [FBLK, MP] (mel lanes + energy lane) → output tile: lanes [0:M)
    log-mel, lane M clamped (unlogged) energy, rest zero. frame_energy
    [FBLK, 1] (set for frame-local energy sources) replaces the matmul
    energy column, clamped with the twin's jnp.maximum(e, eps)."""
    eps = float(cfg.log_eps)
    M = cfg.n_mels
    log_kind = cfg.log_kind

    if cfg.features == "ssc":
        # centroids = freq-weighted projection / mel projection, computed
        # on the clamped squared lanes (the per-lane zero-bin clamp lives
        # in the kernel body). Lanes >= M: den is 0 there (no mel weight),
        # the where discards the resulting non-finite quotient; lane M
        # (energy column, pspec energy source) divides 0/energy = 0.
        def epilogue_ssc(num, den):
            lane = jax.lax.broadcasted_iota(jnp.int32, (block_frames, mp), 1)
            return jnp.where(lane < M, num / den, 0.0)

        return epilogue_ssc

    def epilogue(proj, frame_energy=None):
        lane = jax.lax.broadcasted_iota(jnp.int32, (block_frames, mp), 1)
        clamped = jnp.where(proj <= 0.0, eps, proj)
        if cfg.features == "plp":
            # PLP consumes RAW mel energies (equal-loudness + power-law +
            # LPC happen downstream in chain.plp_base, which clamps at 0
            # itself) — skip the log; lane M stays the clamped energy
            if frame_energy is not None:
                e_lane = jnp.maximum(frame_energy, eps)
            else:
                e_lane = clamped
            return jnp.where(
                lane < M, proj, jnp.where(lane == M, e_lane, 0.0)
            )
        if log_kind == "ln":
            logged = jnp.log(clamped)
        elif log_kind == "ln_stab":
            logged = jnp.log(proj + 1e-6)
        elif log_kind == "db":
            logged = 10.0 * jnp.log10(clamped)
        elif log_kind == "ln_floor":  # Kaldi ApplyFloor(eps) then log
            logged = jnp.log(jnp.maximum(proj, eps))
        elif log_kind == "log10_floor":  # librosa/Whisper
            logged = jnp.log10(jnp.maximum(proj, eps))
        else:  # pragma: no cover - config validates
            raise ValueError(log_kind)
        if frame_energy is not None:
            e_lane = jnp.maximum(frame_energy, eps)  # [FBLK, 1] broadcast
        else:
            e_lane = clamped
        return jnp.where(lane < M, logged, jnp.where(lane == M, e_lane, 0.0))

    return epilogue


def _make_feature_tail(cfg: FrontendConfig, mp: int, block_frames: int):
    """In-kernel cepstral epilogue (the r4 fused tail): [FBLK, MP] tile of
    [log-mel | clamped energy] → FINAL feature rows [FBLK, LANE] (lanes
    [0:feat_dim) = [ceps | Δ | ΔΔ], rest zero; pad rows zero; utterance
    CMVN applied when configured). Twin: chain.features_from_logmel's
    prefix path + chain.delta + chain.cmvn_utterance, all of which are
    intra-block because the caller guarantees ONE frame block per
    utterance (fp == block_frames).

    Dynamic pieces come from nv (this utterance's valid frame count, a
    scalar-prefetch value): the delta tail replication selects row nv-1
    via a one-hot reduction (no dynamic slicing), and masking/CMVN use
    row < nv. The dct_aug matmul runs precision=HIGHEST — log-mel is
    signed, so the positive-contraction bf16x3 shortcut does not apply."""
    hi = jax.lax.Precision.HIGHEST
    cc = cfg.n_ceps
    n = cfg.delta_window
    denom = 2.0 * sum(i * i for i in range(1, n + 1))
    f_dim = cfg.feat_dim
    log_floor = float(np.log(cfg.energy_floor)) if cfg.energy_floor > 0 else None

    def tail(tile, daug_ref, nv):
        if cfg.append_energy:
            # lane M holds the clamped (strictly positive) energy; log it
            # in place. The where keeps log() off the log-mel lanes (they
            # can be <= 0) — the discarded branch must stay finite.
            lane_mp = jax.lax.broadcasted_iota(
                jnp.int32, (block_frames, mp), 1
            )
            is_e = lane_mp == cfg.n_mels
            loge = jnp.log(jnp.where(is_e, tile, 1.0))
            if log_floor is not None:
                loge = jnp.maximum(loge, jnp.float32(log_floor))
            tile = jnp.where(is_e, loge, tile)
        y = jnp.dot(
            tile, daug_ref[:], preferred_element_type=jnp.float32,
            precision=hi,
        )  # [FBLK, LANE]: base cepstra at lane offsets 0, C, 2C
        row = jax.lax.broadcasted_iota(jnp.int32, (block_frames, LANE), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (block_frames, LANE), 1)

        def tail_rep(x):
            # replicate row nv-1 over rows >= nv (chain._tail_replicated)
            last = jnp.sum(
                jnp.where(row == nv - 1, x, 0.0), axis=0, keepdims=True
            )
            return jnp.where(row < nv, x, last)

        def dshift(x):
            # chain.delta's static shifts with edge replication at the
            # ARRAY bounds (the tail beyond nv already holds row nv-1)
            first = x[0:1]
            lastr = x[block_frames - 1 : block_frames]
            out = None
            for i in range(1, n + 1):
                k = min(i, block_frames)
                plus = jnp.where(
                    row < block_frames - k,
                    pltpu.roll(x, shift=block_frames - k, axis=0), lastr,
                )
                minus = jnp.where(
                    row >= k, pltpu.roll(x, shift=k, axis=0), first
                )
                t = jnp.float32(i) * (plus - minus)
                out = t if out is None else out + t
            return out * jnp.float32(1.0 / denom)

        yr = tail_rep(y)
        feat = jnp.where(lane < cc, yr, 0.0)
        if cfg.deltas >= 1:
            d = dshift(yr)
            feat = jnp.where((lane >= cc) & (lane < 2 * cc), d, feat)
            if cfg.deltas >= 2:
                dd = dshift(tail_rep(d))
                feat = jnp.where((lane >= 2 * cc) & (lane < f_dim), dd, feat)
        m = (row < nv).astype(jnp.float32)
        if cfg.cmvn == "utterance":
            cnt = jnp.maximum(
                jnp.sum(m[:, :1], axis=0, keepdims=True), 1.0
            )  # [1, 1]
            mu = jnp.sum(feat * m, axis=0, keepdims=True) / cnt
            cent = feat - mu
            if cfg.cmvn_var_norm:
                var = jnp.sum(
                    jnp.square(cent) * m, axis=0, keepdims=True
                ) / cnt
                cent = cent / jnp.sqrt(var + jnp.float32(cfg.cmvn_eps))
            return cent * m
        return feat * m

    return tail


def _make_kernel(
    cfg: FrontendConfig, nc: int, S: int, mp: int, block_frames: int,
    dft_passes: str, slab_mode: bool, fused_tail: bool = False,
    slab_scale: float | None = None, rs_e: int | None = None,
):
    n_chunk_refs = 1 if slab_mode else nc
    epilogue = _make_epilogue(cfg, mp, block_frames)
    condition = _make_conditioning(cfg)
    gather_preemph = _gather_preemph(cfg)
    gather_dither = _gather_dither(cfg)
    feature_tail = (
        _make_feature_tail(cfg, mp, block_frames) if fused_tail else None
    )

    def kernel(*refs):
        # refs: [lengths (B,) SMEM if slab] [+ n_valid (B,) SMEM if fused
        #       tail] + chunk slab [1, PRO+C, S] or
        #       nc chunk views [1, FBLK, S], then
        #       [win_energy [1, KW] if energy_source == "windowed_frame"],
        #       fp32 path: dft [KW, K2], mel_h, mel_l [K2, MP]
        #       bf16x3 path: dft_h, dft_l [KW, K2], mel_h, mel_l [K2, MP]
        #       [+ dctaug3 [MP, LANE] if fused tail]
        #       and finally out ref [1, FBLK, MP]
        nvalid_ref = None
        if slab_mode:
            lengths_ref, refs = refs[0], refs[1:]
            if fused_tail:
                nvalid_ref, refs = refs[0], refs[1:]
        else:
            lengths_ref = None
        chunk_refs = refs[:n_chunk_refs]
        rest = list(refs[n_chunk_refs:])
        out_ref = rest.pop()
        daug_ref = rest.pop() if fused_tail else None
        if cfg.features == "ssc":  # appended by the caller, popped in order
            eps_ref = rest.pop()
            melf_l = rest.pop()
            melf_h = rest.pop()
        rs_refs = None
        if rs_e is not None:  # in-kernel resample taps, consumed first
            rs_refs = (rest.pop(0), rest.pop(0), rs_e)
        we_ref = rest.pop(0) if cfg.energy_source == "windowed_frame" else None
        hi = jax.lax.Precision.HIGHEST
        frames = _gather_frames(
            chunk_refs, nc, S, block_frames, slab_mode, gather_preemph,
            lengths_ref, gather_dither, slab_scale, rs_refs,
        )
        frame_energy = None
        if condition is not None:
            frames, frame_energy = condition(frames, we_ref)
        if dft_passes == "bf16x3":
            # 3-pass compensated matmul: both operands split into bf16
            # hi+lo; the al@bl term (~2^-16 relative) is dropped. ~1.9x
            # faster than precision=HIGHEST (bf16x6) but its ~1e-4 loud-bin
            # log-mel error fails the strict oracle gate — offered for
            # throughput-first log-mel extraction, not default.
            dft_h, dft_l, mel_h, mel_l = rest
            ah, al = _bf16_split(frames)
            reim = jnp.dot(ah, dft_h[:], preferred_element_type=jnp.float32)
            reim = reim + jnp.dot(al, dft_h[:], preferred_element_type=jnp.float32)
            reim = reim + jnp.dot(ah, dft_l[:], preferred_element_type=jnp.float32)
        else:
            # precision=HIGHEST: the TPU MXU multiplies in bf16 by default,
            # which costs ~3 decimal digits and breaks the 1e-4 gate;
            # HIGHEST selects the 6-pass fp32 algorithm.
            dft_ref, mel_h, mel_l = rest
            reim = jnp.dot(
                frames, dft_ref[:], preferred_element_type=jnp.float32,
                precision=hi,
            )
        # packed layout: lanes [0:NB]=re, [NB:2NB]=im, rest 0. The mel rows
        # are duplicated over both blocks, so reim² @ mel == pspec @ mel_fb
        # without ever slicing re/im apart (no relayout).
        pspec2 = reim * reim
        if cfg.features == "ssc":
            # per-lane zero-bin clamp (eps/2 per lane: a bin is zero iff
            # BOTH its re and im lanes are — see kernel_constants), then
            # the num/den positive-matmul pair; divide in the epilogue
            sqc = jnp.where(pspec2 <= 0.0, eps_ref[:], pspec2)
            num = _dot_pos_bf16x3(sqc, melf_h, melf_l)
            den = _dot_pos_bf16x3(sqc, mel_h, mel_l)
            out_ref[0] = epilogue(num, den)
            return
        proj = _dot_pos_bf16x3(pspec2, mel_h, mel_l)

        tile = epilogue(proj, frame_energy)
        if feature_tail is not None:
            tile = feature_tail(tile, daug_ref, nvalid_ref[pl.program_id(0)])
        out_ref[0] = tile

    return kernel


# ---------------------------------------------------------------------------
# Caller
# ---------------------------------------------------------------------------


def _make_radix4_kernel(
    cfg: FrontendConfig, nc: int, S: int, n2: int, mp: int, block_frames: int,
    slab_mode: bool, fused_tail: bool = False,
    slab_scale: float | None = None, rs_e: int | None = None,
):
    hi = jax.lax.Precision.HIGHEST
    n_chunk_refs = 1 if slab_mode else nc
    epilogue = _make_epilogue(cfg, mp, block_frames)
    condition = _make_conditioning(cfg)
    gather_preemph = _gather_preemph(cfg)
    gather_dither = _gather_dither(cfg)
    feature_tail = (
        _make_feature_tail(cfg, mp, block_frames) if fused_tail else None
    )

    def kernel(*refs):
        nvalid_ref = None
        if slab_mode:
            lengths_ref, refs = refs[0], refs[1:]
            if fused_tail:
                nvalid_ref, refs = refs[0], refs[1:]
        else:
            lengths_ref = None
        chunk_refs = refs[:n_chunk_refs]
        rest = list(refs[n_chunk_refs:])
        rs_refs = None
        if rs_e is not None:  # in-kernel resample taps, consumed first
            rs_refs = (rest.pop(0), rest.pop(0), rs_e)
        we_ref = rest.pop(0) if cfg.energy_source == "windowed_frame" else None
        daug_ref = None
        if fused_tail:
            (win_ref, f0_ref, f1_ref, f2_ref, mel_h, mel_l,
             daug_ref, out_ref) = rest
        elif cfg.features == "ssc":
            (win_ref, f0_ref, f1_ref, f2_ref, mel_h, mel_l,
             melf_h, melf_l, eps_ref, out_ref) = rest
        else:
            win_ref, f0_ref, f1_ref, f2_ref, mel_h, mel_l, out_ref = rest
        frames = _gather_frames(
            chunk_refs, nc, S, block_frames, slab_mode, gather_preemph,
            lengths_ref, gather_dither, slab_scale, rs_refs,
        )
        frame_energy = None
        if condition is not None:
            frames, frame_energy = condition(frames, we_ref)
        # stage 1 (VPU): windowed 128-aligned quarter blocks, radix-4
        # butterflies. s=3 skipped: real input makes it the conjugate
        # mirror of s=1. Twiddles are folded into f1/f2 on the host.
        x = [frames[:, a * n2 : (a + 1) * n2] * win_ref[a] for a in range(4)]
        s0 = x[0] + x[1] + x[2] + x[3]
        s1r = x[0] - x[2]
        s1i = x[3] - x[1]
        s2 = x[0] - x[1] + x[2] - x[3]
        # stage 2 (MXU): three dense DFT_{N2} matmuls (6·N2² MACs/frame)
        x0 = jnp.dot(s0, f0_ref[:], preferred_element_type=jnp.float32,
                     precision=hi)
        x1 = jnp.dot(jnp.concatenate([s1r, s1i], axis=-1), f1_ref[:],
                     preferred_element_type=jnp.float32, precision=hi)
        x2 = jnp.dot(s2, f2_ref[:], preferred_element_type=jnp.float32,
                     precision=hi)
        if cfg.features == "ssc":
            # scrambled-lane squared spectrum, per-lane zero-bin clamp
            # (eps / lanes_per_bin — radix4_constants), then the num/den
            # positive-matmul pair; the epilogue divides
            y = jnp.concatenate([x0, x1, x2], axis=-1)  # [FBLK, 4*N2]
            sqc = y * y
            sqc = jnp.where(sqc <= 0.0, eps_ref[:], sqc)
            num = _dot_pos_bf16x3(sqc, melf_h, melf_l)
            den = _dot_pos_bf16x3(sqc, mel_h, mel_l)
            out_ref[0] = epilogue(num, den)
            return
        if _RADIX4_SPLIT_MEL:
            # mel projection per stage-2 output: skips the [FBLK, 4N2] lane
            # concat + full-width square (a lane relayout) at the cost of
            # two extra (smaller) matmul calls — same total MACs
            n2_ = x0.shape[-1]
            proj = _dot_pos_bf16x3(x0 * x0, mel_h, mel_l, rows=(0, n2_))
            proj = proj + _dot_pos_bf16x3(
                x1 * x1, mel_h, mel_l, rows=(n2_, 3 * n2_)
            )
            proj = proj + _dot_pos_bf16x3(
                x2 * x2, mel_h, mel_l, rows=(3 * n2_, 4 * n2_)
            )
        else:
            y = jnp.concatenate([x0, x1, x2], axis=-1)  # [FBLK, 4*N2]
            proj = _dot_pos_bf16x3(y * y, mel_h, mel_l)
        tile = epilogue(proj, frame_energy)
        if feature_tail is not None:
            tile = feature_tail(tile, daug_ref, nvalid_ref[pl.program_id(0)])
        out_ref[0] = tile

    return kernel


def resolve_dft_passes(cfg: FrontendConfig, dft_passes: str = "radix4") -> str:
    """The dft_passes actually used (radix4 falls back to the direct fp32
    matmul for n_fft the factorization cannot tile)."""
    if dft_passes == "radix4" and not radix4_applicable(cfg):
        return "fp32"
    return dft_passes


def slab_dims(cfg: FrontendConfig, dft_passes: str = "radix4"):
    """(chunk, pro, tail) of the slab layout for this config — the shape
    invariants that don't depend on utterance length."""
    dft_passes = resolve_dft_passes(cfg, dft_passes)
    if dft_passes == "radix4":
        nc, S, _, _ = radix4_constants(cfg)["dims"]
    else:
        nc, S, _, _ = kernel_constants(cfg)["dims"]
    return S, SLAB_PROLOGUE_ROWS, _slab_tail(nc)


def slab_geometry(
    cfg: FrontendConfig, t_samples: int,
    block_frames: int | None = None, dft_passes: str = "radix4",
) -> dict | None:
    """Chunk-slab geometry for slab-mode fused extraction of (padded)
    t_samples-long audio, or None when the utterance exceeds the VMEM slab
    budget (the kernel then runs in view mode, which needs flat audio).

    THE single source of the layout contract between _fused_logmel_energy
    and producers that emit chunk slabs directly (the fused resample seam,
    ops.resample.resample_to_chunk_slab): [B, n_rows, S] with n_rows =
    pro + fp + tail, sample t of an utterance at (row pro + t // S,
    lane t % S), prologue/tail rows zero."""
    dft_passes = resolve_dft_passes(cfg, dft_passes)
    if dft_passes == "radix4":
        nc, S, _, _ = radix4_constants(cfg)["dims"]
    else:
        nc, S, _, _ = kernel_constants(cfg)["dims"]
    F = cfg.num_frames(t_samples)
    block_frames, fp = _block_and_fp(F, block_frames)
    tail = _slab_tail(nc)
    pro = SLAB_PROLOGUE_ROWS
    n_rows = pro + fp + tail
    if n_rows * S * 4 > SLAB_VMEM_BUDGET_BYTES:
        return None
    return {
        "block_frames": block_frames, "fp": fp, "pro": pro, "tail": tail,
        "nc": nc, "chunk": S, "n_rows": n_rows, "num_frames": F,
        "dft_passes": dft_passes,
    }


@functools.lru_cache(maxsize=64)
def slab_layout(cfg: FrontendConfig, bucket_len: int):
    """Host-feed contract for pre-built chunk slabs (the slab twin of
    ops.resample.BlockedLayout): pad_batch(layout=<this>) writes each
    utterance straight into the fused kernel's [n_rows, chunk] slab layout
    during its one pad copy — the device-side pad+reshape retile (~0.1 ms
    at batch-64 × 10 s) and, for centered configs, the whole XLA
    reflect-extension prologue (~0.6 ms, docs/KERNEL.md §4c) disappear.

    Returns a SlabLayout (hashable namedtuple-style dict) or None when the
    fused kernel can't own this config (non-fp32, unsupported knobs, slab
    over the VMEM budget) — callers then feed flat audio as before.

    Contract (single source: slab_geometry): flat sample t of the
    (possibly reflect-extended) signal lives at row pro + t//chunk, lane
    t % chunk; rows outside are zero. For center modes the host writes the
    REFLECT-EXTENDED signal (input_scale and signal pre-emphasis applied
    first, mirroring _reflect_extend); for standard modes it writes raw
    samples and the kernel conditions as usual (input_scale then rides
    extract_batch's in-graph multiply, so int16 rows stay exact).
    """
    if cfg.input_sample_rate and cfg.input_sample_rate != cfg.sample_rate:
        return None  # the blocked resample layout owns resampling configs
    if cfg.dtype != "float32":
        return None
    if chain.pallas_unsupported_reason(cfg) is not None:
        return None
    centered = cfg.frame_tail in ("center", "center_reflect")
    if centered and cfg.dither > 0.0:
        return None  # noise must precede the host-side reflection
    geo = slab_geometry(cfg, bucket_len)
    if geo is None:
        return None
    return SlabLayout(
        n_rows=geo["n_rows"], chunk=geo["chunk"], pro=geo["pro"],
        tail=geo["tail"], fp=geo["fp"], num_frames=geo["num_frames"],
        bucket_len=bucket_len, extended=centered,
    )


@dataclasses.dataclass(frozen=True)
class SlabLayout:
    n_rows: int      # slab rows per utterance
    chunk: int       # lane width = frame hop S
    pro: int         # zero prologue rows
    tail: int        # zero tail rows beyond the frame capacity
    fp: int          # frame capacity (block-rounded; >= num_frames)
    num_frames: int  # true frame count of a bucket_len utterance
    bucket_len: int  # max raw samples per utterance
    extended: bool   # host writes the reflect-EXTENDED signal (center modes)

    @property
    def buffer_shape(self) -> tuple[int, int]:
        return (self.n_rows, self.chunk)

    @property
    def flat_offset(self) -> int:
        """Flat position of input sample 0 in the [n_rows * chunk] stream
        (the host writes samples starting here; zeros elsewhere)."""
        return self.pro * self.chunk

    def host_rows(self, cfg: FrontendConfig, u: "np.ndarray") -> "np.ndarray":
        """The flat sample stream to write at offset pro*chunk for one
        utterance (identity for standard modes; the scaled/pre-emphasized
        reflect-extension — numpy twin of _reflect_extend — for center
        modes), truncated to the slab capacity like the XLA path."""
        cap = (self.n_rows - self.pro) * self.chunk
        if not self.extended:
            return u[:cap]
        x = np.asarray(u, np.float32)
        if cfg.input_scale != 1.0:
            x = x * np.float32(cfg.input_scale)
        if cfg.preemph_mode == "signal" and cfg.preemph != 0.0:
            y = x.copy()
            y[1:] -= np.float32(cfg.preemph) * x[:-1]
            x = y
        L, S = cfg.frame_length, cfg.frame_step
        n = max(1, x.shape[0])
        if cfg.frame_tail == "center_reflect":
            shift, tail_sz = -(L // 2), L // 2
        else:
            shift, tail_sz = S // 2 - L // 2, L
        p_head = max(0, -shift)
        idx = np.arange(shift, n + tail_sz + (shift + p_head), dtype=np.int64)
        if cfg.frame_tail == "center":
            m = np.mod(idx, 2 * n)
            ridx = np.where(m < n, m, 2 * n - 1 - m)
        else:
            m = np.mod(idx, max(2 * n - 2, 1))
            ridx = np.where(m < n, m, 2 * n - 2 - m)
        return x[ridx][:cap] if x.shape[0] else np.zeros(0, np.float32)


def resample_slab_geometry(
    cfg: FrontendConfig, n_in: int,
    block_frames: int | None = None, dft_passes: str = "radix4",
) -> dict | None:
    """Geometry for the IN-KERNEL fused resample (r5, VERDICT r4 item 2):
    the host feeds blocked sr_in PCM [B, r_rows, step] (input sample t at
    row pro + (pad_lo + t) // step, lane (pad_lo + t) % step; zeros
    elsewhere) and ONE kernel resamples in VMEM, frames, and produces
    log-mel — the sr_out signal never exists in HBM. Requires the
    polyphase design to block at J = frame hop (ops.resample.slab_design);
    returns None when it can't, when the config doesn't resample, or when
    the input slab exceeds the VMEM budget (callers fall back to the
    BlockedLayout + XLA-dots seam, which handles everything).

    num_frames/fp are in OUTPUT (sr_out) frames; r_rows carries one extra
    input row for the last block's polyphase halo."""
    from mfcc_tpu.ops import resample

    if not cfg.input_sample_rate or cfg.input_sample_rate == cfg.sample_rate:
        return None
    dft_passes = resolve_dft_passes(cfg, dft_passes)
    if dft_passes == "radix4":
        nc, S, _, _ = radix4_constants(cfg)["dims"]
    else:
        nc, S, _, _ = kernel_constants(cfg)["dims"]
    d = resample.slab_design(
        cfg.input_sample_rate, cfg.sample_rate, S, cfg.input_scale
    )
    if d is None:
        return None
    n_out = resample.output_length(
        n_in, cfg.input_sample_rate, cfg.sample_rate
    )
    F = cfg.num_frames(n_out)
    block_frames, fp = _block_and_fp(F, block_frames)
    tail = _slab_tail(nc)
    pro = SLAB_PROLOGUE_ROWS
    r_rows = pro + fp + tail + 1
    if r_rows * d["step"] * 4 > SLAB_VMEM_BUDGET_BYTES:
        return None
    return {
        "design": d, "block_frames": block_frames, "fp": fp, "pro": pro,
        "tail": tail, "r_rows": r_rows, "step": d["step"],
        "pad_lo": d["pad_lo"], "num_frames": F, "n_out": n_out,
        "dft_passes": dft_passes,
    }


def resample_geometry_for_shape(
    cfg: FrontendConfig, n_rows: int, width: int,
    dft_passes: str = "radix4",
) -> dict | None:
    """Consumer-side EXACT validation of a [B, n_rows, width] feed against
    the in-kernel resample-slab contract: the design must block at
    J = hop, width must equal the polyphase step, n_rows must decompose as
    pro + fp + tail + 1 with a block-consistent fp, and the slab must fit
    the VMEM budget. Returns the geometry dict (capacity frame semantics:
    num_frames = fp) or None.

    This is the trace-time inverse of resample_slab_geometry — extract_batch
    dispatches on it rather than on a loose lane-width test, because for
    44.1 kHz the BlockedLayout's step coincides with the rs step
    (_block_J(160) == the 160-sample hop → both lay 441-wide rows) and a
    loose test misrouted blocked feeds (r5 review finding). A blocked feed
    whose row count coincides with a valid rs geometry remains ambiguous
    by shape alone — callers that KNOW their layout pass
    extract_batch(input_layout=...) to bypass this heuristic."""
    from mfcc_tpu.ops import resample

    if not cfg.input_sample_rate or cfg.input_sample_rate == cfg.sample_rate:
        return None
    dft_passes = resolve_dft_passes(cfg, dft_passes)
    if dft_passes == "radix4":
        nc, S, _, _ = radix4_constants(cfg)["dims"]
    else:
        nc, S, _, _ = kernel_constants(cfg)["dims"]
    d = resample.slab_design(
        cfg.input_sample_rate, cfg.sample_rate, S, cfg.input_scale
    )
    if d is None or width != d["step"]:
        return None
    tail = _slab_tail(nc)
    pro = SLAB_PROLOGUE_ROWS
    fp = n_rows - pro - tail - 1
    if fp < 8:
        return None
    # fp must round-trip the consumer's block recomputation exactly
    block, fp2 = _block_and_fp(fp)
    if fp2 != fp:
        return None
    if n_rows * d["step"] * 4 > SLAB_VMEM_BUDGET_BYTES:
        return None
    return {
        "design": d, "block_frames": block, "fp": fp, "pro": pro,
        "tail": tail, "r_rows": n_rows, "step": d["step"],
        "pad_lo": d["pad_lo"], "dft_passes": dft_passes,
        # NOTE deliberately NO "num_frames" key: this consumer-side dict
        # only knows the CAPACITY fp; the producer dict's num_frames is
        # the true frame count - same key with two meanings invited
        # trailing-garbage bugs (r5 review)
    }


@dataclasses.dataclass(frozen=True)
class ResampleSlabLayout:
    """Host-feed contract for the in-kernel fused resample (the resampling
    twin of SlabLayout): [B, n_rows, chunk] rows of RAW sr_in samples,
    sample t at flat position flat_offset + t. extract_batch dispatches on
    the lane width (== the polyphase step, != the frame hop) and the
    fused kernel resamples in VMEM. int16 rows supported (the kernel
    converts; input_scale rides the tap matrices)."""

    n_rows: int      # input slab rows (pro + fp + tail + 1)
    chunk: int       # lane width = polyphase step (sr_in samples per hop)
    pro: int         # zero prologue rows
    pad_lo: int      # design zeros before input sample 0 (inside row pro)
    fp: int          # OUTPUT frame capacity (block-rounded)
    num_frames: int  # true frame count of a bucket_len input
    bucket_len: int  # max raw INPUT samples per utterance
    extended: bool = False  # API compat with SlabLayout; never extended

    @property
    def buffer_shape(self) -> tuple[int, int]:
        return (self.n_rows, self.chunk)

    @property
    def flat_offset(self) -> int:
        return self.pro * self.chunk + self.pad_lo


def resample_slab_layout(
    cfg: FrontendConfig, bucket_len: int
) -> ResampleSlabLayout | None:
    """ResampleSlabLayout for this config's bucket, or None when the fused
    kernel can't own it (non-fp32, centered framing, unsupported knobs, no
    J = hop design, input slab over the VMEM budget)."""
    if cfg.dtype != "float32":
        return None
    if cfg.frame_tail in ("center", "center_reflect"):
        return None
    if chain.pallas_unsupported_reason(cfg) is not None:
        return None
    geo = resample_slab_geometry(cfg, bucket_len)
    if geo is None:
        return None
    return ResampleSlabLayout(
        n_rows=geo["r_rows"], chunk=geo["step"], pro=geo["pro"],
        pad_lo=geo["pad_lo"], fp=geo["fp"], num_frames=geo["num_frames"],
        bucket_len=bucket_len,
    )


def _fused_logmel_energy(
    audio: jnp.ndarray | None, lengths: jnp.ndarray, cfg: FrontendConfig,
    num_frames: int, block_frames: int, interpret: bool, dft_passes: str,
    chunks: jnp.ndarray | None = None,
    n_valid: jnp.ndarray | None = None,
    rs: dict | None = None,
) -> jnp.ndarray:
    """audio: RAW fp32 audio [B, T] (zero beyond each length, as pad_batch
    produces) → [B, fp, MP] where lanes [0:M] are log-mel, lane M is the
    clamped (unlogged) frame energy.

    rs: an ops.resample.slab_design dict — chunks is then a BLOCKED sr_in
    input slab [B, R, step] (R = pro + fp + slab_tail + 1 rows; input
    sample t at row pro + (pad_lo+t)//step, lane (pad_lo+t)%step) and the
    kernel resamples IN-VMEM before framing (the fused resample seam, r5).
    `lengths` and num_frames are in OUTPUT (sr_out) samples/frames as
    usual. input_scale must already ride the rs tap matrices.

    n_valid: per-utterance VALID frame counts [B] — passing it (for an
    eligible mfcc config, slab mode, single frame block) activates the
    fused cepstral tail: the output lanes become the FINAL features
    [ceps | Δ | ΔΔ], masked/CMVN'd, and the XLA epilogue disappears.

    Slab mode consumes the raw audio directly — pre-emphasis and
    beyond-length zeroing happen in-kernel on the VMEM-resident window (the
    XLA pass over [B, T] is skipped). View mode preemphasizes in XLA.

    chunks: optional pre-built chunk slab in the slab_geometry layout
    (e.g. from ops.resample.resample_to_chunk_slab) — audio may then be
    None; only valid when the geometry is slab-mode."""
    if dft_passes == "radix4":
        k = radix4_constants(cfg)
        nc, S, n2, mp = k["dims"]
    else:
        k = kernel_constants(cfg)
        nc, S, k2, mp = k["dims"]
    B = (chunks if audio is None else audio).shape[0]

    # Shrink the block for short batches so a 1-s utterance doesn't pay for
    # a 256-frame block of padding (sublane granularity is 8). User-passed
    # values round UP to a sublane multiple: slab mode's dynamic load base
    # (a block multiple) must be 8-aligned for Mosaic.
    block_frames, fp = _block_and_fp(num_frames, block_frames)
    # slab mode loads PRO+FBLK+slab_tail rows per block (aligned base +
    # static roll shifts; the prologue supplies preemph's x[t-1] across
    # block starts), so it needs extra pad chunks; see _gather_frames
    slab_tail = _slab_tail(nc)
    pro = SLAB_PROLOGUE_ROWS
    if rs is not None:
        # in-kernel resample mode: VMEM holds the blocked INPUT slab (the
        # sr_out signal never materializes); one extra row supplies the
        # last block's polyphase halo
        r_rows = pro + fp + slab_tail + 1
        slab_mode = r_rows * rs["step"] * 4 <= SLAB_VMEM_BUDGET_BYTES
        if chunks is None or audio is not None:
            raise ValueError("rs mode requires a blocked input slab")
        want = (B, r_rows, rs["step"])
        if not slab_mode or chunks.shape != want:
            raise ValueError(
                f"blocked input slab {chunks.shape} does not match the "
                f"resample-slab geometry {want} (slab_mode={slab_mode}); "
                "build it with resample_slab_geometry()"
            )
    else:
        slab_mode = (pro + fp + slab_tail) * S * 4 <= SLAB_VMEM_BUDGET_BYTES
        if chunks is not None:
            want = (B, pro + fp + slab_tail, S)
            if not slab_mode or chunks.shape != want:
                raise ValueError(
                    f"chunk slab {chunks.shape} does not match the slab-mode "
                    f"geometry {want} (slab_mode={slab_mode}); build it with "
                    "slab_geometry()"
                )

    # int16 slabs (the mp feed's native row dtype): the kernel loads the
    # PCM rows directly — HALF the slab HBM bytes — and converts (+ scales
    # by cfg.input_scale) in the gather's VPU pass. i16→f32 is exact, so
    # this is bit-identical to the fp32-slab path (VERDICT r4 item 1).
    # In rs mode input_scale rides the tap matrices, so the convert is
    # pure (scale 1.0).
    slab_scale = None
    if chunks is not None and jnp.issubdtype(chunks.dtype, jnp.integer):
        if chunks.dtype != jnp.int16:
            raise ValueError(
                f"integer chunk slabs must be int16, got {chunks.dtype}"
            )
        if fp != block_frames and block_frames % 16 != 0:
            # multi-block dynamic load bases must be 16-sublane aligned for
            # the packed dtype. Every multi-block geometry here uses a
            # 256-multiple block (_BLOCK_CANDIDATES), so only an exotic
            # user-passed block can land here — convert in XLA then
            # (correctness over bytes).
            chunks = chunks.astype(jnp.float32)
            if rs is None and cfg.input_scale != 1.0:
                chunks = chunks * jnp.float32(cfg.input_scale)
        else:
            slab_scale = 1.0 if rs is not None else float(cfg.input_scale)

    lengths = lengths.astype(jnp.int32)
    if rs is not None:
        views = [chunks]
        chunk_spec = pl.BlockSpec(
            (1, r_rows, rs["step"]), lambda b, f, *_: (b, 0, 0),
            memory_space=pltpu.VMEM,
        )
    elif slab_mode:
        n_chunks = pro + fp + slab_tail
        if chunks is None:
            # raw audio with a zero prologue (x[-1] = 0 for the first
            # frame) and the block tail; front+tail padding is ONE XLA pad
            # op — the same single copy the tail-only pad already cost
            t_need = (fp + slab_tail) * S
            y = jnp.pad(
                audio[:, :t_need],
                ((0, 0), (pro * S, max(0, t_need - audio.shape[-1]))),
            )
            chunks = y.reshape(B, n_chunks, S)
        views = [chunks]
        # *_: under PrefetchScalarGridSpec index maps also receive the
        # scalar-prefetch refs — ignored here
        chunk_spec = pl.BlockSpec(
            (1, n_chunks, S), lambda b, f, *_: (b, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        if _gather_dither(cfg) is not None:
            # view mode (utterance exceeds the VMEM slab budget): the slab
            # dither pass never runs, so add the same contract noise in XLA
            audio, _ = dither_mod.add_signal_dither(audio, cfg)
        if _gather_preemph(cfg) != 0.0:
            y = chain.zero_beyond(chain.preemphasis(audio, cfg.preemph), lengths)
        else:  # preemph happens in the conditioning pass (frame mode) or
            # already happened in the reflect-extension prologue (center)
            y = chain.zero_beyond(audio, lengths)
        n_chunks = fp - 1 + nc
        t_need = n_chunks * S
        if y.shape[-1] < t_need:
            y = jnp.pad(y, ((0, 0), (0, t_need - y.shape[-1])))
        chunks = y[:, : n_chunks * S].reshape(B, n_chunks, S)
        # view i supplies chunk f+i for frame f
        views = [jax.lax.slice_in_dim(chunks, i, i + fp, axis=1) for i in range(nc)]
        chunk_spec = pl.BlockSpec(
            (1, block_frames, S), lambda b, f: (b, f, 0), memory_space=pltpu.VMEM
        )

    grid = (B, fp // block_frames)

    def full_spec(arr):
        nd = arr.ndim
        # _n is KEYWORD-ONLY (after *_) so a scalar-prefetch ref passed
        # positionally can never capture it
        return pl.BlockSpec(
            arr.shape, lambda b, f, *_, _n=nd: (0,) * _n,
            memory_space=pltpu.VMEM,
        )

    out_spec = pl.BlockSpec(
        (1, block_frames, mp), lambda b, f, *_: (b, f, 0),
        memory_space=pltpu.VMEM,
    )

    # Fused cepstral tail (r4): requires the per-utterance n_valid (only
    # the caller knows the pre-extension lengths), slab mode (SMEM
    # scalars) and the WHOLE utterance in one frame block
    fused_tail = (
        n_valid is not None
        and slab_mode
        and fp == block_frames
        and mp == LANE
        and fused_tail_reason(cfg) is None
    )
    if n_valid is not None and not fused_tail:
        # the caller (fused_logmel_stages) predicts activation via
        # fused_tail_active; a disagreement would silently mislabel the
        # output lanes — fail loudly instead
        raise AssertionError(
            "n_valid passed but the fused tail did not activate "
            f"(slab_mode={slab_mode}, fp={fp}, block={block_frames})"
        )

    if dft_passes == "radix4":
        consts = [jnp.asarray(k[name]) for name in ("win4", "f0", "f1", "f2", "mel_h", "mel_l")]
        kernel = _make_radix4_kernel(
            cfg, nc, S, n2, mp, block_frames, slab_mode, fused_tail,
            slab_scale, rs["E"] if rs else None,
        )
        # stage-2 MACs: N2*N2 + 2N2*2N2 + N2*N2 = 6*N2^2, x6 fp32 passes;
        # the mel projection runs 3 bf16 passes (_dot_pos_bf16x3)
        mac_per_frame = 6 * n2 * n2 * 6 + 4 * n2 * mp * 3
    elif dft_passes == "bf16x3":
        consts = [jnp.asarray(k["dft_h"]), jnp.asarray(k["dft_l"]),
                  jnp.asarray(k["mel_h"]), jnp.asarray(k["mel_l"])]
        kernel = _make_kernel(
            cfg, nc, S, mp, block_frames, dft_passes, slab_mode, fused_tail,
            slab_scale, rs["E"] if rs else None,
        )
        mac_per_frame = nc * S * k2 * 3 + k2 * mp * 3
    else:
        consts = [jnp.asarray(k["dft"]), jnp.asarray(k["mel_h"]), jnp.asarray(k["mel_l"])]
        kernel = _make_kernel(
            cfg, nc, S, mp, block_frames, dft_passes, slab_mode, fused_tail,
            slab_scale, rs["E"] if rs else None,
        )
        mac_per_frame = nc * S * k2 * 6 + k2 * mp * 3

    if fused_tail:
        # consumed LAST (popped just before out_ref); HIGHEST-precision
        # matmul of the [FBLK, MP] tile -> 6 passes over MP x LANE
        consts = consts + [jnp.asarray(fused_tail_constants(cfg)["dctaug3"])]
        mac_per_frame += mp * LANE * 6

    if cfg.features == "ssc":
        # freq-weighted mel split + per-lane clamp row, consumed LAST by
        # the kernels (appended after the shared consts); the second
        # positive matmul costs another 3 bf16 passes over the same K
        consts = consts + [
            jnp.asarray(k["melf_h"]), jnp.asarray(k["melf_l"]),
            jnp.asarray(k["eps_lane"]),
        ]
        mac_per_frame += (4 * n2 if dft_passes == "radix4" else k2) * mp * 3

    if cfg.energy_source == "windowed_frame":
        # consumed FIRST by the kernels (popped off the const list head)
        consts = [jnp.asarray(k["win_energy"])] + consts

    if rs is not None:
        # in-kernel resample taps, consumed FIRST (before win_energy's pop
        # they sit ahead of it in the const list head)
        consts = [jnp.asarray(rs["m1"]), jnp.asarray(rs["m2"])] + consts
        mac_per_frame += (rs["step"] + rs["E"]) * S * 6

    inputs = list(views) + consts
    in_specs = [chunk_spec] * len(views) + [full_spec(c) for c in consts]

    in_bytes = 2 if slab_scale is not None else 4  # int16 slabs halve reads
    cost = pl.CostEstimate(
        flops=2 * mac_per_frame * B * fp,
        bytes_accessed=B * fp * S * nc * in_bytes + B * fp * mp * 4,
        transcendentals=B * fp * mp,
    )
    if slab_mode:
        # per-utterance lengths for the in-kernel beyond-length zeroing go
        # in as a SCALAR-PREFETCH arg: fetched into SMEM ONCE before the
        # grid starts (a (B,1) SMEM BlockSpec with a constant index map is
        # re-DMA'd per grid step). Measurement note: this was NOT the
        # batch-256 anomaly — per-utterance kernel time still grew
        # 14.6→18.0 µs from batch 64→256 after this change; the actual
        # mitigation is batch chunking in fused_logmel_stages.
        scalars = [lengths]
        if fused_tail:
            scalars.append(n_valid.astype(jnp.int32))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(scalars),
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, fp, mp), jnp.float32),
            cost_estimate=cost,
            interpret=interpret,
        )(*scalars, *inputs)
    else:
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((B, fp, mp), jnp.float32),
            cost_estimate=cost,
            interpret=interpret,
        )(*inputs)
    return out  # [B, fp, MP]; caller trims frames at the very end


def _reflect_extend(audio, lengths, cfg: FrontendConfig):
    """Rewrite centered framing as STANDARD strided framing on a reflected
    extension of the signal, so the fused kernel's framer applies unchanged:
    ext[i] = x[reflect(i + shift)] makes frame t start at ext[t*S] exactly.

      frame_tail="center_reflect" (librosa/torch center=True, whisper80):
        shift = -(L//2), numpy-pad reflection (period 2(n-1), edge sample
        not repeated);
      frame_tail="center" (Kaldi snip_edges=false):
        shift = S//2 - L//2, symmetric reflection (period 2n, edge repeated).

    The reflection map is total, so every valid frame reads REAL samples;
    returns (ext [B, T + slack], new_lengths) where new_lengths bounds the
    last valid frame's end for the in-kernel beyond-length zeroing. Signal-
    level pre-emphasis (when configured) is applied BEFORE reflection here
    — reflect(preemph(x)) is the twin's order — so the kernel's gather
    pre-emphasis must be disabled for these modes (_gather_preemph).

    Cost note: a whole-row take_along_axis gather scalarizes on TPU
    (measured 122 ms/step at batch-64 × 10 s). Only the boundary regions
    actually differ from the identity, so ext is one static concat
    [head | x | zeros] plus two TINY per-row gathers — head and tail
    windows of O(frame_length) samples — with the tail written at each
    row's dynamic offset (a vmapped dynamic_update_slice)."""
    L, S = cfg.frame_length, cfg.frame_step
    B, T = audio.shape
    if cfg.preemph_mode == "signal" and cfg.preemph != 0.0:
        audio = chain.zero_beyond(chain.preemphasis(audio, cfg.preemph), lengths)
    n = jnp.maximum(lengths, 1).astype(jnp.int32)[:, None]  # [B, 1]
    center_reflect = cfg.frame_tail == "center_reflect"

    def refl_values(idx):
        """values x[reflect(idx)] for per-row global indices idx [B, K]."""
        return jnp.take_along_axis(
            audio, chain.reflect_index(idx, n, cfg.frame_tail), axis=-1
        )

    if center_reflect:
        p_head = L // 2
        tail_sz = L // 2
        new_len = lengths + 2 * (L // 2)
    else:
        shift = S // 2 - L // 2
        p_head = max(0, -shift)
        tail_sz = L  # bound on how far past n the last valid frame reads
        new_len = lengths + p_head + L
        if shift > 0:  # degenerate L < S: frames start inside the signal;
            # fall back to the full gather (correctness over speed)
            ext_len = T + L
            i = jnp.arange(ext_len, dtype=jnp.int32)[None, :] + shift
            ext = refl_values(jnp.broadcast_to(i, (B, ext_len)))
            return ext, new_len.astype(jnp.int32)

    # head: ext[0:p_head] = x[reflect(-p_head .. -1)]
    head = refl_values(
        jnp.broadcast_to(
            jnp.arange(-p_head, 0, dtype=jnp.int32)[None, :], (B, p_head)
        )
    )
    # tail: ext[p_head + n + k] = x[reflect(n + k)], k < tail_sz
    tail = refl_values(jnp.arange(tail_sz, dtype=jnp.int32)[None, :] + n)
    ext = jnp.concatenate(
        [head, audio, jnp.zeros((B, tail_sz), audio.dtype)], axis=-1
    )
    starts = p_head + jnp.maximum(lengths, 1).astype(jnp.int32)
    ext = jax.vmap(
        lambda row, t, s: jax.lax.dynamic_update_slice(row, t, (s,))
    )(ext, tail, starts)
    return ext, new_len.astype(jnp.int32)


def _gather_preemph(cfg: FrontendConfig) -> float:
    """Signal-level pre-emphasis coefficient for the in-kernel gather: zero
    when pre-emphasis happens elsewhere (frame mode: the conditioning pass;
    center modes: the XLA reflect-extension prologue)."""
    if cfg.preemph_mode == "frame":
        return 0.0
    if cfg.frame_tail in ("center", "center_reflect"):
        return 0.0
    return cfg.preemph


def _gather_dither(cfg: FrontendConfig) -> tuple[float, int] | None:
    """(stddev, seed) for the in-kernel slab dither, or None when dither is
    off or happens in XLA instead (center modes: the noise must precede the
    reflect-extension, so fused_logmel_stages adds it to the flat signal;
    view mode: _fused_logmel_energy's XLA prologue — _gather_frames' view
    branch never dithers)."""
    if cfg.dither <= 0.0:
        return None
    if cfg.frame_tail in ("center", "center_reflect"):
        return None
    return (cfg.dither, cfg.dither_seed)


# 2048 added r4: at 20-s utterances (1999 frames) one 2048 block beats
# 2x1024 (0.876 vs 0.896 ms at b32, v5e); padding-minimization still
# picks 1024 for <=1024-frame utterances.
_BLOCK_CANDIDATES = (256, 512, 1024, 2048)


def _auto_block_frames(num_frames: int) -> int:
    """Frame-axis grid block: minimize block padding first (padded frames
    are real MXU work), then prefer the larger block — fewer grid steps.
    Post-twiddle-fold sweep on v5e at 999 frames (batch 64, classic13):
    1024 → 0.839 ms/step, 512 → 0.877, 256 → 0.920."""
    return min(
        _BLOCK_CANDIDATES,
        key=lambda b: (-(-num_frames // b) * b, -b),
    )


def fused_tail_active(
    cfg: FrontendConfig, num_frames: int,
    block_frames: int | None = None, dft_passes: str = "radix4",
) -> bool:
    """THE single decision point for the in-kernel cepstral tail: True iff
    _fused_logmel_energy will activate it for this (config, frame count,
    block choice). fused_logmel_stages routes n_valid and picks the
    stage-dict shape on this answer, so the two must never disagree —
    _fused_logmel_energy asserts it."""
    if fused_tail_reason(cfg) is not None:
        return False
    dft_passes = resolve_dft_passes(cfg, dft_passes)
    if dft_passes == "radix4":
        nc, S, _, mp = radix4_constants(cfg)["dims"]
    else:
        nc, S, _, mp = kernel_constants(cfg)["dims"]
    if mp != LANE:
        return False
    block_frames, fp = _block_and_fp(num_frames, block_frames)
    if fp != block_frames:
        return False
    return (
        (SLAB_PROLOGUE_ROWS + fp + _slab_tail(nc)) * S * 4
        <= SLAB_VMEM_BUDGET_BYTES
    )


def fused_logmel_stages(
    audio: jnp.ndarray | None,
    lengths: jnp.ndarray,
    cfg: FrontendConfig,
    *,
    block_frames: int | None = None,  # None: auto via _auto_block_frames
    interpret: bool | None = None,
    dft_passes: str = "radix4",
    max_kernel_batch: int | None = None,
    chunks: jnp.ndarray | None = None,
    chunks_t: int | None = None,
    chunks_frames: int | None = None,
    chunks_extended: bool = False,
    feature_tail: bool | None = None,
    resample_slab: dict | None = None,
) -> dict[str, jnp.ndarray]:
    """Drop-in fused replacement for ops.chain.logmel_stages.

    Returns the stage dict consumed by chain.features_from_logmel: logmel,
    energy, n_valid, frame_mask. (frames/windowed/pspec never exist in HBM —
    that is the point; use the jnp twin when you need them.)

    interpret=None auto-enables Pallas interpreter mode off-TPU so the same
    code path runs under the CPU test mesh (SURVEY.md §4.2 item 6).

    feature_tail=True opts into the r4 in-kernel cepstral tail
    (DCT·lifter·energy + Δ/ΔΔ + CMVN fused into the kernel; the stage
    dict then carries "features_fused" instead of logmel/energy). It is
    NON-DEFAULT because it measured slower than the XLA epilogue
    (docs/KERNEL.md §5); it activates only where fused_tail_active()
    says the geometry allows (single frame block, slab mode).

    chunks: pre-built chunk slab in the slab_geometry layout (audio=None
    then; the producer must have applied input_scale already). The frame
    count comes from chunks_t (nominal sample count, F = num_frames) or
    directly from chunks_frames (capacity semantics — the host slab feed,
    which only knows the slab's row count; frames beyond each utterance's
    true count are masked by lengths). Centered frame_tail modes require
    chunks_extended=True: the producer wrote the reflect-EXTENDED signal
    into the slab (pipeline.pad_batch(layout=SlabLayout) — the host twin
    of _reflect_extend), and `lengths` stays in original samples; the
    extended in-kernel bound is derived here.

    resample_slab: an ops.resample.slab_design dict — chunks is then the
    BLOCKED sr_in input slab of resample_slab_geometry (the in-kernel
    fused resample, r5). lengths/chunks_frames are in OUTPUT samples/
    frames; int16 rows allowed (raw PCM; input_scale rides the taps).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if cfg.dtype not in ("float32",):
        raise NotImplementedError(
            "fused kernel computes in float32; use backend='jnp' for "
            f"dtype={cfg.dtype!r}"
        )

    if dft_passes not in ("radix4", "bf16x3", "fp32"):
        raise ValueError(
            f"dft_passes={dft_passes!r} not in ('radix4', 'bf16x3', 'fp32')"
        )
    dft_passes = resolve_dft_passes(cfg, dft_passes)
    if chunks is not None:
        if (chunks_t is None) == (chunks_frames is None):
            raise ValueError(
                "chunks requires exactly one of chunks_t / chunks_frames"
            )
        centered = cfg.frame_tail in ("center", "center_reflect")
        if chunks_extended and jnp.issubdtype(chunks.dtype, jnp.integer):
            raise ValueError(
                "extended (host-reflected) chunk slabs are host-conditioned "
                "float32; int16 slabs exist for standard frame_tail modes "
                "only"
            )
        if chunks_extended and cfg.dither > 0.0:
            raise ValueError(
                "extended (host-reflected) chunk slabs cannot express "
                "dither: the noise must precede the reflection; feed flat "
                "audio (slab_layout already returns None for this combo)"
            )
        if centered and not chunks_extended:
            raise ValueError(
                "pre-chunked input cannot express centered framing unless "
                "the producer reflect-extended it (chunks_extended=True); "
                "pass flat audio instead"
            )
        if chunks_extended and not centered:
            raise ValueError("chunks_extended only applies to center modes")
        F = cfg.num_frames(chunks_t) if chunks_t is not None else chunks_frames
        tail_on = (
            feature_tail is True
            and resample_slab is None
            and fused_tail_active(cfg, F, block_frames, dft_passes)
        )
        if block_frames is None:
            block_frames = _auto_block_frames(F)
        orig_lengths = lengths
        nv = chain.num_valid_frames(orig_lengths, cfg) if tail_on else None
        if chunks_extended:
            # in-kernel beyond-length zeroing bound on the EXTENDED signal
            # (same formulas as _reflect_extend's new_len)
            L, S = cfg.frame_length, cfg.frame_step
            if cfg.frame_tail == "center_reflect":
                lengths = lengths + 2 * (L // 2)
            else:
                lengths = lengths + max(0, -(S // 2 - L // 2)) + L
            lengths = lengths.astype(jnp.int32)
        B = chunks.shape[0]
        c = max_kernel_batch
        if c and B > max(c, CHUNK_TRIGGER_BATCH) and B % c == 0:
            nv_m = (jnp.zeros_like(lengths) if nv is None else nv)
            out = jax.lax.map(
                lambda t: _fused_logmel_energy(
                    None, t[1], cfg, F, block_frames, interpret, dft_passes,
                    chunks=t[0], n_valid=t[2] if tail_on else None,
                    rs=resample_slab,
                ),
                (
                    chunks.reshape(B // c, c, *chunks.shape[1:]),
                    lengths.reshape(B // c, c),
                    nv_m.reshape(B // c, c),
                ),
            )
            out = out.reshape(B, *out.shape[2:])
        else:
            out = _fused_logmel_energy(
                None, lengths, cfg, F, block_frames, interpret, dft_passes,
                chunks=chunks, n_valid=nv, rs=resample_slab,
            )
        return _stage_dict(out, orig_lengths, cfg, F, fused=tail_on)
    F = cfg.num_frames(audio.shape[-1])
    tail_on = (
        feature_tail is True
        and fused_tail_active(cfg, F, block_frames, dft_passes)
    )
    if block_frames is None:
        block_frames = _auto_block_frames(F)
    audio = audio.astype(jnp.float32)
    if cfg.input_scale != 1.0:
        audio = audio * jnp.float32(cfg.input_scale)
    orig_lengths = lengths
    nv = chain.num_valid_frames(orig_lengths, cfg) if tail_on else None
    if cfg.frame_tail in ("center", "center_reflect"):
        if cfg.dither > 0.0:
            # noise precedes the reflection (the reflected head/tail carry
            # dithered samples, like the twin's framing of the dithered
            # signal); _gather_dither is None here so the kernel won't
            # dither again
            audio, _ = dither_mod.add_signal_dither(audio, cfg)
        # centered framing becomes standard framing on the reflected
        # extension (frame t starts at ext[t*S]); F above was computed from
        # the ORIGINAL length, and n_valid below uses orig_lengths
        audio, lengths = _reflect_extend(audio, lengths, cfg)
    B = audio.shape[0]
    c = max_kernel_batch
    if c and B > max(c, CHUNK_TRIGGER_BATCH) and B % c == 0:
        # Opt-in batch chunking (off by default since r4): the r1-r3
        # measurements that motivated it timed steps with a fresh O(B·T)
        # perturbation buffer per iteration; under in-place carry timing
        # the single kernel call wins at every B measured and large
        # batches sit within 2-8% of the batch-64 per-utterance rate
        # (docs/KERNEL.md §6). Kept for callers that must bound per-call
        # HBM footprint.
        nv_m = (
            jnp.zeros_like(lengths) if nv is None else nv
        )
        out = jax.lax.map(
            lambda t: _fused_logmel_energy(
                t[0], t[1], cfg, F, block_frames, interpret, dft_passes,
                n_valid=t[2] if tail_on else None,
            ),
            (
                audio.reshape(B // c, c, audio.shape[-1]),
                lengths.reshape(B // c, c),
                nv_m.reshape(B // c, c),
            ),
        )
        out = out.reshape(B, *out.shape[2:])
    else:
        out = _fused_logmel_energy(
            audio, lengths, cfg, F, block_frames, interpret, dft_passes,
            n_valid=nv,
        )
    return _stage_dict(out, orig_lengths, cfg, F, fused=tail_on)


def _stage_dict(
    out: jnp.ndarray, orig_lengths: jnp.ndarray, cfg: FrontendConfig, F: int,
    fused: bool = False,
) -> dict[str, jnp.ndarray]:
    """Kernel output [B, fp, MP] → the stage dict features_from_logmel
    consumes. The hot path consumes only the contiguous [0:M+1] lane prefix
    (log-mel + raw energy) at full block-padded length; single-lane or
    offset lane slices of the [B, fp, MP] output cost ~0.45 ms/step in XLA,
    so the cepstral epilogue downstream works on the prefix via one
    augmented matmul (chain.features_from_logmel). The trimmed
    logmel/energy views exist for tests/inspection and are DCE'd unused."""
    fp = out.shape[1]
    n_valid = chain.num_valid_frames(orig_lengths, cfg)
    frame_mask_fp = (
        jnp.arange(fp)[None, :] < n_valid[:, None]
    ).astype(jnp.float32)
    if fused:
        # the r4 fused cepstral tail: output lanes are FINAL features
        # (ceps | Δ | ΔΔ, masked/CMVN'd) — no logmel/energy views exist
        return {
            "features_fused": out[:, :F, : cfg.feat_dim],
            "n_valid": n_valid,
            "frame_mask": frame_mask_fp[:, :F],
            "frame_mask_fp": frame_mask_fp,
            "num_frames": F,
        }
    return {
        "logmel": out[:, :F, : cfg.n_mels],
        "energy": out[:, :F, cfg.n_mels],
        "n_valid": n_valid,
        "frame_mask": frame_mask_fp[:, :F],
        "frame_mask_fp": frame_mask_fp,
        "num_frames": F,
        "prefix_fp": out[..., : cfg.n_mels + 1],
    }
