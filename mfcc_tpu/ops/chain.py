"""The pure-jnp feature chain — the jittable twin of the float64 oracle.

Every stage here is a small functional op on fixed-shape arrays, written so
that the whole chain jits into one XLA program (static shapes, no Python
control flow on traced values; all convention branches resolve at trace time
from the static `FrontendConfig`).

Design notes (SURVEY.md §7):
  - Batch layout is `audio[B, T]` + `lengths[B]`; frames are derived with a
    static frame count `F = num_frames(T)` and a per-utterance *traced* valid
    frame count, so padding never changes the numbers on valid frames
    (masking-invariance test, SURVEY.md §4.2 item 4).
  - Pre-emphasis runs on the raw signal and is then re-zeroed beyond each
    utterance's length: the oracle applies preemph *before* the zero-padded
    framing tail, so pad samples must stay exactly zero.
  - Framing is a static strided gather (`take` along time); the Pallas kernel
    K1 (mfcc_tpu/kernels/stft.py) replaces frame+window+FFT+|.|^2 with an
    MXU DFT-matmul — this module is its equivalence twin.
  - Deltas use clipped-index gathers so the edge replication happens at each
    utterance's *valid* boundary, not the pad boundary.

Oracle parity: mfcc_tpu/ops/reference_numpy.py (the spec); tested against
the frozen goldens in tests/test_jnp_chain.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mfcc_tpu.config import FrontendConfig
from mfcc_tpu.ops import constants as C

# ---------------------------------------------------------------------------
# Constants on device
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def device_constants(cfg: FrontendConfig, dtype_name: str | None = None):
    """Chain constants cast once from host float64 to the compute dtype
    (SURVEY.md §7.2 hard-part #1). Returned as *numpy* arrays: used inside a
    jit trace they embed as XLA constants, so caching them is trace-safe
    (caching jnp arrays here would leak tracers when first called under jit).
    """
    dtype = np.dtype(dtype_name or cfg.dtype)
    host = C.chain_constants(cfg)
    return {k: np.asarray(v, dtype=dtype) for k, v in host.items()}


def compute_dtype(cfg: FrontendConfig):
    return jnp.dtype(cfg.dtype)


# ---------------------------------------------------------------------------
# Frame-count algebra (traced-safe mirrors of FrontendConfig.num_frames)
# ---------------------------------------------------------------------------


def num_valid_frames(lengths: jnp.ndarray, cfg: FrontendConfig) -> jnp.ndarray:
    """Per-utterance valid frame count; mirrors cfg.num_frames for traced n.

    Deviation from cfg.num_frames: length 0 counts 0 frames, not 1 — a
    zero-length row is batch padding, and its phantom ceil-frame must not
    leak into masks or global CMVN moment counts.
    """
    L, S = cfg.frame_length, cfg.frame_step
    if cfg.frame_tail == "pad":
        # 1 + ceil(max(0, n - L) / S); ceil(a/S) = (a + S - 1) // S for a >= 0
        a = jnp.maximum(0, lengths - L)
        n = 1 + (a + S - 1) // S
    elif cfg.frame_tail == "center":
        n = (lengths + S // 2) // S
    elif cfg.frame_tail == "center_reflect":
        n = 1 + (lengths + 2 * (L // 2) - L) // S
    else:
        n = jnp.where(lengths >= L, 1 + (lengths - L) // S, 0)
    if cfg.drop_last_frame:
        n = jnp.maximum(0, n - 1)
    return jnp.where(lengths > 0, n, 0)


# ---------------------------------------------------------------------------
# Stages — all operate on [..., T] / [..., F, X] with leading batch dims
# ---------------------------------------------------------------------------


def preemphasis(x: jnp.ndarray, coeff: float) -> jnp.ndarray:
    """(B1) y[0] = x[0]; y[t] = x[t] - coeff * x[t-1], along the last axis."""
    if coeff == 0.0:
        return x
    return jnp.concatenate([x[..., :1], x[..., 1:] - coeff * x[..., :-1]], axis=-1)


def zero_beyond(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Zero samples at t >= length (restores the oracle's zero pad tail)."""
    t = jnp.arange(x.shape[-1])
    mask = t[None, :] < lengths[:, None]
    return x * mask.astype(x.dtype)


def frame_signal(x: jnp.ndarray, num_frames: int, cfg: FrontendConfig) -> jnp.ndarray:
    """(B2) static strided gather: frames[..., f, n] = x[..., f*S + n].

    Requires x.shape[-1] >= (num_frames-1)*S + L (caller pads; see
    mfcc_tpu.pipeline.batch.required_samples).
    """
    L, S = cfg.frame_length, cfg.frame_step
    idx = np.arange(L)[None, :] + S * np.arange(num_frames)[:, None]  # [F, L]
    return jnp.take(x, jnp.asarray(idx), axis=-1)


def reflect_index(idx: jnp.ndarray, n: jnp.ndarray, kind: str) -> jnp.ndarray:
    """Closed-form edge-reflection index maps into [0, n) — THE single
    definition shared by the jnp framer below, the fused kernel's
    reflect-extension prologue (kernels/frontend._reflect_extend) and, in
    numpy form, the longform host prologue. n broadcasts against idx
    (per-utterance traced lengths), pre-clamped to >= 1 by callers.

    kind "center" (Kaldi snip_edges=false): symmetric reflection, the edge
    sample IS repeated (index -1 -> 0) — period-2n triangular map.
    kind "center_reflect" (librosa / torch.stft center=True,
    pad_mode="reflect"): edge sample NOT repeated (index -1 -> 1) —
    period 2(n-1) (clamped to 1 for n == 1: constant signal).
    """
    if kind == "center":
        m = jnp.mod(idx, 2 * n)
        return jnp.where(m < n, m, 2 * n - 1 - m)
    m = jnp.mod(idx, jnp.maximum(2 * n - 2, 1))
    return jnp.where(m < n, m, 2 * n - 2 - m)


def frame_signal_centered(
    x: jnp.ndarray, num_frames: int, lengths: jnp.ndarray, cfg: FrontendConfig
) -> jnp.ndarray:
    """Centered framing with per-utterance edge reflection (reflect_index
    semantics per frame_tail): frame f covers f*S + S//2 - L//2 + [0, L)
    ("center") or f*S - L//2 + [0, L) ("center_reflect").

    Per-row dynamic gather over the full frame grid — the jnp twin's
    path. The fused Pallas backend supports these modes too, via the
    boundary-only reflect-extension prologue in kernels/frontend.py
    (_reflect_extend), which is much cheaper on TPU.
    """
    L, S = cfg.frame_length, cfg.frame_step
    offset = (S // 2 - L // 2) if cfg.frame_tail == "center" else -(L // 2)
    idx = np.arange(L)[None, :] + S * np.arange(num_frames)[:, None] \
        + offset  # [F, L], may be negative or >= length
    n = jnp.maximum(lengths, 1).astype(jnp.int32)[:, None, None]  # [B,1,1]
    r = reflect_index(jnp.asarray(idx, jnp.int32)[None], n, cfg.frame_tail)
    return jax.vmap(lambda row, ri: row[ri])(x, r)  # [B, F, L]


def power_spectrum(windowed: jnp.ndarray, cfg: FrontendConfig) -> jnp.ndarray:
    """(B4+B5) rfft with n=n_fft (pads/truncates), |X|^2 (optionally / NFFT)."""
    spec = jnp.fft.rfft(windowed, n=cfg.n_fft, axis=-1)
    p = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    if cfg.power_scale_nfft:
        p = p / cfg.n_fft
    return p.astype(windowed.dtype)


def apply_log(x: jnp.ndarray, cfg: FrontendConfig) -> jnp.ndarray:
    """(B7) log compression variants (Appendix C log row); "ln_floor" is the
    Kaldi ApplyFloor(eps)-then-log convention (floors tiny positives too)."""
    eps = jnp.asarray(cfg.log_eps, x.dtype)
    if cfg.log_kind == "ln":
        return jnp.log(jnp.where(x <= 0, eps, x))
    if cfg.log_kind == "ln_stab":
        return jnp.log(x + 1e-6)
    if cfg.log_kind == "db":
        return 10.0 * jnp.log10(jnp.where(x <= 0, eps, x))
    if cfg.log_kind == "ln_floor":
        return jnp.log(jnp.maximum(x, eps))
    if cfg.log_kind == "log10_floor":  # librosa/Whisper
        return jnp.log10(jnp.maximum(x, eps))
    raise ValueError(cfg.log_kind)


def preemphasis_frames(frames: jnp.ndarray, coeff: float) -> jnp.ndarray:
    """Per-frame pre-emphasis (Kaldi ProcessWindow): along the sample axis
    of each frame, w[n] -= coeff*w[n-1] for n >= 1 and w[0] *= (1-coeff)."""
    if coeff == 0.0:
        return frames
    return jnp.concatenate(
        [frames[..., :1] * (1.0 - coeff),
         frames[..., 1:] - coeff * frames[..., :-1]],
        axis=-1,
    )


def _tail_replicated(feat: jnp.ndarray, n_valid: jnp.ndarray) -> jnp.ndarray:
    """Copy row n_valid-1 into every row t >= n_valid (one tiny [B,1,D]
    gather instead of a full-tensor gather — TPU gathers of [B,F,D] indices
    were measured at ~9 ms each on v5e and dominated the whole chain)."""
    F = feat.shape[-2]
    idx = jnp.maximum(n_valid - 1, 0).astype(jnp.int32)
    idx = jnp.broadcast_to(
        idx[..., None, None], feat.shape[:-2] + (1, feat.shape[-1])
    )
    last = jnp.take_along_axis(feat, idx, axis=-2)  # [..., 1, D]
    t = jnp.arange(F)
    mask = (t[..., :, None] < n_valid[..., None, None]).astype(feat.dtype)
    return feat * mask + last * (1.0 - mask)


def delta(feat: jnp.ndarray, n_valid: jnp.ndarray, cfg: FrontendConfig) -> jnp.ndarray:
    """(B10) regression delta with edge replication at the *valid* boundary.

    feat: [..., F, D]; n_valid: per-utterance valid frame count [...].
    Gather-free: the tail beyond n_valid is first overwritten with the last
    valid row, after which the clipped-index semantics
    c[min(t+i, n_valid-1)] / c[max(t-i, 0)] reduce to static shifts with
    edge replication at the array bounds.
    """
    N = cfg.delta_window
    F = feat.shape[-2]
    denom = 2.0 * sum(i * i for i in range(1, N + 1))
    x = _tail_replicated(feat, n_valid)
    out = jnp.zeros_like(x)
    for i in range(1, N + 1):
        k = min(i, F)  # utterances shorter than the window replicate fully
        plus = jnp.concatenate(
            [x[..., k:, :]] + [x[..., -1:, :]] * k, axis=-2
        )
        minus = jnp.concatenate(
            [x[..., :1, :]] * k + [x[..., : F - k, :]], axis=-2
        )
        out = out + i * (plus - minus)
    return out / jnp.asarray(denom, feat.dtype)


def cmvn_utterance(
    feat: jnp.ndarray, frame_mask: jnp.ndarray, cfg: FrontendConfig
) -> jnp.ndarray:
    """(B11) masked per-utterance mean/variance norm over valid frames.

    feat: [..., F, D]; frame_mask: [..., F] in {0, 1}.
    """
    m = frame_mask[..., None].astype(feat.dtype)
    n = jnp.maximum(m.sum(axis=-2, keepdims=True), 1.0)
    mu = (feat * m).sum(axis=-2, keepdims=True) / n
    out = feat - mu
    if cfg.cmvn_var_norm:
        var = (jnp.square(feat - mu) * m).sum(axis=-2, keepdims=True) / n
        out = out / jnp.sqrt(var + cfg.cmvn_eps)
    return out * m  # keep pad frames exactly zero


def cmvn_apply_moments(
    feat: jnp.ndarray, s1: jnp.ndarray, s2: jnp.ndarray, n, cfg: FrontendConfig
) -> jnp.ndarray:
    """Global CMVN from corpus moment triples (Σx, Σx², n) — the algebra the
    psum reduction reproduces (mfcc_tpu/parallel/cmvn.py)."""
    mu = s1 / n
    out = feat - mu
    if cfg.cmvn_var_norm:
        var = s2 / n - mu * mu
        out = out / jnp.sqrt(var + cfg.cmvn_eps)
    return out


# ---------------------------------------------------------------------------
# PLP (jnp twins of reference_numpy.durbin / lpc_to_cepstrum / plp_base;
# shared by the offline chain, the fused-kernel epilogue path and the
# streaming base block — all frame-local, any leading batch dims)
# ---------------------------------------------------------------------------


def durbin(r: jnp.ndarray, lpc_order: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Levinson-Durbin, unrolled over the (static, small) order: r
    [..., P+1] → (a [..., P], residual energy E [...]). Guarded division
    makes all-zero rows (padding frames) yield a = 0, E = 0."""
    a = jnp.zeros(r.shape[:-1] + (lpc_order,), r.dtype)
    e = r[..., 0]
    for i in range(lpc_order):
        acc = r[..., i + 1]
        for j in range(i):
            acc = acc - a[..., j] * r[..., i - j]
        k = jnp.where(e != 0, acc / jnp.where(e == 0, 1.0, e), 0.0)
        new = a.at[..., i].set(k)
        for j in range(i):
            new = new.at[..., j].set(a[..., j] - k * a[..., i - 1 - j])
        a = new
        e = e * (1.0 - k * k)
    return a, e


def lpc_to_cepstrum(a: jnp.ndarray) -> jnp.ndarray:
    """c_n = a_n + Σ_{k<n} (k/n)·c_k·a_{n-k} (cepstra of 1/A(z))."""
    p = a.shape[-1]
    c = jnp.zeros_like(a)
    for n in range(1, p + 1):
        acc = a[..., n - 1]
        for k in range(1, n):
            acc = acc + (k / n) * c[..., k - 1] * a[..., n - k - 1]
        c = c.at[..., n - 1].set(acc)
    return c


def plp_base(
    melspec: jnp.ndarray, energy: jnp.ndarray, cfg: FrontendConfig
) -> jnp.ndarray:
    """PLP cepstra from mel energies [..., M] (twin of
    reference_numpy.plp_base; Kaldi compute-plp-feats order)."""
    k = device_constants(cfg)
    dtype = melspec.dtype
    el = jnp.asarray(k["equal_loudness"], dtype)
    mel = jnp.maximum(melspec, 0.0) * el
    mel = jnp.power(mel, jnp.asarray(cfg.compress_factor, dtype))
    dup = jnp.concatenate([mel[..., :1], mel, mel[..., -1:]], axis=-1)
    r = jnp.matmul(
        dup, jnp.asarray(k["idft"], dtype).T, preferred_element_type=dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    a, e = durbin(r, cfg.lpc_order)
    c = lpc_to_cepstrum(a)
    eps = jnp.asarray(cfg.log_eps, dtype)
    c0 = jnp.log(jnp.maximum(e, eps))
    base = jnp.concatenate([c0[..., None], c[..., : cfg.n_ceps - 1]], axis=-1)
    base = base * jnp.asarray(k["lifter"], dtype)  # lifter[0] == 1
    if cfg.append_energy:
        log_e = jnp.log(energy)
        if cfg.energy_floor > 0.0:
            log_e = jnp.maximum(
                log_e, jnp.asarray(np.log(cfg.energy_floor), dtype)
            )
        lane = jnp.arange(cfg.n_ceps)
        base = jnp.where(lane == 0, log_e[..., None], base)
    return base


# ---------------------------------------------------------------------------
# Full batched chain
# ---------------------------------------------------------------------------


def pallas_unsupported_reason(cfg: FrontendConfig) -> str | None:
    """None if the fused Pallas kernel implements this config; otherwise a
    human-readable reason (extract() auto-falls back to the jnp twin).

    As of r4 every config family is kernel-resident — mfcc/logmel/plp/ssc
    across all convention lineages (ssc rides a second positive matmul
    against the freq-weighted mel matrix with a per-lane zero-bin clamp;
    kernels/frontend.py radix4_constants). The hook stays for future knobs
    and for the callers that route on it (extract, longform, slab_layout)."""
    return None


def logmel_stages(
    audio: jnp.ndarray, lengths: jnp.ndarray, cfg: FrontendConfig
) -> dict[str, jnp.ndarray]:
    """Stages (B1)-(B7) on a padded batch. audio: [B, T]; lengths: [B].

    Returns every intermediate (for per-stage golden tests) plus the
    per-frame validity mask. T must be >= required_samples(T) framing span
    (mfcc_tpu.pipeline.batch handles the padding).
    """
    k = device_constants(cfg)
    dtype = compute_dtype(cfg)
    audio = audio.astype(dtype)
    if cfg.input_scale != 1.0:
        audio = audio * jnp.asarray(cfg.input_scale, dtype)

    F = cfg.num_frames(audio.shape[-1])
    dither_noise = None
    if cfg.dither > 0.0:
        # signal-level counter-based noise (the cross-backend contract,
        # ops/dither.py) BEFORE pre-emphasis in both modes — the same field
        # the fused kernel adds to its chunk slab; exposed for oracle replay
        from mfcc_tpu.ops import dither as _dither

        audio, dither_noise = _dither.add_signal_dither(audio, cfg)
    if cfg.preemph_mode == "signal":
        y = zero_beyond(preemphasis(audio, cfg.preemph), lengths)
    else:  # frame-first conditioning (Kaldi order): frame the raw signal
        y = zero_beyond(audio, lengths)
    if cfg.frame_tail in ("center", "center_reflect"):
        frames = frame_signal_centered(y, F, lengths, cfg)  # [B, F, L]
    else:
        # pad the time axis so the last frame's gather stays in bounds
        span = (F - 1) * cfg.frame_step + cfg.frame_length
        if span > y.shape[-1]:
            y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, span - y.shape[-1])])
        frames = frame_signal(y, F, cfg)  # [B, F, L]
    eps = jnp.asarray(cfg.log_eps, dtype)
    if cfg.remove_dc_offset:
        frames = frames - frames.mean(axis=-1, keepdims=True)
    if cfg.energy_source == "raw_frame":  # pre-preemph, pre-window (Kaldi)
        energy = jnp.maximum(jnp.square(frames).sum(axis=-1), eps)
    if cfg.preemph_mode == "frame":
        frames = preemphasis_frames(frames, cfg.preemph)
    windowed = frames * k["window"]
    pspec = power_spectrum(windowed, cfg)  # [B, F, n_bins]
    if cfg.energy_source == "pspec":
        energy_raw = pspec.sum(axis=-1)
        energy = jnp.where(energy_raw <= 0, eps, energy_raw)  # [B, F]
    elif cfg.energy_source == "windowed_frame":
        energy = jnp.maximum(jnp.square(windowed).sum(axis=-1), eps)
    # precision=HIGHEST: TPU matmuls default to bf16 multiplication, which
    # breaks the 1e-4 oracle gate (CPU is unaffected either way).
    melspec = jnp.matmul(
        pspec, k["mel"], preferred_element_type=dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    logmel = apply_log(melspec, cfg)

    n_valid = num_valid_frames(lengths, cfg)  # [B]
    frame_mask = (jnp.arange(F)[None, :] < n_valid[:, None]).astype(dtype)
    out = {
        "frames": frames,
        "windowed": windowed,
        "pspec": pspec,
        "energy": energy,
        "melspec": melspec,
        "logmel": logmel,
        "n_valid": n_valid,
        "frame_mask": frame_mask,
    }
    if dither_noise is not None:
        # exposed so parity tests can replay the exact draw through the
        # float64 oracle (reference_numpy.logmel_chain dither_noise arg)
        out["dither_noise"] = dither_noise
    return out


def features_from_logmel(
    stages: dict[str, jnp.ndarray], cfg: FrontendConfig
) -> jnp.ndarray:
    """Stages (B8)-(B11) minus global CMVN: cepstra, lifter, energy, deltas,
    per-utterance CMVN. Returns [B, F, feat_dim] with pad frames zeroed.

    When the stage dict carries "prefix_fp" (the fused Pallas kernel's
    contiguous [log-mel | raw energy] lane prefix at block-padded length),
    the cepstral epilogue is ONE augmented matmul on that prefix — no
    single-lane energy slice, no c0 concat (each cost ~0.45 ms/step on v5e
    at batch-64 x 10 s); extract_batch trims the block padding at the end."""
    if "features_fused" in stages:
        # the kernel's fused cepstral tail already produced the FINISHED
        # features (DCT·lifter·energy-c0, Δ/ΔΔ, masking and — when
        # configured — utterance CMVN); nothing to do here
        return stages["features_fused"]
    k = device_constants(cfg)
    n_valid = stages["n_valid"]
    frame_mask = stages.get("frame_mask_fp", stages["frame_mask"])

    def _logmel_norm(base):
        """Whisper per-utterance dynamic-range compression, pad-masked:
        clamp at 8 log10-units below each utterance's valid max, (x+4)/4."""
        if cfg.logmel_norm != "whisper":
            return base
        fm = frame_mask[..., : base.shape[-2]]  # frame_mask may be fp-length
        valid = fm[..., None] > 0
        neg = jnp.asarray(-1e30, base.dtype)
        mx = jnp.max(
            jnp.where(valid, base, neg), axis=(-2, -1), keepdims=True
        )  # [B, 1, 1]; all-pad rows give -1e30, harmless under the clamp
        return (jnp.maximum(base, mx - 8.0) + 4.0) / 4.0

    if "prefix_fp" in stages:
        x = stages["prefix_fp"]  # [B, fp, n_mels+1]
        if cfg.features == "logmel":
            base = _logmel_norm(x[..., : cfg.n_mels])
        elif cfg.features == "plp":
            # plp configs make the kernel epilogue SKIP the log: the mel
            # lanes carry raw mel energies, lane M the clamped energy
            base = plp_base(x[..., : cfg.n_mels], x[..., cfg.n_mels], cfg)
        elif cfg.features == "ssc":
            # the kernel's ssc epilogue already divided the freq-weighted
            # projection by the mel projection: lanes [0:M] ARE centroids
            base = x[..., : cfg.n_mels]
        elif cfg.features == "spectrogram":
            # lanes [0:M] are the log power spectrum (mel == identity);
            # Kaldi replaces feature[0] with the log frame energy (lane M
            # carries the clamped raw energy)
            base = x[..., : cfg.n_mels]
            if cfg.append_energy:
                eps = jnp.asarray(cfg.log_eps, x.dtype)
                log_e = jnp.log(
                    jnp.where(x[..., cfg.n_mels :] <= 0, eps,
                              x[..., cfg.n_mels :])
                )
                if cfg.energy_floor > 0.0:
                    log_e = jnp.maximum(
                        log_e, jnp.asarray(np.log(cfg.energy_floor), x.dtype)
                    )
                lane = jnp.arange(cfg.n_mels)
                base = jnp.where(lane == 0, log_e, base)
        else:
            if cfg.append_energy:
                lane = jnp.arange(cfg.n_mels + 1)
                # log only the energy lane (log-mel lanes pass through).
                # The clamp must be the oracle's where(x <= 0, eps, x) — a
                # maximum(x, eps) would also clamp tiny POSITIVE energies
                # and diverge by many log-units on near-silent audio; the
                # where also keeps the discarded log-mel branch NaN-free
                # (negative log-mels map to eps before the log).
                eps = jnp.asarray(cfg.log_eps, x.dtype)
                log_e = jnp.log(jnp.where(x <= 0, eps, x))
                if cfg.energy_floor > 0.0:
                    log_e = jnp.maximum(
                        log_e, jnp.asarray(np.log(cfg.energy_floor), x.dtype)
                    )
                x = jnp.where(lane == cfg.n_mels, log_e, x)
            base = jnp.matmul(
                x, jnp.asarray(k["dct_aug"], x.dtype),
                preferred_element_type=x.dtype,
                precision=jax.lax.Precision.HIGHEST,
            )
    elif cfg.features == "logmel":
        base = _logmel_norm(stages["logmel"])
    elif cfg.features == "spectrogram":
        # jnp-twin path: logmel IS the log pspec (mel == identity)
        base = stages["logmel"]
        if cfg.append_energy:
            log_e = jnp.log(stages["energy"])
            if cfg.energy_floor > 0.0:
                log_e = jnp.maximum(
                    log_e, jnp.asarray(np.log(cfg.energy_floor), log_e.dtype)
                )
            lane = jnp.arange(cfg.n_mels)
            base = jnp.where(lane == 0, log_e[..., None], base)
    elif cfg.features == "plp":
        base = plp_base(stages["melspec"], stages["energy"], cfg)
    elif cfg.features == "ssc":
        # jnp-twin ssc path (the fused kernel computes centroids in its
        # own epilogue and returns via the prefix branch above): clamp the
        # power spectrum, then the paired freq-weighted/plain mel matmuls
        pspec = stages["pspec"]
        eps = jnp.asarray(cfg.log_eps, pspec.dtype)
        p = jnp.where(pspec <= 0, eps, pspec)
        hp = jax.lax.Precision.HIGHEST
        num = jnp.matmul(p * k["freqs"], k["mel"],
                         preferred_element_type=p.dtype, precision=hp)
        den = jnp.matmul(p, k["mel"],
                         preferred_element_type=p.dtype, precision=hp)
        base = num / den
    else:
        logmel, energy = stages["logmel"], stages["energy"]
        ceps = jnp.matmul(
            logmel, k["dct"], preferred_element_type=logmel.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
        ceps = ceps * k["lifter"]
        if cfg.append_energy:
            log_e = jnp.log(energy)
            if cfg.energy_floor > 0.0:
                log_e = jnp.maximum(
                    log_e, jnp.asarray(np.log(cfg.energy_floor), log_e.dtype)
                )
            ceps = jnp.concatenate([log_e[..., None], ceps[..., 1:]], axis=-1)
        base = ceps

    parts = [base]
    if cfg.deltas >= 1:
        d = delta(base, n_valid, cfg)
        parts.append(d)
        if cfg.deltas >= 2:
            parts.append(delta(d, n_valid, cfg))
    feat = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else base

    if cfg.cmvn == "utterance":
        feat = cmvn_utterance(feat, frame_mask, cfg)
    else:
        feat = feat * frame_mask[..., None]
    return feat


@functools.partial(
    jax.jit, static_argnames=("cfg", "backend", "input_layout")
)
def extract_batch(
    audio: jnp.ndarray,
    lengths: jnp.ndarray,
    cfg: FrontendConfig,
    backend: str = "jnp",
    input_layout: str = "auto",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full batched chain: padded audio [B, T] + lengths [B] →
    (features [B, F, feat_dim], frame_mask [B, F]).

    Global CMVN (cfg.cmvn == "global") is a corpus-level operation and is
    applied by the pipeline/parallel layer from psum-reduced moments; here
    features are returned un-normalized in that mode.

    backend: "jnp" (this module) or "pallas" (fused TPU kernels with this
    chain as their equivalence twin — mfcc_tpu/kernels/).

    Resampling configs (input_sample_rate != sample_rate) additionally
    accept BLOCKED audio [B, n_sup, step] in the ops.resample.BlockedLayout
    host-feed contract, or the r5 ResampleSlabLayout (the in-kernel fused
    resample; pipeline.device_layout picks it). `lengths` stays in INPUT
    samples either way.

    input_layout ("auto" | "blocked" | "resample_slab"): how to interpret
    a 3-D resampling-config feed. "auto" validates the exact rs-slab
    geometry and falls back to the blocked interpretation — unambiguous
    except for 44.1 kHz-style rate pairs where a BlockedLayout row count
    can coincide with a valid rs geometry; callers that built the layout
    pass the explicit kind (pipeline.layout_kind(layout)).
    """
    chunks = chunks_t = None
    chunks_frames = None
    chunks_extended = False
    rs_design = None
    resampling = bool(
        cfg.input_sample_rate and cfg.input_sample_rate != cfg.sample_rate
    )
    if input_layout not in ("auto", "blocked", "resample_slab"):
        raise ValueError(
            f"input_layout={input_layout!r} not in "
            "('auto', 'blocked', 'resample_slab')"
        )
    if (
        resampling
        and audio.ndim == 3
        and input_layout != "blocked"
        and backend == "pallas"
        and cfg.dtype == "float32"
        and cfg.frame_tail not in ("center", "center_reflect")
        and pallas_unsupported_reason(cfg) is None
    ):
        # In-kernel fused resample (r5): a ResampleSlabLayout feed. The
        # dispatch validates the EXACT rs geometry (row decomposition,
        # block consistency, VMEM budget) — for 44.1 kHz the BlockedLayout
        # coincidentally lays rows of the same width, so a loose
        # lane-width test misrouted blocked feeds (r5 review). A blocked
        # feed whose row count ALSO matches a valid rs geometry is
        # ambiguous by shape — layout-aware callers disambiguate with
        # input_layout="blocked"/"resample_slab" (pipeline.layout_kind).
        from mfcc_tpu.kernels import frontend as _fk
        from mfcc_tpu.ops import resample as _rsm

        _geo = _fk.resample_geometry_for_shape(
            cfg, audio.shape[1], audio.shape[2]
        )
        if _geo is not None and input_layout == "auto":
            # "auto" REFUSES genuinely ambiguous shapes instead of
            # guessing: for 44.1 kHz-style rate pairs the BlockedLayout
            # lays rows of the same width, so a blocked feed whose row
            # count also decomposes as a valid rs geometry would be
            # silently misread (r5 review, second pass — confirmed at
            # ~1-in-8 bucket lengths). Loud beats wrong.
            try:
                _rsm.layout_for_shape(
                    cfg.input_sample_rate, cfg.sample_rate,
                    audio.shape[1], audio.shape[2],
                )
                raise ValueError(
                    f"3-D feed {tuple(audio.shape[1:])} matches BOTH the "
                    "BlockedLayout and the resample-slab geometry for "
                    f"{cfg.input_sample_rate}->{cfg.sample_rate} Hz; pass "
                    "input_layout='blocked' or 'resample_slab' "
                    "(pipeline.layout_kind(layout) / Batch.layout_kind)"
                )
            except ValueError as e:
                if "matches BOTH" in str(e):
                    raise
                pass  # not a valid blocked shape: rs is unambiguous
        if _geo is not None:
            rs_design = _geo["design"]
            chunks_frames = _geo["fp"]  # capacity semantics
    if input_layout == "resample_slab" and rs_design is None:
        raise ValueError(
            "input_layout='resample_slab' requires backend='pallas', a "
            "float32 non-centered resampling config, and a feed matching "
            "the resample-slab geometry (pipeline.device_layout); got "
            f"backend={backend!r}, audio shape {tuple(audio.shape)}"
        )
    if jnp.issubdtype(audio.dtype, jnp.integer):
        # int16 host feed (half the H2D bytes). Chunk slabs for the fused
        # kernel stay int16 END TO END — the kernel loads the PCM rows and
        # converts in its VPU gather pass, halving the slab HBM reads too
        # (kernels/frontend._gather_frames convert_scale; exact, so bit-
        # parity with the fp32-slab path). Everything else converts here,
        # once.
        keep_i16 = (
            audio.ndim == 3
            and audio.dtype == jnp.int16
            and backend == "pallas"
            and (not resampling or rs_design is not None)
            and cfg.frame_tail not in ("center", "center_reflect")
        )
        if not keep_i16:
            audio = audio.astype(compute_dtype(cfg))
    if audio.ndim == 3 and not resampling:
        # host-built chunk slab (pipeline.device_layout / pad_batch):
        # already in the fused kernel's layout — capacity frame semantics,
        # per-utterance validity from lengths as always
        if backend != "pallas":
            raise ValueError(
                "chunk-slab input (3-D audio, SlabLayout) requires "
                "backend='pallas'; feed flat [B, T] for the jnp twin"
            )
        from mfcc_tpu.kernels import frontend as _fk

        S, pro, tail = _fk.slab_dims(cfg)
        if audio.shape[2] != S:
            raise ValueError(
                f"slab lane width {audio.shape[2]} != frame hop {S}"
            )
        chunks = audio
        chunks_frames = audio.shape[1] - pro - tail
        chunks_extended = cfg.frame_tail in ("center", "center_reflect")
        if (
            cfg.input_scale != 1.0
            and not chunks_extended
            and not jnp.issubdtype(chunks.dtype, jnp.integer)
        ):
            # standard-mode fp32 slabs carry RAW samples; centered slabs
            # are host-conditioned (scale applied). int16 slabs scale
            # IN-KERNEL during the i16→f32 convert (frontend slab_scale).
            chunks = chunks * jnp.asarray(cfg.input_scale, chunks.dtype)
    if resampling:
        from mfcc_tpu.ops import resample

        if rs_design is None:
            audio = audio.astype(compute_dtype(cfg))
        sr_in, sr_out = cfg.input_sample_rate, cfg.sample_rate
        lengths = resample.output_lengths(lengths, sr_in, sr_out)
        if rs_design is not None:
            # the kernel consumes the blocked sr_in slab directly (fused
            # in-kernel resample); lengths are now in output samples
            chunks = audio
        elif audio.ndim == 3:
            lay = resample.layout_for_shape(
                sr_in, sr_out, audio.shape[1], audio.shape[2]
            )
            n_out = lay.n_out  # capacity semantics: n_blk*J (>= true n_out;
            # the surplus < J samples are masked by lengths downstream)
            fuse = (
                backend == "pallas"
                and cfg.dtype == "float32"
                and cfg.frame_tail not in ("center", "center_reflect")
                and pallas_unsupported_reason(cfg) is None
            )
            geo = None
            if fuse:
                from mfcc_tpu.kernels import frontend as _fk

                geo = _fk.slab_geometry(cfg, n_out)
            if geo is not None:
                # fused resample->frontend seam (VERDICT r2 item 1): the
                # blocked dots' output reshapes straight into the fused
                # kernel's chunk slab; input_scale rides the tap matrices
                y = resample.resample_blocked(audio, lay, cfg.input_scale)
                B = y.shape[0]
                flat = y.reshape(B, lay.n_blk * lay.J)
                total = geo["n_rows"] * geo["chunk"]
                front = geo["pro"] * geo["chunk"]
                if flat.shape[-1] > total - front:
                    flat = flat[:, : total - front]
                flat = jnp.pad(
                    flat, ((0, 0), (front, total - front - flat.shape[-1]))
                )
                chunks = flat.reshape(B, geo["n_rows"], geo["chunk"])
                chunks_t = n_out
                # input_scale rode the resample taps; the chunks branch of
                # fused_logmel_stages never re-applies it (producer contract)
            else:
                y = resample.resample_blocked(audio, lay)
                audio = y.reshape(y.shape[0], lay.n_blk * lay.J)
        else:
            audio = resample.resample_batch(audio, sr_in, sr_out)
    if backend == "pallas":
        reason = pallas_unsupported_reason(cfg)
        if reason:
            raise ValueError(
                f"{reason}; use backend='jnp' (extract() auto-selects it)"
            )
    if backend == "jnp":
        stages = logmel_stages(audio, lengths, cfg)
    elif backend == "pallas":
        from mfcc_tpu.kernels import fused_logmel_stages

        if chunks is not None:
            stages = fused_logmel_stages(
                None, lengths, cfg, chunks=chunks, chunks_t=chunks_t,
                chunks_frames=chunks_frames, chunks_extended=chunks_extended,
                resample_slab=rs_design,
            )
        else:
            stages = fused_logmel_stages(audio, lengths, cfg)
    else:
        raise ValueError(f"unknown backend {backend!r}")
    feat = features_from_logmel(stages, cfg)
    F = stages.get("num_frames")
    if F is not None and feat.shape[-2] != F:
        feat = feat[:, :F]  # trim kernel block padding once, at the end
    return feat, stages["frame_mask"]


# ---------------------------------------------------------------------------
# Differentiable fused extraction (r5): pallas forward, twin-VJP backward
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def extract_batch_diff(
    audio: jnp.ndarray, lengths: jnp.ndarray, cfg: FrontendConfig
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """`extract_batch(backend="pallas")` that works under `jax.grad`.

    The fused Pallas kernel has no VJP rule, so the gradient is the jnp
    TWIN's VJP, linearized at the same inputs (rematerialized in the
    backward pass — the trainable-front-end use case tolerates one extra
    jnp forward per step). The two paths agree to ~1e-4 on features
    (tests/test_pallas_kernels.py), so this is the exact gradient of a
    function uniformly close to the primal — the standard contract for
    surrogate-backward kernels. Flat float audio [B, T] only (gradients
    w.r.t. int16 PCM or pre-built slabs are not meaningful); the mask
    output depends only on `lengths` and carries no gradient.
    """
    if jnp.issubdtype(audio.dtype, jnp.integer) or audio.ndim != 2:
        raise ValueError(
            "extract_batch_diff takes flat float audio [B, T]; decode/"
            "convert first (gradients of int PCM or slab layouts are "
            "not meaningful)"
        )
    return extract_batch(audio, lengths, cfg, backend="pallas")


def _ebd_fwd(audio, lengths, cfg):
    out = extract_batch(audio, lengths, cfg, backend="pallas")
    return out, (audio, lengths)


def _ebd_bwd(cfg, res, ct):
    audio, lengths = res
    d_feat, _d_mask = ct  # the mask is audio-independent

    def f(a):
        feat, _ = extract_batch(a, lengths, cfg, backend="jnp")
        return feat

    _, vjp = jax.vjp(f, audio)
    (d_audio,) = vjp(d_feat)
    d_lengths = np.zeros(lengths.shape, dtype=jax.dtypes.float0)
    return d_audio, d_lengths


extract_batch_diff.defvjp(_ebd_fwd, _ebd_bwd)


# ---------------------------------------------------------------------------
# Single-utterance convenience (golden tests, CLI one-shot path)
# ---------------------------------------------------------------------------


def extract_single(x: np.ndarray, cfg: FrontendConfig, backend: str = "jnp") -> np.ndarray:
    """One utterance → [F_valid, feat_dim] numpy features (oracle layout).

    x is at cfg.input_sample_rate (== cfg.sample_rate unless resampling)."""
    n = int(np.asarray(x).shape[0])
    audio = jnp.asarray(np.asarray(x), dtype=compute_dtype(cfg))[None, :]
    lengths = jnp.asarray([n], dtype=jnp.int32)
    feat, _ = extract_batch(audio, lengths, cfg, backend=backend)
    if cfg.input_sample_rate and cfg.input_sample_rate != cfg.sample_rate:
        from mfcc_tpu.ops import resample

        n = resample.output_length(n, cfg.input_sample_rate, cfg.sample_rate)
    f_valid = cfg.num_frames(n)
    return np.asarray(feat[0, :f_valid])


def logmel_single(x: np.ndarray, cfg: FrontendConfig) -> dict[str, np.ndarray]:
    """One utterance → all intermediate stages, trimmed to valid frames.

    x is at cfg.input_sample_rate (resampled here first when it differs,
    matching extract_single's contract)."""
    if cfg.input_sample_rate and cfg.input_sample_rate != cfg.sample_rate:
        from mfcc_tpu.ops import resample

        x = np.asarray(
            resample.resample_batch(
                jnp.asarray(np.asarray(x), dtype=compute_dtype(cfg)),
                cfg.input_sample_rate, cfg.sample_rate,
            )
        )
    n = int(np.asarray(x).shape[0])
    audio = jnp.asarray(np.asarray(x), dtype=compute_dtype(cfg))[None, :]
    lengths = jnp.asarray([n], dtype=jnp.int32)
    stages = logmel_stages(audio, lengths, cfg)
    f_valid = cfg.num_frames(n)
    return {
        k: np.asarray(v[0, :f_valid] if v.ndim >= 2 else v[0])
        for k, v in stages.items()
    }
