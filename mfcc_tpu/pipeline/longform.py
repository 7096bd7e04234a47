"""Long-utterance extraction: hop-aligned segmentation with frame-exact
stitching (SURVEY.md §5 long-context row).

The reference's per-utterance loop handled any length; the batched pipeline
compiles fixed shapes, so utterances longer than the largest bucket are
split here instead of truncated. The split is exact, not approximate:

  - Segment boundaries sit on frame starts (multiples of the hop S), so the
    global frame grid is partitioned — frame f of the utterance appears in
    exactly one segment's *kept* range.
  - Every stage through the cepstral epilogue is frame-local, so per-frame
    values computed inside a segment equal the monolithic values, with two
    boundary exceptions handled structurally:
      1. Pre-emphasis y[t] = x[t] − α·x[t−1] reaches one sample left of a
         segment: each non-first segment carries a 1-frame LEFT HALO whose
         frame 0 absorbs the wrong y[0] = x[o] (no x[o−1] available) and is
         discarded after extraction.
      2. The ceil-framing zero-pad tail only ever touches the LAST global
         frame (for f < F_total−1, f·S + L ≤ n), so only the final segment
         sees it — and reproduces it exactly, because framing is
         shift-invariant by multiples of S: num_frames(n − k·S) =
         num_frames(n) − k.
  - Δ/ΔΔ (±2·delta_window frame reach) and CMVN (whole-utterance reduction)
    are NOT frame-local; they run as a jitted post-pass over the stitched
    [F_total, D] base features, using the same chain.delta /
    chain.cmvn_utterance code as the batch path.

Resampling configs (input_sample_rate ≠ sample_rate) resample the whole
utterance FIRST — the polyphase filter has ~10·max_rate taps of context, so
segmenting at the input rate would break resample parity at every seam —
then segment at the target rate.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from mfcc_tpu.config import FrontendConfig

# Post-pass frame padding granularity: one compiled program per
# ceil(F_total / _F_BUCKET) bucket instead of one per utterance length.
_F_BUCKET = 1024


@dataclasses.dataclass(frozen=True)
class Segment:
    """One extraction window of a long utterance.

    offset:  first sample of the segment row in the global signal
    row_len: valid samples in the row (row audio = x[offset : offset+row_len])
    halo:    leading frames to DISCARD after extraction (0 or 1)
    keep:    frames this segment contributes to the stitched output
    """

    offset: int
    row_len: int
    halo: int
    keep: int


def segment_plan(
    n_samples: int, cfg: FrontendConfig, seg_frames: int
) -> tuple[list[Segment], int]:
    """Partition the frame grid [0, F_total) into runs of ≤ seg_frames.

    Returns (segments, F_total). Segment k keeps global frames
    [k·seg_frames, min((k+1)·seg_frames, F_total)); non-first segments add a
    1-frame left halo for the pre-emphasis boundary (see module docstring).
    """
    if seg_frames < 1:
        raise ValueError("seg_frames must be >= 1")
    S, L = cfg.frame_step, cfg.frame_length
    F_total = cfg.num_frames(n_samples)
    segs: list[Segment] = []
    f0 = 0
    while f0 < F_total:
        end = min(f0 + seg_frames, F_total)
        halo = 1 if f0 > 0 else 0
        offset = (f0 - halo) * S
        rowF = end - f0 + halo
        span = (rowF - 1) * S + L
        if end == F_total:
            row_len = n_samples - offset  # chain zero-pads the ceil tail
        else:
            row_len = span  # middle frames never touch the pad (f·S+L ≤ n)
        segs.append(Segment(offset=offset, row_len=row_len, halo=halo, keep=end - f0))
        f0 = end
    return segs, F_total


def _host_reflect_extend(
    x: np.ndarray, cfg: FrontendConfig
) -> tuple[np.ndarray, FrontendConfig]:
    """Numpy twin of kernels/frontend._reflect_extend for the longform
    path: rewrite centered framing ("center"/"center_reflect") as standard
    PAD framing on a reflected extension so the bounded segmented split
    applies. ext[i] = y[reflect(i + shift)], with ext sized exactly
    (F-1)*S + L so pad-tail framing of ext yields exactly F frames.

    input_scale and signal-mode pre-emphasis fold into ext (they must act
    BEFORE reflection — the twin computes reflect(preemph(scale(x)))); the
    returned config neutralizes all three knobs. Per-frame (Kaldi-mode)
    pre-emphasis is frame-local and stays in the config. All arithmetic in
    cfg's compute dtype so results match the one-shot device chain."""
    L, S = cfg.frame_length, cfg.frame_step
    n = int(x.shape[0])
    F = cfg.num_frames(n)  # includes drop_last_frame
    dt = np.dtype(cfg.dtype)
    y = np.asarray(x, dtype=dt)
    reps: dict = {"frame_tail": "pad", "drop_last_frame": False}
    if cfg.input_scale != 1.0:
        y = y * dt.type(cfg.input_scale)
        reps["input_scale"] = 1.0
    if cfg.preemph_mode == "signal" and cfg.preemph != 0.0:
        y = np.concatenate([y[:1], y[1:] - dt.type(cfg.preemph) * y[:-1]])
        y = y.astype(dt)
        reps["preemph"] = 0.0
    shift = (S // 2 - L // 2) if cfg.frame_tail == "center" else -(L // 2)
    ext_len = (F - 1) * S + L if F > 0 else 0
    idx = np.arange(ext_len, dtype=np.int64) + shift
    nn = max(n, 1)
    if cfg.frame_tail == "center":
        m = np.mod(idx, 2 * nn)
        r = np.where(m < nn, m, 2 * nn - 1 - m)
    else:
        m = np.mod(idx, max(2 * nn - 2, 1))
        r = np.where(m < nn, m, 2 * nn - 2 - m)
    ext = y[r] if n > 0 else np.zeros(0, dt)
    return ext, cfg.replace(**reps)


def _post_pass(base: np.ndarray, cfg: FrontendConfig) -> np.ndarray:
    """Δ/ΔΔ + CMVN over stitched base features [F_total, D_base] → final
    [F_total, feat_dim]; jitted with the frame axis padded to _F_BUCKET
    multiples so programs are reused across utterance lengths."""
    import jax.numpy as jnp

    F_total, _ = base.shape
    if cfg.deltas == 0 and cfg.cmvn != "utterance":
        return base
    f_pad = max(_F_BUCKET, -(-F_total // _F_BUCKET) * _F_BUCKET)
    padded = np.zeros((1, f_pad, base.shape[1]), dtype=base.dtype)
    padded[0, :F_total] = base
    out = _post_pass_jit(
        jnp.asarray(padded), jnp.asarray([F_total], dtype=jnp.int32), cfg
    )
    return np.asarray(out[0, :F_total])


@functools.lru_cache(maxsize=1)
def _post_pass_jit_fn():
    import jax

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def fn(base, n_valid, cfg: FrontendConfig):
        import jax.numpy as jnp

        from mfcc_tpu.ops import chain

        parts = [base]
        if cfg.deltas >= 1:
            d = chain.delta(base, n_valid, cfg)
            parts.append(d)
            if cfg.deltas >= 2:
                parts.append(chain.delta(d, n_valid, cfg))
        feat = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else base
        F = base.shape[-2]
        mask = (jnp.arange(F)[None, :] < n_valid[:, None]).astype(feat.dtype)
        if cfg.cmvn == "utterance":
            feat = chain.cmvn_utterance(feat, mask, cfg)
        else:
            feat = feat * mask[..., None]
        return feat

    return fn


def _post_pass_jit(base, n_valid, cfg):
    return _post_pass_jit_fn()(base, n_valid, cfg)


def extract_long(
    x: np.ndarray,
    cfg: FrontendConfig,
    backend: str = "jnp",
    seg_len_s: float = 10.0,
    batch_rows: int = 8,
) -> np.ndarray:
    """Extract features from an utterance of ANY length → [F_total, feat_dim].

    Matches the float64 oracle (ops.reference_numpy.extract) to the same
    gates as the batched path; utterances that fit in one segment take the
    normal extract path unchanged. Segments are processed batch_rows at a
    time through the standard batched chain (so the fused Pallas kernel is
    reused as-is), stitched, then Δ/CMVN run over the full stitched length.

    x is at cfg.input_sample_rate when that differs from cfg.sample_rate;
    the whole utterance is resampled up front (see module docstring).
    """
    from mfcc_tpu.ops import chain

    x = np.asarray(x)
    if cfg.input_sample_rate and cfg.input_sample_rate != cfg.sample_rate:
        import jax.numpy as jnp

        from mfcc_tpu.ops import resample

        x = np.asarray(
            resample.resample_batch(
                jnp.asarray(x, dtype=chain.compute_dtype(cfg)),
                cfg.input_sample_rate,
                cfg.sample_rate,
            )
        )
        cfg_t = cfg.replace(input_sample_rate=None)
    else:
        cfg_t = cfg

    S, L = cfg_t.frame_step, cfg_t.frame_length
    seg_frames = max(1, int(round(seg_len_s * cfg_t.sample_rate)) // S)
    n = int(x.shape[0])
    if cfg_t.num_frames(n) <= seg_frames:
        return chain.extract_single(x, cfg_t, backend=backend)
    if cfg_t.logmel_norm != "none":
        # logmel_norm="whisper" clamps at the GLOBAL utterance max — a
        # segment row would clamp at its own max, so the split is not
        # frame-exact. One whole-length extraction is correct at any
        # length; pad the row to a bucket multiple to bound the number of
        # compiled programs. (Memory note: on the Pallas backend frames
        # never materialize; the jnp backend peaks at O(F·L) — whisper80
        # at 1 h is ~2 GB fp32 on CPU, acceptable for the norm's global
        # dependence.)
        import jax.numpy as jnp

        bucket = max(1, int(round(seg_len_s * cfg_t.sample_rate)))
        T = ((n + bucket - 1) // bucket) * bucket
        audio = np.zeros(T, dtype=chain.compute_dtype(cfg_t))
        audio[:n] = x
        be = backend if chain.pallas_unsupported_reason(cfg_t) is None else "jnp"
        feat, _ = chain.extract_batch(
            jnp.asarray(audio)[None], jnp.asarray([n], np.int32), cfg_t,
            backend=be,
        )
        return np.asarray(feat[0, : cfg_t.num_frames(n)])
    if cfg_t.dither > 0.0:
        raise ValueError(
            "extract_long with dither > 0 would draw different noise per "
            "segment row; extract in one piece or set dither=0"
        )
    if cfg_t.frame_tail in ("center", "center_reflect"):
        # centered framing reflects indices around the GLOBAL signal
        # edges, which a segment row cannot see — but the reflection only
        # touches O(frame_length) samples at the two ends, so a host-side
        # reflect-extension (the numpy twin of the kernel prologue,
        # kernels/frontend._reflect_extend) turns it into standard pad
        # framing on ext, and the bounded segmented path below applies
        # unchanged. input_scale / signal pre-emphasis fold into ext
        # (they must happen BEFORE reflection — the twin's order).
        x, cfg_t = _host_reflect_extend(x, cfg_t)
        n = int(x.shape[0])

    segs, F_total = segment_plan(n, cfg_t, seg_frames)
    # base (frame-local) features: no deltas, no CMVN, no per-row
    # last-frame drop (segment_plan's F_total already excludes the
    # dropped frame — a per-ROW drop would desync the stitch accounting)
    cfg_base = cfg_t.replace(deltas=0, cmvn="off", drop_last_frame=False)
    # span of a halo-carrying full segment; with drop_last_frame the final
    # segment's row carries up to one extra hop of (unused) valid samples
    # belonging to the dropped frame
    T_row = seg_frames * S + L + (S if cfg_t.drop_last_frame else 0)
    d_base = cfg_base.feat_dim

    import jax.numpy as jnp

    base = np.empty((F_total, d_base), dtype=np.dtype(cfg_t.dtype))
    dtype = chain.compute_dtype(cfg_t)
    for i in range(0, len(segs), batch_rows):
        group = segs[i : i + batch_rows]
        rows = np.zeros((batch_rows, T_row), dtype=np.dtype(cfg_t.dtype))
        lengths = np.zeros(batch_rows, dtype=np.int32)
        for r, s in enumerate(group):
            rows[r, : s.row_len] = x[s.offset : s.offset + s.row_len]
            lengths[r] = s.row_len
        feat, _ = chain.extract_batch(
            jnp.asarray(rows, dtype=dtype),
            jnp.asarray(lengths),
            cfg_base,
            backend=backend,
        )
        feat = np.asarray(feat)
        f0 = sum(s.keep for s in segs[:i])
        for r, s in enumerate(group):
            base[f0 : f0 + s.keep] = feat[r, s.halo : s.halo + s.keep]
            f0 += s.keep

    return _post_pass(base, cfg)


def long_moments(feat: np.ndarray) -> tuple[np.ndarray, np.ndarray, float]:
    """Global-CMVN moment triple of a fully-valid [F, D] feature array —
    the host-side analogue of parallel.cmvn.batch_moments for long
    utterances (every stitched frame is valid)."""
    f = feat.astype(np.float64)
    return f.sum(axis=0), np.square(f).sum(axis=0), float(f.shape[0])
