"""Streaming (online/causal) feature extraction.

The reference family is strictly offline — a per-utterance loop over whole
wav files (SURVEY.md §1.1 L3). Serving front-ends additionally need the
*online* form: audio arrives in arbitrary-sized chunks and features must be
emitted incrementally with bounded latency. This module provides that as a
thin state machine around the existing jnp stage functions, with **exact
offline parity**: for any chunking of an utterance,

    concat(push(c) for c in chunks) + flush()
        == ops.chain.extract_batch(whole, backend="jnp")   (same fp32 ops)

including the pad-tail frame semantics and the delta edge replication at
the true start/end of the stream (tests/test_streaming.py).

Design (TPU-shaped):
  * All device work happens in TWO jitted functions with FIXED shapes —
    a base-feature block (`frames_per_block` frames from a
    `(span+1,)` sample window) and a delta/finalize block with
    `lookahead = deltas * delta_window` context rows on each side — so a
    long stream never recompiles, regardless of chunk sizes.
  * Latency = algorithmic lookahead (`deltas * delta_window` frames, e.g.
    4 frames = 40 ms for Δ+ΔΔ) + block granularity (`frames_per_block`
    hops). Lower `frames_per_block` for latency, raise it for throughput.
  * Per-utterance CMVN is a whole-utterance statistic and cannot be
    streamed; cfg.cmvn="utterance" is rejected — use cmvn="global" with
    precomputed corpus moments (`cmvn_moments=`), the production pattern.

Delta edge exactness: interior blocks carry `lookahead` real context rows
on both sides, so no edge replication ever reaches an emitted row; the
first block starts exactly at frame 0 (start-edge replication is then the
offline rule applied at the true start) and the flush block passes
`n_valid` so the tail replication lands on the true final frame.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from mfcc_tpu.config import FrontendConfig
from mfcc_tpu.ops import chain

__all__ = ["StreamingExtractor", "stream_features"]


def _make_base_block(cfg: FrontendConfig, K: int):
    """(span+1,) raw samples + valid count -> [K, D_base] features (unjitted;
    the single-stream extractor jits it directly, the multi-stream serving
    pool jits its vmap).

    Input row 0 is the pre-context sample (x[t0*S - 1]; zero at stream
    start) so pre-emphasis crosses block boundaries exactly.
    """
    L, S = cfg.frame_length, cfg.frame_step
    span = (K - 1) * S + L
    idx = np.arange(L)[None, :] + S * np.arange(K)[:, None]  # [K, L]
    k = chain.device_constants(cfg)
    dtype = chain.compute_dtype(cfg)
    window = k["window"]
    dct, lift = k["dct"], k["lifter"]

    def block(xwin: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
        xwin = xwin.astype(dtype)
        if cfg.input_scale != 1.0:
            xwin = xwin * jnp.asarray(cfg.input_scale, dtype)
        eps = jnp.asarray(cfg.log_eps, dtype)
        if cfg.preemph_mode == "signal":
            y = xwin[1:] - cfg.preemph * xwin[:-1] if cfg.preemph else xwin[1:]
        else:  # frame-first (Kaldi) order: frame the raw signal
            y = xwin[1:]
        # offline zero_beyond: y is zero at t >= utterance length
        y = y * (jnp.arange(span) < valid).astype(dtype)
        frames = y[jnp.asarray(idx)]  # [K, L]
        if cfg.remove_dc_offset:
            frames = frames - frames.mean(axis=-1, keepdims=True)
        if cfg.energy_source == "raw_frame":
            energy = jnp.maximum(jnp.square(frames).sum(axis=-1), eps)
        if cfg.preemph_mode == "frame":
            frames = chain.preemphasis_frames(frames, cfg.preemph)
        windowed = frames * window
        pspec = chain.power_spectrum(windowed, cfg)
        if cfg.energy_source == "pspec":
            e_raw = pspec.sum(axis=-1)
            energy = jnp.where(e_raw <= 0, eps, e_raw)
        elif cfg.energy_source == "windowed_frame":
            energy = jnp.maximum(jnp.square(windowed).sum(axis=-1), eps)
        melspec = jnp.matmul(
            pspec, k["mel"], preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
        if cfg.features == "plp":
            return chain.plp_base(melspec, energy, cfg)
        logmel = chain.apply_log(melspec, cfg)
        if cfg.features == "logmel":
            return logmel
        if cfg.features == "spectrogram":
            # log power spectrum per bin (mel == identity); feature[0]
            # <- log frame energy, like the offline chain
            if cfg.append_energy:
                log_e = jnp.log(energy)
                if cfg.energy_floor > 0.0:
                    log_e = jnp.maximum(
                        log_e, jnp.asarray(np.log(cfg.energy_floor), dtype)
                    )
                lane = jnp.arange(cfg.n_mels)
                logmel = jnp.where(lane == 0, log_e[:, None], logmel)
            return logmel
        if cfg.features == "ssc":
            # spectral subband centroids: same clamp + matmul pair as the
            # offline chain (ops/chain.py features_from_logmel)
            p = jnp.where(pspec <= 0, eps, pspec)
            num = jnp.matmul(
                p * k["freqs"], k["mel"], preferred_element_type=dtype,
                precision=jax.lax.Precision.HIGHEST,
            )
            den = jnp.matmul(
                p, k["mel"], preferred_element_type=dtype,
                precision=jax.lax.Precision.HIGHEST,
            )
            return num / den
        ceps = jnp.matmul(
            logmel, dct, preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST,
        ) * lift
        if cfg.append_energy:
            log_e = jnp.log(energy)
            if cfg.energy_floor > 0.0:
                log_e = jnp.maximum(
                    log_e, jnp.asarray(np.log(cfg.energy_floor), dtype)
                )
            ceps = jnp.concatenate([log_e[:, None], ceps[:, 1:]], axis=-1)
        return ceps

    return block, span


def _make_finalize(cfg: FrontendConfig, rows: int):
    """[rows, D_base] window + n_valid -> [rows, feat_dim] (unjitted).

    Applies the delta stack with the SAME shift/replication ops as the
    offline chain (chain.delta); rows >= n_valid are tail-replicated, which
    is a no-op unless the window really ends the stream.
    """

    def fin(base: jnp.ndarray, n_valid: jnp.ndarray) -> jnp.ndarray:
        parts = [base]
        if cfg.deltas >= 1:
            d = chain.delta(base, n_valid, cfg)
            parts.append(d)
            if cfg.deltas >= 2:
                parts.append(chain.delta(d, n_valid, cfg))
        return jnp.concatenate(parts, axis=-1) if len(parts) > 1 else base

    return fin


class _SampleBuf:
    """Chunk-deque sample FIFO: O(chunk) append (no rebuild of the whole
    buffer per push — the r2 implementation concatenated, making a
    session's push cost grow with its backlog), windowed copy-out, O(1)
    amortized drop. Float32 1-D semantics identical to the flat ndarray
    it replaces (tests/test_streaming.py's parity suite is the gate)."""

    __slots__ = ("_chunks", "_head", "_n")

    def __init__(self):
        import collections

        self._chunks = collections.deque()
        self._head = 0  # consumed prefix of _chunks[0]
        self._n = 0

    def __len__(self) -> int:
        return self._n

    def append(self, a: np.ndarray) -> None:
        if a.shape[0]:
            self._chunks.append(a)
            self._n += a.shape[0]

    def peek_into(self, out: np.ndarray, n: int) -> int:
        """Copy the first min(n, len) samples into out[:got]; returns got."""
        got = 0
        head = self._head
        for c in self._chunks:
            if got >= n:
                break
            seg = c[head : head + (n - got)]
            out[got : got + seg.shape[0]] = seg
            got += seg.shape[0]
            head = 0
        return got

    def drop(self, n: int) -> None:
        """Remove the first min(n, len) samples (the flat-ndarray slice
        this replaces clamped the same way — pad/flush blocks advance past
        the buffered tail)."""
        n = min(n, self._n)
        self._n -= n
        while n:
            c = self._chunks[0]
            avail = c.shape[0] - self._head
            if avail <= n:
                n -= avail
                self._chunks.popleft()
                self._head = 0
            else:
                self._head += n
                n = 0


class StreamingExtractor:
    """Incremental single-stream extractor; see module docstring.

    push(samples) -> [k, feat_dim] float32 of newly finalized frames
    flush()       -> remaining frames; the stream is then closed
    """

    def __init__(
        self,
        cfg: FrontendConfig,
        *,
        frames_per_block: int = 128,
        cmvn_moments: tuple[np.ndarray, np.ndarray, float] | None = None,
    ):
        if cfg.cmvn == "utterance":
            raise ValueError(
                "per-utterance CMVN needs the whole utterance and cannot "
                "be streamed; use cmvn='global' with cmvn_moments, or the "
                "offline extract()/extract_batch()"
            )
        if cfg.cmvn in ("global", "speaker") and cmvn_moments is None:
            raise ValueError(
                f"cfg.cmvn={cfg.cmvn!r} requires cmvn_moments=(s1, s2, n) "
                "(for 'speaker': this session's speaker's pool)"
            )
        if cfg.frame_tail in ("center", "center_reflect") or cfg.drop_last_frame:
            raise ValueError(
                "centered framing (frame_tail='center'/'center_reflect') "
                "reflects frames around the FINAL stream length, and "
                "drop_last_frame drops a frame known only at flush — "
                "neither is streamable; use frame_tail='drop' or 'pad'"
            )
        if cfg.logmel_norm != "none":
            raise ValueError(
                "logmel_norm='whisper' clamps at the utterance-global max, "
                "which is unknown until the stream ends; normalize offline "
                "or post-hoc"
            )
        if cfg.dither > 0.0:
            raise ValueError(
                "dither is random noise and has no streaming-vs-offline "
                "parity; extract with dither offline, or set dither=0"
            )
        if cfg.input_sample_rate and cfg.input_sample_rate != cfg.sample_rate:
            # 48 kHz-input configs: an exact streaming polyphase stage feeds
            # the feature stream at cfg.sample_rate (host float64 math,
            # sample-exact vs the offline resampler's scipy semantics)
            from mfcc_tpu.ops.resample import StreamingResampler

            self._resampler = StreamingResampler(
                cfg.input_sample_rate, cfg.sample_rate
            )
        else:
            self._resampler = None
        self.cfg = cfg
        self.K = int(frames_per_block)
        if self.K < 1:
            raise ValueError("frames_per_block must be >= 1")
        blk, self.span = _make_base_block(cfg, self.K)
        self._base_block = jax.jit(blk)
        self.lookahead = cfg.deltas * cfg.delta_window  # finalize context rows
        c = self.lookahead
        self._fin = {
            # "first" starts at frame 0 (no left context rows exist yet)
            "first": jax.jit(_make_finalize(cfg, self.K + c)),
            "inner": jax.jit(_make_finalize(cfg, c + self.K + c)),
        }
        self._moments = cmvn_moments
        L, S = cfg.frame_length, cfg.frame_step
        self._L, self._S = L, S

        self._raw = _SampleBuf()  # samples from t = _t0*S - 1
        self._have_pre = False  # _raw's first sample is the pre-context?
        self._t0 = 0  # first frame not yet base-computed
        self._n_samples = 0  # total samples pushed
        self._base = np.zeros((0, self._base_dim()), dtype=np.float32)
        self._base_at = 0  # frame index of _base[0]
        self._emitted = 0  # frames finalized + returned
        self._closed = False

    # -- public ------------------------------------------------------------

    def push(self, samples: np.ndarray) -> np.ndarray:
        """Feed a chunk of raw samples (at cfg.input_sample_rate); returns
        newly finalized frames."""
        if self._closed:
            raise RuntimeError("stream already flushed")
        self._ingest(samples)
        out = []
        # base-compute every complete K-frame block available
        while self._avail_samples() >= self.span:
            win = self._prepare_base()
            base = np.asarray(
                self._base_block(jnp.asarray(win), jnp.int32(self.span))
            )
            self._commit_base(base)
            plan = self._drain_plan(final=False)
            if plan is not None:
                out.append(self._drain_commit(plan, self._run_fin(plan)))
        return self._cat(out)

    def flush(self) -> np.ndarray:
        """Finish the stream: pad-tail frames + delta end edges; close."""
        if self._closed:
            raise RuntimeError("stream already flushed")
        self._ingest_tail()
        self._closed = True
        if self._n_samples == 0:
            return np.zeros((0, self.cfg.feat_dim), dtype=np.float32)
        F = self.cfg.num_frames(self._n_samples)  # offline count (pad tail)
        while self._t0 < F:  # remaining (partial) blocks, zero-padded
            valid = max(0, min(self._avail_samples(), self.span))
            win = self._prepare_base(pad=True)
            base = np.asarray(
                self._base_block(jnp.asarray(win), jnp.int32(valid))
            )
            self._commit_base(base)
        # drop base rows beyond F (pad-block artifacts), then final drain
        self._base = self._base[: max(0, F - self._base_at)]
        plan = self._drain_plan(final=True, total=F)
        if plan is None:
            return np.zeros((0, self.cfg.feat_dim), dtype=np.float32)
        return self._drain_commit(plan, self._run_fin(plan))

    @property
    def frames_emitted(self) -> int:
        return self._emitted

    @property
    def samples_consumed(self) -> int:
        return self._n_samples

    # -- internals -----------------------------------------------------------

    def _base_dim(self) -> int:
        if self.cfg.features in ("mfcc", "plp"):
            return self.cfg.n_ceps
        return self.cfg.n_mels

    def _avail_samples(self) -> int:
        """Samples on hand counting from frame _t0's start."""
        return len(self._raw) - (1 if self._have_pre else 0)

    def _ingest(self, samples: np.ndarray) -> None:
        """Buffer a chunk (resampling to cfg.sample_rate when configured);
        _n_samples counts feature-rate samples."""
        samples = np.asarray(samples, dtype=np.float32).reshape(-1)
        if self._resampler is not None:
            samples = self._resampler.push(samples)
        else:
            samples = samples.copy()  # the buffer keeps a reference; the
            # caller may mutate/reuse its array after push returns
        self._raw.append(samples)
        self._n_samples += samples.shape[0]

    def _ingest_tail(self) -> None:
        """Drain the resampler's look-ahead tail at end of stream."""
        if self._resampler is not None:
            tail = self._resampler.flush()
            self._raw.append(tail)
            self._n_samples += tail.shape[0]

    def _prepare_base(self, pad: bool = False, out: np.ndarray | None = None
                      ) -> np.ndarray:
        """Host-only: assemble the (span+1,) sample window for frames
        [_t0, _t0+K); row 0 is the pre-context sample, data past the buffer
        is zero (only legal for pad/flush blocks). `out` (zeroed,
        >= span+1) lets the serving pool assemble straight into its
        batched rows — no per-stream staging array."""
        need = self.span + 1  # + pre-context row
        win = out if out is not None else np.zeros(need, dtype=np.float32)
        if self._have_pre:
            n = self._raw.peek_into(win, need)
        else:
            n = 1 + self._raw.peek_into(win[1:], need - 1)
            win[0] = 0.0  # synthetic pre-context x[-1] = 0
        if not pad and n < need:
            raise AssertionError("block underflow")  # guarded by caller
        return win

    def _commit_base(self, base: np.ndarray) -> None:
        """Record the device result for the last prepared block; advance."""
        self._base = np.concatenate([self._base, base], axis=0)
        # advance: keep raw from sample (t0+K)*S - 1 onward
        adv = self.K * self._S
        self._raw.drop(adv if self._have_pre else adv - 1)
        self._have_pre = True
        self._t0 += self.K

    def _drain_plan(self, final: bool, total: int | None = None) -> dict | None:
        """Host-only: which frames can finalize now, and the device request.

        None = nothing new emittable (caller must not change state). Else a
        dict for `_run_fin` + `_drain_commit`; kind None is the deltaless
        path (no device work)."""
        c = self.lookahead
        n_base = self._base_at + self._base.shape[0]  # frames base-computed
        if final:
            ready = total if total is not None else n_base  # everything
        else:
            ready = n_base - c  # frames with full lookahead
        start = self._emitted
        if ready <= start:
            return None

        if c == 0:
            if self.cfg.deltas:
                raise AssertionError("lookahead 0 with deltas set")
            return {"kind": None, "start": start, "ready": ready, "w0": start}

        # window: [left ctx | rows to emit | right ctx/tail]
        w0 = max(0, start - c)
        win = self._base[w0 - self._base_at :]
        n_rows = win.shape[0]
        if start == 0 and not final:
            kind, width = "first", self.K + c
        else:
            # flush may have fewer rows than width: zero-pad, n_valid trims
            kind, width = "inner", 2 * c + self.K
        if n_rows < width:
            win = np.concatenate(
                [win, np.zeros((width - n_rows, win.shape[1]), np.float32)]
            )
        elif n_rows > width:
            raise AssertionError("finalize window overflow")
        n_valid = n_rows if final else width
        return {"kind": kind, "win": win, "n_valid": n_valid,
                "start": start, "ready": ready, "w0": w0}

    def _run_fin(self, plan: dict) -> np.ndarray | None:
        if plan["kind"] is None:
            return None
        fn = self._fin[plan["kind"]]
        return np.asarray(fn(jnp.asarray(plan["win"]), jnp.int32(plan["n_valid"])))

    def _drain_commit(self, plan: dict, out: np.ndarray | None) -> np.ndarray:
        """Emit rows [start, ready) from the finalize output; trim history."""
        start, ready, w0 = plan["start"], plan["ready"], plan["w0"]
        if plan["kind"] is None:
            feat = self._base[start - self._base_at : ready - self._base_at]
        else:
            feat = out[start - w0 : start - w0 + (ready - start)]
        feat = self._post(feat)
        self._emitted = ready
        # trim base history: keep from (ready - c) for the next window's ctx
        keep_from = max(0, ready - self.lookahead)
        if keep_from > self._base_at:
            self._base = self._base[keep_from - self._base_at :]
            self._base_at = keep_from
        return feat

    def _post(self, feat: np.ndarray) -> np.ndarray:
        if self.cfg.cmvn in ("global", "speaker"):
            s1, s2, n = self._moments
            mu = (s1 / n).astype(np.float32)
            feat = feat - mu
            if self.cfg.cmvn_var_norm:
                var = (s2 / n - (s1 / n) ** 2).astype(np.float32)
                feat = feat / np.sqrt(var + np.float32(self.cfg.cmvn_eps))
        return feat

    def _cat(self, parts: list[np.ndarray]) -> np.ndarray:
        parts = [p for p in parts if p.size]
        if not parts:
            return np.zeros((0, self.cfg.feat_dim), dtype=np.float32)
        return np.concatenate(parts, axis=0)


def stream_features(chunks, cfg: FrontendConfig, **kw):
    """Generator convenience: yields [k, feat_dim] arrays per input chunk,
    then the flush remainder. `chunks` is any iterable of sample arrays."""
    ex = StreamingExtractor(cfg, **kw)
    for chunk in chunks:
        out = ex.push(chunk)
        if out.size:
            yield out
    tail = ex.flush()
    if tail.size:
        yield tail
