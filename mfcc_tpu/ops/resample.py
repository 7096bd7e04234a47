"""Polyphase resampler — TPU-native twin of scipy.signal.resample_poly
[SP scipy/signal/_signaltools.py:3866] for the 48 kHz→16 kHz input config
(BASELINE config #5; SURVEY.md §7.1 step 8).

Algebra mirrored exactly (padtype='constant', the default):
    g = gcd(up, down); up, down //= g
    h = firwin(2*half_len+1, 1/max_rate, window=('kaiser', 5.0)) * up,
        half_len = 10*max_rate
    h <- [zeros(n_pre_pad), h], n_pre_pad = down - half_len % down
    y = upfirdn(h, x, up, down)[n_pre_remove : n_pre_remove + n_out],
        n_pre_remove = (half_len + n_pre_pad) // down,
        n_out = ceil(n_in * up / down)

The filter taps are designed on host in float64 (scipy.signal.firwin — the
same designer the oracle uses, so taps are bit-identical); the upfirdn
itself is one `lax.conv_general_dilated` with lhs_dilation=up (zero-stuff
upsampling) and window_strides=down (decimation), which XLA lowers to an
MXU-friendly strided convolution — no Python loop, batch-parallel.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def _design(up: int, down: int) -> dict:
    """Host-side tap design + index algebra, cached per reduced ratio."""
    import scipy.signal

    g = math.gcd(up, down)
    up, down = up // g, down // g
    max_rate = max(up, down)
    half_len = 10 * max_rate
    h = scipy.signal.firwin(
        2 * half_len + 1, 1.0 / max_rate, window=("kaiser", 5.0)
    ).astype(np.float64) * up
    n_pre_pad = down - half_len % down
    n_pre_remove = (half_len + n_pre_pad) // down
    h = np.concatenate([np.zeros(n_pre_pad), h])
    return {
        "up": up,
        "down": down,
        "taps": h,  # float64; cast at use
        "n_pre_remove": n_pre_remove,
    }


def output_length(n_in: int, sr_in: int, sr_out: int) -> int:
    """ceil(n_in * up / down) after gcd reduction — scipy's n_out."""
    g = math.gcd(sr_out, sr_in)
    up, down = sr_out // g, sr_in // g
    n = n_in * up
    return n // down + bool(n % down)


def output_lengths(lengths: jnp.ndarray, sr_in: int, sr_out: int) -> jnp.ndarray:
    """Traced per-utterance variant of output_length.

    Computed as q*up + ceil(r*up/down) with q, r = divmod(n, down): exact
    (q*up is an integer so it commutes with the floor/ceil) and overflow-safe
    in int32 — `lengths * up` directly would wrap for high ratios (e.g.
    44.1 kHz→16 kHz reduces to up=160: utterances over ~13.4M samples)."""
    g = math.gcd(sr_out, sr_in)
    up, down = sr_out // g, sr_in // g
    q, r = lengths // down, lengths % down
    ru = r * up  # bounded by (down-1)*up < sr_in*sr_out/g^2 — no overflow
    return q * up + ru // down + (ru % down > 0).astype(lengths.dtype)


def _block_J(up: int) -> int:
    """Outputs per device block: the smallest multiple of `up` >= 128, so
    the matmul's output dim fills MXU lanes and every block shares one
    polyphase alignment (J % up == 0, the _stream_design invariant)."""
    return -(-128 // up) * up


def resample_batch(
    audio: jnp.ndarray, sr_in: int, sr_out: int, method: str = "auto"
) -> jnp.ndarray:
    """Resample [..., T] along the last axis; sr_in -> sr_out.

    method: "auto" (Pallas kernel on TPU for fp32 integer decimation,
    XLA otherwise), "pallas" (force the kernel — interpret mode off-TPU),
    or "xla" (the blocked-matmul fallback; also the float64 path).

    Zero padding beyond each utterance's length behaves exactly like
    scipy's 'constant' edge mode, so a padded batch resamples to the same
    values as each utterance alone (valid output range per row:
    output_lengths(lengths)).

    Device mapping: the polyphase apply is BLOCKED — J outputs per block
    read one W-wide input window at a fixed alignment, so the whole
    resample is overlapping static gathers + one `[B·n_blk, W] @ [W, J]`
    MXU matmul against the banded block matrix (shared with
    StreamingResampler via _stream_design). The previous
    `conv_general_dilated(lhs_dilation=up, stride=down)` formulation
    lowered to a non-MXU strided conv and cost 17.4 ms/step at
    batch-64 × 10 s × 48 kHz — 21× the entire feature chain; the blocked
    matmul does ~(3 + lh/(up·J))× the minimal MACs but puts them on the
    systolic array.
    """
    if sr_in == sr_out:
        return audio
    d = _design(sr_out, sr_in)  # up = sr_out, down = sr_in (gcd-reduced inside)
    up, down = d["up"], d["down"]
    n_in = audio.shape[-1]
    n_out = output_length(n_in, sr_in, sr_out)
    if n_in == 0:  # empty input: n_out = ceil(0) = 0, no compute
        return jnp.zeros(audio.shape[:-1] + (0,), audio.dtype)

    if method != "xla":
        from mfcc_tpu.kernels import resample as K

        ok = K.applicable(up, down, n_in, audio.dtype)
        if method == "pallas" and not ok:
            raise ValueError(
                "pallas resample kernel not applicable here (needs fp32 "
                "integer decimation with a <=128-sample halo)"
            )
        if ok and (method == "pallas" or jax.default_backend() == "tpu"):
            lead = audio.shape[:-1]
            y = K.resample_pallas(
                audio.reshape((-1, n_in)), up, down, n_out
            )
            return y.reshape(lead + (n_out,))

    J = _block_J(up)
    M, origin, W, step = _stream_design(up, down, J)
    dtype = audio.dtype
    lead = audio.shape[:-1]
    x = audio.reshape((-1, n_in))

    n_blk = -(-n_out // J)
    # block b reads input [origin + b*step, origin + b*step + W); shift by
    # pad_lo so all indices are >= 0, zero-fill outside (= scipy constant)
    pad_lo = max(0, -origin)
    o = origin + pad_lo
    E = W - step  # inter-block halo (~taps/up samples; E <= step always
    # for the scipy designs: E ~ 20*down/up < J*down/up = step since J > 20)
    need = o + (n_blk + 1) * step
    pad_hi = max(0, need - (n_in + pad_lo))
    x = jnp.pad(x, ((0, 0), (pad_lo, pad_hi)))
    B = x.shape[0]
    if 0 < E <= step:
        # overlapping windows as two strided reshapes + one concat — a
        # gather here (jnp.take over a [n_blk, W] index matrix) costs ~6 ms
        # at batch-64 x 10 s x 48 kHz, 20x the matmul it feeds
        main = x[:, o : o + n_blk * step].reshape(B, n_blk, step)
        halo = x[:, o + step : o + (n_blk + 1) * step].reshape(
            B, n_blk, step
        )[:, :, :E]
        win = jnp.concatenate([main, halo], axis=-1)  # [B, n_blk, W]
    elif E <= 0:
        win = x[:, o : o + n_blk * step].reshape(B, n_blk, step)[:, :, :W]
    else:  # exotic design with halo wider than a block: gather fallback
        idx = o + step * np.arange(n_blk)[:, None] + np.arange(W)
        win = jnp.take(x, jnp.asarray(idx), axis=-1)
    y = jnp.matmul(
        win, jnp.asarray(M.T, dtype=dtype),
        preferred_element_type=dtype,
        precision=jax.lax.Precision.HIGHEST,
    )  # [B, n_blk, J]
    y = y.reshape(x.shape[0], n_blk * J)[..., :n_out]
    return y.reshape(lead + (n_out,))


def resample_numpy(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Float64 oracle — delegates to scipy (the ground truth)."""
    import scipy.signal

    g = math.gcd(sr_in, sr_out)
    return scipy.signal.resample_poly(x, sr_out // g, sr_in // g)


@functools.lru_cache(maxsize=16)
def _stream_design(up: int, down: int, J: int):
    """Block-invariant polyphase apply for J outputs (J % up == 0): the
    read-only float64 [J, W] matrix plus the window algebra. Cached and
    shared across StreamingResampler instances — a serving pool opening one
    resampler per session would otherwise pay ~34 ms of Python tap
    placement and ~7 MB per admission for an identical matrix."""
    d = _design(up, down)  # gcd-reduced already; reuses the tap cache
    npr = d["n_pre_remove"]
    h = d["taps"]
    lh = h.shape[0]
    # output j is upfirdn index (j + npr): it reads zero-stuffed input at
    # m = (j+npr)*down - k for k in [0, lh), i.e. x[m/up] where up | m.
    # Window origin = lowest x index output 0 can touch (may be negative
    # at stream start -> zero-filled).
    origin = math.ceil((npr * down - (lh - 1)) / up)
    hi = ((J - 1 + npr) * down) // up
    W = hi - origin + 1
    M = np.zeros((J, W), dtype=np.float64)
    for j in range(J):
        mh = (j + npr) * down
        k0 = mh % up  # smallest k with up | (mh - k)
        for k in range(k0, min(lh, mh - origin * up + 1), up):
            M[j, (mh - k) // up - origin] += h[k]
    M.setflags(write=False)
    step = J * down // up  # input samples per block
    return M, origin, W, step


class StreamingResampler:
    """Streaming twin of `resample_batch`/scipy `resample_poly`
    (padtype='constant'): push arbitrary-sized chunks at sr_in, get back
    resampled samples at sr_out, with

        concat(push(c) for c in chunks) + flush() == resample_numpy(x)

    for any chunking (the zero edges at stream start/end are exactly
    scipy's constant padding, so parity is sample-exact in float64).

    Fixed block structure: J output samples per block with J % up == 0, so
    every block reads a window of the same width W at the same polyphase
    alignment and the block apply is one precomputed float64 [J, W]
    banded-matrix product on host (the sample-domain work is ~1 MFLOP per
    second of audio — host arithmetic keeps push() free of device
    dispatches, which the serving pool batches separately). Algorithmic
    latency is the filter look-ahead: ~(half_len + n_pre_pad)/sr_in seconds
    (0.7 ms for 48 kHz→16 kHz).
    """

    def __init__(self, sr_in: int, sr_out: int, block_out: int = 512,
                 dtype=np.float32):
        if sr_in == sr_out:
            raise ValueError("sr_in == sr_out; nothing to resample")
        d = _design(sr_out, sr_in)
        self.up, self.down = d["up"], d["down"]
        J = -(-int(block_out) // self.up) * self.up
        self.M, self.origin, self.W, self.step = _stream_design(
            self.up, self.down, J
        )
        self.J = J
        self.dtype = dtype
        self._buf = np.zeros(0, dtype=np.float64)
        self._pos = 0  # absolute input index of _buf[0]
        self._n_in = 0
        self._emitted = 0
        self._closed = False

    def push(self, x: np.ndarray) -> np.ndarray:
        """Feed input samples; returns every output sample whose full filter
        window is now available."""
        if self._closed:
            raise RuntimeError("resampler already flushed")
        x = np.asarray(x, dtype=np.float64).reshape(-1)
        self._buf = np.concatenate([self._buf, x])
        self._n_in += x.shape[0]
        out = []
        while True:
            b = self._emitted // self.J
            if self.origin + b * self.step + self.W > self._n_in:
                break  # block b still needs future input
            out.append(self._run_block(b))
        if not out:
            return np.zeros(0, dtype=self.dtype)
        return np.concatenate(out).astype(self.dtype)

    def flush(self) -> np.ndarray:
        """Emit the remaining ceil(n_in*up/down) - emitted samples (their
        windows zero-fill past the end, = scipy's constant padding); close."""
        if self._closed:
            raise RuntimeError("resampler already flushed")
        self._closed = True
        nu = self._n_in * self.up
        n_out = nu // self.down + bool(nu % self.down)
        out = []
        before = self._emitted
        while self._emitted < n_out:
            out.append(self._run_block(self._emitted // self.J))
        self._emitted = n_out  # the final block is truncated to n_out
        if not out:
            return np.zeros(0, dtype=self.dtype)
        return np.concatenate(out)[: n_out - before].astype(self.dtype)

    @property
    def samples_out(self) -> int:
        return self._emitted

    def _run_block(self, b: int) -> np.ndarray:
        start = self.origin + b * self.step
        w = np.zeros(self.W, dtype=np.float64)
        lo = max(start, self._pos)
        hi = min(start + self.W, self._pos + self._buf.shape[0])
        if hi > lo:
            w[lo - start : hi - start] = self._buf[lo - self._pos : hi - self._pos]
        y = self.M @ w
        self._emitted += self.J
        keep_from = self.origin + (b + 1) * self.step
        if keep_from > self._pos:
            drop = min(keep_from - self._pos, self._buf.shape[0])
            self._buf = self._buf[drop:]
            self._pos += drop
        return y
