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


def resample_batch(
    audio: jnp.ndarray, sr_in: int, sr_out: int
) -> jnp.ndarray:
    """Resample [..., T] along the last axis; sr_in -> sr_out.

    Zero padding beyond each utterance's length behaves exactly like
    scipy's 'constant' edge mode, so a padded batch resamples to the same
    values as each utterance alone (valid output range per row:
    output_lengths(lengths)).
    """
    if sr_in == sr_out:
        return audio
    d = _design(sr_out, sr_in)  # up = sr_out, down = sr_in (gcd-reduced inside)
    up, down = d["up"], d["down"]
    n_in = audio.shape[-1]
    n_out = output_length(n_in, sr_in, sr_out)
    lh = d["taps"].shape[0]

    dtype = audio.dtype
    lead = audio.shape[:-1]
    x = audio.reshape((-1, 1, n_in))
    # correlation with the flipped kernel == convolution with h
    w = jnp.asarray(d["taps"][::-1].copy(), dtype=dtype).reshape((1, 1, lh))

    # y[j] = sum_i h[i] * xup[(j + n_pre_remove)*down - i]
    # conv output j' reads dilated input at [j'*down - pad_lo + k]; choose
    # pad_lo so j' = 0 lands on upfirdn index n_pre_remove*down.
    pad_lo = lh - 1 - d["n_pre_remove"] * down
    # highest dilated index touched: (n_out-1)*down - pad_lo + (lh-1)
    n_up = (n_in - 1) * up + 1
    pad_hi = max(0, (n_out - 1) * down - pad_lo + (lh - 1) - (n_up - 1))
    if pad_lo < 0:
        # fold a negative low pad into a shift (can't happen for the scipy
        # designs where n_pre_remove*down <= half_len + n_pre_pad = lh-1,
        # but keep the algebra safe)
        raise AssertionError("negative pad_lo; filter design violated")

    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(down,),
        padding=[(pad_lo, pad_hi)],
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )
    y = y[..., :n_out]
    return y.reshape(lead + (n_out,))


def resample_numpy(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Float64 oracle — delegates to scipy (the ground truth)."""
    import scipy.signal

    g = math.gcd(sr_in, sr_out)
    return scipy.signal.resample_poly(x, sr_out // g, sr_in // g)
