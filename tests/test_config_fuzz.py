"""Randomized convention-knob interaction fuzz: the convention matrix
(tests/test_convention_matrix.py) certifies each knob in isolation plus a
few named combos; this samples random VALID knob combinations (fixed seed
— deterministic in CI) and requires float64 chain == oracle at 1e-10,
catching interaction bugs between knobs no fixed list enumerates."""

import numpy as np
import pytest

import jax

from mfcc_tpu.config import (
    CMVN_MODES, DCT_NORMS, FEATURES, LOG_KINDS, MEL_VARIANTS, WINDOWS,
    FrontendConfig,
)
from mfcc_tpu.ops import chain, reference_numpy as ref

RNG = np.random.default_rng(20260818)


def _random_config(g) -> FrontendConfig:
    sr = int(g.choice([8000, 16000, 22050]))
    n_fft = int(g.choice([256, 512, 1024]))
    win_len_s = float(g.choice([0.020, 0.025, 0.032]))
    # keep the frame within reason for the fft (longer frames truncate —
    # legal, exercised deliberately in a fraction of draws)
    n_mels = int(g.choice([13, 20, 26, 40]))
    features = str(g.choice(FEATURES))
    kw = dict(
        sample_rate=sr,
        n_fft=n_fft,
        win_len_s=win_len_s,
        hop_s=float(g.choice([0.008, 0.010, 0.016])),
        window=str(g.choice(WINDOWS)),
        preemph=float(g.choice([0.0, 0.9, 0.97])),
        n_mels=n_mels,
        mel_variant=str(g.choice(MEL_VARIANTS)),
        mel_low_hz=float(g.choice([0.0, 40.0, 125.0])),
        mel_high_hz=None if g.random() < 0.5 else sr / 2 - float(g.choice([0, 200])),
        log_kind=str(g.choice(LOG_KINDS)),
        features=features,
        dct_norm=str(g.choice(DCT_NORMS)),
        lifter=int(g.choice([0, 12, 22])),
        append_energy=bool(g.random() < 0.5),
        deltas=int(g.choice([0, 1, 2])),
        delta_window=int(g.choice([1, 2, 3])),
        frame_tail=str(g.choice(["pad", "drop"])),
        power_scale_nfft=bool(g.random() < 0.5),
        cmvn=str(g.choice([m for m in CMVN_MODES if m in ("off", "utterance")])),
        cmvn_var_norm=bool(g.random() < 0.5),
        dtype="float64",
    )
    if features == "mfcc":
        kw["n_ceps"] = int(g.choice([12, 13, min(20, n_mels)]))
    else:
        kw["n_ceps"] = min(13, n_mels)
    if features == "spectrogram":
        # one lane per FFT bin (the identity filterbank); mel knobs unused
        kw["n_mels"] = n_fft // 2 + 1
        kw["n_ceps"] = 13
    return FrontendConfig(**kw)


@pytest.mark.parametrize("draw", range(18))
def test_random_config_fp64_exact(draw):
    g = np.random.default_rng((20260818, draw))
    cfg = _random_config(g)
    n = int(cfg.sample_rate * (0.3 + 0.4 * g.random()))
    x = g.standard_normal(n) * 1000.0
    want = ref.extract(x, cfg)
    with jax.enable_x64(True):
        got = chain.extract_single(x, cfg)
    assert got.shape == want.shape, (cfg, got.shape, want.shape)
    np.testing.assert_allclose(
        got, want, atol=1e-10, rtol=1e-10,
        err_msg=f"draw {draw}: {cfg}",
    )


@pytest.mark.parametrize("draw", range(10))
def test_random_config_pallas_matches_twin(draw):
    """The fused kernel (interpret mode) tracks the jnp twin across random
    knob combinations too (fp32, loud-bin gates as in the kernel suite).
    Every feature family is kernel-resident as of r4 — ssc included — and
    a third of draws turn dither on (the in-kernel noise contract)."""
    g = np.random.default_rng((918, draw))
    cfg = _random_config(g).replace(dtype="float32")
    if g.random() < 0.33:
        cfg = cfg.replace(dither=float(g.choice([0.1, 1.0])),
                          dither_seed=int(g.integers(0, 2**31)))
    n = int(cfg.sample_rate * (0.3 + 0.3 * g.random()))
    x = (g.standard_normal(n) * 1000.0).astype(np.float32)
    got = chain.extract_single(x, cfg, backend="pallas")
    want = chain.extract_single(x, cfg, backend="jnp")
    assert got.shape == want.shape, cfg
    if cfg.features == "ssc" and cfg.cmvn == "off":
        # centroids are O(kHz): gate relative
        np.testing.assert_allclose(
            got, want, rtol=1e-4, atol=5e-2, err_msg=f"draw {draw}: {cfg}"
        )
    else:
        np.testing.assert_allclose(
            got, want, atol=5e-4, rtol=1e-3, err_msg=f"draw {draw}: {cfg}"
        )


@pytest.mark.parametrize("draw", range(6))
def test_random_config_streams(draw):
    """Random knob combinations through the online state machine: streamed
    output equals the offline chain for any chunking (utterance CMVN is
    the one documented exclusion)."""
    from mfcc_tpu.pipeline import StreamingExtractor

    g = np.random.default_rng((5150, draw))
    cfg = _random_config(g).replace(dtype="float32", cmvn="off")
    n = int(cfg.sample_rate * (0.4 + 0.4 * g.random()))
    x = (g.standard_normal(n) * 1000.0).astype(np.float32)
    ex = StreamingExtractor(cfg, frames_per_block=int(g.choice([8, 16, 32])))
    parts, pos = [], 0
    while pos < n:
        c = int(min(n - pos, g.integers(1, 2500)))
        parts.append(ex.push(x[pos : pos + c]))
        pos += c
    parts.append(ex.flush())
    got = np.concatenate(parts, axis=0)
    want = np.asarray(chain.extract_single(x, cfg, backend="jnp"))
    assert got.shape == want.shape, cfg
    if cfg.features == "ssc":  # centroids are O(kHz): relative gate
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=5e-2,
                                   err_msg=str(cfg))
    else:
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=5e-5,
                                   err_msg=str(cfg))
