"""Compat-surface tests: the tutorial-lineage API (mfcc/fbank/logfbank/ssc/
delta/lifter + sigproc helpers) must agree exactly with the float64 oracle
and expose the semantics a reference user expects (SURVEY.md §0 [U]:
the reference's defaults are this family's defaults)."""

import numpy as np
import pytest

from mfcc_tpu import compat, extract
from mfcc_tpu.config import FrontendConfig
from mfcc_tpu.ops import constants as C
from mfcc_tpu.ops import reference_numpy as oracle

RNG = np.random.default_rng(1234)
SIG = (RNG.standard_normal(16000 * 2)
       + np.sin(2 * np.pi * 440.0 * np.arange(16000 * 2) / 16000.0)).astype(np.float64)


def hamming_cfg(**kw):
    return FrontendConfig(**kw)  # defaults: hamming_sym, psf mel, ortho DCT


# ---------------------------------------------------------------------------
# Agreement with the oracle (the acceptance spec)
# ---------------------------------------------------------------------------


def test_mfcc_matches_oracle_hamming():
    got = compat.mfcc(SIG, winfunc=np.hamming)
    want = oracle.extract(SIG, hamming_cfg())
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_mfcc_no_energy_no_lifter():
    got = compat.mfcc(SIG, winfunc=np.hamming, appendEnergy=False, ceplifter=0)
    want = oracle.extract(SIG, hamming_cfg(append_energy=False, lifter=0))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_logfbank_matches_oracle():
    got = compat.logfbank(SIG, winfunc=np.hamming)
    want = oracle.logmel_chain(SIG, hamming_cfg())["logmel"]
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_fbank_energy_matches_oracle():
    feat, energy = compat.fbank(SIG, winfunc=np.hamming)
    stages = oracle.logmel_chain(SIG, hamming_cfg())
    np.testing.assert_allclose(energy, stages["energy"], rtol=0, atol=1e-12)
    np.testing.assert_allclose(
        feat, np.where(stages["melspec"] <= 0, np.finfo(np.float64).eps,
                       stages["melspec"]), rtol=0, atol=1e-12)


def test_delta_lifter_match_oracle():
    feat = RNG.standard_normal((50, 13))
    np.testing.assert_allclose(compat.delta(feat, 2), oracle.delta(feat, 2))
    np.testing.assert_allclose(
        compat.lifter(feat, 22), feat * C.lifter_vector(13, 22)[None, :])
    np.testing.assert_allclose(compat.lifter(feat, 0), feat)


def test_default_window_is_rect():
    # the lineage's default winfunc is all-ones, not Hamming
    got = compat.mfcc(SIG)
    want = oracle.extract(SIG, hamming_cfg(window="rect"))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


# ---------------------------------------------------------------------------
# sigproc helpers
# ---------------------------------------------------------------------------


def test_framesig_shape_and_tail_pad():
    frames = compat.framesig(SIG, 400, 160)
    assert frames.shape == (1 + int(np.ceil((len(SIG) - 400) / 160)), 400)
    # tail frame zero-padded, not dropped
    assert frames[-1, -1] == 0.0 or len(SIG) % 160 == 0


def test_deframesig_roundtrip_rect_and_hamming():
    for winfunc in (lambda n: np.ones(n), np.hamming):
        frames = compat.framesig(SIG, 400, 160, winfunc)
        rec = compat.deframesig(frames, len(SIG), 400, 160, winfunc)
        np.testing.assert_allclose(rec, SIG, rtol=0, atol=1e-9)


def test_magspec_powspec_logpowspec():
    frames = compat.framesig(SIG, 400, 160, np.hamming)
    mag = compat.magspec(frames, 512)
    pow_ = compat.powspec(frames, 512)
    np.testing.assert_allclose(pow_, mag**2 / 512.0, rtol=1e-12, atol=0)
    lps = compat.logpowspec(frames, 512, norm=1)
    assert np.max(lps) == pytest.approx(0.0)
    lps_un = compat.logpowspec(frames, 512, norm=0)
    np.testing.assert_allclose(lps, lps_un - np.max(lps_un), atol=1e-9)


def test_preemphasis_sigproc_default():
    y = compat.preemphasis(SIG)  # sigproc default 0.95
    np.testing.assert_allclose(y, oracle.preemphasis(SIG, 0.95))


# ---------------------------------------------------------------------------
# ssc + filterbank surface
# ---------------------------------------------------------------------------


def test_get_filterbanks_orientation_and_values():
    fb = compat.get_filterbanks(26, 512, 16000)
    assert fb.shape == (26, 257)
    np.testing.assert_allclose(
        fb, C.mel_filterbank_psf(26, 512, 16000, 0.0, 8000.0).T)


def test_ssc_centroids_lie_inside_band():
    cent = compat.ssc(SIG, winfunc=np.hamming)
    assert cent.shape[1] == 26
    # each subband centroid must sit within [lowfreq, nyquist]
    assert np.all(cent > 0.0) and np.all(cent <= 8000.0)
    # and centroids should be (weakly) increasing with filter index on
    # broadband input — band centers increase
    med = np.median(cent, axis=0)
    assert np.all(np.diff(med) > 0)


def test_ssc_pure_tone_centroid():
    t = np.arange(16000) / 16000.0
    tone = np.sin(2 * np.pi * 1000.0 * t)
    cent = compat.ssc(tone, preemph=0.0)
    fb = compat.get_filterbanks(26, 512, 16000)
    # find the filter whose band contains 1 kHz with the most weight
    k = int(np.argmax(fb[:, int(round(1000 / (16000 / 512)))]))
    assert np.median(cent[:, k]) == pytest.approx(1000.0, abs=40.0)


def test_hz2mel_roundtrip():
    f = np.linspace(0, 8000, 33)
    np.testing.assert_allclose(compat.mel2hz(compat.hz2mel(f)), f, atol=1e-9)


# ---------------------------------------------------------------------------
# as_config migration bridge
# ---------------------------------------------------------------------------


def test_as_config_matches_compat_on_framework_path():
    cfg = compat.as_config(winfunc=np.hamming)
    assert cfg.window == "hamming_sym"
    got = extract(SIG, cfg, backend="jnp")
    want = compat.mfcc(SIG, winfunc=np.hamming)
    # framework path is fp32 on device; compat is fp64 — feature gate
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-4)


def test_as_config_rect_default_and_reject_unknown():
    assert compat.as_config().window == "rect"
    assert compat.as_config(winfunc=np.hanning).window == "hann_sym"
    # blackman is resolvable since the r2 window widening...
    assert compat.as_config(winfunc=np.blackman).window == "blackman_sym"
    # ...but a window outside the enum still rejects cleanly
    with pytest.raises(ValueError, match="winfunc"):
        compat.as_config(winfunc=np.bartlett)


# ---------------------------------------------------------------------------
# Kaldi/torchaudio flag-name migration bridge (r4)
# ---------------------------------------------------------------------------


def test_as_kaldi_config_defaults_match_named_configs():
    """Kaldi-binary defaults (minus dither, which the named configs turn
    off for determinism) reproduce the certified kaldi_* named configs
    exactly — the bridge and the convention work agree field for field."""
    import dataclasses

    from mfcc_tpu.config import NAMED_CONFIGS

    for ft, name, extra in (
        ("mfcc", "kaldi_mfcc", {}),
        ("fbank", "kaldi_fbank", dict(use_energy=False)),
        ("plp", "kaldi_plp", {}),
    ):
        a = compat.as_kaldi_config(ft, dither=0.0, **extra)
        b = NAMED_CONFIGS[name]
        diff = {
            f.name: (getattr(a, f.name), getattr(b, f.name))
            for f in dataclasses.fields(a)
            if getattr(a, f.name) != getattr(b, f.name)
        }
        assert not diff, (ft, diff)


def test_as_kaldi_config_flag_mapping():
    cfg = compat.as_kaldi_config(
        "mfcc", sample_frequency=8000.0, frame_length=20.0, frame_shift=5.0,
        window_type="hamming", snip_edges=False, num_mel_bins=40,
        low_freq=40.0, high_freq=-400.0, num_ceps=20, cepstral_lifter=0,
        use_energy=False, raw_energy=False, energy_floor=1e-2,
        subtract_mean=True, round_to_power_of_two=True, dither=0.5,
    )
    assert cfg.sample_rate == 8000 and cfg.n_fft == 256  # 160 -> pow2
    assert cfg.window == "hamming_sym" and cfg.frame_tail == "center"
    assert cfg.mel_high_hz == 8000 / 2 - 400.0 and cfg.mel_low_hz == 40.0
    assert cfg.n_ceps == 20 and cfg.lifter == 0 and not cfg.append_energy
    assert cfg.energy_source == "windowed_frame"
    assert cfg.cmvn == "utterance" and not cfg.cmvn_var_norm
    assert cfg.dither == 0.5 and cfg.energy_floor == 1e-2
    # no pow2 rounding keeps the odd FFT length (direct-DFT path handles it)
    cfg2 = compat.as_kaldi_config(
        "mfcc", frame_length=25.0, round_to_power_of_two=False
    )
    assert cfg2.n_fft == 400

    # the mapped config actually extracts (jnp chain, short utterance)
    import numpy as np

    from mfcc_tpu.ops import chain

    x = (np.random.default_rng(0).standard_normal(8000) * 3000).astype(
        np.float32
    )
    feat = chain.extract_single(x, cfg.replace(dither=0.0), backend="jnp")
    assert feat.shape[1] == 20 and np.isfinite(feat).all()


def test_as_kaldi_config_rejects_unsupported():
    with pytest.raises(ValueError, match="htk_compat"):
        compat.as_kaldi_config("mfcc", htk_compat=True)
    with pytest.raises(ValueError, match="blackman_coeff"):
        compat.as_kaldi_config("mfcc", window_type="blackman",
                               blackman_coeff=0.5)
    with pytest.raises(ValueError, match="window_type"):
        compat.as_kaldi_config("mfcc", window_type="kaiser")
    with pytest.raises(ValueError, match="channel"):
        compat.as_kaldi_config("mfcc", channel=3)
    with pytest.raises(ValueError, match="use_energy"):
        compat.as_kaldi_config("fbank", use_energy=True)


def test_as_kaldi_config_truncates_ms_like_kaldi():
    """Kaldi truncates ms->samples (FrameExtractionOptions::WindowSize);
    at 11025 Hz / 25 ms that is 275 samples, not round(275.625)=276
    (review r4). The derived win_len_s/hop_s must reproduce the truncated
    counts through FrontendConfig's own rounding."""
    cfg = compat.as_kaldi_config("mfcc", sample_frequency=11025.0)
    assert cfg.frame_length == 275 and cfg.frame_step == 110
    assert cfg.n_fft == 512
    cfg = compat.as_kaldi_config("mfcc", sample_frequency=22050.0)
    assert cfg.frame_length == 551 and cfg.frame_step == 220
