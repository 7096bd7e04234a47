"""Certify the float64 oracle against on-disk implementations of the same
algorithms (SURVEY.md Appendix D step 2). These are the only authoritative
numerics available while /root/reference is empty:

  - windows vs scipy.signal.windows / np.hamming
  - framing+window+rfft composition vs tf.signal.stft with a matching window
  - DCT vs scipy.fft.dct (ortho), and the HTK variant's bin-0 sqrt(2) ratio
  - mel HTK scale vs the TF constants; tf_continuous matrix vs
    tf.signal.linear_to_mel_weight_matrix
  - property checks on deltas / CMVN / Parseval
"""

import numpy as np
import pytest
import scipy.fft
import scipy.signal

from mfcc_tpu.config import FrontendConfig
from mfcc_tpu.ops import constants as C
from mfcc_tpu.ops import reference_numpy as ref

CFG = FrontendConfig()


# ---------------------------------------------------------------------------
# Windows
# ---------------------------------------------------------------------------


def test_hamming_sym_matches_numpy_scipy():
    w = C.window_vector("hamming_sym", 400)
    np.testing.assert_allclose(w, np.hamming(400), atol=0)
    np.testing.assert_allclose(
        w, scipy.signal.windows.hamming(400, sym=True), atol=1e-15
    )


def test_hann_periodic_matches_scipy():
    w = C.window_vector("hann_periodic", 400)
    np.testing.assert_allclose(
        w, scipy.signal.windows.hann(400, sym=False), atol=1e-15
    )


def test_periodic_differs_from_symmetric():
    # the convention flag matters (SURVEY.md Appendix A probe)
    a = C.window_vector("hamming_sym", 8)
    b = C.window_vector("hamming_periodic", 8)
    assert np.max(np.abs(a - b)) > 0.01


def test_blackman_matches_numpy_scipy():
    w = C.window_vector("blackman_sym", 400)
    np.testing.assert_allclose(w, np.blackman(400), atol=1e-15)
    np.testing.assert_allclose(
        w, scipy.signal.windows.blackman(400, sym=True), atol=1e-15
    )
    wp = C.window_vector("blackman_periodic", 400)
    np.testing.assert_allclose(
        wp, scipy.signal.windows.blackman(400, sym=False), atol=1e-15
    )


def test_povey_matches_kaldi_formula():
    """Kaldi src/feat/feature-window.cc: pow(0.5 - 0.5*cos(2*pi*n/(M-1)),
    0.85) — no scipy oracle exists; certified against the published
    formula plus window properties."""
    M = 400
    n = np.arange(M)
    want = (0.5 - 0.5 * np.cos(2 * np.pi * n / (M - 1))) ** 0.85
    w = C.window_vector("povey", M)
    np.testing.assert_allclose(w, want, atol=0)
    assert w[0] == 0.0 and w[-1] == 0.0  # zero endpoints (unlike Hamming)
    assert abs(w[M // 2] - 1.0) < 1e-4  # unit peak near center
    np.testing.assert_allclose(w, w[::-1], atol=1e-15)  # symmetric
    # sits between Hann^1 and Hamming in mainlobe energy
    hann = C.window_vector("hann_sym", M)
    assert (w >= hann - 1e-15).all()


# ---------------------------------------------------------------------------
# Pre-emphasis == lfilter([1, -a], [1], x) except the y[0] convention
# ---------------------------------------------------------------------------


def test_preemphasis_matches_lfilter():
    g = np.random.default_rng(0)
    x = g.standard_normal(1000)
    y = ref.preemphasis(x, 0.97)
    z = scipy.signal.lfilter([1.0, -0.97], [1.0], x)
    # lfilter's y[0] = x[0] as well (zero initial state)
    np.testing.assert_allclose(y, z, atol=1e-12)


# ---------------------------------------------------------------------------
# Framing
# ---------------------------------------------------------------------------


def test_frame_count_ceil():
    # 5 s @16 kHz -> 499 frames (SURVEY.md Appendix A: 1+ceil((80000-400)/160))
    assert CFG.num_frames(80000) == 499
    assert CFG.num_frames(400) == 1
    assert CFG.num_frames(100) == 1  # sub-frame utterance still yields 1 padded frame
    assert CFG.num_frames(401) == 2


def test_frame_values_and_tail_pad():
    x = np.arange(1000, dtype=np.float64)
    fr = ref.frame_signal(x, 400, 160, "pad")
    assert fr.shape == (1 + int(np.ceil((1000 - 400) / 160)), 400)
    np.testing.assert_array_equal(fr[0], x[:400])
    np.testing.assert_array_equal(fr[2, :100], x[320:420])
    # last frame zero-padded beyond N
    f = fr.shape[0] - 1
    start = f * 160
    valid = 1000 - start
    np.testing.assert_array_equal(fr[f, :valid], x[start:])
    assert np.all(fr[f, valid:] == 0)


def test_frame_drop_variant():
    fr = ref.frame_signal(np.arange(1000.0), 400, 160, "drop")
    assert fr.shape[0] == 1 + (1000 - 400) // 160


# ---------------------------------------------------------------------------
# STFT composition vs TF (conventions aligned per Appendix D step 2)
# ---------------------------------------------------------------------------


def test_stft_composition_matches_tf():
    tf = pytest.importorskip("tensorflow")
    g = np.random.default_rng(7)
    x = g.standard_normal(4000)
    # drop-tail framing to match TF's pad_end=False
    frames = ref.frame_signal(ref.preemphasis(x, 0.0), 400, 160, "drop")
    win = C.window_vector("hamming_sym", 400)
    ours = np.fft.rfft(frames * win, 512)
    theirs = tf.signal.stft(
        tf.constant(x, tf.float64),
        frame_length=400,
        frame_step=160,
        fft_length=512,
        window_fn=lambda l, dtype: tf.constant(win, dtype),
        pad_end=False,
    ).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=1e-10)


# ---------------------------------------------------------------------------
# DCT
# ---------------------------------------------------------------------------


def test_dct_matrix_matches_scipy_ortho():
    g = np.random.default_rng(1)
    x = g.standard_normal((50, 26))
    d = C.dct_matrix(26, 26, "ortho")
    np.testing.assert_allclose(
        x @ d, scipy.fft.dct(x, type=2, axis=1, norm="ortho"), atol=1e-12
    )


def test_dct_htk_bin0_sqrt2():
    d_o = C.dct_matrix(26, 13, "ortho")
    d_h = C.dct_matrix(26, 13, "htk")
    np.testing.assert_allclose(d_h[:, 0] / d_o[:, 0], np.sqrt(2.0), atol=1e-12)
    np.testing.assert_allclose(d_h[:, 1:], d_o[:, 1:], atol=0)


def test_dct_htk_matches_tf():
    tf = pytest.importorskip("tensorflow")
    g = np.random.default_rng(2)
    x = g.standard_normal((10, 26))
    d = C.dct_matrix(26, 13, "htk")
    theirs = tf.signal.mfccs_from_log_mel_spectrograms(tf.constant(x)).numpy()[:, :13]
    np.testing.assert_allclose(x @ d, theirs, atol=1e-5)


def test_dct_orthogonality():
    d = C.dct_matrix(26, 26, "ortho")
    np.testing.assert_allclose(d.T @ d, np.eye(26), atol=1e-12)


# ---------------------------------------------------------------------------
# Mel filterbanks
# ---------------------------------------------------------------------------


def test_mel_scale_constants():
    # 2595 log10(1+f/700) ~= 1127 ln(1+f/700): the constants differ by
    # 2595/ln(10) = 1127.0104 (9e-6 relative); a uniform mel-scale factor
    # cancels in the triangle slopes, so matrices agree far tighter.
    f = np.linspace(0, 8000, 100)
    np.testing.assert_allclose(
        C.hz_to_mel(f), 1127.0 * np.log1p(f / 700.0), rtol=1e-4
    )
    np.testing.assert_allclose(C.mel_to_hz(C.hz_to_mel(f)), f, atol=1e-8)


def test_mel_tf_matches_tensorflow():
    tf = pytest.importorskip("tensorflow")
    ours = C.mel_filterbank_tf(26, 512, 16000, 0.0, 8000.0)
    theirs = tf.signal.linear_to_mel_weight_matrix(
        num_mel_bins=26,
        num_spectrogram_bins=257,
        sample_rate=16000,
        lower_edge_hertz=0.0,
        upper_edge_hertz=8000.0,
        dtype=tf.float64,
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-10)


def test_mel_psf_structure():
    fb = C.mel_filterbank_psf(26, 512, 16000, 0.0, 8000.0)  # [257, 26]
    assert fb.shape == (257, 26)
    col_max = fb.max(axis=0)
    np.testing.assert_allclose(col_max, 1.0, atol=1e-12)  # every triangle peaks at 1
    assert np.all(fb >= 0)
    # unimodal columns: diff changes sign at most once
    for j in range(26):
        col = fb[:, j]
        nz = np.flatnonzero(col)
        d = np.diff(col[nz[0] : nz[-1] + 1])
        sign_changes = np.sum(np.diff(np.sign(d[d != 0])) != 0)
        assert sign_changes <= 1


def test_mel_variants_differ():
    a = C.mel_filterbank_psf(26, 512, 16000, 0.0, 8000.0)
    b = C.mel_filterbank_tf(26, 512, 16000, 0.0, 8000.0)
    # Appendix A measured 0.2396 — the variant flag is load-bearing
    assert np.max(np.abs(a - b)) > 0.2


# ---------------------------------------------------------------------------
# Spectrum / energy / properties
# ---------------------------------------------------------------------------


def test_parseval():
    g = np.random.default_rng(3)
    x = g.standard_normal(512)
    spec = np.fft.rfft(x, 512)
    # account for rfft's one-sided doubling (bins 1..K/2-1 appear twice)
    full = np.concatenate([spec, np.conj(spec[-2:0:-1])])
    np.testing.assert_allclose(
        np.sum(x**2), np.sum(np.abs(full) ** 2) / 512, rtol=1e-10
    )


def test_delta_of_constant_is_zero(signals):
    feat = np.tile(np.arange(13.0), (50, 1))
    np.testing.assert_allclose(ref.delta(feat, 2), 0.0, atol=1e-12)


def test_delta_of_linear_ramp_is_slope():
    # interior of a linear ramp: delta == slope per frame
    slope = 0.5
    feat = slope * np.arange(50.0)[:, None] * np.ones((1, 4))
    d = ref.delta(feat, 2)
    np.testing.assert_allclose(d[2:-2], slope, atol=1e-12)


def test_cmvn_zero_mean_unit_var():
    g = np.random.default_rng(4)
    feat = g.standard_normal((100, 13)) * 3 + 5
    out = ref.cmvn_utterance(feat, True, 1e-8)
    np.testing.assert_allclose(out.mean(axis=0), 0.0, atol=1e-10)
    np.testing.assert_allclose(out.std(axis=0), 1.0, atol=1e-3)


def test_cmvn_moments_algebra():
    g = np.random.default_rng(5)
    feat = g.standard_normal((100, 13))
    s1, s2, n = feat.sum(0), (feat**2).sum(0), float(feat.shape[0])
    out = ref.cmvn_from_moments(feat, s1, s2, n, True, 1e-8)
    np.testing.assert_allclose(out, ref.cmvn_utterance(feat, True, 1e-8), atol=1e-10)


# ---------------------------------------------------------------------------
# End-to-end oracle sanity
# ---------------------------------------------------------------------------


def test_extract_shapes(signals):
    cfg = FrontendConfig(deltas=2)
    for name, x in signals.items():
        feat = ref.extract(x, cfg)
        assert feat.shape == (cfg.num_frames(len(x)), 39), name
        assert np.all(np.isfinite(feat)), name


def test_logmel_config(signals):
    from mfcc_tpu.config import named_config

    cfg = named_config("logmel80")
    feat = ref.extract(signals["speechish"], cfg)
    assert feat.shape == (cfg.num_frames(len(signals["speechish"])), 80)
    assert np.all(np.isfinite(feat))
