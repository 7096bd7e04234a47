"""PLP feature family (features="plp", kaldi_plp named config).

No Kaldi source exists on this disk (SURVEY.md §0 provenance), so the
compute-plp-feats semantics are re-derived and every mathematical component
is certified BY CONSTRUCTION against an independent formulation:

  - Levinson-Durbin solves the Yule-Walker Toeplitz system (vs
    np.linalg.solve);
  - the LPC→cepstrum recursion equals the power series of -log A(z) (vs an
    FFT of the log spectrum);
  - the IDFT bases equal the inverse cosine transform of the even
    symmetric extension (vs a direct length-2(M+1) sum);
  - an all-pole synthetic signal's PLP-LPC recovers the generating filter;
  - the equal-loudness curve matches the published Hermansky closed form.

Plus the usual framework gates: fp64 oracle==jnp exactness, fp32 feature
gate, pallas (raw-mel epilogue) == jnp, streaming parity, masking/padding
invariance, guards.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mfcc_tpu.config import FrontendConfig, named_config
from mfcc_tpu.ops import chain, constants as C, reference_numpy as ref
from mfcc_tpu.pipeline import pad_batch

RNG = np.random.default_rng(31)


def _valid_autocorr(n_rows: int, p1: int) -> np.ndarray:
    """Autocorrelation rows guaranteed positive-definite: inverse FFT of
    strictly positive random spectra."""
    spec = np.abs(RNG.standard_normal((n_rows, 64))) ** 2 + 0.1
    full = np.concatenate([spec, spec[:, -2:0:-1]], axis=1)
    return np.fft.irfft(full, axis=1)[:, :p1]


# ---------------------------------------------------------------------------
# Component certification
# ---------------------------------------------------------------------------


def test_durbin_solves_yule_walker():
    p = 12
    ac = _valid_autocorr(8, p + 1)
    a, e = ref.durbin(ac)
    for i in range(ac.shape[0]):
        big_r = np.array(
            [[ac[i, abs(r - c)] for c in range(p)] for r in range(p)]
        )
        want = np.linalg.solve(big_r, ac[i, 1 : p + 1])
        np.testing.assert_allclose(a[i], want, atol=1e-8)
        # residual energy: E = r0 - a · r[1:]
        np.testing.assert_allclose(
            e[i], ac[i, 0] - a[i] @ ac[i, 1 : p + 1], rtol=1e-8
        )
    # all-zero frame (padding): a = 0, E = 0, no NaN
    a0, e0 = ref.durbin(np.zeros((1, p + 1)))
    assert np.all(a0 == 0) and np.all(e0 == 0)


def test_lpc_to_cepstrum_is_log_spectrum_series():
    a = np.array([[0.5, -0.3, 0.1, 0.05], [1.2, -0.6, 0.08, -0.01]])
    c = ref.lpc_to_cepstrum(a)
    n = 8192
    w = np.exp(-2j * np.pi * np.arange(n) / n)
    for i in range(a.shape[0]):
        poly = np.ones(n, complex)
        for k, ak in enumerate(a[i], 1):
            poly -= ak * w**k
        series = np.fft.ifft(-np.log(poly)).real  # c_n of -log A(z)
        np.testing.assert_allclose(c[i], series[1 : a.shape[1] + 1], atol=1e-12)


def test_idft_bases_match_even_extension():
    m, p = 23, 12
    x = np.abs(RNG.standard_normal(m + 2))
    got = C.idft_bases(p, m) @ x
    full = np.concatenate([x, x[-2:0:-1]])  # even extension, length 2(M+1)
    ww = np.cos(
        np.pi * np.arange(p + 1)[:, None] * np.arange(2 * (m + 1))[None, :]
        / (m + 1)
    )
    want = (ww @ full) / (2 * (m + 1))
    np.testing.assert_allclose(got, want, atol=1e-13)


def test_equal_loudness_curve():
    f = np.array([100.0, 1000.0, 3500.0, 8000.0])
    got = C.equal_loudness(f)
    fsq = f**2
    want = (fsq / (fsq + 1.6e5)) ** 2 * (fsq + 1.44e6) / (fsq + 9.61e6)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # peak sensitivity in the few-kHz region, strong low-freq attenuation
    assert got[2] > got[1] > got[0] and got[2] > got[3] * 0.5
    assert got[0] < 0.1 * got[2]


def test_idft_durbin_recovers_all_pole_spectrum():
    """Feed the IDFT→Durbin pipeline a KNOWN all-pole power spectrum
    sampled on its own grid ω_j = πj/(M+1): the recovered prediction
    coefficients must match the generating filter (the mel/equal-loudness
    stages deliberately warp the axis, so recovery is only exact when they
    are bypassed — this isolates the LPC algebra itself, catching any
    sign/scale/ordering error)."""
    a_true = np.array([0.6, -0.2])  # x[t] = 0.6 x[t-1] - 0.2 x[t-2] + n[t]
    m = 126  # "mel" bins = uniform spectrum samples here
    w = np.pi * np.arange(1, m + 1) / (m + 1)  # interior grid points
    big_a = 1.0 - a_true[0] * np.exp(-1j * w) - a_true[1] * np.exp(-2j * w)
    pspec = 1.0 / np.abs(big_a) ** 2  # [m]
    dup = np.concatenate([pspec[:1], pspec, pspec[-1:]])[None, :]
    r = dup @ C.idft_bases(2, m).T
    a_hat, e_hat = ref.durbin(r)
    # m = 126 spectrum samples truncate the autocorrelation series; 1e-2
    # absolute is far below any sign/scale/indexing error
    np.testing.assert_allclose(a_hat[0], a_true, atol=1e-2)
    assert 0.5 < e_hat[0] < 2.0  # unit driving noise → residual ~1


# ---------------------------------------------------------------------------
# Framework gates
# ---------------------------------------------------------------------------


def test_plp_fp64_exact():
    cfg = named_config("kaldi_plp").replace(dtype="float64")
    with jax.enable_x64(True):
        for n in (32000 + 137, 400, 100, 16000):
            x = np.random.default_rng(n).standard_normal(n) * 1000
            want = ref.extract(x, cfg)
            got = chain.extract_single(x, cfg)
            assert got.shape == want.shape
            np.testing.assert_allclose(got, want, atol=1e-10, rtol=1e-10)


def test_plp_fp32_gate():
    cfg = named_config("kaldi_plp")
    x = (RNG.standard_normal(16000 * 2 + 137) * 1000).astype(np.float64)
    want = ref.extract(x, cfg)
    got = chain.extract_single(x.astype(np.float32), cfg)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)


def test_plp_variants_fp64_exact():
    variants = {
        "deltas": dict(deltas=2),
        "no_energy": dict(append_energy=False),
        "energy_floor": dict(energy_floor=1e-3),
        "order16": dict(lpc_order=16, n_ceps=17),
        "compress_half": dict(compress_factor=0.5),
        "vtln": dict(vtln_warp=1.1),
        "utt_cmvn": dict(cmvn="utterance", deltas=1),
    }
    with jax.enable_x64(True):
        for name, knobs in variants.items():
            cfg = named_config("kaldi_plp").replace(dtype="float64", **knobs)
            x = np.random.default_rng(3).standard_normal(16000) * 1000
            want = ref.extract(x, cfg)
            got = chain.extract_single(x, cfg)
            np.testing.assert_allclose(
                got, want, atol=1e-10, rtol=1e-10, err_msg=name
            )


def test_plp_pallas_matches_jnp():
    """The kernel epilogue skips the log for plp configs (raw mel lanes);
    chain.plp_base consumes the prefix identically to the twin's melspec."""
    cfg = named_config("kaldi_plp")
    lens = [16000 * 2, 16000 - 373, 4000, 90]
    utts = [RNG.standard_normal(n) * 1000 for n in lens]
    b = pad_batch(utts, cfg)
    fj, mj = chain.extract_batch(
        jnp.asarray(b.audio), jnp.asarray(b.lengths), cfg, backend="jnp"
    )
    fp_, mp_ = chain.extract_batch(
        jnp.asarray(b.audio), jnp.asarray(b.lengths), cfg, backend="pallas"
    )
    np.testing.assert_array_equal(np.asarray(mj), np.asarray(mp_))
    np.testing.assert_allclose(
        np.asarray(fp_), np.asarray(fj), rtol=1e-4, atol=2e-4
    )


def test_plp_golden_parity():
    from mfcc_tpu.testing.golden import load_golden

    cfg = named_config("kaldi_plp")
    for name in ("noise", "speechish", "tone_bin", "zeros"):
        g = load_golden("kaldi_plp", name)
        got = chain.extract_single(g["signal"].astype(np.float32), cfg)
        # tone-like signals make the autocorrelation near-rank-deficient
        # (a spectral spike), so Durbin's conditioning amplifies fp32
        # roundoff: measured 1.1e-3 absolute (0.2% relative) on tone_bin
        # vs <5e-4 on broadband signals — gate 2e-3 covers the
        # ill-conditioned family with margin
        np.testing.assert_allclose(
            got, g["features"], atol=2e-3, rtol=1e-3, err_msg=name
        )


def test_plp_streaming_parity():
    from tests.test_streaming import chunkings, offline, run_stream

    cfg = named_config("kaldi_plp").replace(deltas=2)
    n = 16000 + 373
    x = RNG.standard_normal(n).astype(np.float32) * 100
    want = offline(x, cfg)
    for chunks in chunkings(n):
        got = run_stream(x, cfg, chunks, frames_per_block=32)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=0, atol=5e-5)


def test_plp_masking_invariance():
    """An utterance's PLP features are unchanged by its pad context."""
    cfg = named_config("kaldi_plp")
    x = (RNG.standard_normal(16000) * 1000).astype(np.float32)
    b1 = pad_batch([x], cfg, bucket_len=len(x))
    f1, _ = chain.extract_batch(jnp.asarray(b1.audio), jnp.asarray(b1.lengths), cfg)
    other = (RNG.standard_normal(32000) * 30000).astype(np.float32)
    b2 = pad_batch([x, other], cfg, bucket_len=32000)
    f2, _ = chain.extract_batch(jnp.asarray(b2.audio), jnp.asarray(b2.lengths), cfg)
    fv = cfg.num_frames(len(x))
    np.testing.assert_allclose(
        np.asarray(f1)[0, :fv], np.asarray(f2)[0, :fv], rtol=0, atol=2e-5
    )
    # pad frames zeroed
    assert np.all(np.asarray(f2)[0, fv:] == 0)


def test_plp_config_validation():
    with pytest.raises(ValueError):
        FrontendConfig(features="plp", lpc_order=10, n_ceps=13)  # 13 > 11
    with pytest.raises(ValueError):
        FrontendConfig(features="plp", lpc_order=0)
    assert named_config("kaldi_plp").feat_dim == 13
    assert named_config("kaldi_plp").replace(deltas=2).feat_dim == 39


def test_plp_htk_parm_kind(tmp_path):
    """PLP exports under HTK's native kind 11 with the _E/_D/_A qualifiers
    and energy-last column permutation, round-tripping byte-exactly."""
    from mfcc_tpu.io import htk

    cfg = named_config("kaldi_plp").replace(deltas=2)
    assert htk.kind_string(htk.parm_kind(cfg)) == "PLP_E_D_A"
    perm = htk.energy_last_permutation(cfg)
    assert perm is not None and perm.shape == (39,)
    feat = RNG.standard_normal((17, 39)).astype(np.float32)
    p = tmp_path / "x.plp"
    htk.write_htk(p, feat, cfg)
    data, meta = htk.read_htk(p)
    assert meta["parm_kind_str"] == "PLP_E_D_A"
    np.testing.assert_array_equal(data, feat[:, perm])
