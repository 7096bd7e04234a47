"""Spectral subband centroids as a first-class batched feature
(features="ssc"): oracle == compat.ssc (the float64 psf-lineage
implementation), jnp chain == oracle, composition with deltas/CMVN and
masking, streaming parity, and the pallas-backend guard. The fp64-exact
convention-matrix entries cover the chain; these tests pin the semantics
and the integration edges."""

import numpy as np
import pytest

import jax.numpy as jnp

from mfcc_tpu import compat, extract
from mfcc_tpu.config import FrontendConfig
from mfcc_tpu.ops import chain, reference_numpy as ref
from mfcc_tpu.pipeline import StreamingExtractor, pad_batch

RNG = np.random.default_rng(31)


def test_oracle_matches_compat_ssc():
    """The config-driven oracle reproduces compat.ssc exactly (same float64
    math) when the knobs line up — rect + hamming, default + custom mel
    ranges."""
    x = RNG.standard_normal(13000) * 2000
    for winfunc, window in ((compat._ones, "rect"), (np.hamming, "hamming_sym")):
        cfg = FrontendConfig(features="ssc", window=window)
        want = compat.ssc(x, winfunc=winfunc)
        got = ref.extract(x, cfg)
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=0)
    cfg = FrontendConfig(features="ssc", window="rect",
                         mel_low_hz=80.0, mel_high_hz=7000.0, n_mels=40)
    want = compat.ssc(x, nfilt=40, lowfreq=80.0, highfreq=7000.0)
    np.testing.assert_allclose(ref.extract(x, cfg), want, rtol=1e-12, atol=0)


def test_centroids_lie_inside_their_bands():
    """Property: each centroid is a weighted mean of its band's frequencies,
    so it must lie within [mel band low edge, high edge] ⊂ (0, sr/2]."""
    x = RNG.standard_normal(16000) * 1000
    cfg = FrontendConfig(features="ssc")
    s = ref.extract(x, cfg)
    assert s.shape == (cfg.num_frames(16000), cfg.n_mels)
    assert (s > 0).all() and (s <= cfg.sample_rate / 2).all()
    # centroids are monotone in band index on broadband noise
    assert (np.median(np.diff(s, axis=1) > 0, axis=0) == 1).all()


def test_jnp_chain_matches_oracle_fp32():
    cfg = FrontendConfig(features="ssc", deltas=2)
    xs = [RNG.standard_normal(n) * 3000 for n in (9000, 4001)]
    b = pad_batch(xs, cfg)
    feat, mask = chain.extract_batch(
        jnp.asarray(b.audio), jnp.asarray(b.lengths), cfg, backend="jnp"
    )
    feat = np.asarray(feat)
    for i, x in enumerate(xs):
        want = ref.extract(x.astype(np.float64), cfg)
        got = feat[i, : want.shape[0]]
        # centroids are O(kHz); gate relative (fp32 matmul + divide)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-2)
    # pad frames zeroed
    assert (feat * (1 - np.asarray(mask))[..., None] == 0).all()


@pytest.mark.parametrize("dft_passes", ["radix4", "fp32"])
def test_pallas_kernel_matches_twin(dft_passes):
    """SSC through the fused kernel (VERDICT r2 item 5): the per-lane
    zero-bin clamp + second positive matmul reproduce the twin's per-bin
    where(pspec <= 0, eps, pspec) centroid pair on both DFT paths.
    Includes an impulse (every im lane exactly zero — the pathological
    per-lane-clamp case: spurious eps/2 per lane ~1e-16, invisible in
    fp32) and a short utterance (pad-frame masking)."""
    from mfcc_tpu.kernels import frontend as fk

    cfg = FrontendConfig(features="ssc", deltas=2, cmvn="utterance")
    imp = np.zeros(4000)
    imp[0] = 1.0
    xs = [RNG.standard_normal(9000) * 3000, RNG.standard_normal(4001) * 3000, imp]
    b = pad_batch(xs, cfg)
    audio, lengths = jnp.asarray(b.audio), jnp.asarray(b.lengths)
    fj, mj = chain.extract_batch(audio, lengths, cfg, backend="jnp")
    # extract_batch hardwires radix4 preference; call the stage fn for the
    # fp32 sweep and finish with the same feature epilogue
    from mfcc_tpu.kernels import fused_logmel_stages

    stages = fused_logmel_stages(
        audio, lengths, cfg, interpret=True, dft_passes=dft_passes
    )
    fp_ = chain.features_from_logmel(stages, cfg)[:, : stages["num_frames"]]
    fj, fp_, mj = np.asarray(fj), np.asarray(fp_), np.asarray(mj)
    for i in range(len(xs)):
        fv = int(mj[i].sum())
        # un-normalized centroids are O(kHz): the raw config gates at
        # ~Hz-level absolute; with cmvn the values are O(1)
        np.testing.assert_allclose(
            fp_[i, :fv], fj[i, :fv], rtol=1e-4, atol=5e-3
        )
    # pad frames zeroed in both
    assert (fp_ * (1 - mj)[..., None] == 0).all()


def test_pallas_backend_no_guard_and_extract_parity():
    """extract_batch(backend='pallas') accepts ssc; top-level extract()
    (auto backend) matches the float64 oracle."""
    cfg = FrontendConfig(features="ssc")
    x = RNG.standard_normal(5000).astype(np.float32) * 100
    b = pad_batch([x], cfg)
    fp_, mp_ = chain.extract_batch(
        jnp.asarray(b.audio), jnp.asarray(b.lengths), cfg, backend="pallas"
    )
    want = ref.extract(x.astype(np.float64), cfg)
    fv = int(np.asarray(mp_[0]).sum())
    np.testing.assert_allclose(
        np.asarray(fp_)[0, :fv], want, rtol=2e-5, atol=2e-2
    )
    got = extract(x, cfg)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-2)


def test_ssc_streams():
    """SSC flows through the streaming state machine unchanged (it is just
    another base feature ahead of the delta/finalize logic)."""
    cfg = FrontendConfig(features="ssc", deltas=1)
    x = (RNG.standard_normal(12345) * 2000).astype(np.float32)
    ex = StreamingExtractor(cfg, frames_per_block=16)
    parts = []
    pos = 0
    while pos < len(x):
        c = int(min(len(x) - pos, RNG.integers(1, 1500)))
        parts.append(ex.push(x[pos : pos + c]))
        pos += c
    parts.append(ex.flush())
    got = np.concatenate(parts, axis=0)
    whole = chain.extract_single(x, cfg, backend="jnp")
    assert got.shape == whole.shape
    np.testing.assert_allclose(got, whole, rtol=1e-5, atol=5e-2)
