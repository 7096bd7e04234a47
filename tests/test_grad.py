"""Differentiability: the jnp chain is pure jax, so gradients flow from
features back to the raw audio — the property trainable front-ends need
(PAPERS.md "Efficient Trainable Front-Ends"). These tests certify it stays
true: finite grads through every feature family, correctness against a
numerical directional derivative, and batch independence (an utterance's
grad is zero outside itself)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mfcc_tpu.config import FrontendConfig
from mfcc_tpu.ops import chain
from mfcc_tpu.pipeline import pad_batch

RNG = np.random.default_rng(53)


def _loss_fn(cfg):
    def loss(audio, lengths):
        feat, mask = chain.extract_batch(audio, lengths, cfg, backend="jnp")
        return (feat**2).sum()

    return loss


@pytest.mark.parametrize("features", ["mfcc", "logmel", "ssc"])
def test_grads_finite_and_match_directional(features):
    cfg = FrontendConfig(features=features, deltas=1)
    xs = [RNG.standard_normal(4000) * 1000 + 50 for _ in range(2)]
    b = pad_batch(xs, cfg)
    audio = jnp.asarray(b.audio)
    lengths = jnp.asarray(b.lengths)
    loss = _loss_fn(cfg)
    g = jax.grad(loss)(audio, lengths)
    g = np.asarray(g, np.float64)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0  # not trivially zero

    # directional derivative vs central difference in float64
    with jax.enable_x64(True):
        cfg64 = cfg.replace(dtype="float64")
        loss64 = _loss_fn(cfg64)
        a64 = jnp.asarray(b.audio, jnp.float64)
        v = jnp.asarray(RNG.standard_normal(b.audio.shape))
        got = float(jnp.vdot(jax.grad(loss64)(a64, lengths), v))
        # ssc's loss is O(kHz^2): eps=1e-4 is cancellation-limited in the
        # central difference (measured rel ~2e-5); 1e-3 sits in the sweet
        # spot for all three families (<2e-7)
        eps = 1e-3
        num = float(
            (loss64(a64 + eps * v, lengths) - loss64(a64 - eps * v, lengths))
            / (2 * eps)
        )
        assert num != 0
        assert abs(got - num) / abs(num) < 1e-5, (got, num)


def test_grad_respects_batch_and_length_boundaries():
    """d loss(utterance 0) / d audio of utterance 1 must be exactly zero,
    and zero beyond each utterance's valid length."""
    cfg = FrontendConfig(deltas=2)
    xs = [RNG.standard_normal(3000) * 500, RNG.standard_normal(5000) * 500]
    b = pad_batch(xs, cfg)
    audio = jnp.asarray(b.audio)
    lengths = jnp.asarray(b.lengths)

    def loss_row0(a, l):
        feat, _ = chain.extract_batch(a, l, cfg, backend="jnp")
        return (feat[0] ** 2).sum()

    g = np.asarray(jax.grad(loss_row0)(audio, lengths))
    assert np.abs(g[1]).max() == 0.0  # other utterance untouched
    assert np.abs(g[0, :3000]).max() > 0
    # pad samples beyond the utterance cannot influence its features
    assert np.abs(g[0, 3000:]).max() == 0.0


def test_pallas_diff_matches_jnp_grad():
    """extract_batch_diff: fused-kernel forward values, jnp-twin VJP
    backward — gradients match the pure-jnp path to fp32 tolerance and
    the forward is bit-identical to backend='pallas'."""
    from mfcc_tpu.config import named_config

    cfg = named_config("classic13_deltas")
    xs = [RNG.standard_normal(4000) * 1000 + 50 for _ in range(2)]
    b = pad_batch(xs, cfg)
    audio, lengths = jnp.asarray(b.audio), jnp.asarray(b.lengths)

    def loss_p(a):
        feat, _ = chain.extract_batch_diff(a, lengths, cfg)
        return (feat**2).sum()

    def loss_j(a):
        feat, _ = chain.extract_batch(a, lengths, cfg, backend="jnp")
        return (feat**2).sum()

    gp = np.asarray(jax.grad(loss_p)(audio))
    gj = np.asarray(jax.grad(loss_j)(audio))
    assert np.isfinite(gp).all() and np.abs(gp).max() > 0
    rel = np.abs(gp - gj).max() / np.abs(gj).max()
    assert rel < 1e-3, rel
    fp, _ = chain.extract_batch_diff(audio, lengths, cfg)
    fp2, _ = chain.extract_batch(audio, lengths, cfg, backend="pallas")
    np.testing.assert_array_equal(np.asarray(fp), np.asarray(fp2))


def test_pallas_diff_rejects_non_flat_input():
    from mfcc_tpu.config import named_config
    from mfcc_tpu.pipeline import device_layout

    cfg = named_config("classic13")
    b = pad_batch([RNG.standard_normal(16000).astype(np.float32)], cfg,
                  bucket_len=16000, layout=device_layout(cfg, 16000))
    with pytest.raises(ValueError, match="flat float audio"):
        chain.extract_batch_diff(
            jnp.asarray(b.audio), jnp.asarray(b.lengths), cfg
        )
    flat = pad_batch([RNG.standard_normal(16000).astype(np.float32)], cfg)
    with pytest.raises(ValueError, match="flat float audio"):
        chain.extract_batch_diff(
            jnp.asarray(np.asarray(flat.audio, np.int16)),
            jnp.asarray(flat.lengths), cfg,
        )
