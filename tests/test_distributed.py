"""Data-parallel mesh tests on the simulated 8-device CPU mesh
(SURVEY.md §4.2 item 6): sharded == unsharded, global-CMVN psum == numpy
corpus reduction, accumulator checkpoint/resume."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mfcc_tpu.config import NAMED_CONFIGS
from mfcc_tpu.ops import chain, reference_numpy as ref
from mfcc_tpu.parallel import (
    CmvnAccumulator,
    apply_cmvn,
    batch_moments,
    data_mesh,
    sharded_extract_batch,
)
from mfcc_tpu.parallel.mesh import pad_batch_to_shards
from mfcc_tpu.pipeline import pad_batch
from mfcc_tpu.testing.golden import golden_signals


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"
    return data_mesh(8)


def _corpus_batch(cfg, pad_to=None):
    sigs = golden_signals()
    chosen = [v for k, v in sorted(sigs.items()) if k != "zeros"]
    return pad_batch(
        chosen, cfg, bucket_len=max(s.shape[0] for s in chosen), pad_batch_to=pad_to
    )


def test_sharded_matches_unsharded(mesh):
    cfg = NAMED_CONFIGS["classic13_deltas"]
    b = _corpus_batch(cfg, pad_to=8)
    feat_s, mask_s, _ = sharded_extract_batch(
        b.audio, b.lengths, cfg, mesh, with_moments=False
    )
    feat_u, mask_u = chain.extract_batch(
        jnp.asarray(b.audio), jnp.asarray(b.lengths), cfg
    )
    np.testing.assert_array_equal(np.asarray(feat_s), np.asarray(feat_u))
    np.testing.assert_array_equal(np.asarray(mask_s), np.asarray(mask_u))
    # result is actually sharded over the mesh
    assert len(feat_s.sharding.device_set) == 8


def test_global_cmvn_moments_match_numpy(mesh):
    """The pjit-reduced (Σx, Σx², n) equals a float64 numpy reduction over
    the same corpus, and applying them reproduces the oracle algebra."""
    cfg = NAMED_CONFIGS["classic13_deltas_gcmvn"]
    b = _corpus_batch(cfg, pad_to=8)
    feat, mask, moments = sharded_extract_batch(
        b.audio, b.lengths, cfg, mesh, with_moments=True
    )
    s1, s2, n = (np.asarray(x, dtype=np.float64) for x in moments)

    feat_np = np.asarray(feat, dtype=np.float64)
    mask_np = np.asarray(mask, dtype=np.float64)
    s1_ref = (feat_np * mask_np[..., None]).sum(axis=(0, 1))
    s2_ref = (feat_np**2 * mask_np[..., None]).sum(axis=(0, 1))
    n_ref = mask_np.sum()
    np.testing.assert_allclose(s1, s1_ref, rtol=1e-5)
    np.testing.assert_allclose(s2, s2_ref, rtol=1e-5)
    assert n == n_ref

    acc = CmvnAccumulator(feat_np.shape[-1])
    acc.add(s1, s2, n)
    stats = acc.finalize(cfg)
    out = apply_cmvn(feat, mask, jnp.asarray(stats.mean, jnp.float32),
                     jnp.asarray(stats.std, jnp.float32))
    out = np.asarray(out, dtype=np.float64)
    # oracle algebra on the valid frames of one utterance
    want = ref.cmvn_from_moments(
        feat_np[0][mask_np[0] > 0], s1_ref, s2_ref, n_ref,
        cfg.cmvn_var_norm, cfg.cmvn_eps,
    )
    np.testing.assert_allclose(out[0][mask_np[0] > 0], want, atol=1e-5)
    # valid frames of the whole corpus normalize to ~zero mean / unit var
    valid = out[mask_np > 0]
    np.testing.assert_allclose(valid.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(valid.var(axis=0), 1.0, atol=1e-2)


def test_accumulator_streaming_equals_one_shot(mesh):
    """Moments accumulated batch-by-batch (the streaming path) == moments of
    the whole corpus in one batch; checkpoint round-trips."""
    cfg = NAMED_CONFIGS["classic13_deltas_gcmvn"]
    sigs = golden_signals()
    names = [k for k in sorted(sigs) if k != "zeros"]
    blen = max(sigs[n].shape[0] for n in names)

    one = CmvnAccumulator(cfg.feat_dim)
    b = pad_batch([sigs[n] for n in names], cfg, bucket_len=blen, pad_batch_to=8)
    _, _, m = sharded_extract_batch(b.audio, b.lengths, cfg, mesh, with_moments=True)
    one.add(*m)

    streamed = CmvnAccumulator(cfg.feat_dim)
    for i in range(0, len(names), 2):
        bi = pad_batch(
            [sigs[n] for n in names[i : i + 2]], cfg, bucket_len=blen, pad_batch_to=8
        )
        _, _, m = sharded_extract_batch(
            bi.audio, bi.lengths, cfg, mesh, with_moments=True
        )
        streamed.add(*m)

    np.testing.assert_allclose(streamed.s1, one.s1, rtol=1e-4)
    np.testing.assert_allclose(streamed.s2, one.s2, rtol=1e-4)
    assert streamed.n == one.n


def test_accumulator_checkpoint_roundtrip(tmp_path):
    acc = CmvnAccumulator(4)
    acc.add(np.arange(4.0), np.arange(4.0) ** 2, 7)
    acc.save(tmp_path / "cmvn.npz")
    back = CmvnAccumulator.load(tmp_path / "cmvn.npz")
    np.testing.assert_array_equal(back.s1, acc.s1)
    np.testing.assert_array_equal(back.s2, acc.s2)
    assert back.n == acc.n
    # merging two half-checkpoints == one full accumulation
    half = CmvnAccumulator(4)
    half.merge(back)
    half.merge(back)
    assert half.n == 2 * acc.n


def test_batch_not_divisible_raises(mesh):
    cfg = NAMED_CONFIGS["classic13"]
    sigs = golden_signals()
    b = pad_batch([sigs["short"]] * 3, cfg, bucket_len=200)
    with pytest.raises(ValueError, match="not divisible"):
        sharded_extract_batch(b.audio, b.lengths, cfg, mesh)


def test_pad_batch_to_shards(mesh):
    assert pad_batch_to_shards(1, mesh) == 8
    assert pad_batch_to_shards(8, mesh) == 8
    assert pad_batch_to_shards(9, mesh) == 16


def test_pallas_backend_sharded(mesh):
    """Fused kernel under pjit over the mesh (interpret mode on CPU)."""
    cfg = NAMED_CONFIGS["classic13"]
    b = _corpus_batch(cfg, pad_to=8)
    feat_p, mask_p, _ = sharded_extract_batch(
        b.audio, b.lengths, cfg, mesh, backend="pallas"
    )
    feat_j, _, _ = sharded_extract_batch(b.audio, b.lengths, cfg, mesh)
    lm_p = np.asarray(feat_p, dtype=np.float64)
    lm_j = np.asarray(feat_j, dtype=np.float64)
    # both fp32; residual is DFT-matmul vs rfft roundoff through the lifter
    assert np.abs(lm_p - lm_j).max() < 1e-3
