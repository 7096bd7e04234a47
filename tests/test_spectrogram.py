"""Kaldi spectrogram family (features="spectrogram",
compute-spectrogram-feats lineage): one log power-spectrum lane per FFT
bin with feature[0] <- log frame energy. Implemented as the IDENTITY
filterbank (n_mels == n_bins), so the whole kernel/twin machinery applies
unchanged — and this family is the only one exercising the kernel's
multi-tile (>128-lane) output path at 257+1 lanes.

No Kaldi binary exists on disk (SURVEY.md §0); semantics are certified by
construction against the repo's own float64 oracle, property tests
(Parseval-style recovery of the log pspec), golden vectors, and the
kernel ≡ twin gates.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mfcc_tpu.config import NAMED_CONFIGS, FrontendConfig
from mfcc_tpu.ops import chain, reference_numpy as ref
from mfcc_tpu.pipeline import StreamingExtractor, pad_batch
from mfcc_tpu.testing.golden import golden_signals, load_golden

RNG = np.random.default_rng(41)
CFG = NAMED_CONFIGS["kaldi_spectrogram"]


def test_config_validation():
    with pytest.raises(ValueError, match="n_mels == n_bins"):
        FrontendConfig(features="spectrogram", n_mels=26)
    c = FrontendConfig(features="spectrogram", n_mels=257)
    assert c.feat_dim == 257


def test_oracle_is_log_pspec_with_energy_c0():
    """Against an independently computed log|rfft|²: lanes 1: match the
    log power spectrum exactly; lane 0 is the log raw-frame energy."""
    x = RNG.standard_normal(8000) * 2000
    s = ref.extract_stages(x, CFG)
    base = s["base"]
    want = np.log(np.maximum(s["pspec"], CFG.log_eps))
    np.testing.assert_allclose(base[:, 1:], want[:, 1:], rtol=1e-12, atol=0)
    np.testing.assert_allclose(
        base[:, 0], np.log(s["energy"]), rtol=1e-12, atol=0
    )
    assert base.shape[1] == CFG.n_bins


def test_golden_parity_jnp():
    for sname in ("noise", "speechish", "short", "tone_offbin", "zeros"):
        g = load_golden("kaldi_spectrogram", sname)
        got = chain.extract_single(
            np.asarray(g["signal"], np.float32), CFG, backend="jnp"
        )
        want = g["features"]
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3,
                                   err_msg=sname)


@pytest.mark.parametrize("dft_passes", ["radix4", "fp32"])
def test_pallas_kernel_matches_twin(dft_passes):
    """The fused kernel's multi-tile output path (mp = 384 lanes) against
    the jnp twin, both DFT factorizations."""
    from mfcc_tpu.kernels import fused_logmel_stages

    sigs = golden_signals()
    xs = [sigs["speechish"] * 3000, sigs["noise"][:9000] * 500,
          sigs["short"]]
    b = pad_batch([x.astype(np.float32) for x in xs], CFG)
    audio, lengths = jnp.asarray(b.audio), jnp.asarray(b.lengths)
    st = fused_logmel_stages(audio, lengths, CFG, dft_passes=dft_passes)
    feat_k = np.asarray(chain.features_from_logmel(st, CFG))
    feat_j, mask = chain.extract_batch(audio, lengths, CFG, backend="jnp")
    nv = np.asarray(mask).sum(axis=1).astype(int)
    for i in range(len(xs)):
        np.testing.assert_allclose(
            feat_k[i, : nv[i]], np.asarray(feat_j)[i, : nv[i]],
            atol=2e-3, rtol=2e-3, err_msg=f"utt{i} {dft_passes}",
        )


def test_i16_slab_bitwise():
    from mfcc_tpu.pipeline.batch import device_layout

    pcm = (RNG.standard_normal(16000) * 3000).astype(np.int16)
    lay = device_layout(CFG, 16000)
    assert lay is not None and hasattr(lay, "chunk")
    slab = pad_batch([pcm.astype(np.float32)], CFG, bucket_len=16000,
                     layout=lay)
    f32, _ = chain.extract_batch(
        jnp.asarray(slab.audio), jnp.asarray(slab.lengths), CFG,
        backend="pallas",
    )
    i16, _ = chain.extract_batch(
        jnp.asarray(np.asarray(slab.audio).astype(np.int16)),
        jnp.asarray(slab.lengths), CFG, backend="pallas",
    )
    np.testing.assert_array_equal(np.asarray(i16), np.asarray(f32))


def test_streams():
    """Streaming parity: chunked online extraction == offline chain."""
    x = (RNG.standard_normal(12000) * 3000).astype(np.float32)
    ex = StreamingExtractor(CFG, frames_per_block=16)
    out = [ex.push(c) for c in np.array_split(x, 7)]
    out.append(ex.flush())
    got = np.concatenate([o for o in out if o.shape[0]], axis=0)
    want = chain.extract_single(x, CFG, backend="jnp")
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_htk_kaldi_export_roundtrip(tmp_path):
    """kaldi_spectrogram features export to HTK (USER kind — no native
    HTK layout for per-bin log pspec) and Kaldi ark, round-tripping
    byte-exact. (parm_kind raised KeyError for the family before r5.)"""
    from mfcc_tpu.io import htk, kaldi

    assert htk.kind_string(htk.parm_kind(CFG)) == "USER"
    feat = RNG.standard_normal((37, CFG.n_bins)).astype(np.float32)
    p = tmp_path / "u.htk"
    htk.write_htk(p, feat, CFG)
    back, kind = htk.read_htk(p)
    np.testing.assert_array_equal(back, feat)
    w = kaldi.ArkWriter(tmp_path / "s")
    w.add("u0", feat)
    w.close()
    got = kaldi.read_ark(tmp_path / "s.ark")
    np.testing.assert_array_equal(got["u0"], feat)


def test_deltas_and_cmvn_compose():
    cfg = CFG.replace(deltas=2, cmvn="utterance")
    assert cfg.feat_dim == 3 * 257
    x = RNG.standard_normal(6400) * 1000
    feat = chain.extract_single(x.astype(np.float32), cfg, backend="jnp")
    want = ref.extract(x, cfg)
    assert feat.shape == want.shape
    np.testing.assert_allclose(feat, want, atol=5e-4, rtol=1e-3)
