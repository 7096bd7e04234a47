"""librosa/Slaney mel lineage + the Whisper log-mel front-end (whisper80).

Unlike the Kaldi family, this lineage HAS an on-disk oracle: the pure-numpy
`transformers.audio_utils` (HF's implementation, certified upstream against
librosa) and `transformers.WhisperFeatureExtractor` (certified upstream
against OpenAI's torch implementation to 1e-5). These tests gate:

  (a) our Slaney scale + Hz-domain filterbank == transformers, exactly;
  (b) the float64 oracle == WhisperFeatureExtractor end-to-end;
  (c) the batched fp32 jnp chain == the oracle at the usual gates,
      including the center_reflect framing map on sub-frame lengths;
  (d) the guards (streaming/kernel/longform routing) for the new knobs.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mfcc_tpu.config import FrontendConfig, named_config
from mfcc_tpu.ops import chain, constants as C, reference_numpy as ref
from mfcc_tpu.pipeline import pad_batch

ta = pytest.importorskip("transformers.audio_utils")

RNG = np.random.default_rng(23)


# ---------------------------------------------------------------------------
# (a) filterbank / scale vs the transformers oracle
# ---------------------------------------------------------------------------


def test_slaney_scale_matches_transformers():
    f = np.linspace(0.0, 8000.0, 2001)
    np.testing.assert_allclose(
        C.hz_to_mel(f, "slaney"), ta.hertz_to_mel(f.copy(), "slaney"),
        rtol=0, atol=1e-12,
    )
    m = np.linspace(0.0, 60.0, 2001)
    np.testing.assert_allclose(
        C.mel_to_hz(m, "slaney"), ta.mel_to_hertz(m.copy(), "slaney"),
        rtol=1e-12, atol=1e-9,
    )
    # round trip + continuity at the 1 kHz / 15 mel knee
    np.testing.assert_allclose(C.mel_to_hz(C.hz_to_mel(f, "slaney"), "slaney"),
                               f, rtol=1e-12, atol=1e-9)
    assert abs(C.hz_to_mel(1000.0, "slaney") - 15.0) < 1e-12
    # htk ≈ kaldi: 2595/ln(10) = 1127.0105, so Kaldi's rounded 1127*ln
    # differs from 2595*log10 by ~9.3e-6 relative — close enough that the
    # filterbanks agree at feature gates, but NOT an identity
    np.testing.assert_allclose(
        C.hz_to_mel(f, "htk"), 1127.0 * np.log(1.0 + f / 700.0),
        rtol=1e-5,
    )


@pytest.mark.parametrize(
    "n_fft,n_mels,lo,hi,scale,norm",
    [
        (400, 80, 0.0, 8000.0, "slaney", "slaney"),  # the Whisper bank
        (512, 26, 0.0, 8000.0, "htk", "none"),
        (512, 40, 20.0, 7600.0, "htk", "slaney"),
        (512, 64, 0.0, 8000.0, "slaney", "none"),
        (1024, 128, 50.0, 7000.0, "slaney", "slaney"),
    ],
)
def test_hz_filterbank_matches_transformers(n_fft, n_mels, lo, hi, scale, norm):
    want = ta.mel_filter_bank(
        num_frequency_bins=n_fft // 2 + 1,
        num_mel_filters=n_mels,
        min_frequency=lo,
        max_frequency=hi,
        sampling_rate=16000,
        norm=None if norm == "none" else norm,
        mel_scale=scale,
    )
    got = C.mel_filterbank_hz(n_mels, n_fft, 16000, lo, hi, scale=scale, norm=norm)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-14)


def test_mel_space_triangles_match_transformers_flag():
    """mel_filterbank_tf's mel-domain slopes == transformers
    triangularize_in_mel_space=True on the same grid (the DC row differs:
    TF zeroes it, HF evaluates the triangle at mel(0) — both are zero
    whenever low_hz > 0, so compare there)."""
    want = ta.mel_filter_bank(
        num_frequency_bins=257, num_mel_filters=23, min_frequency=20.0,
        max_frequency=8000.0, sampling_rate=16000, norm=None,
        mel_scale="kaldi", triangularize_in_mel_space=True,
    )
    got = C.mel_filterbank_tf(23, 512, 16000, 20.0, 8000.0)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-13)


def test_slaney_norm_energy_property():
    """Slaney normalization: each triangle's integral over Hz is ~1
    (2/bandwidth x triangle area bandwidth/2)."""
    fb = C.mel_filterbank_hz(40, 512, 16000, 0.0, 8000.0,
                             scale="slaney", norm="slaney")
    df = 16000 / 512  # bin spacing in Hz
    areas = fb.sum(axis=0) * df
    assert np.all(areas > 0.8) and np.all(areas < 1.2)


# ---------------------------------------------------------------------------
# (b) whisper80 oracle vs WhisperFeatureExtractor
# ---------------------------------------------------------------------------


def _whisper_fe():
    from transformers import WhisperFeatureExtractor

    return WhisperFeatureExtractor()


def test_whisper80_oracle_matches_hf():
    cfg = named_config("whisper80")
    fe = _whisper_fe()
    x = (RNG.standard_normal(16000 * 3) * 0.3).astype(np.float64)
    chunk = np.zeros(fe.n_samples)
    chunk[: x.shape[0]] = x  # the HF pipeline pads to its 30 s chunk
    want = fe._np_extract_fbank_features(chunk[None], "cpu")[0].T  # [3000, 80]
    # HF audio is [-1, 1); the framework's canonical scale is raw int16
    # and whisper80 carries input_scale=1/32768 to bridge them
    got = ref.extract(chunk * 32768.0, cfg)
    assert got.shape == want.shape == (3000, 80)
    # HF stores the fft complex64 — that is ITS precision floor
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_whisper80_oracle_matches_hf_unpadded():
    """Shorter chunks (no 30 s padding) agree too: the reflect tail then
    reflects real samples, exercising both boundary maps."""
    cfg = named_config("whisper80")
    fe = _whisper_fe()
    for n in (16000, 16000 + 373, 799):
        x = (np.random.default_rng(n).standard_normal(n) * 0.5)
        want = fe._np_extract_fbank_features(x[None], "cpu")[0].T
        got = ref.extract(x * 32768.0, cfg)
        assert got.shape == want.shape, (n, got.shape, want.shape)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


# ---------------------------------------------------------------------------
# (c) jnp chain vs oracle (batched, fp32, mixed lengths)
# ---------------------------------------------------------------------------


def test_whisper80_batched_jnp_matches_oracle():
    cfg = named_config("whisper80")
    lens = [16000, 16000 - 373, 801, 450, 250, 16000 * 2 + 7]
    utts = [RNG.standard_normal(n) * 8000.0 for n in lens]  # int16 scale
    b = pad_batch(utts, cfg)
    feat, mask = chain.extract_batch(
        jnp.asarray(b.audio), jnp.asarray(b.lengths), cfg, backend="jnp"
    )
    feat = np.asarray(feat)
    for i, x in enumerate(utts):
        fv = cfg.num_frames(len(x))
        want = ref.extract(x, cfg)
        got = feat[i, :fv]
        assert got.shape == want.shape
        if want.size:
            # whisper features are (log10+4)/4-scaled; 1e-5 is ~1e-4 in
            # log10 units, the standard gate
            np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)
        assert np.all(feat[i, fv:] == 0)  # pad frames zeroed


def test_whisper80_fp64_exact():
    import jax

    cfg = named_config("whisper80").replace(dtype="float64")
    with jax.enable_x64(True):
        for n in (16000 + 137, 450, 799):
            x = np.random.default_rng(n).standard_normal(n) * 8000.0
            want = ref.extract(x, cfg)
            got = chain.extract_single(x, cfg)
            np.testing.assert_allclose(got, want, atol=1e-10, rtol=1e-10)


def test_center_reflect_framing_multi_wrap():
    """Sub-frame signals wrap the reflection several times; the closed-form
    period-2(n-1) map must equal numpy's pad(mode='reflect') exactly."""
    cfg = named_config("whisper80")
    for n in (250, 450, 2, 3):
        x = np.arange(n, dtype=np.float64)
        want = ref.frame_signal(x, cfg.frame_length, cfg.frame_step,
                                "center_reflect")
        F = want.shape[0]
        got = np.asarray(
            chain.frame_signal_centered(
                jnp.asarray(x, jnp.float32)[None], F,
                jnp.asarray([n], np.int32), cfg,
            )
        )[0]
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)


def test_whisper_norm_is_padding_invariant():
    """The max-8 clamp must use the max over VALID frames only: the same
    utterance in different pad contexts yields identical features."""
    cfg = named_config("whisper80")
    x = RNG.standard_normal(16000).astype(np.float32) * 3000.0
    b1 = pad_batch([x], cfg, bucket_len=len(x))
    f1, _ = chain.extract_batch(jnp.asarray(b1.audio), jnp.asarray(b1.lengths), cfg)
    loud = RNG.standard_normal(16000 * 2).astype(np.float32) * 30000.0
    b2 = pad_batch([x, loud], cfg, bucket_len=len(loud))
    f2, _ = chain.extract_batch(jnp.asarray(b2.audio), jnp.asarray(b2.lengths), cfg)
    fv = cfg.num_frames(len(x))
    np.testing.assert_allclose(
        np.asarray(f1)[0, :fv], np.asarray(f2)[0, :fv], rtol=0, atol=2e-6
    )


# ---------------------------------------------------------------------------
# (d) guards + counts + goldens
# ---------------------------------------------------------------------------


def test_whisper80_golden_parity():
    from mfcc_tpu.testing.golden import load_golden

    cfg = named_config("whisper80")
    for name in ("noise", "speechish", "chirp", "tone_bin", "zeros"):
        g = load_golden("whisper80", name)
        got = chain.extract_single(g["signal"].astype(np.float32), cfg)
        # 5e-5 in (log10+4)/4 units = 2e-4 log10 units: the chirp's quiet
        # bins sit at the max-8 clamp boundary, where fp32 rounding flips
        # which side a bin lands on (the clamp BOUNDS the error — measured
        # worst case 2.5e-5)
        np.testing.assert_allclose(
            got, g["features"], rtol=0, atol=5e-5, err_msg=name
        )


def test_num_frames_center_reflect_and_drop_last():
    cfg = named_config("whisper80")
    L, S = cfg.frame_length, cfg.frame_step
    for n in (480000, 16000, 400, 401, 123, 1, 0):
        base = 1 + (n + 2 * (L // 2) - L) // S if n > 0 else 0
        assert cfg.num_frames(n) == max(0, base - 1), n
    # HF count on its 30 s chunk: 3001 frames - 1 dropped = 3000
    assert cfg.num_frames(30 * 16000) == 3000
    nodrop = cfg.replace(drop_last_frame=False)
    assert nodrop.num_frames(30 * 16000) == 3001
    # drop_last_frame composes with other tails too
    assert FrontendConfig(drop_last_frame=True).num_frames(16000) == \
        FrontendConfig().num_frames(16000) - 1


def test_guards():
    cfg = named_config("whisper80")
    # center_reflect is kernel-eligible via the reflect-extension prologue
    assert chain.pallas_unsupported_reason(cfg) is None
    from mfcc_tpu.pipeline import StreamingExtractor

    with pytest.raises(ValueError):
        StreamingExtractor(cfg)
    with pytest.raises(ValueError):  # whisper norm needs features=logmel
        FrontendConfig(logmel_norm="whisper")
    with pytest.raises(ValueError):
        FrontendConfig(mel_scale="mel")  # unknown scale


def test_longform_routes_whisper_through_whole_length():
    """logmel_norm (global max) + center_reflect (global edges) must take
    the whole-length path — features equal the one-shot extraction."""
    from mfcc_tpu.pipeline.longform import extract_long

    cfg = named_config("whisper80")
    x = (RNG.standard_normal(16000 * 12) * 5000.0).astype(np.float32)
    want = ref.extract(x.astype(np.float64), cfg)
    got = extract_long(x, cfg, backend="jnp", seg_len_s=4.0)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_extract_auto_backend_whisper(tmp_path):
    """Top-level extract() falls back to jnp for whisper80 and matches HF."""
    import scipy.io.wavfile

    import mfcc_tpu

    fe = _whisper_fe()
    x = (RNG.standard_normal(16000 * 2) * 0.2).astype(np.float32)
    chunk = np.zeros(fe.n_samples, dtype=np.float32)
    chunk[: x.shape[0]] = x
    p = tmp_path / "x.wav"
    scipy.io.wavfile.write(p, 16000, (chunk * 32767).astype(np.int16))
    got = mfcc_tpu.extract(str(p), "whisper80")
    pcm = (chunk * 32767).astype(np.int16).astype(np.float64) / 32768.0
    want = fe._np_extract_fbank_features(pcm[None], "cpu")[0].T
    assert got.shape == want.shape == (3000, 80)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


def test_whisper80_pallas_matches_jnp():
    """center_reflect + whisper norm through the fused kernel: the reflect-
    extension prologue (kernels/frontend._reflect_extend) must reproduce the
    per-utterance reflection gather exactly, including multi-wrap rows."""
    cfg = named_config("whisper80")
    lens = [16000 * 2, 16000 - 373, 801, 250, 90]
    utts = [RNG.standard_normal(n) * 8000.0 for n in lens]
    b = pad_batch(utts, cfg)
    fj, mj = chain.extract_batch(
        jnp.asarray(b.audio), jnp.asarray(b.lengths), cfg, backend="jnp"
    )
    fp_, mp_ = chain.extract_batch(
        jnp.asarray(b.audio), jnp.asarray(b.lengths), cfg, backend="pallas"
    )
    np.testing.assert_array_equal(np.asarray(mj), np.asarray(mp_))
    np.testing.assert_allclose(
        np.asarray(fp_), np.asarray(fj), rtol=0, atol=5e-5
    )


@pytest.mark.parametrize(
    "cfg",
    [
        FrontendConfig(frame_tail="center"),  # Kaldi snip_edges=false
        FrontendConfig(frame_tail="center_reflect", deltas=2),
        FrontendConfig(frame_tail="center", preemph=0.0, features="logmel",
                       append_energy=False, lifter=0),
    ],
    ids=["kaldi-center", "reflect-deltas", "center-logmel"],
)
def test_center_modes_pallas_matches_jnp(cfg):
    lens = [16000, 801, 250, 90]
    utts = [RNG.standard_normal(n) * 8000.0 for n in lens]
    b = pad_batch(utts, cfg)
    fj, _ = chain.extract_batch(
        jnp.asarray(b.audio), jnp.asarray(b.lengths), cfg, backend="jnp"
    )
    fp_, _ = chain.extract_batch(
        jnp.asarray(b.audio), jnp.asarray(b.lengths), cfg, backend="pallas"
    )
    np.testing.assert_allclose(
        np.asarray(fp_), np.asarray(fj), rtol=2e-3, atol=5e-4
    )
