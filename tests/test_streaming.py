"""Streaming extractor parity: for ANY chunking, concat(push(...)) + flush()
must equal the offline jnp chain (including pad-tail frames and delta edge
replication at the true stream start/end)."""

import numpy as np
import pytest

from mfcc_tpu.config import FrontendConfig, named_config
from mfcc_tpu.ops import chain
from mfcc_tpu.pipeline.streaming import StreamingExtractor, stream_features

RNG = np.random.default_rng(42)
ATOL = 5e-5  # fp32 op-order may differ between [K,·] and [B,F,·] shapes;
# worst observed 2.3e-5 (single-sample stream, near-silent log path) —
# comfortably inside the 1e-4 acceptance gate


def offline(x, cfg):
    return chain.extract_single(np.asarray(x, np.float32), cfg, backend="jnp")


def run_stream(x, cfg, chunks, **kw):
    ex = StreamingExtractor(cfg, **kw)
    parts = []
    pos = 0
    for c in chunks:
        parts.append(ex.push(x[pos : pos + c]))
        pos += c
    assert pos == len(x)
    parts.append(ex.flush())
    return np.concatenate([p for p in parts], axis=0)


def chunkings(n):
    out = [[n]]  # one big push
    out.append([160] * (n // 160) + ([n % 160] if n % 160 else []))  # per-hop
    sizes = []
    left = n
    r = np.random.default_rng(7)
    while left > 0:
        c = int(min(left, r.integers(1, 1900)))
        sizes.append(c)
        left -= c
    out.append(sizes)  # ragged random
    return out


@pytest.mark.parametrize("config", ["classic13", "classic13_deltas", "logmel80"])
def test_parity_all_chunkings(config):
    cfg = named_config(config)
    if cfg.cmvn != "off":
        cfg = cfg.replace(cmvn="off")
    n = 16000 + 373  # odd tail -> partial final frame
    x = RNG.standard_normal(n).astype(np.float32)
    want = offline(x, cfg)
    for chunks in chunkings(n):
        got = run_stream(x, cfg, chunks, frames_per_block=32)
        assert got.shape == want.shape, (got.shape, want.shape, chunks[:3])
        np.testing.assert_allclose(got, want, rtol=0, atol=ATOL)


def test_parity_large_blocks_long_signal():
    cfg = named_config("classic13_deltas")
    n = 16000 * 5 + 11
    x = RNG.standard_normal(n).astype(np.float32)
    want = offline(x, cfg)
    got = run_stream(x, cfg, [4096] * (n // 4096) + [n % 4096],
                     frames_per_block=128)
    np.testing.assert_allclose(got, want, rtol=0, atol=ATOL)


@pytest.mark.parametrize("n", [1, 250, 399, 400, 401, 560, 5359])
def test_parity_short_streams(n):
    # shorter than a frame / exactly one frame / a handful of frames
    cfg = named_config("classic13_deltas")
    x = RNG.standard_normal(n).astype(np.float32)
    want = offline(x, cfg)
    got = run_stream(x, cfg, [n], frames_per_block=16)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=ATOL)


def test_block_smaller_than_lookahead():
    cfg = named_config("classic13_deltas")  # lookahead 4
    n = 16000
    x = RNG.standard_normal(n).astype(np.float32)
    want = offline(x, cfg)
    got = run_stream(x, cfg, [320] * (n // 320), frames_per_block=2)
    np.testing.assert_allclose(got, want, rtol=0, atol=ATOL)


def test_no_deltas_zero_lookahead_emits_promptly():
    cfg = named_config("classic13")
    ex = StreamingExtractor(cfg, frames_per_block=8)
    # one full block span: emits the whole block with no holdback
    span = ex.span
    out = ex.push(RNG.standard_normal(span).astype(np.float32))
    assert out.shape[0] == 8
    ex.flush()


def test_delta_lookahead_holdback():
    cfg = named_config("classic13_deltas")  # lookahead 4
    ex = StreamingExtractor(cfg, frames_per_block=8)
    out = ex.push(RNG.standard_normal(ex.span).astype(np.float32))
    assert out.shape[0] == 8 - 4  # last 4 frames await lookahead


def test_empty_stream():
    cfg = named_config("classic13_deltas")
    ex = StreamingExtractor(cfg)
    out = ex.flush()
    assert out.shape == (0, cfg.feat_dim)


def test_push_after_flush_raises():
    ex = StreamingExtractor(named_config("classic13"))
    ex.flush()
    with pytest.raises(RuntimeError):
        ex.push(np.zeros(100, np.float32))
    with pytest.raises(RuntimeError):
        ex.flush()


def test_utterance_cmvn_rejected():
    cfg = named_config("classic13").replace(cmvn="utterance")
    with pytest.raises(ValueError, match="utterance"):
        StreamingExtractor(cfg)


ATOL_48K = 2.5e-4  # the streaming resampler is float64 (sample-exact vs
# scipy); the offline chain resamples in fp32 on device. The ~1e-7 sample
# difference amplifies through log->DCT->lifter to ~1e-4 on cepstra — well
# inside the measured mfcc39_48k fp32-vs-oracle floor (docs/ACCURACY.md).


@pytest.mark.parametrize("n", [48000 * 2 + 731, 97, 1200])
def test_resample_config_streams(n):
    # 48 kHz input: a streaming polyphase stage (sample-exact vs the offline
    # resampler's scipy semantics) feeds the feature stream
    cfg = named_config("mfcc39_48k")
    x = RNG.standard_normal(n).astype(np.float32)
    want = offline(x, cfg)
    got = run_stream(x, cfg, [1337] * (n // 1337) + ([n % 1337] if n % 1337 else []),
                     frames_per_block=16)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=ATOL_48K)


@pytest.mark.parametrize("n", [44100 + 977, 441])
def test_resample_44k_config_streams(n):
    """mfcc39_44k (fractional 160/441 ratio, r5) through the streaming
    polyphase stage: chunked online == offline."""
    cfg = named_config("mfcc39_44k")
    x = RNG.standard_normal(n).astype(np.float32)
    want = offline(x, cfg)
    got = run_stream(
        x, cfg, [997] * (n // 997) + ([n % 997] if n % 997 else []),
        frames_per_block=16,
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=ATOL_48K)


def test_global_cmvn_moments_applied():
    cfg = named_config("classic13_deltas_gcmvn")
    n = 16000
    x = RNG.standard_normal(n).astype(np.float32)
    raw = offline(x, cfg.replace(cmvn="off"))
    # corpus moments (here: from this utterance, stand-in for the psum)
    s1 = raw.sum(0).astype(np.float64)
    s2 = (raw.astype(np.float64) ** 2).sum(0)
    cnt = float(raw.shape[0])
    got = run_stream(x, cfg, [n], cmvn_moments=(s1, s2, cnt))
    mu = s1 / cnt
    var = s2 / cnt - mu**2
    want = ((raw - mu.astype(np.float32))
            / np.sqrt(var + cfg.cmvn_eps).astype(np.float32))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)


def test_global_cmvn_requires_moments():
    with pytest.raises(ValueError, match="moments"):
        StreamingExtractor(named_config("classic13_deltas_gcmvn"))


def test_stream_features_generator():
    cfg = named_config("classic13_deltas")
    n = 16000
    x = RNG.standard_normal(n).astype(np.float32)
    chunks = [x[i : i + 777] for i in range(0, n, 777)]
    got = np.concatenate(list(stream_features(chunks, cfg,
                                              frames_per_block=32)))
    np.testing.assert_allclose(got, offline(x, cfg), rtol=0, atol=ATOL)


@pytest.mark.parametrize(
    "knobs",
    [
        dict(window="hann_periodic", mel_variant="tf_continuous",
             log_kind="ln_stab", dct_norm="htk", append_energy=False,
             lifter=0, deltas=1),
        dict(window="hamming_periodic"),
        dict(window="hann_sym", dct_norm="htk"),
        dict(log_kind="db", append_energy=False),
        dict(frame_tail="drop"),
        dict(power_scale_nfft=False, lifter=0),
        dict(preemph=0.0),
        dict(features="logmel", n_mels=40, deltas=0),
    ],
)
def test_convention_matrix_streams(knobs):
    # streaming honors every Appendix-C convention knob like the offline
    # chain (pad/drop tail, window/mel/log/DCT variants, energy, lifter)
    cfg = FrontendConfig(deltas=2, **{k: v for k, v in knobs.items()
                                      if k != "deltas"} )
    if "deltas" in knobs:
        cfg = cfg.replace(deltas=knobs["deltas"])
    n = 9000
    x = np.random.default_rng(77).standard_normal(n).astype(np.float32)
    got = run_stream(x, cfg, [1024] * (n // 1024) + [n % 1024],
                     frames_per_block=16)
    want = offline(x, cfg)
    assert got.shape == want.shape
    # db log is ln * 10/ln(10): same relative accuracy, ~4.34x the scale
    atol = ATOL * (10 / np.log(10) if knobs.get("log_kind") == "db" else 1.0)
    np.testing.assert_allclose(got, want, rtol=0, atol=atol)
