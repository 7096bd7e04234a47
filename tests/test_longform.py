"""Long-utterance split/stitch extraction (VERDICT r1 item 2; SURVEY.md §5
long-context row): utterances beyond the largest bucket must come out
frame-exactly equal to a monolithic extraction and match the float64 oracle
at the standard gates — via both library (extract_long) and CLI paths."""

import math

import numpy as np
import pytest

from mfcc_tpu.config import NAMED_CONFIGS
from mfcc_tpu.ops import chain, reference_numpy as ref
from mfcc_tpu.pipeline import extract_long, long_moments, segment_plan
from tests.test_jnp_chain import (
    FEATURE_ATOL_FP32,
    FEATURE_RTOL,
    assert_logmel_close,
)


@pytest.fixture(scope="module")
def long_signal():
    g = np.random.default_rng(7)
    # 61.3 s — not a whole number of segments, exercises the ragged tail
    n = int(16000 * 61.3)
    return (g.standard_normal(n) * 3000).astype(np.float64)


def test_segment_plan_partitions_frames():
    cfg = NAMED_CONFIGS["classic13"]
    S, L = cfg.frame_step, cfg.frame_length
    for n in [16000 * 35 + 123, 400, 401, 160 * 999 + 1, 16000 * 10]:
        segs, F_total = segment_plan(n, cfg, seg_frames=1000)
        assert F_total == cfg.num_frames(n)
        assert sum(s.keep for s in segs) == F_total
        f0 = 0
        for k, s in enumerate(segs):
            assert s.halo == (0 if k == 0 else 1)
            assert s.offset == (f0 - s.halo) * S
            # middle segments never touch the ceil-pad tail
            if k < len(segs) - 1:
                assert s.offset + s.row_len <= n
                assert s.row_len == (s.keep + s.halo - 1) * S + L
            else:
                assert s.offset + s.row_len == n
            f0 += s.keep


@pytest.mark.parametrize(
    "config_name", ["classic13", "classic13_deltas", "logmel80"]
)
def test_long_matches_oracle(config_name, long_signal):
    cfg = NAMED_CONFIGS[config_name]
    got = extract_long(long_signal, cfg, backend="jnp", seg_len_s=10.0)
    want = ref.extract(long_signal, cfg)
    assert got.shape == want.shape
    if cfg.features == "logmel":
        assert_logmel_close(got, want, cfg)
    else:
        np.testing.assert_allclose(
            got, want, atol=FEATURE_ATOL_FP32, rtol=FEATURE_RTOL
        )


def test_long_matches_monolithic(long_signal):
    """Split/stitch vs one-shot extraction of the same signal: identical up
    to cross-program fp32 drift (different padded shapes compile different
    XLA programs; see .claude/skills/verify/SKILL.md)."""
    cfg = NAMED_CONFIGS["classic13_deltas"]
    split = extract_long(long_signal, cfg, backend="jnp", seg_len_s=7.0)
    mono = chain.extract_single(long_signal, cfg, backend="jnp")
    assert split.shape == mono.shape
    np.testing.assert_allclose(split, mono, atol=2e-5, rtol=1e-6)


def test_long_cmvn_utterance(long_signal):
    cfg = NAMED_CONFIGS["classic13_deltas"].replace(cmvn="utterance")
    got = extract_long(long_signal, cfg, backend="jnp")
    want = ref.extract(long_signal, cfg)
    np.testing.assert_allclose(got, want, atol=FEATURE_ATOL_FP32, rtol=1e-4)
    # CMVN property: zero mean / unit variance over all (valid) frames
    np.testing.assert_allclose(got.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(got.var(axis=0), 1.0, atol=1e-2)


def test_long_48k_resample():
    """Resample-first segmentation (the polyphase filter's context forbids
    per-segment resampling)."""
    import scipy.signal

    g = np.random.default_rng(9)
    x48 = (g.standard_normal(48000 * 31) * 3000).astype(np.float64)
    cfg = NAMED_CONFIGS["mfcc39_48k"]
    got = extract_long(x48, cfg, backend="jnp", seg_len_s=10.0)
    want = ref.extract(scipy.signal.resample_poly(x48, 1, 3), cfg)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=FEATURE_ATOL_FP32, rtol=FEATURE_RTOL)


def test_long_44k_resample():
    """The r5 mfcc39_44k config (fractional 160/441 ratio) through the
    longform resample-first split matches the float64 oracle on the
    scipy-resampled signal."""
    import scipy.signal

    g = np.random.default_rng(10)
    x44 = (g.standard_normal(44100 * 23) * 3000).astype(np.float64)
    cfg = NAMED_CONFIGS["mfcc39_44k"]
    got = extract_long(x44, cfg, backend="jnp", seg_len_s=10.0)
    want = ref.extract(scipy.signal.resample_poly(x44, 160, 441), cfg)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=FEATURE_ATOL_FP32, rtol=FEATURE_RTOL)


def test_short_input_takes_normal_path(long_signal):
    """Utterances that fit one segment must go through extract_single
    byte-for-byte (no segmentation overhead or drift)."""
    cfg = NAMED_CONFIGS["classic13_deltas"]
    x = long_signal[: 16000 * 5]
    got = extract_long(x, cfg, backend="jnp", seg_len_s=10.0)
    want = chain.extract_single(x, cfg, backend="jnp")
    np.testing.assert_array_equal(got, want)


def test_long_moments_match_numpy(long_signal):
    cfg = NAMED_CONFIGS["classic13_deltas"]
    feat = extract_long(long_signal, cfg, backend="jnp")
    s1, s2, n = long_moments(feat)
    f64 = feat.astype(np.float64)
    np.testing.assert_allclose(s1, f64.sum(axis=0), rtol=1e-12)
    np.testing.assert_allclose(s2, (f64**2).sum(axis=0), rtol=1e-12)
    assert n == feat.shape[0]


def test_seg_len_invariance(long_signal):
    """The stitched result must not depend on the segment length choice."""
    cfg = NAMED_CONFIGS["classic13"]
    x = long_signal[: int(16000 * 23.7)]
    a = extract_long(x, cfg, seg_len_s=5.0)
    b = extract_long(x, cfg, seg_len_s=9.0)
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-6)


# ---------------------------------------------------------------------------
# Centered framing + drop_last_frame through the SEGMENTED path
# (kernels-prologue twin: pipeline/longform._host_reflect_extend)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "knobs",
    [
        dict(drop_last_frame=True),  # review finding: crashed at stitch
        dict(frame_tail="center"),
        dict(frame_tail="center_reflect"),
        dict(frame_tail="center", drop_last_frame=True),
    ],
    ids=["drop-last", "center", "center-reflect", "center-drop-last"],
)
def test_long_center_and_drop_last_segmented(knobs):
    """Centered framing and drop_last_frame are NOT frame-local; the
    segmented path must stay frame-exact: the host reflect-extension
    rewrites center modes as pad framing on ext, and segment_plan's
    F_total (drop included) governs the stitch while per-ROW extraction
    never drops."""
    from mfcc_tpu.config import named_config

    rng = np.random.default_rng(77)
    cfg = named_config("classic13").replace(**knobs)
    x = (rng.standard_normal(16000 * 7 + 531) * 1000).astype(np.float32)
    want = ref.extract(x.astype(np.float64), cfg)
    got = extract_long(x, cfg, backend="jnp", seg_len_s=2.0)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=FEATURE_ATOL_FP32, rtol=FEATURE_RTOL)


def test_long_center_fp64_exact_and_seg_invariant():
    import jax

    from mfcc_tpu.config import named_config

    rng = np.random.default_rng(78)
    cfg = named_config("kaldi_mfcc").replace(frame_tail="center", dtype="float64")
    with jax.enable_x64(True):
        x = rng.standard_normal(16000 * 9) * 1000
        want = ref.extract(x, cfg)
        for seg_s in (2.0, 3.7):
            got = extract_long(x, cfg, backend="jnp", seg_len_s=seg_s)
            np.testing.assert_allclose(got, want, atol=1e-10, rtol=1e-10)
