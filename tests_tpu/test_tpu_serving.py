"""Real-TPU gates for the online paths added in round 2: the streaming
extractor, the multi-stream serving pool (vmapped blocks), and the 48 kHz
streaming resampler feed — all compiled and run on the actual chip, where
the CPU-pinned suite cannot see TPU-specific fp32/compile behavior."""

import numpy as np
import pytest

from mfcc_tpu.config import NAMED_CONFIGS
from mfcc_tpu.ops import chain
from mfcc_tpu.pipeline.serving import MultiStreamExtractor
from mfcc_tpu.pipeline.streaming import StreamingExtractor

# offline-vs-streaming on the SAME platform: fp32 op-order differences only,
# but TPU matmul tiling differs more between [K,.] and [B,F,.] programs than
# CPU's; 2e-4 is comfortably inside the documented TPU fp32 cepstra floor
ATOL = 2e-4
ATOL_48K = 5e-4  # + fp64-host vs fp32-device resampler difference


def test_streaming_parity_on_tpu(tpu):
    cfg = NAMED_CONFIGS["classic13_deltas"]
    g = np.random.default_rng(11)
    x = g.standard_normal(16000 + 373).astype(np.float32)
    want = chain.extract_single(x, cfg, backend="jnp")
    ex = StreamingExtractor(cfg, frames_per_block=32)
    parts = [ex.push(x[i : i + 1777]) for i in range(0, len(x), 1777)]
    parts.append(ex.flush())
    got = np.concatenate(parts, axis=0)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=ATOL)


def test_serving_pool_on_tpu(tpu):
    cfg = NAMED_CONFIGS["classic13_deltas"]
    g = np.random.default_rng(12)
    xs = [g.standard_normal(n).astype(np.float32) for n in (16373, 7001, 399)]
    pool = MultiStreamExtractor(cfg, n_streams=4, frames_per_block=16)
    sids = [pool.open() for _ in xs]
    for sid, x in zip(sids, xs):
        pool.push(sid, x)
        pool.end(sid)
    got = {sid: [] for sid in sids}
    while pool.n_active:
        for sid, v in pool.poll().items():
            got[sid].append(v)
    for sid, x in zip(sids, xs):
        mine = np.concatenate(got[sid], axis=0)
        want = chain.extract_single(x, cfg, backend="jnp")
        assert mine.shape == want.shape
        np.testing.assert_allclose(mine, want, rtol=0, atol=ATOL)


def test_streaming_48k_on_tpu(tpu):
    cfg = NAMED_CONFIGS["mfcc39_48k"]
    g = np.random.default_rng(13)
    x = g.standard_normal(48000 + 731).astype(np.float32)
    want = chain.extract_single(x, cfg, backend="jnp")
    ex = StreamingExtractor(cfg, frames_per_block=16)
    got = np.concatenate([ex.push(x), ex.flush()], axis=0)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=ATOL_48K)
