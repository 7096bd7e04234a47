"""Multi-stream serving pool: every stream's concatenated poll() output must
equal its own single-stream StreamingExtractor run (which is itself parity-
tested vs the offline chain), under arbitrary interleaving of sessions."""

import numpy as np
import pytest

from mfcc_tpu.config import named_config
from mfcc_tpu.ops import chain
from mfcc_tpu.pipeline.serving import MultiStreamExtractor
from mfcc_tpu.pipeline.streaming import StreamingExtractor

RNG = np.random.default_rng(123)
ATOL = 5e-5  # same fp32 op-order bound as test_streaming.py


def offline(x, cfg):
    return chain.extract_single(np.asarray(x, np.float32), cfg, backend="jnp")


def single_stream(x, cfg, chunks, K):
    ex = StreamingExtractor(cfg, frames_per_block=K)
    parts = [ex.push(c) for c in chunks]
    parts.append(ex.flush())
    return np.concatenate(parts, axis=0)


def chunked(x, sizes_rng, lo=1, hi=2000):
    out, pos = [], 0
    while pos < len(x):
        c = int(min(len(x) - pos, sizes_rng.integers(lo, hi)))
        out.append(x[pos : pos + c])
        pos += c
    return out


@pytest.mark.parametrize("config", ["classic13_deltas", "logmel80"])
def test_pool_matches_single_stream_interleaved(config):
    cfg = named_config(config)
    if cfg.cmvn != "off":
        cfg = cfg.replace(cmvn="off")
    K = 16
    lengths = [16373, 7001, 399, 31999, 16000]
    xs = [RNG.standard_normal(n).astype(np.float32) for n in lengths]
    r = np.random.default_rng(5)
    feeds = [chunked(x, r) for x in xs]

    pool = MultiStreamExtractor(cfg, n_streams=len(xs), frames_per_block=K)
    sids = [pool.open() for _ in xs]
    got = {s: [] for s in sids}
    # round-robin interleave: one chunk per stream per turn, poll each turn
    turn = 0
    while any(feeds):
        for i, f in enumerate(feeds):
            if f:
                pool.push(sids[i], f.pop(0))
                if not f:
                    pool.end(sids[i])
        if turn % 2 == 0:  # poll sometimes mid-feed, sometimes later
            for s, v in pool.poll().items():
                got[s].append(v)
        turn += 1
    while pool.n_active:
        for s, v in pool.poll().items():
            got[s].append(v)

    for i, s in enumerate(sids):
        assert pool.done(s)
        mine = np.concatenate([g for g in got[s]], axis=0)
        want = single_stream(xs[i], cfg, [xs[i]], K)
        assert mine.shape == want.shape, (i, mine.shape, want.shape)
        # same block functions, but vmap compiles a different fp32 op order
        np.testing.assert_allclose(mine, want, rtol=0, atol=ATOL)
        np.testing.assert_allclose(mine, offline(xs[i], cfg), rtol=0, atol=ATOL)


def test_pool_lone_stream_matches_single():
    # the pool runs the SAME jitted block functions vmapped (fp32 op order
    # may differ under vmap, hence allclose rather than bit-equality)
    cfg = named_config("classic13_deltas")
    x = RNG.standard_normal(12345).astype(np.float32)
    pool = MultiStreamExtractor(cfg, n_streams=4, frames_per_block=32)
    sid = pool.open()
    pool.push(sid, x)
    pool.end(sid)
    out = pool.poll()[sid]
    want = single_stream(x, cfg, [x], 32)
    np.testing.assert_allclose(out, want, rtol=0, atol=ATOL)


def test_slot_lifecycle_and_reuse():
    cfg = named_config("classic13")
    pool = MultiStreamExtractor(cfg, n_streams=2, frames_per_block=8)
    a, b = pool.open(), pool.open()
    with pytest.raises(RuntimeError, match="in use"):
        pool.open()
    pool.push(a, RNG.standard_normal(4000).astype(np.float32))
    pool.end(a)
    out = pool.poll()
    assert a in out and out[a].shape[0] == cfg.num_frames(4000)
    assert pool.done(a) and not pool.done(b)
    c = pool.open()  # freed slot reusable, new sid
    assert c not in (a, b)
    pool.close(b)
    assert pool.done(b)
    with pytest.raises(KeyError):
        pool.push(b, np.zeros(10, np.float32))


def test_empty_stream_emits_nothing():
    cfg = named_config("classic13_deltas")
    pool = MultiStreamExtractor(cfg, n_streams=1)
    sid = pool.open()
    pool.end(sid)
    out = pool.poll()
    assert out[sid].shape == (0, cfg.feat_dim)
    assert pool.done(sid)


def test_push_after_end_raises():
    pool = MultiStreamExtractor(named_config("classic13"), n_streams=1)
    sid = pool.open()
    pool.end(sid)
    with pytest.raises(RuntimeError, match="ended"):
        pool.push(sid, np.zeros(10, np.float32))
    with pytest.raises(RuntimeError, match="ended"):
        pool.end(sid)


def test_poll_without_data_is_empty():
    pool = MultiStreamExtractor(named_config("classic13"), n_streams=2)
    pool.open()
    assert pool.poll() == {}


def test_pool_resampled_config():
    # 48 kHz sessions resample per-slot on host; parity vs the offline chain
    cfg = named_config("mfcc39_48k")
    if cfg.cmvn != "off":
        cfg = cfg.replace(cmvn="off")
    x = RNG.standard_normal(48000 + 443).astype(np.float32)
    pool = MultiStreamExtractor(cfg, n_streams=2, frames_per_block=16)
    sid = pool.open()
    pool.push(sid, x[:10000])
    pool.push(sid, x[10000:])
    pool.end(sid)
    parts = []
    while not pool.done(sid):
        out = pool.poll()
        if sid in out:
            parts.append(out[sid])
    got = np.concatenate(parts, axis=0)
    want = offline(x, cfg)
    assert got.shape == want.shape
    from tests.test_streaming import ATOL_48K  # fp64-vs-fp32 resampler gate

    np.testing.assert_allclose(got, want, rtol=0, atol=ATOL_48K)


def test_pool_lifecycle_fuzz():
    # random arrivals/pushes/ends/closes over many rounds with slot churn:
    # every completed stream must match its own single-stream run exactly
    # in shape and at the vmap fp32 bound in values
    cfg = named_config("classic13_deltas")
    K = 8
    r = np.random.default_rng(31)
    pool = MultiStreamExtractor(cfg, n_streams=3, frames_per_block=K)
    live = {}   # sid -> dict(x=list of chunks fed, ended=bool, got=[...])
    finished = {}
    n_spawned = 0
    while n_spawned < 12 or live:
        # maybe admit a new session
        if n_spawned < 12 and pool.n_active < 3 and r.random() < 0.6:
            sid = pool.open()
            live[sid] = {"chunks": [], "got": [], "ended": False}
            n_spawned += 1
        # feed / end random live sessions
        for sid, st in list(live.items()):
            if st["ended"]:
                continue
            act = r.random()
            if act < 0.55:
                c = r.standard_normal(int(r.integers(1, 4000))).astype(np.float32)
                st["chunks"].append(c)
                pool.push(sid, c)
            elif act < 0.75:
                pool.end(sid)
                st["ended"] = True
            elif act < 0.80 and not st["chunks"]:
                pool.close(sid)  # abandoned before any audio
                del live[sid]
        for sid, v in pool.poll().items():
            if sid in live:
                live[sid]["got"].append(v)
        for sid in [s for s in live if pool.done(s)]:
            finished[sid] = live.pop(sid)
    assert len(finished) >= 8
    for sid, st in finished.items():
        got = np.concatenate(st["got"], axis=0) if st["got"] else \
            np.zeros((0, cfg.feat_dim), np.float32)
        x = (np.concatenate(st["chunks"]) if st["chunks"]
             else np.zeros(0, np.float32))
        ex = StreamingExtractor(cfg, frames_per_block=K)
        want = np.concatenate([ex.push(x), ex.flush()], axis=0)
        assert got.shape == want.shape, (sid, got.shape, want.shape)
        np.testing.assert_allclose(got, want, rtol=0, atol=ATOL)


def test_global_cmvn_moments():
    cfg = named_config("classic13_deltas_gcmvn")
    x = RNG.standard_normal(16000).astype(np.float32)
    raw = offline(x, cfg.replace(cmvn="off"))
    s1 = raw.sum(0).astype(np.float64)
    s2 = (raw.astype(np.float64) ** 2).sum(0)
    n = float(raw.shape[0])
    pool = MultiStreamExtractor(cfg, n_streams=2, cmvn_moments=(s1, s2, n))
    sid = pool.open()
    pool.push(sid, x)
    pool.end(sid)
    got = pool.poll()[sid]
    ex = StreamingExtractor(cfg, cmvn_moments=(s1, s2, n), frames_per_block=16)
    want = np.concatenate([ex.push(x), ex.flush()], axis=0)
    np.testing.assert_allclose(got, want, rtol=0, atol=ATOL)


def test_push_backpressure_cap():
    """A session that pushes without polling hits the max_buffer_s cap
    (memory protection); polling drains and push works again."""
    cfg = named_config("classic13")
    pool = MultiStreamExtractor(cfg, n_streams=1, frames_per_block=8,
                                max_buffer_s=0.2)  # 3200 samples
    sid = pool.open()
    pool.push(sid, np.zeros(3000, np.float32))
    with pytest.raises(RuntimeError, match="buffered ahead of poll"):
        pool.push(sid, np.zeros(500, np.float32))
    pool.poll()  # drains complete K=8 blocks (1280 samples each)
    pool.push(sid, np.zeros(500, np.float32))  # below the cap again
    # unlimited by default-None
    pool2 = MultiStreamExtractor(cfg, n_streams=1, max_buffer_s=None)
    s2 = pool2.open()
    pool2.push(s2, np.zeros(200_000, np.float32))
