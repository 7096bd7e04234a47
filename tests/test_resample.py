"""Polyphase resampler vs scipy.signal.resample_poly (the on-disk ground
truth, SP _signaltools.py:3866), plus the full 48 kHz end-to-end config."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mfcc_tpu.config import NAMED_CONFIGS
from mfcc_tpu.ops import chain, resample
from mfcc_tpu.pipeline import pad_batch
from mfcc_tpu.testing.golden import load_golden
from tests.test_jnp_chain import FEATURE_ATOL_FP32, FEATURE_RTOL


@pytest.mark.parametrize(
    "sr_in,sr_out,n",
    [
        (48000, 16000, 48123),  # BASELINE config #5 ratio
        (8000, 16000, 8001),  # upsampling
        (44100, 16000, 44100),  # fractional (160/441)
        (22050, 16000, 10007),
    ],
)
def test_matches_scipy_float64(sr_in, sr_out, n):
    g = np.random.default_rng(3)
    x = g.standard_normal(n)
    want = resample.resample_numpy(x, sr_in, sr_out)
    with jax.enable_x64(True):
        got = np.asarray(resample.resample_batch(jnp.asarray(x), sr_in, sr_out))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_matches_scipy_float32():
    g = np.random.default_rng(4)
    x = g.standard_normal(48000)
    want = resample.resample_numpy(x, 48000, 16000)
    got = np.asarray(resample.resample_batch(jnp.asarray(x, jnp.float32), 48000, 16000))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_padded_batch_invariance():
    """Rows of a zero-padded batch resample to the same values as alone."""
    g = np.random.default_rng(5)
    a = g.standard_normal(30000)
    b = g.standard_normal(48000)
    batch = np.zeros((2, 48000), dtype=np.float32)
    batch[0, :30000] = a
    batch[1] = b
    out = np.asarray(resample.resample_batch(jnp.asarray(batch), 48000, 16000))
    alone = np.asarray(
        resample.resample_batch(jnp.asarray(np.pad(a, (0, 18000)), jnp.float32)[None],
                                48000, 16000)
    )
    n_a = resample.output_length(30000, 48000, 16000)
    np.testing.assert_array_equal(out[0], alone[0])
    # valid region matches scipy on the un-padded signal
    want = resample.resample_numpy(a, 48000, 16000)
    np.testing.assert_allclose(out[0, :n_a], want, atol=1e-5)


def test_output_lengths_traced_matches_host():
    lens = jnp.asarray([0, 1, 3, 47999, 48000, 48001])
    got = np.asarray(resample.output_lengths(lens, 48000, 16000))
    want = [resample.output_length(int(n), 48000, 16000) for n in np.asarray(lens)]
    np.testing.assert_array_equal(got, want)


def test_mfcc39_48k_end_to_end():
    """Full 48 kHz chain (BASELINE config #5): 48 kHz audio in, 39-dim
    MFCC+Δ+ΔΔ out, matching the golden (scipy-resample + fp64 oracle)."""
    cfg = NAMED_CONFIGS["mfcc39_48k"]
    for sname in ("speechish", "noise", "tone_offbin"):
        g = load_golden("mfcc39_48k", sname)
        feat = chain.extract_single(g["signal_input"], cfg)
        assert feat.shape == g["features"].shape
        # atol 8e-4 (vs the usual 5e-4): the blocked-matmul resampler's
        # W~450-term fp32 reductions move this config's measured CPU floor
        # from 4.1e-4 to 6.8e-4 (scripts/accuracy_report.py; the fp64-
        # epilogue variant is identical, so the residual originates in the
        # resampled spectrum's summation order, not the epilogue) — the
        # price of a ~25x resample-stage speedup. The float64 path still
        # certifies the algebra at 1e-15 (test_matches_scipy_fp64), and
        # the TPU floor (docs/ACCURACY.md) is unchanged at ~1.4e-3.
        np.testing.assert_allclose(
            feat, g["features"], atol=8e-4, rtol=2e-5
        )


def test_mfcc39_48k_pallas_backend():
    """48 kHz input through XLA resample + fused Pallas kernel (interpret
    mode) matches the golden."""
    cfg = NAMED_CONFIGS["mfcc39_48k"]
    g = load_golden("mfcc39_48k", "speechish")
    feat = chain.extract_single(g["signal_input"], cfg, backend="pallas")
    np.testing.assert_allclose(
        feat, g["features"], atol=FEATURE_ATOL_FP32, rtol=1e-3
    )


def test_mfcc39_48k_batched():
    cfg = NAMED_CONFIGS["mfcc39_48k"]
    gs = [load_golden("mfcc39_48k", n) for n in ("speechish", "short")]
    sigs = [g["signal_input"] for g in gs]
    b = pad_batch(sigs, cfg, bucket_len=max(s.shape[0] for s in sigs))
    feat, mask = chain.extract_batch(jnp.asarray(b.audio), jnp.asarray(b.lengths), cfg)
    feat = np.asarray(feat)
    for i, g in enumerate(gs):
        fv = g["features"].shape[0]
        np.testing.assert_allclose(
            feat[i, :fv], g["features"], atol=FEATURE_ATOL_FP32, rtol=FEATURE_RTOL
        )
        assert int(np.asarray(mask)[i].sum()) == fv


# -- StreamingResampler ------------------------------------------------------

def test_streaming_resampler_sample_exact():
    from mfcc_tpu.ops.resample import StreamingResampler, resample_numpy

    g = np.random.default_rng(0)
    r = np.random.default_rng(1)
    for sr_in, sr_out in [(48000, 16000), (44100, 16000), (8000, 16000)]:
        for n in [1, 37, 48001]:
            x = g.standard_normal(n)
            want = resample_numpy(x, sr_in, sr_out)
            for one_push in (True, False):
                rs = StreamingResampler(sr_in, sr_out, dtype=np.float64)
                parts = []
                if one_push:
                    parts.append(rs.push(x))
                else:
                    pos = 0
                    while pos < n:
                        c = int(min(n - pos, r.integers(1, 3000)))
                        parts.append(rs.push(x[pos : pos + c]))
                        pos += c
                parts.append(rs.flush())
                got = np.concatenate(parts)
                assert got.shape == want.shape
                np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_streaming_resampler_lifecycle():
    from mfcc_tpu.ops.resample import StreamingResampler

    rs = StreamingResampler(48000, 16000)
    assert rs.flush().shape == (0,)
    with pytest.raises(RuntimeError):
        rs.push(np.zeros(10))
    with pytest.raises(ValueError):
        StreamingResampler(16000, 16000)
    # samples_out tracks EMITTED samples, including flush's truncated block
    rs = StreamingResampler(48000, 16000)
    n = len(rs.push(np.zeros(4801)))
    n += len(rs.flush())
    assert n == 1601 and rs.samples_out == 1601
    # the polyphase design is shared, not rebuilt per instance
    a, b = StreamingResampler(48000, 16000), StreamingResampler(48000, 16000)
    assert a.M is b.M and not a.M.flags.writeable


def test_streaming_resampler_properties():
    from mfcc_tpu.ops.resample import StreamingResampler

    # linearity and tone preservation through the streaming path: a 1 kHz
    # tone at 48 kHz resampled to 16 kHz stays a 1 kHz tone (interior
    # samples; edges carry the filter transient)
    sr_in, sr_out, f0 = 48000, 16000, 1000.0
    t_in = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * f0 * t_in)
    rs = StreamingResampler(sr_in, sr_out, dtype=np.float64)
    y = np.concatenate([rs.push(x), rs.flush()])
    t_out = np.arange(y.shape[0]) / sr_out
    want = np.sin(2 * np.pi * f0 * t_out)
    interior = slice(100, -100)
    # bound = the scipy kaiser(5.0) design's own passband ripple (~1e-3);
    # sample-exactness vs scipy itself is tested above
    np.testing.assert_allclose(y[interior], want[interior], atol=2.5e-3)
    # linearity: resample(a*x1 + x2) == a*resample(x1) + resample(x2)
    g = np.random.default_rng(2)
    x1, x2 = g.standard_normal(9731), g.standard_normal(9731)

    def run(sig):
        r = StreamingResampler(sr_in, sr_out, dtype=np.float64)
        return np.concatenate([r.push(sig), r.flush()])

    np.testing.assert_allclose(
        run(3.0 * x1 + x2), 3.0 * run(x1) + run(x2), rtol=0, atol=1e-10
    )


def test_pallas_kernel_matches_xla_path():
    """The VMEM-slab resample kernel (interpret mode here) must agree with
    the blocked-matmul XLA path — same banded matrix, same fp32 matmul
    class — and with scipy in the sample domain."""
    import scipy.signal

    from mfcc_tpu.ops import resample

    g = np.random.default_rng(7)
    for n in (48000, 480000 // 4, 1234):
        x = (g.standard_normal((3, n)) * 3000).astype(np.float32)
        a = np.asarray(resample.resample_batch(
            jnp.asarray(x), 48000, 16000, method="pallas"))
        b = np.asarray(resample.resample_batch(
            jnp.asarray(x), 48000, 16000, method="xla"))
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-6)  # fp32 order
        want = scipy.signal.resample_poly(x[0].astype(np.float64), 1, 3)
        np.testing.assert_allclose(a[0], want, atol=2e-3, rtol=1e-5)


def test_pallas_kernel_gating():
    """Non-applicable designs raise under method='pallas' and silently use
    XLA under 'auto' (44.1 kHz is a rational ratio -> up=160)."""
    from mfcc_tpu.kernels import resample as K
    from mfcc_tpu.ops import resample

    assert K.applicable(1, 3, 480000, jnp.float32)
    assert not K.applicable(160, 441, 480000, jnp.float32)
    assert not K.applicable(1, 3, 480000, jnp.float64)
    x = jnp.asarray(np.zeros((1, 44100), np.float32))
    with pytest.raises(ValueError, match="not applicable"):
        resample.resample_batch(x, 44100, 16000, method="pallas")
    y = resample.resample_batch(x, 44100, 16000)  # auto -> xla, no raise
    assert y.shape[-1] == resample.output_length(44100, 44100, 16000)


def test_pallas_kernel_edges_and_budget():
    """Edge lengths around block boundaries, and the VMEM-budget fallback
    for long inputs (auto must silently use XLA, not fail)."""
    import scipy.signal

    from mfcc_tpu.kernels import resample as K
    from mfcc_tpu.ops import resample

    g = np.random.default_rng(9)
    # around one 128-output block (384 input samples) and sub-block sizes
    for n in (1, 2, 3, 383, 384, 385, 49152, 49153):
        x = (g.standard_normal((1, n)) * 100).astype(np.float32)
        got = np.asarray(resample.resample_batch(
            jnp.asarray(x), 48000, 16000, method="pallas"))[0]
        want = scipy.signal.resample_poly(x[0].astype(np.float64), 1, 3)
        assert got.shape == want.shape, (n, got.shape, want.shape)
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)
    # 60 s at 48 kHz exceeds the slab budget -> not applicable, auto falls
    # back to the XLA path with identical semantics
    n60 = 48000 * 60
    assert not K.applicable(1, 3, n60, jnp.float32)
    x = np.zeros((1, n60), np.float32)
    x[0, :100] = 1000.0
    y = np.asarray(resample.resample_batch(jnp.asarray(x), 48000, 16000))
    assert y.shape[-1] == resample.output_length(n60, 48000, 16000)
    want = scipy.signal.resample_poly(x[0].astype(np.float64), 1, 3)
    np.testing.assert_allclose(y[0], want, atol=1e-4)


def test_high_decimation_and_empty_input():
    """Regression (review findings): >=7x integer decimations (halo E =
    20*down+1 > 128) use the wide-halo kernel variant without crashing,
    and zero-length input returns an empty array on every path."""
    import scipy.signal

    from mfcc_tpu.kernels import resample as K
    from mfcc_tpu.ops import resample

    # 192k -> 16k: up=1, down=12, E = 241 (> one lane register): the
    # kernel's full-row halo dot handles it; parity vs scipy holds
    assert K.applicable(1, 12, 192000, jnp.float32)
    g = np.random.default_rng(11)
    x = (g.standard_normal((1, 192000)) * 100).astype(np.float32)
    want = scipy.signal.resample_poly(x[0].astype(np.float64), 1, 12)
    for method in ("pallas", "xla"):
        y = np.asarray(resample.resample_batch(
            jnp.asarray(x), 192000, 16000, method=method))
        assert y.shape[-1] == want.shape[0]
        np.testing.assert_allclose(y[0], want, atol=1e-4)

    # zero-length input: n_out = 0, no crash, any method
    for method in ("auto", "xla"):
        z = resample.resample_batch(
            jnp.zeros((2, 0), jnp.float32), 48000, 16000, method=method
        )
        assert z.shape == (2, 0)
    assert not K.applicable(1, 3, 0, jnp.float32)


# -- Blocked feed layout (the zero-relayout device fast path) ----------------

def test_blocked_layout_geometry():
    """Layout invariants across rate pairs: aligned origin, one-block halo,
    capacity covers pad_lo + n_in, and step/J match the stream design."""
    from mfcc_tpu.ops.resample import blocked_layout

    for sr_in, sr_out, n in [
        (48000, 16000, 480000),
        (48000, 16000, 48123),
        (8000, 16000, 8001),
        (44100, 16000, 44100),
        (22050, 16000, 10007),
    ]:
        lay = blocked_layout(sr_in, sr_out, n)
        assert lay is not None, (sr_in, sr_out)
        assert 0 < lay.E <= lay.step
        assert lay.step * lay.up == lay.J * lay.down
        assert lay.n_sup * lay.step - lay.pad_lo >= n
        assert lay.n_blk * lay.J >= lay.n_out
        assert lay.buffer_shape == (lay.n_sup, lay.step)
    assert blocked_layout(16000, 16000, 100) is None
    assert blocked_layout(48000, 16000, 0) is None


def test_layout_for_shape_roundtrip():
    from mfcc_tpu.ops.resample import blocked_layout, layout_for_shape

    lay = blocked_layout(48000, 16000, 480000)
    rec = layout_for_shape(48000, 16000, lay.n_sup, lay.step)
    assert (rec.up, rec.down, rec.J, rec.step, rec.E, rec.pad_lo) == (
        lay.up, lay.down, lay.J, lay.step, lay.E, lay.pad_lo
    )
    assert rec.n_blk == lay.n_sup - 1 and rec.n_out == rec.n_blk * rec.J
    with pytest.raises(ValueError, match="not a blocked layout"):
        layout_for_shape(48000, 16000, lay.n_sup, lay.step + 1)


@pytest.mark.parametrize(
    "sr_in,sr_out,n",
    [(48000, 16000, 480000), (48000, 16000, 48123), (8000, 16000, 8001),
     (44100, 16000, 44100)],
)
def test_resample_blocked_matches_flat(sr_in, sr_out, n):
    """Blocked two-dot resample is BIT-IDENTICAL to the flat XLA path (the
    host layout holds exactly what the flat path's device pad builds, and
    the dot algebra is unchanged)."""
    from mfcc_tpu.ops.resample import (
        blocked_layout, resample_blocked, to_blocked_numpy,
    )

    g = np.random.default_rng(13)
    x = g.standard_normal((3, n)).astype(np.float32)
    lay = blocked_layout(sr_in, sr_out, n)
    xb = to_blocked_numpy(x, lay)
    assert xb.shape == (3,) + lay.buffer_shape
    y = np.asarray(resample_blocked(jnp.asarray(xb), lay))
    assert y.shape == (3, lay.n_blk, lay.J)
    flat = y.reshape(3, -1)[:, : lay.n_out]
    want = np.asarray(
        resample.resample_batch(jnp.asarray(x), sr_in, sr_out, method="xla")
    )
    np.testing.assert_array_equal(flat, want)
    # and scale folding is exact reordering-free scaling of the taps
    ys = np.asarray(resample_blocked(jnp.asarray(xb), lay, scale=0.5))
    np.testing.assert_allclose(
        ys.reshape(3, -1)[:, : lay.n_out], 0.5 * want, rtol=1e-6, atol=1e-7
    )


def test_blocked_pad_batch_extract_parity():
    """pad_batch(layout=...) + extract_batch(jnp) == flat path on valid
    frames, for full and partial rows."""
    from mfcc_tpu.pipeline import resample_layout

    cfg = NAMED_CONFIGS["mfcc39_48k"]
    g = np.random.default_rng(17)
    sigs = [g.standard_normal(48000).astype(np.float32),
            g.standard_normal(30011).astype(np.float32)]
    blen = 48000
    flat = pad_batch(sigs, cfg, bucket_len=blen)
    lay = resample_layout(cfg, blen)
    assert lay is not None
    blk = pad_batch(sigs, cfg, bucket_len=blen, layout=lay)
    assert blk.audio.shape == (2, lay.n_sup, lay.step)
    f_flat, m_flat = chain.extract_batch(
        jnp.asarray(flat.audio), jnp.asarray(flat.lengths), cfg
    )
    f_blk, m_blk = chain.extract_batch(
        jnp.asarray(blk.audio), jnp.asarray(blk.lengths), cfg
    )
    nv_flat = np.asarray(m_flat).sum(axis=1).astype(int)
    nv_blk = np.asarray(m_blk).sum(axis=1).astype(int)
    np.testing.assert_array_equal(nv_flat, nv_blk)
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(f_blk)[i, : nv_blk[i]],
            np.asarray(f_flat)[i, : nv_flat[i]],
            atol=1e-5, rtol=1e-5,
        )


def test_blocked_pallas_seam_matches_jnp():
    """The fused resample->chunk-slab->frontend seam (pallas backend,
    interpret mode off-TPU) matches the jnp twin on valid frames."""
    from mfcc_tpu.pipeline import resample_layout

    cfg = NAMED_CONFIGS["mfcc39_48k"]
    g = np.random.default_rng(19)
    sigs = [g.standard_normal(48000).astype(np.float32),
            g.standard_normal(24001).astype(np.float32)]
    blen = 48000
    lay = resample_layout(cfg, blen)
    blk = pad_batch(sigs, cfg, bucket_len=blen, layout=lay)
    a, l = jnp.asarray(blk.audio), jnp.asarray(blk.lengths)
    f_jnp, m = chain.extract_batch(a, l, cfg, backend="jnp")
    f_pal, m2 = chain.extract_batch(a, l, cfg, backend="pallas")
    nv = np.asarray(m).sum(axis=1).astype(int)
    np.testing.assert_array_equal(nv, np.asarray(m2).sum(axis=1).astype(int))
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(f_pal)[i, : nv[i]], np.asarray(f_jnp)[i, : nv[i]],
            atol=FEATURE_ATOL_FP32, rtol=1e-3,
        )


def test_blocked_seam_input_scale():
    """input_scale folds into the resample taps on the fused seam path:
    pallas blocked == jnp flat with the same scale."""
    from mfcc_tpu.pipeline import resample_layout

    cfg = NAMED_CONFIGS["mfcc39_48k"].replace(input_scale=1.0 / 32768.0)
    g = np.random.default_rng(23)
    sig = (g.standard_normal(48000) * 3000).astype(np.float32)
    blen = 48000
    lay = resample_layout(cfg, blen)
    blk = pad_batch([sig], cfg, bucket_len=blen, layout=lay)
    flat = pad_batch([sig], cfg, bucket_len=blen)
    f_ref, m = chain.extract_batch(
        jnp.asarray(flat.audio), jnp.asarray(flat.lengths), cfg
    )
    f_blk, m2 = chain.extract_batch(
        jnp.asarray(blk.audio), jnp.asarray(blk.lengths), cfg,
        backend="pallas",
    )
    nv = int(np.asarray(m)[0].sum())
    np.testing.assert_allclose(
        np.asarray(f_blk)[0, :nv], np.asarray(f_ref)[0, :nv],
        atol=FEATURE_ATOL_FP32, rtol=1e-3,
    )


def test_blocked_feed_stream_batches():
    """stream_batches emits blocked batches for resampling configs and the
    features match the flat per-utterance path."""
    import tempfile, pathlib
    from mfcc_tpu.io import wav

    cfg = NAMED_CONFIGS["mfcc39_48k"]
    g = np.random.default_rng(29)
    with tempfile.TemporaryDirectory() as td:
        paths = []
        for i, n in enumerate((48000, 30011)):
            p = pathlib.Path(td) / f"u{i}.wav"
            pcm = (g.standard_normal(n) * 3000).astype(np.int16)
            wav.write_wav(str(p), 48000, pcm)
            paths.append(str(p))
        from mfcc_tpu.io import stream_batches

        batches = list(stream_batches(paths, cfg, batch_size=2, max_len_s=1.0))
        assert len(batches) >= 1
        b = batches[0]
        assert b.audio.ndim == 3  # blocked layout engaged
        feat, mask = chain.extract_batch(
            jnp.asarray(b.audio), jnp.asarray(b.lengths), cfg
        )
        # per-utterance reference through the flat single path
        order = [b.ids.index(p) for p in b.ids if p is not None]
        for row, pid in enumerate(b.ids):
            if pid is None:
                continue
            sr, x = wav.read_wav(pid)
            ref = chain.extract_single(x, cfg)
            nv = int(np.asarray(mask)[row].sum())
            assert nv == ref.shape[0]
            np.testing.assert_allclose(
                np.asarray(feat)[row, :nv], ref, atol=2e-4, rtol=1e-4
            )


# -- In-kernel fused resample slab (r5: ResampleSlabLayout) ------------------

def test_resample_slab_layout_geometry():
    """Invariants of the in-kernel fused resample layout: lane width is one
    polyphase step per frame hop, one halo row, capacity covers the input,
    and None where the design can't block at J = hop or the config is
    centered/non-fp32."""
    from mfcc_tpu.kernels.frontend import resample_slab_layout

    for name, n in [("mfcc39_48k", 480000), ("mfcc39_48k", 48123),
                    ("mfcc39_44k", 441000), ("mfcc39_44k", 100001)]:
        cfg = NAMED_CONFIGS[name]
        lay = resample_slab_layout(cfg, n)
        assert lay is not None, (name, n)
        d = resample.slab_design(
            cfg.input_sample_rate, cfg.sample_rate, cfg.frame_step,
            cfg.input_scale,
        )
        assert lay.chunk == d["step"]
        assert lay.flat_offset == lay.pro * lay.chunk + d["pad_lo"]
        # capacity: the flat stream holds pad_lo + n input samples
        assert lay.n_rows * lay.chunk - lay.flat_offset >= n
        assert lay.num_frames == NAMED_CONFIGS[name].num_frames(
            resample.output_length(n, cfg.input_sample_rate, cfg.sample_rate)
        )
    # no resampling -> no layout
    assert resample_slab_layout(NAMED_CONFIGS["classic13"], 16000) is None
    # centered framing is host-conditioned flat; no rs slab
    c = NAMED_CONFIGS["whisper80"].replace(input_sample_rate=48000)
    assert resample_slab_layout(c, 48000) is None


@pytest.mark.parametrize("name,n", [("mfcc39_48k", 480000),
                                    ("mfcc39_44k", 441000)])
def test_resample_slab_extract_parity(name, n):
    """Fused in-kernel resample (blocked sr_in PCM -> log-mel in ONE
    kernel) == the flat jnp twin on valid frames, for both rate families
    and a short second utterance."""
    from mfcc_tpu.pipeline import device_layout

    cfg = NAMED_CONFIGS[name]
    g = np.random.default_rng(67)
    sigs = [(g.standard_normal(n) * 3000).astype(np.int16).astype(np.float32),
            (g.standard_normal(n // 4 + 13) * 3000).astype(np.int16)
            .astype(np.float32)]
    lay = device_layout(cfg, n)
    assert type(lay).__name__ == "ResampleSlabLayout", lay
    slab = pad_batch(sigs, cfg, bucket_len=n, layout=lay)
    # 44.1 kHz rs shapes also parse as BlockedLayout -> "auto" refuses;
    # layout-aware callers pass the batch's kind (the production pattern)
    f_rs, m_rs = chain.extract_batch(
        jnp.asarray(slab.audio), jnp.asarray(slab.lengths), cfg,
        backend="pallas", input_layout=slab.layout_kind,
    )
    flat = pad_batch(sigs, cfg, bucket_len=n)
    f_jn, m_jn = chain.extract_batch(
        jnp.asarray(flat.audio), jnp.asarray(flat.lengths), cfg,
        backend="jnp",
    )
    nv = np.asarray(m_jn).sum(axis=1).astype(int)
    np.testing.assert_array_equal(nv, np.asarray(m_rs).sum(axis=1).astype(int))
    for i in range(len(sigs)):
        np.testing.assert_allclose(
            np.asarray(f_rs)[i, : nv[i]], np.asarray(f_jn)[i, : nv[i]],
            atol=1e-3, rtol=2e-3, err_msg=f"{name} utt{i}",
        )


def test_resample_slab_upsampling_8k():
    """The UPSAMPLING direction (8 kHz -> 16 kHz, up=2) through the
    in-kernel fused resample: device_layout routes it to the rs slab
    (step = hop*down/up = 80, unambiguous), parity vs the flat jnp twin."""
    from mfcc_tpu.pipeline import device_layout

    cfg = NAMED_CONFIGS["classic13_deltas"].replace(input_sample_rate=8000)
    g = np.random.default_rng(137)
    sigs = [(g.standard_normal(8000) * 3000).astype(np.int16)
            .astype(np.float32),
            (g.standard_normal(3001) * 3000).astype(np.int16)
            .astype(np.float32)]
    lay = device_layout(cfg, 8000)
    assert type(lay).__name__ == "ResampleSlabLayout" and lay.chunk == 80
    slab = pad_batch(sigs, cfg, bucket_len=8000, layout=lay)
    f_rs, m_rs = chain.extract_batch(
        jnp.asarray(slab.audio), jnp.asarray(slab.lengths), cfg,
        backend="pallas", input_layout=slab.layout_kind,
    )
    flat = pad_batch(sigs, cfg, bucket_len=8000)
    f_jn, m_jn = chain.extract_batch(
        jnp.asarray(flat.audio), jnp.asarray(flat.lengths), cfg,
        backend="jnp",
    )
    nv = np.asarray(m_jn).sum(axis=1).astype(int)
    np.testing.assert_array_equal(nv, np.asarray(m_rs).sum(axis=1).astype(int))
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(f_rs)[i, : nv[i]], np.asarray(f_jn)[i, : nv[i]],
            atol=1e-3, rtol=2e-3, err_msg=f"utt{i}",
        )
    # i16 slab bitwise, upsampling direction
    f_i16, _ = chain.extract_batch(
        jnp.asarray(np.asarray(slab.audio).astype(np.int16)),
        jnp.asarray(slab.lengths), cfg, backend="pallas",
        input_layout=slab.layout_kind,
    )
    np.testing.assert_array_equal(np.asarray(f_i16), np.asarray(f_rs))


def test_resample_slab_i16_bitwise():
    """int16 rs slabs (raw PCM; input_scale rides the taps) are bit-
    identical to fp32 rs slabs of the same values."""
    from mfcc_tpu.pipeline import device_layout

    cfg = NAMED_CONFIGS["mfcc39_48k"]
    g = np.random.default_rng(71)
    sigs = [(g.standard_normal(96000) * 3000).astype(np.int16)]
    lay = device_layout(cfg, 96000)
    slab = pad_batch([s.astype(np.float32) for s in sigs], cfg,
                     bucket_len=96000, layout=lay)
    f_f32, _ = chain.extract_batch(
        jnp.asarray(slab.audio), jnp.asarray(slab.lengths), cfg,
        backend="pallas",
    )
    f_i16, _ = chain.extract_batch(
        jnp.asarray(np.asarray(slab.audio).astype(np.int16)),
        jnp.asarray(slab.lengths), cfg, backend="pallas",
    )
    np.testing.assert_array_equal(np.asarray(f_i16), np.asarray(f_f32))


def test_resample_slab_bucket_sweep():
    """Producer (resample_slab_layout) and consumer (extract_batch, which
    recovers the frame capacity from the slab's row count) must agree on
    the geometry for any bucket length."""
    from mfcc_tpu.pipeline import device_layout

    cfg = NAMED_CONFIGS["mfcc39_48k"]
    g = np.random.default_rng(73)
    for blen in (1201, 4800, 48000, 48123, 123457):
        sigs = [(g.standard_normal(blen) * 3000).astype(np.float32)]
        lay = device_layout(cfg, blen)
        assert lay is not None and hasattr(lay, "chunk"), blen
        slab = pad_batch(sigs, cfg, bucket_len=blen, layout=lay)
        f_rs, m_rs = chain.extract_batch(
            jnp.asarray(slab.audio), jnp.asarray(slab.lengths), cfg,
            backend="pallas",
        )
        flat = pad_batch(sigs, cfg, bucket_len=blen)
        f_jn, m_jn = chain.extract_batch(
            jnp.asarray(flat.audio), jnp.asarray(flat.lengths), cfg,
            backend="jnp",
        )
        nv = int(np.asarray(m_jn)[0].sum())
        assert int(np.asarray(m_rs)[0].sum()) == nv, blen
        np.testing.assert_allclose(
            np.asarray(f_rs)[0, :nv], np.asarray(f_jn)[0, :nv],
            atol=1e-3, rtol=2e-3, err_msg=str(blen),
        )


def test_resample_slab_dither_contract():
    """Dither through the fused rs kernel follows the signal-level contract
    on the OUTPUT-domain slab (same field the 16 kHz slab path draws), so
    the jnp twin replaying the same seed agrees to fp32 tolerance."""
    from mfcc_tpu.pipeline import device_layout

    cfg = NAMED_CONFIGS["mfcc39_48k"].replace(dither=1.0, dither_seed=5)
    g = np.random.default_rng(79)
    sigs = [(g.standard_normal(48000) * 3000).astype(np.float32)]
    lay = device_layout(cfg, 48000)
    slab = pad_batch(sigs, cfg, bucket_len=48000, layout=lay)
    f_rs, m_rs = chain.extract_batch(
        jnp.asarray(slab.audio), jnp.asarray(slab.lengths), cfg,
        backend="pallas",
    )
    flat = pad_batch(sigs, cfg, bucket_len=48000)
    f_jn, m_jn = chain.extract_batch(
        jnp.asarray(flat.audio), jnp.asarray(flat.lengths), cfg,
        backend="jnp",
    )
    nv = int(np.asarray(m_jn)[0].sum())
    np.testing.assert_allclose(
        np.asarray(f_rs)[0, :nv], np.asarray(f_jn)[0, :nv],
        atol=2e-3, rtol=2e-3,
    )


def test_blocked_44k_feed_not_misrouted():
    """r5 review regression: for 44.1 kHz the BlockedLayout's lane width
    coincides with the rs-slab step (441), so the fused-resample dispatch
    must validate the EXACT rs geometry — a blocked feed (e.g. from
    stream_batches layouts="resample", or the over-VMEM-budget fallback)
    must route through the blocked + XLA-dots seam under backend='pallas',
    not raise or silently misread."""
    from mfcc_tpu.pipeline import resample_layout

    cfg = NAMED_CONFIGS["mfcc39_44k"]
    g = np.random.default_rng(103)
    for n in (44100, 100001):
        sigs = [(g.standard_normal(n) * 3000).astype(np.float32)]
        blay = resample_layout(cfg, n)
        assert blay is not None and hasattr(blay, "n_sup")
        bb = pad_batch(sigs, cfg, bucket_len=n, layout=blay)
        assert bb.layout_kind == "blocked"
        f_bl, m_bl = chain.extract_batch(
            jnp.asarray(bb.audio), jnp.asarray(bb.lengths), cfg,
            backend="pallas",
        )
        flat = pad_batch(sigs, cfg, bucket_len=n)
        f_jn, m_jn = chain.extract_batch(
            jnp.asarray(flat.audio), jnp.asarray(flat.lengths), cfg,
            backend="jnp",
        )
        nv = int(np.asarray(m_jn)[0].sum())
        assert int(np.asarray(m_bl)[0].sum()) == nv
        np.testing.assert_allclose(
            np.asarray(f_bl)[0, :nv], np.asarray(f_jn)[0, :nv],
            atol=1e-3, rtol=2e-3, err_msg=str(n),
        )
        # explicit disambiguation must also work
        f_ex, _ = chain.extract_batch(
            jnp.asarray(bb.audio), jnp.asarray(bb.lengths), cfg,
            backend="pallas", input_layout="blocked",
        )
        np.testing.assert_array_equal(np.asarray(f_ex), np.asarray(f_bl))

    # a COLLISION-window bucket (blocked n_sup also decomposes as a valid
    # rs geometry): "auto" must refuse loudly rather than guess (the
    # second review pass confirmed silent misrouting here), and the
    # explicit kind must run the blocked seam correctly
    n = 52920  # blocked [121, 441]; 121 - 17 = 104 = valid rs capacity
    sigs = [(g.standard_normal(n) * 3000).astype(np.float32)]
    blay = resample_layout(cfg, n)
    bb = pad_batch(sigs, cfg, bucket_len=n, layout=blay)
    with pytest.raises(ValueError, match="matches BOTH"):
        chain.extract_batch(
            jnp.asarray(bb.audio), jnp.asarray(bb.lengths), cfg,
            backend="pallas",
        )
    f_bl, m_bl = chain.extract_batch(
        jnp.asarray(bb.audio), jnp.asarray(bb.lengths), cfg,
        backend="pallas", input_layout="blocked",
    )
    flat = pad_batch(sigs, cfg, bucket_len=n)
    f_jn, m_jn = chain.extract_batch(
        jnp.asarray(flat.audio), jnp.asarray(flat.lengths), cfg,
        backend="jnp",
    )
    nv = int(np.asarray(m_jn)[0].sum())
    np.testing.assert_allclose(
        np.asarray(f_bl)[0, :nv], np.asarray(f_jn)[0, :nv],
        atol=1e-3, rtol=2e-3,
    )


def test_input_layout_explicit_kinds():
    """input_layout='resample_slab' validates loudly; batches carry their
    layout_kind; the rs path honors the explicit kind."""
    from mfcc_tpu.pipeline import device_layout, resample_layout

    cfg = NAMED_CONFIGS["mfcc39_48k"]
    g = np.random.default_rng(107)
    sigs = [(g.standard_normal(48000) * 3000).astype(np.float32)]
    rlay = device_layout(cfg, 48000)
    rb = pad_batch(sigs, cfg, bucket_len=48000, layout=rlay)
    assert rb.layout_kind == "resample_slab"
    f_rs, _ = chain.extract_batch(
        jnp.asarray(rb.audio), jnp.asarray(rb.lengths), cfg,
        backend="pallas", input_layout=rb.layout_kind,
    )
    assert np.isfinite(np.asarray(f_rs)).all()
    # an rs-slab feed claimed as resample_slab under the JNP backend must
    # fail loudly, not be silently misread as a BlockedLayout (r5 review,
    # second pass)
    with pytest.raises(ValueError, match="requires backend='pallas'"):
        chain.extract_batch(
            jnp.asarray(rb.audio), jnp.asarray(rb.lengths), cfg,
            backend="jnp", input_layout="resample_slab",
        )
    # a blocked 48 kHz shape claimed as resample_slab must fail loudly
    blay = resample_layout(cfg, 48000)
    bb = pad_batch(sigs, cfg, bucket_len=48000, layout=blay)
    with pytest.raises(ValueError, match="resample-slab geometry"):
        chain.extract_batch(
            jnp.asarray(bb.audio), jnp.asarray(bb.lengths), cfg,
            backend="pallas", input_layout="resample_slab",
        )


def test_over_budget_44k_falls_back_to_blocked():
    """A bucket whose rs slab would exceed the VMEM budget makes
    device_layout fall back to BlockedLayout, and extract_batch must run
    it (the confirmed r5 repro raised here before the exact-geometry
    dispatch)."""
    from mfcc_tpu.pipeline import device_layout

    cfg = NAMED_CONFIGS["mfcc39_44k"]
    n = 44100 * 60  # 60 s: rs slab over the 8 MiB budget
    lay = device_layout(cfg, n)
    assert lay is not None and hasattr(lay, "n_sup"), lay  # blocked fallback
    g = np.random.default_rng(109)
    sigs = [(g.standard_normal(n) * 3000).astype(np.float32)]
    bb = pad_batch(sigs, cfg, bucket_len=n, layout=lay)
    f, m = chain.extract_batch(
        jnp.asarray(bb.audio), jnp.asarray(bb.lengths), cfg,
        backend="pallas", input_layout=bb.layout_kind,
    )
    assert np.isfinite(np.asarray(f)).all()
    assert int(np.asarray(m)[0].sum()) == cfg.num_frames(
        resample.output_length(n, 44100, 16000)
    )
