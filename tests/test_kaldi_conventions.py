"""Kaldi-lineage convention family: frame-first conditioning (dither, DC
removal, per-frame pre-emphasis, time-domain energy), snip_edges framing
(drop + centered-reflect), floor-style log, energy floor, VTLN warp.

No Kaldi source exists on this disk (SURVEY.md §0 provenance), so the
float64 oracle re-derives the documented compute-mfcc-feats semantics and
these tests certify (a) oracle-vs-jnp exactness in fp64, (b) the defining
properties of each convention by construction, (c) the guards that keep
unsupported combinations off the fused kernel / streaming paths.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mfcc_tpu.config import FrontendConfig, named_config
from mfcc_tpu.ops import chain, constants as C, reference_numpy as ref

RNG = np.random.default_rng(11)


def _signal(n=16000 * 2 + 137, scale=1000.0):
    return (RNG.standard_normal(n) * scale).astype(np.float64)


# ---------------------------------------------------------------------------
# fp64 oracle-vs-jnp exactness over the new knob space
# ---------------------------------------------------------------------------

KALDI_VARIANTS = {
    "kaldi_mfcc": {},
    "kaldi_fbank": {},
    "center_tail": dict(frame_tail="center"),
    "windowed_energy": dict(energy_source="windowed_frame"),
    "energy_floor": dict(energy_floor=1e-3),
    "vtln_low": dict(vtln_warp=0.9),
    "vtln_high": dict(vtln_warp=1.1),
    "deltas": dict(deltas=2),
    "no_dc": dict(remove_dc_offset=False),
    "signal_preemph_kaldi_mel": dict(preemph_mode="signal"),
    "center_no_preemph": dict(frame_tail="center", preemph=0.0),
}


@pytest.mark.parametrize("name", sorted(KALDI_VARIANTS))
def test_kaldi_variant_fp64_exact(name):
    base = "kaldi_fbank" if name == "kaldi_fbank" else "kaldi_mfcc"
    cfg = named_config(base).replace(dtype="float64", **KALDI_VARIANTS[name])
    with jax.enable_x64(True):
        for n in (32000 + 137, 400, 100, 16000):
            x = (np.random.default_rng(n).standard_normal(n) * 1000)
            want = ref.extract(x, cfg)
            got = chain.extract_single(x, cfg)
            assert got.shape == want.shape, (name, n, got.shape, want.shape)
            np.testing.assert_allclose(
                got, want, atol=1e-10, rtol=1e-10, err_msg=f"{name} n={n}"
            )


def test_kaldi_fp32_gate():
    """The shipped fp32 chain holds the standard feature gate on the Kaldi
    configs too (same 5e-4 cepstra / 1e-4 fbank budget as the psf family)."""
    x = _signal()
    for base, atol in (("kaldi_mfcc", 5e-4), ("kaldi_fbank", 1e-4)):
        cfg = named_config(base)
        want = ref.extract(x, cfg)
        got = chain.extract_single(x.astype(np.float32), cfg)
        np.testing.assert_allclose(got, want, atol=atol, rtol=1e-5)


# ---------------------------------------------------------------------------
# Defining properties of each convention
# ---------------------------------------------------------------------------


def test_reflect_index_matches_while_loop():
    """Closed-form triangular reflection == Kaldi's reflect-until-inside
    loop, for every index reachable by centered framing and beyond."""

    def loop(s, n):
        while s < 0 or s >= n:
            s = -s - 1 if s < 0 else 2 * n - 1 - s
        return s

    for n in (1, 2, 3, 7, 80, 400):
        idx = np.arange(-3 * n, 3 * n)
        want = np.array([loop(int(s), n) for s in idx])
        got = ref.reflect_index(idx, n)
        np.testing.assert_array_equal(got, want, err_msg=f"n={n}")


def test_centered_framing_count_and_coverage():
    cfg = named_config("kaldi_mfcc").replace(frame_tail="center")
    L, S = cfg.frame_length, cfg.frame_step
    # Kaldi snip_edges=false count: (N + S//2) // S
    for n in (79, 80, 160, 400, 16000, 16001):
        assert cfg.num_frames(n) == (n + S // 2) // S
    # frame f covers f*S + S//2 - L//2 + [0, L), symmetric-reflected: the
    # first frame of a long ramp equals a numpy symmetric-pad gather
    n = 2000
    x = np.arange(n, dtype=np.float64)
    frames = ref.frame_signal(x, L, S, "center")
    pad = L  # enough for one reflection
    xp = np.pad(x, pad, mode="symmetric")
    for f in (0, 1, cfg.num_frames(n) - 1):
        start = f * S + S // 2 - L // 2 + pad
        np.testing.assert_array_equal(frames[f], xp[start : start + L])


def test_frame_preemph_semantics():
    """w[0] *= (1-c); w[n] -= c*w[n-1] — per frame, not across frames."""
    frames = RNG.standard_normal((3, 5))
    out = ref.preemphasis_frames(frames, 0.97)
    for f in range(3):
        np.testing.assert_allclose(out[f, 0], frames[f, 0] * 0.03)
        np.testing.assert_allclose(
            out[f, 1:], frames[f, 1:] - 0.97 * frames[f, :-1]
        )


def test_dc_offset_removal_zeroes_frame_mean():
    cfg = named_config("kaldi_mfcc").replace(dtype="float64")
    x = _signal(8000) + 123.0  # constant offset
    with jax.enable_x64(True):
        stages = chain.logmel_stages(
            jnp.asarray(x)[None], jnp.asarray([len(x)], np.int32), cfg
        )
    F = cfg.num_frames(len(x))
    fr = np.asarray(stages["frames"][0, :F])
    # frames stage is post-preemph; reconstruct the pre-preemph mean check
    # from the oracle instead: DC removal happens before preemph there
    o = ref.logmel_chain(x, cfg.replace(preemph=0.0))
    np.testing.assert_allclose(o["frames"].mean(axis=1), 0.0, atol=1e-9)
    assert np.isfinite(fr).all()


def test_raw_energy_is_pre_preemph_pre_window():
    cfg = named_config("kaldi_mfcc").replace(dtype="float64")
    x = _signal(4000)
    o = ref.logmel_chain(x, cfg)
    # recompute: frames of the raw signal, DC-removed, squared-summed
    raw = ref.frame_signal(x, cfg.frame_length, cfg.frame_step, "drop")
    raw = raw - raw.mean(axis=1, keepdims=True)
    np.testing.assert_allclose(o["energy"], (raw ** 2).sum(axis=1), rtol=1e-12)


def test_windowed_energy_is_post_window():
    cfg = named_config("kaldi_mfcc").replace(
        dtype="float64", energy_source="windowed_frame"
    )
    x = _signal(4000)
    o = ref.logmel_chain(x, cfg)
    np.testing.assert_allclose(
        o["energy"], (o["windowed"] ** 2).sum(axis=1), rtol=1e-12
    )


def test_ln_floor_floors_tiny_positives():
    cfg = named_config("kaldi_mfcc")
    eps = cfg.log_eps
    x = np.array([0.0, eps / 10, eps, 1.0])
    out = ref.apply_log(x, "ln_floor", eps)
    np.testing.assert_allclose(out[:3], np.log(eps))
    np.testing.assert_allclose(out[3], 0.0)
    # "ln" would NOT floor the tiny positive
    out_ln = ref.apply_log(x, "ln", eps)
    assert out_ln[1] < out[1] - 1.0


def test_energy_floor_binds_on_silence():
    cfg = named_config("kaldi_mfcc").replace(dtype="float64", energy_floor=1.0)
    x = np.zeros(4000)
    x[5] = 1e-6  # near-silence
    feat = ref.extract(x, cfg)
    np.testing.assert_array_equal(feat[:, 0], 0.0)  # ln(1.0) floor
    with jax.enable_x64(True):
        got = chain.extract_single(x, cfg)
    np.testing.assert_allclose(got, feat, atol=1e-10)


# ---------------------------------------------------------------------------
# Dither
# ---------------------------------------------------------------------------


def test_dither_replay_parity():
    """The jnp chain's contract draw (signal noise [T]), replayed through
    the float64 oracle, matches exactly — dither changes the samples, not
    the algebra."""
    cfg = named_config("kaldi_mfcc").replace(
        dtype="float64", dither=1.0, dither_seed=42
    )
    x = _signal(16000)
    with jax.enable_x64(True):
        a = jnp.asarray(x)[None]
        l = jnp.asarray([len(x)], np.int32)
        stages = chain.logmel_stages(a, l, cfg)
        # features from the SAME eager stages: bit-consistent with the
        # exposed noise (the jitted extract_batch redraws the field under
        # different XLA fusion — log/sqrt ulps shift the noise ~1e-7)
        feat = chain.features_from_logmel(stages, cfg)
        feat_jit, _ = chain.extract_batch(a, l, cfg)
    F = cfg.num_frames(len(x))
    noise = np.asarray(stages["dither_noise"][0])  # [T] signal noise
    want = ref.extract(x, cfg, dither_noise=noise)
    np.testing.assert_allclose(np.asarray(feat[0, :F]), want, atol=1e-10)
    np.testing.assert_allclose(np.asarray(feat_jit[0, :F]), want, atol=1e-7)


def test_dither_oracle_default_draw_matches_twin():
    """Without replaying noise, the oracle's own contract draw (numpy twin,
    ops/dither.signal_noise_np) agrees with the jnp chain to ln/sqrt-ulp
    level — the hash and the polynomial cos are bit-identical."""
    cfg = named_config("kaldi_mfcc").replace(
        dtype="float64", dither=1.0, dither_seed=3
    )
    x = _signal(16000)
    with jax.enable_x64(True):
        a = jnp.asarray(x)[None]
        l = jnp.asarray([len(x)], np.int32)
        feat, _ = chain.extract_batch(a, l, cfg)
    F = cfg.num_frames(len(x))
    want = ref.extract(x, cfg)  # no noise passed: oracle draws the contract
    np.testing.assert_allclose(np.asarray(feat[0, :F]), want, atol=1e-6)


def test_dither_kernel_equals_twin():
    """In-kernel slab dither (signal-level contract noise generated inside
    _gather_frames) == the jnp twin, across convention families including
    the centered (XLA-prologue) and resample paths."""
    g = np.random.default_rng(11)
    x = np.stack([
        g.standard_normal(16000 * 2).astype(np.float32) * 300,
        np.concatenate([
            g.standard_normal(9000).astype(np.float32) * 300,
            np.zeros(16000 * 2 - 9000, np.float32),
        ]),
    ])
    a = jnp.asarray(x)
    l = jnp.asarray([32000, 9000], np.int32)
    for name, kw, tol in [
        ("kaldi_mfcc", dict(dither=1.0), 5e-4),
        ("classic13_deltas", dict(dither=0.5), 5e-4),
        ("kaldi_mfcc", dict(dither=1.0, frame_tail="center"), 5e-4),
        ("kaldi_plp", dict(dither=1.0), 5e-4),
    ]:
        cfg = named_config(name).replace(**kw)
        fj, _ = chain.extract_batch(a, l, cfg, backend="jnp")
        fp, _ = chain.extract_batch(a, l, cfg, backend="pallas")
        err = np.abs(np.asarray(fj) - np.asarray(fp)).max()
        assert err < tol, (name, kw, err)


def test_dither_batch_position_invariance():
    """The contract has no batch term: the same utterance at two positions
    of one padded batch gets bit-identical dithered features. (Different
    batch SHAPES compile different XLA programs whose log/sqrt fusions
    differ at ulp level — position within a program is the exact
    invariant.)"""
    cfg = named_config("kaldi_mfcc").replace(dither=1.0)
    g = np.random.default_rng(4)
    u = np.concatenate([
        g.standard_normal(12000).astype(np.float32) * 200,
        np.zeros(16000 - 12000, np.float32),
    ])
    batch = np.stack([u, g.standard_normal(16000).astype(np.float32), u])
    l3 = jnp.asarray([12000, 16000, 12000], np.int32)
    for backend in ("jnp", "pallas"):
        f3, _ = chain.extract_batch(jnp.asarray(batch), l3, cfg, backend=backend)
        nv = int(np.asarray(chain.num_valid_frames(jnp.asarray([12000]), cfg))[0])
        np.testing.assert_array_equal(
            np.asarray(f3[0, :nv]), np.asarray(f3[2, :nv])
        )


def test_dither_statistics_and_determinism():
    cfg0 = named_config("kaldi_mfcc").replace(dtype="float64", preemph=0.0,
                                              remove_dc_offset=False)
    cfg = cfg0.replace(dither=2.5, dither_seed=7)
    x = _signal(16000)
    with jax.enable_x64(True):
        a = jnp.asarray(x)[None]
        l = jnp.asarray([len(x)], np.int32)
        s0 = chain.logmel_stages(a, l, cfg0)
        s1 = chain.logmel_stages(a, l, cfg)
        s1b = chain.logmel_stages(a, l, cfg)
    d = np.asarray(s1["frames"]) - np.asarray(s0["frames"])
    assert abs(d.std() - 2.5) < 0.05  # unit gaussian scaled by dither
    assert abs(d.mean()) < 0.05
    # same seed -> same draw (deterministic, resume-safe)
    np.testing.assert_array_equal(np.asarray(s1["frames"]), np.asarray(s1b["frames"]))
    # different seed -> different draw
    s2 = chain.logmel_stages(a, l, cfg.replace(dither_seed=8))
    assert not np.array_equal(np.asarray(s1["frames"]), np.asarray(s2["frames"]))


def test_dither_seed_golden_increment_no_row_shift():
    """ADVICE r3: with the former linear seed entry (row*GOLDEN + seed),
    seeds differing by exactly GOLDEN = 0x9E3779B9 produced identical noise
    fields shifted by one row. The fmix32 seed pre-mix must break that."""
    from mfcc_tpu.ops import dither as D

    s, t = 160, 160 * 64
    for seed in (0, 7, 12345):
        a = D.signal_noise_np(seed, t, s).reshape(-1, s)
        b = D.signal_noise_np((seed + D._GOLDEN) & 0xFFFFFFFF, t, s).reshape(-1, s)
        # not the same field, and not the same field shifted by one row
        assert not np.array_equal(a, b)
        assert not np.array_equal(a[1:], b[:-1])
        assert not np.array_equal(b[1:], a[:-1])
        # jnp twin stays bit-identical to the numpy twin on the hash path
        # (transcendentals are ulp-close; compare with loose tolerance)
        aj = np.asarray(D.signal_noise(seed, t, s)).reshape(-1, s)
        np.testing.assert_allclose(aj, a, rtol=0, atol=1e-5)


# ---------------------------------------------------------------------------
# VTLN
# ---------------------------------------------------------------------------


def test_vtln_identity_and_shape():
    f = np.linspace(0, 8000, 101)
    np.testing.assert_array_equal(
        C.vtln_warp_freq(f, 100, 7500, 20, 8000, 1.0), f
    )
    for warp in (0.8, 1.25):
        w = C.vtln_warp_freq(f, 100, 7500, 20, 8000, warp)
        # identity outside [low, high]
        np.testing.assert_array_equal(w[f < 20], f[f < 20])
        np.testing.assert_array_equal(w[f > 8000], f[f > 8000])
        # strictly monotonic inside
        inside = (f >= 20) & (f <= 8000)
        assert (np.diff(w[inside]) > 0).all()
        # central band is exactly freq / warp
        l = 100 * max(1.0, warp)
        h = 7500 * min(1.0, warp)
        mid = (f > l) & (f < h)
        np.testing.assert_allclose(w[mid], f[mid] / warp, rtol=1e-12)
        # endpoints pinned
        np.testing.assert_allclose(
            C.vtln_warp_freq(np.array([20.0, 8000.0]), 100, 7500, 20, 8000, warp),
            [20.0, 8000.0], rtol=1e-12,
        )


def test_vtln_moves_filter_centers():
    cfg = named_config("kaldi_mfcc")
    fb1 = C.mel_filterbank(cfg)
    fb_w = C.mel_filterbank(cfg.replace(vtln_warp=1.2))
    # warp > 1 compresses the spectrum (freq/warp): centers move DOWN
    c1 = fb1.argmax(axis=0)
    cw = fb_w.argmax(axis=0)
    mid = slice(5, cfg.n_mels - 5)
    assert (cw[mid] <= c1[mid]).all() and (cw[mid] < c1[mid]).any()
    # every filter still a valid triangle
    assert (fb_w >= 0).all() and (fb_w.sum(axis=0) > 0).all()


def test_vtln_validation():
    with pytest.raises(ValueError, match="tf_continuous"):
        FrontendConfig(vtln_warp=1.1)  # psf_quantized default
    with pytest.raises(ValueError, match="vtln"):
        C.vtln_warp_freq(np.array([1.0]), 7500, 100, 20, 8000, 1.1)


# ---------------------------------------------------------------------------
# Guards: kernel / streaming / longform
# ---------------------------------------------------------------------------


def test_pallas_guard_accepts_every_knob():
    # frame-first conditioning (incl. in-kernel dither, r3) is in the fused
    # kernel's conditioning pass and centered framing rides the
    # reflect-extension prologue (kernels/frontend._reflect_extend) — every
    # convention knob is kernel-eligible
    for cfg in (
        named_config("kaldi_mfcc"),
        named_config("kaldi_mfcc").replace(dither=1.0),  # Kaldi's default
        named_config("kaldi_fbank"),
        named_config("whisper80"),
        FrontendConfig(dither=0.5),
        FrontendConfig(frame_tail="center"),
        FrontendConfig(frame_tail="center_reflect"),
        FrontendConfig(remove_dc_offset=True),
        FrontendConfig(energy_source="raw_frame"),
        FrontendConfig(energy_source="windowed_frame"),
        FrontendConfig(energy_floor=1e-3, log_kind="ln_floor"),
    ):
        assert chain.pallas_unsupported_reason(cfg) is None


def test_streaming_parity_kaldi():
    from tests.test_streaming import chunkings, offline, run_stream

    for name in ("kaldi_mfcc", "kaldi_fbank"):
        cfg = named_config(name).replace(deltas=2)
        n = 16000 + 373
        x = RNG.standard_normal(n).astype(np.float32) * 100
        want = offline(x, cfg)
        for chunks in chunkings(n):
            got = run_stream(x, cfg, chunks, frames_per_block=32)
            assert got.shape == want.shape
            np.testing.assert_allclose(got, want, rtol=0, atol=5e-5)


def test_streaming_guards():
    from mfcc_tpu.pipeline.streaming import StreamingExtractor

    with pytest.raises(ValueError, match="center"):
        StreamingExtractor(named_config("kaldi_mfcc").replace(frame_tail="center"))
    with pytest.raises(ValueError, match="dither"):
        StreamingExtractor(named_config("kaldi_mfcc").replace(dither=1.0))


def test_longform_kaldi_and_center():
    from mfcc_tpu.pipeline import extract_long

    with jax.enable_x64(True):
        x = (np.random.default_rng(5).standard_normal(16000 * 13 + 321) * 500)
        for kw in ({}, dict(frame_tail="center")):
            cfg = named_config("kaldi_mfcc").replace(
                dtype="float64", deltas=2, **kw
            )
            want = ref.extract(x, cfg)
            got = extract_long(x, cfg, backend="jnp", seg_len_s=4.0)
            assert got.shape == want.shape
            np.testing.assert_allclose(got, want, atol=1e-10, rtol=1e-10)
        with pytest.raises(ValueError, match="dither"):
            extract_long(x, named_config("kaldi_mfcc").replace(dither=1.0),
                         seg_len_s=4.0)


def test_masking_invariance_kaldi():
    """A padded batch row equals the solo extraction bit-for-bit (fp64) for
    the frame-first family, including centered reflection on traced
    lengths."""
    with jax.enable_x64(True):
        for kw in ({}, dict(frame_tail="center")):
            cfg = named_config("kaldi_mfcc").replace(dtype="float64", **kw)
            n1, n2 = 7000, 16000
            x1 = np.random.default_rng(1).standard_normal(n1) * 300
            x2 = np.random.default_rng(2).standard_normal(n2) * 300
            batch = np.zeros((2, n2))
            batch[0, :n1] = x1
            batch[1] = x2
            feat, mask = chain.extract_batch(
                jnp.asarray(batch), jnp.asarray([n1, n2], np.int32), cfg
            )
            want1 = ref.extract(x1, cfg)
            f1 = cfg.num_frames(n1)
            np.testing.assert_allclose(
                np.asarray(feat[0, :f1]), want1, atol=1e-10, rtol=1e-10
            )
            assert np.asarray(mask[0]).sum() == f1
            np.testing.assert_array_equal(np.asarray(feat[0, f1:]), 0.0)


def test_cli_set_overrides_kaldi():
    cfg = named_config("classic13")
    from mfcc_tpu.config import config_with_overrides

    out = config_with_overrides(
        cfg, ["preemph_mode=frame", "remove_dc_offset=true",
              "energy_source=raw_frame", "dither=0.5", "energy_floor=0.1",
              "frame_tail=center"]
    )
    assert out.preemph_mode == "frame" and out.remove_dc_offset
    assert out.energy_source == "raw_frame" and out.dither == 0.5
    assert out.energy_floor == 0.1 and out.frame_tail == "center"
    with pytest.raises(ValueError):
        config_with_overrides(cfg, ["energy_source=bogus"])
