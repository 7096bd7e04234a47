"""Fused Pallas kernel ≡ jnp twin ≡ golden oracle (SURVEY.md §4.2 item 5).

Runs in Pallas interpreter mode on the CPU test mesh; the identical kernel
code compiles for TPU (exercised by bench.py / the driver's entry check).
Equivalence gates:
  - kernel vs jnp twin: both fp32, only roundoff order differs (DFT-matmul
    vs pocketfft rfft) → logmel gated at 2e-5 where loud, linear-domain
    rel-to-rowmax 1e-5 elsewhere; energy rtol 1e-5.
  - kernel vs float64 golden: same gates as the jnp chain.
"""

import numpy as np
import pytest

from mfcc_tpu.config import NAMED_CONFIGS
from mfcc_tpu.kernels import fused_logmel_stages
from mfcc_tpu.ops import chain
from mfcc_tpu.pipeline import pad_batch
from mfcc_tpu.testing.golden import golden_signals, load_golden
from tests.test_jnp_chain import FEATURE_ATOL_FP32, FEATURE_RTOL, assert_logmel_close

import jax
import jax.numpy as jnp

CONFIGS = ["classic13", "classic13_deltas", "logmel80", "kaldi_mfcc", "kaldi_fbank"]


def _batch(cfg, names=("noise", "speechish", "short", "tone_offbin")):
    sigs = golden_signals()
    chosen = [sigs[n] for n in names]
    b = pad_batch(chosen, cfg, bucket_len=max(s.shape[0] for s in chosen))
    return b, names


@pytest.mark.parametrize("config_name", CONFIGS)
def test_kernel_matches_jnp_twin(config_name):
    cfg = NAMED_CONFIGS[config_name]
    b, _ = _batch(cfg)
    audio = jnp.asarray(b.audio)
    lengths = jnp.asarray(b.lengths)

    twin = chain.logmel_stages(audio, lengths, cfg)
    fused = fused_logmel_stages(audio, lengths, cfg, interpret=True)

    lm_t = np.asarray(twin["logmel"], dtype=np.float64)
    lm_f = np.asarray(fused["logmel"], dtype=np.float64)
    lin_t, lin_f = np.exp(lm_t), np.exp(lm_f)
    rowmax = lin_t.max(axis=-1, keepdims=True) + 1e-300
    loud = lin_t > rowmax * 1e-4
    assert (np.abs(lm_f - lm_t) * loud).max() < 2e-5
    assert (np.abs(lin_f - lin_t) / rowmax).max() < 1e-5

    np.testing.assert_allclose(
        np.asarray(fused["energy"]), np.asarray(twin["energy"]), rtol=1e-5, atol=1e-12
    )
    np.testing.assert_array_equal(
        np.asarray(fused["frame_mask"]), np.asarray(twin["frame_mask"])
    )


@pytest.mark.parametrize("config_name", CONFIGS)
def test_pallas_backend_matches_golden(config_name):
    """Full extract_batch(backend='pallas') hits the oracle gates per row."""
    cfg = NAMED_CONFIGS[config_name]
    names = ("noise", "speechish", "short")
    b, _ = _batch(cfg, names)
    feat, mask = chain.extract_batch(
        jnp.asarray(b.audio), jnp.asarray(b.lengths), cfg, backend="pallas"
    )
    feat = np.asarray(feat)
    for i, n in enumerate(names):
        g = load_golden(config_name, n)
        fv = cfg.num_frames(int(b.lengths[i]))
        if fv == 0:  # sub-frame utterance under drop-tail framing
            assert g["features"].shape[0] == 0
            continue
        if cfg.features == "logmel":
            assert_logmel_close(feat[i, :fv], g["features"], cfg)
        else:
            np.testing.assert_allclose(
                feat[i, :fv], g["features"], atol=FEATURE_ATOL_FP32, rtol=FEATURE_RTOL
            )


@pytest.mark.parametrize("config_name", ["classic13", "logmel80"])
def test_radix4_matches_direct_fp32(config_name):
    """The factorized radix-4 DFT must agree with the direct DFT matmul to
    fp32 roundoff (both exact algorithms, different summation orders)."""
    cfg = NAMED_CONFIGS[config_name]
    b, _ = _batch(cfg)
    audio, lengths = jnp.asarray(b.audio), jnp.asarray(b.lengths)
    direct = fused_logmel_stages(audio, lengths, cfg, interpret=True, dft_passes="fp32")
    r4 = fused_logmel_stages(audio, lengths, cfg, interpret=True, dft_passes="radix4")
    lm_d = np.asarray(direct["logmel"], np.float64)
    lm_r = np.asarray(r4["logmel"], np.float64)
    lin_d = np.exp(lm_d)
    rowmax = lin_d.max(axis=-1, keepdims=True) + 1e-300
    loud = lin_d > rowmax * 1e-4
    assert (np.abs(lm_r - lm_d) * loud).max() < 2e-5
    np.testing.assert_allclose(
        np.asarray(r4["energy"]), np.asarray(direct["energy"]), rtol=1e-5
    )


def test_radix4_bin_permutation_covers_all_bins():
    """Every FFT bin's mel weight appears exactly once in the permuted mel
    matrix (conjugate-duplicate lanes get zero weight)."""
    from mfcc_tpu.kernels.frontend import radix4_constants
    from mfcc_tpu.ops import constants as C

    cfg = NAMED_CONFIGS["classic13"]
    k = radix4_constants(cfg)
    mel = k["mel"][:, : cfg.n_mels]
    fb = C.mel_filterbank(cfg)  # [n_bins, n_mels]
    lanes = np.asarray(k["lanes_per_bin"], np.float64)  # 2 (re+im) or 1 (real-only)
    # every bin is covered: 2 lanes for complex bins, 1 for the exactly-real
    # s=0 DC/Nyquist components (their imag lanes are trimmed from f0)
    assert set(np.unique(lanes)) <= {1.0, 2.0} and (lanes >= 1).all()
    np.testing.assert_allclose(
        mel.sum(axis=0), (fb * lanes[:, None]).sum(axis=0), rtol=1e-6
    )
    # energy column counts every bin once per carrying lane
    assert k["mel"][:, cfg.n_mels].sum() == lanes.sum()


def test_dirty_tail_zeroed_without_preemph():
    """Slab mode must zero beyond-length samples even when preemph == 0 —
    callers are not required to pre-zero padding (review finding: garbage
    leaked into tail frames at 0.137 log-mel error)."""
    cfg = NAMED_CONFIGS["classic13"].replace(preemph=0.0)
    g = np.random.default_rng(3)
    T, n = 24000, 17000
    audio = g.standard_normal((1, T)).astype(np.float32)  # dirty tail
    lengths = jnp.asarray([n], jnp.int32)
    fused = fused_logmel_stages(jnp.asarray(audio), lengths, cfg, interpret=True)
    clean = audio.copy()
    clean[0, n:] = 0.0
    twin = chain.logmel_stages(jnp.asarray(clean), lengths, cfg)
    fv = int(np.asarray(twin["n_valid"])[0])
    lm_f = np.asarray(fused["logmel"], np.float64)[0, :fv]
    lm_t = np.asarray(twin["logmel"], np.float64)[0, :fv]
    lin = np.exp(lm_t)
    rowmax = lin.max(axis=-1, keepdims=True) + 1e-300
    loud = lin > rowmax * 1e-4
    assert (np.abs(lm_f - lm_t) * loud).max() < 2e-5


def test_bf16x3_path_runs_and_is_close():
    """dft_passes='bf16x3' (throughput-first path): exercises its ref
    unpacking and accuracy class (~1e-4 loud-bin — looser than the gate,
    by design; documented in-kernel)."""
    cfg = NAMED_CONFIGS["classic13"]
    b, _ = _batch(cfg)
    audio, lengths = jnp.asarray(b.audio), jnp.asarray(b.lengths)
    twin = chain.logmel_stages(audio, lengths, cfg)
    fused = fused_logmel_stages(audio, lengths, cfg, interpret=True,
                                dft_passes="bf16x3")
    lm_t = np.asarray(twin["logmel"], np.float64)
    lm_f = np.asarray(fused["logmel"], np.float64)
    lin_t = np.exp(lm_t)
    rowmax = lin_t.max(axis=-1, keepdims=True) + 1e-300
    loud = lin_t > rowmax * 1e-4
    err = (np.abs(lm_f - lm_t) * loud).max()
    # guards the fold-proof split: single-pass degradation measures ~2e-3
    assert err < 1e-3, err


def test_bf16_split_is_fold_proof():
    """The in-kernel bf16 hi/lo split must survive jit: XLA folds the
    arithmetic `x - bf16(x)` form to zero (review finding)."""
    from mfcc_tpu.kernels.frontend import _bf16_split

    x = jnp.asarray(np.random.default_rng(0).standard_normal(512) * 1000,
                    jnp.float32)
    hi, lo = jax.jit(_bf16_split)(x)
    hi, lo = np.asarray(hi, np.float64), np.asarray(lo, np.float64)
    assert np.abs(lo).max() > 0, "lo split folded to zero"
    rec = hi + lo
    x64 = np.asarray(x, np.float64)
    assert np.abs(rec - x64).max() <= np.abs(x64).max() * 2**-15


def test_frame_longer_than_nfft_truncates():
    """rfft(frames, n_fft) truncates frames longer than n_fft; the folded
    DFT constants must do the same instead of aliasing the tail (review
    finding: 40 ms windows at 512-pt FFT gave features off by 4+)."""
    cfg = NAMED_CONFIGS["classic13"].replace(win_len_s=0.040)  # L=640 > 512
    assert cfg.frame_length > cfg.n_fft
    sigs = golden_signals()
    b = pad_batch([sigs["noise"]], cfg, bucket_len=sigs["noise"].shape[0])
    audio, lengths = jnp.asarray(b.audio), jnp.asarray(b.lengths)
    twin = chain.logmel_stages(audio, lengths, cfg)
    for passes in ("fp32", "radix4"):
        fused = fused_logmel_stages(
            audio, lengths, cfg, interpret=True, dft_passes=passes
        )
        lm_t = np.asarray(twin["logmel"], np.float64)
        lm_f = np.asarray(fused["logmel"], np.float64)
        lin_t = np.exp(lm_t)
        rowmax = lin_t.max(axis=-1, keepdims=True) + 1e-300
        loud = lin_t > rowmax * 1e-4
        assert (np.abs(lm_f - lm_t) * loud).max() < 5e-5, passes


def test_many_chunk_config_compiles():
    """n_fft=2048 at 10 ms hop needs 13 chunk shifts; must not crash
    (review finding: a bare assert rejected nc > 9)."""
    cfg = NAMED_CONFIGS["classic13"].replace(n_fft=2048)
    sigs = golden_signals()
    b = pad_batch([sigs["short"]], cfg, bucket_len=2500)
    feat, mask = chain.extract_batch(
        jnp.asarray(b.audio), jnp.asarray(b.lengths), cfg, backend="pallas"
    )
    twin, _ = chain.extract_batch(
        jnp.asarray(b.audio), jnp.asarray(b.lengths), cfg, backend="jnp"
    )
    np.testing.assert_allclose(
        np.asarray(feat), np.asarray(twin), atol=5e-4, rtol=1e-3
    )


def test_kernel_block_boundaries():
    """Frame values must not depend on the frame-block size (halo-free by
    construction, but guard the chunk-shift indexing)."""
    cfg = NAMED_CONFIGS["classic13"]
    sigs = golden_signals()
    b = pad_batch([sigs["noise"]], cfg, bucket_len=sigs["noise"].shape[0])
    audio, lengths = jnp.asarray(b.audio), jnp.asarray(b.lengths)
    a = fused_logmel_stages(audio, lengths, cfg, interpret=True, block_frames=64)
    c = fused_logmel_stages(audio, lengths, cfg, interpret=True, block_frames=256)
    np.testing.assert_array_equal(np.asarray(a["logmel"]), np.asarray(c["logmel"]))


def test_kernel_constants_structure():
    from mfcc_tpu.kernels.frontend import kernel_constants

    cfg = NAMED_CONFIGS["classic13"]
    k = kernel_constants(cfg)
    nc, S, k2, mp = k["dims"]
    assert (nc, S) == (3, 160)
    assert k2 % 128 == 0 and mp % 128 == 0
    assert k2 == 640  # packed [cos|sin] layout: round_up(2*257, 128)
    dft = k["dft"]
    nb = cfg.n_bins
    # rows beyond the frame length and lanes beyond 2*n_bins exactly zero
    assert dft.shape == (nc * S, k2)
    assert (dft[cfg.frame_length :] == 0).all()
    assert (dft[:, 2 * nb :] == 0).all()
    # bf16 split reconstructs fp32 exactly to lo precision
    rec = k["dft_h"].astype(np.float32) + k["dft_l"].astype(np.float32)
    assert np.abs(rec - dft).max() < 2e-5
    # mel rows duplicated over cos and sin blocks; energy col all-ones there
    mel = k["mel"]
    np.testing.assert_array_equal(mel[:nb, : cfg.n_mels], mel[nb : 2 * nb, : cfg.n_mels])
    assert (mel[: 2 * nb, cfg.n_mels] == 1.0).all()
    assert (mel[2 * nb :, :] == 0).all()


def test_near_silent_energy_matches_oracle():
    """c0 on near-silent audio: tiny POSITIVE energies below eps must NOT be
    clamped (review finding: maximum(x, eps) diverged from the oracle's
    where(x <= 0, eps, x) by 14 log-units)."""
    cfg = NAMED_CONFIGS["classic13"]
    x = np.full(4000, 1e-12)
    b = pad_batch([x], cfg, bucket_len=4000)
    audio, lengths = jnp.asarray(b.audio), jnp.asarray(b.lengths)
    f_pl, _ = chain.extract_batch(audio, lengths, cfg, backend="pallas")
    f_jnp, _ = chain.extract_batch(audio, lengths, cfg, backend="jnp")
    c0_pl = float(np.asarray(f_pl)[0, 1, 0])
    c0_jnp = float(np.asarray(f_jnp)[0, 1, 0])
    assert abs(c0_pl - c0_jnp) < 1e-2, (c0_pl, c0_jnp)


def test_batch_chunking_is_bit_identical(monkeypatch):
    """max_kernel_batch splits the batch into sequential kernel calls
    (the batch-256 mitigation, VERDICT r1 item 3). Each ≤c-row call runs
    the identical grid program on its rows, so outputs must be
    bit-identical to the unchunked kernel."""
    from mfcc_tpu.kernels import frontend as fe

    # production trigger is B > 128 (the working-set cliff); lower it so a
    # 4-utterance interpret-mode batch exercises the lax.map path
    monkeypatch.setattr(fe, "CHUNK_TRIGGER_BATCH", 0)
    cfg = NAMED_CONFIGS["classic13"]
    b, _ = _batch(cfg)  # 4 utterances
    audio = jnp.asarray(b.audio)
    lengths = jnp.asarray(b.lengths)

    whole = fused_logmel_stages(
        audio, lengths, cfg, interpret=True, max_kernel_batch=None
    )
    chunked = fused_logmel_stages(
        audio, lengths, cfg, interpret=True, max_kernel_batch=2
    )
    for key in ("logmel", "energy", "prefix_fp"):
        np.testing.assert_array_equal(
            np.asarray(whole[key]), np.asarray(chunked[key])
        )
    # non-divisible chunk falls back to the single call
    odd = fused_logmel_stages(
        audio, lengths, cfg, interpret=True, max_kernel_batch=3
    )
    np.testing.assert_array_equal(
        np.asarray(whole["logmel"]), np.asarray(odd["logmel"])
    )


@pytest.mark.parametrize("config_name", ["classic13", "logmel80"])
def test_split_mel_variant_matches(monkeypatch, config_name):
    """The per-stage mel projection experiment (_RADIX4_SPLIT_MEL, off by
    default; scripts/bench_kernel_ab.py) projects x0/x1/x2 through their own
    mel row-groups instead of concat + full-width square. On real TPU the
    variants are bit-identical (asserted in the bench and the TPU lane); in
    interpret mode XLA:CPU sums the three partial dots in a different fp32
    order, so this CI guard on the row-group slicing uses the same
    loud-bin tolerance as the kernel/twin gate."""
    from mfcc_tpu.kernels import frontend as fe

    cfg = NAMED_CONFIGS[config_name]
    b, _ = _batch(cfg)
    audio = jnp.asarray(b.audio)
    lengths = jnp.asarray(b.lengths)

    base = fused_logmel_stages(audio, lengths, cfg, interpret=True)
    monkeypatch.setattr(fe, "_RADIX4_SPLIT_MEL", True)
    split = fused_logmel_stages(audio, lengths, cfg, interpret=True)
    lm_b = np.asarray(base["logmel"], dtype=np.float64)
    lm_s = np.asarray(split["logmel"], dtype=np.float64)
    lin_b = np.exp(lm_b)
    rowmax = lin_b.max(axis=-1, keepdims=True) + 1e-300
    loud = lin_b > rowmax * 1e-4
    assert (np.abs(lm_s - lm_b) * loud).max() < 2e-5
    np.testing.assert_allclose(
        np.asarray(split["energy"]), np.asarray(base["energy"]),
        rtol=1e-5, atol=1e-12,
    )


def test_user_block_frames_rounds_to_sublanes():
    """A non-multiple-of-8 block_frames must not reach the slab path's
    aligned dynamic load (Mosaic rejects unaligned bases on hardware)."""
    cfg = NAMED_CONFIGS["classic13"]
    b, _ = _batch(cfg)
    audio = jnp.asarray(b.audio)
    lengths = jnp.asarray(b.lengths)
    odd = fused_logmel_stages(
        audio, lengths, cfg, interpret=True, block_frames=100
    )
    ref100 = fused_logmel_stages(
        audio, lengths, cfg, interpret=True, block_frames=104
    )
    np.testing.assert_array_equal(
        np.asarray(odd["logmel"]), np.asarray(ref100["logmel"])
    )

# ---------------------------------------------------------------------------
# Frame-first conditioning (Kaldi feature-window order) in the fused kernel
# ---------------------------------------------------------------------------

from mfcc_tpu.config import FrontendConfig

CONDITIONING_CONFIGS = {
    "dc_only": FrontendConfig(remove_dc_offset=True),
    "raw_energy_pad_tail": FrontendConfig(energy_source="raw_frame", deltas=2),
    "windowed_energy_signal_preemph": FrontendConfig(
        energy_source="windowed_frame", preemph_mode="signal"
    ),
    "kaldi_windowed_energy": NAMED_CONFIGS["kaldi_mfcc"].replace(
        energy_source="windowed_frame"
    ),
    "frame_longer_than_nfft": FrontendConfig(
        win_len_s=0.040, n_fft=512, frame_tail="drop", preemph_mode="frame",
        remove_dc_offset=True, energy_source="raw_frame",
    ),
    "kaldi_energy_floor": NAMED_CONFIGS["kaldi_mfcc"].replace(energy_floor=1e-3),
}


def _twin_gate(cfg, audio, lengths, **fused_kw):
    twin = chain.logmel_stages(audio, lengths, cfg)
    fused = fused_logmel_stages(audio, lengths, cfg, interpret=True, **fused_kw)
    lm_t = np.asarray(twin["logmel"], dtype=np.float64)
    lm_f = np.asarray(fused["logmel"], dtype=np.float64)
    mask = np.asarray(twin["frame_mask"], bool)[..., None]
    lin_t, lin_f = np.exp(lm_t), np.exp(lm_f)
    rowmax = lin_t.max(axis=-1, keepdims=True) + 1e-300
    loud = (lin_t > rowmax * 1e-4) & mask
    assert (np.abs(lm_f - lm_t) * loud).max() < 2e-5
    # 2e-5 (vs the 1e-5 unconditioned-kernel gate): the conditioning pass
    # adds a frame-domain subtract/shift before the DFT, whose fp32
    # roundoff order differs from the twin's rfft — measured worst case
    # 1.23e-5 on the golden signals, same class as the log-domain gate
    assert (np.abs(lin_f - lin_t) / rowmax * mask).max() < 2e-5
    fm = np.asarray(twin["frame_mask"], bool)
    np.testing.assert_allclose(
        np.asarray(fused["energy"])[fm], np.asarray(twin["energy"])[fm],
        rtol=1e-5, atol=1e-12,
    )


@pytest.mark.parametrize("name", sorted(CONDITIONING_CONFIGS))
def test_conditioning_kernel_matches_twin(name):
    """DC removal / frame preemph / frame-local energy run INSIDE the kernel
    (kernels/frontend._make_conditioning) and must match the jnp twin's
    frame-domain stages — including frames longer than n_fft (conditioning
    over the full frame length, DFT truncation after)."""
    cfg = CONDITIONING_CONFIGS[name]
    b, _ = _batch(cfg)
    _twin_gate(cfg, jnp.asarray(b.audio), jnp.asarray(b.lengths))


@pytest.mark.parametrize("dft_passes", ["fp32", "radix4"])
def test_conditioning_view_mode_matches_twin(monkeypatch, dft_passes):
    """View mode (slab VMEM budget exceeded) must route frame-mode preemph
    through the kernel's conditioning pass, NOT the XLA signal-preemph
    prologue — both dft paths."""
    from mfcc_tpu.kernels import frontend as fe

    monkeypatch.setattr(fe, "SLAB_VMEM_BUDGET_BYTES", 0)  # force view mode
    cfg = NAMED_CONFIGS["kaldi_mfcc"]
    b, _ = _batch(cfg)
    _twin_gate(
        cfg, jnp.asarray(b.audio), jnp.asarray(b.lengths), dft_passes=dft_passes
    )


def test_conditioning_energy_lane_replaces_matmul_column():
    """With a frame-local energy source the matmul energy column is zeroed
    in the constants and the epilogue writes max(E, eps) into lane M."""
    from mfcc_tpu.kernels.frontend import kernel_constants, radix4_constants

    cfg = FrontendConfig(energy_source="raw_frame")
    kd = kernel_constants(cfg)
    assert kd["mel"][:, cfg.n_mels].max() == 0.0
    kr = radix4_constants(cfg)
    assert kr["mel"][:, cfg.n_mels].max() == 0.0
    # pspec energy keeps the ones-column
    kp = kernel_constants(FrontendConfig())
    assert kp["mel"][: 2 * FrontendConfig().n_bins, FrontendConfig().n_mels].min() == 1.0


# -- Host slab feed (pipeline.device_layout -> pad_batch(layout=SlabLayout)) --

def _slab_parity(cfg, sigs, blen, atol=None, rtol=None):
    from mfcc_tpu.pipeline.batch import device_layout

    lay = device_layout(cfg, blen)
    assert lay is not None and hasattr(lay, "chunk"), cfg
    flat = pad_batch(sigs, cfg, bucket_len=blen)
    slab = pad_batch(sigs, cfg, bucket_len=blen, layout=lay)
    assert slab.audio.shape[1:] == lay.buffer_shape
    f_ref, m_ref = chain.extract_batch(
        jnp.asarray(flat.audio), jnp.asarray(flat.lengths), cfg, backend="jnp"
    )
    f_sl, m_sl = chain.extract_batch(
        jnp.asarray(slab.audio), jnp.asarray(slab.lengths), cfg,
        backend="pallas",
    )
    nv = np.asarray(m_ref).sum(axis=1).astype(int)
    np.testing.assert_array_equal(nv, np.asarray(m_sl).sum(axis=1).astype(int))
    for i in range(len(sigs)):
        np.testing.assert_allclose(
            np.asarray(f_sl)[i, : nv[i]], np.asarray(f_ref)[i, : nv[i]],
            atol=atol or FEATURE_ATOL_FP32, rtol=rtol or 1e-3,
        )


@pytest.mark.parametrize(
    "config_name",
    ["classic13_deltas", "logmel80", "kaldi_mfcc", "whisper80", "kaldi_plp"],
)
def test_slab_feed_matches_flat_jnp(config_name):
    """Host-built chunk slabs (standard AND reflect-extended center modes)
    through the fused kernel == the flat jnp twin on valid frames."""
    cfg = NAMED_CONFIGS[config_name]
    g = np.random.default_rng(31)
    sigs = [g.standard_normal(16000).astype(np.float32),
            g.standard_normal(6007).astype(np.float32)]
    _slab_parity(cfg, sigs, 16000)


def test_slab_feed_bucket_length_sweep():
    """The producer (slab_layout) and consumer (extract_batch) must agree
    on the slab geometry for any bucket length — the consumer recomputes
    block_frames from the slab's row count, and _fused_logmel_energy
    raises on any mismatch."""
    cfg = NAMED_CONFIGS["classic13"]
    g = np.random.default_rng(37)
    for blen in (400, 401, 1600, 4801, 16000, 40000, 163999):
        sigs = [g.standard_normal(blen).astype(np.float32)]
        _slab_parity(cfg, sigs, blen)


def test_slab_feed_int16_rows():
    """Standard-mode slabs carry raw samples: int16 rows stay exact and
    input_scale is applied on device."""
    cfg = NAMED_CONFIGS["classic13_deltas"].replace(input_scale=1.0 / 8.0)
    from mfcc_tpu.pipeline.batch import device_layout

    g = np.random.default_rng(41)
    pcm = (g.standard_normal(16000) * 3000).astype(np.int16)
    lay = device_layout(cfg, 16000)
    flat = pad_batch([pcm.astype(np.float32)], cfg, bucket_len=16000)
    # slab built from the int16 rows directly (i16 feed layout)
    import dataclasses as _dc

    slab_f32 = pad_batch([pcm.astype(np.float32)], cfg, bucket_len=16000,
                         layout=lay)
    slab_i16 = np.asarray(slab_f32.audio).astype(np.int16)
    f_ref, m = chain.extract_batch(
        jnp.asarray(flat.audio), jnp.asarray(flat.lengths), cfg, backend="jnp"
    )
    f_sl, _ = chain.extract_batch(
        jnp.asarray(slab_i16), jnp.asarray(slab_f32.lengths), cfg,
        backend="pallas",
    )
    nv = int(np.asarray(m)[0].sum())
    np.testing.assert_allclose(
        np.asarray(f_sl)[0, :nv], np.asarray(f_ref)[0, :nv],
        atol=FEATURE_ATOL_FP32, rtol=1e-3,
    )


def _i16_vs_f32_slab(cfg, pcms, blen):
    """int16 slab (in-kernel convert) vs fp32 slab of the same PCM: the
    i16→f32 conversion is exact and everything downstream is identical
    code, so the outputs must agree BITWISE (VERDICT r4 item 1 gate)."""
    from mfcc_tpu.pipeline.batch import device_layout

    lay = device_layout(cfg, blen)
    assert lay is not None and hasattr(lay, "chunk") and not lay.extended
    slab_f32 = pad_batch([p.astype(np.float32) for p in pcms], cfg,
                         bucket_len=blen, layout=lay)
    slab_i16 = np.asarray(slab_f32.audio).astype(np.int16)
    f_f32, _ = chain.extract_batch(
        jnp.asarray(slab_f32.audio), jnp.asarray(slab_f32.lengths), cfg,
        backend="pallas",
    )
    f_i16, _ = chain.extract_batch(
        jnp.asarray(slab_i16), jnp.asarray(slab_f32.lengths), cfg,
        backend="pallas",
    )
    np.testing.assert_array_equal(np.asarray(f_i16), np.asarray(f_f32))


@pytest.mark.parametrize(
    "config_name", ["classic13_deltas", "logmel80", "kaldi_fbank", "ssc26"]
)
def test_slab_i16_bitwise_parity(config_name):
    cfg = NAMED_CONFIGS[config_name]
    g = np.random.default_rng(47)
    pcms = [(g.standard_normal(16000) * 3000).astype(np.int16),
            (g.standard_normal(6007) * 3000).astype(np.int16)]
    _i16_vs_f32_slab(cfg, pcms, 16000)


def test_slab_i16_parity_scaled():
    """input_scale rides the in-kernel convert for int16 slabs. With BOTH
    a scale multiply and in-kernel pre-emphasis, the compiler may FMA-
    contract (x·s) − a·(x_prev·s) differently between the two structurally
    different programs, so the gate is ulp-tight tolerance, not bitwise
    (measured: exact with either scale=1 or preemph=0; ~1e-5 in log space
    with both — pure FMA scheduling, not math). Every NAMED i16-eligible
    config has input_scale == 1.0 and keeps the bitwise gate above."""
    cfg = NAMED_CONFIGS["classic13"].replace(input_scale=1.0 / 32768.0)
    from mfcc_tpu.pipeline.batch import device_layout

    g = np.random.default_rng(53)
    pcm = (g.standard_normal(9601) * 12000).astype(np.int16)
    lay = device_layout(cfg, 16000)
    slab_f32 = pad_batch([pcm.astype(np.float32)], cfg, bucket_len=16000,
                         layout=lay)
    slab_i16 = np.asarray(slab_f32.audio).astype(np.int16)
    f_f32, _ = chain.extract_batch(
        jnp.asarray(slab_f32.audio), jnp.asarray(slab_f32.lengths), cfg,
        backend="pallas",
    )
    f_i16, _ = chain.extract_batch(
        jnp.asarray(slab_i16), jnp.asarray(slab_f32.lengths), cfg,
        backend="pallas",
    )
    np.testing.assert_allclose(
        np.asarray(f_i16), np.asarray(f_f32), atol=5e-5, rtol=1e-5
    )


def test_slab_i16_bitwise_parity_multiblock():
    """A >1-block slab exercises the dynamic (nonzero) load base on the
    packed dtype: 330k samples -> 2063 frames -> two 2048-frame blocks."""
    cfg = NAMED_CONFIGS["classic13"]
    g = np.random.default_rng(59)
    n = 330000
    pcms = [(g.standard_normal(n) * 3000).astype(np.int16)]
    _i16_vs_f32_slab(cfg, pcms, n)


def test_slab_i16_bitwise_parity_dither():
    """In-kernel dither runs AFTER the i16 convert on the same field the
    fp32 slab sees — noise draws keyed by (row, lane) are identical, so
    parity stays bitwise."""
    cfg = NAMED_CONFIGS["classic13"].replace(dither=1.0, dither_seed=7)
    g = np.random.default_rng(61)
    pcms = [(g.standard_normal(8000) * 3000).astype(np.int16)]
    _i16_vs_f32_slab(cfg, pcms, 16000)


def test_slab_feed_requires_pallas_backend():
    cfg = NAMED_CONFIGS["classic13"]
    from mfcc_tpu.pipeline.batch import device_layout

    lay = device_layout(cfg, 16000)
    g = np.random.default_rng(43)
    slab = pad_batch([g.standard_normal(16000).astype(np.float32)], cfg,
                     bucket_len=16000, layout=lay)
    with pytest.raises(ValueError, match="requires.*pallas"):
        chain.extract_batch(
            jnp.asarray(slab.audio), jnp.asarray(slab.lengths), cfg,
            backend="jnp",
        )


def test_host_extend_matches_xla_reflect():
    """SlabLayout.host_rows (numpy) == kernels.frontend._reflect_extend
    (XLA) on the extension region, both center modes, odd lengths."""
    from mfcc_tpu.kernels import frontend as fe

    g = np.random.default_rng(47)
    for mode in ("center", "center_reflect"):
        cfg = NAMED_CONFIGS["whisper80"].replace(frame_tail=mode)
        lay = fe.slab_layout(cfg, 16000)
        assert lay is not None and lay.extended
        for n in (1, 2, 399, 400, 401, 16000):
            u = g.standard_normal(n).astype(np.float32)
            host = lay.host_rows(cfg, u)
            a = jnp.asarray(u * np.float32(cfg.input_scale))[None, :]
            ext, new_len = fe._reflect_extend(
                jnp.asarray(u)[None, :] * 0 + a,  # scale applied like host
                jnp.asarray([n], jnp.int32), cfg,
            )
            m = min(host.shape[0], int(new_len[0]))
            np.testing.assert_allclose(
                host[:m], np.asarray(ext)[0, :m], atol=2e-7, rtol=1e-6
            )


def test_radix4_nonaligned_n2_constants():
    """n_fft=400 (N2=100, whisper) now rides the radix-4 factorization:
    applicability, full bin coverage, and golden parity via the existing
    whisper gates."""
    from mfcc_tpu.kernels.frontend import radix4_applicable, radix4_constants

    cfg = NAMED_CONFIGS["whisper80"]
    assert cfg.n_fft == 400 and radix4_applicable(cfg)
    k = radix4_constants(cfg)
    nc, S, n2, mp = k["dims"]
    assert n2 == 100 and (k["lanes_per_bin"] > 0).all()
    # odd N2 stays on the direct path
    assert not radix4_applicable(NAMED_CONFIGS["classic13"].replace(n_fft=404))


# ---------------------------------------------------------------------------
# r4 fused cepstral tail (OPT-IN): DCT·lifter·energy + Δ/ΔΔ + CMVN in-kernel
# ---------------------------------------------------------------------------
# Measured on v5e (slab path, interleaved medians): tail-on 0.81 ms vs
# tail-off 0.67 at b64 x 10 s — the in-kernel tail pays MXU K-quantization
# (a 128-wide 6-pass matmul for a 27-row x 39-col problem), ~30 serialized
# VPU passes, and a 39-lane output relayout; XLA's epilogue overlaps all of
# that better. The mode therefore stays OPT-IN (feature_tail=True) with
# full equivalence gates, as a base for future fusion work (docs/KERNEL.md
# §5). These tests pin its correctness.

_TAIL_CASES = {
    "deltas2": dict(name="classic13_deltas"),
    "deltas2_cmvn": dict(name="classic13_deltas", cmvn="utterance"),
    "deltas1": dict(name="classic13", deltas=1),
    "plain13": dict(name="classic13"),
    "no_energy": dict(name="classic13", append_energy=False),
    "kaldi": dict(name="kaldi_mfcc"),
    "kaldi_dither": dict(name="kaldi_mfcc", dither=1.0, dither_seed=5),
    "kaldi_floor": dict(name="kaldi_mfcc", energy_floor=1e-3),
    "kaldi_center": dict(name="kaldi_mfcc", frame_tail="center"),
}


def _extract_tail(audio, lengths, cfg):
    from mfcc_tpu.kernels import fused_logmel_stages

    st = fused_logmel_stages(
        audio, lengths, cfg, interpret=True, feature_tail=True
    )
    assert "features_fused" in st
    feat = chain.features_from_logmel(st, cfg)[:, : st["num_frames"]]
    return feat, st["frame_mask"]


@pytest.mark.parametrize("case", sorted(_TAIL_CASES))
def test_fused_tail_matches_twin(case):
    """The opt-in in-kernel cepstral tail (single frame block) reproduces
    the twin's features_from_logmel + delta + cmvn chain, including the
    valid-boundary tail replication on short/padded utterances."""
    from mfcc_tpu.kernels import frontend as fe

    kw = dict(_TAIL_CASES[case])
    cfg = NAMED_CONFIGS[kw.pop("name")].replace(**kw)
    assert fe.fused_tail_reason(cfg) is None
    sigs = golden_signals()
    xs = [sigs["speechish"], sigs["short"], np.zeros(700), sigs["noise"]]
    b = pad_batch(xs, cfg, bucket_len=max(s.shape[0] for s in xs))
    audio, lengths = jnp.asarray(b.audio), jnp.asarray(b.lengths)
    F = cfg.num_frames(audio.shape[-1])
    assert fe.fused_tail_active(cfg, F)

    fj, mj = chain.extract_batch(audio, lengths, cfg, backend="jnp")
    fp_, mp_ = _extract_tail(audio, lengths, cfg)
    fj, fp_ = np.asarray(fj), np.asarray(fp_)
    np.testing.assert_array_equal(np.asarray(mj), np.asarray(mp_))
    # same gates as the existing cepstra path: fp32 op-order differences
    # between Mosaic HIGHEST and XLA HIGHEST matmuls + the DFT lineage
    scale = np.abs(fj).max()
    np.testing.assert_allclose(fp_, fj, atol=max(2e-4, 2e-5 * scale), rtol=0)
    # pad frames exactly zero
    assert (fp_ * (1 - np.asarray(mp_))[..., None] == 0).all()


def test_fused_tail_opt_in_and_routing():
    """Default path never activates the tail (it measured slower than the
    XLA epilogue); feature_tail=True activates it only where eligible, and
    fused_tail_active rejects multi-block / non-mfcc configs."""
    from mfcc_tpu.kernels import frontend as fe, fused_logmel_stages

    cfg = NAMED_CONFIGS["classic13_deltas"]
    assert fe.fused_tail_active(cfg, 999)
    assert not fe.fused_tail_active(cfg, 4000)  # beyond the largest block candidate: multi-block
    for name in ("logmel80", "kaldi_plp", "ssc26"):
        assert fe.fused_tail_reason(NAMED_CONFIGS[name]) is not None

    g = np.random.default_rng(3)
    b = pad_batch([g.standard_normal(16000) * 0.3], cfg)
    audio, lengths = jnp.asarray(b.audio), jnp.asarray(b.lengths)
    st = fused_logmel_stages(audio, lengths, cfg, interpret=True)
    assert "features_fused" not in st and "logmel" in st
    # opt-in on an INELIGIBLE geometry quietly falls back
    g2 = np.random.default_rng(4)
    b2 = pad_batch([g2.standard_normal(16000 * 15) * 0.3], cfg)
    st2 = fused_logmel_stages(
        jnp.asarray(b2.audio), jnp.asarray(b2.lengths), cfg,
        interpret=True, feature_tail=True,
    )
    assert "features_fused" not in st2
