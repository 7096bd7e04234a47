"""Convention-matrix certification (SURVEY.md Appendix C): every knob of
FrontendConfig is exercised against the float64 oracle at 1e-10 — proving
the jnp chain implements each convention exactly, not just the five named
configs. A Pallas spot-check runs the same variants through the fused
kernel's fp32 path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mfcc_tpu.config import FrontendConfig
from mfcc_tpu.ops import chain, reference_numpy as ref
from mfcc_tpu.testing.golden import golden_signals

VARIANTS = {
    "hann_sym": dict(window="hann_sym"),
    "hamming_periodic": dict(window="hamming_periodic"),
    "rect": dict(window="rect"),
    "blackman": dict(window="blackman_sym"),
    "povey": dict(window="povey"),
    "tf_mel": dict(mel_variant="tf_continuous"),
    "mel_range": dict(mel_low_hz=125.0, mel_high_hz=7200.0),
    "drop_tail": dict(frame_tail="drop"),
    "db_log": dict(log_kind="db"),
    "ln_stab": dict(log_kind="ln_stab"),
    "htk_dct": dict(dct_norm="htk"),
    "no_lifter": dict(lifter=0),
    "no_energy": dict(append_energy=False),
    "no_preemph": dict(preemph=0.0),
    "cmvn_utt": dict(cmvn="utterance", deltas=2),
    "cmvn_novar": dict(cmvn="utterance", cmvn_var_norm=False),
    "delta1": dict(deltas=1),
    "wide_delta": dict(deltas=2, delta_window=4),
    "ssc": dict(features="ssc"),
    "ssc_deltas_cmvn": dict(features="ssc", deltas=2, cmvn="utterance"),
    "n20_mels": dict(n_mels=20, n_ceps=20),
    "nfft1024": dict(n_fft=1024),
    "hop20ms": dict(hop_s=0.020),
    "win50ms": dict(win_len_s=0.050, n_fft=1024),
    "scale_off": dict(power_scale_nfft=False),
    "8khz": dict(sample_rate=8000),
}


@pytest.mark.parametrize("name", sorted(VARIANTS))
def test_variant_fp64_exact(name):
    cfg = FrontendConfig(dtype="float64", **VARIANTS[name])
    sigs = golden_signals(cfg.sample_rate)
    with jax.enable_x64(True):
        for sname in ("speechish", "short"):
            sig = sigs[sname]
            want = ref.extract(sig, cfg)
            got = chain.extract_single(sig, cfg)
            assert got.shape == want.shape, (name, got.shape, want.shape)
            np.testing.assert_allclose(
                got, want, atol=1e-10, rtol=1e-10,
                err_msg=f"variant {name} signal {sname}",
            )


PALLAS_VARIANTS = [
    "rect", "db_log", "drop_tail", "htk_dct", "no_energy", "nfft1024",
    "hop20ms", "scale_off", "n20_mels",
]


@pytest.mark.parametrize("name", PALLAS_VARIANTS)
def test_variant_pallas_matches_jnp(name):
    """Fused kernel (interpret mode) agrees with the jnp twin for the same
    convention variants in fp32."""
    cfg = FrontendConfig(**VARIANTS[name])
    sigs = golden_signals(cfg.sample_rate)
    sig = sigs["speechish"]
    got = chain.extract_single(sig, cfg, backend="pallas")
    want = chain.extract_single(sig, cfg, backend="jnp")
    assert got.shape == want.shape
    np.testing.assert_allclose(
        got, want, atol=5e-4, rtol=1e-3, err_msg=f"variant {name}"
    )
