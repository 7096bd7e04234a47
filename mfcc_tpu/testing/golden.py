"""Golden-vector generation and loading (SURVEY.md Appendix D step 3).

Goldens are per-(config, signal) `.npz` files holding every intermediate
stage of the float64 oracle, keyed by the config hash so a convention change
invalidates them loudly instead of silently. They are deterministic
(seeded generators, no timestamps), so regeneration is reproducible and the
files can live in git.

Gate (SURVEY.md §4.2 item 1): atol 1e-4 on log-mel/cepstra/features, tighter
(1e-6 relative) upstream on pspec.
"""

from __future__ import annotations

import pathlib

import numpy as np

from mfcc_tpu.config import NAMED_CONFIGS, FrontendConfig
from mfcc_tpu.ops import reference_numpy as ref

GOLDEN_DIR = pathlib.Path(__file__).resolve().parent / "golden"

# Which stages to freeze per config (features + the localizing intermediates).
_STAGES = ("pspec", "energy", "logmel", "base", "features")


def golden_signals(sr: int = 16000) -> dict[str, np.ndarray]:
    """The deterministic synthetic signal set. Mirrors tests/conftest.py."""
    g = np.random.default_rng(1234)
    t = np.arange(int(1.0 * sr)) / sr
    sigs = {
        "impulse": np.zeros(sr // 4),
        "dc": np.full(sr // 2, 0.5),
        "tone_bin": np.sin(2 * np.pi * (sr / 512 * 32) * t),
        "tone_offbin": np.sin(2 * np.pi * 441.3 * t),
        "chirp": np.sin(2 * np.pi * (200 + 3000 * t) * t),
        "noise": g.standard_normal(int(2.5 * sr)),
        "zeros": np.zeros(sr),
        "short": g.standard_normal(123),
        "speechish": (
            0.6 * np.sin(2 * np.pi * 120 * t) * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))
            + 0.1 * g.standard_normal(t.shape[0])
        ),
    }
    sigs["impulse"][100] = 1.0
    return {k: v.astype(np.float64) for k, v in sigs.items()}


def _golden_path(config_name: str, signal_name: str) -> pathlib.Path:
    return GOLDEN_DIR / f"{config_name}__{signal_name}.npz"


def generate_goldens(configs: dict[str, FrontendConfig] | None = None) -> list[pathlib.Path]:
    """Run the oracle over every (config, signal) pair and freeze stages."""
    configs = configs or NAMED_CONFIGS
    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    written = []
    for cname, cfg in configs.items():
        sr = cfg.input_sample_rate or cfg.sample_rate
        for sname, sig in golden_signals(sr).items():
            if cfg.input_scale != 1.0:
                # configs defined on [-1, 1) audio (input_scale=1/32768,
                # e.g. whisper80) get the signals at int16 scale so the
                # goldens exercise realistic levels, not the log floor
                sig = sig * 8192.0
            sig_input = sig
            if cfg.input_sample_rate and cfg.input_sample_rate != cfg.sample_rate:
                # the oracle chain is defined at the target rate; the
                # resample oracle is scipy.resample_poly, which the jnp
                # resampler matches to 1e-15 (tests/test_resample.py).
                sig = _oracle_resample(sig, cfg.input_sample_rate, cfg.sample_rate)
            stages = ref.extract_stages(sig, cfg)
            payload = {k: stages[k] for k in _STAGES if k in stages}
            payload["signal"] = sig
            payload["signal_input"] = sig_input  # at cfg.input_sample_rate
            payload["config_hash"] = np.array(cfg.config_hash())
            path = _golden_path(cname, sname)
            np.savez_compressed(path, **payload)
            written.append(path)
    return written


def _oracle_resample(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Oracle-side resampler = scipy.signal.resample_poly (the on-disk ground
    truth the jnp polyphase resampler must match, SP _signaltools.py:3866)."""
    import math

    import scipy.signal

    g = math.gcd(sr_in, sr_out)
    return scipy.signal.resample_poly(x, sr_out // g, sr_in // g)


def load_golden(config_name: str, signal_name: str) -> dict[str, np.ndarray]:
    path = _golden_path(config_name, signal_name)
    if not path.exists():
        raise FileNotFoundError(
            f"golden {path} missing — run python -m mfcc_tpu.testing.golden"
        )
    with np.load(path, allow_pickle=False) as z:
        data = {k: z[k] for k in z.files}
    cfg = NAMED_CONFIGS[config_name]
    stored = str(data["config_hash"])
    if stored != cfg.config_hash():
        raise RuntimeError(
            f"golden {path} was frozen for config hash {stored}, current is "
            f"{cfg.config_hash()} — regenerate goldens"
        )
    return data


if __name__ == "__main__":
    paths = generate_goldens()
    print(f"wrote {len(paths)} goldens under {GOLDEN_DIR}")
