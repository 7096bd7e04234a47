"""Test env: force JAX onto CPU with 8 virtual devices BEFORE jax imports,
so the data-parallel mesh / collective tests run without TPU hardware
(SURVEY.md §4.2 item 6). Real-TPU behaviour is exercised by bench.py and the
driver's dryrun; numerics are platform-independent.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# float64 support for oracle-vs-jnp comparisons that want it.
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The axon sitecustomize force-sets jax_platforms="axon,cpu" at interpreter
# start (overriding JAX_PLATFORMS), which would route every test through the
# tunneled TPU. Override it back before any backend initializes.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def synth_signals(sr: int = 16000) -> dict[str, np.ndarray]:
    """Deterministic synthetic test signals (SURVEY.md §4.2 item 1)."""
    g = np.random.default_rng(1234)
    t = np.arange(int(1.0 * sr)) / sr
    sigs = {
        "impulse": np.zeros(sr // 4),
        "dc": np.full(sr // 2, 0.5),
        "tone_bin": np.sin(2 * np.pi * (sr / 512 * 32) * t),  # exactly bin 32
        "tone_offbin": np.sin(2 * np.pi * 441.3 * t),
        "chirp": np.sin(2 * np.pi * (200 + 3000 * t) * t),
        "noise": g.standard_normal(int(2.5 * sr)),
        "zeros": np.zeros(sr),
        "short": g.standard_normal(123),  # < 1 frame
        "speechish": (
            0.6 * np.sin(2 * np.pi * 120 * t) * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))
            + 0.1 * g.standard_normal(t.shape[0])
        ),
    }
    sigs["impulse"][100] = 1.0
    return {k: v.astype(np.float64) for k, v in sigs.items()}


@pytest.fixture(scope="session")
def signals():
    return synth_signals()
