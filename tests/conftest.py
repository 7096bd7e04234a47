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

# single source of truth for the deterministic signal set — keeping a copy
# here would let tests and frozen goldens drift apart silently
from mfcc_tpu.testing.golden import golden_signals as synth_signals  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def signals():
    return synth_signals()
