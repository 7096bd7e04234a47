"""Sharded batch extraction: pjit of the feature chain over the data mesh.

The chain has no cross-utterance coupling (except global CMVN moments), so
sharding is pure DP: in_shardings split the batch axis, every stage runs
locally, and only `batch_moments` (when requested) reduces across chips
(SURVEY.md §3.4 planned call stack).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mfcc_tpu.config import FrontendConfig
from mfcc_tpu.ops import chain
from mfcc_tpu.parallel import cmvn as cmvn_mod
from mfcc_tpu.parallel.mesh import DATA_AXIS


@functools.partial(
    jax.jit, static_argnames=("cfg", "backend", "mesh", "with_moments")
)
def _sharded_extract(audio, lengths, cfg, backend, mesh, with_moments):
    feat, mask = chain.extract_batch(audio, lengths, cfg, backend=backend)
    shard = NamedSharding(mesh, P(DATA_AXIS))
    feat = jax.lax.with_sharding_constraint(feat, shard)
    if with_moments:
        s1, s2, n = cmvn_mod.batch_moments(feat, mask)
        return feat, mask, (s1, s2, n)
    return feat, mask, None


def sharded_extract_batch(
    audio,
    lengths,
    cfg: FrontendConfig,
    mesh: Mesh,
    backend: str = "jnp",
    with_moments: bool = False,
):
    """Extract features with the batch sharded over mesh axis "data".

    audio: [B, T] with B divisible by the data-axis size (pipeline.pad_batch
    pad_batch_to handles this); lengths: [B]. Returns (features, frame_mask,
    moments-or-None); moments are the replicated global (Σx, Σx², n).
    """
    d = mesh.shape[DATA_AXIS]
    if audio.shape[0] % d != 0:
        raise ValueError(
            f"batch {audio.shape[0]} not divisible by data axis {d}; "
            "pad with pipeline.pad_batch(pad_batch_to=...)"
        )
    shard = NamedSharding(mesh, P(DATA_AXIS))
    audio = jax.device_put(audio, shard)
    lengths = jax.device_put(lengths, shard)
    return _sharded_extract(audio, lengths, cfg, backend, mesh, with_moments)
