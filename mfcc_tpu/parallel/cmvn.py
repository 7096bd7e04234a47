"""Global (corpus-level) CMVN: moment accumulation + application.

The single collective of the whole framework (SURVEY.md §2.3): masked
moment triples (Σx, Σx², n) reduced over the global batch. Under pjit the
``jnp.sum`` over a data-sharded batch lowers to the psum automatically; the
host-side accumulator then folds batches (and hosts' checkpoints) together
for streaming corpora, with an .npz checkpoint so a restarted run resumes
the reduction (SURVEY.md §5 checkpoint/resume row).

Oracle algebra: ops.reference_numpy.cmvn_from_moments.
"""

from __future__ import annotations

import dataclasses
import pathlib

import jax.numpy as jnp
import numpy as np

from mfcc_tpu.config import FrontendConfig


def batch_moments(feat: jnp.ndarray, frame_mask: jnp.ndarray):
    """Masked moment triple of a (possibly sharded) batch.

    feat: [B, F, D]; frame_mask: [B, F]. Returns (s1[D], s2[D], n[]) summed
    over batch and frames — under pjit over a data-sharded batch these are
    global sums (XLA inserts the cross-chip reduction).
    """
    m = frame_mask[..., None].astype(feat.dtype)
    s1 = (feat * m).sum(axis=(0, 1))
    s2 = (jnp.square(feat) * m).sum(axis=(0, 1))
    n = frame_mask.sum()
    return s1, s2, n


@dataclasses.dataclass
class CmvnStats:
    """Finalized corpus statistics."""

    mean: np.ndarray  # [D]
    std: np.ndarray  # [D] (sqrt(var + eps))
    n: float


class CmvnAccumulator:
    """Streaming (Σx, Σx², n) accumulator with checkpoint/resume."""

    def __init__(self, dim: int):
        self.s1 = np.zeros(dim, dtype=np.float64)
        self.s2 = np.zeros(dim, dtype=np.float64)
        self.n = 0.0

    def add(self, s1, s2, n) -> None:
        self.s1 += np.asarray(s1, dtype=np.float64)
        self.s2 += np.asarray(s2, dtype=np.float64)
        self.n += float(n)

    def merge(self, other: "CmvnAccumulator") -> None:
        self.add(other.s1, other.s2, other.n)

    def finalize(self, cfg: FrontendConfig) -> CmvnStats:
        if self.n <= 0:
            raise ValueError("no frames accumulated")
        mean = self.s1 / self.n
        var = self.s2 / self.n - mean * mean
        return CmvnStats(
            mean=mean, std=np.sqrt(np.maximum(var, 0.0) + cfg.cmvn_eps), n=self.n
        )

    # -- checkpointing ------------------------------------------------------

    def save(self, path: str | pathlib.Path) -> None:
        np.savez(path, s1=self.s1, s2=self.s2, n=np.float64(self.n))

    @classmethod
    def load(cls, path: str | pathlib.Path) -> "CmvnAccumulator":
        with np.load(path) as z:
            acc = cls(z["s1"].shape[0])
            acc.s1[:] = z["s1"]
            acc.s2[:] = z["s2"]
            acc.n = float(z["n"])
        return acc


def apply_cmvn(
    feat: jnp.ndarray,
    frame_mask: jnp.ndarray,
    mean: jnp.ndarray,
    std: jnp.ndarray,
    var_norm: bool = True,
) -> jnp.ndarray:
    """Apply finalized global stats; pad frames stay exactly zero."""
    out = feat - mean
    if var_norm:
        out = out / std
    return out * frame_mask[..., None].astype(feat.dtype)
