"""Sharded batch extraction: shard_map of the feature chain over the data
mesh.

The chain has no cross-utterance coupling (except global CMVN moments), so
sharding is pure DP — and it is made *explicit* with shard_map rather than
left to the pjit partitioner: XLA's FFT partitioning rule all-gathers the
full batch onto every device (observed in the compiled HLO on the 8-device
test mesh — a total scaling collapse for the rfft backend). Under
shard_map every stage runs on its local shard by construction, and the only
collective is the psum of the CMVN moment triple (SURVEY.md §2.3); the HLO
is asserted collective-free in tests/test_structure.py.
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
    jax.jit,
    static_argnames=("cfg", "backend", "mesh", "with_moments",
                     "input_layout"),
)
def _sharded_extract(audio, lengths, cfg, backend, mesh, with_moments,
                     input_layout):
    def local_step(a, l):
        feat, mask = chain.extract_batch(
            a, l, cfg, backend=backend, input_layout=input_layout
        )
        if with_moments == "per_utterance":
            # speaker CMVN: [B, D] triples shard with the batch; the host
            # groups rows by speaker — no collective needed
            return (feat, mask) + cmvn_mod.utterance_moments(feat, mask)
        if with_moments:
            s1, s2, n = cmvn_mod.batch_moments(feat, mask)
            s1 = jax.lax.psum(s1, DATA_AXIS)
            s2 = jax.lax.psum(s2, DATA_AXIS)
            n = jax.lax.psum(n, DATA_AXIS)
            return feat, mask, s1, s2, n
        return feat, mask

    data, rep = P(DATA_AXIS), P()
    if with_moments == "per_utterance":
        out_specs = (data, data, data, data, data)
    elif with_moments:
        out_specs = (data, data, rep, rep, rep)
    else:
        out_specs = (data, data)
    # check_vma=False: pallas_call's ShapeDtypeStruct outputs carry no vma
    # annotation, which the shard_map varying-axis checker rejects; the
    # specs above are the full truth (batch-sharded outputs, replicated
    # moments) so the check adds nothing here.
    out = jax.shard_map(
        local_step, mesh=mesh, in_specs=(data, data), out_specs=out_specs,
        check_vma=False,
    )(audio, lengths)
    if with_moments:
        feat, mask, s1, s2, n = out
        return feat, mask, (s1, s2, n)
    feat, mask = out
    return feat, mask, None


def sharded_extract_batch(
    audio,
    lengths,
    cfg: FrontendConfig,
    mesh: Mesh,
    backend: str = "jnp",
    with_moments: bool | str = False,
    input_layout: str = "auto",
):
    """Extract features with the batch sharded over mesh axis "data".

    audio: [B, T] with B divisible by the data-axis size (pipeline.pad_batch
    pad_batch_to handles this); lengths: [B]. Returns (features, frame_mask,
    moments-or-None); with_moments=True gives the replicated global
    (Σx[D], Σx²[D], n) triple, "per_utterance" the batch-sharded
    (Σx[B, D], Σx²[B, D], n[B]) triples (speaker CMVN).
    input_layout: passed through to chain.extract_batch (layout-aware
    callers resolve the 44.1 kHz blocked-vs-rs-slab shape ambiguity with
    pipeline.layout_kind).
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
    return _sharded_extract(
        audio, lengths, cfg, backend, mesh, with_moments, input_layout
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "backend", "mesh", "iters")
)
def _sharded_steps(audio, lengths, cfg, backend, mesh, iters):
    """iters chained extraction steps inside ONE jit (lax.scan), returning a
    scalar — the only honest timing construction on relayed TPU devices
    (block_until_ready does not wait through the relay; see
    .claude/skills/verify/SKILL.md). Input is perturbed per iteration so XLA
    cannot hoist the body out of the loop."""

    def local_steps(a, l):
        def body(_, i):
            feat, _ = chain.extract_batch(
                a * (1.0 + 1e-6 * i), l, cfg, backend=backend
            )
            return 0, feat.sum()

        _, outs = jax.lax.scan(
            body, 0, jnp.arange(iters, dtype=jnp.float32)
        )
        return outs.sum()[None]  # rank-1 so out_specs can shard it

    data = P(DATA_AXIS)
    per_shard = jax.shard_map(
        local_steps, mesh=mesh, in_specs=(data, data), out_specs=data,
        check_vma=False,
    )(audio, lengths)
    return per_shard.sum()


def sharded_extract_steps(
    audio, lengths, cfg: FrontendConfig, mesh: Mesh,
    backend: str = "jnp", iters: int = 10,
):
    """Benchmark helper: run `iters` chained sharded extraction steps and
    return a forced scalar (scripts/bench_scaling.py)."""
    shard = NamedSharding(mesh, P(DATA_AXIS))
    audio = jax.device_put(audio, shard)
    lengths = jax.device_put(lengths, shard)
    return float(_sharded_steps(audio, lengths, cfg, backend, mesh, iters))
