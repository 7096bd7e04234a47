"""Structural guarantees (SURVEY.md §4.2 item 7 'scaling structure'):

The extraction step must be embarrassingly parallel — its compiled HLO over
the 8-device mesh must contain NO cross-device collectives unless CMVN
moments are requested, and then only the moment reduction. This is what
makes ≥90% scaling efficiency a property of the program, not a tuning
outcome: zero hot-path communication.

Plus: profiler tracing smoke, stage-time fencing, feeder fault injection.
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mfcc_tpu.config import NAMED_CONFIGS
from mfcc_tpu.parallel import data_mesh
from mfcc_tpu.parallel.extract import _sharded_extract
from mfcc_tpu.pipeline import pad_batch
from mfcc_tpu.testing.golden import golden_signals

COLLECTIVES = re.compile(
    r"all-reduce|all-gather|all-to-all|collective-permute|reduce-scatter"
)


def _compiled_text(cfg, mesh, with_moments):
    sigs = golden_signals()
    b = pad_batch([sigs["noise"]] * 8, cfg, bucket_len=sigs["noise"].shape[0])
    from jax.sharding import NamedSharding, PartitionSpec as P

    shard = NamedSharding(mesh, P("data"))
    audio = jax.device_put(jnp.asarray(b.audio), shard)
    lengths = jax.device_put(jnp.asarray(b.lengths), shard)
    lowered = _sharded_extract.lower(
        audio, lengths, cfg, "jnp", mesh, with_moments, "auto"
    )
    return lowered.compile().as_text()


def test_no_collectives_without_moments():
    mesh = data_mesh(8)
    txt = _compiled_text(NAMED_CONFIGS["classic13_deltas"], mesh, False)
    assert not COLLECTIVES.search(txt), (
        "hot path contains a collective: " + COLLECTIVES.search(txt).group(0)
    )


def test_only_moment_reduction_with_moments():
    mesh = data_mesh(8)
    txt = _compiled_text(NAMED_CONFIGS["classic13_deltas_gcmvn"], mesh, True)
    found = set(COLLECTIVES.findall(txt))
    assert found <= {"all-reduce", "all-gather"}, found
    assert found, "moment reduction should require a collective"


def test_trace_smoke(tmp_path):
    from mfcc_tpu.utils import trace as trace_mod

    with trace_mod.trace(str(tmp_path / "trace")):
        with trace_mod.annotate("unit-test-span"):
            jnp.zeros((8, 8)).sum().block_until_ready()
    assert any((tmp_path / "trace").rglob("*")), "no trace artifacts written"


def test_stage_times_fenced():
    from mfcc_tpu.utils.trace import stage_times

    cfg = NAMED_CONFIGS["classic13_deltas"]
    sigs = golden_signals()
    b = pad_batch([sigs["short"]], cfg, bucket_len=600)
    times = stage_times(jnp.asarray(b.audio), jnp.asarray(b.lengths), cfg,
                        backend="jnp", reps=1)
    assert set(times) == {"preemph", "logmel", "full", "features_minus_logmel"}
    assert all(v >= 0 for v in times.values())


def test_feeder_thread_death_does_not_hang(tmp_path, monkeypatch):
    """Fault injection (SURVEY.md §5): a decode worker that dies mid-file
    must not deadlock the stream — remaining files still come through."""
    from mfcc_tpu.io import DecodeStats, write_wav
    from mfcc_tpu.io import reader as reader_mod

    cfg = NAMED_CONFIGS["classic13"]
    paths = []
    for i in range(6):
        p = tmp_path / f"u{i}.wav"
        write_wav(p, 16000, np.zeros(4000, np.int16))
        paths.append(p)

    real_read = reader_mod.wav.read_wav
    calls = {"n": 0}

    def flaky_read(path, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise MemoryError("injected worker death")  # not in except-list
        return real_read(path, **kw)

    monkeypatch.setattr(reader_mod.wav, "read_wav", flaky_read)
    stats = DecodeStats()
    got = list(
        reader_mod.decode_stream(paths, cfg, num_threads=2, stats=stats)
    )
    # the poisoned file is lost with its thread, everything else arrives
    assert len(got) == 5
    assert stats.decoded == 5
