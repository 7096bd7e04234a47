"""Feed-pipeline robustness (full-repo review findings): slab release on
resume, dead-worker respawn, ordered-map sentinel deadlock, the
file-changed (TOCTOU) decode guard, and mp-pool reference counting."""

import json
import time

import numpy as np
import pytest

from mfcc_tpu.cli.main import main as cli_entry
from mfcc_tpu.config import named_config
from mfcc_tpu.io import reader, write_wav
from mfcc_tpu.io.wav import _native


@pytest.fixture()
def corpus(tmp_path):
    g = np.random.default_rng(83)
    paths = []
    for i in range(10):
        p = tmp_path / f"u{i}.wav"
        write_wav(p, 16000, (g.standard_normal(4000 + 160 * i) * 2000)
                  .astype(np.int16))
        paths.append(str(p))
    return paths


def test_resume_releases_batches(corpus, tmp_path, monkeypatch):
    """Skipped (resume) batches must release their slabs — otherwise a
    resumed mp-feed run accumulates one /dev/shm file per skipped batch."""
    from mfcc_tpu.pipeline.batch import Batch

    out = tmp_path / "feats"
    argv = ["extract", *corpus, "--config", "classic13", "-o", str(out),
            "--backend", "jnp", "--batch-size", "4", "--feed", "direct"]
    assert cli_entry(argv) == 0

    released = []
    orig = Batch.release

    def counting_release(self):
        released.append(1)
        return orig(self)

    monkeypatch.setattr(Batch, "release", counting_release)
    assert cli_entry(argv) == 0  # all shards skip via resume
    n_shards = len(list(out.glob("h0-*.npz")))
    assert n_shards >= 2
    # planning pass + real pass each release every batch
    assert len(released) == 2 * n_shards


def test_ordered_map_more_threads_than_depth():
    """num_threads > queue_depth used to deadlock at end of stream (worker
    finally-sentinels couldn't fit the bounded out queue)."""
    import threading

    items = [str(i) for i in range(40)]
    got = []

    def run():
        for p, r in reader._ordered_map(
            items, lambda i, p: int(p), num_threads=16, queue_depth=4
        ):
            got.append(r)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout=60)
    assert not t.is_alive(), "ordered_map deadlocked"
    assert got == list(range(40))


def test_decode_guard_catches_changed_file(corpus, tmp_path, monkeypatch):
    """Phase-B decode cross-checks the phase-A header: a file whose decode
    no longer matches (re-encoded/truncated between phases) fails the row
    instead of shipping silently corrupt features."""
    from mfcc_tpu.io import wav as wav_mod

    cfg = named_config("classic13")
    orig = wav_mod.decode_file_into

    def lying_decode(path, out_row, downmix="first", native=None):
        sr, n = orig(path, out_row, downmix=downmix, native=native)
        return sr, max(0, n - 7)  # pretend the file shrank

    monkeypatch.setattr(reader.wav, "decode_file_into", lying_decode)
    stats = reader.DecodeStats()
    batches = list(reader.stream_batches_direct(
        corpus[:4], cfg, batch_size=4, num_threads=2, stats=stats
    ))
    assert stats.errors == 4  # every row rejected
    for b in batches:
        assert all(i is None for i in b.ids)


@pytest.mark.skipif(_native() is None, reason="needs the C decoder")
def test_feed_worker_rejects_changed_file(corpus):
    """Worker-side guard: a decode_chunk whose expected sample count does
    not match the actual decode reports the row as failed."""
    import os
    import tempfile

    pool = reader._MpPool(1)
    try:
        T = 8000
        fd, name = tempfile.mkstemp(prefix="slabtest_", dir=reader._shm_dir())
        os.ftruncate(fd, 4 * T * 2)
        os.close(fd)
        cmd = {
            "op": "decode_chunk", "slab": name, "shape": [4, T],
            "dtype": "i16", "blen": T, "downmix": "first", "sr": 16000,
            # u0.wav really has 4000 samples; claim 9999
            "jobs": [[0, corpus[0], 4000], [1, corpus[1], 9999]],
        }
        job = pool.submit(cmd)
        assert job.event.wait(timeout=60)
        assert job.error is None
        assert [f[0] for f in job.fails] == [1]
        assert "changed since header parse" in job.fails[0][1]
        os.unlink(name)
    finally:
        pool.close()


@pytest.mark.skipif(_native() is None, reason="needs the C decoder")
def test_dead_worker_respawns(corpus):
    """A killed worker is respawned in place; subsequent submissions to its
    slot succeed instead of failing forever."""
    pool = reader._MpPool(2)
    try:
        pool._procs[0].kill()
        pool._procs[0].wait(timeout=10)
        time.sleep(0.2)  # let its reader thread run the EOF cleanup
        errs = []
        for _ in range(4):  # round-robin hits both slots twice
            job = pool.submit({"op": "nope"})
            assert job.event.wait(timeout=60)
            errs.append(job.error)
        assert all(e == "unknown op 'nope'" for e in errs), errs
        assert all(p.poll() is None for p in pool._procs)
    finally:
        pool.close()


@pytest.mark.skipif(_native() is None, reason="needs the C decoder")
def test_mp_pool_refcounting():
    """A concurrent stream with a different worker count gets a PRIVATE
    pool; the cached pool is never closed under an active user."""
    a, a_priv = reader._acquire_mp_pool(2)
    assert not a_priv
    b, b_priv = reader._acquire_mp_pool(3)  # cache busy: private
    assert b_priv and b is not a
    assert a.alive()  # untouched
    reader._release_mp_pool(b, b_priv)
    assert not b.alive() or all(p.poll() is not None for p in b._procs)
    c, c_priv = reader._acquire_mp_pool(2)  # same size: shared
    assert c is a and not c_priv
    reader._release_mp_pool(a, False)
    reader._release_mp_pool(c, False)
    d, d_priv = reader._acquire_mp_pool(3)  # no users left: cache rebuilt
    assert not d_priv and d is not a
    reader._release_mp_pool(d, False)


def test_resume_skips_decode_entirely(corpus, tmp_path, monkeypatch):
    """A fully-done resume must not decode a single file (header-only
    planning pass) — and still recover CMVN moments from markers."""
    from mfcc_tpu.io import wav as wav_mod
    from mfcc_tpu.parallel import CmvnAccumulator

    out = tmp_path / "feats"
    stats = tmp_path / "cmvn.npz"
    argv = ["extract", *corpus, "--config", "classic13", "-o", str(out),
            "--backend", "jnp", "--batch-size", "4", "--feed", "direct",
            "--set", "cmvn=global", "--cmvn-stats", str(stats)]
    assert cli_entry(argv) == 0
    first = CmvnAccumulator.load(stats)

    calls = []
    orig = wav_mod.decode_file_into

    def counting(path, out_row, downmix="first", native=None):
        calls.append(path)
        return orig(path, out_row, downmix=downmix, native=native)

    monkeypatch.setattr(reader.wav, "decode_file_into", counting)
    assert cli_entry(argv) == 0
    assert calls == []  # zero decodes on a fully-done resume
    again = CmvnAccumulator.load(stats)
    np.testing.assert_allclose(again.s1, first.s1, rtol=1e-12)
    assert again.n == first.n


def test_resume_partial_decodes_only_new(corpus, tmp_path, monkeypatch):
    """Adding files to a done corpus re-decodes only the new shards'
    files; old shards stay skip-without-decode."""
    from mfcc_tpu.io import wav as wav_mod, write_wav

    out = tmp_path / "feats"
    base_argv = ["--config", "classic13", "-o", str(out),
                 "--backend", "jnp", "--batch-size", "4", "--feed", "direct"]
    assert cli_entry(["extract", *corpus, *base_argv]) == 0
    g = np.random.default_rng(99)
    extra = []
    for i in range(3):
        p = tmp_path / f"new{i}.wav"
        write_wav(p, 16000, (g.standard_normal(4800) * 2000).astype(np.int16))
        extra.append(str(p))

    calls = []
    orig = wav_mod.decode_file_into

    def counting(path, out_row, downmix="first", native=None):
        calls.append(str(path))
        return orig(path, out_row, downmix=downmix, native=native)

    monkeypatch.setattr(reader.wav, "decode_file_into", counting)
    assert cli_entry(["extract", *corpus, *extra, *base_argv]) == 0
    # every decoded file is from a not-yet-done shard; the new files are
    # among them, and at most one straddling batch of old files re-decodes
    assert set(extra) <= set(calls)
    from mfcc_tpu.io import read_shard

    got = {}
    for s in out.glob("h0-*.npz"):
        got.update(read_shard(s))
    assert set(extra) <= set(got)


def test_header_stream_worker_death_falls_back(corpus, monkeypatch):
    """r4: phase-A header parses run in the worker pool; a worker dying
    mid-header-chunk must degrade that chunk to the serial parse (no file
    silently dropped, stats identical)."""
    from mfcc_tpu.config import named_config
    from mfcc_tpu.io import DecodeStats

    cfg = named_config("classic13_deltas")

    class _DeadJob:
        def __init__(self):
            import threading

            self.event = threading.Event()
            self.event.set()
            self.error = "feed worker died"
            self.heads = None
            self.fails = []

    class _DeadPool:
        def submit(self, cmd):
            assert cmd["op"] == "parse_headers"
            return _DeadJob()

    stats = DecodeStats()
    out = list(reader._mp_header_stream(
        corpus, _DeadPool(), cfg.sample_rate, stats, chunk=4, depth=2
    ))
    assert [p for p, _ in out] == corpus  # every file survived, in order
    got = {p: n for p, n in out}
    for i, p in enumerate(corpus):
        assert got[p] == 4000 + 160 * i
    assert stats.errors == 0 and stats.wrong_rate == 0


def test_header_stream_error_and_wrong_rate_rows(corpus, tmp_path):
    """Worker-reported header errors keep the parent's skip/log/stats
    semantics: corrupt rows count as errors, wrong-rate rows as
    wrong_rate, and neither reaches the bucketing loop."""
    from mfcc_tpu.config import named_config
    from mfcc_tpu.io import DecodeStats, write_wav

    cfg = named_config("classic13_deltas")
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"RIFFxxxxWAVEjunkjunk")
    wrong = tmp_path / "wrong.wav"
    write_wav(wrong, 8000, np.zeros(64, np.int16))
    files = corpus[:3] + [str(bad), str(wrong)] + corpus[3:]

    pool, private = reader._acquire_mp_pool(2)
    try:
        stats = DecodeStats()
        out = list(reader._mp_header_stream(
            files, pool, cfg.sample_rate, stats, chunk=3, depth=2
        ))
        assert [p for p, _ in out] == corpus
        assert stats.errors == 1 and stats.wrong_rate == 1
    finally:
        reader._release_mp_pool(pool, private)


def test_mp_feed_accepts_lazy_file_iterable(corpus):
    """A generator `files` producer keeps working (serial header fallback,
    review r4) and yields byte-identical batches to the list path."""
    from mfcc_tpu.config import named_config
    from mfcc_tpu.io import DecodeStats

    cfg = named_config("classic13_deltas")

    def collect(files):
        stats = DecodeStats()
        out = []
        for b in reader.stream_batches_mp(
            files, cfg, batch_size=4, stats=stats
        ):
            out.append((np.array(b.audio, copy=True),
                        np.array(b.lengths), list(b.ids)))
            b.release()
        return out

    a = collect(list(corpus))
    g = collect(iter(corpus))  # generator-ish lazy producer
    assert len(a) == len(g) > 0
    for (a1, l1, i1), (a2, l2, i2) in zip(a, g):
        assert i1 == i2
        np.testing.assert_array_equal(l1, l2)
        np.testing.assert_array_equal(a1, a2)
