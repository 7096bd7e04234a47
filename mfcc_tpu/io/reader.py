"""Threaded wav decode pool + bucketed batch streaming.

The host feed path (SURVEY.md §3.4 / §6: decode + H2D is the true
end-to-end bottleneck): N decode threads pull paths from a work queue,
decode via the C++ fast path, and push into a bounded results queue (no
shared mutable state — the race-safety stance of SURVEY.md §5). The
batcher groups utterances into length buckets and emits fixed-shape padded
batches so XLA compiles one program per (bucket, batch) shape.

Failure detection: corrupt/undecodable files are logged, counted and
skipped — one bad file never kills a corpus run (SURVEY.md §5 failure row).
"""

from __future__ import annotations

import collections
import dataclasses
import logging
import os
import queue
import tempfile
import threading
from typing import Iterable, Iterator, Sequence

import numpy as np

from mfcc_tpu.config import FrontendConfig
from mfcc_tpu.io import wav
from mfcc_tpu.pipeline import Batch, bucket_for, make_buckets, pad_batch

log = logging.getLogger(__name__)

_SENTINEL = object()

# Phase-A header read size: covers fmt+data chunk headers of essentially
# all real wavs (typically < 100 bytes in); exotic layouts fall back to a
# full read.
_HEADER_PREFIX = 8192

# Decode jobs per pool submission in the direct (threaded) path:
# amortizes the per-future Python overhead over 8 files; larger chunks
# hurt its SYNCHRONOUS flush's tail latency (r4 sweep).
_DECODE_CHUNK = 8

# The mp path finishes batches asynchronously (r5 deferred finishing), so
# chunk tail latency hides behind the next batch's accumulation and the
# binding cost is IPC round trips: 32 jobs/request measured 188k vs 161k
# (chunk 8) vs 180k (16) feed-only audio-s/s at 0% steal (FEED_r05.json).
_DECODE_CHUNK_MP = 32


def _parse_header_counted(path, expect_sr: int, stats: "DecodeStats"):
    """Phase A of the decode-into-buffer paths: (valid sample count) from a
    prefix read + stat; None on skip, with stats counted. ~tens of µs per
    file, so callers run it serially in the consumer."""
    import os

    try:
        with open(path, "rb") as f:
            prefix = f.read(_HEADER_PREFIX)
            if len(prefix) == _HEADER_PREFIX:
                size = os.fstat(f.fileno()).st_size
                try:
                    fsr, n = wav.parse_wav_header(prefix, file_size=size)
                except ValueError:
                    # fmt/data chunk beyond the prefix: full read
                    fsr, n = wav.parse_wav_header(prefix + f.read())
            else:
                fsr, n = wav.parse_wav_header(prefix)
    except (OSError, ValueError) as e:
        log.warning("skipping %s: %s", path, e)
        stats.errors += 1
        return None
    if fsr != expect_sr:
        log.warning(
            "skipping %s: sample rate %d != expected %d", path, fsr, expect_sr
        )
        stats.wrong_rate += 1
        return None
    return n


@dataclasses.dataclass
class DecodeStats:
    decoded: int = 0
    errors: int = 0
    wrong_rate: int = 0
    truncated: int = 0
    audio_seconds: float = 0.0
    # over-long utterances deferred to the split/stitch path (long_mode
    # "defer"): recorded here for the caller to process via
    # pipeline.extract_long after the bucketed stream drains
    long_deferred: int = 0
    long_paths: list = dataclasses.field(default_factory=list)
    # gauge: decode jobs in flight when the last batch was flushed
    # (observability — SURVEY.md §5 metrics row)
    queue_depth: int = 0


def _feed_layout(cfg: FrontendConfig, blen: int, layouts: str):
    """Device feed layout for the decode-into-buffer feeds: "resample"
    (blocked rows only — safe for every extract backend) or "device" (adds
    standard-mode kernel chunk slabs; requires a pallas consumer). Extended
    (center-mode) slabs need pad_batch's per-row host transform, which the
    raw-decode feeds can't do — those configs stay flat here."""
    from mfcc_tpu.pipeline.batch import device_layout, resample_layout

    if layouts == "device":
        lay = device_layout(cfg, blen)
        if lay is not None and getattr(lay, "extended", False):
            return None
        return lay
    return resample_layout(cfg, blen)


def shard_files(files: Sequence, process_index: int, process_count: int) -> list:
    """Per-host file-list sharding: host i takes files[i::n] (SURVEY.md §2.3
    DP row). Deterministic, no coordination needed."""
    return list(files)[process_index::process_count]


def _ordered_map(paths, item_fn, num_threads: int, queue_depth: int):
    """Run item_fn(idx, path) -> result-or-None over a thread pool, yielding
    (path, result) in INPUT ORDER (reorder buffer), skipping None results.

    Ordering makes shard contents — and therefore resume markers —
    deterministic across runs. In-flight work is capped at
    queue_depth + num_threads items even when one early item is slow: the
    feeder holds a window semaphore the consumer releases as indices are
    yielded, so workers can never run arbitrarily far ahead of a slow item
    and pile decoded audio into the reorder buffer. Worker death is
    survivable: the finally-sentinel plus the pre-raise gap report keep the
    consumer from waiting forever, and the drain path releases everything
    if all workers die (tests/test_structure.py fault injection).
    """
    work: "queue.Queue" = queue.Queue(maxsize=queue_depth)
    out: "queue.Queue" = queue.Queue(maxsize=queue_depth)
    window = threading.Semaphore(queue_depth + num_threads)
    paths = list(paths)

    def _feed():
        for i, p in enumerate(paths):
            window.acquire()
            work.put((i, p))
        for _ in range(num_threads):
            work.put(_SENTINEL)

    def _worker():
        try:
            while True:
                item = work.get()
                if item is _SENTINEL:
                    return
                idx, path = item
                try:
                    res = item_fn(idx, path)
                except BaseException:
                    out.put((idx, None))
                    raise
                out.put((idx, res))
        finally:
            out.put(_SENTINEL)

    threading.Thread(target=_feed, daemon=True).start()
    threads = [
        threading.Thread(target=_worker, daemon=True) for _ in range(num_threads)
    ]
    for t in threads:
        t.start()

    done = 0
    next_idx = 0
    held: dict[int, object] = {}
    while next_idx < len(paths):
        if next_idx in held:
            res = held.pop(next_idx)
            path = paths[next_idx]
            next_idx += 1
            window.release()
            if res is not None:
                yield path, res
            continue
        if done >= num_threads:
            # every worker exited: drain stragglers, release the rest in
            # order treating still-missing indices as skipped
            while True:
                try:
                    item = out.get_nowait()
                except queue.Empty:
                    break
                if item is not _SENTINEL:
                    held[item[0]] = item[1]
            while next_idx < len(paths):
                res = held.pop(next_idx, None)
                path = paths[next_idx]
                next_idx += 1
                window.release()  # unblock the feeder so it can drain too
                if res is not None:
                    yield path, res
            break
        item = out.get()
        if item is _SENTINEL:
            done += 1
            continue
        held[item[0]] = item[1]
    # unblock workers still parked in their finally-sentinel put: out is
    # bounded at queue_depth, so with num_threads > queue_depth not every
    # sentinel fits once the consumer stops draining — without this the
    # joins below deadlock (all real items were yielded, so anything left
    # is sentinels)
    while done < num_threads:
        if out.get() is _SENTINEL:
            done += 1
    for t in threads:
        t.join()


def decode_stream(
    files: Iterable,
    cfg: FrontendConfig,
    num_threads: int = 4,
    queue_depth: int = 64,
    downmix: str = "first",
    native: bool | None = None,
    stats: DecodeStats | None = None,
) -> Iterator[tuple[str, np.ndarray]]:
    """Yield (path, float32 samples) decoded by a thread pool in input order
    (see _ordered_map)."""
    stats = stats if stats is not None else DecodeStats()
    expect_sr = cfg.input_sample_rate or cfg.sample_rate
    lock = threading.Lock()

    def item_fn(idx, path):
        try:
            sr, samples = wav.read_wav(path, downmix=downmix, native=native)
        except (OSError, ValueError) as e:
            log.warning("skipping %s: %s", path, e)
            with lock:
                stats.errors += 1
            return None
        except BaseException:
            with lock:
                stats.errors += 1
            raise
        if sr != expect_sr:
            log.warning(
                "skipping %s: sample rate %d != expected %d", path, sr, expect_sr
            )
            with lock:
                stats.wrong_rate += 1
            return None
        with lock:
            stats.decoded += 1
            stats.audio_seconds += samples.shape[0] / sr
        return samples

    yield from _ordered_map(files, item_fn, num_threads, queue_depth)


def stream_batches(
    files: Iterable,
    cfg: FrontendConfig,
    batch_size: int = 64,
    max_len_s: float = 10.0,
    n_buckets: int = 4,
    num_threads: int = 4,
    downmix: str = "first",
    native: bool | None = None,
    pad_batch_rows: bool = True,
    stats: DecodeStats | None = None,
    long_mode: str = "defer",
    layouts: str = "resample",
) -> Iterator[Batch]:
    """files → padded, bucketed Batch stream.

    layouts: "resample" (default — blocked polyphase rows for resampling
    configs, accepted by both extract backends) or "device" (the full
    device-optimal layout incl. fused-kernel chunk slabs; batches then
    require backend='pallas' in extract_batch).

    Utterances longer than the largest bucket are deferred to the
    split/stitch path (long_mode "defer", the default: path recorded in
    stats.long_paths for the caller to run pipeline.extract_long on) or
    truncated to the top bucket (long_mode "truncate", counted in
    stats.truncated). Partial per-bucket batches are flushed at end of
    input, zero-padded to batch_size rows when pad_batch_rows so every
    batch of a bucket shares one compiled shape.
    """
    import concurrent.futures

    stats = stats if stats is not None else DecodeStats()
    sr = cfg.input_sample_rate or cfg.sample_rate
    buckets = make_buckets(max_len_s, cfg, n_buckets)
    # at a non-native input rate the bucket grid scales with the rate
    if sr != cfg.sample_rate:
        scale = sr / cfg.sample_rate
        buckets = tuple(int(round(b * scale)) for b in buckets)
    pending: dict[int, list[tuple[str, np.ndarray]]] = {b: [] for b in buckets}
    copy_pool = concurrent.futures.ThreadPoolExecutor(
        max_workers=max(2, num_threads)
    )

    from mfcc_tpu.pipeline.batch import device_layout, resample_layout

    _lay_fn = device_layout if layouts == "device" else resample_layout
    bucket_layouts = {b: _lay_fn(cfg, b) for b in buckets}

    def flush(blen: int, pad_rows: bool) -> Batch | None:
        items = pending[blen]
        if not items:
            return None
        pending[blen] = []
        return pad_batch(
            [s for _, s in items],
            cfg,
            bucket_len=blen,
            ids=[p for p, _ in items],
            pad_batch_to=batch_size if pad_rows else None,
            copy_pool=copy_pool,
            layout=bucket_layouts[blen],
        )

    try:
        for path, samples in decode_stream(
            files, cfg, num_threads=num_threads, downmix=downmix, native=native,
            stats=stats,
        ):
            if samples.shape[0] > buckets[-1]:
                if long_mode == "defer":
                    stats.long_deferred += 1
                    stats.long_paths.append(path)
                    continue
                stats.truncated += 1
                samples = samples[: buckets[-1]]
            if samples.shape[0] == 0:
                log.warning("skipping %s: empty audio", path)
                stats.errors += 1
                continue
            blen = bucket_for(samples.shape[0], buckets)
            pending[blen].append((path, samples))
            if len(pending[blen]) >= batch_size:
                b = flush(blen, False)
                if b is not None:
                    yield b
        for blen in buckets:
            b = flush(blen, pad_batch_rows)
            if b is not None:
                yield b
    finally:
        copy_pool.shutdown(wait=False)


def stream_batches_direct(
    files: Iterable,
    cfg: FrontendConfig,
    batch_size: int = 64,
    max_len_s: float = 10.0,
    n_buckets: int = 4,
    num_threads: int = 4,
    downmix: str = "first",
    native: bool | None = None,
    pad_batch_rows: bool = True,
    stats: DecodeStats | None = None,
    long_mode: str = "defer",
    dtype: str = "f32",
    skip_ids: frozenset | set | None = None,
    layouts: str = "resample",
) -> Iterator[Batch]:
    """Decode-into-buffer batch streaming (the host-feed fast path).

    Two phases, fully deterministic:
      A. INLINE in the consumer: read a few-KB header PREFIX + stat —
         gives the sample rate and length for bucket/row assignment
         without pulling the whole file through memory twice (full-read
         fallback for exotic chunk layouts). ~tens of µs per file, so a
         serial loop sustains hundreds of thousands of audio-s/s and
         needs no ordering machinery at all.
      B. decode each utterance DIRECTLY into its padded batch row via one
         C++ open+read+decode call (truncation + zero-fill inside C, GIL
         released) — no Python bytes object, no intermediate sample
         array, no serial assembly copy. Decode jobs are submitted to the
         thread pool in CHUNKS of rows, so per-file Python overhead
         (future + queue hop) is amortized ~8×.

    dtype "f32" or "i16": int16 rows halve decode-output, memcpy and H2D
    bytes (PCM16 sources pass through bit-exactly; other widths quantize
    at ±0.5 LSB of the int16 scale); the chain casts on device.

    Semantics match stream_batches (same batches, same order); a rare
    decode failure after a successful header parse zeroes the row and
    drops its id (consumers pair ids with rows, skipping None).
    """
    import concurrent.futures
    import os

    stats = stats if stats is not None else DecodeStats()
    expect_sr = cfg.input_sample_rate or cfg.sample_rate
    sr = expect_sr
    buckets = make_buckets(max_len_s, cfg, n_buckets)
    if sr != cfg.sample_rate:
        scale = sr / cfg.sample_rate
        buckets = tuple(int(round(b * scale)) for b in buckets)
    lock = threading.Lock()
    if dtype not in ("f32", "i16"):
        raise ValueError(f"dtype={dtype!r} must be 'f32' or 'i16'")
    row_dtype = np.float32 if dtype == "f32" else np.int16

    def parse_header(path):
        return _parse_header_counted(path, expect_sr, stats)

    from mfcc_tpu.pipeline.batch import feed_geometry, layout_kind

    _bucket_layouts = {b: _feed_layout(cfg, b, layouts) for b in buckets}
    bucket_geom = {
        b: feed_geometry(cfg, b, _bucket_layouts[b]) for b in buckets
    }
    bucket_kind = {b: layout_kind(_bucket_layouts[b]) for b in buckets}

    # slab recycling: consumers that call Batch.release() hand the audio
    # buffer back here, saving the page-fault pass of a fresh allocation
    # per batch (~40 MB at batch-64 × 10 s fp32 — measured 2-5× feed
    # throughput on its own)
    slab_lock = threading.Lock()
    free_slabs: dict[int, list] = {}

    def recycle(batch: Batch) -> None:
        base = batch.audio.base if batch.audio.base is not None else batch.audio
        with slab_lock:
            free_slabs.setdefault(base.shape[1], []).append(base)

    class _Open:
        """One partially-filled batch of a bucket."""

        def __init__(self, blen: int):
            self.blen = blen
            # device feed layout (blocked resample rows / kernel chunk
            # slabs): rows land at the layout's offset, pre-tiled
            self.off, self.T, self.out_shape = bucket_geom[blen]
            with slab_lock:
                stack = free_slabs.get(self.T)
                slab = stack.pop() if stack else None
            self.audio = (
                slab if slab is not None
                else np.empty((batch_size, self.T), dtype=row_dtype)
            )
            self.lengths = np.zeros(batch_size, dtype=np.int32)
            self.ids: list = []
            self.futures: list = []
            self.jobs: list = []  # (row, path) awaiting chunk submission

    pool = concurrent.futures.ThreadPoolExecutor(max_workers=max(2, num_threads))
    pending: dict[int, _Open] = {}

    def decode_chunk(ob: _Open, jobs: list) -> None:
        off = ob.off
        for row, path in jobs:
            try:
                fsr, n_valid = wav.decode_file_into(
                    path, ob.audio[row, off : off + ob.blen],
                    downmix=downmix, native=native,
                )
                if fsr != sr or n_valid != ob.lengths[row]:
                    # the file changed between the phase-A header parse
                    # and this decode (re-encode, truncated copy): the
                    # recorded length/rate no longer describe the bytes —
                    # corrupt features must not reach shards silently
                    raise ValueError(
                        f"file changed since header parse: decoded "
                        f"{n_valid} samples at {fsr} Hz, header said "
                        f"{ob.lengths[row]} at {sr}"
                    )
            except (OSError, ValueError, RuntimeError, wav.WavError) as e:
                log.warning("decode failed for %s: %s", path, e)
                secs = ob.lengths[row] / sr  # undo the header credit
                ob.audio[row, off : off + ob.blen] = 0
                ob.lengths[row] = 0
                ob.ids[row] = None
                with lock:
                    stats.errors += 1
                    stats.decoded -= 1
                    stats.audio_seconds -= secs
            ob.audio[row, :off] = 0  # blocked-layout prologue
            ob.audio[row, off + ob.blen :] = 0  # tail beyond the bucket span

    def submit(ob: _Open) -> None:
        if ob.jobs:
            ob.futures.append(pool.submit(decode_chunk, ob, ob.jobs))
            ob.jobs = []

    def flush(blen: int, pad_rows: bool) -> Batch | None:
        ob = pending.pop(blen, None)
        if ob is None or not ob.ids:
            return None
        submit(ob)
        stats.queue_depth = sum(
            1 for o in pending.values() for f in o.futures if not f.done()
        ) + sum(1 for f in ob.futures if not f.done())
        concurrent.futures.wait(ob.futures)
        rows = len(ob.ids)
        if pad_rows:
            ob.audio[rows:] = 0
            out_rows = batch_size
        else:
            out_rows = rows
        ids = ob.ids + [None] * (out_rows - rows)
        audio = ob.audio[:out_rows]
        if ob.out_shape is not None:
            audio = audio.reshape(out_rows, *ob.out_shape)
        return Batch(
            audio=audio,
            lengths=ob.lengths[:out_rows],
            ids=ids,
            on_release=recycle,
            layout_kind=bucket_kind[ob.blen],
        )

    try:
        for path in files:
            n = parse_header(path)
            if n is None:
                continue
            if n == 0:
                log.warning("skipping %s: empty audio", path)
                stats.errors += 1
                continue
            if n > buckets[-1]:
                if long_mode == "defer":
                    stats.long_deferred += 1
                    stats.long_paths.append(path)
                    continue
                stats.truncated += 1
                n = buckets[-1]
            with lock:
                stats.decoded += 1
                stats.audio_seconds += n / sr
            blen = bucket_for(n, buckets)
            ob = pending.get(blen)
            if ob is None:
                ob = pending[blen] = _Open(blen)
            row = len(ob.ids)
            ob.ids.append(path)
            ob.lengths[row] = n
            if skip_ids is None or path not in skip_ids:
                ob.jobs.append((row, path))
            # else: row content is never read (the caller resume-skips the
            # whole batch) — composition/lengths stay identical either way
            if len(ob.jobs) >= _DECODE_CHUNK:
                submit(ob)
            if len(ob.ids) >= batch_size:
                b = flush(blen, False)
                if b is not None:
                    yield b
        for blen in buckets:
            b = flush(blen, pad_batch_rows)
            if b is not None:
                yield b
    finally:
        pool.shutdown(wait=False)


# ---------------------------------------------------------------------------
# Multi-process feed: worker subprocesses decoding into shared-memory slabs
# ---------------------------------------------------------------------------


class _MpJob:
    """One dispatched worker request: completion event + response fields."""

    __slots__ = ("event", "fails", "error", "rows", "heads")

    def __init__(self):
        self.event = threading.Event()
        self.fails: list = []
        self.error: str | None = None
        self.rows: list = []  # rows this chunk covers (for death cleanup)
        self.heads: list | None = None  # parse_headers responses


class _MpPool:
    """Pool of feed_worker subprocesses speaking JSON-lines over pipes.

    Plain subprocess.Popen, NOT multiprocessing: no __main__ re-import in
    the children (safe for stdin scripts / pytest / library embedding), no
    fork of a parent holding JAX/BLAS threads, and a dead worker is just an
    EOF on its stdout. One reader thread per worker resolves replies."""

    def __init__(self, num_workers: int):
        import pathlib
        import subprocess
        import sys as _sys

        repo_root = str(pathlib.Path(__file__).resolve().parents[2])
        env = dict(os.environ)
        env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
        self._procs = []
        self._lock = threading.Lock()
        self._pending: dict[int, _MpJob] = {}
        self._by_worker: dict[int, set] = {}
        self._next_id = 0
        self._rr = 0
        self._env = env
        self._procs = [None] * num_workers
        for w in range(num_workers):
            self._by_worker[w] = set()
            self._spawn(w)

    def _spawn(self, w: int) -> None:
        import subprocess
        import sys as _sys

        p = subprocess.Popen(
            [_sys.executable, "-m", "mfcc_tpu.io.feed_worker"],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            text=True, env=self._env, bufsize=1,
        )
        self._procs[w] = p
        # each process GENERATION gets its own owed-job set: a respawned
        # slot's jobs must not be failed by the dead predecessor's reader
        # thread when its EOF cleanup runs after the respawn
        owned: set = set()
        self._by_worker[w] = owned
        threading.Thread(
            target=self._reader, args=(owned, p), daemon=True
        ).start()

    def _reader(self, owned: set, proc) -> None:
        import json as _json

        for line in proc.stdout:
            try:
                msg = _json.loads(line)
            except ValueError:
                continue
            jid = msg.get("id")
            with self._lock:
                job = self._pending.pop(jid, None)
                owned.discard(jid)
            if job is not None:
                job.fails = msg.get("fails", [])
                job.heads = msg.get("heads")
                job.error = msg.get("error")
                job.event.set()
        # EOF: worker died — fail everything THIS generation still owed
        with self._lock:
            owed = [self._pending.pop(j, None) for j in owned]
            owned.clear()
        for job in owed:
            if job is not None:
                job.error = "feed worker died"
                job.event.set()

    def broadcast(self, cmd: dict) -> list[_MpJob]:
        """Send cmd to EVERY worker (e.g. drop_slabs at stream end)."""
        import json as _json

        jobs = []
        for w, proc in enumerate(self._procs):
            job = _MpJob()
            with self._lock:
                jid = self._next_id
                self._next_id += 1
                self._pending[jid] = job
                self._by_worker[w].add(jid)
            try:
                proc.stdin.write(_json.dumps(dict(cmd, id=jid)) + "\n")
                proc.stdin.flush()
            except (OSError, ValueError):
                with self._lock:
                    self._pending.pop(jid, None)
                    self._by_worker[w].discard(jid)
                job.error = "feed worker died"
                job.event.set()
            jobs.append(job)
        return jobs

    def submit(self, cmd: dict) -> _MpJob:
        import json as _json

        job = _MpJob()
        with self._lock:
            jid = self._next_id
            self._next_id += 1
            w = self._rr
            self._rr = (self._rr + 1) % len(self._procs)
            # a dead worker (OOM kill, crash) is respawned in place —
            # otherwise every len(procs)-th chunk would fail for the rest
            # of the process (its owed jobs were already failed by the
            # reader thread's EOF path)
            if self._procs[w].poll() is not None:
                log.warning("feed worker %d died; respawning", w)
                self._spawn(w)
            self._pending[jid] = job
            self._by_worker[w].add(jid)
            proc = self._procs[w]
        cmd = dict(cmd, id=jid)
        try:
            proc.stdin.write(_json.dumps(cmd) + "\n")
            proc.stdin.flush()
        except (OSError, ValueError):
            with self._lock:
                self._pending.pop(jid, None)
                self._by_worker[w].discard(jid)
            job.error = "feed worker died"
            job.event.set()
        return job

    def close(self) -> None:
        for p in self._procs:
            try:
                p.stdin.close()
            except OSError:
                pass
        for p in self._procs:
            try:
                p.wait(timeout=5)
            except Exception:
                p.kill()

    def alive(self) -> bool:
        return any(p.poll() is None for p in self._procs)

    def depth(self) -> int:
        with self._lock:
            return len(self._pending)


_mp_pool: _MpPool | None = None
_mp_pool_size = 0
_mp_pool_users = 0
_mp_pool_lock = threading.Lock()


def _close_mp_pool_at_exit() -> None:
    if _mp_pool is not None:
        _mp_pool.close()


def _acquire_mp_pool(num_workers: int) -> tuple[_MpPool, bool]:
    """Process-wide cached worker pool: spawning + importing numpy in the
    workers costs ~1-2 s, which would otherwise be paid per stream. Closed
    at interpreter exit.

    Returns (pool, private). Reference-counted: a concurrent stream asking
    for a DIFFERENT worker count gets a private pool instead of the cache
    being closed under the first stream's in-flight jobs (which would fail
    them all as 'feed worker died'). Release with _release_mp_pool."""
    global _mp_pool, _mp_pool_size, _mp_pool_users
    with _mp_pool_lock:
        if (_mp_pool is not None and _mp_pool_size == num_workers
                and _mp_pool.alive()):
            _mp_pool_users += 1
            return _mp_pool, False
        if _mp_pool is not None and _mp_pool_users > 0:
            # cache busy with another size/generation: don't touch it
            return _MpPool(num_workers), True
        first = _mp_pool is None
        if _mp_pool is not None:
            _mp_pool.close()
        _mp_pool = _MpPool(num_workers)
        _mp_pool_size = num_workers
        _mp_pool_users = 1
        if first:
            import atexit

            atexit.register(_close_mp_pool_at_exit)
        return _mp_pool, False


def _release_mp_pool(pool: _MpPool, private: bool) -> None:
    global _mp_pool_users
    if private:
        pool.close()
        return
    with _mp_pool_lock:
        if pool is _mp_pool:
            _mp_pool_users = max(0, _mp_pool_users - 1)


def _shm_dir() -> str:
    return "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()



def _mp_header_stream(files, pool, expect_sr: int, stats: "DecodeStats",
                      chunk: int = 64, depth: int = 4):
    """Yield (path, n_samples) in file order with phase-A header parses
    offloaded to the worker pool (chunked, `depth` chunks in flight) —
    the consumer thread's per-file cost drops from a Python open + prefix
    read to amortized bookkeeping (VERDICT r2 item 8). Skip/log/stats
    semantics are exactly _parse_header_counted's; a dead worker degrades
    that chunk to the serial parse instead of dropping files.

    Chunked collection blocks until `chunk` paths are available, so a
    LAZY producer (a generator that discovers files over time) would
    stall the feed waiting to fill a chunk — those callers keep the
    serial per-path parse (review r4); concrete sequences (the CLI's
    globbed lists) take the pooled path."""
    import collections
    import itertools

    if not isinstance(files, (list, tuple)):
        for path in files:
            n = _parse_header_counted(path, expect_sr, stats)
            if n is not None:
                yield path, n
        return

    it = iter(files)
    inflight: collections.deque = collections.deque()

    def submit_next() -> bool:
        paths = list(itertools.islice(it, chunk))
        if not paths:
            return False
        job = pool.submit(
            {"op": "parse_headers", "paths": [str(p) for p in paths]}
        )
        inflight.append((paths, job))
        return True

    for _ in range(depth):
        if not submit_next():
            break
    while inflight:
        paths, job = inflight.popleft()
        job.event.wait()
        heads = job.heads if job.error is None else None
        for i, path in enumerate(paths):
            if heads is None:  # worker died: serial fallback for the chunk
                n = _parse_header_counted(path, expect_sr, stats)
                if n is not None:
                    yield path, n
                continue
            h = heads[i]
            if len(h) > 2:
                log.warning("skipping %s: %s", path, h[2])
                stats.errors += 1
                continue
            fsr, n = h
            if fsr != expect_sr:
                log.warning(
                    "skipping %s: sample rate %d != expected %d",
                    path, fsr, expect_sr,
                )
                stats.wrong_rate += 1
                continue
            yield path, n
        submit_next()


def stream_batches_mp(
    files: Iterable,
    cfg: FrontendConfig,
    batch_size: int = 64,
    max_len_s: float = 10.0,
    n_buckets: int = 4,
    num_threads: int = 4,
    downmix: str = "first",
    native: bool | None = None,
    pad_batch_rows: bool = True,
    stats: DecodeStats | None = None,
    long_mode: str = "defer",
    dtype: str = "i16",
    skip_ids: frozenset | set | None = None,
    layouts: str = "resample",
) -> Iterator[Batch]:
    """Multi-process decode-into-buffer batch streaming.

    Same phases, semantics and batch contents as stream_batches_direct,
    but phase-B decode chunks run in feed_worker SUBPROCESSES writing
    straight into /dev/shm-backed slabs — per-file Python work (open,
    ctypes call, error handling) happens under the workers' own GILs, so
    the consumer thread spends its GIL only on header parses and batch
    bookkeeping. num_threads sets the worker-process count.

    Slabs are recycled through Batch.release() exactly like the threaded
    path; slab files are unlinked when the stream ends.

    NOTE: the consumer loop intentionally mirrors stream_batches_direct's
    (known duplication): the 'same batches, same order' contract between
    the two feeds is enforced by byte-equality tests (tests/test_io.py),
    so edits to bucketing/long-mode/skip logic must land in BOTH loops —
    grep for `ob.jobs.append`. One deliberate r5 divergence: this loop
    FINISHES batches asynchronously (begin_finish/materialize below) —
    same batches, same order, but decode waits overlap the next batch's
    accumulation instead of serializing the generator.
    """
    stats = stats if stats is not None else DecodeStats()
    expect_sr = cfg.input_sample_rate or cfg.sample_rate
    sr = expect_sr
    buckets = make_buckets(max_len_s, cfg, n_buckets)
    if sr != cfg.sample_rate:
        scale = sr / cfg.sample_rate
        buckets = tuple(int(round(b * scale)) for b in buckets)
    if dtype not in ("f32", "i16"):
        raise ValueError(f"dtype={dtype!r} must be 'f32' or 'i16'")
    row_dtype = np.int16 if dtype == "i16" else np.float32

    from mfcc_tpu.pipeline.batch import feed_geometry, layout_kind

    _bucket_layouts = {b: _feed_layout(cfg, b, layouts) for b in buckets}
    bucket_geom = {
        b: feed_geometry(cfg, b, _bucket_layouts[b]) for b in buckets
    }
    bucket_kind = {b: layout_kind(_bucket_layouts[b]) for b in buckets}

    pool, pool_private = _acquire_mp_pool(max(1, num_threads))
    slab_lock = threading.Lock()
    free_slabs: dict[int, list] = {}  # T -> [(name, memmap)]
    all_slab_names: list[str] = []

    def new_slab(T: int):
        with slab_lock:
            stack = free_slabs.get(T)
            if stack:
                return stack.pop()
        fd, name = tempfile.mkstemp(
            prefix="mfcc_tpu_slab_", dir=_shm_dir()
        )
        os.ftruncate(fd, batch_size * T * np.dtype(row_dtype).itemsize)
        os.close(fd)
        arr = np.memmap(name, dtype=row_dtype, mode="r+",
                        shape=(batch_size, T))
        all_slab_names.append(name)
        return name, arr

    def recycle(batch: Batch) -> None:
        base = batch.audio.base if batch.audio.base is not None else batch.audio
        name = getattr(base, "_mfcc_slab_name", None)
        if name is None:
            return
        with slab_lock:
            free_slabs.setdefault(base.shape[1], []).append((name, base))

    class _Open:
        def __init__(self, blen: int):
            self.blen = blen
            self.off, self.T, self.out_shape = bucket_geom[blen]
            self.name, self.audio = new_slab(self.T)
            self.audio._mfcc_slab_name = self.name
            self.lengths = np.zeros(batch_size, dtype=np.int32)
            self.ids: list = []
            self.mp_jobs: list[_MpJob] = []
            self.jobs: list = []

    pending: dict[int, _Open] = {}

    def submit(ob: _Open) -> None:
        if not ob.jobs:
            return
        job = pool.submit({
            "op": "decode_chunk",
            "slab": ob.name,
            "shape": [batch_size, ob.T],
            "dtype": dtype,
            "blen": ob.blen,
            "off": ob.off,
            "downmix": downmix,
            "sr": sr,
            # expected valid samples per row: the worker cross-checks the
            # actual decode against the phase-A header (file-changed guard)
            "jobs": [[row, str(p), int(ob.lengths[row])] for row, p in ob.jobs],
        })
        job.rows = [row for row, _ in ob.jobs]
        ob.mp_jobs.append(job)
        ob.jobs = []

    # Deferred finishing (r5): a filled batch's decode chunks keep running
    # while the generator accumulates the NEXT batch — the flush wait that
    # serialized the r4 loop (~70% of consumer wall in the quiet-window
    # profile) overlaps with header streaming and later submissions. Order
    # and contents are IDENTICAL to the synchronous loop (FIFO; the
    # byte-equality contract with stream_batches_direct holds); only the
    # yield timing moves. In-flight finished-but-unyielded batches are
    # bounded (slab memory) by force-materializing the oldest.
    finishing: "collections.deque[_Open]" = collections.deque()
    _MAX_FINISHING = 3

    def begin_finish(blen: int) -> None:
        ob = pending.pop(blen, None)
        if ob is None or not ob.ids:
            return
        submit(ob)
        stats.queue_depth = pool.depth()
        finishing.append(ob)

    def ready(ob: "_Open") -> bool:
        return all(j.event.is_set() for j in ob.mp_jobs)

    def materialize(ob: "_Open", pad_rows: bool) -> Batch:
        for job in ob.mp_jobs:
            job.event.wait()
            if job.error is not None:
                # worker died mid-chunk: those rows' contents are unknown
                log.error("feed worker failure: %s", job.error)
                job.fails = [[row, job.error] for row in job.rows]
            for row, msg in job.fails:
                log.warning("decode failed for %s: %s", ob.ids[row], msg)
                secs = ob.lengths[row] / sr
                ob.audio[row] = 0  # contents unknown on worker death
                ob.lengths[row] = 0
                ob.ids[row] = None
                stats.errors += 1
                stats.decoded -= 1
                stats.audio_seconds -= secs
        rows = len(ob.ids)
        if pad_rows:
            ob.audio[rows:] = 0
            out_rows = batch_size
        else:
            out_rows = rows
        ids = ob.ids + [None] * (out_rows - rows)
        audio = ob.audio[:out_rows]
        if ob.out_shape is not None:
            audio = audio.reshape(out_rows, *ob.out_shape)
        return Batch(
            audio=audio,
            lengths=ob.lengths[:out_rows],
            ids=ids,
            on_release=recycle,
            layout_kind=bucket_kind[ob.blen],
        )

    try:
        for path, n in _mp_header_stream(files, pool, expect_sr, stats):
            if n == 0:
                log.warning("skipping %s: empty audio", path)
                stats.errors += 1
                continue
            if n > buckets[-1]:
                if long_mode == "defer":
                    stats.long_deferred += 1
                    stats.long_paths.append(path)
                    continue
                stats.truncated += 1
                n = buckets[-1]
            stats.decoded += 1
            stats.audio_seconds += n / sr
            blen = bucket_for(n, buckets)
            ob = pending.get(blen)
            if ob is None:
                ob = pending[blen] = _Open(blen)
            row = len(ob.ids)
            ob.ids.append(path)
            ob.lengths[row] = n
            if skip_ids is None or path not in skip_ids:
                ob.jobs.append((row, path))
            # else: row content is never read (the caller resume-skips the
            # whole batch) — composition/lengths stay identical either way
            if len(ob.jobs) >= _DECODE_CHUNK_MP:
                submit(ob)
            if len(ob.ids) >= batch_size:
                begin_finish(blen)
            # yield finished batches in FIFO order as their decodes land;
            # block only to bound in-flight slabs
            while finishing and (
                ready(finishing[0]) or len(finishing) >= _MAX_FINISHING
            ):
                yield materialize(finishing.popleft(), False)
        while finishing:
            yield materialize(finishing.popleft(), False)
        for blen in buckets:
            begin_finish(blen)
        while finishing:
            yield materialize(finishing.popleft(), pad_batch_rows)
    finally:
        # pool is process-cached (workers stay warm for the next stream);
        # slab files are per-stream: unlink AND tell workers to drop their
        # mappings, else the unlinked pages stay resident in the workers
        for job in pool.broadcast({"op": "drop_slabs", "names": all_slab_names}):
            job.event.wait(timeout=5)
        for name in all_slab_names:
            try:
                os.unlink(name)
            except OSError:
                pass
        _release_mp_pool(pool, pool_private)
