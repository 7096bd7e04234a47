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

import dataclasses
import logging
import queue
import threading
from typing import Iterable, Iterator, Sequence

import numpy as np

from mfcc_tpu.config import FrontendConfig
from mfcc_tpu.io import wav
from mfcc_tpu.pipeline import Batch, bucket_for, make_buckets, pad_batch

log = logging.getLogger(__name__)

_SENTINEL = object()


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
) -> Iterator[Batch]:
    """files → padded, bucketed Batch stream.

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
) -> Iterator[Batch]:
    """Decode-into-buffer batch streaming (the host-feed fast path).

    Two phases, both thread-pooled, fully deterministic:
      A. read bytes + parse the wav HEADER only (ordered) — gives the
         sample rate and length, enough for bucket/row assignment;
      B. decode each utterance DIRECTLY into its padded batch row via the
         C++ decoder (truncation + zero-fill inside C, GIL released) —
         no intermediate sample array, no serial assembly copy.

    Semantics match stream_batches (same batches, same order); a rare
    decode failure after a successful header parse zeroes the row and
    drops its id (consumers pair ids with rows, skipping None).
    """
    import concurrent.futures

    stats = stats if stats is not None else DecodeStats()
    expect_sr = cfg.input_sample_rate or cfg.sample_rate
    sr = expect_sr
    buckets = make_buckets(max_len_s, cfg, n_buckets)
    if sr != cfg.sample_rate:
        scale = sr / cfg.sample_rate
        buckets = tuple(int(round(b * scale)) for b in buckets)
    lock = threading.Lock()

    def parse_fn(idx, path):
        try:
            with open(path, "rb") as f:
                data = f.read()
            fsr, n = wav.parse_wav_header(data)
        except (OSError, ValueError) as e:
            log.warning("skipping %s: %s", path, e)
            with lock:
                stats.errors += 1
            return None
        except BaseException:
            with lock:
                stats.errors += 1
            raise
        if fsr != expect_sr:
            log.warning(
                "skipping %s: sample rate %d != expected %d", path, fsr, expect_sr
            )
            with lock:
                stats.wrong_rate += 1
            return None
        return data, n

    from mfcc_tpu.pipeline.batch import required_samples

    class _Open:
        """One partially-filled batch of a bucket."""

        def __init__(self, blen: int):
            self.blen = blen
            self.T = required_samples(blen, cfg)
            self.audio = np.empty((batch_size, self.T), dtype=np.float32)
            self.lengths = np.zeros(batch_size, dtype=np.int32)
            self.ids: list = []
            self.futures: list = []

    pool = concurrent.futures.ThreadPoolExecutor(max_workers=max(2, num_threads))
    pending: dict[int, _Open] = {}

    def decode_job(data: bytes, ob: _Open, row: int, path) -> None:
        try:
            _, n = wav.decode_wav_into(
                data, ob.audio[row, : ob.blen], downmix=downmix, native=native
            )
        except (ValueError, RuntimeError, wav.WavError) as e:
            log.warning("decode failed for %s: %s", path, e)
            secs = ob.lengths[row] / sr  # undo the optimistic header credit
            ob.audio[row, : ob.blen] = 0.0
            ob.lengths[row] = 0
            ob.ids[row] = None
            with lock:
                stats.errors += 1
                stats.decoded -= 1
                stats.audio_seconds -= secs
        ob.audio[row, ob.blen :] = 0.0  # row tail beyond the bucket span

    def flush(blen: int, pad_rows: bool) -> Batch | None:
        ob = pending.pop(blen, None)
        if ob is None or not ob.ids:
            return None
        concurrent.futures.wait(ob.futures)
        rows = len(ob.ids)
        if pad_rows:
            ob.audio[rows:] = 0.0
            out_rows = batch_size
        else:
            out_rows = rows
        ids = ob.ids + [None] * (out_rows - rows)
        return Batch(
            audio=ob.audio[:out_rows],
            lengths=ob.lengths[:out_rows],
            ids=ids,
        )

    try:
        for path, (data, n) in _ordered_map(files, parse_fn, num_threads, 64):
            if n == 0:
                log.warning("skipping %s: empty audio", path)
                with lock:
                    stats.errors += 1
                continue
            if n > buckets[-1]:
                if long_mode == "defer":
                    with lock:
                        stats.long_deferred += 1
                        stats.long_paths.append(path)
                    continue
                with lock:
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
            ob.futures.append(pool.submit(decode_job, data, ob, row, path))
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
