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


def shard_files(files: Sequence, process_index: int, process_count: int) -> list:
    """Per-host file-list sharding: host i takes files[i::n] (SURVEY.md §2.3
    DP row). Deterministic, no coordination needed."""
    return list(files)[process_index::process_count]


def _decode_worker(
    work: "queue.Queue", out: "queue.Queue", expect_sr: int,
    downmix: str, native: bool | None, stats: DecodeStats, lock: threading.Lock,
):
    # The finally guarantees the sentinel even if this thread dies on an
    # unexpected exception — otherwise the consumer would wait for a
    # sentinel that never comes (fault-injection test in test_structure.py).
    try:
        while True:
            item = work.get()
            if item is _SENTINEL:
                return
            idx, path = item
            try:
                sr, samples = wav.read_wav(path, downmix=downmix, native=native)
            except (OSError, ValueError) as e:
                log.warning("skipping %s: %s", path, e)
                with lock:
                    stats.errors += 1
                out.put((idx, None, None))
                continue
            except BaseException:
                # unexpected: report the gap before propagating, so the
                # reorder buffer never waits on this index
                with lock:
                    stats.errors += 1
                out.put((idx, None, None))
                raise
            if sr != expect_sr:
                log.warning(
                    "skipping %s: sample rate %d != expected %d", path, sr, expect_sr
                )
                with lock:
                    stats.wrong_rate += 1
                out.put((idx, None, None))
                continue
            with lock:
                stats.decoded += 1
                stats.audio_seconds += samples.shape[0] / sr
            out.put((idx, path, samples))
    finally:
        out.put(_SENTINEL)


def decode_stream(
    files: Iterable,
    cfg: FrontendConfig,
    num_threads: int = 4,
    queue_depth: int = 64,
    downmix: str = "first",
    native: bool | None = None,
    stats: DecodeStats | None = None,
) -> Iterator[tuple[str, np.ndarray]]:
    """Yield (path, float32 samples) decoded by a thread pool **in input
    order** (a reorder buffer holds out-of-order completions), so shard
    contents — and therefore resume markers — are deterministic across
    runs. The bounded queue applies back-pressure so decode never runs
    unboundedly ahead of the consumer."""
    stats = stats if stats is not None else DecodeStats()
    expect_sr = cfg.input_sample_rate or cfg.sample_rate
    # the WORK queue is bounded too: otherwise one slow early file lets the
    # workers race ahead and the reorder buffer absorbs the whole corpus —
    # in-flight decode is capped at queue_depth + num_threads items
    work: "queue.Queue" = queue.Queue(maxsize=queue_depth)
    out: "queue.Queue" = queue.Queue(maxsize=queue_depth)
    lock = threading.Lock()
    paths = list(files)

    def _feed():
        for i, p in enumerate(paths):
            work.put((i, p))
        for _ in range(num_threads):
            work.put(_SENTINEL)

    feeder = threading.Thread(target=_feed, daemon=True)
    feeder.start()
    threads = []
    for _ in range(num_threads):
        t = threading.Thread(
            target=_decode_worker,
            args=(work, out, expect_sr, downmix, native, stats, lock),
            daemon=True,
        )
        t.start()
        threads.append(t)
    done = 0
    next_idx = 0
    held: dict[int, tuple] = {}
    while next_idx < len(paths):
        if next_idx in held:
            path, samples = held.pop(next_idx)
            next_idx += 1
            if path is not None:
                yield path, samples
            continue
        if done >= num_threads:
            # every worker has exited: drain stragglers, then release the
            # rest in order treating still-missing indices as skipped
            # (possible only if workers died with unprocessed work items)
            while True:
                try:
                    item = out.get_nowait()
                except queue.Empty:
                    break
                if item is not _SENTINEL:
                    idx, path, samples = item
                    held[idx] = (path, samples)
            while next_idx < len(paths):
                entry = held.pop(next_idx, None)
                next_idx += 1
                if entry is not None and entry[0] is not None:
                    yield entry[0], entry[1]
            break
        item = out.get()
        if item is _SENTINEL:
            done += 1
            continue
        idx, path, samples = item
        held[idx] = (path, samples)
    for t in threads:
        t.join()


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
) -> Iterator[Batch]:
    """files → padded, bucketed Batch stream.

    Utterances longer than the largest bucket are truncated (counted in
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
