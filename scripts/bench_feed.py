"""Host-feed benchmark: synthetic wav corpus → batch stream, no device work
(SURVEY.md §6: the host decode→pad→feed pipeline is the end-to-end
bottleneck; VERDICT r1 item 1).

Generates a corpus of PCM16 wavs once (page-cache warm after the first
pass), then times each feed path over it, reporting audio-s/s per host.

Usage: python scripts/bench_feed.py [--utts 512] [--seconds 8] [--paths direct,arrays,...]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def make_corpus(root: pathlib.Path, n_utts: int, seconds: float, sr: int):
    from mfcc_tpu.io import write_wav

    g = np.random.default_rng(0)
    paths = []
    for i in range(n_utts):
        # vary lengths +-20% so bucketing is exercised
        n = int(sr * seconds * (0.8 + 0.4 * g.random()))
        x = (g.standard_normal(n) * 3000).astype(np.int16)
        p = root / f"u{i:05d}.wav"
        write_wav(p, sr, x)
        paths.append(str(p))
    return paths


def run_one(name, fn, paths, cfg, reps=3, **kw):
    """Median of reps runs (this VM shows ~17% hypervisor steal — single
    runs swing ±50%)."""
    import statistics

    from mfcc_tpu.io import DecodeStats

    rates, last = [], None
    for _ in range(reps):
        stats = DecodeStats()
        t0 = time.perf_counter()
        n_batches = 0
        for b in fn(paths, cfg, stats=stats, **kw):
            n_batches += 1
            # touch one element per row so lazily-completed batches materialize
            _ = b.audio[:, 0].sum()
            b.release()
        dt = time.perf_counter() - t0
        rates.append(stats.audio_seconds / dt)
        last = (dt, n_batches, stats.errors)
    row = {
        "path": name,
        "audio_s_per_s": round(statistics.median(rates), 1),
        "best_audio_s_per_s": round(max(rates), 1),
        "wall_s": round(last[0], 2),
        "batches": last[1],
        "errors": last[2],
    }
    print(json.dumps(row))
    return row


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--utts", type=int, default=512)
    p.add_argument("--seconds", type=float, default=8.0)
    p.add_argument("--threads", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=64)
    # NOTE: this host's CPU timing is highly contended — compare paths only
    # within one invocation, and prefer large --utts; recorded capacity
    # numbers (E2E_r02.json: 117k audio-s/s mp_i16) came from quiet runs
    p.add_argument("--paths", default="arrays,direct,mp")
    p.add_argument("--corpus-dir", default=None)
    args = p.parse_args()

    from mfcc_tpu.config import named_config
    from mfcc_tpu.io import reader

    cfg = named_config("classic13_deltas")
    root = pathlib.Path(args.corpus_dir or tempfile.mkdtemp(prefix="feedbench"))
    root.mkdir(parents=True, exist_ok=True)
    existing = sorted(root.glob("u*.wav"))
    if len(existing) >= args.utts:
        paths = [str(x) for x in existing[: args.utts]]
    else:
        paths = make_corpus(root, args.utts, args.seconds, cfg.sample_rate)
    # warm the page cache so we measure the pipeline, not cold disk
    for q in paths:
        with open(q, "rb") as f:
            f.read()

    kw = dict(batch_size=args.batch_size, num_threads=args.threads)
    which = args.paths.split(",")
    rows = []
    if "arrays" in which:
        rows.append(run_one("arrays", reader.stream_batches, paths, cfg, **kw))
    if "direct" in which:
        rows.append(
            run_one("direct_f32", reader.stream_batches_direct, paths, cfg,
                    dtype="f32", **kw)
        )
        rows.append(
            run_one("direct_i16", reader.stream_batches_direct, paths, cfg,
                    dtype="i16", **kw)
        )
    if "mp" in which and hasattr(reader, "stream_batches_mp"):
        rows.append(
            run_one("mp_i16", reader.stream_batches_mp, paths, cfg,
                    dtype="i16", **kw)
        )
    print(json.dumps({"metric": "host_feed", "rows": rows}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
