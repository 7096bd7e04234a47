"""End-to-end CLI benchmark: wav corpus on disk → feature shards, through
the full production path (mp feed → i16 H2D → fused Pallas kernel →
pipelined shard writes). The VERDICT r1 item-1 artifact: host audio-s/s
with pad-occupancy and device-idle fraction.

    python scripts/bench_e2e.py [--utts 2048] [--seconds 8] [-o E2E.json]

Device-idle fraction is estimated as 1 − (batches × device_ms) / wall,
with device_ms the chained-scan per-step time measured separately
(bench.py method) — the relay's ~40 ms fetch latency makes in-band device
timing impossible, so idle is a host-side estimate.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--utts", type=int, default=2048)
    p.add_argument("--seconds", type=float, default=8.0)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--threads", type=int, default=4)
    p.add_argument("--config", default="classic13_deltas")
    p.add_argument("--feed", default="mp")
    p.add_argument("--feed-dtype", default="i16")
    p.add_argument("--corpus-dir", default=None, help="reuse an existing corpus")
    p.add_argument("--out-root", default=None,
                   help="parent dir for the feature shards (e.g. /dev/shm to "
                        "measure pipeline capacity without the ~150 MB/s "
                        "disk cap of this VM; default: system tmp)")
    p.add_argument("--device-ms", type=float, default=None,
                   help="per-batch device ms (from bench.py) for the idle estimate")
    p.add_argument("-o", "--output", default=None)
    args = p.parse_args()

    from bench_feed import make_corpus  # same synthetic corpus generator

    from mfcc_tpu.config import named_config

    cfg = named_config(args.config)
    root = pathlib.Path(args.corpus_dir or tempfile.mkdtemp(prefix="e2ebench"))
    root.mkdir(parents=True, exist_ok=True)
    existing = sorted(root.glob("u*.wav"))
    if len(existing) >= args.utts:
        paths = [str(x) for x in existing[: args.utts]]
    else:
        paths = make_corpus(root, args.utts, args.seconds, cfg.sample_rate)
    for q in paths:  # warm page cache: measure the pipeline, not cold disk
        with open(q, "rb") as f:
            f.read()

    out_dir = pathlib.Path(tempfile.mkdtemp(prefix="e2efeats", dir=args.out_root))
    metrics_path = out_dir / "metrics.jsonl"
    from mfcc_tpu.cli import main as cli_main

    t0 = time.perf_counter()
    rc = cli_main([
        "extract", *paths, "--config", args.config, "-o", str(out_dir),
        "--batch-size", str(args.batch_size), "--threads", str(args.threads),
        "--feed", args.feed, "--feed-dtype", args.feed_dtype,
        "--metrics", str(metrics_path), "--no-resume",
    ])
    wall = time.perf_counter() - t0
    assert rc == 0, f"extract failed rc={rc}"

    lines = [json.loads(l) for l in metrics_path.read_text().splitlines()]
    done = lines[-1]
    audio_s = done.get("audio_seconds", 0.0)
    batches = int(done.get("shards", 0))
    row = {
        "metric": "e2e_cli_audio_s_per_s_per_host",
        "value": round(audio_s / wall, 1),
        "unit": "audio-s/s",
        "wall_s": round(wall, 2),
        "audio_s": round(audio_s, 1),
        "utterances": int(done.get("utterances", 0)),
        "batches": batches,
        "pad_occupancy": round(float(done.get("pad_occupancy", 0.0)), 4),
        "decode_queue_depth": done.get("decode_queue_depth"),
        "dispatch_ms": done.get("dispatch_ms"),
        "config": args.config,
        "feed": args.feed,
        "feed_dtype": args.feed_dtype,
        "out_root": args.out_root or "tmp-disk",
        "shard_mb_written": round(
            sum(f.stat().st_size for f in out_dir.glob("*.npz")) / 1e6, 1
        ),
    }
    if args.device_ms:
        busy = batches * args.device_ms / 1e3
        row["device_busy_s_est"] = round(busy, 2)
        row["device_idle_fraction_est"] = round(1 - busy / wall, 4)
    import jax

    row["platform"] = jax.default_backend()
    print(json.dumps(row))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(row, f, indent=1)
    shutil.rmtree(out_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
