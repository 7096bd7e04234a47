"""Device-free measurement of the serving pool's HOST side (VERDICT r2
item 6): how much wall time MultiStreamExtractor.poll() spends in Python
slot bookkeeping (dict scans, window assembly, per-row copies) when the
device calls cost nothing.

Method: build the pool, run one real poll() to shape the batched block
outputs, then replace the two jitted vmapped device fns with stubs that
return preallocated arrays instantly. Every remaining microsecond is host
work. Reported as µs per stream-block and as the projected number of
REALTIME streams the host loop alone can sustain (a realtime stream emits
one K-frame base block every K*hop seconds), assuming the device+PCIe
side overlaps (on a real TPU VM the device work per block is ~1.5 µs/stream
— SERVING_r02.json — so the host loop is the candidate bound).

Usage:
  python scripts/bench_serving_host.py [--streams 16,64,256] [--rounds 30]
      [-o SERVING_HOST.json]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def measure(n_streams: int, rounds: int, cfg_name: str) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from mfcc_tpu.config import named_config
    from mfcc_tpu.pipeline.serving import MultiStreamExtractor

    cfg = named_config(cfg_name)
    K = 16
    pool = MultiStreamExtractor(cfg, n_streams=n_streams, frames_per_block=K)
    chunk_len = K * cfg.frame_step  # one base block of audio per round
    g = np.random.default_rng(0)
    chunks = [
        g.standard_normal(chunk_len).astype(np.float32) for _ in range(8)
    ]

    sids = [pool.open() for _ in range(n_streams)]
    # prime enough audio that the first poll runs every path once with the
    # REAL device fns (shapes the stub outputs)
    for sid in sids:
        pool.push(sid, chunks[0])
        pool.push(sid, chunks[1])
    shapes: dict = {}
    real_base = pool._base_b
    real_fin = dict(pool._fin_b)

    def capture_base(w, v):
        r = real_base(w, v)
        shapes["base"] = np.asarray(r)
        return r

    pool._base_b = capture_base
    pool.poll()
    assert "base" in shapes, "first poll did not dispatch a base block"
    base_stub_out = np.zeros_like(shapes["base"])
    pool._base_b = lambda w, v: base_stub_out

    fin_outs: dict = {}

    def make_fin_stub(kind):
        def stub(w, v):
            key = (kind, w.shape)
            if key not in fin_outs:
                fin_outs[key] = np.asarray(real_fin[kind](w, v))
            return fin_outs[key]
        return stub

    pool._fin_b = {k: make_fin_stub(k) for k in real_fin}

    # steady state: every stream gets one block of audio per round
    times = []
    for r in range(rounds):
        for i, sid in enumerate(sids):
            pool.push(sid, chunks[(r + i) % len(chunks)])
        t0 = time.perf_counter()
        pool.poll()
        times.append(time.perf_counter() - t0)
    times.sort()
    med = times[len(times) // 2]
    per_stream_us = med / n_streams * 1e6
    block_s = K * cfg.frame_step / cfg.sample_rate  # audio seconds per block
    # a realtime stream needs 1/block_s base blocks per second
    capacity = 1.0 / (per_stream_us * 1e-6) * block_s
    return {
        "n_streams": n_streams,
        "poll_ms_median": round(med * 1e3, 3),
        "per_stream_block_us": round(per_stream_us, 2),
        "projected_realtime_streams_host_only": int(capacity),
    }


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--streams", default="16,64,256")
    p.add_argument("--rounds", type=int, default=30)
    p.add_argument("--config", default="classic13_deltas")
    p.add_argument("-o", "--output", default=None)
    args = p.parse_args()

    rows = [
        measure(int(n), args.rounds, args.config)
        for n in args.streams.split(",")
    ]
    for r in rows:
        print(json.dumps(r))
    result = {
        "metric": "serving_host_overhead",
        "config": args.config,
        "frames_per_block": 16,
        "note": (
            "device fns stubbed with preallocated outputs — every µs is "
            "Python/numpy slot bookkeeping; projected capacity assumes the "
            "~1.5 µs/stream device block (SERVING_r02.json) overlaps"
        ),
        "rows": rows,
    }
    print(json.dumps(result))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(result, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
