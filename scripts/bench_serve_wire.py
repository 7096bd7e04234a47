"""Measure the `mfcc_tpu serve` WIRE layer (VERDICT r4 item 6) — the
JSON-lines protocol cost that sits ON TOP of the serving pool:

  request side : json.loads + base64 pcm16 decode + frombuffer per push
  response side: b64-encode of the [K, D] frames tile + json.dumps +
                 stdout write/flush per frames event
  loop policy  : cmd_serve historically ran pool.poll() after EVERY
                 input line — an O(n_active) slot scan per line, O(n²)
                 per round of n pushes.

Three measurements, all device-free:

  wire        — the REAL cmd_serve loop driven in-process with stdin/
                stdout monkeypatched (requests pre-rendered, output to
                /dev/null) and the pool replaced by an O(1) stub: what's
                left is pure wire work, reported as µs per stream-block.
  empty_poll  — the REAL MultiStreamExtractor.poll() with no stream
                ready (the per-line drain's scan cost), µs vs n_streams.
  composed    — per-round wall = n·(wire + empty_poll(n)) + full_poll(n)
                projection, showing whether the per-line drain policy or
                the serialization binds at n ∈ {64, 256, 1024}.

Usage: python scripts/bench_serve_wire.py [--streams 64,256,1024]
           [--rounds 20] [-o SERVING_WIRE.json]
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


class StubPool:
    """O(1)-per-call stand-in for MultiStreamExtractor: push accumulates
    samples, poll returns one canned [K, D] tile per completed block —
    so every microsecond the serve loop spends beyond this is wire."""

    def __init__(self, cfg, n_streams=8, frames_per_block=16,
                 cmvn_moments=None):
        self.K, self.D = frames_per_block, cfg.feat_dim
        self.hop = cfg.frame_step
        self.blk = self.K * self.hop
        self._feat = np.full((self.K, self.D), 0.5, np.float32)
        self._buf: dict[int, int] = {}
        self._ready: dict[int, int] = {}
        self._ended: set[int] = set()
        self._next = 0
        self.stats = {"poll_rounds": 0}

    @property
    def n_active(self):
        return len(self._buf)

    def open(self):
        sid = self._next
        self._next += 1
        self._buf[sid] = 0
        return sid

    def push(self, sid, x):
        self._buf[sid] += x.size
        while self._buf[sid] >= self.blk:
            self._buf[sid] -= self.blk
            self._ready[sid] = self._ready.get(sid, 0) + 1

    def end(self, sid):
        self._ended.add(sid)

    def end_all(self):
        for sid in list(self._buf):
            self._ended.add(sid)
        # tails drain instantly in the stub
        for sid in list(self._buf):
            if sid in self._ended:
                del self._buf[sid]

    def close(self, sid):
        self._buf.pop(sid, None)

    def done(self, sid):
        if sid in self._ended and sid in self._buf:
            del self._buf[sid]
            return True
        return False

    def poll(self):
        self.stats["poll_rounds"] += 1
        out = {sid: self._feat for sid in self._ready}
        self._ready.clear()
        return out


class _FakeIn:
    def __init__(self, lines):
        self._lines = lines

    def __iter__(self):
        return iter(self._lines)


class _FakeBinIn:
    def __init__(self, data: bytes):
        self.buffer = io.BytesIO(data)

    def __iter__(self):
        return iter(())


def render_requests_binary(n_streams: int, rounds: int,
                           chunk_samples: int) -> bytes:
    import struct

    def frame(obj, payload=b""):
        head = json.dumps(obj).encode()
        return (struct.pack("<I", len(head)) + head
                + struct.pack("<I", len(payload)) + payload)

    g = np.random.default_rng(0)
    pcm = (g.standard_normal(chunk_samples) * 3000).astype("<i2").tobytes()
    parts = [frame({"op": "open"}) for _ in range(n_streams)]
    for _ in range(rounds):
        for sid in range(n_streams):
            parts.append(frame({"op": "push", "sid": sid}, pcm))
    for sid in range(n_streams):
        parts.append(frame({"op": "end", "sid": sid}))
    return b"".join(parts)


def render_requests(n_streams: int, rounds: int, chunk_samples: int) -> list:
    g = np.random.default_rng(0)
    pcm = (g.standard_normal(chunk_samples) * 3000).astype("<i2")
    b64 = base64.b64encode(pcm.tobytes()).decode("ascii")
    lines = [json.dumps({"op": "open"}) + "\n" for _ in range(n_streams)]
    for _ in range(rounds):
        for sid in range(n_streams):
            lines.append(
                json.dumps({"op": "push", "sid": sid, "pcm16": b64}) + "\n"
            )
    for sid in range(n_streams):
        lines.append(json.dumps({"op": "end", "sid": sid}) + "\n")
    return lines


def measure_wire(n_streams: int, rounds: int, cfg_name: str,
                 emit: str = "b64", wire: str = "jsonl") -> dict:
    import importlib

    import mfcc_tpu.pipeline as pipeline_mod
    cli_main = importlib.import_module("mfcc_tpu.cli.main")
    from mfcc_tpu.config import named_config

    cfg = named_config(cfg_name)
    K = 16
    wire_mode = wire
    if wire_mode == "binary":
        fake_in = _FakeBinIn(
            render_requests_binary(n_streams, rounds, K * cfg.frame_step)
        )
    else:
        fake_in = _FakeIn(
            render_requests(n_streams, rounds, K * cfg.frame_step)
        )

    real_pool = pipeline_mod.MultiStreamExtractor
    pipeline_mod.MultiStreamExtractor = StubPool
    old_in, old_out = sys.stdin, sys.stdout
    devnull = open("/dev/null", "w")  # TextIOWrapper: .buffer exists and
    # points at the underlying binary stream - both wire modes work
    try:
        sys.stdin, sys.stdout = fake_in, devnull

        class A:
            config = cfg_name
            set = []
            cmvn_stats = None
            speaker = None
            streams = n_streams
            frames_per_block = K
            metrics = None
        A.emit = emit
        A.wire = wire_mode

        t0 = time.perf_counter()
        rc = cli_main.cmd_serve(A())
        wall = time.perf_counter() - t0
    finally:
        sys.stdin, sys.stdout = old_in, old_out
        pipeline_mod.MultiStreamExtractor = real_pool
        devnull.close()
    assert rc == 0
    blocks = n_streams * rounds
    return {
        "n_streams": n_streams,
        "rounds": rounds,
        "wall_s": round(wall, 4),
        "wire_us_per_stream_block": round(wall / blocks * 1e6, 2),
    }


def measure_empty_poll(n_streams: int, cfg_name: str, iters: int = 50) -> float:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from mfcc_tpu.config import named_config
    from mfcc_tpu.pipeline.serving import MultiStreamExtractor

    cfg = named_config(cfg_name)
    pool = MultiStreamExtractor(cfg, n_streams=n_streams, frames_per_block=16)
    for _ in range(n_streams):
        pool.open()  # active but with no audio: nothing ever ready
    t0 = time.perf_counter()
    for _ in range(iters):
        pool.poll()
    return (time.perf_counter() - t0) / iters * 1e6  # µs


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--streams", default="64,256,1024")
    p.add_argument("--rounds", type=int, default=20)
    p.add_argument("--config", default="logmel80")
    p.add_argument("-o", "--output", default=None)
    args = p.parse_args()

    rows = []
    for n in [int(x) for x in args.streams.split(",")]:
        w = measure_wire(n, args.rounds, args.config)
        wb = measure_wire(n, args.rounds, args.config, emit="b64-batched")
        w["wire_us_per_stream_block_batched_emit"] = (
            wb["wire_us_per_stream_block"]
        )
        wbin = measure_wire(n, args.rounds, args.config, wire="binary")
        w["wire_us_per_stream_block_binary"] = (
            wbin["wire_us_per_stream_block"]
        )
        ep = measure_empty_poll(n, args.config)
        w["empty_poll_us"] = round(ep, 1)
        # one push line per stream-block; under the historical
        # drain-per-line policy every line pays an empty-ish poll scan
        w["per_line_drain_us_per_stream_block"] = round(ep, 1)
        rows.append(w)
        print(json.dumps(w))
    out = {"metric": "serve_wire", "config": args.config, "rows": rows}
    if args.output:
        with open(args.output, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
