"""Reference client for `mfcc_tpu serve` — the JSON-lines online serving
protocol (cli/main.py cmd_serve docstring is the protocol spec).

`ServeClient` launches the server as a subprocess and exposes the protocol
as a tiny session API; the demo below streams two wavs concurrently in
20 ms packets and prints the feature shapes as they arrive:

    python examples/serve_client.py a.wav b.wav [--config classic13_deltas]

Integrators targeting another language can treat this file as the wire
documentation: one JSON object per line in each direction, frames as
base64 little-endian float32.
"""

from __future__ import annotations

import argparse
import base64
import json
import pathlib
import subprocess
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


class ServeClient:
    """Drive a `mfcc_tpu serve` subprocess over its stdin/stdout protocol."""

    def __init__(self, config: str = "classic13_deltas", streams: int = 16,
                 frames_per_block: int = 16, extra_args=()):
        self.proc = subprocess.Popen(
            [sys.executable, "-m", "mfcc_tpu.cli", "serve",
             "--config", config, "--streams", str(streams),
             "--frames-per-block", str(frames_per_block), *extra_args],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True,
        )
        self.done: set[int] = set()
        self.frames: dict[int, list[np.ndarray]] = {}
        self.last_stats: dict | None = None

    # -- protocol ------------------------------------------------------------

    def _send(self, **req) -> None:
        self.proc.stdin.write(json.dumps(req) + "\n")
        self.proc.stdin.flush()

    def _read_available(self, block_for: int | None = None) -> None:
        """Consume response lines; with block_for=sid, read until that
        stream is done."""
        while block_for is not None and block_for not in self.done:
            line = self.proc.stdout.readline()
            if not line:
                raise RuntimeError("server closed its stdout")
            self._handle(json.loads(line))

    def drain(self) -> None:
        """Non-blocking consume of whatever the server has emitted so far.
        Call between pushes on long-lived streams so neither side blocks on
        a full OS pipe buffer."""
        import select

        while select.select([self.proc.stdout], [], [], 0)[0]:
            line = self.proc.stdout.readline()
            if not line:
                return
            self._handle(json.loads(line))

    def _handle(self, ev: dict) -> None:
        kind = ev.get("event")
        if kind == "frames":
            feat = np.frombuffer(
                base64.b64decode(ev["data"]), dtype="<f4"
            ).reshape(ev["n"], ev["dim"])
            self.frames.setdefault(ev["sid"], []).append(feat)
        elif kind == "done":
            self.done.add(ev["sid"])
        elif kind == "stats":
            self.last_stats = ev
        elif kind == "error":
            raise RuntimeError(f"server error: {ev['msg']}")

    # -- session API ---------------------------------------------------------

    def open(self) -> int:
        self._send(op="open")
        while True:
            ev = json.loads(self.proc.stdout.readline())
            if ev.get("event") == "opened":
                return ev["sid"]
            self._handle(ev)

    def push(self, sid: int, samples: np.ndarray) -> None:
        """samples: int16 array (or float in the int16 value range)."""
        pcm = np.asarray(samples)
        if pcm.dtype != np.int16:
            pcm = np.clip(np.rint(pcm), -32768, 32767).astype(np.int16)
        self._send(op="push", sid=sid,
                   pcm16=base64.b64encode(pcm.astype("<i2").tobytes()).decode())

    def end(self, sid: int) -> np.ndarray:
        """End the stream and block until its tail arrives; returns the
        stream's full [F, D] feature matrix."""
        self._send(op="end", sid=sid)
        self._read_available(block_for=sid)
        parts = self.frames.pop(sid, [])
        return (np.concatenate(parts, axis=0) if parts
                else np.zeros((0, 0), np.float32))

    def close(self) -> dict | None:
        """EOF the server (flushes any open streams) and return its final
        stats event."""
        self.proc.stdin.close()
        for line in self.proc.stdout:
            self._handle(json.loads(line))
        self.proc.wait(timeout=60)
        return self.last_stats


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("wavs", nargs="+")
    ap.add_argument("--config", default="classic13_deltas")
    args = ap.parse_args()

    from mfcc_tpu.io import read_wav

    client = ServeClient(config=args.config, streams=len(args.wavs))
    sessions = []
    for path in args.wavs:
        sr, samples = read_wav(path)
        sessions.append((client.open(), path, samples, sr))

    # interleave 20 ms packets across all sessions (a live-traffic shape)
    step = max(s[3] for s in sessions) // 50
    pos = 0
    while any(pos < s[2].shape[0] for s in sessions):
        for sid, _, samples, _ in sessions:
            if pos < samples.shape[0]:
                client.push(sid, samples[pos : pos + step])
        client.drain()  # keep the response pipe from filling
        pos += step

    for sid, path, samples, sr in sessions:
        feat = client.end(sid)
        print(f"{path}: {samples.shape[0] / sr:.2f}s -> {feat.shape} features")
    stats = client.close()
    print("server stats:", json.dumps(stats, indent=None))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())


class BinaryServeClient:
    """Same session API over `--wire binary` (r5): length-prefixed framing
    — u32 header_len | JSON header | u32 payload_len | payload, both
    directions. Push audio as raw little-endian int16 PCM; frames arrive
    as raw float32 rows. 2–3× cheaper per stream-block than jsonl
    (SERVING_r05.json); use it when a single wire thread must carry
    thousands of realtime streams."""

    def __init__(self, config: str = "classic13_deltas", streams: int = 16,
                 frames_per_block: int = 16, extra_args=()):
        self.proc = subprocess.Popen(
            [sys.executable, "-m", "mfcc_tpu.cli", "serve",
             "--config", config, "--streams", str(streams),
             "--frames-per-block", str(frames_per_block),
             "--wire", "binary", *extra_args],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        )
        self.frames: dict[int, list[np.ndarray]] = {}
        self.done: set[int] = set()

    def _send(self, obj: dict, payload: bytes = b"") -> None:
        import struct

        head = json.dumps(obj).encode()
        self.proc.stdin.write(
            struct.pack("<I", len(head)) + head
            + struct.pack("<I", len(payload)) + payload
        )
        self.proc.stdin.flush()

    def _read_msg(self):
        import struct

        def read_exact(n):
            buf = b""
            while len(buf) < n:
                chunk = self.proc.stdout.read(n - len(buf))
                if not chunk:
                    return None
                buf += chunk
            return buf

        hl = read_exact(4)
        if hl is None:
            return None
        head = json.loads(read_exact(struct.unpack("<I", hl)[0]).decode())
        (plen,) = struct.unpack("<I", read_exact(4))
        payload = read_exact(plen) if plen else b""
        return head, payload

    def open(self) -> int:
        self._send({"op": "open"})
        while True:
            head, _ = self._read_msg()
            if head["event"] == "opened":
                return head["sid"]

    def push_pcm16(self, sid: int, pcm: np.ndarray) -> None:
        self._send({"op": "push", "sid": sid},
                   np.ascontiguousarray(pcm, "<i2").tobytes())

    def end(self, sid: int) -> None:
        self._send({"op": "end", "sid": sid})

    def finish(self) -> dict[int, np.ndarray]:
        """Close stdin (EOF flush) and collect every stream's frames."""
        self.proc.stdin.close()
        while True:
            msg = self._read_msg()
            if msg is None:
                break
            head, payload = msg
            if head.get("event") == "frames":
                self.frames.setdefault(head["sid"], []).append(
                    np.frombuffer(payload, "<f4").reshape(
                        head["n"], head["dim"]
                    )
                )
            elif head.get("event") == "done":
                self.done.add(head["sid"])
        self.proc.wait(timeout=30)
        return {
            sid: np.concatenate(rows, axis=0)
            for sid, rows in self.frames.items()
        }
