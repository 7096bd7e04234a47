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
    """Drive a `mfcc_tpu serve` subprocess over its stdin/stdout protocol.

    The session API (open/push/end/drain/close) is transport-agnostic:
    BinaryServeClient below overrides only the four transport hooks
    (_popen_kw, _send, _send_push, _recv_event) for `--wire binary`."""

    _wire_args: tuple = ()
    _text = True

    def __init__(self, config: str = "classic13_deltas", streams: int = 16,
                 frames_per_block: int = 16, extra_args=()):
        self.proc = subprocess.Popen(
            [sys.executable, "-m", "mfcc_tpu.cli", "serve",
             "--config", config, "--streams", str(streams),
             "--frames-per-block", str(frames_per_block),
             *self._wire_args, *extra_args],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=self._text,
        )
        self.done: set[int] = set()
        self.frames: dict[int, list[np.ndarray]] = {}
        self.last_stats: dict | None = None

    # -- transport hooks -----------------------------------------------------

    def _send(self, **req) -> None:
        self.proc.stdin.write(json.dumps(req) + "\n")
        self.proc.stdin.flush()

    def _send_push(self, sid: int, pcm: np.ndarray) -> None:
        self._send(op="push", sid=sid,
                   pcm16=base64.b64encode(pcm.astype("<i2").tobytes()).decode())

    def _recv_event(self) -> dict | None:
        """One decoded event (frames materialized into ev["_feat"] /
        frames_batch into ev["_batch"]), or None on EOF. Understands every
        server --emit mode (b64, list, b64-batched)."""
        line = self.proc.stdout.readline()
        if not line:
            return None
        ev = json.loads(line)
        if ev.get("event") == "frames":
            if "data" in ev:
                ev["_feat"] = np.frombuffer(
                    base64.b64decode(ev["data"]), dtype="<f4"
                ).reshape(ev["n"], ev["dim"])
            else:  # --emit list
                ev["_feat"] = np.asarray(ev["frames"], dtype=np.float32)
        elif ev.get("event") == "frames_batch":
            ev["_batch"] = self._split_batch(
                ev["streams"], base64.b64decode(ev["data"])
            )
        return ev

    @staticmethod
    def _split_batch(metas, raw: bytes):
        out, off = [], 0
        for m in metas:
            k = m["n"] * m["dim"] * 4
            out.append((m["sid"], np.frombuffer(
                raw[off : off + k], "<f4"
            ).reshape(m["n"], m["dim"])))
            off += k
        return out

    # -- shared machinery ----------------------------------------------------

    def _read_available(self, block_for: int | None = None) -> None:
        """Consume responses; with block_for=sid, read until that stream is
        done."""
        while block_for is not None and block_for not in self.done:
            ev = self._recv_event()
            if ev is None:
                raise RuntimeError("server closed its stdout")
            self._handle(ev)

    def drain(self) -> None:
        """Non-blocking consume of whatever the server has emitted so far.
        Call between pushes on long-lived streams so neither side blocks on
        a full OS pipe buffer. (select sees the PIPE, not Python's read
        buffer — adequate for this reference client's cadence.)"""
        import select

        while select.select([self.proc.stdout], [], [], 0)[0]:
            ev = self._recv_event()
            if ev is None:
                return
            self._handle(ev)

    def _handle(self, ev: dict) -> None:
        kind = ev.get("event")
        if kind == "frames":
            self.frames.setdefault(ev["sid"], []).append(ev["_feat"])
        elif kind == "frames_batch":  # --emit b64-batched
            for sid, arr in ev["_batch"]:
                self.frames.setdefault(sid, []).append(arr)
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
            ev = self._recv_event()
            if ev is None:
                raise RuntimeError("server closed its stdout")
            if ev.get("event") == "opened":
                return ev["sid"]
            self._handle(ev)  # in-flight frames/done events are KEPT

    def push(self, sid: int, samples: np.ndarray) -> None:
        """samples: int16 array (or float in the int16 value range)."""
        pcm = np.asarray(samples)
        if pcm.dtype != np.int16:
            pcm = np.clip(np.rint(pcm), -32768, 32767).astype(np.int16)
        self._send_push(sid, pcm)

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
        while True:
            ev = self._recv_event()
            if ev is None:
                break
            self._handle(ev)
        self.proc.wait(timeout=60)
        return self.last_stats


class BinaryServeClient(ServeClient):
    """ServeClient over `--wire binary` (r5): length-prefixed framing —
    u32 header_len | JSON header | u32 payload_len | payload, both
    directions; push audio as raw little-endian int16 PCM, frames as raw
    float32 rows. Identical session API; 2–3× cheaper per stream-block
    (SERVING_r05.json)."""

    _wire_args = ("--wire", "binary")
    _text = False

    def _send(self, **req) -> None:
        self._send_framed(req)

    def _send_push(self, sid: int, pcm: np.ndarray) -> None:
        self._send_framed({"op": "push", "sid": sid},
                          np.ascontiguousarray(pcm, "<i2").tobytes())

    def _send_framed(self, obj: dict, payload: bytes = b"") -> None:
        import struct

        head = json.dumps(obj).encode()
        self.proc.stdin.write(
            struct.pack("<I", len(head)) + head
            + struct.pack("<I", len(payload)) + payload
        )
        self.proc.stdin.flush()

    def _recv_event(self) -> dict | None:
        import struct

        def read_exact(n):
            # possibly-short (like the server's reader): b"" = clean EOF,
            # short = truncation — never conflated
            buf = b""
            while len(buf) < n:
                chunk = self.proc.stdout.read(n - len(buf))
                if not chunk:
                    break
                buf += chunk
            return buf

        hl = read_exact(4)
        if not hl:
            return None  # clean EOF at a frame boundary
        if len(hl) < 4:
            raise RuntimeError("server stdout truncated mid length prefix")
        (hlen,) = struct.unpack("<I", hl)
        if hlen > (1 << 20):
            raise RuntimeError(f"wire desync: header length {hlen} > 1 MiB")
        head_b = read_exact(hlen)
        pl = read_exact(4) if len(head_b) == hlen else b""
        if len(pl) < 4:
            raise RuntimeError("server closed its stdout mid-message")
        (plen,) = struct.unpack("<I", pl)
        if plen > (1 << 30):
            raise RuntimeError(f"wire desync: payload length {plen} > 1 GiB")
        payload = read_exact(plen) if plen else b""
        if len(payload) < plen:
            raise RuntimeError("server closed its stdout mid-payload")
        ev = json.loads(head_b.decode())
        if ev.get("event") == "frames":
            # the server rejects --emit list on the binary wire (its
            # header-resident lists would overflow framed-header caps),
            # so frames payloads are always raw <f4 here
            ev["_feat"] = np.frombuffer(payload, "<f4").reshape(
                ev["n"], ev["dim"]
            )
        elif ev.get("event") == "frames_batch":
            ev["_batch"] = self._split_batch(ev["streams"], payload)
        return ev


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
