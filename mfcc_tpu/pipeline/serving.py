"""Multi-stream (serving) front-end: N concurrent online streams batched
onto the chip.

A production serving box runs many independent audio sessions at once. The
single-stream `StreamingExtractor` is dispatch-bound at small block sizes —
each K-frame block is one tiny device call (`LATENCY_r02.json`: the call
overhead dwarfs the µs of compute). This pool runs the SAME state machine
per stream but batches every device call across streams with `jax.vmap`
over the two fixed-shape jitted blocks, so one poll() round costs O(1)
dispatches for the whole pool (one base call + at most two finalize calls),
regardless of how many sessions are active.

Exactness: each stream's output is identical to its own
`StreamingExtractor` run (same block functions, vmapped — same fp32 ops on
the same windows), which in turn matches the offline chain for any chunking
(tests/test_streaming.py). Inactive pool rows compute garbage on zeros and
are discarded; shapes never depend on the number of active streams, so
nothing recompiles as sessions come and go.

Usage:

    pool = MultiStreamExtractor(cfg, n_streams=16, frames_per_block=16)
    sid = pool.open()                 # per new session
    pool.push(sid, chunk)             # buffer audio (host-only, cheap)
    out = pool.poll()                 # {sid: [k, feat_dim]} new frames
    pool.end(sid)                     # session's audio is complete
    ...poll() until pool.done(sid)    # tail frames arrive, slot auto-frees

The reference family has no online mode at all (SURVEY.md §1.1: an offline
per-utterance loop); this subsystem is serving infrastructure on top of the
same certified stages.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from mfcc_tpu.config import FrontendConfig
from mfcc_tpu.pipeline.streaming import (
    StreamingExtractor,
    _make_base_block,
    _make_finalize,
)

__all__ = ["MultiStreamExtractor"]


class _Slot:
    __slots__ = ("ex", "ended", "total_frames", "trimmed")

    def __init__(self, ex: StreamingExtractor):
        self.ex = ex
        self.ended = False
        self.total_frames: int | None = None
        self.trimmed = False


class MultiStreamExtractor:
    """Fixed-size pool of independent online streams sharing batched device
    blocks. See module docstring; per-stream semantics are exactly
    `StreamingExtractor`'s (push/flush parity with the offline chain)."""

    def __init__(
        self,
        cfg: FrontendConfig,
        n_streams: int,
        *,
        frames_per_block: int = 16,
        cmvn_moments=None,
        max_buffer_s: float | None = 600.0,
    ):
        """max_buffer_s: per-session cap on audio buffered ahead of poll()
        (a client that pushes but never polls would otherwise grow host
        memory without bound); None disables."""
        if n_streams < 1:
            raise ValueError("n_streams must be >= 1")
        self.cfg = cfg
        self.n_streams = int(n_streams)
        self.K = int(frames_per_block)
        self._kw = dict(frames_per_block=self.K, cmvn_moments=cmvn_moments)
        # constructing one extractor validates cfg (cmvn/resample rules)
        proto = StreamingExtractor(cfg, **self._kw)
        self.span = proto.span
        self.lookahead = c = proto.lookahead
        blk, _ = _make_base_block(cfg, self.K)
        self._base_b = jax.jit(jax.vmap(blk))
        self._fin_b = {
            "first": jax.jit(jax.vmap(_make_finalize(cfg, self.K + c))),
            "inner": jax.jit(jax.vmap(_make_finalize(cfg, 2 * c + self.K))),
        }
        self._slots: dict[int, _Slot] = {}
        self._next_sid = 0
        self._max_buffer = (
            None if max_buffer_s is None
            else int(max_buffer_s * cfg.sample_rate)
        )
        self._proto = proto  # reused for the first open()
        # observability counters (consumed by the CLI serve --metrics)
        self.stats = {
            "sessions_opened": 0, "sessions_finished": 0,
            "poll_rounds": 0, "base_dispatches": 0, "fin_dispatches": 0,
            "frames_emitted": 0,
        }

    # -- session management --------------------------------------------------

    def open(self) -> int:
        """Start a new stream; returns its session id (never reused).
        Raises RuntimeError when n_streams sessions are already active."""
        if len(self._slots) >= self.n_streams:
            raise RuntimeError(f"all {self.n_streams} stream slots in use")
        sid = self._next_sid
        self._next_sid += 1
        self.stats["sessions_opened"] += 1
        if self._proto is not None:
            ex, self._proto = self._proto, None
        else:
            ex = StreamingExtractor(self.cfg, **self._kw)
        self._slots[sid] = _Slot(ex)
        return sid

    def close(self, sid: int) -> None:
        """Abandon a stream (no tail extraction) and free its slot."""
        self._slot(sid)
        del self._slots[sid]
        self.stats["sessions_finished"] += 1  # opened == finished + active

    def end_all(self) -> None:
        """end() every stream not yet ended (flush semantics for shutdown);
        poll() until all are done() to drain the tails."""
        for sid, slot in list(self._slots.items()):
            if not slot.ended:
                self.end(sid)

    def done(self, sid: int) -> bool:
        """True once a stream is no longer active: its end()ed tail has been
        emitted by poll() (slot freed), or it was close()d."""
        return sid < self._next_sid and sid not in self._slots

    @property
    def n_active(self) -> int:
        return len(self._slots)

    # -- streaming -----------------------------------------------------------

    def push(self, sid: int, samples: np.ndarray) -> None:
        """Buffer a chunk for stream sid (host-only; device work in poll()).
        Raises RuntimeError when the session exceeds max_buffer_s of
        unpolled audio (backpressure: the client must poll())."""
        slot = self._slot(sid)
        if slot.ended:
            raise RuntimeError(f"stream {sid} already ended")
        if self._max_buffer is not None and (
            slot.ex._avail_samples() + np.asarray(samples).size
            > self._max_buffer
        ):
            raise RuntimeError(
                f"stream {sid} has more than {self._max_buffer} samples "
                "buffered ahead of poll(); call poll() to drain"
            )
        slot.ex._ingest(samples)

    def end(self, sid: int) -> None:
        """Mark stream sid complete; its pad-tail + delta end edges are
        emitted by subsequent poll() calls, after which the slot frees."""
        slot = self._slot(sid)
        if slot.ended:
            raise RuntimeError(f"stream {sid} already ended")
        slot.ended = True
        slot.ex._ingest_tail()  # drain the resampler look-ahead, if any
        n = slot.ex._n_samples
        slot.total_frames = self.cfg.num_frames(n) if n > 0 else 0

    def poll(self) -> dict[int, np.ndarray]:
        """Run batched extraction rounds until no stream can advance.

        Returns {sid: [k, feat_dim]} for every stream that emitted frames,
        plus an entry (possibly empty) for every stream that finished; a
        finished stream's slot is freed before poll returns."""
        out: dict[int, list[np.ndarray]] = {}
        finished: list[int] = []
        self.stats["poll_rounds"] += 1
        while True:
            progressed = False
            # phase 1: one base block per stream that has one ready
            reqs: list[tuple[int, _Slot, int]] = []
            wins = None
            for sid, slot in list(self._slots.items()):
                need = self._base_need(slot)
                if need is None:
                    continue
                valid, pad = need
                if wins is None:
                    wins = np.zeros(
                        (self.n_streams, self.span + 1), dtype=np.float32
                    )
                    valids = np.zeros((self.n_streams,), dtype=np.int32)
                row = len(reqs)
                slot.ex._prepare_base(pad=pad, out=wins[row])
                valids[row] = valid
                reqs.append((sid, slot, row))
            if reqs:
                base = np.asarray(
                    self._base_b(jnp.asarray(wins), jnp.asarray(valids))
                )
                for sid, slot, row in reqs:
                    slot.ex._commit_base(base[row])
                progressed = True
                self.stats["base_dispatches"] += 1

            # phase 2: finalize/drain, batched per finalize width
            plans: list[tuple[int, _Slot, dict]] = []
            for sid, slot in list(self._slots.items()):  # _finish mutates
                ex = slot.ex
                if slot.ended and ex._t0 >= (slot.total_frames or 0):
                    if not slot.trimmed:
                        # drop pad-block rows beyond the true frame count
                        ex._base = ex._base[
                            : max(0, slot.total_frames - ex._base_at)
                        ]
                        slot.trimmed = True
                    plan = ex._drain_plan(final=True, total=slot.total_frames)
                    if plan is None:
                        self._finish(sid, finished)
                        progressed = True
                        continue
                    plan["final"] = True
                else:
                    plan = ex._drain_plan(final=False)
                    if plan is None:
                        continue
                    plan["final"] = False
                plans.append((sid, slot, plan))

            for kind in ("first", "inner"):
                group = [p for p in plans if p[2]["kind"] == kind]
                if not group:
                    continue
                width = group[0][2]["win"].shape[0]
                dim = group[0][2]["win"].shape[1]
                bwin = np.zeros((self.n_streams, width, dim), dtype=np.float32)
                # idle rows: n_valid=width, so no row--1 tail replication
                bval = np.full((self.n_streams,), width, dtype=np.int32)
                for row, (_, _, plan) in enumerate(group):
                    bwin[row] = plan["win"]
                    bval[row] = plan["n_valid"]
                res = np.asarray(
                    self._fin_b[kind](jnp.asarray(bwin), jnp.asarray(bval))
                )
                self.stats["fin_dispatches"] += 1
                for row, (sid, slot, plan) in enumerate(group):
                    feat = slot.ex._drain_commit(plan, res[row])
                    out.setdefault(sid, []).append(feat)
                    if plan["final"]:
                        self._finish(sid, finished)
                progressed = True
            # deltaless streams: no device work in finalize
            for sid, slot, plan in plans:
                if plan["kind"] is None:
                    feat = slot.ex._drain_commit(plan, None)
                    out.setdefault(sid, []).append(feat)
                    if plan["final"]:
                        self._finish(sid, finished)
                    progressed = True

            if not progressed:
                break

        result = {
            sid: (
                np.concatenate(parts, axis=0)
                if parts
                else np.zeros((0, self.cfg.feat_dim), dtype=np.float32)
            )
            for sid, parts in out.items()
        }
        self.stats["frames_emitted"] += sum(r.shape[0] for r in result.values())
        for sid in finished:
            result.setdefault(
                sid, np.zeros((0, self.cfg.feat_dim), dtype=np.float32)
            )
        return result

    # -- internals -------------------------------------------------------------

    def _slot(self, sid: int) -> _Slot:
        try:
            return self._slots[sid]
        except KeyError:
            raise KeyError(f"stream {sid} is not open") from None

    def _finish(self, sid: int, finished: list[int]) -> None:
        if sid in self._slots:
            del self._slots[sid]
            finished.append(sid)
            self.stats["sessions_finished"] += 1

    def _base_need(self, slot: _Slot):
        """(valid, pad) if the stream has a base block to compute — the
        window itself is assembled straight into the pool's batched rows
        by poll() (ex._prepare_base(out=...), no per-stream staging)."""
        ex = slot.ex
        if not slot.ended:
            if ex._avail_samples() >= ex.span:
                return ex.span, False
            return None
        if slot.total_frames and ex._t0 < slot.total_frames:
            valid = max(0, min(ex._avail_samples(), ex.span))
            return valid, True
        return None
