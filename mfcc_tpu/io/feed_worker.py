"""Feed worker process: decodes wav files straight into shared-memory batch
slabs on command (the multi-process host feed — SURVEY.md §6, VERDICT r1
item 1).

Run as `python -m mfcc_tpu.io.feed_worker`; the parent (io.reader._MpPool)
speaks newline-delimited JSON over stdin/stdout:

  → {"op": "decode_chunk", "id": 7, "slab": "/dev/shm/..", "shape": [B, T],
     "dtype": "i16", "blen": 160000, "off": 0, "downmix": "first",
     "jobs": [[row, "path"], ...]}

"off" (default 0) is the row offset samples land at — the resample
BlockedLayout's pad_lo zeros (ops/resample.py): rows decode at
slab[row, off:off+blen] and both flanks are zeroed.
  ← {"id": 7, "fails": [[row, "error message"], ...]}

  → {"op": "exit"}   (or EOF)

Slabs are plain files in /dev/shm, np.memmap'd on first use and cached by
(name, shape, dtype) — the parent recycles slab files across batches, so
steady-state has zero mappings churn. Workers are plain subprocesses (not
multiprocessing children), so there is no __main__ re-import, no fork of a
threaded/JAX parent, and a worker crash is just an EOF the parent handles.

Decoding uses the same C++ wav_decode_file as the threaded path: open +
read + decode inside one GIL-free call, zero-filling up to blen; the row
tail beyond blen is zeroed here too so recycled slabs never leak stale
samples.
"""

from __future__ import annotations

import json
import sys

import numpy as np


def main() -> int:
    from mfcc_tpu.io import wav

    wav._native()  # build/load the C++ decoder once, up front
    slabs: dict[tuple, np.ndarray] = {}
    out = sys.stdout
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        cmd = json.loads(line)
        op = cmd.get("op")
        if op == "exit":
            break
        if op == "ping":
            out.write(json.dumps({"id": cmd.get("id"), "pong": True}) + "\n")
            out.flush()
            continue
        if op == "drop_slabs":
            # parent unlinked these slab files (stream ended): release the
            # mappings so the unlinked pages actually free
            names = set(cmd.get("names", []))
            for k in [k for k in slabs if k[0] in names]:
                del slabs[k]
            out.write(json.dumps({"id": cmd.get("id"), "dropped": True}) + "\n")
            out.flush()
            continue
        if op == "parse_headers":
            # phase-A offload (VERDICT r2 item 8): (sr, n) per path via the
            # native one-pread parse; errors ship as strings so the parent
            # keeps its skip/log/stats semantics unchanged
            heads = []
            for path in cmd["paths"]:
                try:
                    fsr, n = wav.parse_file_header(path)
                    heads.append([fsr, n])
                except (OSError, ValueError, wav.WavError) as e:
                    heads.append([0, -1, str(e)])
            out.write(json.dumps({"id": cmd.get("id"), "heads": heads}) + "\n")
            out.flush()
            continue
        if op != "decode_chunk":
            out.write(json.dumps({"id": cmd.get("id"),
                                  "error": f"unknown op {op!r}"}) + "\n")
            out.flush()
            continue
        key = (cmd["slab"], tuple(cmd["shape"]), cmd["dtype"])
        slab = slabs.get(key)
        if slab is None:
            dt = np.int16 if cmd["dtype"] == "i16" else np.float32
            slab = np.memmap(cmd["slab"], dtype=dt, mode="r+",
                             shape=tuple(cmd["shape"]))
            slabs[key] = slab
        blen = cmd["blen"]
        off = cmd.get("off", 0)
        downmix = cmd.get("downmix", "first")
        fails = []
        want_sr = cmd.get("sr")
        for job in cmd["jobs"]:
            row, path = job[0], job[1]
            want_n = job[2] if len(job) > 2 else None
            try:
                fsr, n_valid = wav.decode_file_into(
                    path, slab[row, off : off + blen], downmix=downmix
                )
                if (want_sr is not None and fsr != want_sr) or (
                    want_n is not None and n_valid != want_n
                ):
                    # file changed between the parent's header parse and
                    # this decode: fail the row rather than ship features
                    # extracted under a stale length/rate
                    slab[row, off : off + blen] = 0
                    fails.append([row, (
                        f"file changed since header parse: decoded "
                        f"{n_valid} samples at {fsr} Hz, header said "
                        f"{want_n} at {want_sr}"
                    )])
            except (OSError, ValueError, RuntimeError, wav.WavError) as e:
                slab[row, off : off + blen] = 0
                fails.append([row, str(e)])
            slab[row, :off] = 0  # blocked-layout prologue zeros
            slab[row, off + blen :] = 0  # tail beyond the bucket span
        out.write(json.dumps({"id": cmd["id"], "fails": fails}) + "\n")
        out.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
