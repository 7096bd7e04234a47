"""Multi-process weak-scaling bench with REAL (non-oversubscribed) cores
(VERDICT r2 item 4 / BASELINE north-star "≥90% efficiency 1 chip → 1 host
→ N hosts").

The r2 artifact's 8-virtual-device row (efficiency 0.42) measured core
contention, not the framework: 8 virtual CPU devices shared 4 physical
cores. This harness gives every JAX process its own dedicated cores via
`taskset`, so efficiency is a real resource-scaling number:

  baseline: 1 process × 1 CPU device, pinned to half the cores
  scaled:   2 processes × 1 CPU device each under jax.distributed
            (real coordinator, global 2-device mesh, cross-process
            collective in the timing graph), each pinned to its own half

Perfect weak scaling = the 2-process run matches the baseline ms/step
while processing 2× the audio. The per-batch program is collective-free
by construction (tests/test_structure.py asserts the HLO), so the only
cross-process traffic is the chained-steps graph's final scalar reduce —
exactly the shape of the production global-CMVN psum.

Usage:
  python scripts/bench_scaling_mp.py [-o SCALING_MP.json]
      [--per-device-batch 8] [--seconds 2.0] [--iters 30] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import socket
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def worker(argv: list[str]) -> int:
    coord, nprocs, pid, b, seconds, iters, reps = argv
    nprocs, pid, b = int(nprocs), int(pid), int(b)
    seconds, iters, reps = float(seconds), int(iters), int(reps)

    # one local device per process; cores come from the launcher's taskset
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nprocs > 1:
        from mfcc_tpu.parallel.mesh import distributed_init

        distributed_init(
            coordinator_address=coord, num_processes=nprocs, process_id=pid
        )
        assert jax.process_count() == nprocs
    import numpy as np

    from mfcc_tpu.config import named_config
    from mfcc_tpu.parallel import data_mesh
    from mfcc_tpu.parallel.extract import _sharded_steps
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mfcc_tpu.parallel.mesh import DATA_AXIS

    cfg = named_config("classic13_deltas")
    sr = cfg.sample_rate
    T = int(sr * seconds)
    g = np.random.default_rng(pid)
    local_audio = g.standard_normal((b, T)).astype(np.float32)
    local_lengths = np.full(b, T, dtype=np.int32)

    mesh = data_mesh()  # global mesh: nprocs × 1 device
    shard = NamedSharding(mesh, P(DATA_AXIS))
    audio = jax.make_array_from_process_local_data(shard, local_audio)
    lengths = jax.make_array_from_process_local_data(shard, local_lengths)

    def run(n_iters: int) -> float:
        return float(_sharded_steps(audio, lengths, cfg, "jnp", mesh, n_iters))

    i1 = max(2, iters // 10)
    run(i1)  # warm/compile both programs (all processes in lockstep)
    run(iters)
    slopes = []
    for _ in range(reps):
        run(i1)  # acts as a cross-process barrier: the graph ends in a
        # global reduce, so both processes leave it together
        t0 = time.perf_counter()
        run(i1)
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(iters)
        tb = time.perf_counter() - t0
        slopes.append((tb - ta) / (iters - i1))
    ms = sorted(slopes)[len(slopes) // 2] * 1e3
    global_batch = b * nprocs
    rate = global_batch * seconds / (ms / 1e3)
    if pid == 0:
        print(json.dumps({
            "worker": True, "nprocs": nprocs, "global_batch": global_batch,
            "ms_per_step": round(ms, 3), "audio_s_per_s": round(rate, 1),
        }), flush=True)
    return 0


def launch(nprocs: int, cores: list[str], args) -> dict:
    """Spawn nprocs workers, each pinned to its own core set; return the
    pid-0 result line."""
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    procs = []
    for pid in range(nprocs):
        cmd = [
            "taskset", "-c", cores[pid], sys.executable, __file__, "worker",
            coord, str(nprocs), str(pid), str(args.per_device_batch),
            str(args.seconds), str(args.iters), str(args.reps),
        ]
        procs.append(subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env={**os.environ, "PYTHONPATH": os.pathsep.join(
                [str(pathlib.Path(__file__).resolve().parent.parent)]
                + os.environ.get("PYTHONPATH", "").split(os.pathsep)
            )},
        ))
    outs = [p.communicate(timeout=900) for p in procs]
    for p, (out, err) in zip(procs, outs):
        if p.returncode != 0:
            sys.stderr.write(err[-4000:])
            raise RuntimeError(f"worker rc={p.returncode}")
    for out, _ in outs:
        for line in out.splitlines():
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if d.get("worker"):
                return d
    raise RuntimeError("no worker result line")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--per-device-batch", type=int, default=16)
    p.add_argument("--seconds", type=float, default=2.0)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--reps", type=int, default=7)
    p.add_argument("-o", "--output", default=None)
    args = p.parse_args()

    ncores = os.cpu_count() or 4
    # ONE dedicated core per process, from the top of the range: core 0
    # services the VM's IRQs and the dev harness runs its own processes,
    # so leaving the low cores free keeps that noise out of BOTH
    # measurements instead of absorbing it asymmetrically. The lockstep
    # cross-process reduce amplifies any straggler, so isolation matters
    # more than per-process core count here.
    # clamp to real cores: on a 1-core host both processes share core 0
    # (the measurement degrades but the harness still runs)
    lo = str(max(0, ncores - 2))
    hi = str(max(0, ncores - 1))

    # The dev VM's background load still adds ms-scale noise to single
    # runs: alternate baseline/scaled rounds and take medians.
    rounds = []
    for _ in range(3):
        b = launch(1, [hi], args)
        s = launch(2, [lo, hi], args)
        rounds.append((b, s))
    def med(xs):
        xs = sorted(xs)
        return xs[len(xs) // 2]
    base_ms = med([r[0]["ms_per_step"] for r in rounds])
    scaled_ms = med([r[1]["ms_per_step"] for r in rounds])
    base = {"ms_per_step": base_ms,
            "audio_s_per_s": round(args.per_device_batch * args.seconds / (base_ms / 1e3), 1)}
    scaled = {"ms_per_step": scaled_ms,
              "audio_s_per_s": round(2 * args.per_device_batch * args.seconds / (scaled_ms / 1e3), 1)}
    eff = (scaled["audio_s_per_s"] / base["audio_s_per_s"]) / 2
    result = {
        "metric": "weak_scaling_multiprocess",
        "platform": "cpu",
        "backend": "jnp",
        "config": "classic13_deltas",
        "per_device_batch": args.per_device_batch,
        "utterance_s": args.seconds,
        "cores_per_process": 1,
        "pinned_cores": {"baseline": hi, "scaled": [lo, hi]},
        "note": (
            "each jax.distributed process pinned to its own physical cores "
            "(taskset) — resources are real, unlike the oversubscribed "
            "virtual-device rows; the timing graph ends in a cross-process "
            "reduce (the global-CMVN collective shape)"
        ),
        "rows": [
            {"processes": 1, **base, "efficiency": 1.0},
            {"processes": 2, **scaled, "efficiency": round(eff, 3)},
        ],
        "rounds": [
            {"base_ms": r[0]["ms_per_step"], "scaled_ms": r[1]["ms_per_step"]}
            for r in rounds
        ],
    }
    print(json.dumps(result))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(result, f, indent=1)
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        sys.exit(worker(sys.argv[2:]))
    sys.exit(main())
