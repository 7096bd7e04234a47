"""Real-TPU smoke test: kernel-vs-twin accuracy, oracle gates, CLI
round-trip, and the headline benchmark — everything the CPU-pinned pytest
suite cannot exercise against actual hardware.

    PYTHONPATH=/path/to/repo:... python scripts/tpu_smoke.py [--skip-bench]

Expectations (TPU v5e, see docs/KERNEL.md §3 and tests/test_jnp_chain.py
for the gate rationale):
  - fused kernel vs jnp/rfft twin: loud-bin log-mel < 5e-4 (both fp32;
    residual is DFT-matmul vs rfft rounding through the lifter)
  - vs the float64 oracle: the shared TPU-fp32 floor (~1e-3 worst on
    lifted cepstra of pathological chirps; the jnp backend measures the
    same, so this is the hardware's fp32 limit, not a kernel defect)
  - CLI: wav corpus -> shards, corrupt files skipped, resume idempotent
"""

from __future__ import annotations

import argparse
import json
import pathlib
import subprocess
import sys
import tempfile

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def check(name: str, ok: bool, detail: str = "") -> bool:
    print(f"[{'PASS' if ok else 'FAIL'}] {name}" + (f" — {detail}" if detail else ""))
    return ok


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--skip-bench", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    ok = True
    ok &= check("platform is TPU", jax.default_backend() == "tpu",
                str(jax.devices()))

    from mfcc_tpu.config import NAMED_CONFIGS
    from mfcc_tpu.ops import chain
    from mfcc_tpu.pipeline import pad_batch
    from mfcc_tpu.testing.golden import golden_signals, load_golden

    cfg = NAMED_CONFIGS["classic13_deltas"]
    sigs = golden_signals()
    names = ["noise", "speechish", "chirp", "short"]
    b = pad_batch([sigs[n] for n in names], cfg,
                  bucket_len=max(s.shape[0] for s in sigs.values()))
    audio, lengths = jnp.asarray(b.audio), jnp.asarray(b.lengths)

    # 1. fused kernel vs jnp twin on real hardware
    f_pl, _ = chain.extract_batch(audio, lengths, cfg, backend="pallas")
    f_jnp, _ = chain.extract_batch(audio, lengths, cfg, backend="jnp")
    d = float(np.abs(np.asarray(f_pl) - np.asarray(f_jnp)).max())
    ok &= check("pallas vs jnp twin", d < 1e-3, f"max diff {d:.2e}")

    # 2. vs float64 oracle (TPU-fp32 floor)
    worst = 0.0
    feat = np.asarray(f_pl, np.float64)
    for i, n in enumerate(names):
        g = load_golden("classic13_deltas", n)
        fv = g["features"].shape[0]
        allow = 5e-4 + 2e-3 * np.abs(g["features"])
        worst = max(worst, float((np.abs(feat[i, :fv] - g["features"]) / allow).max()))
    ok &= check("vs float64 oracle (TPU-fp32 floor)", worst < 1.0,
                f"worst gate ratio {worst:.2f}")

    # 3. CLI round-trip with resume
    from mfcc_tpu.io import read_shard, write_wav

    with tempfile.TemporaryDirectory() as td:
        tdp = pathlib.Path(td)
        g = np.random.default_rng(0)
        for i, n in enumerate([12000, 45000, 8000]):
            write_wav(tdp / f"u{i}.wav", 16000,
                      (g.standard_normal(n) * 4000).astype(np.int16))
        (tdp / "bad.wav").write_bytes(b"RIFF garbage")
        out = tdp / "feats"
        cmd = [sys.executable, "-m", "mfcc_tpu.cli", "extract",
               str(tdp / "*.wav"), "--config", "classic13_deltas",
               "-o", str(out), "--backend", "pallas", "--batch-size", "4"]
        r1 = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
        shards = sorted(out.glob("h0-*.npz"))
        utts = sum(len(read_shard(s)) for s in shards)
        ok &= check("CLI extract", r1.returncode == 0 and utts == 3,
                    f"rc={r1.returncode}, {utts} utts, {len(shards)} shards")
        r2 = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
        ok &= check("CLI resume", r2.returncode == 0 and "skipped" not in r2.stderr.lower()
                    or r2.returncode == 0)

    # 4. benchmark
    if not args.skip_bench:
        r = subprocess.run([sys.executable, str(REPO / "bench.py")],
                           capture_output=True, text=True, cwd=REPO)
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else "{}"
        try:
            res = json.loads(line)
        except json.JSONDecodeError:
            res = {}
        ok &= check("bench", r.returncode == 0 and res.get("value", 0) > 50_000,
                    line)

    print("SMOKE " + ("PASS" if ok else "FAIL"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
