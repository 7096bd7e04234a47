"""Per-config worst-case fp32 accuracy vs the float64 oracle (VERDICT r1
item 5: close or formally accept the 1e-4 vs 5e-4 cepstra gap).

For every named config and golden signal, measures the worst absolute
error of the fp32 chain (jnp backend, and pallas when on TPU) against the
frozen float64 goldens, split by stage:

  logmel      — before any cepstral processing
  features    — the shipped output (incl. lifter ×~12 amplification)
  features_fp64epi — fp32 log-mel/energy + FLOAT64 cepstral epilogue
                (DCT+lifter+energy replacement computed in f64 on host):
                isolates how much of the feature error originates in the
                epilogue vs upstream (DFT/log) — if this ≈ `features`,
                the epilogue contributes nothing and the floor is the
                fp32 spectrum itself.

Prints one JSON document; run on TPU for the hardware floor, on CPU for
the fp32-arithmetic floor.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--configs", default=None)
    p.add_argument("--backends", default=None, help="comma list; default auto")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mfcc_tpu.config import NAMED_CONFIGS
    from mfcc_tpu.ops import chain, constants as C, reference_numpy as ref
    from mfcc_tpu.testing.golden import golden_signals, load_golden

    platform = jax.default_backend()
    if args.backends:
        backends = args.backends.split(",")
    else:
        backends = ["jnp", "pallas"] if platform == "tpu" else ["jnp"]
    config_names = (
        args.configs.split(",") if args.configs else list(NAMED_CONFIGS)
    )
    signals = golden_signals()

    report = {"platform": platform, "configs": {}}
    for cname in config_names:
        cfg = NAMED_CONFIGS[cname]
        row = {}
        for backend in backends:
            worst = {"logmel": 0.0, "features": 0.0, "features_fp64epi": 0.0}
            for sname in signals:
                try:
                    g = load_golden(cname, sname)
                except FileNotFoundError:
                    continue
                sig = g["signal_input"] if "signal_input" in g else g["signal"]
                # full fp32 chain
                feat = chain.extract_single(sig, cfg, backend=backend)
                worst["features"] = max(
                    worst["features"],
                    float(np.abs(feat.astype(np.float64) - g["features"]).max()),
                )
                # stage split (jnp stages; pallas logmel equals via twin tests)
                stages = chain.logmel_single(sig, cfg)
                worst["logmel"] = max(
                    worst["logmel"],
                    float(
                        np.abs(
                            stages["logmel"].astype(np.float64) - g["logmel"]
                        ).max()
                    ),
                )
                if cfg.features == "mfcc":
                    # fp32 upstream + float64 epilogue
                    k = C.chain_constants(cfg)
                    logmel64 = stages["logmel"].astype(np.float64)
                    ceps = logmel64 @ k["dct"]
                    ceps = ceps * k["lifter"]
                    if cfg.append_energy:
                        e64 = stages["energy"].astype(np.float64)
                        ceps[:, 0] = np.log(e64)
                    want = g["features"][:, : cfg.n_ceps]
                    worst["features_fp64epi"] = max(
                        worst["features_fp64epi"],
                        float(np.abs(ceps - want).max()),
                    )
            row[backend] = {k: round(v, 8) for k, v in worst.items()}
        report["configs"][cname] = row
    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
