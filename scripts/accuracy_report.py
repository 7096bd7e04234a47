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

All golden signals of a config ride ONE padded batch per backend (the
masking-invariance suite certifies padded-batch rows == single-utterance
extraction bit-for-bit), so the whole report costs ~2 jit compiles per
config instead of ~2 per (config, signal) — which matters on relayed TPU
devices where each compile is 20-40 s.

Prints one JSON document; run on TPU for the hardware floor, on CPU for
the fp32-arithmetic floor.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
from functools import partial

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
    from mfcc_tpu.kernels import fused_logmel_stages
    from mfcc_tpu.ops import chain, constants as C, resample
    from mfcc_tpu.pipeline import pad_batch
    from mfcc_tpu.testing.golden import golden_signals, load_golden

    platform = jax.default_backend()
    if args.backends:
        backends = args.backends.split(",")
    else:
        backends = ["jnp", "pallas"] if platform == "tpu" else ["jnp"]
    config_names = (
        args.configs.split(",") if args.configs else list(NAMED_CONFIGS)
    )

    @partial(jax.jit, static_argnames=("cfg", "backend"))
    def stages_feat(audio, lengths, cfg, backend):
        audio = audio.astype(jnp.float32)
        if cfg.input_sample_rate and cfg.input_sample_rate != cfg.sample_rate:
            audio = resample.resample_batch(
                audio, cfg.input_sample_rate, cfg.sample_rate
            )
            lengths = resample.output_lengths(
                lengths, cfg.input_sample_rate, cfg.sample_rate
            )
        if backend == "pallas":
            st = fused_logmel_stages(audio, lengths, cfg)
        else:
            st = chain.logmel_stages(audio, lengths, cfg)
        feat = chain.features_from_logmel(st, cfg)
        F = st.get("num_frames")
        if F is not None and feat.shape[-2] != F:
            feat = feat[:, :F]
        return st["logmel"], st["energy"], feat

    report = {"platform": platform, "configs": {}}
    for cname in config_names:
        cfg = NAMED_CONFIGS[cname]
        sr = cfg.input_sample_rate or cfg.sample_rate
        goldens = {}
        for sname in golden_signals(sr):
            try:
                goldens[sname] = load_golden(cname, sname)
            except FileNotFoundError:
                continue
        if not goldens:
            continue
        sigs = [
            (g["signal_input"] if "signal_input" in g else g["signal"])
            for g in goldens.values()
        ]
        bb = pad_batch(sigs, cfg, bucket_len=max(s.shape[0] for s in sigs))
        audio = jnp.asarray(bb.audio)
        lengths = jnp.asarray(bb.lengths)

        row = {}
        for backend in backends:
            logmel_b, energy_b, feat_b = stages_feat(
                audio, lengths, cfg, backend
            )
            logmel_b = np.asarray(logmel_b, dtype=np.float64)
            energy_b = np.asarray(energy_b, dtype=np.float64)
            feat_b = np.asarray(feat_b, dtype=np.float64)

            worst = {"logmel": 0.0, "features": 0.0, "features_fp64epi": 0.0}
            k = C.chain_constants(cfg) if cfg.features == "mfcc" else None
            for i, (sname, g) in enumerate(goldens.items()):
                Fi = g["features"].shape[0]
                if Fi == 0:  # e.g. sub-frame signals under frame_tail="drop"
                    continue
                worst["features"] = max(
                    worst["features"],
                    float(np.abs(feat_b[i, :Fi] - g["features"]).max()),
                )
                if cfg.features != "ssc" or backend == "jnp":
                    # the fused ssc kernel's stage lanes are CENTROIDS,
                    # not log-mel — comparing them to the log-mel golden
                    # would be meaningless
                    worst["logmel"] = max(
                        worst["logmel"],
                        float(np.abs(logmel_b[i, :Fi] - g["logmel"]).max()),
                    )
                if k is not None:
                    # fp32 upstream + float64 epilogue
                    ceps = logmel_b[i, :Fi] @ k["dct"]
                    ceps = ceps * k["lifter"]
                    if cfg.append_energy:
                        ceps[:, 0] = np.log(energy_b[i, :Fi])
                    want = g["features"][:, : cfg.n_ceps]
                    worst["features_fp64epi"] = max(
                        worst["features_fp64epi"],
                        float(np.abs(ceps - want).max()),
                    )
            row[backend] = {kk: round(v, 8) for kk, v in worst.items()}
        report["configs"][cname] = row
    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
