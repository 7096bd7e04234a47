"""End-to-end framework demo: extract features → ShardDataset → train.

Synthesizes a tiny 2-class corpus (harmonic "voiced" tones vs broadband
noise), extracts MFCC+Δ shards with the batched chain, then trains a
mean-pooled logistic probe in pure jax off io.ShardDataset — the complete
extract→store→train loop a reference user would build around this
framework. Finishes in seconds on CPU; prints train/test accuracy.

    python examples/train_probe.py [--utts 80] [--config classic13_deltas]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import tempfile

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def synth_corpus(root: pathlib.Path, n_utts: int, sr: int = 16000):
    """Half voiced (harmonic stack, random f0), half noise. Returns
    (wav_paths, labels by utterance id)."""
    from mfcc_tpu.io import write_wav

    g = np.random.default_rng(0)
    labels = {}
    for i in range(n_utts):
        n = int(sr * (0.5 + g.random()))
        t = np.arange(n) / sr
        voiced = i % 2 == 0
        if voiced:
            f0 = 90 + 160 * g.random()
            x = sum(
                np.sin(2 * np.pi * f0 * k * t + g.random() * 6.28) / k
                for k in range(1, 9)
            )
            x = x / np.abs(x).max() * 8000 + g.standard_normal(n) * 200
        else:
            x = g.standard_normal(n) * 3000
        p = root / f"utt{i:04d}.wav"
        write_wav(p, sr, x.astype(np.int16))
        labels[str(p)] = int(voiced)
    return sorted(labels), labels


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--utts", type=int, default=80)
    ap.add_argument("--config", default="classic13_deltas")
    ap.add_argument("--steps", type=int, default=300)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mfcc_tpu.cli.main import main as cli
    from mfcc_tpu.config import named_config
    from mfcc_tpu.io import ShardDataset

    root = pathlib.Path(tempfile.mkdtemp(prefix="probe"))
    wavs, labels = synth_corpus(root, args.utts)
    out = root / "feats"
    rc = cli(["extract", *wavs, "--config", args.config, "-o", str(out),
              "--batch-size", "16", "--backend",
              "pallas" if jax.default_backend() == "tpu" else "jnp"])
    if rc != 0:
        return rc

    # mean-pool each utterance's features -> fixed-dim vectors
    ds = ShardDataset(out)
    ids, X = zip(*((uid, f.mean(axis=0)) for uid, f in ds))
    X = jnp.asarray(np.stack(X))
    y = jnp.asarray([labels[i] for i in ids], jnp.float32)
    mu, sd = X.mean(0), X.std(0) + 1e-6
    X = (X - mu) / sd
    n_test = max(4, len(ids) // 5)
    Xtr, ytr, Xte, yte = X[:-n_test], y[:-n_test], X[-n_test:], y[-n_test:]

    def loss(w, x, t):
        logit = x @ w[:-1] + w[-1]
        return jnp.mean(jnp.logaddexp(0.0, logit) - t * logit)

    w = jnp.zeros(X.shape[1] + 1)
    step = jax.jit(lambda w: w - 0.5 * jax.grad(loss)(w, Xtr, ytr))
    for _ in range(args.steps):
        w = step(w)

    def acc(x, t):
        return float(((x @ w[:-1] + w[-1] > 0) == (t > 0.5)).mean())

    print(f"corpus: {len(ids)} utts, feat_dim={X.shape[1]} "
          f"({named_config(args.config).feat_dim} raw, mean-pooled)")
    print(f"train acc: {acc(Xtr, ytr):.3f}   test acc: {acc(Xte, yte):.3f}")
    ok = acc(Xte, yte) >= 0.9
    print("PASS" if ok else "FAIL (expected >= 0.9 test accuracy)")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
