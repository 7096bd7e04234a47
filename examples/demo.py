"""Tutorial demo — the modern form of the reference repo's main script
(SURVEY.md §3.1): synthesize (or load) a wav, extract MFCCs, print a
summary, write the 4-panel plot.

    python examples/demo.py [wav_path] [--config classic13] [--out demo.png]
"""

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from mfcc_tpu import named_config
from mfcc_tpu.io import read_wav, write_wav
from mfcc_tpu.ops import chain
from mfcc_tpu import viz


def synth_demo_wav(path, sr=16000, seconds=2.5):
    """A speech-ish test signal: harmonic stack with vibrato + noise."""
    g = np.random.default_rng(7)
    t = np.arange(int(sr * seconds)) / sr
    f0 = 140 * (1 + 0.03 * np.sin(2 * np.pi * 5 * t))
    phase = 2 * np.pi * np.cumsum(f0) / sr
    x = sum(np.sin(k * phase) / k for k in range(1, 6))
    x *= 0.5 + 0.5 * np.sin(2 * np.pi * 2.3 * t) ** 2  # syllable envelope
    x += 0.02 * g.standard_normal(t.shape[0])
    write_wav(path, sr, (x / np.abs(x).max() * 20000).astype(np.int16))
    return path


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("wav", nargs="?", help="input wav (synthesized if omitted)")
    p.add_argument("--config", default="classic13")
    p.add_argument("--out", default="demo.png")
    args = p.parse_args(argv)

    cfg = named_config(args.config)
    expect_sr = cfg.input_sample_rate or cfg.sample_rate
    wav_path = args.wav or synth_demo_wav("demo.wav", expect_sr)
    sr, samples = read_wav(wav_path)
    print(f"{wav_path}: {sr} Hz, {len(samples)} samples ({len(samples)/sr:.2f} s)")
    if sr != expect_sr:
        print(f"error: config {args.config} expects {expect_sr} Hz input; "
              f"use a matching --config (e.g. mfcc39_48k for 48 kHz) or "
              f"resample the file first", file=sys.stderr)
        return 2

    feat = chain.extract_single(samples.astype(np.float64), cfg)
    kind = "MFCC" if cfg.features == "mfcc" else "log-mel"
    print(f"{kind} features: {feat.shape[0]} frames x {feat.shape[1]} dims")
    label = "c0 (energy)" if cfg.features == "mfcc" else "mel[0]"
    print(f"  {label} range: [{feat[:, 0].min():.2f}, {feat[:, 0].max():.2f}]")
    print(f"  frame hop {cfg.hop_s*1e3:.0f} ms, window {cfg.win_len_s*1e3:.0f} ms, "
          f"{cfg.n_fft}-pt FFT, {cfg.n_mels} mels")

    viz.plot_all(samples.astype(np.float64), cfg, args.out)
    print(f"plots -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
