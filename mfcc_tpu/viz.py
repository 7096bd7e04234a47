"""Visualization (reference component C17, SURVEY.md §2.1): waveform,
spectrogram, mel filterbank shapes, MFCC/log-mel heatmaps.

matplotlib is imported lazily with the Agg backend so headless extraction
never pays for (or requires) a display. Each function returns the Figure;
`plot_all` writes a 4-panel summary PNG for one utterance — the modern form
of the reference's per-script plots.
"""

from __future__ import annotations

import numpy as np

from mfcc_tpu.config import FrontendConfig
from mfcc_tpu.ops import constants as C


def _plt():
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def plot_waveform(x, cfg: FrontendConfig, ax=None):
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots(figsize=(10, 2.5))
    sr = cfg.input_sample_rate or cfg.sample_rate
    t = np.arange(len(x)) / sr
    ax.plot(t, np.asarray(x), linewidth=0.5)
    ax.set_xlabel("time [s]")
    ax.set_ylabel("amplitude")
    ax.set_title("waveform")
    return ax.figure


def plot_spectrogram(pspec, cfg: FrontendConfig, ax=None, db_floor: float = -80.0):
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots(figsize=(10, 3.5))
    p = np.asarray(pspec, dtype=np.float64)
    db = 10.0 * np.log10(np.maximum(p, 1e-300))
    db = np.maximum(db - db.max(), db_floor)
    extent = [0, p.shape[0] * cfg.hop_s, 0, cfg.sample_rate / 2 / 1000.0]
    im = ax.imshow(db.T, origin="lower", aspect="auto", extent=extent, cmap="magma")
    ax.set_xlabel("time [s]")
    ax.set_ylabel("frequency [kHz]")
    ax.set_title("power spectrogram [dB]")
    ax.figure.colorbar(im, ax=ax, pad=0.01)
    return ax.figure


def plot_filterbank(cfg: FrontendConfig, ax=None):
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots(figsize=(10, 2.5))
    fb = C.mel_filterbank(cfg)  # [n_bins, n_mels]
    freqs = np.linspace(0, cfg.sample_rate / 2, cfg.n_bins)
    for j in range(cfg.n_mels):
        ax.plot(freqs, fb[:, j], linewidth=0.8)
    ax.set_xlabel("frequency [Hz]")
    ax.set_ylabel("weight")
    ax.set_title(f"mel filterbank ({cfg.n_mels} {cfg.mel_variant} triangles)")
    return ax.figure


def plot_features(feat, cfg: FrontendConfig, ax=None):
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots(figsize=(10, 3.5))
    f = np.asarray(feat, dtype=np.float64)
    extent = [0, f.shape[0] * cfg.hop_s, 0, f.shape[1]]
    im = ax.imshow(f.T, origin="lower", aspect="auto", extent=extent, cmap="viridis")
    kind = {"mfcc": "MFCC", "plp": "PLP", "ssc": "SSC",
            "spectrogram": "log-spectrogram"}.get(cfg.features, "log-mel")
    ax.set_xlabel("time [s]")
    ax.set_ylabel(f"{kind} index")
    ax.set_title(f"{kind} features [{f.shape[1]}]")
    ax.figure.colorbar(im, ax=ax, pad=0.01)
    return ax.figure


def plot_all(x, cfg: FrontendConfig, out_path=None):
    """4-panel summary: waveform / spectrogram / filterbank / features.

    x is at cfg.input_sample_rate; the waveform panel shows it as given,
    while spectrogram/features are computed at the chain's target rate
    (logmel_single and extract_single both resample internally)."""
    from mfcc_tpu.ops import chain

    plt = _plt()
    x = np.asarray(x, dtype=np.float64)
    stages = chain.logmel_single(x, cfg)
    feat = chain.extract_single(x, cfg)
    fig, axes = plt.subplots(4, 1, figsize=(11, 12), constrained_layout=True)
    plot_waveform(x, cfg, axes[0])
    plot_spectrogram(stages["pspec"], cfg, axes[1])
    plot_filterbank(cfg, axes[2])
    plot_features(feat, cfg, axes[3])
    if out_path is not None:
        fig.savefig(out_path, dpi=110)
    return fig
