"""Smoke tests for the plotting layer (reference component C17)."""

import numpy as np

from mfcc_tpu import viz
from mfcc_tpu.config import NAMED_CONFIGS
from mfcc_tpu.testing.golden import golden_signals


def test_plot_all_writes_png(tmp_path):
    cfg = NAMED_CONFIGS["classic13"]
    sig = golden_signals()["speechish"]
    out = tmp_path / "summary.png"
    fig = viz.plot_all(sig, cfg, out)
    assert out.exists() and out.stat().st_size > 10_000
    assert len(fig.axes) >= 4

    import matplotlib.pyplot as plt

    plt.close("all")


def test_individual_panels():
    cfg = NAMED_CONFIGS["logmel80"]
    fig = viz.plot_filterbank(cfg)
    assert fig is not None
    g = np.random.default_rng(0)
    fig2 = viz.plot_features(g.standard_normal((50, 80)), cfg)
    assert fig2 is not None

    import matplotlib.pyplot as plt

    plt.close("all")
