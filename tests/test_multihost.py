"""REAL multi-process distributed test: two OS processes, each with 4
virtual CPU devices, coordinated by jax.distributed — the closest
no-hardware analogue of a 2-host TPU pod run (SURVEY.md §4.2 item 6 goes
beyond the single-process simulation here).

Checks: distributed init works, per-host file sharding covers the corpus
exactly once, per-host extraction + moment checkpoints merge to the same
global CMVN stats as a single-host run over the whole corpus.
"""

import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

from mfcc_tpu.config import NAMED_CONFIGS
from mfcc_tpu.io import read_shard, write_wav
from mfcc_tpu.parallel import CmvnAccumulator

WORKER = pathlib.Path(__file__).parent / "multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_extraction(tmp_path):
    g = np.random.default_rng(21)
    wavs = tmp_path / "wavs"
    wavs.mkdir()
    for i, n in enumerate([8000, 20000, 5000, 30000, 12000, 7000, 25000]):
        write_wav(wavs / f"u{i}.wav", 16000, (g.standard_normal(n) * 2000).astype(np.int16))
    out = tmp_path / "out"

    coord = f"127.0.0.1:{_free_port()}"
    repo = pathlib.Path(__file__).parent.parent
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{repo}:{env.get('PYTHONPATH', '')}"
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), coord, "2", str(pid), str(wavs), str(out)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=str(repo), env=env,
        )
        for pid in range(2)
    ]
    outputs = []
    for p in procs:
        try:
            o, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            o, _ = p.communicate()
            pytest.fail(f"worker hung:\n{o[-3000:]}")
        outputs.append(o)
        assert p.returncode == 0, f"worker failed:\n{o[-3000:]}"

    # every utterance extracted exactly once across the two hosts
    feats = {}
    for s in sorted(out.glob("p*-*.npz")):
        shard = read_shard(s)
        assert not (set(shard) & set(feats)), "utterance extracted twice"
        feats.update(shard)
    assert len(feats) == 7

    # merged per-host moments == single-host reduction over all features
    cfg = NAMED_CONFIGS["classic13_deltas_gcmvn"]
    acc = CmvnAccumulator(cfg.feat_dim)
    for m in sorted(out.glob("moments_p*.npz")):
        acc.merge(CmvnAccumulator.load(m))
    allf = np.concatenate(list(feats.values()), axis=0).astype(np.float64)
    np.testing.assert_allclose(acc.s1, allf.sum(axis=0), rtol=1e-4)
    np.testing.assert_allclose(acc.s2, (allf**2).sum(axis=0), rtol=1e-4)
    assert acc.n == allf.shape[0]
