"""ShardDataset: training-side iteration over extracted shards — counts
from markers, deterministic shuffling, worker splitting, min-frames
filtering, torch IterableDataset bridge (torch CPU is in the image)."""

import numpy as np
import pytest

from mfcc_tpu.config import named_config
from mfcc_tpu.io import ShardDataset
from mfcc_tpu.io.writer import ShardWriter

RNG = np.random.default_rng(41)


@pytest.fixture()
def shards(tmp_path):
    cfg = named_config("classic13")
    w = ShardWriter(tmp_path, cfg)
    truth = {}
    for s in range(4):
        ids, feats = [], []
        for u in range(5):
            uid = f"/c/s{s}/u{u}.wav"
            f = RNG.standard_normal((3 + 7 * u, 13)).astype(np.float32)
            ids.append(uid)
            feats.append(f)
            truth[uid] = f
        w.write(f"h0-{s:06d}", ids, feats)
    return tmp_path, truth


def test_iteration_complete_and_exact(shards):
    root, truth = shards
    ds = ShardDataset(root)
    got = dict(ds)
    assert set(got) == set(truth)
    for k, v in truth.items():
        np.testing.assert_array_equal(got[k], v)
    assert len(ds) == 20
    assert ds.num_frames == sum(f.shape[0] for f in truth.values())
    assert ds.num_shards == 4


def test_counts_without_markers(shards, tmp_path):
    """Marker-less shards (foreign corpora) fall back to npz headers."""
    root, truth = shards
    import shutil

    shutil.rmtree(root / "done")
    ds = ShardDataset(root)
    assert len(ds) == 20
    assert ds.num_frames == sum(f.shape[0] for f in truth.values())


def test_shuffle_deterministic_and_epoch_varying(shards):
    root, truth = shards
    a = list(ShardDataset(root, shuffle=True, seed=3))
    b_ds = ShardDataset(root, shuffle=True, seed=3)
    b1 = list(b_ds)
    b2 = list(b_ds)  # epoch 2
    assert [k for k, _ in a] == [k for k, _ in b1]  # same seed+epoch
    assert [k for k, _ in b1] != [k for k, _ in b2]  # reshuffles per epoch
    assert {k for k, _ in b2} == set(truth)  # still complete
    assert [k for k, _ in a] != sorted(truth)  # actually shuffled


def test_split_partitions(shards):
    root, truth = shards
    ds = ShardDataset(root)
    parts = [ds.split(i, 3) for i in range(3)]
    keys = [k for p in parts for k, _ in p]
    assert sorted(keys) == sorted(truth)  # disjoint and complete
    assert sum(len(p) for p in parts) == len(ds)
    assert sum(p.num_frames for p in parts) == ds.num_frames
    with pytest.raises(ValueError):
        ds.split(3, 3)


def test_min_frames_filter(shards):
    root, truth = shards
    ds = ShardDataset(root, min_frames=10)
    got = dict(ds)
    assert set(got) == {k for k, f in truth.items() if f.shape[0] >= 10}


def test_empty_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        ShardDataset(tmp_path)


def test_torch_bridge(shards):
    root, truth = shards
    import torch.utils.data as tud

    ds = ShardDataset(root).as_torch_iterable()
    assert len(ds) == 20
    loader = tud.DataLoader(ds, batch_size=None, num_workers=0)
    got = {k: np.asarray(v) for k, v in loader}
    assert set(got) == set(truth)
    for k in truth:
        np.testing.assert_array_equal(got[k], truth[k])


def test_foreign_npz_in_dir_is_skipped(shards):
    """The README flow writes cmvn stats npz into the output dir; the
    dataset must skip any npz without a features member."""
    root, truth = shards
    np.savez(root / "cmvn.npz", s1=np.zeros(13), s2=np.zeros(13),
             n=np.float64(1))
    (root / "garbage.npz").write_bytes(b"not a zip at all")
    ds = ShardDataset(root)
    assert ds.num_shards == 4 and len(ds) == 20
    assert set(dict(ds)) == set(truth)


def test_torch_workers_reshuffle_each_epoch(shards):
    """With worker processes, each epoch must still see a fresh order
    (workers iterate pickled copies; torch's per-epoch worker seed is
    folded into the rng)."""
    root, truth = shards
    import torch
    import torch.utils.data as tud

    ds = ShardDataset(root, shuffle=True, seed=5).as_torch_iterable()
    g = torch.Generator()
    g.manual_seed(11)
    loader = tud.DataLoader(ds, batch_size=None, num_workers=2, generator=g)
    e1 = [k for k, _ in loader]
    e2 = [k for k, _ in loader]
    assert set(e1) == set(e2) == set(truth)  # complete both epochs
    assert e1 != e2  # reshuffled across epochs
