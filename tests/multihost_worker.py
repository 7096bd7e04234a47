"""Worker process for the real multi-process distributed test
(tests/test_multihost.py). Each process: init jax.distributed, take its
file shard, extract with global CMVN moments, write shards + moments.

Run as:  python tests/multihost_worker.py <coord> <nprocs> <pid> <wav_dir> <out_dir>
"""

import sys


def main() -> int:
    coord, nprocs, pid, wav_dir, out_dir = sys.argv[1:6]
    nprocs, pid = int(nprocs), int(pid)

    import os

    # force-set: pytest's conftest exports an 8-device flag that we'd
    # otherwise inherit, giving 16 global devices instead of 8
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    # exercise the production init path (it must not probe jax before
    # calling jax.distributed.initialize — review finding)
    from mfcc_tpu.parallel.mesh import distributed_init

    distributed_init(
        coordinator_address=coord, num_processes=nprocs, process_id=pid
    )
    assert jax.process_count() == nprocs
    assert jax.device_count() == 4 * nprocs

    import pathlib

    import numpy as np

    from mfcc_tpu.config import named_config
    from mfcc_tpu.io import DecodeStats, ShardWriter, shard_files, stream_batches, trim_batch
    from mfcc_tpu.parallel import CmvnAccumulator, data_mesh, sharded_extract_batch
    from mfcc_tpu.parallel.mesh import pad_batch_to_shards

    cfg = named_config("classic13_deltas_gcmvn")
    files = sorted(str(p) for p in pathlib.Path(wav_dir).glob("*.wav"))
    mine = shard_files(files, pid, nprocs)
    # LOCAL mesh: per-process batch counts differ, so no cross-process
    # collective may run per batch (parallel.mesh.data_mesh docstring).
    mesh = data_mesh(local=True)
    bs = pad_batch_to_shards(4, mesh)

    writer = ShardWriter(out_dir, cfg)
    acc = CmvnAccumulator(cfg.feat_dim)
    stats = DecodeStats()
    idx = 0
    for batch in stream_batches(mine, cfg, batch_size=bs, max_len_s=4.0, stats=stats):
        feat, mask, moments = sharded_extract_batch(
            batch.audio, batch.lengths, cfg, mesh, with_moments=True
        )
        acc.add(*(np.asarray(m) for m in moments))
        real_ids = [i for i in batch.ids if i is not None]
        trimmed = trim_batch(np.asarray(feat), np.asarray(mask))[: len(real_ids)]
        writer.write(f"p{pid}-{idx:04d}", real_ids, trimmed)
        idx += 1
    acc.save(pathlib.Path(out_dir) / f"moments_p{pid}.npz")
    print(f"process {pid}: {stats.decoded} files, n={acc.n}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
