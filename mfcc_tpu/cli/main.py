"""mfcc_tpu CLI.

Commands:
  extract     wav files → feature shards (streaming, resumable, DP-sharded)
  apply-cmvn  second pass: normalize existing shards with global stats
  info        devices / mesh / config dump

The reference's entire driver was `for wav in wavs: mfcc(wav)` (SURVEY.md
§3.1); this is its production form: threaded decode → bucketed padded
batches → pjit over the data mesh → trimmed shard writes with resume
markers → global CMVN moments via the mesh collective.
"""

from __future__ import annotations

import argparse
import glob as globlib
import json
import logging
import pathlib
import sys
import time

import numpy as np

log = logging.getLogger("mfcc_tpu.cli")


def _expand_files(patterns) -> list[str]:
    out = []
    for p in patterns:
        if any(ch in p for ch in "*?["):
            out.extend(sorted(globlib.glob(p, recursive=True)))
        elif pathlib.Path(p).is_dir():
            out.extend(sorted(str(q) for q in pathlib.Path(p).rglob("*.wav")))
        else:
            out.append(p)
    return out


def cmd_extract(args) -> int:
    import jax

    from mfcc_tpu import named_config
    from mfcc_tpu.io import (
        DecodeStats, ShardWriter, shard_files, stream_batches,
        stream_batches_direct, trim_batch,
    )
    from mfcc_tpu.io.wav import _native
    from mfcc_tpu.parallel import CmvnAccumulator, data_mesh, sharded_extract_batch
    from mfcc_tpu.parallel.mesh import distributed_init, pad_batch_to_shards
    from mfcc_tpu.utils import MetricsLogger
    from mfcc_tpu.utils import trace as trace_mod

    distributed_init()
    try:
        cfg = named_config(args.config)
    except KeyError as e:
        log.error("%s", e.args[0])
        return 2
    files = _expand_files(args.files)
    if not files:
        log.error("no input files matched")
        return 2
    files = shard_files(files, jax.process_index(), jax.process_count())
    log.info(
        "process %d/%d: %d files, config=%s (%s)",
        jax.process_index(), jax.process_count(), len(files),
        args.config, cfg.config_hash(),
    )

    # local mesh: per-host batch counts differ, so no cross-host collective
    # may appear in the per-batch step (see parallel.mesh.data_mesh)
    mesh = data_mesh(local=True)
    n_dev = mesh.shape["data"]
    batch_size = pad_batch_to_shards(args.batch_size, mesh)

    writer = ShardWriter(args.output_dir, cfg)
    metrics = MetricsLogger(
        args.metrics,
        context={"process": jax.process_index(), "config": args.config},
    )
    stats = DecodeStats()
    want_moments = cfg.cmvn == "global" or args.cmvn_stats is not None
    acc = CmvnAccumulator(cfg.feat_dim) if want_moments else None

    shard_idx = 0
    host = f"h{jax.process_index()}"
    backend = args.backend
    in_flight = None  # (shard_name, real_ids, batch, feat, mask, moments)

    def complete(entry) -> None:
        """Finish one dispatched batch: pull arrays, trim, write, count.
        Runs while the NEXT batch computes on device (async dispatch)."""
        shard_name, real_ids, batch, feat, mask, moments = entry
        extra = None
        if acc is not None:
            s1, s2, n = (np.asarray(m, dtype=np.float64) for m in moments)
            acc.add(s1, s2, n)
            # moments ride the done marker so a resumed run recovers the
            # contribution of every skipped shard (review finding: they
            # were silently dropped before)
            extra = {
                "moments": {
                    "s1": s1.tolist(), "s2": s2.tolist(), "n": float(n),
                }
            }
        with trace_mod.annotate("shard_write"):
            # pair ids with rows (None ids can appear mid-batch if a decode
            # failed after row assignment in the direct feed path)
            trimmed = trim_batch(feat, mask)
            rows = [
                (i, t) for i, t in zip(batch.ids, trimmed) if i is not None
            ]
            writer.write(
                shard_name, [r[0] for r in rows], [r[1] for r in rows],
                extra_meta=extra,
            )
        metrics.add(
            shards=1,
            utterances=len(real_ids),
            frames=sum(t.shape[0] for t in trimmed),
            audio_seconds=float(batch.lengths.sum())
            / (cfg.input_sample_rate or cfg.sample_rate),
        )
        metrics.set(pad_occupancy=batch.pad_occupancy, devices=n_dev)
        if shard_idx % args.log_every == 0:
            snap = metrics.emit()
            log.info(
                "%d shards, %.0f utt, %.1f audio-s/s",
                snap.get("shards", 0), snap.get("utterances", 0),
                snap.get("audio_s_per_s", 0.0),
            )

    if args.feed == "direct" or (args.feed == "auto" and _native() is not None):
        stream_fn = stream_batches_direct
    else:
        stream_fn = stream_batches
    with trace_mod.trace(args.profile_dir):
        for batch in stream_fn(
            files, cfg, batch_size=batch_size, max_len_s=args.max_len_s,
            num_threads=args.threads, stats=stats,
        ):
            shard_name = f"{host}-{shard_idx:06d}"
            shard_idx += 1
            real_ids = [i for i in batch.ids if i is not None]
            if args.resume and writer.is_done(shard_name, real_ids):
                meta = writer.marker_meta(shard_name) or {}
                mom = meta.get("extra", {}).get("moments")
                if acc is not None and mom is None:
                    # marker predates moment tracking: recompute the shard
                    log.info("shard %s lacks moments; recomputing", shard_name)
                else:
                    if acc is not None:
                        acc.add(
                            np.asarray(mom["s1"]), np.asarray(mom["s2"]),
                            mom["n"],
                        )
                    metrics.add(shards_skipped=1, utterances=len(real_ids))
                    continue
            with trace_mod.annotate("dispatch"):
                feat, mask, moments = sharded_extract_batch(
                    batch.audio, batch.lengths, cfg, mesh,
                    backend=backend, with_moments=want_moments,
                )
            # one batch in flight: write shard N-1 while N computes
            if in_flight is not None:
                complete(in_flight)
            in_flight = (shard_name, real_ids, batch, feat, mask, moments)
        if in_flight is not None:
            complete(in_flight)

    metrics.set(
        decode_errors=stats.errors, wrong_rate=stats.wrong_rate,
        truncated=stats.truncated,
    )
    snap = metrics.emit("done")
    if acc is not None and acc.n > 0:
        stats_path = args.cmvn_stats or str(
            pathlib.Path(args.output_dir) / f"cmvn_moments_{host}.npz"
        )
        acc.save(stats_path)
        log.info("CMVN moments (n=%.0f frames) -> %s", acc.n, stats_path)
        if cfg.cmvn == "global":
            log.info(
                "run `mfcc_tpu apply-cmvn %s --stats %s --config %s` to "
                "normalize (merging per-host moment files first if multi-host)",
                args.output_dir, stats_path, args.config,
            )
    log.info(
        "done: %d utterances, %d decode errors, %d wrong-rate, %d truncated",
        stats.decoded, stats.errors, stats.wrong_rate, stats.truncated,
    )
    return 0


def cmd_apply_cmvn(args) -> int:
    """Pass 2 of global CMVN: normalize every shard in place with the
    finalized corpus stats (merged over all moment files given).

    Idempotency: a done/cmvn_applied.json marker records that (and with
    which stats) the directory was normalized; a second invocation refuses
    instead of silently double-normalizing (use --force to override, e.g.
    after regenerating the shards)."""
    import hashlib

    from mfcc_tpu import named_config
    from mfcc_tpu.parallel import CmvnAccumulator

    cfg = named_config(args.config)
    acc = CmvnAccumulator(cfg.feat_dim)
    for mpath in args.stats:
        acc.merge(CmvnAccumulator.load(mpath))
    stats = acc.finalize(cfg)
    mean = stats.mean.astype(np.float32)
    std = stats.std.astype(np.float32)

    shard_dir = pathlib.Path(args.shard_dir)
    marker = shard_dir / "done" / "cmvn_applied.json"
    stats_fp = hashlib.sha256(mean.tobytes() + std.tobytes()).hexdigest()[:16]
    if marker.exists() and not args.force:
        prev = json.loads(marker.read_text())
        log.error(
            "shards already normalized (stats %s at %s); re-applying would "
            "double-normalize — use --force only after regenerating shards",
            prev.get("stats_fingerprint"), prev.get("applied_at"),
        )
        return 1

    n = 0
    for spath in sorted(shard_dir.glob("*.npz")):
        if spath.name.endswith(".tmp.npz"):  # leftover from a crash
            spath.unlink()
            continue
        with np.load(spath, allow_pickle=False) as z:
            if "features" not in z.files:  # e.g. a cmvn moments checkpoint
                continue
            feats, offsets, ids = z["features"], z["offsets"], z["ids"]
        feats = (feats - mean) / std if cfg.cmvn_var_norm else feats - mean
        tmp = spath.with_name(spath.stem + ".tmp.npz")
        np.savez_compressed(tmp, features=feats.astype(np.float32),
                            offsets=offsets, ids=ids)
        tmp.rename(spath)
        n += 1
    marker.parent.mkdir(parents=True, exist_ok=True)
    marker.write_text(json.dumps({
        "stats_fingerprint": stats_fp,
        "n_frames": stats.n,
        "shards": n,
        "applied_at": time.time(),
    }))
    log.info("normalized %d shards with corpus stats (n=%.0f frames)", n, stats.n)
    return 0


def cmd_info(args) -> int:
    import jax

    from mfcc_tpu import NAMED_CONFIGS

    print(f"jax {jax.__version__}  backend={jax.default_backend()}")
    print(f"devices: {jax.devices()}")
    print(f"process {jax.process_index()}/{jax.process_count()}")
    print("named configs:")
    for name, cfg in NAMED_CONFIGS.items():
        print(
            f"  {name:24s} sr={cfg.sample_rate} in_sr={cfg.input_sample_rate or '-'} "
            f"mels={cfg.n_mels} feat={cfg.features}:{cfg.feat_dim} cmvn={cfg.cmvn} "
            f"hash={cfg.config_hash()}"
        )
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="mfcc_tpu", description=__doc__)
    p.add_argument("-v", "--verbose", action="store_true")
    sub = p.add_subparsers(dest="command", required=True)

    e = sub.add_parser("extract", help="extract features from wav files")
    e.add_argument("files", nargs="+", help="wav paths, globs, or directories")
    e.add_argument("--config", default="classic13")
    e.add_argument("--output-dir", "-o", required=True)
    e.add_argument("--backend", choices=["jnp", "pallas"], default="pallas")
    e.add_argument("--batch-size", type=int, default=64)
    e.add_argument("--max-len-s", type=float, default=10.0)
    e.add_argument("--threads", type=int, default=4)
    e.add_argument("--feed", choices=["auto", "direct", "arrays"], default="auto",
                   help="direct: decode straight into batch rows (C++ path)")
    e.add_argument("--resume", action=argparse.BooleanOptionalAction, default=True)
    e.add_argument("--cmvn-stats", default=None,
                   help="path for global CMVN moment checkpoint")
    e.add_argument("--metrics", default=None, help="JSON-lines metrics file")
    e.add_argument("--log-every", type=int, default=10)
    e.add_argument("--profile-dir", default=None,
                   help="write a jax.profiler (xprof) trace here")
    e.set_defaults(fn=cmd_extract)

    a = sub.add_parser("apply-cmvn", help="normalize shards with global stats")
    a.add_argument("shard_dir")
    a.add_argument("--stats", nargs="+", required=True,
                   help="one or more cmvn moment .npz files (merged)")
    a.add_argument("--config", default="classic13")
    a.add_argument("--force", action="store_true",
                   help="re-apply even if an applied-marker exists")
    a.set_defaults(fn=cmd_apply_cmvn)

    i = sub.add_parser("info", help="show devices and configs")
    i.set_defaults(fn=cmd_info)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
        stream=sys.stderr,
    )
    return args.fn(args)
