"""mfcc_tpu CLI.

Commands:
  extract     wav files → feature shards (streaming, resumable, DP-sharded)
  apply-cmvn  second pass: normalize existing shards with global stats
  convert     npz shards → HTK / Kaldi files (resumable exporter)
  serve       online JSON-lines serving over stdin/stdout
  plot        4-panel inspection PNGs (waveform/spectrogram/filterbank/features)
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


def _expand_files(patterns, aliases: dict | None = None) -> list[str]:
    """Inputs may be wav paths, globs, directories, or manifests:
    `@list.txt` (one path per line; a second whitespace-separated column is
    tolerated Kaldi-style — `<utt-id> <path>` wav.scp lines use the LAST
    field as the path; '#' comments and blank lines skipped).

    aliases, when given, collects path -> manifest utt-id for two-column
    manifest lines, so Kaldi wav.scp + utt2spk pairs compose (speaker
    lookup tries the utt-id first)."""
    out = []
    for p in patterns:
        if p.startswith("@"):
            for line in pathlib.Path(p[1:]).read_text().splitlines():
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                parts = line.split()
                out.append(parts[-1])
                if aliases is not None and len(parts) > 1:
                    aliases[parts[-1]] = parts[0]
        elif any(ch in p for ch in "*?["):
            out.extend(sorted(globlib.glob(p, recursive=True)))
        elif pathlib.Path(p).is_dir():
            out.extend(sorted(str(q) for q in pathlib.Path(p).rglob("*.wav")))
        else:
            out.append(p)
    # duplicate inputs (repeated manifest lines, overlapping globs) would
    # extract twice: same id twice in one npz shard collapses silently in
    # read_shard, and one ark shard would abort on the duplicate key
    deduped = list(dict.fromkeys(out))
    if len(deduped) != len(out):
        log.warning("%d duplicate input path(s) dropped", len(out) - len(deduped))
    return deduped


def _resolve_config(args):
    """named config + any --set key=value overrides (validated)."""
    from mfcc_tpu import named_config
    from mfcc_tpu.config import config_with_overrides

    cfg = named_config(args.config)
    if getattr(args, "set", None):
        cfg = config_with_overrides(cfg, args.set)
    return cfg


def cmd_extract(args) -> int:
    import jax

    from mfcc_tpu import named_config
    from mfcc_tpu.io import (
        DecodeStats, ShardWriter, shard_files, stream_batches,
        stream_batches_direct, stream_batches_mp, trim_batch,
    )
    from mfcc_tpu.io.wav import _native
    from mfcc_tpu.parallel import CmvnAccumulator, data_mesh, sharded_extract_batch
    from mfcc_tpu.parallel.mesh import distributed_init, pad_batch_to_shards
    from mfcc_tpu.utils import MetricsLogger
    from mfcc_tpu.utils import trace as trace_mod

    distributed_init()
    try:
        cfg = _resolve_config(args)
    except (KeyError, ValueError) as e:
        log.error("%s", e.args[0])
        return 2
    aliases: dict = {}  # path -> manifest utt-id (wav.scp composition)
    files = _expand_files(args.files, aliases)
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

    if args.format != "npz" and cfg.cmvn in ("global", "speaker"):
        log.error("--format %s does not support the two-pass %s-CMVN "
                  "rewrite (apply-cmvn operates on npz shards); extract to "
                  "npz, apply-cmvn, then `mfcc_tpu convert --to %s`, or use "
                  "cmvn=utterance/off", args.format, cfg.cmvn, args.format)
        return 2
    writer = ShardWriter(args.output_dir, cfg, compress=args.compress,
                         fmt=args.format)
    metrics = MetricsLogger(
        args.metrics,
        context={"process": jax.process_index(), "config": args.config},
    )
    stats = DecodeStats()
    speaker_mode = cfg.cmvn == "speaker"
    want_moments = (
        speaker_mode or cfg.cmvn == "global" or args.cmvn_stats is not None
    )
    if speaker_mode:
        from mfcc_tpu.parallel import (
            SpeakerCmvnAccumulator, read_utt2spk, speaker_of,
        )

        try:
            utt2spk = read_utt2spk(args.utt2spk) if args.utt2spk else None
        except (OSError, ValueError) as e:
            log.error("--utt2spk: %s", e)
            return 2

        def spk_of(uid: str) -> str:
            # manifest utt-ids compose with utt2spk (wav.scp pairs)
            key = aliases.get(uid, uid) if utt2spk else uid
            return speaker_of(key, utt2spk, args.spk_from)

        # validate the whole mapping BEFORE any device work: one typo'd
        # utt2spk entry must not kill the run mid-extraction
        try:
            spk_by_utt = {f: spk_of(f) for f in files}
        except KeyError as e:
            log.error("%s (fix --utt2spk or use --spk-from dir)", e.args[0])
            return 2
        acc = SpeakerCmvnAccumulator(cfg.feat_dim)
    else:
        spk_by_utt = {}
        acc = CmvnAccumulator(cfg.feat_dim) if want_moments else None

    shard_idx = 0
    host = f"h{jax.process_index()}"
    backend = args.backend
    if backend == "pallas":
        from mfcc_tpu.ops import chain

        reason = chain.pallas_unsupported_reason(cfg)
        if reason:
            log.info("falling back to the jnp backend: %s", reason)
            backend = "jnp"
    # pipeline of dispatched batches: shard N-D is written while N computes;
    # depth > 1 hides device->host latency (significant on relayed devices)
    import collections
    import concurrent.futures

    in_flight = collections.deque()  # (shard_name, real_ids, batch, feat, mask, moments)
    # shard writes (npy serialize + disk, GIL-releasing) run on a small
    # pool so the main loop keeps dispatching; bounded so queued feature
    # arrays can't pile up unboundedly
    wpool = concurrent.futures.ThreadPoolExecutor(max_workers=args.write_threads)
    wfuts = collections.deque()

    def prefetch(arrs) -> None:
        """Start async device->host copies so complete()'s np.asarray finds
        the bytes already on host instead of paying the fetch round-trip."""
        for a in arrs:
            if a is not None and hasattr(a, "copy_to_host_async"):
                try:
                    a.copy_to_host_async()
                except Exception:  # pragma: no cover - backend-dependent
                    pass

    def fold_speaker(ids, s1, s2, n) -> dict:
        """Fold per-utterance triples into the per-speaker pools; returns
        the marker extra (per-shard pool contributions PLUS the resolved
        utt->spk mapping, so resume can detect a changed mapping)."""
        pools: dict[str, list] = {}
        rec = {}
        for i, uid in enumerate(ids):
            if uid is None:  # failed decode: n=0 row
                continue
            spk = spk_by_utt[uid]
            rec[uid] = spk
            acc.add(spk, s1[i], s2[i], n[i])
            p = pools.setdefault(spk, [np.zeros(cfg.feat_dim),
                                       np.zeros(cfg.feat_dim), 0.0])
            p[0] += s1[i]
            p[1] += s2[i]
            p[2] += float(n[i])
        return {"speaker_moments": {
            s: {"s1": p[0].tolist(), "s2": p[1].tolist(), "n": p[2]}
            for s, p in pools.items()
        }, "spk_by_utt": rec}

    def recover_moments(meta: dict, fold: bool = True) -> bool:
        """Fold a skipped shard's marker moments into acc; False means the
        marker is unusable (pre-moment marker, or — speaker mode — the
        utt->spk mapping changed since it was written) and the shard must
        be recomputed so the pools stay correct. fold=False only answers
        the usability question (the resume planning pass)."""
        if acc is None:
            return True
        extra = meta.get("extra", {})
        if speaker_mode:
            mom = extra.get("speaker_moments")
            rec = extra.get("spk_by_utt")
            if mom is None or rec is None:
                return False
            if any(spk_by_utt.get(uid) != spk for uid, spk in rec.items()):
                return False  # stale mapping: recompute under the new one
            if fold:
                for spk, p in mom.items():
                    acc.add(spk, np.asarray(p["s1"]), np.asarray(p["s2"]),
                            p["n"])
            return True
        mom = extra.get("moments")
        if mom is None:
            return False
        if fold:
            acc.add(np.asarray(mom["s1"]), np.asarray(mom["s2"]), mom["n"])
        return True

    def complete(entry) -> None:
        """Finish one dispatched batch: pull arrays, trim, write, count.
        Runs while the NEXT batch computes on device (async dispatch)."""
        shard_name, real_ids, batch, feat, mask, moments = entry
        extra = None
        if acc is not None and speaker_mode:
            s1, s2, n = (np.asarray(m, dtype=np.float64) for m in moments)
            extra = fold_speaker(batch.ids, s1, s2, n)
        elif acc is not None:
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
            while len(wfuts) >= 2 * args.write_threads:
                wfuts.popleft().result()  # backpressure + error propagation
            wfuts.append(wpool.submit(
                writer.write,
                shard_name, [r[0] for r in rows], [r[1] for r in rows],
                extra_meta=extra,
            ))
        metrics.add(
            shards=1,
            utterances=len(real_ids),
            frames=sum(t.shape[0] for t in trimmed),
            audio_seconds=float(batch.lengths.sum())
            / (cfg.input_sample_rate or cfg.sample_rate),
        )
        metrics.set(pad_occupancy=batch.pad_occupancy, devices=n_dev)
        batch.release()  # recycle the audio slab (compute already fetched)
        if shard_idx % args.log_every == 0:
            snap = metrics.emit()
            log.info(
                "%d shards, %.0f utt, %.1f audio-s/s",
                snap.get("shards", 0), snap.get("utterances", 0),
                snap.get("audio_s_per_s", 0.0),
            )

    stream_kw = dict(
        batch_size=batch_size, max_len_s=args.max_len_s,
        num_threads=args.threads, stats=stats,
        long_mode="defer" if args.long == "split" else "truncate",
        # device-optimal host feed layouts (blocked resample rows, kernel
        # chunk slabs) only make sense for the fused backend; the jnp twin
        # takes flat audio (blocked rows it accepts too, but keep it simple)
        layouts="device" if backend == "pallas" else "resample",
    )
    feed = args.feed
    if feed == "auto":
        # mp is the production fast path (~3x the threaded direct feed:
        # per-file Python runs under the workers' own GILs); both paths
        # produce byte-identical batches (tests/test_io.py)
        feed = "mp" if _native() is not None else "arrays"
    if feed in ("direct", "mp"):
        stream_fn = stream_batches_direct if feed == "direct" else stream_batches_mp
        stream_kw["dtype"] = args.feed_dtype
    else:
        stream_fn = stream_batches
        if args.feed_dtype != "f32":
            log.warning("--feed-dtype %s requires the direct/mp feed; using f32",
                        args.feed_dtype)
    if args.resume and feed in ("direct", "mp"):
        # header-only planning pass: batch composition depends only on
        # phase-A headers, so a resume decision per shard costs a header
        # scan — files of already-done shards are then NEVER decoded in
        # the real pass (resuming a 99%-done corpus used to re-pay the
        # full decode cost just to compute resume fingerprints)
        from mfcc_tpu.io import DecodeStats as _DS

        plan_kw = {**stream_kw, "stats": _DS(),
                   "skip_ids": frozenset(files)}
        done_files: set = set()
        pidx = 0
        for pb in stream_fn(files, cfg, **plan_kw):
            pname = f"{host}-{pidx:06d}"
            pidx += 1
            preal = [i for i in pb.ids if i is not None]
            if writer.is_done(pname, preal) and recover_moments(
                writer.marker_meta(pname) or {}, fold=False
            ):
                done_files.update(preal)
            pb.release()
        if done_files:
            log.info("resume plan: %d of %d files already extracted "
                     "(decode skipped)", len(done_files), len(files))
        stream_kw["skip_ids"] = frozenset(done_files)

    with trace_mod.trace(args.profile_dir):
        for batch in stream_fn(files, cfg, **stream_kw):
            shard_name = f"{host}-{shard_idx:06d}"
            shard_idx += 1
            real_ids = [i for i in batch.ids if i is not None]
            planned_skip = bool(stream_kw.get("skip_ids")) and any(
                i in stream_kw["skip_ids"] for i in real_ids
            )
            if args.resume and writer.is_done(shard_name, real_ids):
                if recover_moments(writer.marker_meta(shard_name) or {}):
                    metrics.add(shards_skipped=1, utterances=len(real_ids))
                    # recycle the slab NOW: without this, every skipped
                    # batch leaves its mp-feed /dev/shm file live until
                    # stream end — a resumed large corpus exhausts tmpfs
                    batch.release()
                    continue
                log.info("shard %s lacks usable moments (pre-moment marker "
                         "or changed speaker mapping); recomputing",
                         shard_name)
            if planned_skip:
                # the planning pass skipped this batch's decode, but the
                # resume check now disagrees: the corpus changed between
                # passes — computing from undecoded rows would write
                # garbage, so fail loudly
                raise RuntimeError(
                    f"corpus changed during resume planning (shard "
                    f"{shard_name} no longer matches its marker); rerun"
                )
            with trace_mod.annotate("dispatch"):
                t_disp = time.perf_counter()
                feat, mask, moments = sharded_extract_batch(
                    batch.audio, batch.lengths, cfg, mesh,
                    backend=backend,
                    with_moments="per_utterance" if speaker_mode
                    else want_moments,
                    input_layout=batch.layout_kind,
                )
                # host-side dispatch wall (device_put H2D + async launch);
                # decode_queue_depth: jobs in flight when this batch flushed
                metrics.set(
                    dispatch_ms=round((time.perf_counter() - t_disp) * 1e3, 2),
                    decode_queue_depth=stats.queue_depth,
                )
            prefetch([feat, mask] + (list(moments) if moments else []))
            in_flight.append(
                (shard_name, real_ids, batch, feat, mask, moments)
            )
            while len(in_flight) >= max(1, args.pipeline_depth):
                complete(in_flight.popleft())
        while in_flight:
            complete(in_flight.popleft())
        while wfuts:
            wfuts.popleft().result()
        wpool.shutdown(wait=True)

        # over-long utterances: split/stitch extraction, one shard per file
        # (frame-exact vs the per-utterance loop — pipeline.longform)
        from mfcc_tpu.io import read_wav
        from mfcc_tpu.pipeline import extract_long, long_moments

        expect_sr = cfg.input_sample_rate or cfg.sample_rate
        for li, path in enumerate(stats.long_paths):
            shard_name = f"{host}-long-{li:06d}"
            if args.resume and writer.is_done(shard_name, [path]):
                if recover_moments(writer.marker_meta(shard_name) or {}):
                    metrics.add(shards_skipped=1, utterances=1)
                    continue
                log.info("shard %s lacks usable moments (pre-moment marker "
                         "or changed speaker mapping); recomputing",
                         shard_name)
            try:
                sr, samples = read_wav(path)
            except (OSError, ValueError) as e:
                log.warning("skipping %s: %s", path, e)
                metrics.add(decode_errors=1)
                stats.errors += 1
                continue
            if sr != expect_sr:
                stats.wrong_rate += 1
                continue
            with trace_mod.annotate("long_extract"):
                feat = extract_long(
                    samples, cfg, backend=backend, seg_len_s=args.max_len_s
                )
            extra = None
            if acc is not None and speaker_mode:
                s1, s2, n = long_moments(feat)
                extra = fold_speaker(
                    [path], s1[None], s2[None], np.asarray([n])
                )
            elif acc is not None:
                s1, s2, n = long_moments(feat)
                acc.add(s1, s2, n)
                extra = {"moments": {
                    "s1": s1.tolist(), "s2": s2.tolist(), "n": float(n),
                }}
            writer.write(shard_name, [path], [feat], extra_meta=extra)
            stats.decoded += 1
            stats.audio_seconds += samples.shape[0] / sr
            metrics.add(
                shards=1, utterances=1, frames=feat.shape[0],
                audio_seconds=samples.shape[0] / sr,
            )

    metrics.set(
        decode_errors=stats.errors, wrong_rate=stats.wrong_rate,
        truncated=stats.truncated, long_split=stats.long_deferred,
    )
    snap = metrics.emit("done")
    if acc is not None and acc.n > 0:
        stats_path = args.cmvn_stats or str(
            pathlib.Path(args.output_dir) / f"cmvn_moments_{host}.npz"
        )
        acc.save(stats_path)
        log.info("CMVN moments (n=%.0f frames%s) -> %s", acc.n,
                 f", {len(acc.pools)} speakers" if speaker_mode else "",
                 stats_path)
        if cfg.cmvn in ("global", "speaker"):
            log.info(
                "run `mfcc_tpu apply-cmvn %s --stats %s --config %s%s` to "
                "normalize (merging per-host moment files first if multi-host)",
                args.output_dir, stats_path, args.config,
                " --utt2spk ..." if speaker_mode and args.utt2spk else "",
            )
    log.info(
        "done: %d utterances (%d long-split), %d decode errors, "
        "%d wrong-rate, %d truncated",
        stats.decoded, stats.long_deferred, stats.errors, stats.wrong_rate,
        stats.truncated,
    )
    return 0


def _normalize_shard(spath_str: str, resolve, var_norm: bool,
                     stats_fp: str, force: bool = False,
                     compress: str = "none") -> str:
    """Normalize one shard in place, idempotently. Returns the outcome:
    "normalized" | "skipped" (already carries this stats fingerprint) |
    "mismatch" (normalized with DIFFERENT stats — re-applying would stack
    two normalizations) | "not_features" (e.g. a moments checkpoint).

    resolve(utt_id) -> (mean, std): constant for global CMVN, the
    utterance's speaker pool for speaker CMVN. The applied fingerprint is
    stored INSIDE the shard npz (key cmvn_fp) so a crash mid-corpus
    leaves per-shard truth, not one directory-level marker written only
    at the end: the rerun skips exactly the shards already done."""
    spath = pathlib.Path(spath_str)
    with np.load(spath, allow_pickle=False) as z:
        if "features" not in z.files:
            return "not_features"
        if "cmvn_fp" in z.files and not force:
            return "skipped" if str(z["cmvn_fp"]) == stats_fp else "mismatch"
        feats, offsets, ids = z["features"], z["offsets"], z["ids"]
    for i in range(len(ids)):
        mean, std = resolve(str(ids[i]))
        seg = feats[offsets[i] : offsets[i + 1]]
        seg -= mean
        if var_norm:
            seg /= std
    tmp = spath.with_name(spath.stem + ".tmp.npz")
    save = np.savez_compressed if compress == "zlib" else np.savez
    save(tmp, features=feats.astype(np.float32),
         offsets=offsets, ids=ids,
         cmvn_fp=np.array(stats_fp))
    tmp.rename(spath)  # atomic: a kill leaves either old or new, never half
    return "normalized"


def cmd_apply_cmvn(args) -> int:
    """Pass 2 of global CMVN: normalize every shard in place with the
    finalized corpus stats (merged over all moment files given).

    Idempotency is per-shard: each normalized npz records the stats
    fingerprint it was normalized with (see _normalize_shard), so a rerun
    after a mid-corpus crash finishes exactly the remaining shards instead
    of double-normalizing the done ones. Shards normalized with different
    stats abort the run (use --force only after regenerating shards).
    Shards are processed by a thread pool: the per-shard work is zlib
    inflate → numpy arithmetic → zlib deflate, all GIL-releasing, so
    threads genuinely parallelize it — without the __main__ re-import
    hazards spawned process pools impose on library callers."""
    import concurrent.futures
    import hashlib
    import os

    from mfcc_tpu.parallel import (
        CmvnAccumulator, SpeakerCmvnAccumulator, is_speaker_stats,
        read_utt2spk, speaker_of,
    )

    try:
        cfg = _resolve_config(args)
    except (KeyError, ValueError) as e:
        log.error("%s", e.args[0])
        return 2
    kinds = {p: is_speaker_stats(p) for p in args.stats}
    if len(set(kinds.values())) > 1:
        log.error("mixed stats files: %s are per-speaker, %s are global — "
                  "merge only one kind",
                  [p for p, k in kinds.items() if k],
                  [p for p, k in kinds.items() if not k])
        return 2
    speaker = kinds[args.stats[0]]
    h = hashlib.sha256()
    if speaker:
        sacc = SpeakerCmvnAccumulator(cfg.feat_dim)
        for mpath in args.stats:
            sacc.merge(SpeakerCmvnAccumulator.load(mpath))
        by_spk = {
            s: (st.mean.astype(np.float32), st.std.astype(np.float32))
            for s, st in sacc.finalize(cfg).items()
        }
        try:
            utt2spk = read_utt2spk(args.utt2spk) if args.utt2spk else None
        except (OSError, ValueError) as e:
            log.error("--utt2spk: %s", e)
            return 2

        def resolve(uid: str):
            spk = speaker_of(uid, utt2spk, args.spk_from)
            try:
                return by_spk[spk]
            except KeyError:
                raise KeyError(
                    f"speaker {spk!r} (utterance {uid!r}) has no pooled "
                    "stats — wrong --utt2spk/--spk-from, or the stats came "
                    "from a different corpus?"
                ) from None

        # the normalized bytes depend on the pools AND the mapping; hash
        # the PARSED mapping so reordering/whitespace/comments in a
        # regenerated utt2spk don't spuriously invalidate done shards
        for s in sorted(by_spk):
            h.update(s.encode())
            h.update(by_spk[s][0].tobytes())
            h.update(by_spk[s][1].tobytes())
        if utt2spk:
            for k in sorted(utt2spk):
                h.update(f"{k}\0{utt2spk[k]}\0".encode())
        else:
            h.update(f"spk-from:{args.spk_from}".encode())
        n_frames = sacc.n
    else:
        acc = CmvnAccumulator(cfg.feat_dim)
        for mpath in args.stats:
            acc.merge(CmvnAccumulator.load(mpath))
        stats = acc.finalize(cfg)
        mean = stats.mean.astype(np.float32)
        std = stats.std.astype(np.float32)
        resolve = lambda uid: (mean, std)  # noqa: E731
        h.update(mean.tobytes())
        h.update(std.tobytes())
        n_frames = stats.n
    stats_fp = h.hexdigest()[:16]

    shard_dir = pathlib.Path(args.shard_dir)
    paths = []
    for spath in sorted(shard_dir.glob("*.npz")):
        if spath.name.endswith(".tmp.npz"):  # leftover from a crash
            spath.unlink()
            continue
        paths.append(str(spath))

    counts = {"normalized": 0, "skipped": 0, "mismatch": 0, "not_features": 0}
    mismatched = []
    workers = args.jobs or min(len(paths) or 1, os.cpu_count() or 1)
    with concurrent.futures.ThreadPoolExecutor(max_workers=workers) as pool:
        futs = {
            pool.submit(_normalize_shard, p, resolve, cfg.cmvn_var_norm,
                        stats_fp, args.force, args.compress): p
            for p in paths
        }
        for fut in concurrent.futures.as_completed(futs):
            try:
                outcome = fut.result()
            except KeyError as e:
                log.error("%s", e.args[0])
                return 1
            counts[outcome] += 1
            if outcome == "mismatch":
                mismatched.append(futs[fut])
    if mismatched:
        log.error(
            "%d shard(s) already normalized with DIFFERENT stats (e.g. %s); "
            "refusing to stack normalizations — regenerate those shards",
            len(mismatched), mismatched[0],
        )
        return 1
    marker = shard_dir / "done" / "cmvn_applied.json"
    marker.parent.mkdir(parents=True, exist_ok=True)
    marker.write_text(json.dumps({
        "stats_fingerprint": stats_fp,
        "n_frames": n_frames,
        "shards": counts["normalized"] + counts["skipped"],
        "applied_at": time.time(),
    }))
    log.info(
        "normalized %d shards (%d already done) with corpus stats "
        "(n=%.0f frames, %d workers)",
        counts["normalized"], counts["skipped"], n_frames, workers,
    )
    return 0


def cmd_plot(args) -> int:
    """Visual inspection, the reference's primary correctness tool
    (SURVEY.md §4.1): 4-panel waveform/spectrogram/filterbank/features PNG
    per wav (component C17, mfcc_tpu/viz.py)."""
    from mfcc_tpu.io import read_wav
    from mfcc_tpu.viz import plot_all

    try:
        cfg = _resolve_config(args)
    except (KeyError, ValueError) as e:
        log.error("%s", e.args[0])
        return 2
    files = _expand_files(args.files)
    if not files:
        log.error("no input files matched")
        return 2
    out_dir = pathlib.Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    expect_sr = cfg.input_sample_rate or cfg.sample_rate
    failed = 0
    for path in files:
        try:
            sr, samples = read_wav(path)
        except (OSError, ValueError) as e:
            log.warning("skipping %s: %s", path, e)
            failed += 1
            continue
        if sr != expect_sr:
            log.warning(
                "skipping %s: sample rate %d != config's %d", path, sr, expect_sr
            )
            failed += 1
            continue
        out = out_dir / (pathlib.Path(path).stem + ".png")
        plot_all(samples, cfg, out_path=out)
        log.info("%s -> %s", path, out)
    return 0 if failed == 0 else 1


def cmd_convert(args) -> int:
    """Convert native npz feature shards to HTK or Kaldi files — the
    second step of the documented global-CMVN interop path (extract to
    npz → apply-cmvn → convert), and a general exporter for existing
    corpora. Conversion is resumable via the same done-marker scheme as
    extraction (one marker per source shard in the output dir)."""
    import concurrent.futures

    from mfcc_tpu.io import ShardWriter
    from mfcc_tpu.io.writer import iter_feature_shards

    try:
        cfg = _resolve_config(args)
    except (KeyError, ValueError) as e:
        log.error("%s", e.args[0])
        return 2
    shard_dir = pathlib.Path(args.shard_dir)
    paths = iter_feature_shards(shard_dir)
    if not paths:
        log.error("no feature shards (*.npz) in %s", shard_dir)
        return 2
    writer = ShardWriter(args.output_dir, cfg, fmt=args.to)

    def convert_one(spath: pathlib.Path) -> tuple[str, int]:
        name = spath.stem
        with np.load(spath, allow_pickle=False) as z:
            # npz members load lazily per key: the resume check touches
            # only ids, so a finished rerun never reads feature bytes
            ids = [str(i) for i in z["ids"]]
            if writer.is_done(name, ids):
                return "skipped", len(ids)
            feats, offsets = z["features"], z["offsets"]
        if feats.shape[1] != cfg.feat_dim:
            raise ValueError(
                f"{spath.name}: feat dim {feats.shape[1]} != config "
                f"{args.config}'s {cfg.feat_dim} — wrong --config/--set?"
            )
        writer.write(
            name, ids,
            [feats[offsets[i] : offsets[i + 1]] for i in range(len(ids))],
        )
        return "converted", len(ids)

    counts = {"converted": 0, "skipped": 0}
    utts = 0
    with concurrent.futures.ThreadPoolExecutor(max_workers=args.jobs) as pool:
        try:
            for outcome, n in pool.map(convert_one, paths):
                counts[outcome] += 1
                utts += n
        except (ValueError, KeyError, OSError) as e:
            log.error("%s", e)
            return 2
    log.info("%d shards -> %s (%d already done), %d utterances, format=%s",
             counts["converted"], args.output_dir, counts["skipped"], utts,
             args.to)
    return 0


def cmd_serve(args) -> int:
    """Online serving front-end: JSON-lines protocol over stdin/stdout
    driving the MultiStreamExtractor pool (pipeline/serving.py). One
    process serves up to --streams concurrent sessions with O(1) device
    dispatches per poll round regardless of session count.

    Requests (one JSON object per line on stdin):
      {"op":"open"[, "id":<client tag>]}       -> {"event":"opened","sid":N}
      {"op":"push","sid":N,"pcm16":"<b64>"}    little-endian int16 samples
      {"op":"push","sid":N,"samples":[...]}    float samples (int16 range)
      {"op":"end","sid":N}      audio complete; tail frames follow
      {"op":"close","sid":N}    abandon (no tail extraction)
      {"op":"poll"}             force a poll round (also runs after every line)
      {"op":"stats"}            -> {"event":"stats", ...pool counters}

    Responses (one JSON object per line on stdout):
      {"event":"frames","sid":N,"n":k,"dim":D,"data":"<b64 f32 row-major>"}
      (with --emit list: "frames":[[...]] instead of "data";
       with --emit b64-batched: ONE event per poll round instead —
       {"event":"frames_batch","streams":[{"sid","n","dim"},...],
        "data":"<their tiles concatenated, b64>"})
      {"event":"done","sid":N}             stream finished, slot freed
      {"event":"error","msg":...}          recoverable; the loop continues

    EOF on stdin flushes: still-open streams are end()ed, tails drained,
    and a final stats event is emitted. The reference family has no online
    mode at all (SURVEY.md §1.1); per-stream output is bit-identical to a
    single-stream StreamingExtractor run and matches the offline chain to
    fp32 op-order tolerance (tests/test_serving.py, tests/test_cli.py).

    --wire binary replaces the line transport with length-prefixed
    framing (u32 header_len | JSON header | u32 payload_len | payload,
    little-endian) both directions: push audio rides the payload as raw
    <i2 PCM, frames events carry raw <f4 row-major features (header
    {"event":"frames","sid","n","dim"}, or frames_batch with --emit
    b64-batched). Same ops, same semantics; a framing error flushes like
    EOF (a desynced byte stream has no resync point)."""
    import base64

    from mfcc_tpu.parallel import CmvnAccumulator
    from mfcc_tpu.pipeline import MultiStreamExtractor
    from mfcc_tpu.utils import MetricsLogger

    try:
        cfg = _resolve_config(args)
    except (KeyError, ValueError) as e:
        log.error("%s", e.args[0])
        return 2
    moments = None
    if args.cmvn_stats:
        from mfcc_tpu.parallel import SpeakerCmvnAccumulator, is_speaker_stats

        if is_speaker_stats(args.cmvn_stats[0]):
            sacc = SpeakerCmvnAccumulator(cfg.feat_dim)
            for mpath in args.cmvn_stats:
                sacc.merge(SpeakerCmvnAccumulator.load(mpath))
            if not args.speaker or args.speaker not in sacc.pools:
                log.error(
                    "speaker-CMVN stats need --speaker to pick this "
                    "server's pool; available: %s", sorted(sacc.pools),
                )
                return 2
            spool = sacc.pools[args.speaker]
            moments = (spool.s1, spool.s2, spool.n)
        else:
            acc = CmvnAccumulator(cfg.feat_dim)
            for mpath in args.cmvn_stats:
                acc.merge(CmvnAccumulator.load(mpath))
            moments = (acc.s1, acc.s2, acc.n)
    try:
        pool = MultiStreamExtractor(
            cfg, n_streams=args.streams,
            frames_per_block=args.frames_per_block, cmvn_moments=moments,
        )
    except ValueError as e:
        log.error("%s", e)
        return 2

    fin, fout = sys.stdin, sys.stdout
    wire = getattr(args, "wire", "jsonl")
    if wire == "binary" and args.emit == "list":
        # list mode puts the whole frames list in the JSON header, which
        # can exceed any sane framed-header cap after one long tail drain
        # (r5 review) — and defeats the binary wire's purpose anyway
        log.error("--emit list is a jsonl-wire debug mode; use b64/"
                  "b64-batched with --wire binary")
        return 2
    metrics = MetricsLogger(args.metrics, context={"config": args.config})
    t0 = time.perf_counter()
    audio_s = 0.0
    sr_in = cfg.input_sample_rate or cfg.sample_rate

    client_gone = False

    if wire == "binary":
        # Binary framing (r5): every message both directions is
        #   u32 header_len | header JSON | u32 payload_len | payload
        # (little-endian lengths). Push audio travels as raw <i2 PCM in
        # the payload; frames events carry raw <f4 row-major features.
        # Skips the b64+json payload transcodes that bound the jsonl wire
        # at ~1.9k realtime streams/thread (SERVING_r05.json).
        import struct as _struct

        fout_b = getattr(fout, "buffer", fout)

        def emit(obj, payload: bytes = b"") -> None:
            nonlocal client_gone
            if client_gone:
                return
            head = json.dumps(obj).encode()
            try:
                fout_b.write(
                    _struct.pack("<I", len(head)) + head
                    + _struct.pack("<I", len(payload)) + payload
                )
                fout_b.flush()
            except (BrokenPipeError, OSError):
                client_gone = True
    else:

        def emit(obj, payload: bytes = b"") -> None:
            # a consumer that closed its read end must not crash the
            # server mid-stream; flag it so the loop winds down and
            # metrics still land
            nonlocal client_gone
            if client_gone:
                return
            try:
                fout.write(json.dumps(obj) + "\n")
                fout.flush()
            except (BrokenPipeError, OSError):
                client_gone = True

    def drain() -> None:
        nonlocal audio_s
        polled = pool.poll()
        if args.emit == "b64-batched":
            # ONE frames_batch event per poll round: per-stream json.dumps
            # + stdout flush amortize across the round (the wire layer's
            # next ceiling after the burst-drain fix — SERVING_r05.json).
            # Payload: the streams' [n_i, dim] f32 tiles concatenated
            # row-major in listed order.
            parts, metas = [], []
            for sid, feat in polled.items():
                if feat.shape[0]:
                    parts.append(
                        np.ascontiguousarray(feat, dtype="<f4").tobytes()
                    )
                    metas.append({"sid": sid, "n": int(feat.shape[0]),
                                  "dim": int(feat.shape[1])})
            if metas:
                if wire == "binary":
                    emit({"event": "frames_batch", "streams": metas},
                         payload=b"".join(parts))
                else:
                    emit({"event": "frames_batch", "streams": metas,
                          "data": base64.b64encode(b"".join(parts))
                          .decode("ascii")})
            for sid in polled:
                if pool.done(sid):
                    emit({"event": "done", "sid": sid})
            return
        for sid, feat in polled.items():
            if feat.shape[0]:
                if args.emit == "list":
                    emit({"event": "frames", "sid": sid, "n": feat.shape[0],
                          "dim": feat.shape[1],
                          "frames": [[round(float(v), 6) for v in row]
                                     for row in feat]})
                elif wire == "binary":
                    emit(
                        {"event": "frames", "sid": sid,
                         "n": int(feat.shape[0]), "dim": int(feat.shape[1])},
                        payload=np.ascontiguousarray(
                            feat, dtype="<f4"
                        ).tobytes(),
                    )
                else:
                    emit({
                        "event": "frames", "sid": sid,
                        "n": int(feat.shape[0]), "dim": int(feat.shape[1]),
                        "data": base64.b64encode(
                            np.ascontiguousarray(feat, dtype="<f4").tobytes()
                        ).decode("ascii"),
                    })
            if pool.done(sid):
                emit({"event": "done", "sid": sid})

    # SIGTERM (process managers' stop signal) and SIGINT flush like EOF.
    # The handler ONLY sets a flag — raising out of arbitrary frames can
    # interrupt jax backend initialization and poison the flush itself
    # (observed on the relayed TPU, where first-compile windows are long).
    # stdin is read on a daemon thread so the main loop can observe the
    # flag instead of blocking in readline.
    import queue
    import signal
    import threading

    shutdown = threading.Event()
    old_handlers = {}
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            old_handlers[sig] = signal.signal(
                sig, lambda *_: shutdown.set()
            )
        except ValueError:  # non-main thread (library/test use): skip
            pass

    lines_q: queue.Queue = queue.Queue()

    def _reader() -> None:
        for raw in fin:
            lines_q.put(raw)
        lines_q.put(None)  # EOF sentinel

    def _reader_binary() -> None:
        # framed counterpart of _reader: yields ("req", dict, payload),
        # ("bad_req", msg) for a bad header inside an intact frame, or
        # ("bad", msg) for a framing error (unrecoverable: once the byte
        # stream desyncs there is no resync point — flush and stop)
        import struct as _struct

        src = getattr(fin, "buffer", fin)

        def read_exact(n: int) -> bytes:
            # possibly-short read: b"" means EOF before any byte, a short
            # buffer means EOF mid-field (truncation — reported, not
            # conflated with a clean frame-boundary EOF)
            buf = b""
            while len(buf) < n:
                chunk = src.read(n - len(buf))
                if not chunk:
                    break
                buf += chunk
            return buf

        while True:
            hl = read_exact(4)
            if not hl:
                break  # clean EOF at a frame boundary
            if len(hl) < 4:
                lines_q.put(("bad", "truncated message (length prefix)"))
                break
            (hlen,) = _struct.unpack("<I", hl)
            if hlen > (1 << 20):
                lines_q.put(("bad", f"header length {hlen} > 1 MiB"))
                break
            head = read_exact(hlen)
            pl = read_exact(4) if len(head) == hlen else b""
            if len(pl) < 4:
                lines_q.put(("bad", "truncated message"))
                break
            (plen,) = _struct.unpack("<I", pl)
            if plen > (1 << 30):
                lines_q.put(("bad", f"payload length {plen} > 1 GiB"))
                break
            payload = read_exact(plen) if plen else b""
            if len(payload) < plen:
                lines_q.put(("bad", "truncated payload"))
                break
            try:
                req = json.loads(head.decode())
            except (UnicodeDecodeError, json.JSONDecodeError) as e:
                lines_q.put(("bad_req", f"bad header JSON: {e}"))
                continue
            lines_q.put(("req", req, payload))
        lines_q.put(None)

    threading.Thread(
        target=_reader_binary if wire == "binary" else _reader, daemon=True
    ).start()

    # Drain policy (r5, SERVING_r05.json): polling after EVERY input line
    # costs an O(n_active) slot scan per line — O(n²) per round of n
    # pushes, measured 667 µs/line at n=1024 (4.7× OVER realtime before
    # any real work). Instead drain when the input queue is empty (the
    # natural burst boundary — a request-response client sees identical
    # behavior), on an explicit "poll" op, or at latest every 256 lines
    # (bounded staleness under saturating input).
    lines_since_drain = 0
    try:
        while not shutdown.is_set():
            try:
                line = lines_q.get(timeout=0.2)
            except queue.Empty:
                drain()
                lines_since_drain = 0
                continue
            if line is None:
                break  # EOF
            payload = b""
            req_obj = None
            if isinstance(line, tuple):  # binary-wire reader items
                if line[0] == "bad":
                    emit({"event": "error",
                          "msg": f"wire framing error: {line[1]}; flushing"})
                    break  # desynced byte stream: flush like EOF
                if line[0] == "bad_req":
                    emit({"event": "error", "msg": line[1]})
                    continue
                req_obj, payload = line[1], line[2]
            else:
                line = line.strip()
                if not line:
                    continue
            force_drain = False
            try:
                req = json.loads(line) if req_obj is None else req_obj
                op = req["op"]
                if op == "open":
                    sid = pool.open()
                    emit({"event": "opened", "sid": sid,
                          **({"id": req["id"]} if "id" in req else {})})
                elif op == "push":
                    if (req_obj is not None and "pcm16" not in req
                            and "samples" not in req):
                        # binary wire: raw little-endian int16 PCM payload
                        # (possibly EMPTY — a zero-sample push is a valid
                        # no-op, matching the jsonl wire's pcm16="")
                        x = np.frombuffer(payload, dtype="<i2").astype(
                            np.float32
                        )
                    elif "pcm16" in req:
                        x = np.frombuffer(
                            base64.b64decode(req["pcm16"]), dtype="<i2"
                        ).astype(np.float32)
                    else:
                        x = np.asarray(
                            req["samples"], dtype=np.float32
                        ).reshape(-1)
                    try:
                        pool.push(req["sid"], x)
                    except RuntimeError as e:
                        # per-session buffer backpressure ONLY: under the
                        # burst drain policy a long pipelined push run can
                        # exceed max_buffer_s before the 256-line bound
                        # fires — drain (frees buffered blocks) and retry
                        # ONCE so the chunk's audio isn't silently
                        # dropped. Other RuntimeErrors (ended stream etc.)
                        # go straight to the error event — draining first
                        # would reorder the event stream for nothing.
                        if "buffered ahead of poll" not in str(e):
                            raise
                        drain()
                        lines_since_drain = 0
                        pool.push(req["sid"], x)
                    audio_s += x.size / sr_in
                elif op == "end":
                    pool.end(req["sid"])
                elif op == "close":
                    pool.close(req["sid"])
                    emit({"event": "done", "sid": req["sid"]})
                elif op == "poll":
                    force_drain = True
                elif op == "stats":
                    emit({"event": "stats", "active": pool.n_active,
                          **pool.stats})
                else:
                    emit({"event": "error", "msg": f"unknown op {op!r}"})
            except (KeyError, IndexError, ValueError, RuntimeError,
                    TypeError) as e:
                emit({"event": "error", "msg": f"{type(e).__name__}: {e}"})
            lines_since_drain += 1
            if force_drain or lines_since_drain >= 256 or lines_q.empty():
                drain()
                lines_since_drain = 0
            if client_gone:
                break
    finally:
        if shutdown.is_set():
            log.info("shutdown signal: flushing open streams")
        for sig, h in old_handlers.items():
            signal.signal(sig, h)

    # EOF/shutdown: flush semantics — end still-open streams, drain tails
    pool.end_all()
    while pool.n_active:
        drain()
    wall = time.perf_counter() - t0
    metrics.set(audio_seconds=round(audio_s, 3), wall_s=round(wall, 3),
                rtf=round(audio_s / wall, 2) if wall > 0 else 0.0,
                **pool.stats)
    snap = metrics.emit("done")
    emit({"event": "stats", "active": 0,
          **{k: snap[k] for k in pool.stats}, "audio_seconds": snap["audio_seconds"],
          "wall_s": snap["wall_s"], "rtf": snap["rtf"]})
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
    if not args.self_test:
        return 0

    # deployment smoke: both backends against the float64 oracle on this
    # machine's actual default device (catches broken installs, relay
    # faults, and accuracy regressions in one command)
    import numpy as np

    from mfcc_tpu.ops import chain, reference_numpy as ref

    g = np.random.default_rng(0)
    x = (g.standard_normal(16000) * 3000.0).astype(np.float64)
    failures = 0
    for cname in ("classic13_deltas", "logmel80"):
        cfg = NAMED_CONFIGS[cname]
        want = ref.extract(x, cfg)
        for backend in ("jnp", "pallas"):
            t0 = time.perf_counter()
            got = chain.extract_single(x, cfg, backend=backend)
            dt = (time.perf_counter() - t0) * 1e3
            err = float(np.abs(np.asarray(got, np.float64) - want).max())
            # the documented TPU-fp32 floor (docs/ACCURACY.md): 1.34e-3
            # worst-case lifted cepstra on pathological goldens
            ok = got.shape == want.shape and err < 2e-3
            failures += not ok
            print(f"self-test {cname:18s} {backend:6s} "
                  f"max|err|={err:.2e} {'ok' if ok else 'FAIL'} ({dt:.0f} ms)")
    print("self-test:", "PASS" if failures == 0 else f"{failures} FAILURES")
    return 0 if failures == 0 else 1


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="mfcc_tpu", description=__doc__)
    p.add_argument("-v", "--verbose", action="store_true")
    sub = p.add_subparsers(dest="command", required=True)

    set_help = ("override a FrontendConfig field on top of --config, e.g. "
                "--set window=povey --set n_mels=40 (repeatable; the "
                "config hash and resume markers track the overridden "
                "config)")

    e = sub.add_parser("extract", help="extract features from wav files")
    e.add_argument("files", nargs="+",
                   help="wav paths, globs, directories, or @list.txt "
                        "manifests (one path per line; Kaldi wav.scp "
                        "'<utt> <path>' lines accepted)")
    e.add_argument("--config", default="classic13")
    e.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                   help=set_help)
    e.add_argument("--output-dir", "-o", required=True)
    e.add_argument("--backend", choices=["jnp", "pallas"], default="pallas")
    e.add_argument("--batch-size", type=int, default=64)
    e.add_argument("--max-len-s", type=float, default=10.0,
                   help="largest batch bucket; longer files follow --long")
    e.add_argument("--long", choices=["split", "truncate"], default="split",
                   help="over-long files: split = frame-exact segment/stitch "
                        "extraction (default); truncate = clip to the top "
                        "bucket (the round-1 behaviour)")
    e.add_argument("--threads", type=int, default=4)
    e.add_argument("--pipeline-depth", type=int, default=3,
                   help="dispatched batches kept in flight before the "
                        "oldest is written (hides device->host latency)")
    e.add_argument("--feed", choices=["auto", "mp", "direct", "arrays"],
                   default="auto",
                   help="mp: worker processes decode into shared-memory "
                        "batch rows (fastest, auto default); direct: "
                        "threaded decode-into-buffer; arrays: simple "
                        "threaded path")
    e.add_argument("--feed-dtype", choices=["f32", "i16"], default="i16",
                   help="i16 (default): half-bandwidth host rows, cast on "
                        "device — PCM16 sources are bit-exact, other widths "
                        "quantize at ±0.5 LSB of the int16 scale; f32: "
                        "full-precision rows for non-PCM16 corpora")
    e.add_argument("--compress", choices=["none", "zlib"], default="none",
                   help="shard npz compression (default none: fp32 features "
                        "deflate ~1.1x and zlib would gate the writer)")
    e.add_argument("--format", choices=["npz", "htk", "kaldi"], default="npz",
                   help="npz: ragged shard files (native); htk: one "
                        "big-endian HTK parameter file per utterance "
                        "(io/htk.py); kaldi: one binary .ark + .scp pair "
                        "per shard (io/kaldi.py)")
    e.add_argument("--write-threads", type=int, default=2,
                   help="async shard-writer threads")
    e.add_argument("--resume", action=argparse.BooleanOptionalAction, default=True)
    e.add_argument("--cmvn-stats", default=None,
                   help="path for the global/speaker CMVN moment checkpoint")
    e.add_argument("--utt2spk", default=None,
                   help="Kaldi utt2spk file ('<utt> <spk>' lines) for "
                        "cmvn=speaker; default derives the speaker from "
                        "the wav's parent directory (--spk-from dir)")
    e.add_argument("--spk-from", choices=["dir"], default="dir",
                   help="speaker derivation when no --utt2spk is given")
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
    a.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                   help=set_help)
    a.add_argument("--utt2spk", default=None,
                   help="Kaldi utt2spk file for speaker-CMVN stats "
                        "(must map the same way as the extract pass)")
    a.add_argument("--spk-from", choices=["dir"], default="dir",
                   help="speaker derivation when no --utt2spk is given")
    a.add_argument("--force", action="store_true",
                   help="re-normalize even shards already carrying a stats "
                        "fingerprint (stacks normalizations — only after "
                        "regenerating shards)")
    a.add_argument("--jobs", type=int, default=None,
                   help="worker processes (default: min(shards, cpus))")
    a.add_argument("--compress", choices=["none", "zlib"], default="none",
                   help="compression for rewritten shards")
    a.set_defaults(fn=cmd_apply_cmvn)

    c = sub.add_parser(
        "convert", help="convert npz feature shards to HTK/Kaldi files"
    )
    c.add_argument("shard_dir", help="directory of extracted npz shards")
    c.add_argument("--output-dir", "-o", required=True)
    c.add_argument("--to", choices=["htk", "kaldi"], required=True)
    c.add_argument("--config", default="classic13",
                   help="the config the shards were extracted with (HTK "
                        "parmKind/hop and a feat-dim sanity check)")
    c.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                   help=set_help)
    c.add_argument("--jobs", type=int, default=4)
    c.set_defaults(fn=cmd_convert)

    s = sub.add_parser(
        "serve", help="online JSON-lines serving over stdin/stdout"
    )
    s.add_argument("--config", default="classic13")
    s.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                   help=set_help)
    s.add_argument("--streams", type=int, default=16,
                   help="max concurrent sessions (pool slots)")
    s.add_argument("--frames-per-block", type=int, default=16,
                   help="frames per device block (latency/throughput knob)")
    s.add_argument("--cmvn-stats", nargs="+", default=None,
                   help="cmvn moment .npz files (required for global/"
                        "speaker-CMVN configs; merged)")
    s.add_argument("--speaker", default=None,
                   help="with speaker-CMVN stats: the pool to normalize "
                        "this server's sessions with")
    s.add_argument("--wire", choices=["jsonl", "binary"], default="jsonl",
                   help="transport framing: jsonl (one JSON object per "
                        "line, payloads b64 — the default, debuggable) or "
                        "binary (u32 header_len | JSON header | u32 "
                        "payload_len | payload; push audio as raw <i2 PCM, "
                        "frames as raw <f4 — skips the b64+json payload "
                        "transcodes, SERVING_r05.json)")
    s.add_argument("--emit", choices=["b64", "list", "b64-batched"],
                   default="b64",
                   help="frame payload encoding: b64 float32 (compact), "
                        "JSON lists (debuggable), or b64-batched (ONE "
                        "frames_batch event per poll round — amortizes "
                        "json+flush across streams; the high-stream-count "
                        "wire mode, SERVING_r05.json)")
    s.add_argument("--metrics", default=None, help="JSON-lines metrics file")
    s.set_defaults(fn=cmd_serve)

    v = sub.add_parser("plot", help="4-panel inspection PNGs for wav files")
    v.add_argument("files", nargs="+", help="wav paths, globs, or directories")
    v.add_argument("--config", default="classic13")
    v.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                   help=set_help)
    v.add_argument("--output-dir", "-o", required=True)
    v.set_defaults(fn=cmd_plot)

    i = sub.add_parser("info", help="show devices and configs")
    i.add_argument("--self-test", action="store_true",
                   help="run an end-to-end accuracy smoke (both backends "
                        "vs the float64 oracle) on this machine's device")
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
