"""CLI end-to-end on the CPU mesh: extract → shards match the oracle,
resume skips, global CMVN two-pass normalizes (SURVEY.md §3.4 pipeline)."""

import json

import numpy as np
import pytest

from mfcc_tpu.cli import main as cli_entry
from mfcc_tpu.config import NAMED_CONFIGS
from mfcc_tpu.io import read_shard, write_wav
from mfcc_tpu.ops import reference_numpy as ref
from tests.test_jnp_chain import FEATURE_ATOL_FP32, FEATURE_RTOL


@pytest.fixture()
def corpus(tmp_path):
    g = np.random.default_rng(11)
    paths, sigs = [], {}
    for i, n in enumerate([8000, 23000, 5000, 41000, 16000, 2000, 31000]):
        x = (g.standard_normal(n) * 3000.0).astype(np.int16)
        p = tmp_path / f"utt{i}.wav"
        write_wav(p, 16000, x)
        paths.append(str(p))
        sigs[str(p)] = x.astype(np.float64)
    return paths, sigs


def run_cli(*argv):
    return cli_entry(list(argv))


def test_extract_matches_oracle(corpus, tmp_path):
    paths, sigs = corpus
    out = tmp_path / "feats"
    rc = run_cli(
        "extract", *paths, "--config", "classic13", "-o", str(out),
        "--backend", "jnp", "--batch-size", "4", "--threads", "2",
        "--metrics", str(tmp_path / "m.jsonl"),
    )
    assert rc == 0
    shards = sorted(out.glob("*.npz"))
    assert shards
    got = {}
    for s in shards:
        got.update(read_shard(s))
    assert sorted(got) == sorted(paths)
    cfg = NAMED_CONFIGS["classic13"]
    for p in paths:
        want = ref.extract(sigs[p], cfg)
        np.testing.assert_allclose(
            got[p], want, atol=FEATURE_ATOL_FP32, rtol=FEATURE_RTOL
        )
    # metrics file has progress lines with counters
    lines = [json.loads(l) for l in (tmp_path / "m.jsonl").read_text().splitlines()]
    assert lines[-1]["event"] == "done"
    assert lines[-1]["utterances"] == len(paths)


def test_extract_resume_skips(corpus, tmp_path, caplog):
    paths, _ = corpus
    out = tmp_path / "feats"
    args = ("extract", *paths, "--config", "classic13", "-o", str(out),
            "--backend", "jnp", "--batch-size", "4", "--threads", "1",
            "--metrics", str(tmp_path / "m.jsonl"))
    assert run_cli(*args) == 0
    mtimes = {p: p.stat().st_mtime_ns for p in out.glob("*.npz")}
    assert run_cli(*args) == 0  # second run: every shard skipped
    for p in out.glob("*.npz"):
        assert p.stat().st_mtime_ns == mtimes[p], "resume rewrote a shard"
    lines = [json.loads(l) for l in (tmp_path / "m.jsonl").read_text().splitlines()]
    assert lines[-1].get("shards_skipped", 0) == len(mtimes)


def test_global_cmvn_two_pass(corpus, tmp_path):
    paths, sigs = corpus
    out = tmp_path / "feats"
    # stats INSIDE the shard dir: apply-cmvn must skip non-shard npz files
    stats = out / "cmvn.npz"
    rc = run_cli(
        "extract", *paths, "--config", "classic13_deltas_gcmvn", "-o", str(out),
        "--backend", "jnp", "--batch-size", "4", "--threads", "2",
        "--cmvn-stats", str(stats), "--no-resume",
    )
    assert rc == 0
    assert stats.exists()
    rc = run_cli("apply-cmvn", str(out), "--stats", str(stats),
                 "--config", "classic13_deltas_gcmvn")
    assert rc == 0
    feats = {}
    for s in sorted(out.glob("h0-*.npz")):
        feats.update(read_shard(s))
    allf = np.concatenate(list(feats.values()), axis=0)
    np.testing.assert_allclose(allf.mean(axis=0), 0.0, atol=1e-3)
    np.testing.assert_allclose(allf.var(axis=0), 1.0, atol=2e-2)


def test_apply_cmvn_idempotent_per_shard(corpus, tmp_path):
    """apply-cmvn is idempotent per shard via the in-npz stats fingerprint:
    a rerun with the same stats skips every shard byte-identically (so a
    crash mid-corpus is resumable without double-normalizing the done
    shards — advisor finding), a rerun with different stats refuses, and
    --force overrides."""
    paths, _ = corpus
    out = tmp_path / "feats"
    stats = out / "cmvn.npz"
    run_cli("extract", *paths, "--config", "classic13_deltas_gcmvn", "-o",
            str(out), "--backend", "jnp", "--batch-size", "4",
            "--cmvn-stats", str(stats), "--no-resume")
    assert run_cli("apply-cmvn", str(out), "--stats", str(stats),
                   "--config", "classic13_deltas_gcmvn") == 0
    before = {p.name: p.read_bytes() for p in out.glob("h0-*.npz")}
    # same stats again: every shard skipped, bytes untouched
    assert run_cli("apply-cmvn", str(out), "--stats", str(stats),
                   "--config", "classic13_deltas_gcmvn") == 0
    after = {p.name: p.read_bytes() for p in out.glob("h0-*.npz")}
    assert before == after
    # crash simulation: one shard stripped back to un-normalized form (no
    # fingerprint) — the rerun normalizes exactly that one
    victim = sorted(out.glob("h0-*.npz"))[0]
    with np.load(victim, allow_pickle=False) as z:
        data = {k: z[k] for k in z.files if k != "cmvn_fp"}
    np.savez_compressed(victim, **data)
    assert run_cli("apply-cmvn", str(out), "--stats", str(stats),
                   "--config", "classic13_deltas_gcmvn") == 0
    untouched = {p.name: p.read_bytes() for p in out.glob("h0-*.npz")
                 if p.name != victim.name}
    assert untouched == {k: v for k, v in after.items() if k != victim.name}
    # different stats: refuse (stacking two normalizations corrupts corpus)
    other = tmp_path / "other.npz"
    from mfcc_tpu.parallel import CmvnAccumulator
    acc = CmvnAccumulator.load(stats)
    acc.s1 = acc.s1 + 1.0
    acc.save(other)
    assert run_cli("apply-cmvn", str(out), "--stats", str(other),
                   "--config", "classic13_deltas_gcmvn") == 1
    assert run_cli("apply-cmvn", str(out), "--stats", str(other),
                   "--config", "classic13_deltas_gcmvn", "--force") == 0


def test_resume_preserves_global_moments(corpus, tmp_path):
    """Interrupted global-CMVN run: the resumed run's moments must cover
    skipped shards too (recovered from done markers — review finding)."""
    paths, _ = corpus
    out = tmp_path / "feats"
    stats = tmp_path / "cmvn.npz"
    args = ("extract", *paths, "--config", "classic13_deltas_gcmvn", "-o",
            str(out), "--backend", "jnp", "--batch-size", "4", "--threads",
            "1", "--cmvn-stats", str(stats))
    assert run_cli(*args) == 0
    from mfcc_tpu.parallel import CmvnAccumulator

    first = CmvnAccumulator.load(stats)
    # rerun: every shard skipped, moments recovered from markers
    assert run_cli(*args) == 0
    again = CmvnAccumulator.load(stats)
    np.testing.assert_allclose(again.s1, first.s1, rtol=1e-12)
    np.testing.assert_allclose(again.s2, first.s2, rtol=1e-12)
    assert again.n == first.n


def test_info_runs(capsys):
    assert run_cli("info") == 0
    out = capsys.readouterr().out
    assert "classic13" in out and "devices" in out


def test_extract_no_files(tmp_path):
    assert run_cli("extract", str(tmp_path / "none*.wav"), "-o", str(tmp_path)) == 2


def test_top_level_extract(tmp_path):
    """mfcc_tpu.extract one-call API: path, bytes and array inputs."""
    import mfcc_tpu

    g = np.random.default_rng(9)
    x = (g.standard_normal(8000) * 2000).astype(np.int16)
    p = tmp_path / "x.wav"
    write_wav(p, 16000, x)
    f1 = mfcc_tpu.extract(str(p), backend="jnp")
    f2 = mfcc_tpu.extract(p.read_bytes(), backend="jnp")
    f3 = mfcc_tpu.extract(x.astype(np.float64), backend="jnp")
    assert f1.shape == (49, 13)
    np.testing.assert_array_equal(f1, f2)
    np.testing.assert_array_equal(f1, f3)
    with pytest.raises(ValueError, match="Hz"):
        write_wav(tmp_path / "bad.wav", 8000, x)
        mfcc_tpu.extract(str(tmp_path / "bad.wav"))


def test_extract_long_utterance_split(tmp_path):
    """A 35 s file with --max-len-s 4: must be split/stitch-extracted (not
    truncated), match the float64 oracle end-to-end, resume cleanly, and
    contribute its moments to global CMVN (VERDICT r1 item 2)."""
    from mfcc_tpu.io import write_wav

    g = np.random.default_rng(21)
    xs = {
        "short.wav": (g.standard_normal(9000) * 3000).astype(np.int16),
        "long.wav": (g.standard_normal(16000 * 35) * 3000).astype(np.int16),
    }
    paths = []
    for name, x in xs.items():
        p = tmp_path / name
        write_wav(p, 16000, x)
        paths.append(str(p))
    out = tmp_path / "feats"
    stats = tmp_path / "cmvn.npz"
    args = ("extract", *paths, "--config", "classic13_deltas", "-o", str(out),
            "--backend", "jnp", "--batch-size", "4", "--max-len-s", "4",
            "--cmvn-stats", str(stats), "--metrics", str(tmp_path / "m.jsonl"))
    assert run_cli(*args) == 0
    got = {}
    for s in sorted(out.glob("h0-*.npz")):
        got.update(read_shard(s))
    assert sorted(got) == sorted(str(tmp_path / n) for n in xs)
    cfg = NAMED_CONFIGS["classic13_deltas"]
    for name, x in xs.items():
        want = ref.extract(x.astype(np.float64), cfg)
        have = got[str(tmp_path / name)]
        assert have.shape == want.shape, (name, have.shape, want.shape)
        np.testing.assert_allclose(
            have, want, atol=FEATURE_ATOL_FP32, rtol=FEATURE_RTOL
        )
    # moments cover BOTH utterances' frames
    from mfcc_tpu.parallel import CmvnAccumulator

    acc = CmvnAccumulator.load(stats)
    assert acc.n == sum(f.shape[0] for f in got.values())
    # resume: nothing rewritten, moments identical
    mtimes = {p.name: p.stat().st_mtime_ns for p in out.glob("h0-*.npz")}
    assert run_cli(*args) == 0
    for p in out.glob("h0-*.npz"):
        assert p.stat().st_mtime_ns == mtimes[p.name], "resume rewrote a shard"
    again = CmvnAccumulator.load(stats)
    np.testing.assert_allclose(again.s1, acc.s1, rtol=1e-12)
    assert again.n == acc.n


def test_extract_long_truncate_optin(tmp_path):
    """--long truncate keeps the round-1 clipping behaviour, explicitly."""
    from mfcc_tpu.io import write_wav

    g = np.random.default_rng(22)
    p = tmp_path / "long.wav"
    write_wav(p, 16000, (g.standard_normal(16000 * 12) * 3000).astype(np.int16))
    out = tmp_path / "feats"
    assert run_cli("extract", str(p), "--config", "classic13", "-o", str(out),
                   "--backend", "jnp", "--max-len-s", "4",
                   "--long", "truncate") == 0
    feats = read_shard(sorted(out.glob("h0-*.npz"))[0])
    cfg = NAMED_CONFIGS["classic13"]
    assert feats[str(p)].shape[0] == cfg.num_frames(4 * 16000)


def test_plot_command(corpus, tmp_path):
    paths, _ = corpus
    out = tmp_path / "plots"
    rc = run_cli("plot", paths[0], paths[1], "--config", "classic13",
                 "-o", str(out))
    assert rc == 0
    pngs = sorted(out.glob("*.png"))
    assert len(pngs) == 2
    assert all(p.stat().st_size > 10_000 for p in pngs)  # real figures


def test_plot_command_bad_file(tmp_path):
    bad = tmp_path / "notwav.wav"
    bad.write_bytes(b"this is not a riff file")
    rc = run_cli("plot", str(bad), "-o", str(tmp_path / "plots"))
    assert rc == 1  # skipped + reported, not crashed


# -- serve (JSON-lines online protocol) --------------------------------------


def _run_serve(monkeypatch, capsys, lines, *argv):
    import io
    import sys as _sys

    monkeypatch.setattr(_sys, "stdin", io.StringIO("".join(l + "\n" for l in lines)))
    rc = run_cli("serve", *argv)
    out = capsys.readouterr().out
    return rc, [json.loads(l) for l in out.splitlines() if l.strip()]


def _gather_frames(events, sid):
    import base64

    rows = []
    for ev in events:
        if ev.get("event") == "frames" and ev["sid"] == sid:
            if "data" in ev:
                a = np.frombuffer(base64.b64decode(ev["data"]), dtype="<f4")
                rows.append(a.reshape(ev["n"], ev["dim"]))
            else:
                rows.append(np.asarray(ev["frames"], dtype=np.float32))
        elif ev.get("event") == "frames_batch":
            # --emit b64-batched: tiles concatenated in streams order
            a = np.frombuffer(base64.b64decode(ev["data"]), dtype="<f4")
            off = 0
            for m in ev["streams"]:
                k = m["n"] * m["dim"]
                if m["sid"] == sid:
                    rows.append(a[off : off + k].reshape(m["n"], m["dim"]))
                off += k
    if not rows:
        return np.zeros((0, 0), np.float32)
    return np.concatenate(rows, axis=0)


def test_serve_parity_two_sessions(monkeypatch, capsys):
    """Two interleaved sessions over the wire protocol reproduce the offline
    chain exactly; done + stats events arrive; one stream uses pcm16 b64,
    the other float sample lists."""
    import base64

    from mfcc_tpu.ops import chain

    g = np.random.default_rng(77)
    x0 = (g.standard_normal(9000) * 3000).astype(np.int16)
    x1 = (g.standard_normal(4777) * 2000).astype(np.int16)
    b0 = base64.b64encode(x0.tobytes()).decode()
    lines = [
        json.dumps({"op": "open", "id": "utt-a"}),
        json.dumps({"op": "open"}),
        json.dumps({"op": "push", "sid": 0, "pcm16": b0}),
        json.dumps({"op": "push", "sid": 1,
                    "samples": x1[:3000].astype(float).tolist()}),
        json.dumps({"op": "end", "sid": 0}),
        json.dumps({"op": "push", "sid": 1,
                    "samples": x1[3000:].astype(float).tolist()}),
        json.dumps({"op": "end", "sid": 1}),
        json.dumps({"op": "stats"}),
    ]
    rc, events = _run_serve(
        monkeypatch, capsys, lines,
        "--config", "classic13_deltas", "--streams", "4",
        "--frames-per-block", "8",
    )
    assert rc == 0
    opened = [e for e in events if e.get("event") == "opened"]
    assert [e["sid"] for e in opened] == [0, 1]
    assert opened[0]["id"] == "utt-a"
    assert {e["sid"] for e in events if e.get("event") == "done"} == {0, 1}

    cfg = NAMED_CONFIGS["classic13_deltas"]
    for sid, x in ((0, x0), (1, x1)):
        want = chain.extract_single(x.astype(np.float32), cfg, backend="jnp")
        got = _gather_frames(events, sid)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-5)

    stats = [e for e in events if e.get("event") == "stats"]
    assert stats, "no stats event"
    final = stats[-1]
    assert final["sessions_opened"] == 2 and final["sessions_finished"] == 2
    total = sum(
        chain.extract_single(x.astype(np.float32), cfg, backend="jnp").shape[0]
        for x in (x0, x1)
    )
    assert final["frames_emitted"] == total
    # r5 drain policy: polls happen at burst boundaries (input queue
    # empty), explicit "poll" ops, and the EOF flush — NOT per line (the
    # per-line O(n_active) scan measured 4.7x over realtime at n=1024,
    # SERVING_r05.json). A pre-filled stdin is one burst: few polls.
    assert final["base_dispatches"] >= 1 and final["poll_rounds"] >= 1
    assert final["poll_rounds"] < len(lines)  # the per-line policy is gone


def test_serve_batched_emit_parity(monkeypatch, capsys):
    """--emit b64-batched: one frames_batch event per poll round carries
    every ready stream's tile; reassembled features match the offline
    chain exactly like per-stream events do."""
    import base64

    from mfcc_tpu.ops import chain

    g = np.random.default_rng(91)
    x0 = (g.standard_normal(8000) * 3000).astype(np.int16)
    x1 = (g.standard_normal(5000) * 2000).astype(np.int16)
    lines = [
        json.dumps({"op": "open"}),
        json.dumps({"op": "open"}),
        json.dumps({"op": "push", "sid": 0,
                    "pcm16": base64.b64encode(x0.tobytes()).decode()}),
        json.dumps({"op": "push", "sid": 1,
                    "pcm16": base64.b64encode(x1.tobytes()).decode()}),
        json.dumps({"op": "end", "sid": 0}),
        json.dumps({"op": "end", "sid": 1}),
    ]
    rc, events = _run_serve(
        monkeypatch, capsys, lines,
        "--config", "classic13_deltas", "--streams", "4",
        "--frames-per-block", "8", "--emit", "b64-batched",
    )
    assert rc == 0
    batch_evs = [e for e in events if e.get("event") == "frames_batch"]
    assert batch_evs, "no frames_batch events"
    assert not any(e.get("event") == "frames" for e in events)
    cfg = NAMED_CONFIGS["classic13_deltas"]
    for sid, x in ((0, x0), (1, x1)):
        want = chain.extract_single(x.astype(np.float32), cfg, backend="jnp")
        got = _gather_frames(events, sid)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-5)
    assert {e["sid"] for e in events if e.get("event") == "done"} == {0, 1}


def _frame_msg(obj, payload=b""):
    import struct

    head = json.dumps(obj).encode()
    return (struct.pack("<I", len(head)) + head
            + struct.pack("<I", len(payload)) + payload)


class _BinIn:
    """Fake binary stdin for the framed wire (the server reads
    getattr(stdin, "buffer", stdin))."""

    def __init__(self, data: bytes):
        import io

        self.buffer = io.BytesIO(data)

    def __iter__(self):  # never used on the binary path
        return iter(())


def _parse_framed(raw: bytes):
    import struct

    out, off = [], 0
    while off < len(raw):
        (hlen,) = struct.unpack_from("<I", raw, off)
        off += 4
        head = json.loads(raw[off : off + hlen].decode())
        off += hlen
        (plen,) = struct.unpack_from("<I", raw, off)
        off += 4
        out.append((head, raw[off : off + plen]))
        off += plen
    return out


def test_serve_binary_wire_parity(monkeypatch, capsysbinary):
    """--wire binary (r5): length-prefixed framing, raw <i2 PCM in / raw
    <f4 frames out — same semantics as jsonl, exact offline parity."""
    import io
    import sys as _sys

    from mfcc_tpu.ops import chain

    g = np.random.default_rng(113)
    x0 = (g.standard_normal(9000) * 3000).astype(np.int16)
    x1 = (g.standard_normal(4777) * 2000).astype(np.int16)
    raw = b"".join([
        _frame_msg({"op": "open", "id": "bin-a"}),
        _frame_msg({"op": "open"}),
        _frame_msg({"op": "push", "sid": 0}, x0.tobytes()),
        _frame_msg({"op": "push", "sid": 1}, x1[:3000].tobytes()),
        _frame_msg({"op": "end", "sid": 0}),
        _frame_msg({"op": "push", "sid": 1}, x1[3000:].tobytes()),
        _frame_msg({"op": "end", "sid": 1}),
        _frame_msg({"op": "stats"}),
    ])

    monkeypatch.setattr(_sys, "stdin", _BinIn(raw))
    rc = run_cli("serve", "--config", "classic13_deltas", "--streams", "4",
                 "--frames-per-block", "8", "--wire", "binary")
    out = capsysbinary.readouterr().out
    assert rc == 0
    msgs = _parse_framed(out)
    events = [h for h, _ in msgs]
    assert [e["sid"] for e in events if e.get("event") == "opened"] == [0, 1]
    assert {e["sid"] for e in events if e.get("event") == "done"} == {0, 1}
    cfg = NAMED_CONFIGS["classic13_deltas"]
    for sid, x in ((0, x0), (1, x1)):
        rows = [
            np.frombuffer(p, dtype="<f4").reshape(h["n"], h["dim"])
            for h, p in msgs
            if h.get("event") == "frames" and h["sid"] == sid
        ]
        got = np.concatenate(rows, axis=0)
        want = chain.extract_single(x.astype(np.float32), cfg, backend="jnp")
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-5)
    final = [e for e in events if e.get("event") == "stats"][-1]
    assert final["sessions_finished"] == 2


def test_serve_binary_rejects_list_emit(monkeypatch, capsysbinary):
    """--emit list on the binary wire is rejected at startup: its
    header-resident frame lists would overflow the framed-header cap
    after one long tail drain (r5 review)."""
    import sys as _sys

    monkeypatch.setattr(_sys, "stdin", _BinIn(b""))
    rc = run_cli("serve", "--config", "classic13", "--streams", "2",
                 "--wire", "binary", "--emit", "list")
    assert rc == 2


def test_serve_binary_wire_framing_error_flushes(monkeypatch, capsysbinary):
    """A desynced byte stream (oversized header length) flushes open
    streams like EOF and reports a wire error instead of hanging."""
    import io
    import struct
    import sys as _sys

    g = np.random.default_rng(127)
    x = (g.standard_normal(4000) * 3000).astype(np.int16)
    raw = b"".join([
        _frame_msg({"op": "open"}),
        _frame_msg({"op": "push", "sid": 0}, x.tobytes()),
        struct.pack("<I", 1 << 24) + b"garbage",  # absurd header length
    ])

    monkeypatch.setattr(_sys, "stdin", _BinIn(raw))
    rc = run_cli("serve", "--config", "classic13", "--streams", "2",
                 "--wire", "binary")
    out = capsysbinary.readouterr().out
    assert rc == 0
    events = [h for h, _ in _parse_framed(out)]
    assert any(e.get("event") == "error"
               and "framing" in e.get("msg", "") for e in events)
    # the pushed stream still flushed (end_all on wind-down)
    assert any(e.get("event") == "done" for e in events)


def test_serve_binary_wire_empty_push_and_partial_prefix(monkeypatch,
                                                         capsysbinary):
    """r5 review: an EMPTY binary push is a valid 0-sample no-op (parity
    with jsonl pcm16=""), and EOF after a PARTIAL length prefix reports a
    truncation instead of masquerading as a clean frame boundary."""
    import sys as _sys

    g = np.random.default_rng(131)
    x = (g.standard_normal(4000) * 3000).astype(np.int16)
    raw = b"".join([
        _frame_msg({"op": "open"}),
        _frame_msg({"op": "push", "sid": 0}, b""),  # empty push: no-op
        _frame_msg({"op": "push", "sid": 0}, x.tobytes()),
        _frame_msg({"op": "end", "sid": 0}),
    ]) + b"\x07\x00"  # 2 of 4 length-prefix bytes, then EOF
    monkeypatch.setattr(_sys, "stdin", _BinIn(raw))
    rc = run_cli("serve", "--config", "classic13", "--streams", "2",
                 "--wire", "binary")
    out = capsysbinary.readouterr().out
    assert rc == 0
    events = [h for h, _ in _parse_framed(out)]
    errors = [e for e in events if e.get("event") == "error"]
    assert len(errors) == 1 and "length prefix" in errors[0]["msg"], errors
    assert any(e.get("event") == "done" for e in events)


def test_serve_push_backpressure_drains_and_retries(monkeypatch, capsys):
    """r5 review regression: under the burst drain policy, a pipelined
    push run can hit the pool's max_buffer_s backpressure before any
    drain fires. cmd_serve must drain + retry the push instead of
    dropping the chunk's audio into an error event."""
    import base64
    import functools

    import mfcc_tpu.pipeline as pipeline_mod
    from mfcc_tpu.ops import chain
    from mfcc_tpu.pipeline.serving import MultiStreamExtractor

    # shrink the per-session buffer so the burst trips backpressure fast
    small = functools.partial(MultiStreamExtractor, max_buffer_s=0.5)
    monkeypatch.setattr(pipeline_mod, "MultiStreamExtractor", small)

    g = np.random.default_rng(95)
    x = (g.standard_normal(16000) * 3000).astype(np.int16)  # 1 s total
    chunks = np.array_split(x, 8)  # 8 × 0.125 s pushes > 0.5 s buffer
    lines = [json.dumps({"op": "open"})] + [
        json.dumps({"op": "push", "sid": 0,
                    "pcm16": base64.b64encode(c.tobytes()).decode()})
        for c in chunks
    ] + [json.dumps({"op": "end", "sid": 0})]
    rc, events = _run_serve(
        monkeypatch, capsys, lines,
        "--config", "classic13", "--streams", "2",
        "--frames-per-block", "8",
    )
    assert rc == 0
    assert not any(e.get("event") == "error" for e in events), events
    cfg = NAMED_CONFIGS["classic13"]
    want = chain.extract_single(x.astype(np.float32), cfg, backend="jnp")
    got = _gather_frames(events, 0)
    assert got.shape == want.shape  # no frames silently dropped
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-5)


def test_serve_explicit_poll_forces_drain(monkeypatch, capsys):
    """An explicit {"op":"poll"} drains mid-burst: with enough pushed
    audio, the frames precede the later requests' effects (observable as
    poll_rounds > the single burst-boundary drain)."""
    import base64

    g = np.random.default_rng(93)
    x = (g.standard_normal(6400) * 3000).astype(np.int16)
    lines = [
        json.dumps({"op": "open"}),
        json.dumps({"op": "push", "sid": 0,
                    "pcm16": base64.b64encode(x.tobytes()).decode()}),
        json.dumps({"op": "poll"}),
        json.dumps({"op": "poll"}),
        json.dumps({"op": "end", "sid": 0}),
        json.dumps({"op": "stats"}),
    ]
    rc, events = _run_serve(
        monkeypatch, capsys, lines,
        "--config", "classic13", "--streams", "2",
        "--frames-per-block", "8",
    )
    assert rc == 0
    stats = [e for e in events if e.get("event") == "stats"][-1]
    # two explicit polls + the EOF flush drains: strictly more rounds
    # than a poll-free burst of the same shape would produce
    assert stats["poll_rounds"] >= 3


def test_serve_eof_flush_and_errors(monkeypatch, capsys):
    """A session left open at EOF is end()ed and drained (flush semantics);
    bad requests produce error events without killing the loop."""
    from mfcc_tpu.ops import chain

    g = np.random.default_rng(78)
    x = (g.standard_normal(6000) * 3000).astype(np.int16)
    lines = [
        json.dumps({"op": "open"}),
        json.dumps({"op": "nope"}),                      # unknown op
        json.dumps({"op": "push", "sid": 99, "samples": [0.0]}),  # bad sid
        "not json at all",
        json.dumps({"op": "push", "sid": 0,
                    "samples": x.astype(float).tolist()}),
        # NO end: EOF must flush it
    ]
    rc, events = _run_serve(
        monkeypatch, capsys, lines,
        "--config", "classic13", "--streams", "2", "--emit", "list",
    )
    assert rc == 0
    errs = [e for e in events if e.get("event") == "error"]
    assert len(errs) == 3
    assert any(e.get("event") == "done" and e["sid"] == 0 for e in events)
    cfg = NAMED_CONFIGS["classic13"]
    want = chain.extract_single(x.astype(np.float32), cfg, backend="jnp")
    got = _gather_frames(events, 0)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-5)


# -- --set config overrides ---------------------------------------------------


def test_config_with_overrides_parsing():
    from mfcc_tpu.config import FrontendConfig, config_with_overrides

    base = FrontendConfig()
    c = config_with_overrides(base, [
        "window=povey", "n_mels=40", "n_ceps=20", "preemph=0.95",
        "append_energy=false", "mel_high_hz=none", "deltas=2",
    ])
    assert (c.window, c.n_mels, c.n_ceps, c.preemph) == ("povey", 40, 20, 0.95)
    assert c.append_energy is False and c.mel_high_hz is None and c.deltas == 2
    assert c.config_hash() != base.config_hash()
    import pytest as _pt
    with _pt.raises(ValueError, match="key=value"):
        config_with_overrides(base, ["nope=1"])
    with _pt.raises(ValueError, match="cannot parse"):
        config_with_overrides(base, ["n_mels=many"])
    with _pt.raises(ValueError, match="window="):  # enum re-validated
        config_with_overrides(base, ["window=kaiser"])
    with _pt.raises(ValueError, match="cannot parse"):
        config_with_overrides(base, ["append_energy=maybe"])


def test_extract_with_set_overrides(corpus, tmp_path):
    """--set applies on top of --config: features match the oracle built
    with the same overridden config, and a bad --set is a clean rc=2."""
    paths, sigs = corpus
    out = tmp_path / "feats"
    rc = run_cli(
        "extract", paths[0], paths[1], "--config", "classic13",
        "--set", "window=povey", "--set", "n_mels=40",
        "-o", str(out), "--backend", "jnp", "--batch-size", "2",
    )
    assert rc == 0
    from mfcc_tpu.config import NAMED_CONFIGS as NC
    cfg = NC["classic13"].replace(window="povey", n_mels=40)
    shard = {}
    for s in out.glob("h0-*.npz"):
        shard.update(read_shard(s))
    for p in (paths[0], paths[1]):
        want = ref.extract(sigs[p], cfg)
        np.testing.assert_allclose(
            shard[p], want, atol=FEATURE_ATOL_FP32, rtol=FEATURE_RTOL
        )
    assert run_cli("extract", paths[0], "--config", "classic13",
                   "--set", "window=bogus", "-o", str(tmp_path / "x")) == 2


def test_set_overrides_compose_with_second_pass_commands(corpus, tmp_path):
    """--set configs must work through the FULL documented pipeline:
    extract (global CMVN, overridden dims) -> apply-cmvn -> convert.
    Regression: apply-cmvn/convert used to resolve only named configs, so
    any dimension-changing --set broke the second pass."""
    paths, sigs = corpus
    out = tmp_path / "npz"
    stats = out / "cmvn.npz"  # stats INSIDE the shard dir (README flow)
    overrides = ["--set", "features=logmel", "--set", "n_mels=40",
                 "--set", "cmvn=global", "--set", "append_energy=false",
                 "--set", "lifter=0"]
    assert run_cli("extract", paths[0], paths[1], "--config", "classic13",
                   *overrides, "-o", str(out), "--backend", "jnp",
                   "--batch-size", "2", "--cmvn-stats", str(stats)) == 0
    assert run_cli("apply-cmvn", str(out), "--stats", str(stats),
                   "--config", "classic13", *overrides) == 0
    kout = tmp_path / "ark"
    # convert must skip the stats npz sitting in the shard dir (regression)
    assert run_cli("convert", str(out), "-o", str(kout), "--to", "kaldi",
                   "--config", "classic13", *overrides) == 0
    from mfcc_tpu.io.kaldi import ark_key, read_scp

    got = {}
    for s in kout.glob("*.scp"):
        got.update(read_scp(s))
    assert set(got) == {ark_key(p) for p in (paths[0], paths[1])}
    for p in (paths[0], paths[1]):
        assert got[ark_key(p)].shape[1] == 40
        # normalized over the 2-utterance corpus: near zero-mean per dim
        # (exact equality is covered by the npz-vs-ark bit-identity path)
    allf = np.concatenate([got[ark_key(p)] for p in (paths[0], paths[1])])
    assert np.abs(allf.mean(axis=0)).max() < 1e-4
    assert np.abs(allf.std(axis=0) - 1).max() < 1e-2


def test_info_self_test(capsys):
    assert run_cli("info", "--self-test") == 0
    out = capsys.readouterr().out
    assert out.count("ok") >= 4 and "PASS" in out


def test_serve_with_global_cmvn_stats(monkeypatch, capsys, tmp_path):
    """serve --cmvn-stats: frames arrive normalized with the corpus
    moments, matching offline extraction + moment-applied CMVN."""
    import base64

    from mfcc_tpu.ops import chain
    from mfcc_tpu.parallel import CmvnAccumulator

    cfg0 = NAMED_CONFIGS["classic13_deltas_gcmvn"]
    g = np.random.default_rng(91)
    x = (g.standard_normal(7000) * 3000).astype(np.int16)
    # corpus moments from an offline pass over a small "corpus"
    corpus = [x, (g.standard_normal(5000) * 2000).astype(np.int16)]
    acc = CmvnAccumulator(cfg0.feat_dim)
    feats = []
    for u in corpus:
        f = chain.extract_single(
            u.astype(np.float32), cfg0.replace(cmvn="off"), backend="jnp"
        )
        feats.append(f)
        acc.add(f.astype(np.float64).sum(0), (f.astype(np.float64)**2).sum(0),
                f.shape[0])
    stats_path = tmp_path / "m.npz"
    acc.save(stats_path)

    lines = [
        json.dumps({"op": "open"}),
        json.dumps({"op": "push", "sid": 0,
                    "pcm16": base64.b64encode(x.tobytes()).decode()}),
        json.dumps({"op": "end", "sid": 0}),
    ]
    rc, events = _run_serve(
        monkeypatch, capsys, lines,
        "--config", "classic13_deltas_gcmvn",
        "--cmvn-stats", str(stats_path),
    )
    assert rc == 0
    got = _gather_frames(events, 0)
    stats = acc.finalize(cfg0)
    want = (feats[0] - stats.mean) / stats.std
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)
    # and without stats, a global-CMVN config is a clean rc=2
    rc2, events2 = _run_serve(
        monkeypatch, capsys, [], "--config", "classic13_deltas_gcmvn",
    )
    assert rc2 == 2


def test_file_list_manifest(corpus, tmp_path):
    """@list.txt manifests: plain path lines, Kaldi wav.scp '<utt> <path>'
    lines, comments, blanks — all resolve to the same extraction set."""
    paths, sigs = corpus
    manifest = tmp_path / "wav.scp"
    manifest.write_text(
        "# comment line\n"
        f"{paths[0]}\n"
        "\n"
        f"utt_b {paths[1]}\n"
        f"utt-c  {paths[2]}\n"
    )
    out = tmp_path / "feats"
    assert run_cli("extract", f"@{manifest}", "--config", "classic13",
                   "-o", str(out), "--backend", "jnp",
                   "--batch-size", "4") == 0
    shard = {}
    for s in out.glob("h0-*.npz"):
        shard.update(read_shard(s))
    assert set(shard) == set(paths[:3])


def test_serve_sigterm_flushes(tmp_path):
    """A process manager's SIGTERM must flush open streams (tail frames +
    done + final stats) and exit 0 — not die mid-stream."""
    import base64
    import os
    import pathlib
    import signal
    import subprocess
    import sys
    import time as _time

    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    env = {**os.environ, "PYTHONPATH": repo, "JAX_PLATFORMS": "cpu"}
    proc = subprocess.Popen(
        [sys.executable, "-m", "mfcc_tpu.cli", "serve",
         "--config", "classic13", "--streams", "2"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True, env=env,
    )
    try:
        g = np.random.default_rng(3)
        x = (g.standard_normal(6000) * 2000).astype(np.int16)
        proc.stdin.write(json.dumps({"op": "open"}) + "\n")
        proc.stdin.write(json.dumps({
            "op": "push", "sid": 0,
            "pcm16": base64.b64encode(x.tobytes()).decode()}) + "\n")
        proc.stdin.flush()
        # wait for the server to have processed the push (opened event)
        assert json.loads(proc.stdout.readline())["event"] == "opened"
        _time.sleep(0.5)
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0
    events = [json.loads(l) for l in out.splitlines() if l.strip()]
    kinds = [e.get("event") for e in events]
    assert "frames" in kinds and "done" in kinds and kinds[-1] == "stats"
    total = sum(e["n"] for e in events if e.get("event") == "frames")
    from mfcc_tpu.config import named_config as _nc

    assert total == _nc("classic13").num_frames(6000)  # full tail flushed
