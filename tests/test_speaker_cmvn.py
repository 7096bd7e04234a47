"""Speaker-level CMVN (cmvn="speaker"): per-speaker moment pools, the
utt2spk / directory mapping, and the full two-pass CLI workflow — each
utterance normalized with ITS speaker's corpus statistics, verified
against a numpy reduction over the float64 oracle features."""

import json

import numpy as np
import pytest

from mfcc_tpu.cli.main import main as cli_entry
from mfcc_tpu.config import named_config
from mfcc_tpu.io import read_shard, write_wav
from mfcc_tpu.ops import reference_numpy as ref
from mfcc_tpu.parallel import (
    SpeakerCmvnAccumulator, read_utt2spk, speaker_of,
)

RNG = np.random.default_rng(61)


def test_speaker_of_mapping(tmp_path):
    assert speaker_of("/c/spk3/utt1.wav") == "spk3"
    assert speaker_of("bare.wav") in ("", "unknown")
    m = {"utt1.wav": "A", "/c/x/utt2.wav": "B", "utt3": "C"}
    assert speaker_of("/c/y/utt1.wav", m) == "A"      # basename
    assert speaker_of("/c/x/utt2.wav", m) == "B"      # exact
    assert speaker_of("/c/z/utt3.wav", m) == "C"      # stem
    with pytest.raises(KeyError):
        speaker_of("/c/none.wav", m)
    u2s = tmp_path / "utt2spk"
    u2s.write_text("# c\nutt1.wav A\n\nutt2.wav B\n")
    assert read_utt2spk(u2s) == {"utt1.wav": "A", "utt2.wav": "B"}
    (tmp_path / "bad").write_text("only-one-field\n")
    with pytest.raises(ValueError):
        read_utt2spk(tmp_path / "bad")


def test_accumulator_merge_save_load(tmp_path):
    a = SpeakerCmvnAccumulator(3)
    a.add("x", np.ones(3), 2 * np.ones(3), 10)
    a.add("y", np.zeros(3), np.ones(3), 5)
    b = SpeakerCmvnAccumulator(3)
    b.add("x", np.ones(3), np.ones(3), 2)
    a.merge(b)
    assert a.n == 17 and a.pools["x"].n == 12
    p = tmp_path / "s.npz"
    a.save(p)
    c = SpeakerCmvnAccumulator.load(p)
    assert set(c.pools) == {"x", "y"} and c.pools["x"].n == 12
    np.testing.assert_array_equal(c.pools["x"].s1, a.pools["x"].s1)
    # a GLOBAL stats file is rejected by the speaker loader
    np.savez(tmp_path / "g.npz", s1=np.zeros(3), s2=np.zeros(3),
             n=np.float64(1))
    with pytest.raises(ValueError, match="spks"):
        SpeakerCmvnAccumulator.load(tmp_path / "g.npz")


@pytest.fixture()
def spk_corpus(tmp_path):
    """Two speakers x three utterances in spk/utt.wav layout."""
    paths, sigs = [], {}
    for spk, scale in (("spkA", 3000.0), ("spkB", 800.0)):
        d = tmp_path / spk
        d.mkdir()
        for u, n in enumerate([8000, 12345, 5000]):
            x = (RNG.standard_normal(n) * scale).astype(np.int16)
            p = d / f"u{u}.wav"
            write_wav(p, 16000, x)
            paths.append(str(p))
            sigs[str(p)] = x.astype(np.float64)
    return paths, sigs


def _oracle_speaker_norm(sigs, cfg):
    """Numpy reduction: per-speaker pooled mean/std over oracle features."""
    base = cfg.replace(cmvn="off")
    feats = {p: ref.extract(x, base) for p, x in sigs.items()}
    pools = {}
    for p, f in feats.items():
        pools.setdefault(speaker_of(p), []).append(f)
    stats = {}
    for spk, fs in pools.items():
        allf = np.concatenate(fs, axis=0)
        mu = allf.mean(axis=0)
        var = (allf**2).mean(axis=0) - mu**2
        stats[spk] = (mu, np.sqrt(np.maximum(var, 0) + cfg.cmvn_eps))
    return {
        p: (f - stats[speaker_of(p)][0]) / stats[speaker_of(p)][1]
        for p, f in feats.items()
    }


def test_cli_speaker_cmvn_workflow(spk_corpus, tmp_path):
    """extract (cmvn=speaker, dir-derived speakers) -> apply-cmvn: every
    utterance matches the oracle normalized with its speaker's pooled
    stats; resume recovers per-speaker moments from markers; export via
    convert carries the normalized values."""
    paths, sigs = spk_corpus
    cfg = named_config("classic13").replace(cmvn="speaker")
    out = tmp_path / "feats"
    stats = tmp_path / "spk_cmvn.npz"
    argv = ["extract", *paths, "--config", "classic13",
            "--set", "cmvn=speaker", "-o", str(out), "--backend", "jnp",
            "--batch-size", "4", "--cmvn-stats", str(stats)]
    assert cli_entry(argv) == 0
    sacc = SpeakerCmvnAccumulator.load(stats)
    assert set(sacc.pools) == {"spkA", "spkB"}

    # resume: a rerun recovers the same per-speaker moments from markers
    assert cli_entry(argv) == 0
    again = SpeakerCmvnAccumulator.load(stats)
    for spk in ("spkA", "spkB"):
        np.testing.assert_allclose(
            again.pools[spk].s1, sacc.pools[spk].s1, rtol=1e-12
        )
        assert again.pools[spk].n == sacc.pools[spk].n

    assert cli_entry(["apply-cmvn", str(out), "--stats", str(stats),
                      "--config", "classic13", "--set", "cmvn=speaker"]) == 0
    got = {}
    for s in out.glob("h0-*.npz"):
        got.update(read_shard(s))
    want = _oracle_speaker_norm(sigs, cfg)
    assert set(got) == set(want)
    for p in paths:
        # normalized-domain gate: the fp32 feature floor (~5e-4) divided
        # by small per-dim stds lands ~4e-3 worst-case vs the fp64 oracle
        np.testing.assert_allclose(got[p], want[p], atol=5e-3, rtol=1e-3)
    # per-speaker distribution properties hold exactly: pooled mean 0/var 1
    for spk in ("spkA", "spkB"):
        allf = np.concatenate(
            [got[p] for p in paths if speaker_of(p) == spk], axis=0
        )
        np.testing.assert_allclose(allf.mean(axis=0), 0.0, atol=1e-3)
        np.testing.assert_allclose(allf.var(axis=0), 1.0, atol=2e-2)

    # idempotency: second apply skips every shard
    assert cli_entry(["apply-cmvn", str(out), "--stats", str(stats),
                      "--config", "classic13", "--set", "cmvn=speaker"]) == 0
    got2 = {}
    for s in out.glob("h0-*.npz"):
        got2.update(read_shard(s))
    for p in paths:
        np.testing.assert_array_equal(got2[p], got[p])


def test_cli_speaker_cmvn_utt2spk(spk_corpus, tmp_path):
    """An explicit utt2spk overrides the directory mapping (here: pool
    EVERYTHING into one speaker and check it equals global-CMVN)."""
    paths, sigs = spk_corpus
    u2s = tmp_path / "utt2spk"
    u2s.write_text("".join(f"{p} onespk\n" for p in paths))
    out = tmp_path / "feats"
    stats = tmp_path / "s.npz"
    assert cli_entry(["extract", *paths, "--config", "classic13",
                      "--set", "cmvn=speaker", "-o", str(out),
                      "--backend", "jnp", "--batch-size", "4",
                      "--utt2spk", str(u2s), "--cmvn-stats", str(stats)]) == 0
    sacc = SpeakerCmvnAccumulator.load(stats)
    assert set(sacc.pools) == {"onespk"}
    assert cli_entry(["apply-cmvn", str(out), "--stats", str(stats),
                      "--config", "classic13", "--set", "cmvn=speaker",
                      "--utt2spk", str(u2s)]) == 0

    # equivalent global-CMVN run (same corpus-wide pool)
    out_g = tmp_path / "feats_g"
    stats_g = tmp_path / "g.npz"
    assert cli_entry(["extract", *paths, "--config", "classic13",
                      "--set", "cmvn=global", "-o", str(out_g),
                      "--backend", "jnp", "--batch-size", "4",
                      "--cmvn-stats", str(stats_g)]) == 0
    assert cli_entry(["apply-cmvn", str(out_g), "--stats", str(stats_g),
                      "--config", "classic13", "--set", "cmvn=global"]) == 0
    a, b = {}, {}
    for s in out.glob("h0-*.npz"):
        a.update(read_shard(s))
    for s in out_g.glob("h0-*.npz"):
        b.update(read_shard(s))
    for p in paths:
        # the two pools differ only in moment summation order (device fp32
        # batch-sum vs per-row sums folded in host float64)
        np.testing.assert_allclose(a[p], b[p], atol=1e-4)


def test_apply_cmvn_unknown_speaker_fails_cleanly(spk_corpus, tmp_path):
    paths, _ = spk_corpus
    out = tmp_path / "feats"
    stats = tmp_path / "s.npz"
    assert cli_entry(["extract", *paths, "--config", "classic13",
                      "--set", "cmvn=speaker", "-o", str(out),
                      "--backend", "jnp", "--cmvn-stats", str(stats)]) == 0
    # stats from a DIFFERENT (single-speaker) pool: unknown speakers abort
    bogus = SpeakerCmvnAccumulator(named_config("classic13").feat_dim)
    bogus.add("someone_else", np.ones(13), 2 * np.ones(13), 9)
    bogus.save(stats)
    assert cli_entry(["apply-cmvn", str(out), "--stats", str(stats),
                      "--config", "classic13", "--set", "cmvn=speaker"]) == 1


def test_manifest_utt2spk_composition(spk_corpus, tmp_path):
    """Kaldi pair files compose: wav.scp utt-ids resolve through utt2spk
    (regression: the manifest's id column was discarded)."""
    paths, _ = spk_corpus
    scp = tmp_path / "wav.scp"
    u2s = tmp_path / "utt2spk"
    scp.write_text("".join(f"utt{i} {p}\n" for i, p in enumerate(paths)))
    u2s.write_text("".join(
        f"utt{i} {'even' if i % 2 == 0 else 'odd'}\n"
        for i in range(len(paths))
    ))
    out = tmp_path / "feats"
    stats = tmp_path / "s.npz"
    assert cli_entry(["extract", f"@{scp}", "--config", "classic13",
                      "--set", "cmvn=speaker", "-o", str(out),
                      "--backend", "jnp", "--utt2spk", str(u2s),
                      "--cmvn-stats", str(stats)]) == 0
    sacc = SpeakerCmvnAccumulator.load(stats)
    assert set(sacc.pools) == {"even", "odd"}


def test_extract_validates_utt2spk_upfront(spk_corpus, tmp_path):
    """A typo'd utt2spk entry fails BEFORE extraction with rc=2, not a
    mid-run KeyError traceback; a missing utt2spk path likewise."""
    paths, _ = spk_corpus
    u2s = tmp_path / "utt2spk"
    u2s.write_text(f"{paths[0]} A\n")  # every other utterance unmapped
    assert cli_entry(["extract", *paths, "--config", "classic13",
                      "--set", "cmvn=speaker", "-o", str(tmp_path / "x"),
                      "--backend", "jnp", "--utt2spk", str(u2s)]) == 2
    assert not list((tmp_path / "x").glob("*.npz"))  # nothing extracted
    assert cli_entry(["extract", *paths, "--config", "classic13",
                      "--set", "cmvn=speaker", "-o", str(tmp_path / "y"),
                      "--utt2spk", str(tmp_path / "missing")]) == 2


def test_resume_recomputes_on_changed_mapping(spk_corpus, tmp_path):
    """Markers record the resolved utt->spk mapping; a resumed run under a
    DIFFERENT mapping recomputes instead of silently pooling utterances
    into stale speakers."""
    paths, _ = spk_corpus
    out = tmp_path / "feats"
    stats = tmp_path / "s.npz"
    u2s_a = tmp_path / "a.u2s"
    u2s_a.write_text("".join(f"{p} one\n" for p in paths))
    assert cli_entry(["extract", *paths, "--config", "classic13",
                      "--set", "cmvn=speaker", "-o", str(out),
                      "--backend", "jnp", "--batch-size", "4",
                      "--utt2spk", str(u2s_a),
                      "--cmvn-stats", str(stats)]) == 0
    assert set(SpeakerCmvnAccumulator.load(stats).pools) == {"one"}
    # same shards on disk, new mapping: rerun must NOT reuse marker moments
    u2s_b = tmp_path / "b.u2s"
    u2s_b.write_text("".join(
        f"{p} {'x' if i % 2 else 'y'}\n" for i, p in enumerate(paths)
    ))
    assert cli_entry(["extract", *paths, "--config", "classic13",
                      "--set", "cmvn=speaker", "-o", str(out),
                      "--backend", "jnp", "--batch-size", "4",
                      "--utt2spk", str(u2s_b),
                      "--cmvn-stats", str(stats)]) == 0
    assert set(SpeakerCmvnAccumulator.load(stats).pools) == {"x", "y"}


def test_apply_cmvn_mixed_stats_rejected(spk_corpus, tmp_path):
    paths, _ = spk_corpus
    from mfcc_tpu.parallel import CmvnAccumulator

    s = SpeakerCmvnAccumulator(13)
    s.add("a", np.ones(13), np.ones(13), 3)
    s.save(tmp_path / "spk.npz")
    g = CmvnAccumulator(13)
    g.add(np.ones(13), np.ones(13), 3)
    g.save(tmp_path / "glob.npz")
    out = tmp_path / "feats"
    assert cli_entry(["extract", paths[0], "--config", "classic13",
                      "-o", str(out), "--backend", "jnp"]) == 0
    assert cli_entry(["apply-cmvn", str(out),
                      "--stats", str(tmp_path / "spk.npz"),
                      str(tmp_path / "glob.npz"),
                      "--config", "classic13"]) == 2


def test_finalize_drops_empty_pools():
    acc = SpeakerCmvnAccumulator(2)
    acc.add("full", np.ones(2), 2 * np.ones(2), 4)
    acc.add("empty", np.zeros(2), np.zeros(2), 0)
    from mfcc_tpu.config import named_config as nc

    stats = acc.finalize(nc("classic13"))
    assert set(stats) == {"full"}


def test_serve_with_speaker_stats(monkeypatch, capsys, tmp_path):
    """serve consumes speaker stats via --speaker (pool selection); the
    frames arrive normalized with that pool; missing --speaker is rc=2."""
    import base64

    from mfcc_tpu.ops import chain
    from tests.test_cli import _gather_frames, _run_serve

    cfg = named_config("classic13_deltas").replace(cmvn="speaker")
    g = np.random.default_rng(71)
    x = (g.standard_normal(6000) * 2000).astype(np.int16)
    f = chain.extract_single(
        x.astype(np.float32), cfg.replace(cmvn="off"), backend="jnp"
    )
    acc = SpeakerCmvnAccumulator(cfg.feat_dim)
    acc.add("me", f.astype(np.float64).sum(0),
            (f.astype(np.float64) ** 2).sum(0), f.shape[0])
    stats = tmp_path / "s.npz"
    acc.save(stats)

    lines = [
        json.dumps({"op": "open"}),
        json.dumps({"op": "push", "sid": 0,
                    "pcm16": base64.b64encode(x.tobytes()).decode()}),
        json.dumps({"op": "end", "sid": 0}),
    ]
    rc, events = _run_serve(
        monkeypatch, capsys, lines,
        "--config", "classic13_deltas", "--set", "cmvn=speaker",
        "--cmvn-stats", str(stats), "--speaker", "me",
    )
    assert rc == 0
    got = _gather_frames(events, 0)
    st = acc.finalize(cfg)["me"]
    want = (f - st.mean) / st.std
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)

    rc2, _ = _run_serve(
        monkeypatch, capsys, [],
        "--config", "classic13_deltas", "--set", "cmvn=speaker",
        "--cmvn-stats", str(stats),
    )
    assert rc2 == 2  # --speaker required with speaker stats


def test_speaker_cmvn_longform(tmp_path):
    """Over-long utterances (split/stitch path) contribute to their
    speaker's pool and resume from markers like batch shards."""
    d = tmp_path / "spkL"
    d.mkdir()
    x = (RNG.standard_normal(16000 * 5) * 2000).astype(np.int16)
    p = d / "long.wav"
    write_wav(p, 16000, x)
    out = tmp_path / "feats"
    stats = tmp_path / "s.npz"
    argv = ["extract", str(p), "--config", "classic13",
            "--set", "cmvn=speaker", "-o", str(out), "--backend", "jnp",
            "--max-len-s", "2.0", "--cmvn-stats", str(stats)]
    assert cli_entry(argv) == 0
    sacc = SpeakerCmvnAccumulator.load(stats)
    assert set(sacc.pools) == {"spkL"}
    cfg = named_config("classic13")
    assert sacc.pools["spkL"].n == cfg.num_frames(x.shape[0])
    # resume recovers the long shard's speaker moments from its marker
    assert cli_entry(argv) == 0
    again = SpeakerCmvnAccumulator.load(stats)
    assert again.pools["spkL"].n == sacc.pools["spkL"].n
    np.testing.assert_allclose(again.pools["spkL"].s1, sacc.pools["spkL"].s1,
                               rtol=1e-12)
