"""Kaldi ark/scp output: exact binary layout, sequential + random-access
round-trip, and the CLI --format kaldi path (one ark/scp per shard,
resume markers). The wire format is checked byte-for-byte against the
documented Kaldi float-matrix encoding (io/kaldi.py module doc) since no
Kaldi reader is installed in this environment."""

import pathlib
import struct

import numpy as np
import pytest
import scipy.io.wavfile

from mfcc_tpu.cli.main import main as cli_entry
from mfcc_tpu.config import named_config
from mfcc_tpu.io.kaldi import ArkWriter, ark_key, read_ark, read_scp
from mfcc_tpu.io.writer import ShardWriter
from mfcc_tpu.ops import reference_numpy as ref
from tests.test_jnp_chain import FEATURE_ATOL_FP32, FEATURE_RTOL

RNG = np.random.default_rng(17)


def test_binary_layout_exact(tmp_path):
    """Byte-level check of one entry: key, space, \\0B, 'FM ', \\4-prefixed
    little-endian dims, row-major little-endian f32 data."""
    feat = np.arange(6, dtype=np.float32).reshape(2, 3)
    with ArkWriter(tmp_path / "one") as w:
        assert w.add("utt1", feat) == "utt1"
    raw = (tmp_path / "one.ark").read_bytes()
    want = (
        b"utt1 " + b"\0B" + b"FM "
        + b"\x04" + struct.pack("<i", 2)
        + b"\x04" + struct.pack("<i", 3)
        + feat.astype("<f4").tobytes()
    )
    assert raw == want
    scp = (tmp_path / "one.scp").read_text().strip()
    key, loc = scp.split(" ", 1)
    ark, off = loc.rsplit(":", 1)
    assert key == "utt1" and int(off) == 5  # offset points at \0B
    assert ark.endswith("one.ark")


def test_round_trip_ark_and_scp(tmp_path):
    feats = {
        "a": RNG.standard_normal((57, 39)).astype(np.float32),
        "b": RNG.standard_normal((1, 39)).astype(np.float32),
        "c": np.zeros((0, 39), dtype=np.float32),  # empty matrix is legal
    }
    with ArkWriter(tmp_path / "rt") as w:
        for k, f in feats.items():
            w.add(k, f)
    for got in (read_ark(tmp_path / "rt.ark"), read_scp(tmp_path / "rt.scp")):
        assert set(got) == set(feats)
        for k in feats:
            np.testing.assert_array_equal(got[k], feats[k])


def test_keys_and_errors(tmp_path):
    # paths (no whitespace) pass through untouched
    assert ark_key("/corpus/a/utt_1.wav") == "/corpus/a/utt_1.wav"
    # whitespace replacement carries an id-hash suffix so that sanitized
    # ids can't collide with each other or with clean ids
    sanitized = ark_key("/corpus/a b/utt 1.wav")
    assert sanitized.startswith("/corpus/a_b/utt_1.wav-")
    assert sanitized != ark_key("/corpus/a_b/utt_1.wav")
    assert ark_key("u 1.wav") != ark_key("u_1.wav")
    assert ark_key("   ").startswith("utt-")
    with ArkWriter(tmp_path / "dup") as w:
        w.add("k", np.zeros((1, 2), np.float32))
        with pytest.raises(ValueError, match="duplicate"):
            w.add("k", np.zeros((1, 2), np.float32))
    # pytest.raises absorbed the error inside the with-body, so the writer
    # closed normally and the archive holds the first entry
    assert read_ark(tmp_path / "dup.ark")["k"].shape == (1, 2)
    with pytest.raises(ValueError, match=r"\[F, D\]"):
        with ArkWriter(tmp_path / "bad") as w:
            w.add("k", np.zeros((3,), np.float32))
    # abort path: no final files, no tmp litter for the failed archive
    assert not (tmp_path / "bad.ark").exists()
    assert not (tmp_path / "bad.ark.tmp").exists()


def test_read_rejects_garbage(tmp_path):
    p = tmp_path / "bad.ark"
    p.write_bytes(b"utt1 XY")
    with pytest.raises(ValueError, match="binary"):
        read_ark(p)
    p.write_bytes(b"utt1 \0BCM " + b"\x00" * 16)
    with pytest.raises(ValueError, match="token"):
        read_ark(p)
    p.write_bytes(b"utt1 \0BFM \x04" + struct.pack("<i", 2) + b"\x04"
                  + struct.pack("<i", 3) + b"\x00" * 8)
    with pytest.raises(ValueError, match="truncated"):
        read_ark(p)


def test_shard_writer_kaldi(tmp_path):
    cfg = named_config("classic13")
    w = ShardWriter(tmp_path, cfg, fmt="kaldi")
    ids = ["/corpus/a/utt.wav", "/corpus/b/utt.wav"]
    feats = [RNG.standard_normal((10, 13)).astype(np.float32),
             RNG.standard_normal((4, 13)).astype(np.float32)]
    w.write("s0", ids, feats)
    meta = w.marker_meta("s0")
    assert meta["format"] == "kaldi"
    assert meta["files"] == ["s0.ark", "s0.scp"]
    got = read_scp(tmp_path / "s0.scp")
    for i, want in zip(ids, feats):
        np.testing.assert_array_equal(got[ark_key(i)], want)
    assert w.is_done("s0", ids)
    assert not w.is_done("s0", ids[::-1])  # fingerprint mismatch
    assert not ShardWriter(tmp_path, cfg, fmt="npz").is_done("s0", ids)


def test_cli_format_kaldi(tmp_path):
    """End-to-end: wavs -> ark/scp shards matching the float64 oracle,
    Kaldi layout (energy FIRST — no permutation), resume rewrites nothing,
    and global-CMVN configs are rejected like htk."""
    cfg = named_config("classic13_deltas")
    wavs, sigs = [], {}
    for i in range(3):
        p = tmp_path / f"u{i}.wav"
        x = (RNG.standard_normal(8000 + 640 * i) * 3000).astype(np.int16)
        scipy.io.wavfile.write(p, 16000, x)
        wavs.append(p)
        sigs[str(p)] = x.astype(np.float64)
    out = tmp_path / "out"
    argv = ["extract", *map(str, wavs), "--config", "classic13_deltas",
            "-o", str(out), "--format", "kaldi", "--backend", "jnp",
            "--batch-size", "4", "--threads", "2"]
    assert cli_entry(argv) == 0
    scps = sorted(out.glob("*.scp"))
    assert scps and list((out / "done").glob("*.json"))
    got = {}
    for s in scps:
        got.update(read_scp(s))
    assert set(got) == {ark_key(str(w)) for w in wavs}
    for w in wavs:
        want = ref.extract(sigs[str(w)], cfg)
        np.testing.assert_allclose(
            got[ark_key(str(w))], want,
            atol=FEATURE_ATOL_FP32, rtol=FEATURE_RTOL,
        )
    mtimes = {f: f.stat().st_mtime_ns for f in out.glob("*.ark")}
    assert cli_entry(argv) == 0
    assert {f: f.stat().st_mtime_ns for f in out.glob("*.ark")} == mtimes

    assert cli_entry(["extract", str(wavs[0]), "--config",
                      "classic13_deltas_gcmvn", "-o", str(tmp_path / "g"),
                      "--format", "kaldi", "--backend", "jnp"]) == 2


def test_cli_kaldi_long_split(tmp_path):
    cfg = named_config("classic13")
    n = 16000 * 5 + 333
    x = (RNG.standard_normal(n) * 2000).astype(np.int16)
    p = tmp_path / "long.wav"
    scipy.io.wavfile.write(p, 16000, x)
    out = tmp_path / "out"
    rc = cli_entry(["extract", str(p), "--config", "classic13", "-o", str(out),
                    "--format", "kaldi", "--backend", "jnp",
                    "--max-len-s", "2.0"])
    assert rc == 0
    arks = list(out.glob("*.ark"))
    assert len(arks) == 1
    got = read_ark(arks[0])
    assert got[ark_key(str(p))].shape[0] == cfg.num_frames(n)


def test_cli_convert_gcmvn_workflow(tmp_path):
    """The documented global-CMVN interop path: extract npz -> apply-cmvn
    -> convert --to kaldi/htk. Converted features must be bit-identical to
    the normalized npz shards; HTK files must advertise _Z; conversion is
    resumable."""
    from mfcc_tpu.io import read_htk, read_shard
    from mfcc_tpu.io.htk import energy_last_permutation

    cfg = named_config("classic13_deltas_gcmvn")
    wavs = []
    for i in range(3):
        p = tmp_path / f"u{i}.wav"
        x = (RNG.standard_normal(6000 + 640 * i) * 3000).astype(np.int16)
        scipy.io.wavfile.write(p, 16000, x)
        wavs.append(str(p))
    out = tmp_path / "npz"
    stats = tmp_path / "cmvn.npz"
    assert cli_entry(["extract", *wavs, "--config", "classic13_deltas_gcmvn",
                      "-o", str(out), "--backend", "jnp", "--batch-size", "4",
                      "--cmvn-stats", str(stats)]) == 0
    assert cli_entry(["apply-cmvn", str(out), "--stats", str(stats),
                      "--config", "classic13_deltas_gcmvn"]) == 0
    npz = {}
    for s in out.glob("h0-*.npz"):
        npz.update(read_shard(s))

    kout = tmp_path / "kaldi"
    assert cli_entry(["convert", str(out), "-o", str(kout), "--to", "kaldi",
                      "--config", "classic13_deltas_gcmvn"]) == 0
    got = {}
    for s in kout.glob("*.scp"):
        got.update(read_scp(s))
    assert set(got) == {ark_key(k) for k in npz}
    for k, v in npz.items():
        np.testing.assert_array_equal(got[ark_key(k)], v)

    hout = tmp_path / "htk"
    assert cli_entry(["convert", str(out), "-o", str(hout), "--to", "htk",
                      "--config", "classic13_deltas_gcmvn"]) == 0
    perm = energy_last_permutation(cfg)
    hfiles = sorted(hout.glob("*.htk"))
    assert len(hfiles) == 3
    by_stem = {f.name.rsplit("-", 1)[0]: f for f in hfiles}
    for k, v in npz.items():
        feat, meta = read_htk(by_stem[pathlib.Path(k).stem])
        assert meta["parm_kind_str"] == "MFCC_E_D_A_Z"
        np.testing.assert_array_equal(feat, v[:, perm].astype(np.float32))

    # resume: second convert rewrites nothing
    mtimes = {f: f.stat().st_mtime_ns for f in kout.glob("*.ark")}
    assert cli_entry(["convert", str(out), "-o", str(kout), "--to", "kaldi",
                      "--config", "classic13_deltas_gcmvn"]) == 0
    assert {f: f.stat().st_mtime_ns for f in kout.glob("*.ark")} == mtimes

    # wrong-dim config is a clean rc=2, not silently mis-labeled output
    assert cli_entry(["convert", str(out), "-o", str(tmp_path / "x"),
                      "--to", "kaldi", "--config", "classic13"]) == 2
