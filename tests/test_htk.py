"""HTK parameter-file output: binary format round-trip, parmKind mapping,
and the CLI --format htk path (per-utterance files + resume markers)."""

import pathlib
import struct

import numpy as np
import pytest
import scipy.io.wavfile

from mfcc_tpu.cli.main import main as cli_entry
from mfcc_tpu.config import named_config
from mfcc_tpu.io.htk import (
    energy_last_permutation,
    kind_string,
    parm_kind,
    read_htk,
    write_htk,
)
from mfcc_tpu.io.writer import ShardWriter
from mfcc_tpu.ops import reference_numpy as ref
from tests.test_jnp_chain import FEATURE_ATOL_FP32, FEATURE_RTOL

RNG = np.random.default_rng(9)


def test_round_trip_and_header(tmp_path):
    cfg = named_config("classic13_deltas")
    feat = RNG.standard_normal((57, cfg.feat_dim)).astype(np.float32)
    p = tmp_path / "rt.htk"
    write_htk(p, feat, cfg)
    got, meta = read_htk(p)
    # file layout is HTK's: energy last per static/delta/acc block
    perm = energy_last_permutation(cfg)
    assert perm is not None and perm[12] == 0 and perm[0] == 1
    np.testing.assert_array_equal(got, feat[:, perm])
    assert meta["num_frames"] == 57
    assert meta["feat_dim"] == cfg.feat_dim
    assert meta["sample_period_100ns"] == 100000  # 10 ms hop
    # raw header is big-endian (HTK Book 5.10)
    raw = p.read_bytes()
    n, period, size, kind = struct.unpack(">iihh", raw[:12])
    assert (n, period, size) == (57, 100000, 4 * cfg.feat_dim)
    assert kind == parm_kind(cfg)


def test_parm_kind_mapping():
    assert kind_string(parm_kind(named_config("classic13"))) == "MFCC_E"
    assert kind_string(parm_kind(named_config("classic13_deltas"))) == "MFCC_E_D_A"
    assert kind_string(parm_kind(named_config("logmel80"))) == "FBANK"
    gc = named_config("classic13_deltas_gcmvn")
    assert kind_string(parm_kind(gc)) == "MFCC_E_D_A_Z"


def test_read_rejects_garbage(tmp_path):
    p = tmp_path / "bad.htk"
    p.write_bytes(b"\x00" * 8)
    with pytest.raises(ValueError, match="truncated"):
        read_htk(p)
    p.write_bytes(struct.pack(">iihh", 3, 100000, 7, 6))  # sampSize % 4 != 0
    with pytest.raises(ValueError, match="sampSize"):
        read_htk(p)
    p.write_bytes(struct.pack(">iihh", -1, 100000, 8, 6) + b"\x00" * 32)
    with pytest.raises(ValueError, match="nSamples"):
        read_htk(p)
    p.write_bytes(struct.pack(">iihh", 10, 100000, 8, 6) + b"\x00" * 8)
    with pytest.raises(ValueError, match="data bytes"):
        read_htk(p)


def test_shard_writer_htk(tmp_path):
    cfg = named_config("classic13")
    w = ShardWriter(tmp_path, cfg, fmt="htk")
    ids = ["/corpus/a/utt.wav", "/corpus/b/utt.wav"]  # same stem, no collision
    feats = [RNG.standard_normal((10, 13)).astype(np.float32),
             RNG.standard_normal((4, 13)).astype(np.float32)]
    w.write("s0", ids, feats)
    meta = w.marker_meta("s0")
    assert meta["format"] == "htk" and len(meta["files"]) == 2
    assert len(set(meta["files"])) == 2
    perm = energy_last_permutation(cfg)
    for f, want in zip(meta["files"], feats):
        got, _ = read_htk(tmp_path / f)
        np.testing.assert_array_equal(got, want[:, perm])
    assert w.is_done("s0", ids)
    assert not w.is_done("s0", ids[::-1])  # fingerprint mismatch
    # an npz-format writer must not treat the htk marker as done
    assert not ShardWriter(tmp_path, cfg, fmt="npz").is_done("s0", ids)


def test_cli_format_htk(tmp_path):
    cfg = named_config("classic13")
    wavs, sigs = [], {}
    for i in range(3):
        p = tmp_path / f"u{i}.wav"
        x = (RNG.standard_normal(8000 + 640 * i) * 3000).astype(np.int16)
        scipy.io.wavfile.write(p, 16000, x)
        wavs.append(p)
        sigs[p.stem] = x.astype(np.float64)
    out = tmp_path / "out"
    argv = ["extract", *map(str, wavs), "--config", "classic13",
            "-o", str(out), "--format", "htk", "--backend", "jnp",
            "--batch-size", "4", "--threads", "2"]
    assert cli_entry(argv) == 0
    files = sorted(out.glob("*.htk"))
    assert len(files) == 3
    assert list((out / "done").glob("*.json"))  # markers written
    by_stem = {f.name.rsplit("-", 1)[0]: f for f in files}
    perm = energy_last_permutation(cfg)
    for w in wavs:
        want = ref.extract(sigs[w.stem], cfg)[:, perm]
        got, meta = read_htk(by_stem[w.stem])
        assert meta["parm_kind_str"] == "MFCC_E"
        assert meta["sample_period_100ns"] == 100000
        np.testing.assert_allclose(
            got, want, atol=FEATURE_ATOL_FP32, rtol=FEATURE_RTOL
        )
    # resume: a second run rewrites nothing
    mtimes = {f: f.stat().st_mtime_ns for f in files}
    assert cli_entry(argv) == 0
    assert {f: f.stat().st_mtime_ns for f in files} == mtimes


def test_cli_htk_long_split(tmp_path):
    # long utterances go through the split/stitch path and then the same
    # fmt-aware writer: one HTK file for the full stitched length
    cfg = named_config("classic13")
    n = 16000 * 5 + 333  # > --max-len-s 2.0 -> long-split
    x = (RNG.standard_normal(n) * 2000).astype(np.int16)
    p = tmp_path / "long.wav"
    scipy.io.wavfile.write(p, 16000, x)
    out = tmp_path / "out"
    rc = cli_entry(["extract", str(p), "--config", "classic13", "-o", str(out),
                    "--format", "htk", "--backend", "jnp",
                    "--max-len-s", "2.0"])
    assert rc == 0
    files = list(out.glob("*.htk"))
    assert len(files) == 1
    got, meta = read_htk(files[0])
    assert meta["num_frames"] == cfg.num_frames(n)
    want = ref.extract(x.astype(np.float64), cfg)[:, energy_last_permutation(cfg)]
    np.testing.assert_allclose(got, want, atol=FEATURE_ATOL_FP32,
                               rtol=FEATURE_RTOL)


def test_cli_htk_rejects_global_cmvn(tmp_path):
    p = tmp_path / "u.wav"
    scipy.io.wavfile.write(p, 16000, np.zeros(4000, np.int16))
    rc = cli_entry(["extract", str(p), "--config", "classic13_deltas_gcmvn",
                    "-o", str(tmp_path / "o"), "--format", "htk",
                    "--backend", "jnp"])
    assert rc == 2
