"""I/O layer: C++ decoder == numpy twin byte-for-byte, scipy agreement,
corrupt-file resilience, bucketed streaming, shard write/resume."""

import json
import struct

import numpy as np
import pytest

from mfcc_tpu.config import NAMED_CONFIGS
from mfcc_tpu.io import (
    DecodeStats,
    ShardWriter,
    WavError,
    decode_wav_bytes,
    read_shard,
    read_wav,
    shard_files,
    stream_batches,
    trim_batch,
    write_wav,
)
from mfcc_tpu.io.wav import _decode_numpy, _native


def _pcm16_bytes(sr, samples, channels=1):
    x = np.asarray(samples).astype("<i2")
    data = x.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, channels, sr, sr * 2 * channels, 2 * channels, 16
    )
    hdr += b"data" + struct.pack("<I", len(data))
    return hdr + data


def test_native_available():
    assert _native() is not None, "C++ wav decoder failed to build"


def test_pcm16_native_equals_numpy_and_scipy(tmp_path):
    import scipy.io.wavfile

    g = np.random.default_rng(0)
    x = (g.standard_normal(12345) * 8000).astype(np.int16)
    p = tmp_path / "x.wav"
    scipy.io.wavfile.write(p, 16000, x)
    sr_n, a = read_wav(p, native=True)
    sr_p, b = read_wav(p, native=False)
    assert sr_n == sr_p == 16000
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, x.astype(np.float32))  # raw int16 values


@pytest.mark.parametrize("bits,dtype_write", [(32, "<i4"), (8, "u1")])
def test_other_pcm_widths(bits, dtype_write):
    g = np.random.default_rng(1)
    n = 1000
    if bits == 32:
        raw = (g.standard_normal(n) * 2**28).astype("<i4")
        body = raw.tobytes()
        want = raw.astype(np.float32) / 65536.0
    else:
        raw = g.integers(0, 256, n).astype("u1")
        body = raw.tobytes()
        want = (raw.astype(np.float32) - 128.0) * 256.0
    hdr = b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, 16000, 16000 * bits // 8, bits // 8, bits
    )
    hdr += b"data" + struct.pack("<I", len(body))
    for native in (True, False):
        sr, x = decode_wav_bytes(hdr + body, native=native)
        np.testing.assert_array_equal(x, want)


def test_float32_wav_and_stereo_downmix():
    g = np.random.default_rng(2)
    x = g.standard_normal((500, 2)).astype("<f4") * 0.5
    body = x.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 3, 2, 16000, 16000 * 8, 8, 32)
    hdr += b"data" + struct.pack("<I", len(body))
    for native in (True, False):
        sr, first = decode_wav_bytes(hdr + body, downmix="first", native=native)
        sr, mean = decode_wav_bytes(hdr + body, downmix="mean", native=native)
        np.testing.assert_allclose(first, x[:, 0] * 32768.0, rtol=1e-6)
        np.testing.assert_allclose(mean, x.mean(axis=1) * 32768.0, rtol=1e-5)


def test_pcm24():
    vals = np.array([0, 1, -1, 8388607, -8388608, 123456], dtype=np.int64)
    body = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    hdr = b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 44100, 44100 * 3, 3, 24)
    hdr += b"data" + struct.pack("<I", len(body))
    want = vals.astype(np.float32) / 256.0
    for native in (True, False):
        sr, x = decode_wav_bytes(hdr + body, native=native)
        assert sr == 44100
        np.testing.assert_array_equal(x, want)


@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"RIFFxxxx",
        b"NOPE" + b"\0" * 100,
        b"RIFF" + struct.pack("<I", 4) + b"WAVE",  # no chunks
        _pcm16_bytes(16000, np.zeros(4))[:30],  # truncated mid-fmt
    ],
)
def test_corrupt_raises_both_paths(data):
    for native in (True, False):
        with pytest.raises((WavError, ValueError)):
            decode_wav_bytes(data, native=native)


def test_write_read_roundtrip(tmp_path):
    g = np.random.default_rng(3)
    x = (g.standard_normal(4567) * 5000).astype(np.int16)
    p = tmp_path / "rt.wav"
    write_wav(p, 8000, x)
    sr, back = read_wav(p)
    assert sr == 8000
    np.testing.assert_array_equal(back, x.astype(np.float32))


def test_stream_batches_with_corrupt_files(tmp_path):
    cfg = NAMED_CONFIGS["classic13"]
    g = np.random.default_rng(4)
    paths = []
    for i, n in enumerate([4000, 50000, 120000, 9000, 70000]):
        p = tmp_path / f"u{i}.wav"
        write_wav(p, 16000, (g.standard_normal(n) * 1000).astype(np.int16))
        paths.append(p)
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"RIFF garbage not a wav")
    paths.insert(2, bad)
    missing = tmp_path / "missing.wav"
    paths.append(missing)

    stats = DecodeStats()
    batches = list(
        stream_batches(paths, cfg, batch_size=4, max_len_s=10.0, stats=stats)
    )
    got_ids = [i for b in batches for i in b.ids if i is not None]
    assert sorted(str(p) for p in got_ids) == sorted(
        str(p) for p in paths if p not in (bad, missing)
    )
    assert stats.errors == 2
    assert stats.decoded == 5
    # batch rows are padded to batch_size for shape stability
    assert all(b.audio.shape[0] == 4 for b in batches)


def test_stream_batches_truncates_overlong(tmp_path):
    """long_mode="truncate" clips to the top bucket (round-1 behaviour)."""
    cfg = NAMED_CONFIGS["classic13"]
    p = tmp_path / "long.wav"
    write_wav(p, 16000, np.zeros(16000 * 13, dtype=np.int16))
    stats = DecodeStats()
    batches = list(stream_batches([p], cfg, batch_size=1, max_len_s=10.0,
                                  stats=stats, long_mode="truncate"))
    assert stats.truncated == 1
    assert batches[0].lengths[0] <= 10.1 * 16000


def test_stream_batches_defers_overlong_by_default(tmp_path):
    """Default long_mode="defer": over-long files are NOT truncated; their
    paths are recorded for the split/stitch path (VERDICT r1 item 2)."""
    from mfcc_tpu.io import stream_batches_direct

    cfg = NAMED_CONFIGS["classic13"]
    long_p = tmp_path / "long.wav"
    write_wav(long_p, 16000, np.zeros(16000 * 13, dtype=np.int16))
    short_p = tmp_path / "short.wav"
    write_wav(short_p, 16000, np.zeros(8000, dtype=np.int16))
    for fn in (stream_batches, stream_batches_direct):
        stats = DecodeStats()
        batches = list(fn([long_p, short_p], cfg, batch_size=1,
                          max_len_s=10.0, stats=stats))
        assert stats.truncated == 0
        assert stats.long_deferred == 1
        assert stats.long_paths == [long_p]
        ids = [i for b in batches for i in b.ids if i is not None]
        assert ids == [short_p]


def test_shard_files_partition():
    files = list(range(10))
    parts = [shard_files(files, i, 3) for i in range(3)]
    assert sorted(x for p in parts for x in p) == files
    assert all(abs(len(p) - 10 / 3) < 1.5 for p in parts)


def test_shard_writer_resume(tmp_path):
    cfg = NAMED_CONFIGS["classic13"]
    w = ShardWriter(tmp_path / "out", cfg)
    ids = ["a.wav", "b.wav"]
    feats = [np.ones((5, 13), np.float32), np.zeros((3, 13), np.float32)]
    assert not w.is_done("shard0", ids)
    path = w.write("shard0", ids, feats)
    assert w.is_done("shard0", ids)
    back = read_shard(path)
    np.testing.assert_array_equal(back["a.wav"], feats[0])
    np.testing.assert_array_equal(back["b.wav"], feats[1])
    # different inputs or config -> not done
    assert not w.is_done("shard0", ["a.wav", "c.wav"])
    w2 = ShardWriter(tmp_path / "out", cfg.replace(n_mels=40))
    assert not w2.is_done("shard0", ids)


def test_trim_batch():
    feat = np.arange(2 * 4 * 3, dtype=np.float32).reshape(2, 4, 3)
    mask = np.array([[1, 1, 0, 0], [1, 1, 1, 1]], np.float32)
    out = trim_batch(feat, mask)
    assert out[0].shape == (2, 3) and out[1].shape == (4, 3)
    np.testing.assert_array_equal(out[0], feat[0, :2])


def test_decode_wav_into_matches_read(tmp_path):
    from mfcc_tpu.io import decode_wav_into

    g = np.random.default_rng(12)
    x = (g.standard_normal(5000) * 6000).astype(np.int16)
    p = tmp_path / "d.wav"
    write_wav(p, 16000, x)
    data = p.read_bytes()
    for native in (True, False):
        row = np.full(6000, 7.0, dtype=np.float32)
        sr, n = decode_wav_into(data, row, native=native)
        assert (sr, n) == (16000, 5000)
        np.testing.assert_array_equal(row[:5000], x.astype(np.float32))
        np.testing.assert_array_equal(row[5000:], 0.0)  # zero-filled tail
        # truncation to capacity
        small = np.empty(1000, dtype=np.float32)
        sr, n = decode_wav_into(data, small, native=native)
        assert n == 1000
        np.testing.assert_array_equal(small, x[:1000].astype(np.float32))


def test_parse_wav_header(tmp_path):
    from mfcc_tpu.io import parse_wav_header

    p = tmp_path / "h.wav"
    write_wav(p, 22050, np.zeros(777, np.int16))
    assert parse_wav_header(p.read_bytes()) == (22050, 777)
    with pytest.raises((WavError, ValueError)):
        parse_wav_header(b"RIFF garbage")


def test_stream_direct_equals_arrays(tmp_path):
    """The direct decode-into-buffer stream must produce byte-identical
    batches to the arrays path, including error skips and truncation."""
    from mfcc_tpu.io import stream_batches_direct

    cfg = NAMED_CONFIGS["classic13"]
    g = np.random.default_rng(13)
    paths = []
    for i, n in enumerate([4000, 50000, 175000, 9000, 70000, 3000, 22000]):
        p = tmp_path / f"u{i}.wav"
        write_wav(p, 16000, (g.standard_normal(n) * 1000).astype(np.int16))
        paths.append(p)
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"RIFF not a wav")
    paths.insert(3, bad)
    wrong = tmp_path / "wrong.wav"
    write_wav(wrong, 8000, np.zeros(100, np.int16))
    paths.insert(5, wrong)

    s1, s2 = DecodeStats(), DecodeStats()
    a = list(stream_batches(paths, cfg, batch_size=3, max_len_s=10.0, stats=s1,
                            long_mode="truncate"))
    d = list(stream_batches_direct(paths, cfg, batch_size=3, max_len_s=10.0,
                                   stats=s2, long_mode="truncate"))
    assert len(a) == len(d)
    for ba, bd in zip(a, d):
        assert ba.ids == bd.ids
        np.testing.assert_array_equal(ba.lengths, bd.lengths)
        np.testing.assert_array_equal(ba.audio, bd.audio)
    assert (s1.errors, s1.wrong_rate, s1.truncated) == (
        s2.errors, s2.wrong_rate, s2.truncated)
    assert s1.decoded == s2.decoded


def test_cli_feed_direct(tmp_path):
    """CLI --feed direct produces the same shards as --feed arrays."""
    from mfcc_tpu.cli import main as cli_entry

    cfg = NAMED_CONFIGS["classic13"]
    g = np.random.default_rng(14)
    paths = []
    for i, n in enumerate([8000, 23000, 5000]):
        p = tmp_path / f"u{i}.wav"
        write_wav(p, 16000, (g.standard_normal(n) * 2000).astype(np.int16))
        paths.append(str(p))
    for feed in ("arrays", "direct"):
        rc = cli_entry(["extract", *paths, "--config", "classic13", "-o",
                        str(tmp_path / feed), "--backend", "jnp",
                        "--batch-size", "4", "--feed", feed])
        assert rc == 0
    a = {k: v for s in sorted((tmp_path / "arrays").glob("h0-*.npz"))
         for k, v in read_shard(s).items()}
    d = {k: v for s in sorted((tmp_path / "direct").glob("h0-*.npz"))
         for k, v in read_shard(s).items()}
    assert sorted(a) == sorted(d)
    for k in a:
        np.testing.assert_array_equal(a[k], d[k])


def test_wav_decoder_fuzz_never_crashes():
    """Arbitrary and mutated bytes must raise WavError/ValueError (or decode)
    — never crash the process or corrupt memory (both decoder paths)."""
    g = np.random.default_rng(99)
    valid = _pcm16_bytes(16000, (g.standard_normal(300) * 999).astype(np.int16))
    cases = [bytes(g.integers(0, 256, g.integers(0, 200)).astype(np.uint8))
             for _ in range(50)]
    for _ in range(100):
        b = bytearray(valid)
        for _ in range(g.integers(1, 8)):
            b[g.integers(0, len(b))] = g.integers(0, 256)
        cases.append(bytes(b[: g.integers(8, len(b))]))
        cases.append(bytes(b))
    for data in cases:
        for native in (True, False):
            try:
                sr, x = decode_wav_bytes(data, native=native)
                assert x.dtype == np.float32
            except (WavError, ValueError):
                pass


def test_stream_direct_48k_config(tmp_path):
    """Direct feed with a resampling config: 48 kHz buckets, wrong-rate
    (16 kHz) file skipped, batches equal the arrays path."""
    from mfcc_tpu.io import stream_batches_direct

    cfg = NAMED_CONFIGS["mfcc39_48k"]
    g = np.random.default_rng(15)
    paths = []
    for i, n in enumerate([48000, 120000, 24000]):
        p = tmp_path / f"u{i}.wav"
        write_wav(p, 48000, (g.standard_normal(n) * 1000).astype(np.int16))
        paths.append(p)
    wrong = tmp_path / "w16.wav"
    write_wav(wrong, 16000, np.zeros(1000, np.int16))
    paths.insert(1, wrong)

    s1, s2 = DecodeStats(), DecodeStats()
    a = list(stream_batches(paths, cfg, batch_size=2, max_len_s=4.0, stats=s1))
    d = list(stream_batches_direct(paths, cfg, batch_size=2, max_len_s=4.0, stats=s2))
    assert s2.wrong_rate == 1 and s1.wrong_rate == 1
    assert len(a) == len(d)
    for ba, bd in zip(a, d):
        assert ba.ids == bd.ids
        np.testing.assert_array_equal(ba.audio, bd.audio)


def test_stream_mp_equals_direct(tmp_path):
    """The multi-process shared-memory feed must produce byte-identical
    batches to the threaded direct path, including error skips, wrong-rate
    skips, and both row dtypes (VERDICT r1 item 1)."""
    from mfcc_tpu.io import stream_batches_direct, stream_batches_mp

    cfg = NAMED_CONFIGS["classic13"]
    g = np.random.default_rng(17)
    paths = []
    for i, n in enumerate([4000, 50000, 9000, 70000, 3000, 22000, 111000]):
        p = tmp_path / f"u{i}.wav"
        write_wav(p, 16000, (g.standard_normal(n) * 1000).astype(np.int16))
        paths.append(p)
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"RIFF not a wav")
    paths.insert(2, bad)
    wrong = tmp_path / "wrong.wav"
    write_wav(wrong, 8000, np.zeros(100, np.int16))
    paths.insert(5, wrong)

    for dtype in ("i16", "f32"):
        s1, s2 = DecodeStats(), DecodeStats()
        a = list(stream_batches_direct(paths, cfg, batch_size=3,
                                       max_len_s=10.0, stats=s1, dtype=dtype))
        d = list(stream_batches_mp(paths, cfg, batch_size=3,
                                   max_len_s=10.0, stats=s2, dtype=dtype))
        assert len(a) == len(d)
        for ba, bd in zip(a, d):
            assert ba.ids == bd.ids
            np.testing.assert_array_equal(ba.lengths, bd.lengths)
            np.testing.assert_array_equal(np.asarray(ba.audio),
                                          np.asarray(bd.audio))
            bd.release()
        assert (s1.errors, s1.wrong_rate, s1.decoded) == (
            s2.errors, s2.wrong_rate, s2.decoded)


def test_stream_mp_slab_cleanup(tmp_path):
    """Slab files must not accumulate in /dev/shm across streams."""
    import glob as _glob

    from mfcc_tpu.io import stream_batches_mp
    from mfcc_tpu.io.reader import _shm_dir

    cfg = NAMED_CONFIGS["classic13"]
    p = tmp_path / "u.wav"
    write_wav(p, 16000, np.zeros(8000, np.int16))
    for _ in range(2):
        for b in stream_batches_mp([p], cfg, batch_size=2):
            b.release()
    import os as _os

    leftovers = _glob.glob(_os.path.join(_shm_dir(), "mfcc_tpu_slab_*"))
    assert leftovers == []


def test_mp_worker_death_fails_chunk():
    """A dying worker must resolve its in-flight jobs as failures, not hang
    the consumer (SURVEY.md §5 failure-detection row)."""
    from mfcc_tpu.io.reader import _MpPool

    pool = _MpPool(1)
    try:
        # nonexistent slab file: np.memmap raises inside the worker loop,
        # the worker exits, EOF resolves the job with an error
        job = pool.submit({
            "op": "decode_chunk", "slab": "/nonexistent/slab", "shape": [1, 10],
            "dtype": "i16", "blen": 10, "jobs": [[0, "/nonexistent.wav"]],
        })
        assert job.event.wait(timeout=30)
        assert job.error is not None or job.fails
    finally:
        pool.close()


def test_i16_feed_features_match_f32(tmp_path):
    """For PCM16 sources the i16 feed is lossless: features from int16 rows
    equal features from float32 rows bit-for-bit (the cast happens on
    device, values are identical integers)."""
    import jax.numpy as jnp

    from mfcc_tpu.io import stream_batches_direct
    from mfcc_tpu.ops import chain

    cfg = NAMED_CONFIGS["classic13_deltas"]
    g = np.random.default_rng(23)
    paths = []
    for i, n in enumerate([8000, 23000]):
        p = tmp_path / f"u{i}.wav"
        write_wav(p, 16000, (g.standard_normal(n) * 3000).astype(np.int16))
        paths.append(p)
    feats = {}
    for dtype in ("f32", "i16"):
        out = []
        for b in stream_batches_direct(paths, cfg, batch_size=2,
                                       max_len_s=4.0, dtype=dtype):
            f, _ = chain.extract_batch(jnp.asarray(b.audio),
                                       jnp.asarray(b.lengths), cfg,
                                       backend="jnp")
            out.append(np.asarray(f))
        feats[dtype] = out
    assert len(feats["f32"]) == len(feats["i16"])
    for a, b in zip(feats["f32"], feats["i16"]):
        np.testing.assert_array_equal(a, b)
