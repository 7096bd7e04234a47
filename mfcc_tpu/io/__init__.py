"""Host I/O: wav decode (C++ fast path + numpy twin), threaded feed
pipeline, shard writers with resume manifests (SURVEY.md §1.2 io/ layer)."""

from mfcc_tpu.io.wav import (  # noqa: F401
    WavError,
    decode_wav_bytes,
    decode_wav_into,
    parse_wav_header,
    read_wav,
    write_wav,
)
from mfcc_tpu.io.reader import (  # noqa: F401
    DecodeStats,
    decode_stream,
    shard_files,
    stream_batches,
    stream_batches_direct,
    stream_batches_mp,
)
from mfcc_tpu.io.dataset import ShardDataset  # noqa: F401
from mfcc_tpu.io.htk import read_htk, write_htk  # noqa: F401
from mfcc_tpu.io.kaldi import ArkWriter, read_ark, read_scp  # noqa: F401
from mfcc_tpu.io.writer import ShardWriter, read_shard, trim_batch  # noqa: F401
