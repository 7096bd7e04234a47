"""Data-parallel execution over a TPU device mesh (SURVEY.md §2.3).

The model is tiny (largest constant: 257×26 mel matrix), so the only
parallelism that exists is DP over utterances: a 1-D ``Mesh(("data",))``,
batches sharded on the leading axis, per-host file-list sharding for I/O,
and exactly one collective in the hot path — the reduction of global-CMVN
moment triples (Σx, Σx², n), which pjit inserts automatically for the
global sums in ``cmvn.batch_moments``.
"""

from mfcc_tpu.parallel.mesh import data_mesh, distributed_init  # noqa: F401
from mfcc_tpu.parallel.extract import (  # noqa: F401
    sharded_extract_batch,
    sharded_extract_steps,
)
from mfcc_tpu.parallel.cmvn import (  # noqa: F401
    CmvnAccumulator,
    CmvnStats,
    SpeakerCmvnAccumulator,
    apply_cmvn,
    batch_moments,
    is_speaker_stats,
    read_utt2spk,
    speaker_of,
    utterance_moments,
)
