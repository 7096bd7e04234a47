from mfcc_tpu.pipeline.batch import (  # noqa: F401
    Batch,
    bucket_for,
    make_buckets,
    pad_batch,
    required_samples,
)
