from mfcc_tpu.pipeline.batch import (  # noqa: F401
    Batch,
    bucket_for,
    device_layout,
    layout_kind,
    make_buckets,
    pad_batch,
    required_samples,
    resample_layout,
)
from mfcc_tpu.pipeline.longform import (  # noqa: F401
    extract_long,
    long_moments,
    segment_plan,
)
from mfcc_tpu.pipeline.serving import MultiStreamExtractor  # noqa: F401
from mfcc_tpu.pipeline.streaming import (  # noqa: F401
    StreamingExtractor,
    stream_features,
)
