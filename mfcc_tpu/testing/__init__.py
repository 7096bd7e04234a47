"""Golden vectors and tolerance gates (SURVEY.md §4.2)."""

from mfcc_tpu.testing.golden import (  # noqa: F401
    GOLDEN_DIR,
    golden_signals,
    generate_goldens,
    load_golden,
)
