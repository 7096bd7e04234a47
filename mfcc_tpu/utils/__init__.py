"""Shared utilities: structured metrics/logging (SURVEY.md §5)."""

from mfcc_tpu.utils.metrics import MetricsLogger, Timer  # noqa: F401
