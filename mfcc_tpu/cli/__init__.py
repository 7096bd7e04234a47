"""Command-line interface (the reference's L3 driver loop, rebuilt as a
streaming, sharded, resumable pipeline — SURVEY.md §3.4)."""

from mfcc_tpu.cli.main import main  # noqa: F401
