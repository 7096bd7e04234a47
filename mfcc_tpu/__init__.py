"""mfcc_tpu — a TPU-native acoustic feature-extraction front-end.

Brand-new framework (not a port) with the capabilities of the classic MFCC
chain in the reference repo (Robomate/mfcc — see SURVEY.md §0: the reference
mount was empty at survey/build time, so the spec is SURVEY.md Appendix B and
the acceptance oracle is `ops/reference_numpy.py` certified against the
on-disk scipy/TF implementations).

Layers (SURVEY.md §1.2):
    config       frozen FrontendConfig + named configs (the convention matrix)
    ops          pure-jnp stage library (golden-faithful, CPU-runnable)
    kernels      Pallas TPU kernels (frame+window+DFT; mel+log+DCT epilogue)
    pipeline     batched, padded, length-masked extraction graph
    distributed  mesh setup, jax.distributed init, global-CMVN collective
    io           wav decode (C++ fast path), feeding, writers, manifests
    testing      golden vectors + tolerance gates
"""

from mfcc_tpu.config import FrontendConfig, named_config, NAMED_CONFIGS

__version__ = "0.1.0"

__all__ = ["FrontendConfig", "named_config", "NAMED_CONFIGS", "__version__"]
