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

from mfcc_tpu.config import (FrontendConfig, config_with_overrides,
                             named_config, NAMED_CONFIGS)

__version__ = "0.1.0"


def extract(source, config="classic13", backend=None):
    """One-call convenience: wav path / bytes / sample array → features.

    Returns a float32 [F, feat_dim] array of valid frames. backend=None
    picks the fused Pallas kernel on TPU and the jnp chain elsewhere (the
    Pallas interpreter off-TPU takes minutes per utterance). For batched or
    streaming extraction use mfcc_tpu.ops.chain.extract_batch /
    mfcc_tpu.io.stream_batches (or the CLI), which amortize compilation
    across utterances.
    """
    import numpy as np

    from mfcc_tpu.ops import chain

    cfg = named_config(config) if isinstance(config, str) else config
    if backend is None:
        import jax

        backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
        if chain.pallas_unsupported_reason(cfg):  # future-knob escape hatch
            backend = "jnp"
    expect_sr = cfg.input_sample_rate or cfg.sample_rate
    if isinstance(source, (str, bytes)) or hasattr(source, "__fspath__"):
        from mfcc_tpu.io import decode_wav_bytes, read_wav

        if isinstance(source, bytes):
            sr, samples = decode_wav_bytes(source)
        else:
            sr, samples = read_wav(source)
        if sr != expect_sr:
            raise ValueError(
                f"wav is {sr} Hz but config {cfg.config_hash()} expects "
                f"{expect_sr} Hz; pick a matching config or resample"
            )
    else:
        samples = np.asarray(source)
    samples = samples.astype(np.float64)
    # very long audio: segment/stitch extraction (frame-exact — see
    # pipeline.longform) instead of compiling one XLA program per length
    if samples.shape[0] > 60 * expect_sr:
        from mfcc_tpu.pipeline import extract_long

        return extract_long(samples, cfg, backend=backend)
    return chain.extract_single(samples, cfg, backend=backend)


__all__ = [
    "FrontendConfig", "config_with_overrides", "named_config",
    "NAMED_CONFIGS", "extract", "__version__",
    "compat",  # tutorial-lineage API surface (mfcc/fbank/logfbank/ssc/...)
]


def __getattr__(name):
    # lazy: keep `import mfcc_tpu` free of the compat module unless used
    if name == "compat":
        import mfcc_tpu.compat as compat

        return compat
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
