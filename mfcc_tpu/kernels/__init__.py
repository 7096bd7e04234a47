"""Pallas TPU kernels — the fused compute path of the front-end.

`frontend.fused_logmel_stages` replaces frame→window→FFT→|·|²→mel→log(+energy)
with ONE Pallas kernel (SURVEY.md §7.1 item 5 fuses K1+K2); its equivalence
twin is the pure-jnp `ops.chain.logmel_stages` (SURVEY.md §4.2 item 5).
"""

from mfcc_tpu.kernels.frontend import fused_logmel_stages  # noqa: F401
