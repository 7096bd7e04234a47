"""Pure-array stage library.

`reference_numpy` is the float64 acceptance oracle (the spec);
`chain` is the jittable jnp implementation that must match it to 1e-4;
`constants` builds the shared host-side matrices (window, mel, DCT, lifter).

Submodules are imported lazily so the numpy-only oracle never pulls in jax.
"""
