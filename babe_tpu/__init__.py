"""babe_tpu — TPU-native zero-shot blind audio bandwidth extension framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of eloimoliner/BABE
(see SURVEY.md): CQT-domain diffusion (CQTDiff+), EDM diffusion parameterization,
posterior samplers for audio inverse problems (inpainting, informed BWE, the BABE
blind sampler with joint filter estimation), long-form chunked restoration, and a
denoise->BWE chain — all built TPU-first (static shapes, lax.scan loops,
NamedSharding data parallelism, host-side filter design baked into jit constants).
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy: `from babe_tpu import BABE` without importing jax/flax at
    # package-import time (keeps `import babe_tpu` cheap for config-only use)
    if name == "BABE":
        from babe_tpu.api import BABE

        return BABE
    raise AttributeError(f"module 'babe_tpu' has no attribute {name!r}")
