"""babe_tpu — TPU-native zero-shot blind audio bandwidth extension framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of eloimoliner/BABE
(see SURVEY.md): CQT-domain diffusion (CQTDiff+), EDM diffusion parameterization,
posterior samplers for audio inverse problems (inpainting, informed BWE, the BABE
blind sampler with joint filter estimation), long-form chunked restoration, and a
denoise->BWE chain — all built TPU-first (static shapes, lax.scan loops,
NamedSharding data parallelism, host-side filter design baked into jit constants).
"""

__version__ = "0.1.0"
