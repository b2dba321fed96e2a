from . import diffusion, fused_sampler, gan, permuter, sampling, signal  # noqa: F401
