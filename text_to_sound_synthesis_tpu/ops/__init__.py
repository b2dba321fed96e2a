from . import diffusion, signal  # noqa: F401
