"""Model zoo. Importing this package registers every config target."""

from . import (  # noqa: F401
    captioner,
    clip,
    diffusion,
    discriminator,
    gpt,
    lpaps,
    melception,
    melgan,
    vqgan,
)
from .diffsound import Diffsound, build_model  # noqa: F401
from .vqgan.modules1d import VQModel1d  # noqa: F401
