from .generator import MelGANGenerator
from .discriminator import MelGANDiscriminator
