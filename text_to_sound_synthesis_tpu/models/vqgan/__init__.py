from .modules import AttnBlock, Decoder, Downsample, Encoder, ResnetBlock, Upsample
from .quantize import VectorQuantizer
from .model import VQModel, VQNoDiscModel, VQSegmentationModel
