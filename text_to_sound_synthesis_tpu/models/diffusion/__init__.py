from .embeddings import ContentEmbedding
from .backbone import Text2SpecTransformer
from .process import DiscreteDiffusion, DiffusionLossOutput, sample_tokens
