from .tokenizer import ClipBPETokenizer, find_default_bpe
from .text_model import ClipTextEncoder, CLIPTextEmbedding
from .tokenize import Tokenize
from .vision_model import ClipVisionEncoder
