from .model import GPT, GPTFeats, ar_sample
from .net2net import Net2NetTransformer
