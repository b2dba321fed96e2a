from .model import GPT, GPTClass, GPTFeats, GPTFeatsClass, RNNEmbedder, ar_sample
from .net2net import Net2NetTransformer
