from .model import Melception
