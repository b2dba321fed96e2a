from .vggishish import VGGishish
from .lpaps import LPAPS
