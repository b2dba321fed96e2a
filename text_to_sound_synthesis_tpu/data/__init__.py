from .transforms import CropSpec
from .datasets import CapsDataset, AudiosetDataset, ArrayDataset
from .loader import ShardedLoader, build_dataloader
