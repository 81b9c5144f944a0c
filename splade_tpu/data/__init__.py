from splade_tpu.data.loader import TripletDataset, load_training_data
from splade_tpu.data.collator import TripletCollator
from splade_tpu.data.pipeline import create_dataloader, ShardedBatchIterator

__all__ = [
    "TripletDataset",
    "load_training_data",
    "TripletCollator",
    "create_dataloader",
    "ShardedBatchIterator",
]
