from torchrecsys_tpu.data.encoder import IdEncoder
from torchrecsys_tpu.data.interactions import InteractionStore, prepare_data
from torchrecsys_tpu.data.metadata import MetadataTable, parse_metadata_column
from torchrecsys_tpu.data.sampling import sample_negatives

__all__ = [
    "IdEncoder",
    "InteractionStore",
    "prepare_data",
    "MetadataTable",
    "parse_metadata_column",
    "sample_negatives",
]
