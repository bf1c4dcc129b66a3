from .dataset import (
    RawData,
    FieldData,
    Interactions,
    read_data,
    split_fields,
    trans_y,
    PaddedFields,
    pad_fields,
    pad_labels,
)

__all__ = [
    "RawData",
    "FieldData",
    "Interactions",
    "read_data",
    "split_fields",
    "trans_y",
    "PaddedFields",
    "pad_fields",
    "pad_labels",
]
