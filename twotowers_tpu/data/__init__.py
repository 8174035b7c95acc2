"""Host-side data layer: triplet datasets, static-shape batching, factory.

TPU-first replacement for the reference's ``twotower/dataset.py`` +
``dataset_factory/`` (see SURVEY.md §2.1/§2.2): everything that reaches the
device is a statically shaped ``int32`` array; ragged text handling stays on
the host. The final short batch is zero-padded to the fixed batch size and
masked with per-sample weights so jit never sees a new shape.
"""

from .batching import Batch, iterate_batches, num_batches, prefetch_to_device
from .triplets import TripletDataset, pairs_to_triplets

__all__ = [
    "Batch",
    "TripletDataset",
    "iterate_batches",
    "num_batches",
    "pairs_to_triplets",
    "prefetch_to_device",
]
