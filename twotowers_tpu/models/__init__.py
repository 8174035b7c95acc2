"""Functional two-tower model: embeddings, towers, losses."""

from .embeddings import (
    EMBEDDING_REGISTRY,
    EmbeddingSpec,
    embed_ids,
    init_embedding,
)
from .losses import LOSS_REGISTRY, LossDef, build_loss
from .seq_towers import SEQUENCE_ARCHS, is_sequence_arch
from .towers import (
    TOWER_REGISTRY,
    TowerSpec,
    TwoTowerSpec,
    count_params,
    encode,
    forward,
    init_two_tower,
    spec_from_config,
)

__all__ = [
    "EMBEDDING_REGISTRY",
    "EmbeddingSpec",
    "LOSS_REGISTRY",
    "LossDef",
    "SEQUENCE_ARCHS",
    "is_sequence_arch",
    "TOWER_REGISTRY",
    "TowerSpec",
    "TwoTowerSpec",
    "build_loss",
    "count_params",
    "embed_ids",
    "encode",
    "forward",
    "init_embedding",
    "init_two_tower",
    "spec_from_config",
]
