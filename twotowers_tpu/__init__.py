"""twotowers_tpu — a TPU-native two-tower retrieval framework.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of the
PyTorch reference ``k0r1g/two-towers`` (see SURVEY.md): config-driven
five-stage training (tokenise -> embed -> encode -> loss -> train), an MS
MARCO + synthetic data factory, IR evaluation, a dense retrieval index with a
fused Pallas score+top-k engine, sharded multi-chip training (data-parallel
towers, row-sharded vocab embeddings, cross-replica global negatives), and
serving/reporting/hub layers.
"""

__version__ = "0.1.0"

from .models import (
    EmbeddingSpec,
    LossDef,
    TowerSpec,
    TwoTowerSpec,
    build_loss,
    encode,
    forward,
    init_two_tower,
    spec_from_config,
)
from .tokenizers import BaseTokenizer, CharTokenizer, WordTokenizer, build_tokenizer
from .utils import Timer, load_config, save_config, setup_logging

__all__ = [
    "BaseTokenizer",
    "CharTokenizer",
    "EmbeddingSpec",
    "LossDef",
    "Timer",
    "TowerSpec",
    "TwoTowerSpec",
    "WordTokenizer",
    "build_loss",
    "build_tokenizer",
    "encode",
    "forward",
    "init_two_tower",
    "load_config",
    "save_config",
    "setup_logging",
    "spec_from_config",
]
