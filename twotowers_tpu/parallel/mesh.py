"""Device mesh construction and multi-host initialisation.

The reference trains on a single device with no distributed backend
(SURVEY.md §2.4); this module is the new TPU-native scaling substrate:
``jax.distributed`` for multi-host process groups and a named 2D
``Mesh('data', 'model')`` over which pjit/shard_map place batch and
vocabulary shards. Collectives ride ICI within a slice automatically when
the mesh is built from ``jax.devices()`` order.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

from ..utils.logging import get_logger

logger = get_logger("parallel.mesh")

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialise the multi-host process group (no-op on a single host).

    Mirrors ``jax.distributed.initialize``'s auto-detection on TPU pods;
    explicit args support manual topologies.
    """
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(coordinator_address, num_processes, process_id)
        elif jax.process_count() == 1 and num_processes not in (None, 1):
            jax.distributed.initialize()
    except Exception as exc:  # already initialised or single host
        logger.debug("jax.distributed.initialize skipped: %s", exc)


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    Defaults: all devices on the data axis, model axis 1. The device list
    keeps ``jax.devices()`` order so neighbouring mesh coordinates map to
    ICI-adjacent chips on TPU slices.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs more than the {n} devices available")
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def mesh_shape(mesh: Mesh) -> Tuple[int, int]:
    return mesh.shape[DATA_AXIS], mesh.shape[MODEL_AXIS]


def recommend_model_parallelism(vocab_size: int, embedding_dim: int,
                                max_shards: Optional[int] = None) -> int:
    """Smallest model-axis size that puts the embedding backward in the
    fast regime; spend the remaining devices on the data axis.

    Measured basis (VOCAB_SCALING.json ``sharded_projection``,
    tools/bench_sharded_vocab.py): the trainable word step runs at the
    Pallas VMEM scatter-add floor (~25 ms at the bench shape) whenever the
    per-shard f32 accumulator fits the kernel's VMEM budget, and at the
    ~2.3x slower XLA-scatter fallback otherwise — so a 102,400 x 64 vocab
    wants >=4-way sharding (25,600 rows/shard), while 2-way (51,200 rows)
    buys nothing. More shards than necessary also buy nothing per chip
    (every chip streams the full cotangent stream regardless), so this
    returns the MINIMUM sufficient factor.

    ``max_shards`` defaults to the local device count. Returns a power of
    two <= max_shards; if even max_shards cannot fit the accumulator, the
    largest allowed factor is returned (best available).
    """
    from ..kernels.pallas_scatter_add import scatter_add_supported

    if max_shards is None:
        max_shards = jax.device_count()
    shards = 1
    while not scatter_add_supported(-(-vocab_size // shards), embedding_dim):
        if shards * 2 > max_shards:
            logger.warning(
                "vocab %d x %d does not reach the VMEM scatter regime even "
                "at model=%d; embedding backward will use the XLA fallback",
                vocab_size, embedding_dim, shards)
            break
        shards *= 2
    return shards
