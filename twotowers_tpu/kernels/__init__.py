"""Pallas TPU kernels for the hot ops, with XLA reference paths kept in
``ops/`` for correctness A/B (SURVEY.md §7.1).

Importing this package registers the fused score+top-k kernel with the
``ops.topk_score`` dispatcher, upgrading every index search path.
"""

from ..ops.topk_score import register_pallas_impl
from .pallas_topk import score_topk_pallas

register_pallas_impl(score_topk_pallas)

__all__ = [
    "score_topk_pallas",
]
