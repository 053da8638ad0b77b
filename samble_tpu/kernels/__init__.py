"""Pallas TPU kernels for the hot loops, with XLA fallbacks.

Targets (SURVEY.md §3.5):
  1. kNN — computed 3+ times per layer stack (every EdgeConv, every N2P
     layer, every downsampler's neighbor mask).  ``knn.py`` fuses the
     pairwise-distance matmul with an in-VMEM top-k so the (N, N) distance
     matrix never reaches HBM.
  2. SAMBLE attention scoring — ``score.py`` fuses energy → softmax →
     kNN-masked column reduction, so neither the (N, N+nb) attention map
     nor the (N, N) neighbor mask is materialized.  Legal as forward-only
     because gradients never flow through the score (see
     samble_tpu/nn/downsample.py module docstring).

Dispatch: ``use_pallas()`` is True on TPU backends; CPU tests run the
kernels in interpreter mode via the ``interpret=True`` escape hatch in the
differential tests, while production CPU paths use the pure-XLA ops.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax


@lru_cache(maxsize=None)
def use_pallas() -> bool:
    if os.environ.get("SAMBLE_DISABLE_PALLAS", "0") == "1":
        return False
    if os.environ.get("SAMBLE_FORCE_PALLAS", "0") == "1":
        # CPU tests force the kernel-dispatching module paths; combined
        # with interpret_default() the kernels run in interpret mode
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@lru_cache(maxsize=None)
def interpret_default() -> bool:
    """Interpret-mode flag for kernel call sites: real Mosaic lowering only
    on an actual TPU backend (decoupled from use_pallas so
    SAMBLE_FORCE_PALLAS=1 can drive the fused module paths on CPU)."""
    try:
        return jax.default_backend() != "tpu"
    except Exception:
        return True


from samble_tpu.kernels.attn_rows import (  # noqa: E402
    attn_rows,
    attn_rows_pallas,
)
from samble_tpu.kernels.edgeconv import (  # noqa: E402
    edgeconv_knn_pallas,
    edgeconv_pallas,
)
from samble_tpu.kernels.edgeconv_train import edgeconv_train  # noqa: E402
from samble_tpu.kernels.knn import knn_pallas  # noqa: E402
from samble_tpu.kernels.n2p import n2p_attention, n2p_attention_fused  # noqa: E402
from samble_tpu.kernels.p2p import p2p_attention  # noqa: E402
from samble_tpu.kernels.score import (  # noqa: E402
    sparse_attention_score_fused,
    sparse_attention_score_pallas,
)
from samble_tpu.kernels.slab_chain import (  # noqa: E402
    slab_chain,
    slab_chain_knn,
)

__all__ = [
    "use_pallas",
    "attn_rows",
    "attn_rows_pallas",
    "edgeconv_knn_pallas",
    "edgeconv_pallas",
    "edgeconv_train",
    "knn_pallas",
    "n2p_attention",
    "n2p_attention_fused",
    "p2p_attention",
    "sparse_attention_score_fused",
    "sparse_attention_score_pallas",
    "slab_chain",
    "slab_chain_knn",
]
