"""samble_tpu — a TPU-native (JAX/XLA/Pallas/pjit) point-cloud learning framework.

A ground-up rebuild of the capabilities of stevenczwu/SAMBLE (CVPR'25;
successor of APES, CVPR'23): attention-based shape-specific point-cloud
sampling with learnable score bins, plus the ModelNet40 classification and
ShapeNet part-segmentation workloads built on top of it.

Design principles (TPU-first, not a port):
  * channels-last ``(B, N, C)`` tensors everywhere — the channel dim maps to
    TPU lanes and matmul contractions run on the MXU;
  * pure functions + explicit state (params / batch stats / bin boundaries /
    RNG keys) threaded through one jitted train step;
  * static shapes everywhere — the reference's ragged per-bin multinomial
    sampling is re-expressed as masked dense Gumbel-top-k;
  * data parallelism via ``jax.sharding.Mesh`` + NamedSharding under jit:
    cross-replica BatchNorm moments and the in-forward bin-boundary sync
    (reference: ``utils/ops.py:191-199`` all_reduce) fall out of XLA's
    global-view semantics instead of hand-written NCCL calls;
  * Pallas kernels for the hot loops (fused kNN, fused attention scoring)
    with pure-XLA fallbacks that also serve as differential-test oracles.
"""

__version__ = "0.1.0"

from samble_tpu import ops  # noqa: F401
