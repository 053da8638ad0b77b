"""Neural modules (flax.linen), channels-last.

Parity map to the reference:
  * ``EdgeConv``, ``STN``                  — models/embedding.py
  * ``Neighbor2PointAttention``,
    ``Point2PointAttention``               — models/attention.py
  * ``DownSampleToken`` (SAMBLE),
    ``DownSampleCarve`` (APES-v2),
    ``DownSampleLocal``, ``DownSampleGlobal`` (APES) — models/downsample.py
  * ``UpSampleCrossAttention`` (crossA),
    ``UpSampleSelfAttention`` (selfA),
    ``UpSampleInterpolation``              — models/upsample.py
"""

from samble_tpu.nn.common import PointBatchNorm, leaky_relu
from samble_tpu.nn.embedding import EdgeConv, STN
from samble_tpu.nn.attention import Neighbor2PointAttention, Point2PointAttention
from samble_tpu.nn.downsample import (
    DownSampleToken,
    DownSampleCarve,
    DownSampleLocal,
    DownSampleGlobal,
)
from samble_tpu.nn.upsample import (
    UpSampleCrossAttention,
    UpSampleSelfAttention,
    UpSampleInterpolation,
)

__all__ = [
    "PointBatchNorm",
    "leaky_relu",
    "EdgeConv",
    "STN",
    "Neighbor2PointAttention",
    "Point2PointAttention",
    "DownSampleToken",
    "DownSampleCarve",
    "DownSampleLocal",
    "DownSampleGlobal",
    "UpSampleCrossAttention",
    "UpSampleSelfAttention",
    "UpSampleInterpolation",
]
