from samble_tpu.models.factories import make_attention_layer, make_downsample, make_upsample
from samble_tpu.models.cls_model import ClsModel
from samble_tpu.models.seg_model import SegModel

__all__ = [
    "ClsModel",
    "SegModel",
    "make_attention_layer",
    "make_downsample",
    "make_upsample",
]
