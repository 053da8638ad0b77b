"""Torch ↔ flax checkpoint interop for the reference SAMBLE/APES family.

The reference saves ``torch.save({"model_state_dict": <DDP state_dict>,
"bin_boundaries": [[upper, lower], ...]})`` (train_modelnet.py:491-509) and
converts dynamic bin boundaries to static ones at load time
(test_modelnet.py:161-175).  This module converts such checkpoints — or any
bare ``state_dict`` of the reference models — into this framework's flax
variable collections (``params`` / ``batch_stats`` / ``bin_stats``) so
published reference weights can be evaluated and served here, and so the
parity tests (tests/test_reference_parity.py) can drive both frameworks
with identical weights.

Layout conventions translated:
  * torch ``Conv1d/Conv2d(kernel_size=1, bias=False)`` weight
    ``(C_out, C_in, 1[, 1])`` → flax ``Dense`` kernel ``(C_in, C_out)``.
  * torch ``Linear`` weight ``(C_out, C_in)`` → kernel ``(C_in, C_out)``.
  * torch BatchNorm ``weight/bias/running_mean/running_var`` → flax
    ``BatchNorm`` ``scale/bias`` params + ``mean/var`` batch stats.
  * ``bin_tokens`` ``(1, C, num_bins)`` → ``(num_bins, C)``.
  * checkpoint ``bin_boundaries`` pairs ``[(1,1,1,nb) upper, lower]`` →
    the ``(nb - 1,)`` inner-boundary ``bin_stats`` array
    (upper[0,0,0,1:] — utils/ops.py:216-233).

Head-split parity: both sides split channels head-major (channel c → head
c // depth), so no per-head reordering is needed (models/attention.py:195-201
vs nn/common.py:split_heads).
"""

from __future__ import annotations

from typing import Any, Mapping, Optional

import numpy as np


# --------------------------------------------------------------------------
# leaf converters
# --------------------------------------------------------------------------

def _np(t) -> np.ndarray:
    """torch tensor / array-like → float32 numpy (no torch import needed)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def conv_kernel(w) -> np.ndarray:
    """(C_out, C_in, 1[, 1]) conv weight → (C_in, C_out) Dense kernel."""
    w = _np(w)
    w = w.reshape(w.shape[0], w.shape[1])
    return np.ascontiguousarray(w.T)


def linear_kernel(w) -> np.ndarray:
    """(C_out, C_in) Linear weight → (C_in, C_out) Dense kernel."""
    return np.ascontiguousarray(_np(w).T)


def _bn_params(sd: Mapping[str, Any], p: str) -> dict:
    return {"BatchNorm_0": {"scale": _np(sd[f"{p}.weight"]),
                            "bias": _np(sd[f"{p}.bias"])}}


def _bn_stats(sd: Mapping[str, Any], p: str) -> dict:
    return {"BatchNorm_0": {"mean": _np(sd[f"{p}.running_mean"]),
                            "var": _np(sd[f"{p}.running_var"])}}


def _dense(sd, key_w: str, key_b: Optional[str] = None) -> dict:
    d = {"kernel": linear_kernel(sd[key_w])}
    if key_b is not None and key_b in sd:
        d["bias"] = _np(sd[key_b])
    return d


def _conv1x1(sd, key_w: str) -> dict:
    return {"Dense_0": {"kernel": conv_kernel(sd[key_w])}}


# --------------------------------------------------------------------------
# per-module subtree converters — each returns (params, batch_stats)
# --------------------------------------------------------------------------

def edgeconv_tree(sd: Mapping[str, Any], p: str):
    """Reference ``EdgeConv`` (models/embedding.py:7-39) → nn.EdgeConv."""
    params = {
        "conv1_kernel": conv_kernel(sd[f"{p}conv1.0.weight"]),
        "PointBatchNorm_0": _bn_params(sd, f"{p}conv1.1"),
        "ConvBNLeaky_0": {
            "Conv1x1_0": _conv1x1(sd, f"{p}conv2.0.weight"),
            "PointBatchNorm_0": _bn_params(sd, f"{p}conv2.1"),
        },
    }
    stats = {
        "PointBatchNorm_0": _bn_stats(sd, f"{p}conv1.1"),
        "ConvBNLeaky_0": {"PointBatchNorm_0": _bn_stats(sd, f"{p}conv2.1")},
    }
    return params, stats


def stn_tree(sd: Mapping[str, Any], p: str):
    """Reference ``STN`` (models/embedding.py:42-97) → nn.STN."""
    params = {
        "ConvBNLeaky_0": {"Conv1x1_0": _conv1x1(sd, f"{p}conv1.0.weight"),
                          "PointBatchNorm_0": _bn_params(sd, f"{p}conv1.1")},
        "ConvBNLeaky_1": {"Conv1x1_0": _conv1x1(sd, f"{p}conv2.0.weight"),
                          "PointBatchNorm_0": _bn_params(sd, f"{p}conv2.1")},
        "ConvBNLeaky_2": {"Conv1x1_0": _conv1x1(sd, f"{p}conv3.0.weight"),
                          "PointBatchNorm_0": _bn_params(sd, f"{p}conv3.1")},
        "Conv1x1_0": _conv1x1(sd, f"{p}linear1.0.weight"),
        "PointBatchNorm_0": _bn_params(sd, f"{p}linear1.1"),
        "Conv1x1_1": _conv1x1(sd, f"{p}linear2.0.weight"),
        "PointBatchNorm_1": _bn_params(sd, f"{p}linear2.1"),
        "Dense_0": _dense(sd, f"{p}transform.weight", f"{p}transform.bias"),
    }
    stats = {
        "ConvBNLeaky_0": {"PointBatchNorm_0": _bn_stats(sd, f"{p}conv1.1")},
        "ConvBNLeaky_1": {"PointBatchNorm_0": _bn_stats(sd, f"{p}conv2.1")},
        "ConvBNLeaky_2": {"PointBatchNorm_0": _bn_stats(sd, f"{p}conv3.1")},
        "PointBatchNorm_0": _bn_stats(sd, f"{p}linear1.1"),
        "PointBatchNorm_1": _bn_stats(sd, f"{p}linear2.1"),
    }
    return params, stats


def attention_tree(sd: Mapping[str, Any], p: str):
    """Reference ``Neighbor2PointAttention`` / ``Point2PointAttention``
    (models/attention.py:130-355) → nn.Neighbor2PointAttention /
    nn.Point2PointAttention (identical q/k/v + ff + bn1/bn2 layout)."""
    params = {
        "Conv1x1_0": _conv1x1(sd, f"{p}q_conv.weight"),
        "Conv1x1_1": _conv1x1(sd, f"{p}k_conv.weight"),
        "Conv1x1_2": _conv1x1(sd, f"{p}v_conv.weight"),
        "Conv1x1_3": _conv1x1(sd, f"{p}ff.0.weight"),
        "Conv1x1_4": _conv1x1(sd, f"{p}ff.2.weight"),
        "PointBatchNorm_0": _bn_params(sd, f"{p}bn1"),
        "PointBatchNorm_1": _bn_params(sd, f"{p}bn2"),
    }
    stats = {
        "PointBatchNorm_0": _bn_stats(sd, f"{p}bn1"),
        "PointBatchNorm_1": _bn_stats(sd, f"{p}bn2"),
    }
    return params, stats


def downsample_token_tree(sd: Mapping[str, Any], p: str):
    """Reference ``DownSampleToken`` (models/downsample.py:15-378) →
    nn.DownSampleToken.  Call order there: k_proj, v_proj, q_proj
    (nn/downsample.py:127-147), hence the Conv1x1 numbering."""
    tokens = _np(sd[f"{p}bin_tokens"])  # (1, C, n_tok)
    params = {
        "bin_tokens": np.ascontiguousarray(tokens[0].T),  # (n_tok, C)
        "Conv1x1_0": _conv1x1(sd, f"{p}k_conv.weight"),
        "Conv1x1_1": _conv1x1(sd, f"{p}v_conv.weight"),
        "Conv1x1_2": _conv1x1(sd, f"{p}q_conv.weight"),
    }
    stats: dict = {}
    if f"{p}bn1.weight" in sd:  # res link enabled
        params["PointBatchNorm_0"] = _bn_params(sd, f"{p}bn1")
        stats["PointBatchNorm_0"] = _bn_stats(sd, f"{p}bn1")
        if f"{p}bn2.weight" in sd:  # ff enabled
            params["Conv1x1_3"] = _conv1x1(sd, f"{p}ffn.0.weight")
            params["Conv1x1_4"] = _conv1x1(sd, f"{p}ffn.2.weight")
            params["PointBatchNorm_1"] = _bn_params(sd, f"{p}bn2")
            stats["PointBatchNorm_1"] = _bn_stats(sd, f"{p}bn2")
    return params, stats


def downsample_apes_tree(sd: Mapping[str, Any], p: str, *,
                         res: bool = False, ff: bool = False,
                         pe: bool = False, pe_mode: str = "III"):
    """Reference ``DownSampleCarve`` / ``DownSampleLocal`` /
    ``DownSampleGlobal`` (models/downsample.py:381,818,1232) →
    nn.DownSampleCarve / Local / Global.

    All three share the q/k/v conv trio (reference ``q_conv/k_conv/v_conv``;
    flax call order q→Conv1x1_0, k→Conv1x1_1, v→Conv1x1_2).  Carve's
    optional positional-encoding convs follow (our call order: q_pe, v_pe,
    then k_pe for mode IV — nn/downsample.py:357-367), then the optional
    res-link BN/ffn (``_res_block``: PointBatchNorm_0, Conv1x1 512,
    Conv1x1 C, PointBatchNorm_1)."""
    params = {
        "Conv1x1_0": _conv1x1(sd, f"{p}q_conv.weight"),
        "Conv1x1_1": _conv1x1(sd, f"{p}k_conv.weight"),
        "Conv1x1_2": _conv1x1(sd, f"{p}v_conv.weight"),
    }
    stats: dict = {}
    nxt = 3
    if pe:
        params[f"Conv1x1_{nxt}"] = _conv1x1(sd, f"{p}q_pe_conv.weight")
        params[f"Conv1x1_{nxt + 1}"] = _conv1x1(sd, f"{p}v_pe_conv.weight")
        nxt += 2
        if pe_mode == "IV":
            params[f"Conv1x1_{nxt}"] = _conv1x1(sd, f"{p}k_pe_conv.weight")
            nxt += 1
    if res:
        params["PointBatchNorm_0"] = _bn_params(sd, f"{p}bn1")
        stats["PointBatchNorm_0"] = _bn_stats(sd, f"{p}bn1")
        if ff:
            params[f"Conv1x1_{nxt}"] = _conv1x1(sd, f"{p}ffn.0.weight")
            params[f"Conv1x1_{nxt + 1}"] = _conv1x1(sd, f"{p}ffn.2.weight")
            params["PointBatchNorm_1"] = _bn_params(sd, f"{p}bn2")
            stats["PointBatchNorm_1"] = _bn_stats(sd, f"{p}bn2")
    return params, stats


def upsample_attention_tree(sd: Mapping[str, Any], p: str):
    """Reference ``UpSample`` (crossA, models/upsample.py:8-65) /
    ``UpSampleSelfAttention`` (:68-133) → nn.UpSampleCrossAttention /
    nn.UpSampleSelfAttention.  Both are the q/k/v trio plus the
    ``skip_link`` conv (flax call order: q, k, v, skip → Conv1x1_0..3)."""
    params = {
        "Conv1x1_0": _conv1x1(sd, f"{p}q_conv.weight"),
        "Conv1x1_1": _conv1x1(sd, f"{p}k_conv.weight"),
        "Conv1x1_2": _conv1x1(sd, f"{p}v_conv.weight"),
        "Conv1x1_3": _conv1x1(sd, f"{p}skip_link.weight"),
    }
    return params, {}


_DS_MODULE_NAME = {
    "token": "DownSampleToken",
    "global_carve": "DownSampleCarve",
    "local": "DownSampleLocal",
    "global": "DownSampleGlobal",
}


def _import_downsample_layer(sd, blk, i: int, base, params, stats, bstats,
                             bin_boundaries):
    """One downsample layer of either family into the variables trees."""
    ds = blk.downsample
    which = ds.ds_which
    prefix = f"block.downsample_list.{i}."
    name = f"{_DS_MODULE_NAME[which]}_{i}"
    if which == "token":
        p_, s_ = downsample_token_tree(sd, prefix)
        _merge_into(params, base + (name,), p_)
        if s_:
            _merge_into(stats, base + (name,), s_)
        if ds.bin.dynamic_boundaries_enable:
            inner = (
                boundaries_from_checkpoint(bin_boundaries[i])
                if bin_boundaries is not None
                else np.zeros((ds.bin.num_bins[i] - 1,), np.float32)
            )
            _merge_into(
                bstats, base + (name,),
                {"boundaries": inner,
                 "initialized": np.asarray(bin_boundaries is not None)},
            )
        return
    if which not in _DS_MODULE_NAME:
        raise NotImplementedError(f"unknown ds_which: {which}")
    res_cfg = ds.get("res")
    pe_cfg = ds.get("pe") if which == "global_carve" else None
    p_, s_ = downsample_apes_tree(
        sd, prefix,
        res=bool(res_cfg.enable[i]) if res_cfg is not None else False,
        ff=bool(res_cfg.ff[i]) if res_cfg is not None else False,
        pe=bool(pe_cfg.enable[i]) if pe_cfg is not None else False,
        pe_mode=pe_cfg.mode[i] if pe_cfg is not None else "III",
    )
    _merge_into(params, base + (name,), p_)
    if s_:
        _merge_into(stats, base + (name,), s_)


def boundaries_from_checkpoint(pair) -> np.ndarray:
    """Checkpoint ``bin_boundaries`` entry ``[upper, lower]`` (each
    (1,1,1,nb)) → the (nb-1,) inner boundaries (test_modelnet.py:168-171)."""
    upper = _np(pair[0]).reshape(-1)
    return np.ascontiguousarray(upper[1:])


# --------------------------------------------------------------------------
# full-model importers
# --------------------------------------------------------------------------

def strip_ddp_prefix(sd: Mapping[str, Any]) -> dict:
    """Drop the ``module.`` prefix DDP adds (test_modelnet.py:158-166)."""
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }


def _merge_into(dst: dict, path: tuple, sub: dict) -> None:
    node = dst
    for part in path:
        node = node.setdefault(part, {})
    node.update(sub)


def import_cls_model(state_dict: Mapping[str, Any], cfg: Any,
                     bin_boundaries=None) -> dict:
    """Reference ``ModelNetModel`` state_dict → ClsModel variables.

    :param state_dict: torch state dict (DDP ``module.`` prefix tolerated)
    :param cfg: this framework's merged config (schema-compatible with the
        reference's); drives layer counts and res-link structure
    :param bin_boundaries: optional checkpoint ``bin_boundaries`` list (one
        ``[upper, lower]`` pair per downsample layer) → seeds ``bin_stats``
    :returns: ``{"params": ..., "batch_stats": ..., "bin_stats": ...}``
        matching ``ClsModel(cfg=cfg, ...).init(...)``'s structure
    """
    sd = strip_ddp_prefix(state_dict)
    blk = cfg.feature_learning_block
    params: dict = {}
    stats: dict = {}
    bstats: dict = {}
    base = ("ClsFeatureBlock_0",)

    for i in range(len(blk.embedding.K)):
        p_, s_ = edgeconv_tree(sd, f"block.embedding_list.{i}.")
        _merge_into(params, base + (f"EdgeConv_{i}",), p_)
        _merge_into(stats, base + (f"EdgeConv_{i}",), s_)

    for i in range(len(blk.attention.K)):
        name = (
            f"Neighbor2PointAttention_{i}"
            if blk.attention.get("fl_which", "n2p") == "n2p"
            else f"Point2PointAttention_{i}"
        )
        p_, s_ = attention_tree(sd, f"block.feature_learning_layer_list.{i}.")
        _merge_into(params, base + (name,), p_)
        _merge_into(stats, base + (name,), s_)

    n_ds = len(blk.downsample.M)
    for i in range(n_ds):
        _import_downsample_layer(sd, blk, i, base, params, stats, bstats,
                                 bin_boundaries)

    if blk.res_link.enable:
        for i in range(n_ds + 1):
            _merge_into(params, base + (f"Conv1x1_{i}",),
                        _conv1x1(sd, f"block.conv_list.{i}.weight"))
        _merge_into(params, ("Dense_0",),
                    _dense(sd, "linear1.0.weight", "linear1.0.bias"))
        _merge_into(params, ("PointBatchNorm_0",), _bn_params(sd, "linear1.1"))
        _merge_into(stats, ("PointBatchNorm_0",), _bn_stats(sd, "linear1.1"))
        _merge_into(params, ("Dense_1",),
                    _dense(sd, "linear2.0.weight", "linear2.0.bias"))
        _merge_into(params, ("PointBatchNorm_1",), _bn_params(sd, "linear2.1"))
        _merge_into(stats, ("PointBatchNorm_1",), _bn_stats(sd, "linear2.1"))
        _merge_into(params, ("Dense_2",),
                    _dense(sd, "linear3.weight", "linear3.bias"))
    else:
        _merge_into(params, base + ("Conv1x1_0",),
                    _conv1x1(sd, "block.conv.weight"))
        _merge_into(params, ("Dense_0",),
                    _dense(sd, "linear2.0.weight", "linear2.0.bias"))
        _merge_into(params, ("PointBatchNorm_0",), _bn_params(sd, "linear2.1"))
        _merge_into(stats, ("PointBatchNorm_0",), _bn_stats(sd, "linear2.1"))
        _merge_into(params, ("Dense_1",),
                    _dense(sd, "linear3.weight", "linear3.bias"))

    out = {"params": params, "batch_stats": stats}
    if bstats:
        out["bin_stats"] = bstats
    return out


def import_seg_model(state_dict: Mapping[str, Any], cfg: Any,
                     bin_boundaries=None) -> dict:
    """Reference ``ShapeNetModel`` state_dict → SegModel variables.

    Mirrors :func:`import_cls_model` for the segmentation U-Net
    (models/seg_model.py:136-224): STN (optional) + embedding/attention/
    downsample/upsample stacks + the category-vector head convs.
    """
    sd = strip_ddp_prefix(state_dict)
    blk = cfg.feature_learning_block
    params: dict = {}
    stats: dict = {}
    bstats: dict = {}
    base = ("SegFeatureBlock_0",)

    if blk.get("STN", False):
        p_, s_ = stn_tree(sd, "STN.")
        _merge_into(params, ("STN_0",), p_)
        _merge_into(stats, ("STN_0",), s_)

    for i in range(len(blk.embedding.K)):
        p_, s_ = edgeconv_tree(sd, f"block.embedding_list.{i}.")
        _merge_into(params, base + (f"EdgeConv_{i}",), p_)
        _merge_into(stats, base + (f"EdgeConv_{i}",), s_)

    for i in range(len(blk.attention.K)):
        p_, s_ = attention_tree(sd, f"block.feature_learning_layer_list.{i}.")
        _merge_into(params, base + (f"Neighbor2PointAttention_{i}",), p_)
        _merge_into(stats, base + (f"Neighbor2PointAttention_{i}",), s_)

    for i in range(len(blk.downsample.M)):
        _import_downsample_layer(sd, blk, i, base, params, stats, bstats,
                                 bin_boundaries)

    us = blk.upsample
    if us.us_which == "interpolation":
        for i in range(len(us.v_out)):
            up = f"block.upsample_list.{i}."
            _merge_into(
                params, base + (f"UpSampleInterpolation_{i}",),
                {"Conv1x1_0": _conv1x1(sd, f"{up}conv.0.weight"),
                 "PointBatchNorm_0": _bn_params(sd, f"{up}conv.1"),
                 "Conv1x1_1": _conv1x1(sd, f"{up}res_conv.0.weight"),
                 "PointBatchNorm_1": _bn_params(sd, f"{up}res_conv.1")},
            )
            _merge_into(
                stats, base + (f"UpSampleInterpolation_{i}",),
                {"PointBatchNorm_0": _bn_stats(sd, f"{up}conv.1"),
                 "PointBatchNorm_1": _bn_stats(sd, f"{up}res_conv.1")},
            )
    elif us.us_which in ("crossA", "selfA"):
        uname = ("UpSampleCrossAttention" if us.us_which == "crossA"
                 else "UpSampleSelfAttention")
        for i in range(len(us.v_out)):
            p_, _ = upsample_attention_tree(sd, f"block.upsample_list.{i}.")
            _merge_into(params, base + (f"{uname}_{i}",), p_)
    else:
        raise NotImplementedError(f"unknown us_which: {us.us_which}")

    # head (models/seg_model.py:145-167): conv (→1024), conv1 (category
    # 16→64), conv2/conv3 (ConvBN), conv4 (plain 256→50)
    for i, (tname, has_bn) in enumerate(
        [("conv", True), ("conv1", True), ("conv2", True),
         ("conv3", True), ("conv4", False)]
    ):
        w_key = f"{tname}.weight" if not has_bn else f"{tname}.0.weight"
        _merge_into(params, (f"Conv1x1_{i}",), _conv1x1(sd, w_key))
        if has_bn:
            _merge_into(params, (f"PointBatchNorm_{i}",),
                        _bn_params(sd, f"{tname}.1"))
            _merge_into(stats, (f"PointBatchNorm_{i}",),
                        _bn_stats(sd, f"{tname}.1"))

    out = {"params": params, "batch_stats": stats}
    if bstats:
        out["bin_stats"] = bstats
    return out


def load_torch_checkpoint(path: str, cfg: Any, task: str) -> dict:
    """Load a reference ``checkpoint.pt`` into flax variables.

    :param path: path to the torch checkpoint (``torch.save`` format,
        train_modelnet.py:491-509 / train_shapenet.py:660-678)
    :param task: 'cls' or 'seg'
    :returns: flax variables dict for ClsModel / SegModel
    """
    import torch  # deferred: only needed on this interop path

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        sd = ckpt["model_state_dict"]
        bounds = ckpt.get("bin_boundaries")
    else:
        sd, bounds = ckpt, None
    importer = import_cls_model if task == "cls" else import_seg_model
    return importer(sd, cfg, bin_boundaries=bounds)
