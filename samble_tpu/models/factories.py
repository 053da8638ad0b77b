"""Config-driven module factories.

The reference instantiates its layer variants through if/elif chains inside
the blocks (models/cls_model.py:26-83, models/seg_model.py:19-94); these
factories centralize that dispatch and slice the per-layer list-valued
hyperparameters out of the config.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from samble_tpu.nn import (
    DownSampleCarve,
    DownSampleGlobal,
    DownSampleLocal,
    DownSampleToken,
    Neighbor2PointAttention,
    Point2PointAttention,
    UpSampleCrossAttention,
    UpSampleInterpolation,
    UpSampleSelfAttention,
)


def make_attention_layer(att_cfg: Any, layer: int, train: bool,
                         dtype: Any = jnp.float32):
    """Feature-learning layer: n2p (default) or p2p (models/cls_model.py:64-83)."""
    which = att_cfg.get("fl_which", "n2p")
    if which == "n2p":
        return Neighbor2PointAttention(
            k=att_cfg.K[layer],
            group_type=att_cfg.group_type[layer],
            num_heads=att_cfg.num_heads[layer],
            attention_mode=att_cfg.attention_mode[layer],
            asm=att_cfg.get("asm", ["dot"] * len(att_cfg.K))[layer],
            q_out=att_cfg.q_out[layer],
            k_out=att_cfg.k_out[layer],
            v_out=att_cfg.v_out[layer],
            ff_hidden=att_cfg.ff_conv1_channels_out[layer],
            ff_out=att_cfg.ff_conv2_channels_out[layer],
            train=train,
            dtype=dtype,
        )
    if which == "p2p":
        return Point2PointAttention(
            num_heads=att_cfg.num_heads[layer],
            asm=att_cfg.get("asm", ["dot"] * len(att_cfg.K))[layer],
            q_out=att_cfg.q_out[layer],
            k_out=att_cfg.k_out[layer],
            v_out=att_cfg.v_out[layer],
            ff_hidden=att_cfg.ff_conv1_channels_out[layer],
            ff_out=att_cfg.ff_conv2_channels_out[layer],
            train=train,
            dtype=dtype,
        )
    raise ValueError(f"fl_which must be n2p or p2p, got {which}")


def make_downsample(ds_cfg: Any, layer: int, train: bool,
                    dtype: Any = jnp.float32):
    """Downsampler dispatch (models/cls_model.py:26-63)."""
    which = ds_cfg.ds_which
    res_cfg = ds_cfg.get("res")
    res = bool(res_cfg.enable[layer]) if res_cfg is not None else False
    ff = bool(res_cfg.ff[layer]) if res_cfg is not None else False
    common = dict(
        m=ds_cfg.M[layer],
        num_heads=ds_cfg.num_heads[layer],
        asm=ds_cfg.asm[layer],
        idx_mode=ds_cfg.idx_mode[layer],
        q_out=ds_cfg.q_out[layer],
        k_out=ds_cfg.k_out[layer],
        v_out=ds_cfg.v_out[layer],
        res=res,
        ff=ff,
        train=train,
        dtype=dtype,
    )
    if which == "token":
        bin_cfg = ds_cfg.bin
        dynamic = bool(bin_cfg.dynamic_boundaries_enable)
        static_b = None
        if not dynamic:
            static_b = tuple(bin_cfg.bin_boundaries[layer])
        return DownSampleToken(
            k=ds_cfg.K,
            num_bins=bin_cfg.num_bins[layer],
            token_mode=bin_cfg.get("token_mode", ["multi_token", "multi_token"])[layer],
            sample_mode=bin_cfg.sample_mode[layer],
            boltzmann_t=bin_cfg.boltzmann_T[layer],
            relu_mean_order=bin_cfg.get("relu_mean_order", ["mean_relu", "mean_relu"])[layer],
            dynamic_boundaries=dynamic,
            momentum=bin_cfg.momentum_update_factor[layer],
            static_boundaries=static_b,
            **common,
        )
    if which == "global_carve":
        pe_cfg = ds_cfg.get("pe")
        boltz = ds_cfg.get("boltzmann")
        bin_cfg = ds_cfg.get("bin")
        # legacy bin modes (older configs carried bin.mode: bin|bin2 —
        # utils/check_config.py:47-49 references it; shipped YAMLs omit it)
        bin_mode = bin_cfg.get("mode", "none") if bin_cfg is not None else "none"
        bin_kwargs = {}
        if bin_cfg is not None and bin_mode != "none":
            bin_kwargs = dict(
                bin_mode=bin_mode,
                num_bins=bin_cfg.num_bins[layer],
                bin_sample_mode=bin_cfg.sample_mode[layer],
                bin_norm_mode=bin_cfg.norm_mode[layer],
                scaling_factor=bin_cfg.scaling_factor[layer],
                bin_boltzmann_t=bin_cfg.boltzmann_T[layer],
            )
        return DownSampleCarve(
            k=ds_cfg.K,
            pe=bool(pe_cfg.enable[layer]) if pe_cfg is not None else False,
            pe_mode=pe_cfg.mode[layer] if pe_cfg is not None else "III",
            boltzmann_enable=bool(boltz.enable[layer]) if boltz is not None else False,
            boltzmann_t=boltz.boltzmann_T[layer] if boltz is not None else 1.0,
            boltzmann_norm_mode=boltz.norm_mode[layer] if boltz is not None else "minmax",
            **bin_kwargs,
            **common,
        )
    if which == "local":
        boltz = ds_cfg.get("boltzmann")
        return DownSampleLocal(
            boltzmann_enable=bool(boltz.enable[layer]) if boltz is not None else False,
            boltzmann_t=boltz.boltzmann_T[layer] if boltz is not None else 1.0,
            boltzmann_norm_mode=boltz.norm_mode[layer] if boltz is not None else "minmax",
            **common,
        )
    if which == "global":
        return DownSampleGlobal(k=ds_cfg.get("K", 32), **common)
    raise ValueError(f"ds_which must be token/global_carve/local/global, got {which}")


def make_upsample(us_cfg: Any, layer: int, train: bool,
                  dtype: Any = jnp.float32):
    """Upsampler dispatch (models/seg_model.py:68-94)."""
    which = us_cfg.us_which
    if which == "crossA":
        return UpSampleCrossAttention(
            num_heads=us_cfg.num_heads[layer],
            q_out=us_cfg.q_out[layer],
            k_out=us_cfg.k_out[layer],
            v_out=us_cfg.v_out[layer],
            train=train,
            dtype=dtype,
        )
    if which == "selfA":
        return UpSampleSelfAttention(
            num_heads=us_cfg.num_heads[layer],
            q_out=us_cfg.q_out[layer],
            k_out=us_cfg.k_out[layer],
            v_out=us_cfg.v_out[layer],
            train=train,
            dtype=dtype,
        )
    if which == "interpolation":
        return UpSampleInterpolation(
            v_out=us_cfg.v_out[layer],
            distance_type=us_cfg.interpolation.distance_type[layer],
            k=us_cfg.interpolation.K[layer],
            train=train,
            dtype=dtype,
        )
    raise ValueError(f"us_which must be crossA/selfA/interpolation, got {which}")
