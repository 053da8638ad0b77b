"""Tiny model configs for fast CPU tests (shape-compatible with the shipped
cls/seg schemas, scaled down ~8x)."""

from samble_tpu.config import Config

N = 64  # points per cloud in tests


def tiny_cls_config(ds_which="token", sample_mode="random", dynamic=True):
    d = {
        "feature_learning_block": {
            "enable": True,
            "res_link": {"enable": True},
            "embedding": {
                "K": [8, 8],
                "group_type": ["center_diff", "center_diff"],
                "normal_channel": False,
                "conv1_in": [6, 32],
                "conv1_out": [16, 16],
                "conv2_in": [16, 16],
                "conv2_out": [16, 16],
            },
            "downsample": {
                "ds_which": ds_which,
                "K": 8,
                "M": [32, 16],
                "asm": ["dot", "dot"],
                "res": {"enable": [False, False], "ff": [False, False]},
                "bin": {
                    "token_orthognonal_loss_factor": 0.0,
                    "dynamic_boundaries_enable": dynamic,
                    "bin_boundaries": [
                        [0.7, 0.2, -0.2, -0.7, -1.2],
                        [0.7, 0.2, -0.2, -0.7, -1.2],
                    ],
                    "num_bins": [6, 6],
                    "scaling_factor": [1.0, 1.0],
                    "sample_mode": [sample_mode, sample_mode],
                    "norm_mode": ["tanh", "tanh"],
                    "relu_mean_order": ["mean_relu", "mean_relu"],
                    "token_mode": ["multi_token", "multi_token"],
                    "momentum_update_factor": [0.99, 0.99],
                    "boltzmann_T": [0.1, 0.1],
                },
                "boltzmann": {
                    "enable": [False, False],
                    "boltzmann_T": [1.0, 1.0],
                    "norm_mode": ["minmax", "minmax"],
                },
                "pe": {"enable": [False, False], "mode": ["III", "III"]},
                "q_in": [32, 32],
                "q_out": [32, 32],
                "k_in": [32, 32],
                "k_out": [32, 32],
                "v_in": [32, 32],
                "v_out": [32, 32],
                "num_heads": [1, 1],
                "idx_mode": ["sparse_col_sqr", "sparse_col_sqr"],
            },
            "attention": {
                "fl_which": "n2p",
                "K": [8, 8, 8],
                "attention_mode": ["scalar_dot"] * 3,
                "group_type": ["diff"] * 3,
                "q_in": [32] * 3,
                "q_out": [32] * 3,
                "k_in": [32] * 3,
                "k_out": [32] * 3,
                "v_in": [32] * 3,
                "v_out": [32] * 3,
                "num_heads": [4] * 3,
                "ff_conv1_channels_in": [32] * 3,
                "ff_conv1_channels_out": [64] * 3,
                "ff_conv2_channels_in": [64] * 3,
                "ff_conv2_channels_out": [32] * 3,
            },
        },
    }
    return Config(d)


def tiny_seg_config(us_which="interpolation", ds_which="token", stn=True):
    cfg = tiny_cls_config(ds_which=ds_which).to_dict()
    blk = cfg["feature_learning_block"]
    blk["STN"] = stn
    blk["downsample"]["bin"]["num_bins"] = [4, 4]
    blk["attention"]["K"] = [8] * 5
    for key in (
        "attention_mode", "group_type", "q_in", "q_out", "k_in", "k_out",
        "v_in", "v_out", "num_heads", "ff_conv1_channels_in",
        "ff_conv1_channels_out", "ff_conv2_channels_in",
        "ff_conv2_channels_out",
    ):
        blk["attention"][key] = blk["attention"][key][:1] * 5
    blk["upsample"] = {
        "us_which": us_which,
        "interpolation": {"distance_type": ["xyz", "xyz"], "K": [3, 3]},
        "q_in": [32, 32],
        "q_out": [32, 32],
        "k_in": [32, 32],
        "k_out": [32, 32],
        "v_in": [32, 32],
        "v_out": [32, 32],
        "num_heads": [4, 4],
    }
    return Config(cfg)
