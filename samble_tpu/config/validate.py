"""Config validation: the reference's pre-flight invariants, done right.

Reference: utils/check_config.py:6-209.  That checker is disabled by default
(``check_config_flag=False``, check_config.py:378) and references config keys
the shipped YAMLs never define (``bin.enable`` / ``bin.mode``, :47-49); this
rebuild keeps only the rules that are consistent with the shipped schema and
always runs them.
"""

from __future__ import annotations

from samble_tpu.config.loader import Config

IDX_MODES_BY_DS = {
    "token": [
        "col_sum", "row_std", "sparse_row_sum", "sparse_row_std",
        "sparse_col_sum", "sparse_col_avg", "sparse_col_sqr",
    ],
    "global_carve": [
        "col_sum", "row_std", "sparse_row_sum", "sparse_row_std",
        "sparse_col_sum", "sparse_col_avg", "sparse_col_sqr",
    ],
    "local": ["local_std", "sparse_row_std", "sparse_col_sum",
              "sparse_col_avg", "sparse_col_sqr"],
    "global": ["col_sum", "row_std", "sparse_row_sum", "sparse_row_std",
               "sparse_col_sum", "sparse_col_avg", "sparse_col_sqr",
               "sparse_col_sum_sqr"],
}


def check_config(config: Config) -> None:
    blk = config.feature_learning_block
    if not blk.enable:
        raise ValueError("feature_learning_block must be enabled")

    # embedding input channels: 6 without normals, 12 with
    # (check_config.py:108-124)
    normal = blk.embedding.get("normal_channel", False)
    expect = 12 if normal else 6
    if blk.embedding.conv1_in[0] != expect:
        raise ValueError(
            f"embedding.conv1_in[0] must be {expect} "
            f"(normal_channel={normal}), got {blk.embedding.conv1_in[0]}"
        )

    ds = blk.downsample
    ds_which = ds.ds_which
    if ds_which not in IDX_MODES_BY_DS:
        raise ValueError(f"unknown ds_which: {ds_which}")
    for i in range(len(ds.M)):
        q_in, k_in, v_in = ds.q_in[i], ds.k_in[i], ds.v_in[i]
        q_out, k_out, v_out = ds.q_out[i], ds.k_out[i], ds.v_out[i]
        heads = ds.num_heads[i]
        if not (q_in == k_in == v_in):
            raise ValueError("downsample q_in, k_in, v_in must match")
        if q_out != k_out:
            raise ValueError("downsample q_out must equal k_out")
        if q_out % heads or k_out % heads or v_out % heads:
            raise ValueError("downsample head count must divide q/k/v_out")
        if heads != 1:
            raise ValueError("downsample num_heads must be 1")
        idx_mode = ds.idx_mode[i]
        if idx_mode not in IDX_MODES_BY_DS[ds_which]:
            raise ValueError(
                f"idx_mode {idx_mode} invalid for ds_which={ds_which}; "
                f"allowed: {IDX_MODES_BY_DS[ds_which]}"
            )
        if "bin" in ds and "num_bins" in ds.bin:
            nb = ds.bin.num_bins[i]
            if nb % 2 or nb < 2:
                raise ValueError("num_bins must be even and >= 2")

    att = blk.attention
    for i in range(len(att.K)):
        heads = att.num_heads[i]
        if att.q_in[i] != att.v_out[i]:
            raise ValueError("attention q_in must equal v_out (ResLink)")
        if att.k_in[i] != att.v_in[i]:
            raise ValueError("attention k_in must equal v_in")
        if att.q_out[i] != att.k_out[i]:
            raise ValueError("attention q_out must equal k_out")
        if att.q_out[i] % heads or att.k_out[i] % heads or att.v_out[i] % heads:
            raise ValueError("attention head count must divide q/k/v_out")
        mode, gt = att.attention_mode[i], att.group_type[i]
        if mode == "scalar_dot" and gt != "diff":
            raise ValueError("scalar_dot attention requires group_type diff")
        if mode == "vector_sub" and gt != "neighbor":
            raise ValueError("vector_sub attention requires group_type neighbor")

    if "upsample" in blk:
        us = blk.upsample
        for i in range(len(us.q_in)):
            heads = us.num_heads[i]
            if us.k_in[i] != us.v_in[i]:
                raise ValueError("upsample k_in must equal v_in")
            if us.q_out[i] != us.k_out[i]:
                raise ValueError("upsample q_out must equal k_out")
            if us.q_out[i] % heads or us.k_out[i] % heads or us.v_out[i] % heads:
                raise ValueError("upsample head count must divide q/k/v_out")

    vote = config.select("train.dataloader.vote")
    if vote is not None and vote.get("enable", False):
        if vote.num_vote < 2:
            raise ValueError("vote.num_vote must be >= 2 when voting")
        if vote.vote_start_epoch > config.train.epochs:
            raise ValueError("vote must start before the end of training")
