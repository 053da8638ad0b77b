"""ModelNet40 classification model.

Reference: models/cls_model.py — ``FeatureLearningBlock`` (:10-145) and
``ModelNetModel`` (:148-225).  Forward structure (configs/cls.yaml):

  (B, N, 3) → EdgeConv×2 → concat(128ch) → N2P#0
            → [DownSampleToken → N2P#i]×2              (2048 → 1024 → 512)
            → per-stage Conv1x1(1024) + global max     (3 residual links)
            → concat (B, 3072) → MLP 1024 → 256 → 40
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from samble_tpu import ops
from samble_tpu.nn.common import Conv1x1, PointBatchNorm, leaky_relu
from samble_tpu.nn.embedding import EdgeConv
from samble_tpu.models.factories import make_attention_layer, make_downsample


class ClsFeatureBlock(nn.Module):
    """Encoder block with per-stage 1024-d max-pooled residual links.

    Reference: models/cls_model.py:10-145 (incl. the optional FPS
    pre-pooling path, :117-130).
    """

    cfg: Any  # feature_learning_block config node
    num_classes: int = 40
    fps: bool = False
    train: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):
        blk = self.cfg
        x_xyz = x[..., :3]  # (B, N, 3); drops normals on 6-channel input

        emb_outs = []
        for layer in range(len(blk.embedding.K)):
            x = EdgeConv(
                k=blk.embedding.K[layer],
                group_type=blk.embedding.group_type[layer],
                conv1_out=blk.embedding.conv1_out[layer],
                conv2_out=blk.embedding.conv2_out[layer],
                normal_channel=blk.embedding.get("normal_channel", False),
                train=self.train,
                dtype=self.dtype,
            )(x)
            emb_outs.append(x)
        x = jnp.concatenate(emb_outs, axis=-1)  # (B, N, ΣC)

        x = make_attention_layer(blk.attention, 0, self.train, self.dtype)(x)

        res_link_enable = blk.res_link.enable
        num_ds = len(blk.downsample.M)
        aux_list = []
        if res_link_enable:
            res_links = [jnp.max(Conv1x1(1024, dtype=self.dtype)(x), axis=1)]
            for i in range(num_ds):
                if self.fps:
                    # FPS pre-pool to 2M points, then attention-downsample
                    # (models/cls_model.py:117-130)
                    key = self.make_rng("sampling")
                    m2 = blk.downsample.M[i] * 2
                    fps_idx = ops.farthest_point_sample(key, x_xyz, m2)
                    x = ops.gather_by_idx(x, fps_idx)
                    x_xyz_d = ops.gather_by_idx(x_xyz, fps_idx)
                    x, idx, _, aux = make_downsample(blk.downsample, i, self.train, self.dtype)(
                        x, x_xyz_d
                    )
                    idx = jnp.take_along_axis(fps_idx, idx, axis=1)
                else:
                    x, idx, _, aux = make_downsample(blk.downsample, i, self.train, self.dtype)(
                        x, x_xyz
                    )
                x = make_attention_layer(blk.attention, i + 1, self.train, self.dtype)(x)
                x_xyz = ops.gather_by_idx(x_xyz, idx)
                res_links.append(jnp.max(Conv1x1(1024, dtype=self.dtype)(x), axis=1))
                aux_list.append(aux)
            feat = jnp.concatenate(res_links, axis=-1)  # (B, 1024 * stages)
            return feat, aux_list
        else:
            for i in range(num_ds):
                x, idx, _, aux = make_downsample(blk.downsample, i, self.train, self.dtype)(
                    x, x_xyz
                )
                x = make_attention_layer(blk.attention, i + 1, self.train, self.dtype)(x)
                x_xyz = ops.gather_by_idx(x_xyz, idx)
                aux_list.append(aux)
            feat = jnp.max(Conv1x1(1024, dtype=self.dtype)(x), axis=1)  # (B, 1024)
            return feat, aux_list


class ClsModel(nn.Module):
    """ModelNet40 classifier (reference ``ModelNetModel``).

    Returns ``(logits (B, num_classes), aux)`` where aux carries the
    per-downsample-layer introspection dicts the reference exposed as module
    attributes.
    """

    cfg: Any  # full config
    num_classes: int = 40
    fps: bool = False
    train: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):
        blk = self.cfg.feature_learning_block
        feat, aux_list = ClsFeatureBlock(
            cfg=blk, num_classes=self.num_classes, fps=self.fps,
            train=self.train, dtype=self.dtype,
        )(x)

        det = not self.train
        if blk.res_link.enable:
            h = nn.Dense(1024, dtype=self.dtype, param_dtype=jnp.float32)(feat)
            h = PointBatchNorm(use_running_average=det, dtype=self.dtype)(h)
            h = leaky_relu(h)
            h = nn.Dropout(0.5, deterministic=det)(h)
        else:
            h = feat
        h = nn.Dense(256, dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = PointBatchNorm(use_running_average=det, dtype=self.dtype)(h)
        h = leaky_relu(h)
        h = nn.Dropout(0.5, deterministic=det)(h)
        logits = nn.Dense(self.num_classes, param_dtype=jnp.float32)(
            h.astype(jnp.float32)
        )
        return logits, {"downsample": aux_list}
