"""On-device, jittable point-cloud augmentations.

Reference: utils/data_augmentation.py (numpy, applied per item inside the
torch DataLoader workers).  Same math here, but expressed as pure JAX
functions vmapped over the batch so augmentation fuses into the device step
— no host-side per-item Python, no worker processes.

Per-item augmentation choice matches the reference
(utils/dataloader.py:192-197): each cloud independently picks ``num_aug``
of the enabled augmentations, without replacement, applied in the sampled
order — realized with a per-item permutation + ``lax.switch`` chain.
"""

from __future__ import annotations

from typing import Any, Callable, List, Sequence

import jax
import jax.numpy as jnp


def jitter(key: jax.Array, pcd: jax.Array, std: float = 0.01, clip: float = 0.05):
    """Clipped Gaussian positional noise (data_augmentation.py:4-10)."""
    noise = jnp.clip(std * jax.random.normal(key, pcd.shape), -clip, clip)
    return pcd + noise


def _axis_rotation(angle: jax.Array, which_axis: str) -> jax.Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    if which_axis == "x":
        return jnp.array([[1.0, 0, 0], [0, c, s], [0, -s, c]])
    if which_axis == "y":
        return jnp.array([[c, 0, -s], [0, 1.0, 0], [s, 0, c]])
    if which_axis == "z":
        return jnp.array([[c, s, 0], [-s, c, 0], [0, 0, 1.0]])
    raise ValueError(f"which_axis must be x, y or z, got {which_axis}")


def rotate(
    key: jax.Array, pcd: jax.Array, which_axis: str = "y",
    angle_range: Sequence[float] = (-15.0, 15.0),
):
    """Single-axis rotation by a uniform angle in degrees
    (data_augmentation.py:13-35)."""
    angle = jax.random.uniform(
        key, (), minval=angle_range[0], maxval=angle_range[1]
    )
    rot = _axis_rotation(jnp.pi * angle / 180.0, which_axis)
    return pcd @ rot


def translate(
    key: jax.Array, pcd: jax.Array,
    x_range=( -0.2, 0.2), y_range=(-0.2, 0.2), z_range=(-0.2, 0.2),
):
    """Uniform global translation (data_augmentation.py:38-53).

    With a 6-channel cloud the normal half is left untouched (the
    reference's ``normal_channel`` branch)."""
    kx, ky, kz = jax.random.split(key, 3)
    t = jnp.stack([
        jax.random.uniform(kx, (), minval=x_range[0], maxval=x_range[1]),
        jax.random.uniform(ky, (), minval=y_range[0], maxval=y_range[1]),
        jax.random.uniform(kz, (), minval=z_range[0], maxval=z_range[1]),
    ])
    if pcd.shape[-1] == 6:
        return jnp.concatenate([pcd[:, :3] + t, pcd[:, 3:]], axis=-1)
    return pcd + t


def anisotropic_scale(
    key: jax.Array, pcd: jax.Array,
    x_range=(0.66, 1.5), y_range=(0.66, 1.5), z_range=(0.66, 1.5),
    isotropic: bool = False,
):
    """Per-axis (or isotropic) scaling (data_augmentation.py:56-76).

    With a 6-channel cloud, scaling applies to xyz only and must be
    isotropic (the reference's assert, data_augmentation.py:69)."""
    kx, ky, kz = jax.random.split(key, 3)
    sx = jax.random.uniform(kx, (), minval=x_range[0], maxval=x_range[1])
    sy = jax.random.uniform(ky, (), minval=y_range[0], maxval=y_range[1])
    sz = jax.random.uniform(kz, (), minval=z_range[0], maxval=z_range[1])
    scale = jnp.where(isotropic, jnp.stack([sx, sx, sx]), jnp.stack([sx, sy, sz]))
    if pcd.shape[-1] == 6:
        if not isotropic:
            raise ValueError(
                "Normal channel only supports isotropic scaling "
                "(reference data_augmentation.py:69)"
            )
        return jnp.concatenate([pcd[:, :3] * scale, pcd[:, 3:]], axis=-1)
    return pcd * scale


def rotate_perturbation_with_normal(
    key: jax.Array, pcd_normal: jax.Array, std: float = 0.06, clip: float = 0.18
):
    """Small random 3-axis rotation of xyz+normal clouds
    (data_augmentation.py:79-115)."""
    angles = jnp.clip(std * jax.random.normal(key, (3,)), -clip, clip)
    cx, sx = jnp.cos(angles[0]), jnp.sin(angles[0])
    cy, sy = jnp.cos(angles[1]), jnp.sin(angles[1])
    cz, sz = jnp.cos(angles[2]), jnp.sin(angles[2])
    rx = jnp.array([[1.0, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = jnp.array([[cy, 0, sy], [0, 1.0, 0], [-sy, 0, cy]])
    rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1.0]])
    rot = rz @ ry @ rx
    xyz = pcd_normal[:, :3] @ rot
    normal = pcd_normal[:, 3:6] @ rot
    return jnp.concatenate([xyz, normal], axis=-1)


def rotate_with_normal(key: jax.Array, pcd_normal: jax.Array, angle_range=None):
    """Y-axis rotation of xyz+normal clouds (data_augmentation.py:118-140).

    Quirk preserved: when ``angle_range`` is None the reference draws an
    angle in [0, 2π) *radians* then converts it by π/180 again — i.e. a tiny
    rotation; with a range the angle is in degrees."""
    if angle_range is None:
        angle = jax.random.uniform(key, ()) * 2.0 * jnp.pi
    else:
        angle = jax.random.uniform(
            key, (), minval=angle_range[0], maxval=angle_range[1]
        )
    angle = jnp.pi * angle / 180.0
    c, s = jnp.cos(angle), jnp.sin(angle)
    rot = jnp.array([[c, 0, s], [0, 1.0, 0], [-s, 0, c]])
    xyz = pcd_normal[:, :3] @ rot
    normal = pcd_normal[:, 3:6] @ rot
    return jnp.concatenate([xyz, normal], axis=-1)


def make_batch_augment(aug_cfg: Any) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Build ``augment(key, batch (B,N,C)) -> (B,N,C)`` from the config node
    ``train.dataloader.data_augmentation``.

    The transform set adapts to the cloud's channel count at trace time:
    6-channel (xyz+normal) clouds rotate with :func:`rotate_with_normal`,
    gain the ``rotate_perturbation`` branch (reference schema
    configs/default.yaml:77-80, "only for datasets with normal"), and
    translate/scale leave the normal half invariant.

    Vote/TTA reuses ``anisotropic_scale`` alone (utils/dataloader.py:106-114),
    via :func:`make_vote_augment`.
    """

    def build_fns(normal_channel: bool) -> List[Callable]:
        fns: List[Callable] = []
        if aug_cfg.jitter.enable:
            std, clip = float(aug_cfg.jitter.std), float(aug_cfg.jitter.clip)
            fns.append(lambda k, p: jitter(k, p, std, clip))
        if aug_cfg.rotate.enable:
            axis = str(aug_cfg.rotate.which_axis)
            rng_ = tuple(aug_cfg.rotate.angle_range)
            if normal_channel:
                fns.append(lambda k, p: rotate_with_normal(k, p, rng_))
            else:
                fns.append(lambda k, p: rotate(k, p, axis, rng_))
        rp = aug_cfg.get("rotate_perturbation")
        if normal_channel and rp is not None and rp.enable:
            std_, clip_ = float(rp.std), float(rp.clip)
            fns.append(
                lambda k, p: rotate_perturbation_with_normal(k, p, std_, clip_)
            )
        if aug_cfg.translate.enable:
            xr = tuple(aug_cfg.translate.x_range)
            yr = tuple(aug_cfg.translate.y_range)
            zr = tuple(aug_cfg.translate.z_range)
            fns.append(lambda k, p: translate(k, p, xr, yr, zr))
        if aug_cfg.anisotropic_scale.enable:
            xr = tuple(aug_cfg.anisotropic_scale.x_range)
            yr = tuple(aug_cfg.anisotropic_scale.y_range)
            zr = tuple(aug_cfg.anisotropic_scale.z_range)
            iso = bool(aug_cfg.anisotropic_scale.isotropic)
            fns.append(lambda k, p: anisotropic_scale(k, p, xr, yr, zr, iso))
        return fns

    if not build_fns(False):
        raise ValueError("At least one augmentation must be enabled!")
    num_aug = int(aug_cfg.num_aug)
    if num_aug > len(build_fns(False)):
        raise ValueError(
            f"num_aug ({num_aug}) exceeds enabled augmentations "
            f"({len(build_fns(False))})"
        )

    def augment_one(key: jax.Array, pcd: jax.Array) -> jax.Array:
        fns = build_fns(pcd.shape[-1] == 6)
        n_fns = len(fns)
        identity = lambda k, p: p
        branches = [lambda k, p, f=f: f(k, p) for f in fns] + [identity]
        perm_key, *apply_keys = jax.random.split(key, num_aug + 1)
        choice = jax.random.permutation(perm_key, n_fns)[:num_aug]
        for slot in range(num_aug):
            pcd = jax.lax.switch(choice[slot], branches, apply_keys[slot], pcd)
        return pcd

    def augment_batch(key: jax.Array, batch: jax.Array) -> jax.Array:
        keys = jax.random.split(key, batch.shape[0])
        return jax.vmap(augment_one)(keys, batch)

    return augment_batch


def make_vote_augment(aug_cfg: Any) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """TTA/vote transform: anisotropic scale only (utils/dataloader.py:106-114)."""
    xr = tuple(aug_cfg.anisotropic_scale.x_range)
    yr = tuple(aug_cfg.anisotropic_scale.y_range)
    zr = tuple(aug_cfg.anisotropic_scale.z_range)
    iso = bool(aug_cfg.anisotropic_scale.isotropic)

    def augment_batch(key: jax.Array, batch: jax.Array) -> jax.Array:
        keys = jax.random.split(key, batch.shape[0])
        return jax.vmap(lambda k, p: anisotropic_scale(k, p, xr, yr, zr, iso))(
            keys, batch
        )

    return augment_batch
