"""Numerical parity against the live reference implementation.

The upstream PyTorch reference (/root/reference) is imported directly under
torch-CPU; identical weights are ported into the flax modules via
``samble_tpu.interop`` and forward outputs are compared to f32 tolerance.
This converts the hand-computed-fixture fidelity claims (kNN normalization
quirk utils/ops.py:23-29, z-score binning utils/ops.py:435-464,
water-filling utils/ops.py:385-432, token scoring models/downsample.py:309-344)
into direct oracle tests.

All inputs use fixed numpy seeds so tie-breaking between torch and XLA
arithmetic is deterministic for a given library pair.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.append(REF)

from models import attention as ref_attention  # noqa: E402
from models import cls_model as ref_cls_model  # noqa: E402
from models import downsample as ref_downsample  # noqa: E402
from models import embedding as ref_embedding  # noqa: E402
from utils import ops as ref_ops  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from samble_tpu import interop, ops  # noqa: E402
from samble_tpu.config import load_config  # noqa: E402
from samble_tpu.models import ClsModel  # noqa: E402
from samble_tpu.nn.attention import Neighbor2PointAttention  # noqa: E402
from samble_tpu.nn.downsample import DownSampleToken  # noqa: E402
from samble_tpu.nn.embedding import EdgeConv  # noqa: E402


def _seed_all(seed: int):
    torch.manual_seed(seed)
    return np.random.default_rng(seed)


def _randomize_bn_stats(module: torch.nn.Module, rng):
    """Give every BatchNorm nontrivial running stats + affine params so the
    eval-mode comparison exercises the full affine chain."""
    for m in module.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            c = m.num_features
            with torch.no_grad():
                m.running_mean.copy_(torch.from_numpy(
                    rng.normal(0, 0.5, c).astype(np.float32)))
                m.running_var.copy_(torch.from_numpy(
                    rng.uniform(0.5, 1.5, c).astype(np.float32)))
                m.weight.copy_(torch.from_numpy(
                    rng.uniform(0.5, 1.5, c).astype(np.float32)))
                m.bias.copy_(torch.from_numpy(
                    rng.normal(0, 0.2, c).astype(np.float32)))


def _assert_close(a, b, rtol=2e-4, atol=2e-5, what=""):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    np.testing.assert_allclose(a, b, rtol=rtol, atol=atol, err_msg=what)


# ---------------------------------------------------------------------------
# kNN / grouping core  (utils/ops.py:5-112)
# ---------------------------------------------------------------------------

def test_knn_matches_reference():
    rng = _seed_all(0)
    a = rng.standard_normal((3, 48, 5)).astype(np.float32)
    b = rng.standard_normal((3, 40, 5)).astype(np.float32)
    td, tidx = ref_ops.knn(torch.from_numpy(a), torch.from_numpy(b), 7)
    jd, jidx = ops.neighbors.knn(jnp.asarray(a), jnp.asarray(b), 7)
    np.testing.assert_array_equal(np.asarray(jidx), tidx.numpy())
    _assert_close(jd, td.numpy(), what="knn negative distances")


@pytest.mark.parametrize(
    "group_type", ["neighbor", "diff", "center_neighbor", "center_diff"]
)
def test_group_modes_match(group_type):
    rng = _seed_all(1)
    x = rng.standard_normal((2, 40, 6)).astype(np.float32)
    x_cf = torch.from_numpy(x.transpose(0, 2, 1))  # (B, C, N)
    t_out, t_idx = ref_ops.group(x_cf, 6, group_type)
    j_out, j_idx = ops.group(jnp.asarray(x), 6, group_type)
    np.testing.assert_array_equal(np.asarray(j_idx), t_idx.numpy())
    # reference output is (B, C, N, K) with center-first channel concat
    _assert_close(
        np.moveaxis(np.asarray(j_out), -1, 1), t_out.numpy(),
        what=f"group({group_type})",
    )


def test_neighbor_mask_matches_reference():
    rng = _seed_all(2)
    x = rng.standard_normal((2, 40, 4)).astype(np.float32)
    t_mask = ref_ops.neighbor_mask(torch.from_numpy(x.transpose(0, 2, 1)), 5)
    j_mask = ops.neighbors.neighbor_mask(jnp.asarray(x), 5)
    np.testing.assert_array_equal(np.asarray(j_mask), t_mask.numpy())


# ---------------------------------------------------------------------------
# EdgeConv  (models/embedding.py:7-39)
# ---------------------------------------------------------------------------

def _make_ref_edgeconv(c_in=3, c1=16, c2=16, k=6, group_type="center_diff"):
    from samble_tpu.config.loader import Config

    cfg = Config({
        "K": [k], "group_type": [group_type], "normal_channel": False,
        "conv1_in": [2 * c_in if group_type.startswith("center") else c_in],
        "conv1_out": [c1], "conv2_in": [c1], "conv2_out": [c2],
    })
    return ref_embedding.EdgeConv(cfg, 0)


@pytest.mark.parametrize("train", [False, True])
@pytest.mark.parametrize("group_type", ["center_diff", "neighbor"])
def test_edgeconv_matches_reference(train, group_type):
    rng = _seed_all(3)
    tmod = _make_ref_edgeconv(group_type=group_type)
    _randomize_bn_stats(tmod, rng)
    tmod.train(train)

    x = rng.standard_normal((2, 40, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tmod(torch.from_numpy(x.transpose(0, 2, 1)))  # (B, C2, N)

    p, s = interop.edgeconv_tree(tmod.state_dict(), "")
    jmod = EdgeConv(k=6, group_type=group_type, conv1_out=16, conv2_out=16,
                    train=train)
    variables = {"params": p, "batch_stats": s}
    if train:
        j_out, _ = jmod.apply(variables, jnp.asarray(x),
                              mutable=["batch_stats"])
    else:
        j_out = jmod.apply(variables, jnp.asarray(x))
    _assert_close(np.moveaxis(np.asarray(j_out), -1, 1), t_out.numpy(),
                  what=f"EdgeConv train={train}")


def test_edgeconv_running_stats_update_matches():
    """One train-mode call must leave both frameworks' BN running buffers in
    agreement (torch stores the unbiased batch var with momentum 0.1;
    flax stores the biased one — the documented O(1/(B·N·K)) deviation is
    corrected for here by rescaling)."""
    rng = _seed_all(4)
    tmod = _make_ref_edgeconv()
    _randomize_bn_stats(tmod, rng)
    tmod.train(True)
    x = rng.standard_normal((2, 40, 3)).astype(np.float32)
    with torch.no_grad():
        tmod(torch.from_numpy(x.transpose(0, 2, 1)))

    p, s = interop.edgeconv_tree(tmod.state_dict(), "")
    # state_dict() above reflects the UPDATED torch buffers; rebuild the
    # pre-call stats from the randomization to drive the flax call
    rng2 = _seed_all(4)
    tmod2 = _make_ref_edgeconv()
    _randomize_bn_stats(tmod2, rng2)
    p0, s0 = interop.edgeconv_tree(tmod2.state_dict(), "")

    jmod = EdgeConv(k=6, group_type="center_diff", conv1_out=16, conv2_out=16,
                    train=True)
    _, mut = jmod.apply({"params": p0, "batch_stats": s0}, jnp.asarray(x),
                        mutable=["batch_stats"])
    n_el = 2 * 40 * 6  # B * N * K samples per channel
    for bn_path in [("PointBatchNorm_0",), ("ConvBNLeaky_0", "PointBatchNorm_0")]:
        t_bn = s
        j_bn = mut["batch_stats"]
        for k_ in bn_path:
            t_bn, j_bn = t_bn[k_], j_bn[k_]
        t_bn, j_bn = t_bn["BatchNorm_0"], j_bn["BatchNorm_0"]
        _assert_close(j_bn["mean"], t_bn["mean"], what=f"{bn_path} mean")
        # flax accumulated biased batch var; torch unbiased: scale the
        # batch-var contribution (0.1 of the buffer) by n/(n-1)
        j_var = np.asarray(j_bn["var"])
        j0 = np.asarray(s0[bn_path[0]]["PointBatchNorm_0"]["BatchNorm_0"]["var"]
                        if len(bn_path) == 2 else
                        s0["PointBatchNorm_0"]["BatchNorm_0"]["var"])
        batch_var_biased = (j_var - 0.9 * j0) / 0.1
        j_var_unbiased = 0.9 * j0 + 0.1 * batch_var_biased * n_el / (n_el - 1)
        _assert_close(j_var_unbiased, t_bn["var"], rtol=1e-3, atol=1e-4,
                      what=f"{bn_path} var")


# ---------------------------------------------------------------------------
# Neighbor2PointAttention  (models/attention.py:130-250)
# ---------------------------------------------------------------------------

def _make_ref_n2p(c=32, k=6, heads=4, mode="scalar_dot", asm="dot",
                  group_type="diff"):
    from samble_tpu.config.loader import Config

    cfg = Config({
        "K": [k], "group_type": [group_type], "num_heads": [heads],
        "attention_mode": [mode], "asm": [asm],
        "q_in": [c], "q_out": [c], "k_in": [c], "k_out": [c],
        "v_in": [c], "v_out": [c],
        "ff_conv1_channels_in": [c], "ff_conv1_channels_out": [2 * c],
        "ff_conv2_channels_in": [2 * c], "ff_conv2_channels_out": [c],
    })
    return ref_attention.Neighbor2PointAttention(cfg, 0)


@pytest.mark.parametrize("train", [False, True])
@pytest.mark.parametrize(
    "mode,asm,group_type",
    [("scalar_dot", "dot", "diff"),
     ("scalar_dot", "dot-sub", "neighbor"),
     ("vector_sub", "dot", "diff")],
)
def test_n2p_matches_reference(train, mode, asm, group_type):
    rng = _seed_all(5)
    tmod = _make_ref_n2p(mode=mode, asm=asm, group_type=group_type)
    _randomize_bn_stats(tmod, rng)
    tmod.train(train)
    x = rng.standard_normal((2, 40, 32)).astype(np.float32)
    with torch.no_grad():
        t_out = tmod(torch.from_numpy(x.transpose(0, 2, 1)))

    p, s = interop.attention_tree(tmod.state_dict(), "")
    jmod = Neighbor2PointAttention(
        k=6, group_type=group_type, num_heads=4, attention_mode=mode,
        asm=asm, q_out=32, k_out=32, v_out=32, ff_hidden=64, ff_out=32,
        train=train,
    )
    variables = {"params": p, "batch_stats": s}
    if train:
        j_out, _ = jmod.apply(variables, jnp.asarray(x),
                              mutable=["batch_stats"])
    else:
        j_out = jmod.apply(variables, jnp.asarray(x))
    _assert_close(np.moveaxis(np.asarray(j_out), -1, 1), t_out.numpy(),
                  rtol=5e-4, atol=5e-5,
                  what=f"N2P {mode}/{asm}/{group_type} train={train}")


# ---------------------------------------------------------------------------
# Bin machinery  (utils/ops.py:174-464)
# ---------------------------------------------------------------------------

def test_bin_partition_dynamic_matches_reference():
    rng = _seed_all(6)
    scores = rng.standard_normal((4, 1, 60)).astype(np.float32)
    num_bins = 6

    t_bounds, t_mask = ref_ops.bin_partition(
        torch.from_numpy(scores.copy()), None, True, 0.99, num_bins
    )
    scores_z = ops.zscore(jnp.asarray(scores), axis=2)
    j_inner = ops.compute_bin_boundaries_from_scores(scores_z, num_bins)
    _assert_close(j_inner, t_bounds[0][0, 0, 0, 1:].numpy(),
                  what="seeded inner boundaries")
    _, j_mask = ops.bin_partition(
        jnp.asarray(scores), j_inner, num_bins,
        dynamic=False, momentum=0.99, update=False,
    )
    np.testing.assert_array_equal(
        np.asarray(j_mask), t_mask.numpy(),
        err_msg="bin masks",
    )

    # EMA update against an existing boundary state
    old_inner = np.sort(rng.standard_normal(num_bins - 1).astype(np.float32))[::-1]
    upper = torch.tensor(np.concatenate([[np.inf], old_inner]).reshape(1, 1, 1, -1))
    lower = torch.tensor(np.concatenate([old_inner, [-np.inf]]).reshape(1, 1, 1, -1))
    t_bounds2, _ = ref_ops.bin_partition(
        torch.from_numpy(scores.copy()), [upper, lower], True, 0.9, num_bins
    )
    j_new = ops.update_bin_boundaries(
        jnp.asarray(old_inner.copy()), scores_z, num_bins, 0.9
    )
    _assert_close(j_new, t_bounds2[0][0, 0, 0, 1:].numpy(),
                  what="EMA-updated boundaries")


def test_water_filling_matches_reference():
    rng = _seed_all(7)
    b, num_bins, m = 5, 6, 24
    bin_prob = rng.uniform(0, 1, (b, num_bins)).astype(np.float32)
    counts = rng.integers(2, 20, (b, num_bins)).astype(np.int64)
    counts[0, :] = [24, 2, 2, 2, 2, 2]  # saturation case

    t_counts = ref_ops.calculate_num_points_to_choose(
        torch.from_numpy(bin_prob.copy()), torch.from_numpy(counts.copy()), m
    )
    j_counts = ops.calculate_num_points_to_choose(
        jnp.asarray(bin_prob), jnp.asarray(counts.astype(np.int32)), m
    )
    np.testing.assert_array_equal(np.asarray(j_counts), t_counts.numpy())


def test_bin_weights_matches_reference():
    rng = _seed_all(8)
    b, n, nb = 3, 40, 6
    logits = rng.standard_normal((b, 1, n, nb)).astype(np.float32)
    mask = rng.uniform(0, 1, (b, 1, n, nb)) < 0.3
    for order in ("mean_relu", "relu_mean"):
        # reference computes this inside DownSampleToken
        dummy = ref_downsample.DownSampleToken.__new__(
            ref_downsample.DownSampleToken
        )
        t_w, t_pre = ref_downsample.DownSampleToken.bin_weghts_calculation(
            dummy, torch.from_numpy(logits.copy()),
            torch.from_numpy(mask.copy()), order,
        )
        j_w, j_pre = ops.bin_weights_calculation(
            jnp.asarray(logits), jnp.asarray(mask), order
        )
        _assert_close(j_w, t_w.numpy(), what=f"bin_weights {order}")
        _assert_close(j_pre, t_pre.numpy(), what=f"bin_weights_pre {order}")


# ---------------------------------------------------------------------------
# DownSampleToken  (models/downsample.py:15-378)
# ---------------------------------------------------------------------------

def _token_cfg(m=24, k=6, c=32, num_bins=6, static=True):
    from samble_tpu.config.loader import Config

    inner = [1.0, 0.5, 0.0, -0.5, -1.0]
    return Config({
        "M": [m], "K": k, "asm": ["dot"],
        "res": {"enable": [False], "ff": [False]},
        "num_heads": [1], "idx_mode": ["sparse_col_sqr"],
        "q_in": [c], "q_out": [c], "k_in": [c], "k_out": [c],
        "v_in": [c], "v_out": [c],
        "bin": {
            "num_bins": [num_bins], "scaling_factor": [1.0],
            "sample_mode": ["topk"], "norm_mode": ["minmax"],
            "momentum_update_factor": [0.99],
            "dynamic_boundaries_enable": not static,
            "bin_boundaries": [list(inner)],
            "relu_mean_order": ["mean_relu"],
            "token_mode": ["multi_token"],
            "boltzmann_T": [0.1],
            "token_orthognonal_loss_factor": 0.0,
        },
        "boltzmann": {"enable": [False], "boltzmann_T": [1.0],
                      "norm_mode": ["minmax"]},
    })


def test_downsample_token_matches_reference():
    rng = _seed_all(9)
    cfg = _token_cfg()
    tmod = ref_downsample.DownSampleToken(cfg, 0)
    tmod.eval()
    x = rng.standard_normal((2, 48, 32)).astype(np.float32)
    with torch.no_grad():
        (t_xds, t_idx), _ = tmod(torch.from_numpy(x.transpose(0, 2, 1)))

    p, s = interop.downsample_token_tree(tmod.state_dict(), "")
    jmod = DownSampleToken(
        m=24, k=6, num_heads=1, asm="dot", idx_mode="sparse_col_sqr",
        num_bins=6, q_out=32, k_out=32, v_out=32, sample_mode="topk",
        dynamic_boundaries=False,
        static_boundaries=(1.0, 0.5, 0.0, -0.5, -1.0), train=False,
    )
    variables = {"params": p}
    j_xds, j_idx, _, aux = jmod.apply(variables, jnp.asarray(x))

    _assert_close(
        aux["attention_point_score"][:, 0],
        tmod.attention_point_score[:, 0].numpy(),
        what="attention_point_score",
    )
    np.testing.assert_array_equal(
        np.asarray(aux["bin_points_mask"]), tmod.bin_points_mask.numpy(),
        err_msg="bin_points_mask",
    )
    np.testing.assert_array_equal(
        np.asarray(aux["k_point_to_choose"]),
        tmod.k_point_to_choose.numpy(),
        err_msg="k_point_to_choose",
    )
    np.testing.assert_array_equal(
        np.asarray(j_idx), t_idx[:, 0].numpy(), err_msg="selected indices"
    )
    _assert_close(np.moveaxis(np.asarray(j_xds), -1, 1), t_xds.numpy(),
                  rtol=5e-4, atol=5e-5, what="x_ds")
    _assert_close(
        aux["attention_bins_beforesoftmax"],
        tmod.attention_bins_beforesoftmax[:, 0].numpy(),
        what="attention_bins_beforesoftmax",
    )


# ---------------------------------------------------------------------------
# Full ClsModel forward  (models/cls_model.py)
# ---------------------------------------------------------------------------

def _tiny_cls_config():
    inner = [[1.0, 0.5, 0.0, -0.5, -1.0]] * 2
    return load_config(
        "configs/default.yaml", "configs/datasets/modelnet.yaml",
        "configs/cls.yaml",
        [
            "train.dataloader.selected_points=64",
            "feature_learning_block.downsample.M=[32,16]",
            "feature_learning_block.downsample.K=8",
            "feature_learning_block.downsample.bin.sample_mode=[topk,topk]",
            "feature_learning_block.downsample.bin.dynamic_boundaries_enable=false",
            f"feature_learning_block.downsample.bin.bin_boundaries={inner}",
            "feature_learning_block.embedding.K=[8,8]",
            "feature_learning_block.attention.K=[8,8,8]",
            # the reference module requires an explicit asm list
            # (models/attention.py:147); our factory defaults it to 'dot'
            "feature_learning_block.attention.asm=[dot,dot,dot]",
        ],
    )


def test_cls_model_forward_matches_reference():
    rng = _seed_all(10)
    # NOTE: the reference DownSampleToken.__init__ appends ±inf to the
    # config's bin_boundaries lists IN PLACE (models/downsample.py:96-99) —
    # each side gets its own config instance.
    tmod = ref_cls_model.ModelNetModel(_tiny_cls_config())
    cfg = _tiny_cls_config()
    _randomize_bn_stats(tmod, rng)
    tmod.eval()
    x = rng.standard_normal((2, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_logits = tmod(torch.from_numpy(x.transpose(0, 2, 1)))

    variables = interop.import_cls_model(tmod.state_dict(), cfg)
    jmod = ClsModel(cfg=cfg, num_classes=40, train=False)
    j_logits, _ = jmod.apply(variables, jnp.asarray(x))
    _assert_close(np.asarray(j_logits), t_logits.numpy(),
                  rtol=2e-3, atol=2e-4, what="ClsModel logits")


def test_torch_checkpoint_file_roundtrip(tmp_path):
    """``load_torch_checkpoint`` on the reference's save format
    (train_modelnet.py:491-509: DDP-prefixed state_dict + dynamic
    bin_boundaries pairs) must reproduce the torch model's eval outputs with
    the boundaries frozen at their checkpointed values."""
    rng = _seed_all(11)
    tmod = ref_cls_model.ModelNetModel(_tiny_cls_config())
    _randomize_bn_stats(tmod, rng)
    tmod.eval()
    x = rng.standard_normal((2, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_logits = tmod(torch.from_numpy(x.transpose(0, 2, 1)))

    # package exactly as the reference training loop does, with the
    # boundaries the torch model would carry had it trained dynamically
    inner = np.asarray([1.0, 0.5, 0.0, -0.5, -1.0], np.float32)
    pair = [
        torch.tensor(np.r_[np.inf, inner].reshape(1, 1, 1, 6)),
        torch.tensor(np.r_[inner, -np.inf].reshape(1, 1, 1, 6)),
    ]
    sd = {f"module.{k}": v for k, v in tmod.state_dict().items()}
    path = tmp_path / "checkpoint.pt"
    torch.save({"model_state_dict": sd, "bin_boundaries": [pair, pair]},
               str(path))

    # dynamic-boundaries config: the flax eval path reads the frozen
    # bin_stats state, mirroring the reference's dynamic→static conversion
    cfg = _tiny_cls_config()
    cfg.set_dotted(
        "feature_learning_block.downsample.bin.dynamic_boundaries_enable",
        True,
    )
    variables = interop.load_torch_checkpoint(str(path), cfg, "cls")
    assert bool(np.asarray(
        variables["bin_stats"]["ClsFeatureBlock_0"]["DownSampleToken_0"]
        ["initialized"]
    ))
    jmod = ClsModel(cfg=cfg, num_classes=40, train=False)
    j_logits, _ = jmod.apply(variables, jnp.asarray(x))
    _assert_close(np.asarray(j_logits), t_logits.numpy(),
                  rtol=2e-3, atol=2e-4, what="checkpoint-restored logits")


def _tiny_seg_config():
    inner = [[1.0, 0.0, -1.0]] * 2
    return load_config(
        "configs/default.yaml", "configs/datasets/shapenet.yaml",
        "configs/seg.yaml",
        [
            "train.dataloader.selected_points=64",
            "feature_learning_block.downsample.M=[32,16]",
            "feature_learning_block.downsample.K=8",
            "feature_learning_block.downsample.bin.sample_mode=[topk,topk]",
            "feature_learning_block.downsample.bin.dynamic_boundaries_enable=false",
            f"feature_learning_block.downsample.bin.bin_boundaries={inner}",
            "feature_learning_block.downsample.bin.relu_mean_order=[mean_relu,mean_relu]",
            "feature_learning_block.downsample.bin.token_mode=[multi_token,multi_token]",
            "feature_learning_block.embedding.K=[8,8]",
            "feature_learning_block.attention.K=[8,8,8,8,8]",
            "feature_learning_block.attention.asm=[dot,dot,dot,dot,dot]",
        ],
    )


def test_seg_model_forward_matches_reference():
    import models.seg_model as ref_seg_model
    from samble_tpu.models import SegModel

    rng = _seed_all(12)
    tmod = ref_seg_model.ShapeNetModel(_tiny_seg_config())
    cfg = _tiny_seg_config()
    _randomize_bn_stats(tmod, rng)
    tmod.eval()
    x = rng.standard_normal((2, 64, 3)).astype(np.float32)
    cat = np.zeros((2, 16), np.float32)
    cat[0, 3] = 1.0
    cat[1, 11] = 1.0
    with torch.no_grad():
        t_out = tmod(torch.from_numpy(x.transpose(0, 2, 1)),
                     torch.from_numpy(cat[..., None]))

    variables = interop.import_seg_model(tmod.state_dict(), cfg)
    jmod = SegModel(cfg=cfg, train=False)
    j_out, _ = jmod.apply(variables, jnp.asarray(x), jnp.asarray(cat))
    _assert_close(np.moveaxis(np.asarray(j_out), -1, 1), t_out.numpy(),
                  rtol=2e-3, atol=2e-4, what="SegModel logits")


def test_cls_import_covers_full_tree():
    """Every leaf of the initialized flax model must be produced by the
    importer with the right shape (catches silent tree drift)."""
    tmod = ref_cls_model.ModelNetModel(_tiny_cls_config())
    cfg = _tiny_cls_config()  # the torch init mutates its copy (see above)
    variables = interop.import_cls_model(tmod.state_dict(), cfg)
    jmod = ClsModel(cfg=cfg, num_classes=40, train=False)
    ref_vars = jmod.init({"params": jax.random.key(0)},
                         jnp.zeros((1, 64, 3), jnp.float32))

    got = {
        "/".join(str(k.key) for k in path): tuple(np.shape(leaf))
        for path, leaf in jax.tree_util.tree_flatten_with_path(variables)[0]
    }
    want = {
        "/".join(str(k.key) for k in path): tuple(np.shape(leaf))
        for path, leaf in jax.tree_util.tree_flatten_with_path(
            {k: v for k, v in ref_vars.items() if k in ("params", "batch_stats")}
        )[0]
    }
    assert got == want


# ---------------------------------------------------------------------------
# Remaining module families: P2P attention, APES local/global downsamplers,
# crossA / selfA upsamplers  (models/attention.py:253-355,
# models/downsample.py:818-1405, models/upsample.py:8-133)
# ---------------------------------------------------------------------------

def test_p2p_attention_matches_reference():
    from samble_tpu.nn.attention import Point2PointAttention

    rng = _seed_all(20)
    for asm in ("dot", "l2", "l2+"):
        tmod = ref_attention.Point2PointAttention(_p2p_cfg(asm), 0)
        _randomize_bn_stats(tmod, rng)
        tmod.eval()
        x = rng.standard_normal((2, 40, 32)).astype(np.float32)
        with torch.no_grad():
            t_out = tmod(torch.from_numpy(x.transpose(0, 2, 1)))
        p, s = interop.attention_tree(tmod.state_dict(), "")
        jmod = Point2PointAttention(
            num_heads=4, asm=asm, q_out=32, k_out=32, v_out=32,
            ff_hidden=64, ff_out=32, train=False,
        )
        j_out = jmod.apply({"params": p, "batch_stats": s}, jnp.asarray(x))
        _assert_close(np.moveaxis(np.asarray(j_out), -1, 1), t_out.numpy(),
                      rtol=5e-4, atol=5e-5, what=f"P2P asm={asm}")


def _p2p_cfg(asm, c=32, heads=4):
    from samble_tpu.config.loader import Config

    return Config({
        "num_heads": [heads], "attention_mode": ["scalar_dot"], "asm": [asm],
        "q_in": [c], "q_out": [c], "k_in": [c], "k_out": [c],
        "v_in": [c], "v_out": [c],
        "ff_conv1_channels_in": [c], "ff_conv1_channels_out": [2 * c],
        "ff_conv2_channels_in": [2 * c], "ff_conv2_channels_out": [c],
    })


def _apes_ds_cfg(m=24, c=32, idx_mode="sparse_col_sqr", asm="dot"):
    from samble_tpu.config.loader import Config

    return Config({
        "M": [m], "K": 32, "asm": [asm],
        "res": {"enable": [False], "ff": [False]},
        "num_heads": [1], "idx_mode": [idx_mode],
        "q_in": [c], "q_out": [c], "k_in": [c], "k_out": [c],
        "v_in": [c], "v_out": [c],
        "bin": {"num_bins": [6], "scaling_factor": [1.0],
                "sample_mode": ["topk"], "norm_mode": ["minmax"]},
        "boltzmann": {"enable": [False], "boltzmann_T": [0.1],
                      "norm_mode": ["minmax"]},
        "pe": {"enable": [False], "mode": ["III"]},
    })


@pytest.mark.parametrize("idx_mode", ["local_std", "sparse_col_sqr",
                                      "sparse_col_sum", "sparse_col_avg"])
def test_downsample_local_matches_reference(idx_mode):
    from samble_tpu.nn.downsample import DownSampleLocal

    rng = _seed_all(21)
    tmod = ref_downsample.DownSampleLocal(_apes_ds_cfg(idx_mode=idx_mode), 0)
    tmod.eval()
    # K is hardcoded to 32 in the reference (models/downsample.py:836);
    # use N > K for meaningful neighborhoods
    x = rng.standard_normal((2, 48, 32)).astype(np.float32)
    with torch.no_grad():
        (t_xds, t_idx), (t_xdrop, t_idxdrop) = tmod(
            torch.from_numpy(x.transpose(0, 2, 1))
        )
    jmod = DownSampleLocal(
        m=24, num_heads=1, asm="dot", idx_mode=idx_mode,
        q_out=32, k_out=32, v_out=32, k=32, train=False,
    )
    p, _ = interop.downsample_apes_tree(tmod.state_dict(), "")
    j_xds, j_idx, (j_xdrop, j_idxdrop), aux = jmod.apply(
        {"params": p}, jnp.asarray(x)
    )
    np.testing.assert_array_equal(np.asarray(j_idx), t_idx[:, 0].numpy(),
                                  err_msg="selected idx")
    np.testing.assert_array_equal(
        np.asarray(j_idxdrop), t_idxdrop[:, 0].numpy(), err_msg="dropped idx"
    )
    _assert_close(np.moveaxis(np.asarray(j_xds), -1, 1), t_xds.numpy(),
                  rtol=5e-4, atol=5e-5, what="local x_ds")
    _assert_close(np.moveaxis(np.asarray(j_xdrop), -1, 1), t_xdrop.numpy(),
                  rtol=5e-4, atol=5e-5, what="local x_dropped")


@pytest.mark.parametrize("idx_mode", ["col_sum", "sparse_col_sqr",
                                      "sparse_col_sum_sqr"])
def test_downsample_global_matches_reference(idx_mode):
    from samble_tpu.nn.downsample import DownSampleGlobal

    rng = _seed_all(22)
    tmod = ref_downsample.DownSampleGlobal(_apes_ds_cfg(idx_mode=idx_mode), 0)
    tmod.eval()
    x = rng.standard_normal((2, 48, 32)).astype(np.float32)
    with torch.no_grad():
        (t_xds, t_idx), (t_xdrop, t_idxdrop) = tmod(
            torch.from_numpy(x.transpose(0, 2, 1))
        )
    jmod = DownSampleGlobal(
        m=24, num_heads=1, asm="dot", idx_mode=idx_mode,
        q_out=32, k_out=32, v_out=32, k=32, train=False,
    )
    p, _ = interop.downsample_apes_tree(tmod.state_dict(), "")
    j_xds, j_idx, (j_xdrop, j_idxdrop), aux = jmod.apply(
        {"params": p}, jnp.asarray(x)
    )
    np.testing.assert_array_equal(np.asarray(j_idx), t_idx[:, 0].numpy(),
                                  err_msg="selected idx")
    np.testing.assert_array_equal(
        np.asarray(j_idxdrop), t_idxdrop[:, 0].numpy(), err_msg="dropped idx"
    )
    _assert_close(np.moveaxis(np.asarray(j_xds), -1, 1), t_xds.numpy(),
                  rtol=5e-4, atol=5e-5, what="global x_ds")
    _assert_close(np.moveaxis(np.asarray(j_xdrop), -1, 1), t_xdrop.numpy(),
                  rtol=5e-4, atol=5e-5, what="global x_dropped")


def _us_cfg(c=32, heads=4):
    from samble_tpu.config.loader import Config

    return Config({
        "q_in": [c], "q_out": [c], "k_in": [c], "k_out": [c],
        "v_in": [c], "v_out": [c], "num_heads": [heads],
        "interpolation": {"distance_type": ["xyz"], "K": [3]},
    })


def test_upsample_crossa_matches_reference():
    import models.upsample as ref_upsample
    from samble_tpu.nn.upsample import UpSampleCrossAttention

    rng = _seed_all(23)
    tmod = ref_upsample.UpSample(_us_cfg(), 0)
    tmod.eval()
    up = rng.standard_normal((2, 48, 32)).astype(np.float32)
    sel = rng.standard_normal((2, 24, 32)).astype(np.float32)
    with torch.no_grad():
        t_out = tmod(
            torch.from_numpy(up.transpose(0, 2, 1)),
            ((torch.from_numpy(sel.transpose(0, 2, 1)), None, None),
             (None, None)),
            None,
        )
    jmod = UpSampleCrossAttention(num_heads=4, q_out=32, k_out=32, v_out=32,
                                  train=False)
    p, _ = interop.upsample_attention_tree(tmod.state_dict(), "")
    j_out = jmod.apply({"params": p}, jnp.asarray(up), jnp.asarray(sel))
    _assert_close(np.moveaxis(np.asarray(j_out), -1, 1), t_out.numpy(),
                  rtol=5e-4, atol=5e-5, what="crossA out")


def test_upsample_selfa_matches_reference():
    import models.upsample as ref_upsample
    from samble_tpu.nn.upsample import UpSampleSelfAttention

    rng = _seed_all(24)
    tmod = ref_upsample.UpSampleSelfAttention(_us_cfg(), 0)
    tmod.eval()
    n, m = 48, 24
    up = rng.standard_normal((2, n, 32)).astype(np.float32)
    sel = rng.standard_normal((2, m, 32)).astype(np.float32)
    drop = rng.standard_normal((2, n - m, 32)).astype(np.float32)
    perm = np.stack([rng.permutation(n) for _ in range(2)]).astype(np.int64)
    idx_sel, idx_drop = perm[:, :m], perm[:, m:]
    with torch.no_grad():
        t_out = tmod(
            torch.from_numpy(up.transpose(0, 2, 1)),
            ((torch.from_numpy(sel.transpose(0, 2, 1)),
              torch.from_numpy(idx_sel[:, None, :]), None),
             (torch.from_numpy(drop.transpose(0, 2, 1)),
              torch.from_numpy(idx_drop[:, None, :]))),
            None,
        )
    jmod = UpSampleSelfAttention(num_heads=4, q_out=32, k_out=32, v_out=32,
                                 train=False)
    p, _ = interop.upsample_attention_tree(tmod.state_dict(), "")
    j_out = jmod.apply(
        {"params": p}, jnp.asarray(up), jnp.asarray(sel),
        idx_select=jnp.asarray(idx_sel.astype(np.int32)),
        points_drop=jnp.asarray(drop),
        idx_drop=jnp.asarray(idx_drop.astype(np.int32)),
    )
    _assert_close(np.moveaxis(np.asarray(j_out), -1, 1), t_out.numpy(),
                  rtol=5e-4, atol=5e-5, what="selfA out")


def test_edgeconv_normal_channel_matches_reference():
    """6-channel (xyz+normal) EdgeConv: the kNN graph must come from the
    xyz half only (utils/ops.py:51-54) while features use all 6 channels."""
    from samble_tpu.config.loader import Config

    rng = _seed_all(25)
    cfg = Config({
        "K": [6], "group_type": ["center_diff"], "normal_channel": True,
        "conv1_in": [12], "conv1_out": [16], "conv2_in": [16],
        "conv2_out": [16],
    })
    tmod = ref_embedding.EdgeConv(cfg, 0)
    _randomize_bn_stats(tmod, rng)
    tmod.eval()
    xyz = rng.standard_normal((2, 40, 3)).astype(np.float32)
    nrm = rng.standard_normal((2, 40, 3))
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    x = np.concatenate([xyz, nrm.astype(np.float32)], -1)
    with torch.no_grad():
        t_out = tmod(torch.from_numpy(x.transpose(0, 2, 1)))
    p, s = interop.edgeconv_tree(tmod.state_dict(), "")
    jmod = EdgeConv(k=6, group_type="center_diff", conv1_out=16, conv2_out=16,
                    normal_channel=True, train=False)
    j_out = jmod.apply({"params": p, "batch_stats": s}, jnp.asarray(x))
    _assert_close(np.moveaxis(np.asarray(j_out), -1, 1), t_out.numpy(),
                  what="EdgeConv normal_channel")

# ---------------------------------------------------------------------------
# Checkpoint-import coverage for the APES variants (round-5 verdict item 5):
# full-model import through samble_tpu.interop for ds_which=global/local,
# module-level import for carve (the reference's carve forward crashes as
# shipped — models/downsample.py:458 calls a bin_conv whose layers are never
# constructed — so the oracle needs that call patched out), and full seg
# models with the crossA / selfA upsamplers.
# ---------------------------------------------------------------------------

def _variant_cls_config(ds_which):
    return load_config(
        "configs/default.yaml", "configs/datasets/modelnet.yaml",
        "configs/cls.yaml",
        [
            "train.dataloader.selected_points=64",
            f"feature_learning_block.downsample.ds_which={ds_which}",
            "feature_learning_block.downsample.M=[32,16]",
            "feature_learning_block.downsample.K=8",
            "feature_learning_block.downsample.idx_mode=[sparse_col_sqr,sparse_col_sqr]",
            "feature_learning_block.embedding.K=[8,8]",
            "feature_learning_block.attention.K=[8,8,8]",
            "feature_learning_block.attention.asm=[dot,dot,dot]",
        ],
    )


@pytest.mark.parametrize("ds_which", ["global", "local"])
def test_cls_model_import_apes_variant(ds_which):
    """Full ModelNetModel with an APES downsampler → import_cls_model →
    identical logits (reference models/downsample.py:818,1232)."""
    rng = _seed_all(30)
    tmod = ref_cls_model.ModelNetModel(_variant_cls_config(ds_which))
    cfg = _variant_cls_config(ds_which)
    _randomize_bn_stats(tmod, rng)
    tmod.eval()
    x = rng.standard_normal((2, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_logits = tmod(torch.from_numpy(x.transpose(0, 2, 1)))
    variables = interop.import_cls_model(tmod.state_dict(), cfg)
    jmod = ClsModel(cfg=cfg, num_classes=40, train=False)
    j_logits, _ = jmod.apply(variables, jnp.asarray(x))
    _assert_close(np.asarray(j_logits), t_logits.numpy(),
                  rtol=2e-3, atol=2e-4, what=f"ClsModel[{ds_which}] logits")


@pytest.mark.parametrize("pe_mode", [None, "III", "IV"])
def test_downsample_carve_import_matches_reference(pe_mode):
    """DownSampleCarve import (incl. the optional positional-encoding convs,
    models/downsample.py:442-453).  The oracle's broken ``bin_conv`` call
    (:458, layers never constructed) is patched to the identity the shipped
    code path implies."""
    from samble_tpu.nn.downsample import DownSampleCarve

    rng = _seed_all(31)
    cfg = _apes_ds_cfg()
    if pe_mode is not None:
        cfg = _apes_ds_cfg()
        cfg["pe"] = {"enable": [True], "mode": [pe_mode]}
    tmod = ref_downsample.DownSampleCarve(cfg, 0)
    tmod.bin_conv = lambda x: (x, None)  # dead-code patch (see docstring)
    tmod.eval()
    x = rng.standard_normal((2, 48, 32)).astype(np.float32)
    xyz = rng.standard_normal((2, 48, 3)).astype(np.float32)
    with torch.no_grad():
        (t_xds, t_idx), _ = tmod(
            torch.from_numpy(x.transpose(0, 2, 1)),
            torch.from_numpy(xyz.transpose(0, 2, 1)),
        )
    p, s = interop.downsample_apes_tree(
        tmod.state_dict(), "", pe=pe_mode is not None,
        pe_mode=pe_mode or "III",
    )
    jmod = DownSampleCarve(
        m=24, k=32, num_heads=1, asm="dot", idx_mode="sparse_col_sqr",
        q_out=32, k_out=32, v_out=32, pe=pe_mode is not None,
        pe_mode=pe_mode or "III", train=False,
    )
    j_xds, j_idx, _, aux = jmod.apply(
        {"params": p}, jnp.asarray(x), jnp.asarray(xyz)
    )
    np.testing.assert_array_equal(np.asarray(j_idx), t_idx[:, 0].numpy(),
                                  err_msg="carve selected idx")
    _assert_close(np.moveaxis(np.asarray(j_xds), -1, 1), t_xds.numpy(),
                  rtol=5e-4, atol=5e-5, what="carve x_ds")


def _variant_seg_config(us_which, ds_which="global"):
    return load_config(
        "configs/default.yaml", "configs/datasets/shapenet.yaml",
        "configs/seg.yaml",
        [
            "train.dataloader.selected_points=64",
            f"feature_learning_block.downsample.ds_which={ds_which}",
            f"feature_learning_block.upsample.us_which={us_which}",
            "feature_learning_block.downsample.M=[32,16]",
            "feature_learning_block.downsample.K=8",
            "feature_learning_block.downsample.idx_mode=[sparse_col_sqr,sparse_col_sqr]",
            "feature_learning_block.embedding.K=[8,8]",
            "feature_learning_block.attention.K=[8,8,8,8,8]",
            "feature_learning_block.attention.asm=[dot,dot,dot,dot,dot]",
        ],
    )


@pytest.mark.parametrize("us_which", ["crossA", "selfA"])
def test_seg_model_import_attention_upsampler(us_which):
    """Full ShapeNetModel with the crossA / selfA upsampler (paired with the
    APES global downsampler, which supplies the dropped complement selfA
    scatters back — models/upsample.py:8-133) → import_seg_model →
    identical logits."""
    import models.seg_model as ref_seg_model
    from samble_tpu.models import SegModel

    rng = _seed_all(32)
    tmod = ref_seg_model.ShapeNetModel(_variant_seg_config(us_which))
    cfg = _variant_seg_config(us_which)
    _randomize_bn_stats(tmod, rng)
    tmod.eval()
    x = rng.standard_normal((2, 64, 3)).astype(np.float32)
    cat = np.zeros((2, 16), np.float32)
    cat[0, 3] = 1.0
    cat[1, 11] = 1.0
    with torch.no_grad():
        t_out = tmod(torch.from_numpy(x.transpose(0, 2, 1)),
                     torch.from_numpy(cat[..., None]))
    variables = interop.import_seg_model(tmod.state_dict(), cfg)
    jmod = SegModel(cfg=cfg, train=False)
    j_out, _ = jmod.apply(variables, jnp.asarray(x), jnp.asarray(cat))
    # Wider tolerance than the interpolation path: the attention upsamplers
    # run full N×N softmax-attention over activations that the randomized
    # BN stats push to O(100), so f32 association-order noise between torch
    # conv1d and XLA matmul amplifies to ~2e-2 on the logits (verified
    # stage-by-stage: the index scatter is EXACT, attn maps agree to 5e-5;
    # the drift is matmul accumulation, not wiring).  The argmax assertion
    # keeps the test decision-sharp.
    j_np = np.moveaxis(np.asarray(j_out), -1, 1)
    _assert_close(j_np, t_out.numpy(), rtol=1e-2, atol=2.5e-2,
                  what=f"SegModel[{us_which}] logits")
    agree = float((j_np.argmax(1) == t_out.numpy().argmax(1)).mean())
    assert agree >= 0.97, f"per-point argmax agreement {agree:.4f}"
