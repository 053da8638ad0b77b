"""Interop on a genuinely TRAINED reference checkpoint.

The roundtrip tests in test_reference_parity.py drive the converter with
randomly-initialized weights; this file closes the remaining gap: the torch
reference is actually trained for a few dozen steps on CPU (real optimizer
updates, dynamic bin-boundary EMA running, BN stats accumulating), saved in
the reference's own checkpoint format (train_modelnet.py:491-509), imported
through ``samble_tpu.interop`` — and the flax eval must reproduce the torch
model's own eval DECISIONS, not just roundtrip tensors.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.append(REF)

from models import cls_model as ref_cls_model  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from samble_tpu import interop  # noqa: E402
from samble_tpu.models import ClsModel  # noqa: E402

from tests.test_reference_parity import _tiny_cls_config  # noqa: E402

NUM_CLASSES = 4  # synthetic classes (reference head stays 40-wide)


def _synthetic_batch(rng, bs, n=64):
    """Class-conditioned clouds a tiny model can actually learn: class c is
    a gaussian blob stretched along axis c%3 and offset by c."""
    label = rng.integers(0, NUM_CLASSES, bs)
    pts = rng.normal(size=(bs, n, 3)).astype(np.float32) * 0.3
    for i, c in enumerate(label):
        pts[i, :, c % 3] *= 2.0 + c
        pts[i] += 0.5 * c
    return pts, label.astype(np.int64)


def test_trained_torch_checkpoint_decisions_match(tmp_path):
    torch.manual_seed(0)
    cfg_t = _tiny_cls_config()
    cfg_t.set_dotted(
        "feature_learning_block.downsample.bin.dynamic_boundaries_enable",
        True,
    )
    tmod = ref_cls_model.ModelNetModel(cfg_t)
    tmod.train()
    opt = torch.optim.Adam(tmod.parameters(), lr=1e-3)
    ce = torch.nn.CrossEntropyLoss()

    rng = np.random.default_rng(0)
    losses = []
    for step in range(30):
        pts, label = _synthetic_batch(rng, 8)
        x = torch.from_numpy(pts.transpose(0, 2, 1))  # (B, 3, N)
        opt.zero_grad()
        logits = tmod(x)
        loss = ce(logits, torch.from_numpy(label))
        loss.backward()
        opt.step()
        losses.append(float(loss))
    # the checkpoint must come from a model that actually learned —
    # otherwise "decisions match" is vacuous
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) - 0.3, (
        f"torch reference failed to learn: {losses[:3]} -> {losses[-3:]}"
    )

    # save exactly as the reference training loop does
    # (train_modelnet.py:495-508: DDP 'module.' prefix + live boundary pairs)
    sd = {f"module.{k}": v for k, v in tmod.state_dict().items()}
    path = tmp_path / "checkpoint.pt"
    torch.save(
        {
            "model_state_dict": sd,
            "bin_boundaries": [
                m.bin_boundaries for m in tmod.block.downsample_list
            ],
        },
        str(path),
    )

    # boundaries must have moved off their config init (EMA ran)
    b0 = (
        tmod.block.downsample_list[0].bin_boundaries[0]
        .detach().numpy().ravel()[1:]
    )
    assert not np.allclose(b0, [1.0, 0.5, 0.0, -0.5, -1.0]), (
        "dynamic boundary EMA never updated during training"
    )

    tmod.eval()
    rng_eval = np.random.default_rng(1)
    pts, label = _synthetic_batch(rng_eval, 16)
    with torch.no_grad():
        t_logits = tmod(torch.from_numpy(pts.transpose(0, 2, 1))).numpy()
    t_acc = (t_logits.argmax(-1) == label).mean()
    assert t_acc >= 0.5, f"trained torch model eval acc only {t_acc}"

    cfg_j = _tiny_cls_config()
    cfg_j.set_dotted(
        "feature_learning_block.downsample.bin.dynamic_boundaries_enable",
        True,
    )
    variables = interop.load_torch_checkpoint(str(path), cfg_j, "cls")
    jmod = ClsModel(cfg=cfg_j, num_classes=40, train=False)
    j_logits, _ = jmod.apply(variables, jnp.asarray(pts))
    j_logits = np.asarray(j_logits)

    # decision-level parity: the imported model must agree with torch's own
    # eval on every cloud, and the logits must agree numerically
    np.testing.assert_array_equal(j_logits.argmax(-1), t_logits.argmax(-1))
    np.testing.assert_allclose(j_logits, t_logits, rtol=5e-3, atol=5e-4)
