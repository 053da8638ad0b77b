"""Unit tests for utils.logging: ProgressBar cadence + artifact linking."""

import io
import os

from samble_tpu.utils.logging import ProgressBar, _link_tree


def test_progress_bar_non_tty_cadence():
    bar = ProgressBar(120, "epoch 1/2", print_every=50)
    bar._stream = io.StringIO()
    bar._tty = False
    bar._enabled = True
    for step in range(1, 121):
        bar.update(step, loss=0.5)
    bar.finish()
    lines = bar._stream.getvalue().strip().splitlines()
    # prints at 50, 100 and the final step only — pipes/JSONL stay readable
    assert len(lines) == 3
    assert "[50/120]" in lines[0] and "[120/120]" in lines[-1]
    assert "loss 0.5000" in lines[0]


def test_progress_bar_none_metric():
    bar = ProgressBar(50, "e", print_every=50)
    bar._stream = io.StringIO()
    bar._tty = False
    bar._enabled = True
    bar.update(50, loss=None)  # first step of an epoch has no prior loss
    assert "loss" not in bar._stream.getvalue()


def test_link_tree_survives_source_removal(tmp_path):
    src = tmp_path / "src" / "nested"
    os.makedirs(src)
    (src / "a.bin").write_bytes(b"x" * 32)
    dst = tmp_path / "dst"
    _link_tree(str(tmp_path / "src"), str(dst))
    import shutil

    shutil.rmtree(tmp_path / "src")  # orbax max_to_keep eviction analog
    assert (dst / "nested" / "a.bin").read_bytes() == b"x" * 32
