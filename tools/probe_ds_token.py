"""Sub-component decomposition of DownSampleToken (the top whole-step cost).

tools/profile_cls_eval.py showed the two DownSampleToken layers are 41% of
the primary eval step (34.9 + 16.0 ms at bs=256) and, unlike the
selection-bound EdgeConv/N2P kernels, sit at only ~35% of their HBM
roofline — so something inside is harvestable.  This probe times each
stage of the module at the real primary shapes:

  * fused score kernel (kNN + softmax colsums), fast_sel on/off and with
    different bisection budgets
  * the bin machinery (zscore, boundaries, partition, weights, budgets)
  * Gumbel index generation (argsort-based rank-within-bin)
  * the M selected attention rows recompute (XLA softmax) + @V
  * q/k/v projections

All large operands are threaded through ``timeit_chained(..., consts=...)``
— closing over them bakes them into the remote-compile request on the
tunnelled backend and trips its size limit (HTTP 413).

Run on an otherwise-idle TPU:  python tools/probe_ds_token.py
"""

from __future__ import annotations

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from samble_tpu import ops
from samble_tpu.kernels.score import (
    score_from_colsums,
    sparse_attention_score_fused,
)
from samble_tpu.utils.profiling import timeit_chained

BS = 256
SKIP_SWEEP = False
NUM_BINS = 6
KNN_K = 32
DT = jnp.bfloat16


def probe_layer(n: int, m: int):
    global BS
    print(f"\n=== DownSampleToken @N={n} -> M={m}, bs={BS} ===", flush=True)
    rng = np.random.default_rng(0)
    c = 128
    nt = n + NUM_BINS
    scale = 1.0 / np.sqrt(c)

    x = jnp.asarray(rng.normal(size=(BS, n, c)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(BS, n, c)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(BS, nt, c)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(BS, nt, c)).astype(np.float32)).astype(DT)

    res = {}

    def t(tag, fn, x0, consts=(), iters=10):
        dt = timeit_chained(fn, x0, iters=iters, consts=consts)
        res[tag] = dt * 1e3
        print(f"{tag:>38s}: {dt * 1e3:7.2f} ms", flush=True)
        return dt

    # 0. kNN feature normalization
    t("knn_normalized", lambda xx: ops.neighbors.knn_normalized(xx), x)
    xn = ops.neighbors.knn_normalized(x)

    # 1. fused score kernel variants
    def score_fast(q_, k_, xn_):
        cm, cf, cc = sparse_attention_score_fused(q_, k_, xn_, KNN_K, scale,
                                                  fast_sel=True)
        return cm * 1e-6 + cc * 1e-6

    def score_slow(q_, k_, xn_):
        cm, cf, cc = sparse_attention_score_fused(q_, k_, xn_, KNN_K, scale,
                                                  fast_sel=False)
        return cm * 1e-6 + cc * 1e-6

    t("score kernel (bisect 16)", score_fast, q, (k, xn))
    t("score kernel (K-round extract)", score_slow, q, (k, xn))

    # bisection budget sweep (monkeypatch the default)
    from samble_tpu.kernels import keys as keys_mod

    orig = keys_mod.kth_smallest_key_fast
    for rounds in (() if SKIP_SWEEP else (8, 12)):
        # force the round budget whether the caller passes it positionally
        # or by keyword (kernels/score.py passes it positionally)
        keys_mod.kth_smallest_key_fast = (
            lambda key, k, *a, _o=orig, _r=rounds, **kw: _o(key, k, _r)
        )
        try:
            t(f"score kernel (bisect {rounds})",
              lambda q_, k_, xn_: sparse_attention_score_fused.__wrapped__(
                  q_, k_, xn_, KNN_K, scale, False, True)[0] * 1e-6,
              q, (k, xn))
        finally:
            keys_mod.kth_smallest_key_fast = orig

    # 2. score postprocess + bin machinery
    cm, cf, cc = sparse_attention_score_fused(q, k, xn, KNN_K, scale)
    cm, cf, cc = jax.block_until_ready((cm, cf, cc))
    bins_pre = (jnp.einsum("bnc,btc->bnt", q, k[:, n:]) * scale)
    bins_pre = jax.block_until_ready(bins_pre)

    def bin_machinery(cm_, cf_, cc_, bins_pre_):
        score = score_from_colsums(cm_, cf_, cc_, "sparse_col_sqr")[:, None]
        scores_z = ops.zscore(score, axis=2)
        bounds = ops.compute_bin_boundaries_from_scores(scores_z, NUM_BINS)
        _, bin_mask = ops.bin_partition(score, bounds, NUM_BINS,
                                        dynamic=False, momentum=0.99,
                                        update=False)
        bw, bp = ops.bin_weights_calculation(bins_pre_[:, None], bin_mask,
                                             "mean_relu")
        mx = jnp.sum(bin_mask[:, 0], axis=1).astype(jnp.int32)
        kc = ops.calculate_num_points_to_choose(bw, mx, m)
        return (jnp.sum(score) + jnp.sum(bw) + jnp.sum(kc.astype(jnp.float32))
                + jnp.sum(bin_mask)) * 1e-6

    t("bin machinery (score->budgets)", bin_machinery, cm, (cf, cc, bins_pre))

    # 3. index generation (Gumbel + rank-within-bin)
    score = score_from_colsums(cm, cf, cc, "sparse_col_sqr")[:, None]
    scores_z = ops.zscore(score, axis=2)
    bounds = ops.compute_bin_boundaries_from_scores(scores_z, NUM_BINS)
    _, bin_mask = ops.bin_partition(score, bounds, NUM_BINS, dynamic=False,
                                    momentum=0.99, update=False)
    bw, _ = ops.bin_weights_calculation(bins_pre[:, None], bin_mask,
                                        "mean_relu")
    mx = jnp.sum(bin_mask[:, 0], axis=1).astype(jnp.int32)
    kc = ops.calculate_num_points_to_choose(bw, mx, m)
    kc = jax.block_until_ready(kc)
    key0 = jax.random.key(7)

    def gen_idx(score_, bin_mask_, kc_):
        idx = ops.generate_downsampled_index(
            key0, m, score_, bin_mask_, kc_, "random", 0.1)
        return jnp.sum(idx.astype(jnp.float32)) * 1e-6

    t("generate_downsampled_index", gen_idx, score, (bin_mask, kc))

    idx = ops.generate_downsampled_index(key0, m, score, bin_mask, kc,
                                         "random", 0.1)
    idx = jax.block_until_ready(idx)

    # 4. selected-row attention recompute (current XLA f32 path) + @V
    qb, kb = q.astype(DT), k.astype(DT)

    def attn_rows_f32(q_, kb_, v_, idx_):
        q_sel = ops.gather_by_idx(q_, idx_)
        attn = jax.nn.softmax(
            jnp.einsum("bmc,btc->bmt", q_sel, kb_).astype(jnp.float32)
            * scale,
            axis=-1).astype(DT)
        x_ds = jnp.einsum("bmn,bnc->bmc", attn, v_)
        return jnp.sum(x_ds.astype(jnp.float32)) * 1e-6

    t("attn rows recompute+@V (f32 sm)", attn_rows_f32, qb, (kb, v, idx))

    # 4b. same but bf16 softmax end to end
    def attn_rows_bf16(q_, kb_, v_, idx_):
        q_sel = ops.gather_by_idx(q_, idx_)
        attn = jax.nn.softmax(
            jnp.einsum("bmc,btc->bmt", q_sel, kb_) * scale, axis=-1)
        x_ds = jnp.einsum("bmn,bnc->bmc", attn, v_)
        return jnp.sum(x_ds.astype(jnp.float32)) * 1e-6

    t("attn rows recompute+@V (bf16 sm)", attn_rows_bf16, qb, (kb, v, idx))

    # 5. projections: 3 Conv1x1-equivalent matmuls (q on N rows, k/v on NT)
    wq = jnp.asarray(rng.normal(size=(c, c)).astype(np.float32)).astype(DT)
    xt = jnp.asarray(rng.normal(size=(BS, nt, c)).astype(np.float32))

    def projections(x_, xt_, wq_):
        a = x_.astype(DT) @ wq_
        bq = xt_.astype(DT) @ wq_
        cv = xt_.astype(DT) @ wq_
        return (jnp.sum(a.astype(jnp.float32)) + jnp.sum(bq.astype(jnp.float32))
                + jnp.sum(cv.astype(jnp.float32))) * 1e-6

    t("q/k/v projections", projections, x, (xt, wq))

    known = (res["knn_normalized"] + res["score kernel (bisect 16)"]
             + res["bin machinery (score->budgets)"]
             + res["generate_downsampled_index"]
             + res["attn rows recompute+@V (f32 sm)"]
             + res["q/k/v projections"])
    print(f"{'sum of pipeline stages':>38s}: {known:7.2f} ms", flush=True)
    return res


def main():
    global BS
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-seg", action="store_true",
                    help="probe the seg TRAIN DS shapes (bs=32, 2048->1024)")
    args = ap.parse_args()
    if args.train_seg:
        global SKIP_SWEEP
        BS = 32
        SKIP_SWEEP = True
        probe_layer(2048, 1024)
    else:
        probe_layer(1024, 512)
        probe_layer(512, 256)


if __name__ == "__main__":
    main()
