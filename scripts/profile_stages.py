"""Per-stage TPU timings for the sweep pipeline + gather microbenchmarks.

Times each pipeline stage as its own jitted dispatch (FeatNet, patch-table
build, one cost block folded/unfolded, ConvLSTM U-Net scan) and sweeps the
gather row length to locate the chip's row-rate vs byte-rate regime.
All timings force a device-to-host scalar fetch (the axon tunnel's
block_until_ready returns without waiting — CLAUDE.md).

Usage: python scripts/profile_stages.py [HxW] [D] [BLOCK]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

try:  # persistent compile cache — tunnel compiles are minutes each
    jax.config.update("jax_compilation_cache_dir", "/tmp/aa_rmvsnet_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
except Exception:
    pass


def timeit(fn, *args, iters=3, warmup=1):
    # Fetch ONE scalar per timing point: the leading .ravel()[0] slice runs
    # on device and transfers 4 bytes.  np.asarray(out) here would pull the
    # whole output through the ~7 MB/s tunnel link and swamp the kernel
    # time (an 80 MB feature map = ~11 s of pure transfer).
    fetch = lambda out: float(jax.tree.leaves(out)[0].ravel()[0])
    for _ in range(warmup):
        fetch(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        fetch(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "864x1152"
    H, W = (int(t) for t in size.split("x"))
    D = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    block = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    V, B = 5, 1
    S = V - 1

    from aa_rmvsnet_tpu.models.convert import load_torch_checkpoint
    from aa_rmvsnet_tpu.models.network import (
        SweepConfig, _build_cost_block, _build_cost_block_folded,
        extract_features, homography_terms, init_params,
    )
    from aa_rmvsnet_tpu.models.regularizer import UNetConvLSTM, init_states
    from aa_rmvsnet_tpu.ops.patch_sample import build_patch_table

    ckpt = "/root/reference/checkpoints/model_dtu_v2.ckpt"
    try:
        params = load_torch_checkpoint(ckpt)
    except Exception:
        params = init_params(jax.random.PRNGKey(0))
    bf16 = jnp.bfloat16
    params16 = jax.tree.map(
        lambda x: x.astype(bf16) if x.dtype == jnp.float32 else x, params
    )

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(B, V, H, W, 3).astype(np.float32))
    K = np.array([[2892.0, 0, W / 2], [0, 2892.0, H / 2], [0, 0, 1]], np.float32)
    projs = []
    for v in range(V):
        E = np.eye(4, dtype=np.float32)
        E[0, 3] = v * 4.0
        P = E.copy()
        P[:3, :4] = K @ P[:3, :4]
        projs.append(P)
    proj = jnp.asarray(np.stack(projs)[None])
    # One CONSECUTIVE block of the real D-deep sweep (fine sampling — the
    # packed-row exactness gate is evaluated on this same spacing).
    sweep_depths = np.linspace(425.0, 933.8, D, dtype=np.float32)
    depth_block = jnp.asarray(sweep_depths[:block][None])

    # --- FeatNet ---
    feat_fn = jax.jit(lambda p, im: extract_features(p, im, bf16))
    t = timeit(feat_fn, params, imgs)
    feats = feat_fn(params, imgs)
    print(f"featnet_5views_s: {t:.4f}")

    ref_feat, src_feats = feats[0], feats[1:]

    # --- patch tables ---
    tbl_fn = jax.jit(jax.vmap(build_patch_table))
    t = timeit(tbl_fn, src_feats)
    tables = tbl_fn(src_feats)
    print(f"patch_tables_s: {t:.4f}")

    src_projs = proj[:, 1:].transpose(1, 0, 2, 3)  # (S, B, 4, 4)
    terms_fn = jax.jit(
        lambda sp, rp: jax.vmap(lambda s: homography_terms(s, rp, H, W))(sp)
    )
    rot_grids, transes = terms_fn(src_projs, proj[:, 0])

    # --- one cost block, each layout (independently fault-tolerant: a
    # standalone stage can exceed HBM where the in-sweep program does not,
    # because the sweep shares buffers across the scan) ---
    import functools

    for name, build in (("unfolded", _build_cost_block),
                        ("folded", _build_cost_block_folded),
                        ("hybrid", functools.partial(
                            _build_cost_block, hybrid_omega=True))):
        fn = jax.jit(
            lambda p, rf, tb, rg, tr, db, _b=build: _b(p, rf, tb, rg, tr, db, None)
        )
        try:
            t = timeit(fn, params16, ref_feat, tables, rot_grids, transes,
                       depth_block)
        except Exception as e:
            print(f"cost_block_{name}_s: failed ({str(e)[:120]})")
            continue
        per_map = t * (D / block)
        print(f"cost_block_{name}_s: {t:.4f}  (x{D // block} blocks = {per_map:.2f})")

    # --- packed cost block (4x4 rows serving the whole depth block) ---
    from aa_rmvsnet_tpu.models.network import (
        _build_cost_block_packed, pick_packed_rows,
    )
    from aa_rmvsnet_tpu.ops.patch_sample import build_patch_table4_quant

    if pick_packed_rows(np.asarray(proj)[0], np.asarray(depth_block)[0], H, W, block):
        try:
            t4_fn = jax.jit(jax.vmap(lambda f: build_patch_table4_quant(f)))
            tables4, scales4 = t4_fn(src_feats)
            t = timeit(t4_fn, src_feats)
            print(f"patch_tables4_fp8_s: {t:.4f}")
            fn = jax.jit(
                lambda p, rf, tb, rg, tr, db, sc: _build_cost_block_packed(
                    p, rf, tb, rg, tr, db, sc)
            )
            t = timeit(fn, params16, ref_feat.astype(bf16), tables4, rot_grids,
                       transes, depth_block, scales4)
            per_map = t * (D / block)
            print(f"cost_block_packed_s: {t:.4f}  (x{D // block} blocks = {per_map:.2f})")
        except Exception as e:
            print(f"cost_block_packed_s: failed ({str(e)[:120]})")
    else:
        print("cost_block_packed_s: skipped (exactness gate fails at this block)")

    # --- ConvLSTM U-Net scan ---
    cell = UNetConvLSTM()
    states0 = init_states(B, H, W, bf16)
    reg_params = {"params": params16["params"]["cost_regularization"]}
    x0 = jnp.asarray(rng.randn(B, H, W, 32).astype(np.float32)).astype(bf16)

    @jax.jit
    def scan_fn(rp, x, states):
        def step(carry, _):
            cost, st = cell.apply(rp, x, carry)
            return st, cost

        st, costs = jax.lax.scan(step, states, None, length=D)
        return costs

    t = timeit(scan_fn, reg_params, x0, states0, iters=1)
    print(f"lstm_scan_{D}_s: {t:.4f}  ({1e3 * t / D:.2f} ms/step)")

    # --- gather microbench: rows/s vs row length ---
    n_rows = H * W
    n_samples = H * W * block
    idx = jnp.asarray(rng.randint(0, n_rows, size=(1, n_samples, 1)).astype(np.int32))
    for lanes in (128, 256, 512):
        table = jnp.asarray(rng.randn(1, n_rows, lanes).astype(np.float32)).astype(bf16)
        g = jax.jit(lambda t_, i_: jnp.take_along_axis(t_, i_, axis=1).sum(
            dtype=jnp.float32))
        t = timeit(g, table, idx)
        gbs = n_samples * lanes * 2 / t / 1e9
        print(f"gather_{lanes}lanes: {t:.4f}s  {n_samples / t / 1e6:.1f} Mrows/s  "
              f"{gbs:.1f} GB/s")


if __name__ == "__main__":
    main()
