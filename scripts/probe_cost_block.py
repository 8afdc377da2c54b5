"""Attribute the cost block's measured ~11 s/map non-gather bucket
(BENCH_r05 stage_measured_s.cost_streams_derived) between its two halves:

  warp+blend  — packed gather + tent-weight einsum + fused residual
  omega+var   — block-diag omega convs + GN + variance reduction

Times each as its own jitted dispatch at the north-star super-block shape
and extrapolates x num_super.  Usage:
    python scripts/probe_cost_block.py [HxW] [D] [BLOCK] [PACK]

PROBE_RESIDUAL=fp8|int8|dual (default fp8) selects the residual-storage
lever, so the int8/dual omega paths (and AA_RMVSNET_OMEGA_INT8=chain) can
be isolated here too.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/aa_rmvsnet_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
except Exception:
    pass


def timeit(fn, *args, iters=3, warmup=1):
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
    pack = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    taps = 6
    V, B = 5, 1
    S = V - 1
    K = block * pack
    num_super = D // K

    from aa_rmvsnet_tpu.models.convert import load_torch_checkpoint
    from aa_rmvsnet_tpu.models.network import (
        _cost_from_residual, _warp_packed, extract_features,
        homography_terms,
    )
    from aa_rmvsnet_tpu.ops.patch_sample import build_patch_table_packed_quant

    params = load_torch_checkpoint(
        "/root/reference/checkpoints/model_dtu_v2.ckpt")
    bf16 = jnp.bfloat16
    params16 = jax.tree.map(
        lambda x: x.astype(bf16) if x.dtype == jnp.float32 else x, params
    )

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(B, V, H, W, 3).astype(np.float32))
    f = 2892.0 * H / 864.0
    Km = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    projs = []
    for v in range(V):
        E = np.eye(4, dtype=np.float32)
        E[0, 3] = v * 4.0
        P = E.copy()
        P[:3, :4] = Km @ P[:3, :4]
        projs.append(P)
    proj = jnp.asarray(np.stack(projs)[None])
    sweep_depths = np.linspace(425.0, 933.8, D, dtype=np.float32)
    depth_super = jnp.asarray(sweep_depths[:K][None])

    feats = jax.jit(lambda p, im: extract_features(p, im, bf16))(params, imgs)
    ref_feat, src_feats = feats[0], feats[1:]
    tables, scales = jax.jit(jax.vmap(
        lambda x: build_patch_table_packed_quant(x, taps=taps)))(src_feats)
    src_projs = proj[:, 1:].transpose(1, 0, 2, 3)
    rot_grids, transes = jax.jit(
        lambda sp, rp: jax.vmap(lambda s: homography_terms(s, rp, H, W))(sp)
    )(src_projs, proj[:, 0])

    # residual scale (as sweep() derives it); PROBE_RESIDUAL picks the
    # storage lever (fp8 default, int8, or the dual fp8+int8 pair)
    import os
    res_mode = os.environ.get("PROBE_RESIDUAL", "fp8")
    a = jnp.maximum(
        jnp.max(jnp.abs(src_feats.astype(jnp.float32)), axis=(0, 1, 2, 3)),
        jnp.max(jnp.abs(ref_feat.astype(jnp.float32)), axis=(0, 1, 2)),
    )
    qmax = 127.0 if res_mode == "int8" else 448.0
    rscale = jnp.maximum((2.0 * a) ** 2 / qmax, 1e-12)
    f8 = {"fp8": jnp.float8_e4m3fn, "int8": jnp.int8, "dual": "dual"}[res_mode]
    ref_flat = ref_feat.reshape(B, H * W, 32)

    warp_fn = jax.jit(lambda tb, rg, tr, db, sc, rf, rs: _warp_packed(
        tb, rg, tr, db, sc, bf16, H, W, taps=taps, ref_flat=rf,
        residual_scale=rs, residual_dtype=f8))
    t_warp = timeit(warp_fn, tables, rot_grids, transes, depth_super,
                    scales, ref_flat, rscale)
    residual = warp_fn(tables, rot_grids, transes, depth_super, scales,
                       ref_flat, rscale)
    print(f"warp+blend+residual (1 super-block): {t_warp:.4f}s  "
          f"x{num_super} = {t_warp * num_super:.2f}s/map")

    def omega_var(p, res, rs):
        outs = []
        for i in range(pack):
            r_i = jax.tree.map(
                lambda t: jax.lax.slice_in_dim(
                    t, i * block * 32, (i + 1) * block * 32, axis=4),
                res)
            outs.append(_cost_from_residual(p, r_i, 32, bf16, rs, f8))
        return jnp.stack(outs)

    ov_fn = jax.jit(omega_var)
    t_ov = timeit(ov_fn, params16, residual, rscale)
    print(f"omega+variance (1 super-block): {t_ov:.4f}s  "
          f"x{num_super} = {t_ov * num_super:.2f}s/map")

    both_fn = jax.jit(lambda p, tb, rg, tr, db, sc, rf, rs: omega_var(
        p, _warp_packed(tb, rg, tr, db, sc, bf16, H, W, taps=taps,
                        ref_flat=rf, residual_scale=rs, residual_dtype=f8),
        rs))
    del residual  # the combined dispatch re-creates it; free the HBM
    try:
        t_both = timeit(both_fn, params16, tables, rot_grids, transes,
                        depth_super, scales, ref_flat, rscale)
        print(f"full cost block (1 super-block): {t_both:.4f}s  "
              f"x{num_super} = {t_both * num_super:.2f}s/map")
    except Exception as e:  # dual holds 2 residual copies; can OOM here
        print(f"full cost block: skipped ({type(e).__name__})")


if __name__ == "__main__":
    main()
