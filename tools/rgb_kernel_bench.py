"""Micro-bench of the fused RGB render(+MSE) Pallas kernels at c5 training
shapes (400 pairs x 2048 pts @ 64^3 — B16 S5 V5, N=2000 padded to 2048).

Baseline to beat (profile_r3.md, pre-lane-packing): RGB+MSE fwd 32.4ms,
fwd+bwd 103.3ms. Timing is fetch-synced (CLAUDE.md tunnel note).

Usage: python tools/rgb_kernel_bench.py [--pairs 400] [--n 2048] [--d 64]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _sync(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(leaf.reshape(-1)[0])


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pairs", type=int, default=400)
    p.add_argument("--n", type=int, default=2048)
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--bf16", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from tpu_unsup_pc.ops.pallas.render_kernel import (
        render_drc_rgb_mse_pallas_soa)

    P, N, D = args.pairs, args.n, args.d
    # c5 pair convention: P = B*S*V*K with K=1; masks/images are (B*V, ...)
    B, S, V, K = P // 25, 5, 5, 1
    rng = np.random.default_rng(0)
    gz, gy, gx = (jnp.asarray(rng.uniform(5, D - 5, (P, N)), jnp.float32)
                  for _ in range(3))
    cr, cg, cb = (jnp.asarray(rng.uniform(0, 1, (P, N)), jnp.float32)
                  for _ in range(3))
    sigma = jnp.full((P,), 1.0, jnp.float32)
    masks = jnp.asarray(rng.uniform(size=(B * V, D, D)) > 0.5, jnp.float32)
    images = jnp.asarray(rng.uniform(size=(B * V, 3, D, D)), jnp.float32)

    def fwd(gz, gy, gx, cr, cg, cb):
        return jnp.sum(render_drc_rgb_mse_pallas_soa(
            gz, gy, gx, cr, cg, cb, sigma, masks, images,
            (B, S, V, K), D, 13, 512, args.bf16))

    f_fwd = jax.jit(fwd)
    f_grad = jax.jit(jax.grad(fwd, argnums=(0, 1, 2, 3, 4, 5)))

    for name, fn, arg0 in (("fwd", f_fwd, None), ("fwd+bwd", f_grad, None)):
        out = fn(gz, gy, gx, cr, cg, cb)
        _sync(out)                                 # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(gz, gy, gx, cr, cg, cb)
        _sync(out)
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"rgb_mse {name}: {dt:.2f} ms  "
              f"({P * N / dt * 1e3 / 1e6:.1f}M pt-pairs/s)")


if __name__ == "__main__":
    main()
