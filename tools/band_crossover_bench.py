"""Dense vs depth-banded fused render+MSE kernel at large grids.

Closes the "band remains for >=256^3, untested" note in
ops/pallas/render_kernel.py::render_drc_mse_auto: at 128^3 the banded
kernel wins 1.43x kernel-vs-kernel but loses end-to-end to its own depth
sort (r3, docs/profile_r3.md finding #3). The exp/MXU waste the band
removes grows linearly with D (band/D = 48/128 -> 56/256), while the sort
tax grows only with N — so the balance must flip at some grid size. This
tool measures WHERE.

Times three variants, fwd+bwd (jax.grad w.r.t. the coords), fetch-synced:
  dense      render_drc_mse_pallas_soa — the default path
  auto       render_drc_mse_auto(band=B) — sort + plan + lax.cond, the
             path a user actually gets from pallas_band=B
  band-only  render_drc_mse_banded_soa on pre-sorted inputs — isolates
             the kernel win from the sort tax

Also prints the band plan's `ok` flag: if the sorted chunks' depth spans
exceed the band budget, `auto` silently falls back to dense and its
timing would measure the wrong kernel.

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/band_crossover_bench.py \
        --d 256 --band 56
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _sync(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(leaf.reshape(-1)[0])


def _time(fn, args, iters):
    out = fn(*args)
    _sync(out)                                 # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pairs", type=int, default=20)
    p.add_argument("--n", type=int, default=8192)
    p.add_argument("--d", type=int, default=256)
    p.add_argument("--band", type=int, default=56)
    p.add_argument("--radius", type=int, default=13)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args(argv)
    assert args.pairs % 5 == 0, (
        f"--pairs {args.pairs} must be a multiple of 5: the mask batch is "
        "built as (pairs//5, 5) source x view pairs")

    import jax
    import jax.numpy as jnp
    from tpu_unsup_pc.ops.pallas.render_kernel import (
        _band_chunks, _band_plan, _h_tile, render_drc_mse_auto,
        render_drc_mse_banded_soa, render_drc_mse_pallas_soa)

    P, N, D, DB = args.pairs, args.n, args.d, args.band
    B, S, V, K = P // 5, 5, 1, 1               # masks (B*V, D, D)
    rng = np.random.default_rng(0)
    coords = [jnp.asarray(rng.uniform(5, D - 5, (P, N)), jnp.float32)
              for _ in range(3)]
    sigma = jnp.full((P,), 1.0, jnp.float32)
    masks = jnp.asarray(rng.uniform(size=(B * V, D, D)) > 0.5, jnp.float32)

    # plan feasibility at the chunk size auto will use
    HT = _h_tile(D)
    fwd_chunk, _ = _band_chunks(D, DB, HT, 512)
    order = jnp.argsort(coords[0], axis=-1)
    gzs, gys, gxs = (jnp.take_along_axis(c, order, axis=-1)
                     for c in coords)
    _, ok = _band_plan(gzs, fwd_chunk, D, DB, args.radius + 2)
    print(f"D={D} band={DB} HT={HT} fwd_chunk={fwd_chunk} "
          f"band_plan_ok={bool(ok)}")

    def dense(gz, gy, gx):
        return jnp.sum(render_drc_mse_pallas_soa(
            gz, gy, gx, sigma, masks, (B, S, V, K), D, args.radius, 512))

    def auto(gz, gy, gx):
        return jnp.sum(render_drc_mse_auto(
            gz, gy, gx, sigma, masks, (B, S, V, K), D, args.radius, 512,
            band=DB))

    def band_only(gz, gy, gx):
        return jnp.sum(render_drc_mse_banded_soa(
            gz, gy, gx, sigma, masks, (B, S, V, K), D, DB, args.radius,
            512))

    results = {}
    for name, fn, arrs in (("dense", dense, coords),
                           ("auto", auto, coords),
                           ("band_only", band_only, (gzs, gys, gxs))):
        g = jax.jit(jax.grad(fn, argnums=(0, 1, 2)))
        f = jax.jit(fn)
        ms_f = _time(f, arrs, args.iters)
        ms_fb = _time(g, arrs, args.iters)
        results[name] = {"fwd_ms": round(ms_f, 2),
                         "fwd_bwd_ms": round(ms_fb, 2)}
        print(f"{name:10s} fwd {ms_f:7.2f}ms   fwd+bwd {ms_fb:7.2f}ms")
    # equivalence spot-check (scale-aware, tests/_tolerances.py bound)
    a = np.asarray(jax.jit(dense)(*coords))
    b = np.asarray(jax.jit(auto)(*coords))
    rel = abs(a - b) / max(abs(a), 1e-9)
    print(f"dense-vs-auto rel err {rel:.2e}")
    print(json.dumps({"d": D, "n": N, "pairs": P, "band": DB,
                      "band_plan_ok": bool(ok), "rel_err": float(rel),
                      **results}))


if __name__ == "__main__":
    main()
