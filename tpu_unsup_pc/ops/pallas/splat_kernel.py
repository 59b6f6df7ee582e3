"""Fused Pallas TPU kernel for batched separable-Gaussian splatting — the
framework's native "CUDA extension" equivalent (SURVEY.md §2.1, §7.2 item 1:
the performance thesis).

Math (identical to ops.splat.splat_gauss_separable, which is the oracle for
this kernel): for each batched cloud p and voxel (d, h, w),

    vox[p, d, h, w] = sum_n Wd[n,d] * Wh[n,h] * Ww[n,w],
    Wd[n,d] = exp(-(gz[n]-d)^2 / 2 sigma_p^2) / Zz[n]   (and Wh/Ww alike),

with Z the discrete-infinite-grid normalizer evaluated over a static window
(exact; makes interior points deposit unit mass). Out-of-grid points decay
to zero weight — no bounds handling needed.

Kernel strategy (one pallas_call for the whole batch — no vmap of kernels):
  grid = (P pairs, N/chunk point-chunks); the (D*H, W) output block for pair
  p stays resident in VMEM across all point-chunks (its index_map ignores
  the chunk axis) and is zeroed at chunk 0. Per chunk the depth-x-row pair
  weight is computed *directly in the flattened (chunk, D*H) layout* — cell
  indices come from a broadcasted iota with j//H and j%H, so the two
  Gaussian factors fuse into ONE exp per element and no reshape/transpose
  of compute results is ever needed (lane dim stays 128-aligned). The MXU
  then contracts (D*H, chunk) @ (chunk, W) into the resident accumulator.

Backward mirrors the contraction (two matmuls + row reductions per chunk),
computing dL/d(grid_coords) analytically — including the normalizer's
dependence on the coordinate — and is registered as a custom VJP. Gradient
w.r.t. sigma is NOT produced here (the predict_scale fast path lives in
the one-pass render kernel's opt-in sigma Jacobian —
render_kernel.render_drc_mse_onepass(sigma_grad=True); asserted at the
loss call site).

Per-pair sigma is a (1, P) float32 operand in SMEM (ROW layout: SMEM
pads each sublane row to 128 lanes, so a (P, 1) column costs 512 B/pair
and OOMs the 1 MB SMEM near P~2000 — refine-scale pair counts; one row
of P lanes costs 4 B/pair), so annealed and per-cloud-scaled sigmas both
work under one compile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    """Run the kernel in interpreter mode off-TPU (CPU tests, SURVEY §4.3:
    the pure-JAX separable path is the kernel's fake backend)."""
    return jax.default_backend() != "tpu"


# ------------------------------------------------------------ weight math
def _log_norm(gc, inv2s2, radius):
    """Discrete-infinite-grid normalizer Z and dlogZ/dg for (chunk,) coords.
    Depends only on frac(g); evaluated over a static window (exact)."""
    r = gc - jnp.floor(gc)
    k = jax.lax.broadcasted_iota(
        jnp.int32, (gc.shape[0], 2 * radius + 2), 1
    ).astype(jnp.float32) - radius
    e = jnp.exp(-((r[:, None] - k) ** 2) * inv2s2)
    z = jnp.sum(e, axis=-1)
    dz = jnp.sum(e * (-2.0 * inv2s2 * (r[:, None] - k)), axis=-1)
    return z, dz / z


def _log_norm_ds(gc, inv2s2, radius):
    """_log_norm plus dlogZ/d(inv2s2), for the opt-in sigma gradient of
    the one-pass render kernel (render_drc_mse_onepass(sigma_grad=True)).
    Z = sum_k exp(-(r-k)^2 s) => dlogZ/ds = -sum_k (r-k)^2 e_k / Z."""
    r = gc - jnp.floor(gc)
    k = jax.lax.broadcasted_iota(
        jnp.int32, (gc.shape[0], 2 * radius + 2), 1
    ).astype(jnp.float32) - radius
    d2 = (r[:, None] - k) ** 2
    e = jnp.exp(-d2 * inv2s2)
    z = jnp.sum(e, axis=-1)
    dg = jnp.sum(e * (-2.0 * inv2s2 * (r[:, None] - k)), axis=-1)
    ds = jnp.sum(-d2 * e, axis=-1)
    return z, dg / z, ds / z


def _pair_weight(gz, gy, inv2s2, D, H):
    """(chunk,) z/y coords -> (chunk, D*H) fused unnormalized weight
    exp(-((gz-d)^2 + (gy-h)^2) * inv2s2) with d = j//H, h = j%H, plus the
    expanded per-axis squared distances (reused by the backward)."""
    j = jax.lax.broadcasted_iota(jnp.int32, (gz.shape[0], D * H), 1)
    jd = (j // H).astype(jnp.float32)
    jh = (j % H).astype(jnp.float32)
    dz = jd - gz[:, None]
    dy = jh - gy[:, None]
    p = jnp.exp(-(dz * dz + dy * dy) * inv2s2)
    return p, dz, dy


def _axis_weight(gc, inv2s2, D):
    cells = jax.lax.broadcasted_iota(jnp.int32, (gc.shape[0], D), 1
                                     ).astype(jnp.float32)
    dist = cells - gc[:, None]
    return jnp.exp(-(dist * dist) * inv2s2), dist


# DELETED VARIANT (measured, rejected — do not re-add): one-hot-matmul
# expansion of per-axis weights (`_expander`/`_row_collapser`/
# `_pair_weight_fast`: per-axis exps expanded to the (chunk, D*HT) pair
# layout via an MXU matmul + pltpu.repeat lane tiling). Measured SLOWER
# than the fused (chunk, D*HT) exp on v5e — sil fwd+bwd 4.8ms vs 4.1ms,
# RGB 13.7ms vs 9.4ms at 40x2k@64^3, at f32 AND bf16 — the VPU exp is not
# the bottleneck and the extra matmuls/repeat lose.


# ---------------------------------------------------------------- forward
def _fwd_kernel(sigma_ref, g_ref, out_ref, *, D, radius):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    sigma = sigma_ref[0, pl.program_id(0)]
    inv2s2 = 0.5 / (sigma * sigma)
    g = g_ref[0]                                   # (chunk, 3)
    gz, gy, gx = g[:, 0], g[:, 1], g[:, 2]
    p_raw, _, _ = _pair_weight(gz, gy, inv2s2, D, D)
    zz, _ = _log_norm(gz, inv2s2, radius)
    zy, _ = _log_norm(gy, inv2s2, radius)
    zx, _ = _log_norm(gx, inv2s2, radius)
    ww_raw, _ = _axis_weight(gx, inv2s2, D)
    # fold all three normalizers into the W factor (one (chunk,D) multiply
    # instead of a (chunk, D*H) one)
    ww = ww_raw / (zz * zy * zx)[:, None]
    out_ref[0] += jax.lax.dot_general(
        p_raw, ww, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # (D*H, W)


def _run_fwd(g, sigma, D, radius, chunk):
    P, N, _ = g.shape
    n_chunks = N // chunk
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, D=D, radius=radius),
        grid=(P, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, chunk, 3), lambda p, c: (p, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, D * D, D), lambda p, c: (p, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, D * D, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * P * N * D * D * D,
            bytes_accessed=P * (N * 12 + D * D * D * 4),
            transcendentals=P * N * (D * D + D + 3 * (2 * radius + 2))),
        interpret=_interpret(),
    )(sigma.reshape(1, P), g)
    return out.reshape(P, D, D, D)


# ---------------------------------------------------------------- backward
def _bwd_kernel(sigma_ref, g_ref, gout_ref, dg_ref, *, D, radius):
    sigma = sigma_ref[0, pl.program_id(0)]
    inv2s2 = 0.5 / (sigma * sigma)
    inv_s2 = 2.0 * inv2s2
    g = g_ref[0]                                   # (chunk, 3)
    gz, gy, gx = g[:, 0], g[:, 1], g[:, 2]
    gout = gout_ref[0]                             # (D*H, W)

    p_raw, dzd, dyd = _pair_weight(gz, gy, inv2s2, D, D)
    zz, dlzz = _log_norm(gz, inv2s2, radius)
    zy, dlzy = _log_norm(gy, inv2s2, radius)
    zx, dlzx = _log_norm(gx, inv2s2, radius)
    ww_raw, dxd = _axis_weight(gx, inv2s2, D)
    inv_z = 1.0 / (zz * zy * zx)
    ww = ww_raw * inv_z[:, None]

    # dL/dWw[n,w] = sum_j P[n,j] gout[j,w]        : (chunk, W) matmul
    d_ww = jax.lax.dot_general(p_raw, gout, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    # dL/dP[n,j] = sum_w gout[j,w] Ww[n,w]        : (chunk, D*H) matmul
    d_p = jax.lax.dot_general(ww, gout, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)

    # chain rule (everything elementwise from here):
    #   d p_raw/dgz = p_raw * (dz * inv_s2)     [dz = jd - gz]
    #   d log ww/dgz = -dlogZz  (normalizer moved into ww)
    pd = d_p * p_raw                               # (chunk, D*H)
    dwsum = jnp.sum(d_ww * ww, axis=1)             # = dL/d(scale of ww row)
    dgz = (jnp.sum(pd * dzd, axis=1) * inv_s2) - dlzz * dwsum
    dgy = (jnp.sum(pd * dyd, axis=1) * inv_s2) - dlzy * dwsum
    dgx = (jnp.sum(d_ww * ww * dxd, axis=1) * inv_s2) - dlzx * dwsum
    dg_ref[0] = jnp.stack([dgz, dgy, dgx], axis=-1)


def _run_bwd(g, sigma, gout, D, radius, chunk):
    # The backward keeps ~5 live (chunk, D*H) f32 buffers in VMEM (pair
    # weights, expanded distances, two cotangents) vs the forward's ~2, so
    # it runs at a smaller chunk (largest divisor of the forward chunk that
    # fits a ~12MB working-set budget; sublane dim only needs /8).
    budget = (12 * 2 ** 20) // (5 * 4 * D * D)
    bwd_chunk = 8
    c = chunk
    while c >= 8:
        if chunk % c == 0 and c <= budget and c % 8 == 0:
            bwd_chunk = c
            break
        c //= 2
    chunk = bwd_chunk
    P, N, _ = g.shape
    n_chunks = N // chunk
    dg = pl.pallas_call(
        functools.partial(_bwd_kernel, D=D, radius=radius),
        grid=(P, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, chunk, 3), lambda p, c: (p, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D * D, D), lambda p, c: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk, 3), lambda p, c: (p, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, N, 3), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(sigma.reshape(1, P), g, gout.reshape(P, D * D, D))
    return dg


# ------------------------------------------------------------- public op
@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def splat_gauss_pallas_batched(grid_coords: jnp.ndarray, sigma: jnp.ndarray,
                               vox_size: int, radius: int = 13,
                               chunk: int = 512) -> jnp.ndarray:
    """Batched fused Gaussian splat on TPU.

    Args:
      grid_coords: (P, N, 3) fractional voxel indices (depth, row, col);
        N must be a multiple of `chunk` (pad with pad_points).
      sigma: (P,) per-pair footprint std in cells (already
        variance-corrected by the caller when matching trilinear+blur).
      vox_size / radius / chunk: static.

    Returns (P, D, D, D) float32 occupancy. Differentiable w.r.t.
    grid_coords (analytic Pallas backward); sigma receives a zero
    cotangent — callers must not route scale-learning through the kernel.
    """
    return _run_fwd(grid_coords, sigma, vox_size, radius, chunk)


def _vjp_fwd(grid_coords, sigma, vox_size, radius, chunk):
    out = _run_fwd(grid_coords, sigma, vox_size, radius, chunk)
    return out, (grid_coords, sigma)


def _vjp_bwd(vox_size, radius, chunk, res, gout):
    grid_coords, sigma = res
    dg = _run_bwd(grid_coords, sigma, gout, vox_size, radius, chunk)
    return dg, jnp.zeros_like(sigma)


splat_gauss_pallas_batched.defvjp(_vjp_fwd, _vjp_bwd)


def pad_points(g: jnp.ndarray, chunk: int) -> jnp.ndarray:
    """Pad the point axis to a chunk multiple with far-away points (their
    Gaussian weights underflow to exactly 0 in every cell)."""
    N = g.shape[-2]
    pad = (-N) % chunk
    if pad == 0:
        return g
    filler = jnp.full(g.shape[:-2] + (pad, 3), -1e6, g.dtype)
    return jnp.concatenate([g, filler], axis=-2)


# =================================================================== RGB
# Value-weighted batched splat: 4 channels (occupancy + r,g,b) of the same
# separable-Gaussian deposit. H-tiled like the render kernels so the 4
# per-channel (D*HT, W) accumulators fit VMEM at 128^3; the (P, N, 3)
# coords/colors are unstacked to SoA (P, 1, N) operands in the wrapper
# BEFORE the custom call (a 3-wide lane dim would force layout
# conversions — same lesson as the SoA render kernels).

def _h_tile_rgb_splat(D: int) -> int:
    return D if D <= 64 else 32


def _rgb_splat_fwd_kernel(sigma_ref, gz_ref, gy_ref, gx_ref, cr_ref,
                          cg_ref, cb_ref, out_ref, packed_s, *,
                          D, HT, radius, chunk):
    from tpu_unsup_pc.ops.pallas.render_kernel import _accumulate_rgb_packed
    p = pl.program_id(0)
    ht = pl.program_id(1)
    sigma = sigma_ref[0, p]
    packed_s[...] = jnp.zeros_like(packed_s)
    _accumulate_rgb_packed(packed_s, gz_ref, gy_ref, gx_ref, cr_ref,
                           cg_ref, cb_ref, sigma, D, HT, radius, chunk,
                           (ht * HT).astype(jnp.float32))
    for k in range(4):
        out_ref[0, k] = packed_s[:, k * D:(k + 1) * D].reshape(D, HT, D)


def _run_rgb_splat_fwd(gz, gy, gx, cr, cg, cb, sigma, D, radius, chunk):
    P, N = gz.shape
    HT = _h_tile_rgb_splat(D)
    chunk = _chunk_budget_rgb(D, HT, chunk)
    ops = tuple(c.reshape(P, 1, N) for c in (gz, gy, gx, cr, cg, cb))
    spec = pl.BlockSpec((1, 1, N), lambda p, h: (p, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_rgb_splat_fwd_kernel, D=D, HT=HT, radius=radius,
                          chunk=chunk),
        grid=(P, D // HT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * 6,
        out_specs=pl.BlockSpec((1, 4, D, HT, D),
                               lambda p, h: (p, 0, 0, h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, 4, D, D, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((D * HT, 4 * D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(sigma.reshape(1, P), *ops)
    return out


def _chunk_budget_rgb(D, HT, chunk, budget=56 * 2 ** 20):
    c = chunk
    while c > 8 and 20 * c * D * HT * 4 > budget - 5 * D * HT * D * 4:
        c //= 2
    return max(c, 8)


def _rgb_splat_bwd_kernel(sigma_ref, gz_ref, gy_ref, gx_ref, cr_ref,
                          cg_ref, cb_ref, cot_ref, dgz_ref, dgy_ref,
                          dgx_ref, dcr_ref, dcg_ref, dcb_ref, *,
                          D, HT, radius, chunk):
    p = pl.program_id(0)
    ht = pl.program_id(1)
    sigma = sigma_ref[0, p]
    inv2s2 = 0.5 / (sigma * sigma)
    inv_s2 = 2.0 * inv2s2
    h0 = (ht * HT).astype(jnp.float32)

    @pl.when(ht == 0)
    def _():
        for ref in (dgz_ref, dgy_ref, dgx_ref, dcr_ref, dcg_ref, dcb_ref):
            ref[...] = jnp.zeros_like(ref)

    n_chunks = gz_ref.shape[2] // chunk

    def body(c, _):
        sl = pl.ds(c * chunk, chunk)
        gz = gz_ref[0, 0, sl]
        gy_full = gy_ref[0, 0, sl]
        gx = gx_ref[0, 0, sl]
        gy = gy_full - h0
        vals = (cr_ref[0, 0, sl], cg_ref[0, 0, sl], cb_ref[0, 0, sl])
        p_raw, dzd, dyd = _pair_weight(gz, gy, inv2s2, D, HT)
        zz, dlzz = _log_norm(gz, inv2s2, radius)
        zy, dlzy = _log_norm(gy_full, inv2s2, radius)
        zx, dlzx = _log_norm(gx, inv2s2, radius)
        ww_raw, dxd = _axis_weight(gx, inv2s2, D)
        ww = ww_raw / (zz * zy * zx)[:, None]

        pd = jnp.zeros((chunk, p_raw.shape[1]), jnp.float32)
        dwsum = jnp.zeros((chunk,), jnp.float32)
        dx_term = jnp.zeros((chunk,), jnp.float32)
        dval_refs = (dcr_ref, dcg_ref, dcb_ref)
        for k in range(4):
            cot = cot_ref[0, k].reshape(D * HT, D)
            val = jnp.ones((chunk,), jnp.float32) if k == 0 \
                else vals[k - 1]
            d_ww = jax.lax.dot_general(p_raw, cot, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            d_p = jax.lax.dot_general(ww, cot, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            dws_k = jnp.sum(d_ww * ww, axis=1)      # = dval for k>0
            pd += val[:, None] * (d_p * p_raw)
            dwsum += val * dws_k
            dx_term += val * jnp.sum(d_ww * ww * dxd, axis=1)
            if k > 0:
                dval_refs[k - 1][0, 0, sl] += dws_k
        dgz_ref[0, 0, sl] += (jnp.sum(pd * dzd, axis=1) * inv_s2) \
            - dlzz * dwsum
        dgy_ref[0, 0, sl] += (jnp.sum(pd * dyd, axis=1) * inv_s2) \
            - dlzy * dwsum
        dgx_ref[0, 0, sl] += (dx_term * inv_s2) - dlzx * dwsum
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def _run_rgb_splat_bwd(gz, gy, gx, cr, cg, cb, sigma, cot, D, radius,
                       chunk):
    P, N = gz.shape
    HT = _h_tile_rgb_splat(D)
    chunk = _chunk_budget_rgb(D, HT, chunk)
    ops = tuple(c.reshape(P, 1, N) for c in (gz, gy, gx, cr, cg, cb))
    spec = pl.BlockSpec((1, 1, N), lambda p, h: (p, 0, 0),
                        memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((P, 1, N), jnp.float32)
    outs = pl.pallas_call(
        functools.partial(_rgb_splat_bwd_kernel, D=D, HT=HT, radius=radius,
                          chunk=chunk),
        grid=(P, D // HT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * 6 + [
            pl.BlockSpec((1, 4, D, HT, D), lambda p, h: (p, 0, 0, h, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=tuple([spec] * 6),
        out_shape=tuple([shp] * 6),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(sigma.reshape(1, P), *ops, cot)
    return tuple(o.reshape(P, N) for o in outs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def splat_gauss_rgb_pallas_batched(grid_coords: jnp.ndarray,
                                   rgb: jnp.ndarray, sigma: jnp.ndarray,
                                   vox_size: int, radius: int = 13,
                                   chunk: int = 512) -> jnp.ndarray:
    """Batched value-weighted Gaussian splat: (P, N, 3) coords + (P, N, 3)
    colors -> (P, 4, D, D, D) grids (channel 0 = occupancy, 1..3 = color
    mass). Differentiable w.r.t. coords and colors; zero cotangent for
    sigma. N must be a chunk multiple (pad coords with pad_points, colors
    with zeros)."""
    g, c = grid_coords, rgb
    return _run_rgb_splat_fwd(g[..., 0], g[..., 1], g[..., 2],
                              c[..., 0], c[..., 1], c[..., 2],
                              sigma, vox_size, radius, chunk)


def _rgb_splat_vjp_fwd(grid_coords, rgb, sigma, vox_size, radius, chunk):
    out = splat_gauss_rgb_pallas_batched(grid_coords, rgb, sigma, vox_size,
                                         radius, chunk)
    return out, (grid_coords, rgb, sigma)


def _rgb_splat_vjp_bwd(vox_size, radius, chunk, res, cot):
    g, c, sigma = res
    dgz, dgy, dgx, dcr, dcg, dcb = _run_rgb_splat_bwd(
        g[..., 0], g[..., 1], g[..., 2], c[..., 0], c[..., 1], c[..., 2],
        sigma, cot, vox_size, radius, chunk)
    return (jnp.stack([dgz, dgy, dgx], axis=-1),
            jnp.stack([dcr, dcg, dcb], axis=-1), jnp.zeros_like(sigma))


splat_gauss_rgb_pallas_batched.defvjp(_rgb_splat_vjp_fwd, _rgb_splat_vjp_bwd)


def splat_gauss_pallas(grid_coords: jnp.ndarray, vox_size: int, sigma,
                       rgb=None, radius: int = 13, chunk: int = 512,
                       hat_correction: bool = True) -> dict:
    """Single-cloud adapter matching ops.splat.pointcloud_to_voxels'
    contract, silhouette-only AND RGB (no XLA fallback)."""
    sigma = jnp.asarray(sigma, jnp.float32)
    if hat_correction:
        sigma_k = jnp.sqrt(sigma ** 2 + 1.0 / 6.0)
    else:
        sigma_k = sigma
    g = pad_points(grid_coords[None], chunk)
    if rgb is not None:
        pad = g.shape[1] - rgb.shape[0]
        c = jnp.pad(rgb[None], ((0, 0), (0, pad), (0, 0))) if pad \
            else rgb[None]
        grids = splat_gauss_rgb_pallas_batched(g, c, sigma_k.reshape(1),
                                               vox_size, radius, chunk)[0]
        return {"occupancy": grids[0], "rgb": grids[1:]}
    occ = splat_gauss_pallas_batched(g, sigma_k.reshape(1), vox_size,
                                     radius, chunk)[0]
    return {"occupancy": occ}
