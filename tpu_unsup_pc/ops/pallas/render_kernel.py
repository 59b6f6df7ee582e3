"""Fused splat->collapse Pallas kernel: point cloud -> DRC silhouette with
the voxel grid living ONLY in VMEM (never materialized to HBM).

Motivation (measured, see BENCH notes in git history): the splat itself is
~2.4ms fwd+bwd for 40x2k points at 64^3 while the end-to-end projector step
was ~12ms — the gap is mostly the HBM round-trips and the cumprod window
ops of the out-of-kernel collapse. Fusing the collapse removes the grid's
HBM traffic entirely (fwd: write P*D^3*4B, bwd: read it twice + cotangent
traffic) and replaces XLA's associative-scan cumprod with a depth loop over
VMEM-resident rows.

Tiling: grid = (pairs, H-tiles). H (image rows) is the sublane axis of the
(HT, W) silhouette block, so tiles only need /8 alignment — W stays full
width (lane axis, 128-aligned). At 64^3 there is one tile; at 128^3 four
32-row tiles keep the (D*HT, W) accumulator + (chunk, D*HT) temporaries
inside the ~16MB VMEM. The row offset shifts gy by an integer, which leaves
frac(gy) — and therefore the normalizer — exactly unchanged.

Forward, per (pair, H-tile) grid step:
  1. fori over point-chunks: accumulate the (D*HT, W) grid block in VMEM
     scratch (same separable-matmul formulation as splat_kernel.py).
  2. depth loop: T[h,w] *= 1 - clip(acc[d*HT:(d+1)*HT, w]); silhouette
     block = 1 - T.

Backward, per (pair, H-tile): recompute the grid block (free remateriali-
zation — cheaper than storing it), form the collapse cotangent
  dL/dv[d,h,w] = gsil[h,w] * T_total[h,w] / (1 - v[d,h,w]) * [v < 1-eps]
in VMEM, then run the splat backward per chunk, accumulating dg across
H-tiles (all gradient terms are linear over rows, so tile-wise
accumulation is exact).

Only proj_mode="drc" with clip_voxels=True is fused (the training default);
other modes use the unfused kernels. Sigma gets a zero cotangent (same
contract as splat_gauss_pallas_batched)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_unsup_pc.ops.pallas.splat_kernel import (_axis_weight, _interpret,
                                                  _log_norm, _log_norm_ds,
                                                  _pair_weight)

_EPS = 1e-6


def _dot(a, b, dims, bf16: bool):
    """MXU contraction with optional bf16 inputs (f32 accumulation).
    bf16 halves the matmul time on v5e — the fused backward is MXU-f32
    bound (~171 GFLOP per 40x2k@64^3 call) — at ~0.4% weight precision
    (mixed-precision training territory; opt-in via cfg.pallas_bf16)."""
    if bf16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jax.lax.dot_general(a, b, dims,
                               preferred_element_type=jnp.float32)


def _h_tile(D: int) -> int:
    """H-tile size: whole image at 64^3 and below; 32-row tiles at 128^3
    so the (D*HT, W) accumulator + cotangent + (chunk, D*HT) temporaries
    fit VMEM."""
    return D if D <= 64 else 32


def _chunk_budget(D: int, HT: int, chunk: int, live: int,
                  reserve: int, budget: int = 40 * 2 ** 20) -> int:
    """Largest power-of-two chunk whose `live` (chunk, D*HT) f32 buffers
    fit in (budget - reserve).

    budget 40MB (was 14MB, r3 measured sweep on v5e-1, one-pass kernel
    fwd+bwd): 14/28/40/48MB -> c4@128^3 28.1/26.8/25.5/25.6ms and
    c1@64^3 19.1/18.3/17.6/17.6ms — the deeper point-chunks (128->512 at
    128^3) fatten the forward matmul's contraction depth; 40MB leaves
    headroom under the 64MB vmem_limit for Mosaic's conservative
    liveness."""
    c = chunk
    while c > 8 and live * c * D * HT * 4 > budget - reserve:
        c //= 2
    return max(c, 8)


# DELETED VARIANTS (measured, rejected — do not re-add; numbers kept so
# the experiments aren't redone):
#   * AoS (P, N, 3) batched kernels `render_drc_pallas_batched` /
#     `render_drc_rgb_pallas_batched`: superseded by the SoA entry points
#     below — feeding a (P, N, 3) operand to the custom call forces XLA
#     layout conversions on a 3-wide lane dim (97% padding), measured
#     ~15ms/step at training shapes.
#   * Store-don't-recompute VJP (forward also writes the voxel grid to
#     HBM; backward reads it back instead of re-splatting): measured on
#     v5e-1 fwd+bwd 3.91ms/9.55ms (40x2k@64^3 / 6x8k@128^3) vs recompute
#     4.06ms/7.41ms — ties at 64^3, loses at 128^3 (the forward's grid
#     writes stall its pipeline more than the backward's re-splat costs).
#   * Log-sum collapse (r5): replace the D-step serial fori cumprod +
#     cotangent-fill loops with trans_total = exp(sum_d log1p(-v)) (a
#     full-grid elementwise pass + strided row reduction via reshape,
#     cotangent via pltpu.repeat) — the DRC collapse only needs the
#     TOTAL product, so the scan is mathematically unnecessary. Measured
#     SLOWER on v5e at 64^3: bench 24.36M vs 24.94M ppv/s (-2.3%, cv
#     0.0008). Mosaic pipelines the tiny-block fori fine; the extra
#     262k log1p transcendentals per (pair, tile) cost more than the
#     loop they remove. The serial loops are NOT latency-bound — do not
#     redo, including at 128^3 (same transcendental-to-loop ratio).

_ONORM_EPS = 1e-6


def _h_tile_rgb(D: int) -> int:
    """Smaller tiles than the silhouette-only kernel: the RGB variant keeps
    5 grid-block scratch buffers + a wider live set in the channel loop."""
    if D <= 32:
        return D
    return 32 if D <= 64 else 16


# ===================================================================
# SoA (structure-of-arrays) interface: coordinates as three dense (P, N)
# arrays instead of (P, N, 3). Measured motivation: feeding the custom
# call an (P, N, 3) intermediate forces XLA layout conversions on a
# 3-wide lane dimension (97% padding) costing ~15ms per step at
# B8xV5-all-pairs — the three (P, N) operands tile natively and the
# in-kernel per-chunk slices become clean (chunk,) vectors. This is the
# training hot path.
# ===================================================================

def _accumulate_soa(acc_ref, gz_ref, gy_ref, gx_ref, sigma, D, HT, radius,
                    chunk, h0, bf16=False):
    inv2s2 = 0.5 / (sigma * sigma)
    n_chunks = gz_ref.shape[2] // chunk

    def body(c, _):
        sl = pl.ds(c * chunk, chunk)
        gz = gz_ref[0, 0, sl]
        gy = gy_ref[0, 0, sl] - h0
        gx = gx_ref[0, 0, sl]
        p_raw, _, _ = _pair_weight(gz, gy, inv2s2, D, HT)
        zz, _ = _log_norm(gz, inv2s2, radius)
        zy, _ = _log_norm(gy, inv2s2, radius)
        zx, _ = _log_norm(gx, inv2s2, radius)
        ww_raw, _ = _axis_weight(gx, inv2s2, D)
        ww = ww_raw / (zz * zy * zx)[:, None]
        acc_ref[...] += _dot(p_raw, ww, (((0,), (0,)), ((), ())), bf16)
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def _fwd_kernel_soa(sigma_ref, gz_ref, gy_ref, gx_ref, sil_ref, acc_ref,
                    *, D, HT, radius, chunk, bf16):
    p = pl.program_id(0)
    ht = pl.program_id(1)
    sigma = sigma_ref[0, p]
    acc_ref[...] = jnp.zeros_like(acc_ref)
    _accumulate_soa(acc_ref, gz_ref, gy_ref, gx_ref, sigma, D, HT, radius,
                    chunk, (ht * HT).astype(jnp.float32), bf16)

    def collapse(d, trans):
        v = jnp.clip(acc_ref[pl.ds(d * HT, HT), :], 0.0, 1.0 - _EPS)
        return trans * (1.0 - v)

    trans = jax.lax.fori_loop(0, D, collapse,
                              jnp.ones((HT, D), jnp.float32))
    sil_ref[0] = 1.0 - trans


def _run_fwd_soa(gz, gy, gx, sigma, D, radius, chunk, bf16):
    P, N = gz.shape
    HT = _h_tile(D)
    chunk = _chunk_budget(D, HT, chunk, live=2, reserve=D * HT * D * 4)
    # coords travel as (P, 1, N): a (1, 1, N) block satisfies Mosaic's
    # sublane-divisibility rule (a (1, N) block of (P, N) does not)
    gz, gy, gx = (c.reshape(P, 1, N) for c in (gz, gy, gx))
    coord_spec = pl.BlockSpec((1, 1, N), lambda p, h: (p, 0, 0),
                              memory_space=pltpu.VMEM)
    sil = pl.pallas_call(
        functools.partial(_fwd_kernel_soa, D=D, HT=HT, radius=radius,
                          chunk=chunk, bf16=bf16),
        grid=(P, D // HT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  coord_spec, coord_spec, coord_spec],
        out_specs=pl.BlockSpec((1, HT, D), lambda p, h: (p, h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, D, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((D * HT, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(sigma.reshape(1, P), gz, gy, gx)
    return sil


def _bwd_kernel_soa(sigma_ref, gz_ref, gy_ref, gx_ref, gsil_ref,
                    dgz_ref, dgy_ref, dgx_ref, acc_ref, cot_ref, *,
                    D, HT, radius, chunk, bf16):
    p = pl.program_id(0)
    ht = pl.program_id(1)
    sigma = sigma_ref[0, p]
    inv2s2 = 0.5 / (sigma * sigma)
    inv_s2 = 2.0 * inv2s2
    h0 = (ht * HT).astype(jnp.float32)

    @pl.when(ht == 0)
    def _():
        dgz_ref[...] = jnp.zeros_like(dgz_ref)
        dgy_ref[...] = jnp.zeros_like(dgy_ref)
        dgx_ref[...] = jnp.zeros_like(dgx_ref)

    acc_ref[...] = jnp.zeros_like(acc_ref)
    _accumulate_soa(acc_ref, gz_ref, gy_ref, gx_ref, sigma, D, HT, radius,
                    chunk, h0, bf16)

    def collapse(d, trans):
        v = jnp.clip(acc_ref[pl.ds(d * HT, HT), :], 0.0, 1.0 - _EPS)
        return trans * (1.0 - v)

    trans = jax.lax.fori_loop(0, D, collapse,
                              jnp.ones((HT, D), jnp.float32))
    gt = gsil_ref[0] * trans

    def fill_cot(d, _):
        raw = acc_ref[pl.ds(d * HT, HT), :]
        v = jnp.clip(raw, 0.0, 1.0 - _EPS)
        mask = (raw < 1.0 - _EPS).astype(jnp.float32)
        cot_ref[pl.ds(d * HT, HT), :] = gt / (1.0 - v) * mask
        return 0

    jax.lax.fori_loop(0, D, fill_cot, 0)

    n_chunks = gz_ref.shape[2] // chunk

    def body(c, _):
        sl = pl.ds(c * chunk, chunk)
        gz = gz_ref[0, 0, sl]
        gy_full = gy_ref[0, 0, sl]
        gx = gx_ref[0, 0, sl]
        gy = gy_full - h0
        p_raw, dzd, dyd = _pair_weight(gz, gy, inv2s2, D, HT)
        zz, dlzz = _log_norm(gz, inv2s2, radius)
        zy, dlzy = _log_norm(gy_full, inv2s2, radius)
        zx, dlzx = _log_norm(gx, inv2s2, radius)
        ww_raw, dxd = _axis_weight(gx, inv2s2, D)
        ww = ww_raw / (zz * zy * zx)[:, None]
        gout = cot_ref[...]
        d_ww = _dot(p_raw, gout, (((1,), (0,)), ((), ())), bf16)
        d_p = _dot(ww, gout, (((1,), (1,)), ((), ())), bf16)
        pd = d_p * p_raw
        dwsum = jnp.sum(d_ww * ww, axis=1)
        dgz_ref[0, 0, sl] += (jnp.sum(pd * dzd, axis=1) * inv_s2) \
            - dlzz * dwsum
        dgy_ref[0, 0, sl] += (jnp.sum(pd * dyd, axis=1) * inv_s2) \
            - dlzy * dwsum
        dgx_ref[0, 0, sl] += (jnp.sum(d_ww * ww * dxd, axis=1) * inv_s2) \
            - dlzx * dwsum
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def _run_bwd_soa(gz, gy, gx, sigma, gsil, D, radius, chunk, bf16):
    P, N = gz.shape
    HT = _h_tile(D)
    chunk = _chunk_budget(D, HT, chunk, live=4,
                          reserve=2 * D * HT * D * 4)
    gz, gy, gx = (c.reshape(P, 1, N) for c in (gz, gy, gx))
    coord_spec = pl.BlockSpec((1, 1, N), lambda p, h: (p, 0, 0),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, N), lambda p, h: (p, 0, 0),
                            memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((P, 1, N), jnp.float32)
    dgz, dgy, dgx = pl.pallas_call(
        functools.partial(_bwd_kernel_soa, D=D, HT=HT, radius=radius,
                          chunk=chunk, bf16=bf16),
        grid=(P, D // HT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  coord_spec, coord_spec, coord_spec,
                  pl.BlockSpec((1, HT, D), lambda p, h: (p, h, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(shp, shp, shp),
        scratch_shapes=[pltpu.VMEM((D * HT, D), jnp.float32),
                        pltpu.VMEM((D * HT, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(sigma.reshape(1, P), gz, gy, gx, gsil)
    return (dgz.reshape(P, N), dgy.reshape(P, N), dgx.reshape(P, N))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def render_drc_pallas_soa(gz, gy, gx, sigma, vox_size: int,
                          radius: int = 13, chunk: int = 512,
                          bf16: bool = False) -> jnp.ndarray:
    """SoA fused render: three (P, N) fractional coordinate arrays
    (depth, row, col) + (P,) sigmas -> (P, H, W) DRC silhouettes.
    Differentiable w.r.t. all three coordinate arrays; zero cotangent for
    sigma. N must be a chunk multiple (pad with large negatives)."""
    return _run_fwd_soa(gz, gy, gx, sigma, vox_size, radius, chunk, bf16)


def _soa_vjp_fwd(gz, gy, gx, sigma, vox_size, radius, chunk, bf16):
    sil = _run_fwd_soa(gz, gy, gx, sigma, vox_size, radius, chunk, bf16)
    return sil, (gz, gy, gx, sigma)


def _soa_vjp_bwd(vox_size, radius, chunk, bf16, res, gsil):
    gz, gy, gx, sigma = res
    dgz, dgy, dgx = _run_bwd_soa(gz, gy, gx, sigma, gsil, vox_size, radius,
                                 chunk, bf16)
    return dgz, dgy, dgx, jnp.zeros_like(sigma)


render_drc_pallas_soa.defvjp(_soa_vjp_fwd, _soa_vjp_bwd)


# ------------------------------------------------------- RGB SoA variant
# Same SoA rationale as render_drc_pallas_soa: coordinates AND colors as
# dense (P, 1, N) operands, gradients as six (P, N) arrays.
#
# LANE-PACKED accumulation (r3, profile_r3.md finding #2): the four grids
# (occ + 3 color channels) share p_raw and ww, so all four forward
# accumulations collapse into ONE matmul against a lane-concatenated
# (chunk, 4W) weight operand, into ONE (D*HT, 4W) packed accumulator —
# and both backward contractions likewise run once at 4x the lane width.
# At W=64 each per-grid matmul used 64 of the MXU's 128 output lanes
# (resp. 64 of 128 contraction depth); packed, every matmul runs
# full-width. The grids are unpacked into per-channel scratch once per
# (pair, H-tile) — static lane slices, amortized over all point chunks —
# so the depth sweeps are unchanged.

def _unpack4(packed_s, occ_s, r_s, g_s, b_s, D):
    occ_s[...] = packed_s[:, 0:D]
    r_s[...] = packed_s[:, D:2 * D]
    g_s[...] = packed_s[:, 2 * D:3 * D]
    b_s[...] = packed_s[:, 3 * D:4 * D]


def _pack4(packed_s, occ_s, r_s, g_s, b_s, D):
    packed_s[:, 0:D] = occ_s[...]
    packed_s[:, D:2 * D] = r_s[...]
    packed_s[:, 2 * D:3 * D] = g_s[...]
    packed_s[:, 3 * D:4 * D] = b_s[...]


def _accumulate_rgb_packed(packed_s, gz_ref, gy_ref, gx_ref, cr_ref,
                           cg_ref, cb_ref, sigma, D, HT, radius, chunk,
                           h0, bf16=False):
    inv2s2 = 0.5 / (sigma * sigma)
    n_chunks = gz_ref.shape[2] // chunk

    def body(c, _):
        sl = pl.ds(c * chunk, chunk)
        gz = gz_ref[0, 0, sl]
        gy = gy_ref[0, 0, sl] - h0
        gx = gx_ref[0, 0, sl]
        vals = (cr_ref[0, 0, sl], cg_ref[0, 0, sl], cb_ref[0, 0, sl])
        p_raw, _, _ = _pair_weight(gz, gy, inv2s2, D, HT)
        zz, _ = _log_norm(gz, inv2s2, radius)
        zy, _ = _log_norm(gy, inv2s2, radius)
        zx, _ = _log_norm(gx, inv2s2, radius)
        ww_raw, _ = _axis_weight(gx, inv2s2, D)
        ww = ww_raw / (zz * zy * zx)[:, None]
        wk4 = jnp.concatenate(
            [ww] + [ww * vals[k][:, None] for k in range(3)], axis=1)
        packed_s[...] += _dot(p_raw, wk4, (((0,), (0,)), ((), ())), bf16)
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def _rgb_fwd_kernel_soa(sigma_ref, gz_ref, gy_ref, gx_ref, cr_ref, cg_ref,
                        cb_ref, sil_ref, img_ref, packed_s, occ_s, r_s,
                        g_s, b_s, *, D, HT, radius, chunk, bf16):
    p = pl.program_id(0)
    ht = pl.program_id(1)
    sigma = sigma_ref[0, p]
    packed_s[...] = jnp.zeros_like(packed_s)
    _accumulate_rgb_packed(packed_s, gz_ref, gy_ref, gx_ref, cr_ref,
                           cg_ref, cb_ref, sigma, D, HT, radius, chunk,
                           (ht * HT).astype(jnp.float32), bf16)
    _unpack4(packed_s, occ_s, r_s, g_s, b_s, D)

    def body(d, carry):
        trans, img = carry
        raw = occ_s[pl.ds(d * HT, HT), :]
        v = jnp.clip(raw, 0.0, 1.0 - _EPS)
        # one divide per depth step (VPU: 3 divides measured as real cost
        # in the D-long sweep), then 3 multiplies
        wd = v * trans / jnp.maximum(raw, _ONORM_EPS)
        img = img + jnp.stack([
            wd * r_s[pl.ds(d * HT, HT), :],
            wd * g_s[pl.ds(d * HT, HT), :],
            wd * b_s[pl.ds(d * HT, HT), :]])
        return trans * (1.0 - v), img

    trans, img = jax.lax.fori_loop(
        0, D, body, (jnp.ones((HT, D), jnp.float32),
                     jnp.zeros((3, HT, D), jnp.float32)))
    sil_ref[0] = 1.0 - trans
    img_ref[0] = img


def _run_rgb_fwd_soa(gz, gy, gx, cr, cg, cb, sigma, D, radius, chunk,
                     bf16):
    P, N = gz.shape
    HT = _h_tile_rgb(D)
    chunk = _chunk_budget(D, HT, chunk, live=2,
                          reserve=8 * D * HT * D * 4)
    ops = tuple(c.reshape(P, 1, N) for c in (gz, gy, gx, cr, cg, cb))
    spec = pl.BlockSpec((1, 1, N), lambda p, h: (p, 0, 0),
                        memory_space=pltpu.VMEM)
    sil, img = pl.pallas_call(
        functools.partial(_rgb_fwd_kernel_soa, D=D, HT=HT, radius=radius,
                          chunk=chunk, bf16=bf16),
        grid=(P, D // HT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * 6,
        out_specs=(
            pl.BlockSpec((1, HT, D), lambda p, h: (p, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, HT, D), lambda p, h: (p, 0, h, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((P, D, D), jnp.float32),
                   jax.ShapeDtypeStruct((P, 3, D, D), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((D * HT, 4 * D), jnp.float32)]
                       + [pltpu.VMEM((D * HT, D), jnp.float32)
                          for _ in range(4)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(sigma.reshape(1, P), *ops)
    return sil, img


def _rgb_rev_sweep(occ_s, r_s, g_s, b_s, t_s, gsil, gimg, D, HT):
    """Reverse depth sweep of the expected-color compositing: converts the
    four grid accumulators IN PLACE into splat cotangents (occ_s <- dL/docc,
    r_s/g_s/b_s <- dL/dcolor-grid), given the silhouette and image
    cotangents and the stored per-depth transmittances t_s."""

    def rev_sweep(i, dT):
        d = D - 1 - i
        sl = pl.ds(d * HT, HT)
        raw = occ_s[sl, :]
        v = jnp.clip(raw, 0.0, 1.0 - _EPS)
        trans = t_s[sl, :]
        w = v * trans
        denom = jnp.maximum(raw, _ONORM_EPS)
        inv_denom = 1.0 / denom
        o_mask = (raw > _ONORM_EPS).astype(jnp.float32)
        dw = jnp.zeros_like(w)
        for k, ref in ((0, r_s), (1, g_s), (2, b_s)):
            cc = ref[sl, :] * inv_denom
            dw += gimg[k] * cc
            ref[sl, :] = gimg[k] * w * inv_denom
        dv = dw * trans - dT * trans
        clip_mask = (raw < 1.0 - _EPS).astype(jnp.float32)
        dO = dv * clip_mask - dw * w * inv_denom * o_mask
        occ_s[sl, :] = dO
        return dw * v + dT * (1.0 - v)

    jax.lax.fori_loop(0, D, rev_sweep, -gsil)


def _rgb_grad_chunks(gz_ref, gy_ref, gx_ref, cr_ref, cg_ref, cb_ref,
                     dgz_ref, dgy_ref, dgx_ref, dcr_ref, dcg_ref, dcb_ref,
                     cot4_s, inv2s2, h0, D, HT, radius, chunk, bf16):
    """Per-chunk splat backward against the lane-packed (D*HT, 4W)
    cotangent grid left in cot4_s by _pack4 after _rgb_rev_sweep;
    accumulates the six (P, N) coordinate/color gradients across H-tiles.

    Identities vs the per-grid form (grids k=0..3 share p_raw and ww, so
    every sum over k folds into one full-width contraction):
      d_ww4[:, kW:(k+1)W] = d_ww_k        (one matmul, lanes packed)
      sum_k val_k d_p_k   = ww4 @ cot4ᵀ   with ww4 = [ww, val1*ww, ...]
      dwsum = Σ_lanes (d_ww4 * ww_t4 * val4);  dval_k = Σ_block_k of
      (d_ww4 * ww_t4)."""
    inv_s2 = 2.0 * inv2s2
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

        cot4 = cot4_s[...]
        d_ww4 = _dot(p_raw, cot4, (((1,), (0,)), ((), ())), bf16)
        ww_t4 = jnp.concatenate([ww] * 4, axis=1)
        prod = d_ww4 * ww_t4                       # (chunk, 4W)
        dcr_ref[0, 0, sl] += jnp.sum(prod[:, D:2 * D], axis=1)
        dcg_ref[0, 0, sl] += jnp.sum(prod[:, 2 * D:3 * D], axis=1)
        dcb_ref[0, 0, sl] += jnp.sum(prod[:, 3 * D:4 * D], axis=1)
        ones = jnp.ones_like(ww)
        val4 = jnp.concatenate(
            [ones] + [vals[k][:, None] * ones for k in range(3)], axis=1)
        pv = prod * val4
        dwsum = jnp.sum(pv, axis=1)
        dx_term = jnp.sum(pv * jnp.concatenate([dxd] * 4, axis=1), axis=1)
        ww4 = ww_t4 * val4
        d_p = _dot(ww4, cot4, (((1,), (1,)), ((), ())), bf16)
        pd = d_p * p_raw
        dgz_ref[0, 0, sl] += (jnp.sum(pd * dzd, axis=1) * inv_s2) \
            - dlzz * dwsum
        dgy_ref[0, 0, sl] += (jnp.sum(pd * dyd, axis=1) * inv_s2) \
            - dlzy * dwsum
        dgx_ref[0, 0, sl] += (dx_term * inv_s2) - dlzx * dwsum
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def _rgb_bwd_kernel_soa(sigma_ref, gz_ref, gy_ref, gx_ref, cr_ref, cg_ref,
                        cb_ref, gsil_ref, gimg_ref, dgz_ref, dgy_ref,
                        dgx_ref, dcr_ref, dcg_ref, dcb_ref, packed_s,
                        occ_s, r_s, g_s, b_s, t_s, *, D, HT, radius,
                        chunk, bf16):
    p = pl.program_id(0)
    ht = pl.program_id(1)
    sigma = sigma_ref[0, p]
    inv2s2 = 0.5 / (sigma * sigma)
    h0 = (ht * HT).astype(jnp.float32)

    @pl.when(ht == 0)
    def _():
        for ref in (dgz_ref, dgy_ref, dgx_ref, dcr_ref, dcg_ref, dcb_ref):
            ref[...] = jnp.zeros_like(ref)

    packed_s[...] = jnp.zeros_like(packed_s)
    _accumulate_rgb_packed(packed_s, gz_ref, gy_ref, gx_ref, cr_ref,
                           cg_ref, cb_ref, sigma, D, HT, radius, chunk,
                           h0, bf16)
    _unpack4(packed_s, occ_s, r_s, g_s, b_s, D)

    def fwd_sweep(d, trans):
        t_s[pl.ds(d * HT, HT), :] = trans
        v = jnp.clip(occ_s[pl.ds(d * HT, HT), :], 0.0, 1.0 - _EPS)
        return trans * (1.0 - v)

    jax.lax.fori_loop(0, D, fwd_sweep, jnp.ones((HT, D), jnp.float32))
    _rgb_rev_sweep(occ_s, r_s, g_s, b_s, t_s, gsil_ref[0], gimg_ref[0],
                   D, HT)
    _pack4(packed_s, occ_s, r_s, g_s, b_s, D)
    _rgb_grad_chunks(gz_ref, gy_ref, gx_ref, cr_ref, cg_ref, cb_ref,
                     dgz_ref, dgy_ref, dgx_ref, dcr_ref, dcg_ref, dcb_ref,
                     packed_s, inv2s2, h0, D, HT, radius, chunk, bf16)


def _run_rgb_bwd_soa(gz, gy, gx, cr, cg, cb, sigma, gsil, gimg, D, radius,
                     chunk, bf16):
    P, N = gz.shape
    HT = _h_tile_rgb(D)
    chunk = _chunk_budget(D, HT, chunk, live=20,
                          reserve=9 * D * HT * D * 4,
                          budget=56 * 2 ** 20)
    ops = tuple(c.reshape(P, 1, N) for c in (gz, gy, gx, cr, cg, cb))
    spec = pl.BlockSpec((1, 1, N), lambda p, h: (p, 0, 0),
                        memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((P, 1, N), jnp.float32)
    outs = pl.pallas_call(
        functools.partial(_rgb_bwd_kernel_soa, D=D, HT=HT, radius=radius,
                          chunk=chunk, bf16=bf16),
        grid=(P, D // HT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * 6 + [
            pl.BlockSpec((1, HT, D), lambda p, h: (p, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, HT, D), lambda p, h: (p, 0, h, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=tuple([spec] * 6),
        out_shape=tuple([shp] * 6),
        scratch_shapes=[pltpu.VMEM((D * HT, 4 * D), jnp.float32)]
                       + [pltpu.VMEM((D * HT, D), jnp.float32)
                          for _ in range(5)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(sigma.reshape(1, P), *ops, gsil, gimg)
    return tuple(o.reshape(P, N) for o in outs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def render_drc_rgb_pallas_soa(gz, gy, gx, cr, cg, cb, sigma,
                              vox_size: int, radius: int = 13,
                              chunk: int = 512, bf16: bool = False):
    """SoA fused RGB render: six (P, N) arrays (coords + colors) ->
    (sil (P,H,W), img (P,3,H,W)). Differentiable w.r.t. all six; zero
    cotangent for sigma."""
    return _run_rgb_fwd_soa(gz, gy, gx, cr, cg, cb, sigma, vox_size,
                            radius, chunk, bf16)


def _rgb_soa_vjp_fwd(gz, gy, gx, cr, cg, cb, sigma, vox_size, radius,
                     chunk, bf16):
    out = _run_rgb_fwd_soa(gz, gy, gx, cr, cg, cb, sigma, vox_size,
                           radius, chunk, bf16)
    return out, (gz, gy, gx, cr, cg, cb, sigma)


def _rgb_soa_vjp_bwd(vox_size, radius, chunk, bf16, res, cts):
    gz, gy, gx, cr, cg, cb, sigma = res
    gsil, gimg = cts
    grads = _run_rgb_bwd_soa(gz, gy, gx, cr, cg, cb, sigma, gsil, gimg,
                             vox_size, radius, chunk, bf16)
    return grads + (jnp.zeros_like(sigma),)


render_drc_rgb_pallas_soa.defvjp(_rgb_soa_vjp_fwd, _rgb_soa_vjp_bwd)


# ===================================================================
# Fused render + MSE: the silhouette NEVER leaves VMEM. Per (pair, H-tile)
# the forward splats, collapses, subtracts the target mask block and emits
# only per-row sums of squared error; the backward recomputes the tile and
# seeds the collapse cotangent gsil = g_sse * 2 * (sil - mask) IN KERNEL.
# Removes, per pair, the sil HBM write + read and the gsil write + read of
# the unfused path, plus the XLA-side (P, H, W) mask broadcast: masks stay
# compact (B*V, H, W) and each of the S*K pairs sharing a target view reads
# the SAME block via the BlockSpec index_map (p -> b*V + t).
#
# Pair flattening convention (must match the loss): p = ((b*S+s)*V+t)*K+k.
# ===================================================================

def _mask_index_map(S, V, K):
    """(p, ht) -> block index of the compact (B*V, H, W) mask array."""
    def index_map(p, ht):
        b = p // (S * V * K)
        t = (p // K) % V
        return b * V + t, ht, 0
    return index_map


def _mse_fwd_kernel_soa(sigma_ref, gz_ref, gy_ref, gx_ref, mask_ref,
                        sse_ref, acc_ref, *, D, HT, radius, chunk, bf16):
    p = pl.program_id(0)
    ht = pl.program_id(1)
    sigma = sigma_ref[0, p]
    acc_ref[...] = jnp.zeros_like(acc_ref)
    _accumulate_soa(acc_ref, gz_ref, gy_ref, gx_ref, sigma, D, HT, radius,
                    chunk, (ht * HT).astype(jnp.float32), bf16)

    def collapse(d, trans):
        v = jnp.clip(acc_ref[pl.ds(d * HT, HT), :], 0.0, 1.0 - _EPS)
        return trans * (1.0 - v)

    trans = jax.lax.fori_loop(0, D, collapse,
                              jnp.ones((HT, D), jnp.float32))
    err = (1.0 - trans) - mask_ref[0]                    # sil - mask
    # (W,) row sums land in sublane 0 of an (8, W) tile: the per-(p, ht)
    # output block must keep its last-two dims (8, W)-aligned for Mosaic
    # (a (1, W) block fails lowering when D//HT > 1, i.e. at 128^3)
    sse_ref[...] = jnp.zeros_like(sse_ref)
    sse_ref[0, 0, 0, :] = jnp.sum(err * err, axis=0)


def _run_mse_fwd_soa(gz, gy, gx, sigma, masks, S, V, K, D, radius, chunk,
                     bf16):
    P, N = gz.shape
    HT = _h_tile(D)
    chunk = _chunk_budget(D, HT, chunk, live=2, reserve=D * HT * D * 4)
    gz, gy, gx = (c.reshape(P, 1, N) for c in (gz, gy, gx))
    coord_spec = pl.BlockSpec((1, 1, N), lambda p, h: (p, 0, 0),
                              memory_space=pltpu.VMEM)
    sse = pl.pallas_call(
        functools.partial(_mse_fwd_kernel_soa, D=D, HT=HT, radius=radius,
                          chunk=chunk, bf16=bf16),
        grid=(P, D // HT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  coord_spec, coord_spec, coord_spec,
                  pl.BlockSpec((1, HT, D), _mask_index_map(S, V, K),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 8, D), lambda p, h: (p, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, D // HT, 8, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((D * HT, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * P * N * D * D * D,
            bytes_accessed=P * (N * 12 + D * D * 4),
            transcendentals=P * N * (D * D + D)),
        interpret=_interpret(),
    )(sigma.reshape(1, P), gz, gy, gx, masks)
    return jnp.sum(sse, axis=(-3, -2, -1))               # (P,) SSE


def _mse_bwd_kernel_soa(sigma_ref, gsse_ref, gz_ref, gy_ref, gx_ref,
                        mask_ref, dgz_ref, dgy_ref, dgx_ref, acc_ref,
                        cot_ref, *, D, HT, radius, chunk, bf16):
    p = pl.program_id(0)
    ht = pl.program_id(1)
    sigma = sigma_ref[0, p]
    inv2s2 = 0.5 / (sigma * sigma)
    inv_s2 = 2.0 * inv2s2
    h0 = (ht * HT).astype(jnp.float32)

    @pl.when(ht == 0)
    def _():
        dgz_ref[...] = jnp.zeros_like(dgz_ref)
        dgy_ref[...] = jnp.zeros_like(dgy_ref)
        dgx_ref[...] = jnp.zeros_like(dgx_ref)

    acc_ref[...] = jnp.zeros_like(acc_ref)
    _accumulate_soa(acc_ref, gz_ref, gy_ref, gx_ref, sigma, D, HT, radius,
                    chunk, h0, bf16)

    def collapse(d, trans):
        v = jnp.clip(acc_ref[pl.ds(d * HT, HT), :], 0.0, 1.0 - _EPS)
        return trans * (1.0 - v)

    trans = jax.lax.fori_loop(0, D, collapse,
                              jnp.ones((HT, D), jnp.float32))
    # in-kernel MSE seed: d sse / d sil = 2 * (sil - mask)
    gsil = gsse_ref[0, p] * 2.0 * ((1.0 - trans) - mask_ref[0])
    gt = gsil * trans

    def fill_cot(d, _):
        raw = acc_ref[pl.ds(d * HT, HT), :]
        v = jnp.clip(raw, 0.0, 1.0 - _EPS)
        mask = (raw < 1.0 - _EPS).astype(jnp.float32)
        cot_ref[pl.ds(d * HT, HT), :] = gt / (1.0 - v) * mask
        return 0

    jax.lax.fori_loop(0, D, fill_cot, 0)

    n_chunks = gz_ref.shape[2] // chunk

    def body(c, _):
        sl = pl.ds(c * chunk, chunk)
        gz = gz_ref[0, 0, sl]
        gy_full = gy_ref[0, 0, sl]
        gx = gx_ref[0, 0, sl]
        gy = gy_full - h0
        p_raw, dzd, dyd = _pair_weight(gz, gy, inv2s2, D, HT)
        zz, dlzz = _log_norm(gz, inv2s2, radius)
        zy, dlzy = _log_norm(gy_full, inv2s2, radius)
        zx, dlzx = _log_norm(gx, inv2s2, radius)
        ww_raw, dxd = _axis_weight(gx, inv2s2, D)
        ww = ww_raw / (zz * zy * zx)[:, None]
        gout = cot_ref[...]
        d_ww = _dot(p_raw, gout, (((1,), (0,)), ((), ())), bf16)
        d_p = _dot(ww, gout, (((1,), (1,)), ((), ())), bf16)
        pd = d_p * p_raw
        dwsum = jnp.sum(d_ww * ww, axis=1)
        dgz_ref[0, 0, sl] += (jnp.sum(pd * dzd, axis=1) * inv_s2) \
            - dlzz * dwsum
        dgy_ref[0, 0, sl] += (jnp.sum(pd * dyd, axis=1) * inv_s2) \
            - dlzy * dwsum
        dgx_ref[0, 0, sl] += (jnp.sum(d_ww * ww * dxd, axis=1) * inv_s2) \
            - dlzx * dwsum
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def _run_mse_bwd_soa(gz, gy, gx, sigma, masks, gsse, S, V, K, D, radius,
                     chunk, bf16):
    P, N = gz.shape
    HT = _h_tile(D)
    chunk = _chunk_budget(D, HT, chunk, live=4,
                          reserve=2 * D * HT * D * 4)
    gz, gy, gx = (c.reshape(P, 1, N) for c in (gz, gy, gx))
    coord_spec = pl.BlockSpec((1, 1, N), lambda p, h: (p, 0, 0),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, N), lambda p, h: (p, 0, 0),
                            memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((P, 1, N), jnp.float32)
    dgz, dgy, dgx = pl.pallas_call(
        functools.partial(_mse_bwd_kernel_soa, D=D, HT=HT, radius=radius,
                          chunk=chunk, bf16=bf16),
        grid=(P, D // HT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  coord_spec, coord_spec, coord_spec,
                  pl.BlockSpec((1, HT, D), _mask_index_map(S, V, K),
                               memory_space=pltpu.VMEM)],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(shp, shp, shp),
        scratch_shapes=[pltpu.VMEM((D * HT, D), jnp.float32),
                        pltpu.VMEM((D * HT, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(sigma.reshape(1, P), gsse.reshape(1, P), gz, gy, gx, masks)
    return (dgz.reshape(P, N), dgy.reshape(P, N), dgx.reshape(P, N))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def render_drc_mse_pallas_soa(gz, gy, gx, sigma, masks,
                              pair_shape: tuple, vox_size: int,
                              radius: int = 13, chunk: int = 512,
                              bf16: bool = False) -> jnp.ndarray:
    """Fused render + squared-error reduction.

    Args:
      gz/gy/gx: (P, N) fractional grid coords, P = B*S*V*K flattened as
        ((b*S+s)*V+t)*K+k; N a chunk multiple (pad with large negatives).
      sigma: (P,) per-pair footprint std.
      masks: (B*V, H, W) target masks, flattened b*V+t — NOT broadcast to
        P; the kernel's index_map dedups the S*K pairs per target view.
      pair_shape: static (B, S, V, K).

    Returns (P,) sum over pixels of (silhouette - mask)^2. Differentiable
    w.r.t. the coords (analytic in-kernel MSE seed); sigma and masks get
    zero cotangents.
    """
    B, S, V, K = pair_shape
    return _run_mse_fwd_soa(gz, gy, gx, sigma, masks, S, V, K, vox_size,
                            radius, chunk, bf16)


def _mse_soa_vjp_fwd(gz, gy, gx, sigma, masks, pair_shape, vox_size,
                     radius, chunk, bf16):
    sse = render_drc_mse_pallas_soa(gz, gy, gx, sigma, masks, pair_shape,
                                    vox_size, radius, chunk, bf16)
    return sse, (gz, gy, gx, sigma, masks)


def _mse_soa_vjp_bwd(pair_shape, vox_size, radius, chunk, bf16, res, gsse):
    gz, gy, gx, sigma, masks = res
    B, S, V, K = pair_shape
    dgz, dgy, dgx = _run_mse_bwd_soa(gz, gy, gx, sigma, masks, gsse,
                                     S, V, K, vox_size, radius, chunk,
                                     bf16)
    return dgz, dgy, dgx, jnp.zeros_like(sigma), jnp.zeros_like(masks)


render_drc_mse_pallas_soa.defvjp(_mse_soa_vjp_fwd, _mse_soa_vjp_bwd)


# ===================================================================
# ONE-PASS fused render + MSE + gradient (r3, traced discovery in
# docs/profile_r3.md): under jax.grad the two-kernel op's FORWARD kernel
# is dead-code-eliminated (the custom VJP rematerializes in-kernel and
# its residuals are just the inputs), so grad-only timings measured the
# backward alone — but training runs value_and_grad, which needs the SSE
# values too, so BOTH kernels ran every step (c5 trace: fwd 21.4ms + bwd
# 60.0ms = 96% of the 85ms step). The backward kernel already recomputes
# everything the forward computes; emitting the per-pair SSE from it
# costs two row-sum reductions. This one-pass variant therefore returns
# sse AND the UNSCALED coordinate Jacobians J_p = d sse_p / d coords_p
# (in-kernel seed = 1), and the custom VJP's backward is a trivial XLA
# rescale dg = gsse_p * J_p — exact for ANY downstream loss, including
# the pose-ensemble argmin branch (the data-dependent cotangent arrives
# after the kernel ran, as a per-pair scale). value_and_grad executes
# ONE kernel instead of two.
# ===================================================================

def _mse_onepass_kernel_soa(sigma_ref, gz_ref, gy_ref, gx_ref, mask_ref,
                            sse_ref, dgz_ref, dgy_ref, dgx_ref, *rest,
                            D, HT, radius, chunk, bf16, sigma_grad):
    if sigma_grad:
        # per-POINT dsse/dsigma contributions land in a fourth (1, 1, N)
        # output — the same store pattern as the coordinate gradients
        # (Mosaic rejects an in-loop cross-lane scalar reduction); the
        # host sums over N for the per-pair Jacobian
        dsig_ref, acc_ref, cot_ref = rest
    else:
        acc_ref, cot_ref = rest
    p = pl.program_id(0)
    ht = pl.program_id(1)
    sigma = sigma_ref[0, p]
    inv2s2 = 0.5 / (sigma * sigma)
    inv_s2 = 2.0 * inv2s2
    h0 = (ht * HT).astype(jnp.float32)

    @pl.when(ht == 0)
    def _():
        dgz_ref[...] = jnp.zeros_like(dgz_ref)
        dgy_ref[...] = jnp.zeros_like(dgy_ref)
        dgx_ref[...] = jnp.zeros_like(dgx_ref)
        if sigma_grad:
            dsig_ref[...] = jnp.zeros_like(dsig_ref)

    acc_ref[...] = jnp.zeros_like(acc_ref)
    _accumulate_soa(acc_ref, gz_ref, gy_ref, gx_ref, sigma, D, HT, radius,
                    chunk, h0, bf16)

    def collapse(d, trans):
        v = jnp.clip(acc_ref[pl.ds(d * HT, HT), :], 0.0, 1.0 - _EPS)
        return trans * (1.0 - v)

    trans = jax.lax.fori_loop(0, D, collapse,
                              jnp.ones((HT, D), jnp.float32))
    err = (1.0 - trans) - mask_ref[0]                    # sil - mask
    sse_ref[...] = jnp.zeros_like(sse_ref)
    sse_ref[0, 0, 0, :] = jnp.sum(err * err, axis=0)
    # UNSCALED seed (gsse = 1): downstream cotangents are applied as a
    # per-pair rescale in the custom VJP's backward
    gt = 2.0 * err * trans

    def fill_cot(d, _):
        raw = acc_ref[pl.ds(d * HT, HT), :]
        v = jnp.clip(raw, 0.0, 1.0 - _EPS)
        mask = (raw < 1.0 - _EPS).astype(jnp.float32)
        cot_ref[pl.ds(d * HT, HT), :] = gt / (1.0 - v) * mask
        return 0

    jax.lax.fori_loop(0, D, fill_cot, 0)

    n_chunks = gz_ref.shape[2] // chunk

    def body(c, _):
        sl = pl.ds(c * chunk, chunk)
        gz = gz_ref[0, 0, sl]
        gy_full = gy_ref[0, 0, sl]
        gx = gx_ref[0, 0, sl]
        gy = gy_full - h0
        p_raw, dzd, dyd = _pair_weight(gz, gy, inv2s2, D, HT)
        if sigma_grad:
            zz, dlzz, dszz = _log_norm_ds(gz, inv2s2, radius)
            zy, dlzy, dszy = _log_norm_ds(gy_full, inv2s2, radius)
            zx, dlzx, dszx = _log_norm_ds(gx, inv2s2, radius)
        else:
            zz, dlzz = _log_norm(gz, inv2s2, radius)
            zy, dlzy = _log_norm(gy_full, inv2s2, radius)
            zx, dlzx = _log_norm(gx, inv2s2, radius)
        ww_raw, dxd = _axis_weight(gx, inv2s2, D)
        ww = ww_raw / (zz * zy * zx)[:, None]
        gout = cot_ref[...]
        d_ww = _dot(p_raw, gout, (((1,), (0,)), ((), ())), bf16)
        d_p = _dot(ww, gout, (((1,), (1,)), ((), ())), bf16)
        pd = d_p * p_raw
        dww_w = d_ww * ww
        dwsum = jnp.sum(dww_w, axis=1)
        dgz_ref[0, 0, sl] += (jnp.sum(pd * dzd, axis=1) * inv_s2) \
            - dlzz * dwsum
        dgy_ref[0, 0, sl] += (jnp.sum(pd * dyd, axis=1) * inv_s2) \
            - dlzy * dwsum
        dgx_ref[0, 0, sl] += (jnp.sum(dww_w * dxd, axis=1) * inv_s2) \
            - dlzx * dwsum
        if sigma_grad:
            # dW/ds per (point, cell): W * [-(dz^2+dy^2) - dx^2
            #   - dlogZ3/ds]; contracted against the cotangent grid the
            # three sums below reuse pd / dww_w / dwsum (s = inv2s2),
            # then chain s = 0.5/sigma^2 -> ds/dsigma = -1/sigma^3
            ds_n = (-jnp.sum(pd * (dzd * dzd + dyd * dyd), axis=1)
                    - jnp.sum(dww_w * (dxd * dxd), axis=1)
                    - (dszz + dszy + dszx) * dwsum)
            dsig_ref[0, 0, sl] += ds_n * (
                -1.0 / (sigma * sigma * sigma))
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def _run_mse_onepass_soa(gz, gy, gx, sigma, masks, S, V, K, D, radius,
                         chunk, bf16, sigma_grad=False):
    P, N = gz.shape
    HT = _h_tile(D)
    chunk = _chunk_budget(D, HT, chunk, live=4,
                          reserve=2 * D * HT * D * 4)
    gz, gy, gx = (c.reshape(P, 1, N) for c in (gz, gy, gx))
    coord_spec = pl.BlockSpec((1, 1, N), lambda p, h: (p, 0, 0),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, N), lambda p, h: (p, 0, 0),
                            memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((P, 1, N), jnp.float32)
    n_grads = 4 if sigma_grad else 3
    outs = pl.pallas_call(
        functools.partial(_mse_onepass_kernel_soa, D=D, HT=HT,
                          radius=radius, chunk=chunk, bf16=bf16,
                          sigma_grad=sigma_grad),
        grid=(P, D // HT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  coord_spec, coord_spec, coord_spec,
                  pl.BlockSpec((1, HT, D), _mask_index_map(S, V, K),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, 1, 8, D), lambda p, h: (p, h, 0, 0),
                                memory_space=pltpu.VMEM),
                   *([out_spec] * n_grads)),
        out_shape=(jax.ShapeDtypeStruct((P, D // HT, 8, D), jnp.float32),
                   *([shp] * n_grads)),
        scratch_shapes=[pltpu.VMEM((D * HT, D), jnp.float32),
                        pltpu.VMEM((D * HT, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(sigma.reshape(1, P), gz, gy, gx, masks)
    sse, dgz, dgy, dgx = outs[:4]
    jsig = jnp.sum(outs[4].reshape(P, N), axis=-1) if sigma_grad else None
    return (jnp.sum(sse, axis=(-3, -2, -1)), jsig,
            dgz.reshape(P, N), dgy.reshape(P, N), dgx.reshape(P, N))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def render_drc_mse_onepass(gz, gy, gx, sigma, masks, pair_shape: tuple,
                           vox_size: int, radius: int = 13,
                           chunk: int = 512, bf16: bool = False,
                           sigma_grad: bool = False) -> jnp.ndarray:
    """One-pass fused render + squared-error + Jacobian.

    Same contract and return value as render_drc_mse_pallas_soa, but
    value_and_grad runs ONE kernel (the rematerializing backward,
    extended to emit the SSE) instead of forward + backward. Use on
    training paths; value-only callers should prefer the two-kernel op
    (this one always pays the gradient contractions).

    sigma_grad=True additionally emits the per-pair sigma Jacobian
    in-kernel (the predict_scale fast path): sigma then receives the
    exact analytic cotangent instead of zeros. Default off — the extra
    VPU terms in the chunk loop are only paid when requested."""
    B, S, V, K = pair_shape
    sse, _, _, _, _ = _run_mse_onepass_soa(gz, gy, gx, sigma, masks, S, V,
                                           K, vox_size, radius, chunk,
                                           bf16, sigma_grad)
    return sse


def _mse_onepass_vjp_fwd(gz, gy, gx, sigma, masks, pair_shape, vox_size,
                         radius, chunk, bf16, sigma_grad):
    B, S, V, K = pair_shape
    sse, jsig, jz, jy, jx = _run_mse_onepass_soa(
        gz, gy, gx, sigma, masks, S, V, K, vox_size, radius, chunk, bf16,
        sigma_grad)
    return sse, (jz, jy, jx, jsig, sigma, masks)


def _mse_onepass_vjp_bwd(pair_shape, vox_size, radius, chunk, bf16,
                         sigma_grad, res, gsse):
    jz, jy, jx, jsig, sigma, masks = res
    g = gsse[:, None]
    dsig = gsse * jsig if sigma_grad else jnp.zeros_like(sigma)
    return (g * jz, g * jy, g * jx, dsig, jnp.zeros_like(masks))


render_drc_mse_onepass.defvjp(_mse_onepass_vjp_fwd, _mse_onepass_vjp_bwd)


# ===================================================================
# Depth-BANDED fused render + MSE — the 128^3 kernel (profile_r3.md #3):
# the dense (chunk, D*HT) pair weight computes exp() for all D depth rows
# while the Gaussian support is only +-radius cells, so at 128^3 >90% of
# the weight matrix (and of both backward matmuls) is numerically zero.
#
# Here points arrive SORTED by depth per pair; each point-chunk gets a
# dynamic depth window [d0, d0+DB) of STATIC width DB (d0 per (pair,
# chunk) from SMEM, clamped so the window stays in-grid). The chunk's
# weights are computed only over (chunk, DB*HT) and accumulated into the
# window's rows of the full (D*HT, W) accumulator (dynamic sublane start,
# always HT-aligned). Both backward matmuls contract against the same
# window of the cotangent grid. Exp + MXU work shrink by DB/D (2.7x at
# DB=48, D=128) in fwd AND bwd, and the smaller live buffers let the
# backward run at 2x the dense chunk.
#
# Exactness contract: a chunk is representable iff every in-range point's
# +-margin support lies inside its window; contributions beyond `margin`
# cells are truncated (margin = radius + 2, where weights are < ~1e-8 x
# the per-point max — below the kernel tolerance contract). Callers use
# render_drc_mse_auto, which sorts, checks every chunk's depth span
# against the band budget, and lax.cond-falls back to the dense kernel on
# the (rare, data-dependent) step where a sorted chunk straddles a depth
# gap wider than DB - 2*margin.
# ===================================================================

def _band_chunks(D: int, band: int, HT: int, chunk: int):
    """(fwd, bwd) chunk sizes for the banded kernels — the live buffers
    are (chunk, band*HT), so budgets use `band`, not D."""
    fwd = _chunk_budget(band, HT, chunk, live=2, reserve=D * HT * D * 4)
    bwd = _chunk_budget(band, HT, chunk, live=4,
                        reserve=2 * D * HT * D * 4)
    return fwd, min(fwd, bwd)


def _band_plan(gz_sorted, chunk: int, D: int, band: int, margin: int):
    """Per-(pair, chunk) window starts d0 (int32, clamped to [0, D-band])
    + scalar `ok` (every chunk's in-range depth span fits the band).
    Points outside (-margin-1, D+margin) deposit nothing in-grid and are
    ignored (this is where the -1e6 padding goes)."""
    P, N = gz_sorted.shape
    nc = N // chunk
    z = gz_sorted.reshape(P, nc, chunk)
    inr = (z > -(margin + 1.0)) & (z < D + float(margin))
    zmin = jnp.min(jnp.where(inr, z, 1e9), axis=-1)
    zmax = jnp.max(jnp.where(inr, z, -1e9), axis=-1)
    anyv = jnp.any(inr, axis=-1)
    zmin = jnp.where(anyv, zmin, 0.0)
    zmax = jnp.where(anyv, zmax, 0.0)
    lo = jnp.floor(zmin).astype(jnp.int32) - margin
    d0 = jnp.clip(lo, 0, D - band)
    need_hi = jnp.minimum(jnp.floor(zmax).astype(jnp.int32) + margin,
                          D - 1)
    ok = jnp.all(~anyv | (need_hi <= d0 + band - 1))
    return d0, ok


def _accumulate_banded(acc_ref, d0_ref, gz_ref, gy_ref, gx_ref, sigma, D,
                       DB, HT, radius, chunk, h0, bf16=False):
    inv2s2 = 0.5 / (sigma * sigma)
    n_chunks = gz_ref.shape[2] // chunk
    p = pl.program_id(0)

    def body(c, _):
        sl = pl.ds(c * chunk, chunk)
        d0 = d0_ref[c, p]
        gz = gz_ref[0, 0, sl] - d0.astype(jnp.float32)
        gy = gy_ref[0, 0, sl] - h0
        gx = gx_ref[0, 0, sl]
        p_raw, _, _ = _pair_weight(gz, gy, inv2s2, DB, HT)
        zz, _ = _log_norm(gz, inv2s2, radius)
        zy, _ = _log_norm(gy, inv2s2, radius)
        zx, _ = _log_norm(gx, inv2s2, radius)
        ww_raw, _ = _axis_weight(gx, inv2s2, D)
        ww = ww_raw / (zz * zy * zx)[:, None]
        contrib = _dot(p_raw, ww, (((0,), (0,)), ((), ())), bf16)
        acc_ref[pl.ds(d0 * HT, DB * HT), :] += contrib
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def _mse_fwd_kernel_banded(sigma_ref, d0_ref, gz_ref, gy_ref, gx_ref,
                           mask_ref, sse_ref, acc_ref, *, D, DB, HT,
                           radius, chunk, bf16):
    p = pl.program_id(0)
    ht = pl.program_id(1)
    sigma = sigma_ref[0, p]
    acc_ref[...] = jnp.zeros_like(acc_ref)
    _accumulate_banded(acc_ref, d0_ref, gz_ref, gy_ref, gx_ref, sigma, D,
                       DB, HT, radius, chunk,
                       (ht * HT).astype(jnp.float32), bf16)

    def collapse(d, trans):
        v = jnp.clip(acc_ref[pl.ds(d * HT, HT), :], 0.0, 1.0 - _EPS)
        return trans * (1.0 - v)

    trans = jax.lax.fori_loop(0, D, collapse,
                              jnp.ones((HT, D), jnp.float32))
    err = (1.0 - trans) - mask_ref[0]
    sse_ref[...] = jnp.zeros_like(sse_ref)
    sse_ref[0, 0, 0, :] = jnp.sum(err * err, axis=0)


def _run_mse_fwd_banded(gz, gy, gx, sigma, masks, S, V, K, D, DB, radius,
                        chunk, bf16):
    P, N = gz.shape
    HT = _h_tile(D)
    margin = radius + 2
    chunk, _ = _band_chunks(D, DB, HT, chunk)
    d0, _ = _band_plan(gz, chunk, D, DB, margin)
    gz, gy, gx = (c.reshape(P, 1, N) for c in (gz, gy, gx))
    coord_spec = pl.BlockSpec((1, 1, N), lambda p, h: (p, 0, 0),
                              memory_space=pltpu.VMEM)
    sse = pl.pallas_call(
        functools.partial(_mse_fwd_kernel_banded, D=D, DB=DB, HT=HT,
                          radius=radius, chunk=chunk, bf16=bf16),
        grid=(P, D // HT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  coord_spec, coord_spec, coord_spec,
                  pl.BlockSpec((1, HT, D), _mask_index_map(S, V, K),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 8, D), lambda p, h: (p, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, D // HT, 8, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((D * HT, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * P * N * DB * D * D,
            bytes_accessed=P * (N * 12 + D * D * 4),
            transcendentals=P * N * (DB * D + D)),
        interpret=_interpret(),
    )(sigma.reshape(1, P), d0.T, gz, gy, gx, masks)
    return jnp.sum(sse, axis=(-3, -2, -1))


def _mse_bwd_kernel_banded(sigma_ref, gsse_ref, d0_ref, gz_ref, gy_ref,
                           gx_ref, mask_ref, dgz_ref, dgy_ref, dgx_ref,
                           acc_ref, cot_ref, *, D, DB, HT, radius, chunk,
                           bf16):
    p = pl.program_id(0)
    ht = pl.program_id(1)
    sigma = sigma_ref[0, p]
    inv2s2 = 0.5 / (sigma * sigma)
    inv_s2 = 2.0 * inv2s2
    h0 = (ht * HT).astype(jnp.float32)

    @pl.when(ht == 0)
    def _():
        dgz_ref[...] = jnp.zeros_like(dgz_ref)
        dgy_ref[...] = jnp.zeros_like(dgy_ref)
        dgx_ref[...] = jnp.zeros_like(dgx_ref)

    acc_ref[...] = jnp.zeros_like(acc_ref)
    _accumulate_banded(acc_ref, d0_ref, gz_ref, gy_ref, gx_ref, sigma, D,
                       DB, HT, radius, chunk, h0, bf16)

    def collapse(d, trans):
        v = jnp.clip(acc_ref[pl.ds(d * HT, HT), :], 0.0, 1.0 - _EPS)
        return trans * (1.0 - v)

    trans = jax.lax.fori_loop(0, D, collapse,
                              jnp.ones((HT, D), jnp.float32))
    gsil = gsse_ref[0, p] * 2.0 * ((1.0 - trans) - mask_ref[0])
    gt = gsil * trans

    def fill_cot(d, _):
        raw = acc_ref[pl.ds(d * HT, HT), :]
        v = jnp.clip(raw, 0.0, 1.0 - _EPS)
        mask = (raw < 1.0 - _EPS).astype(jnp.float32)
        cot_ref[pl.ds(d * HT, HT), :] = gt / (1.0 - v) * mask
        return 0

    jax.lax.fori_loop(0, D, fill_cot, 0)

    n_chunks = gz_ref.shape[2] // chunk

    def body(c, _):
        sl = pl.ds(c * chunk, chunk)
        d0 = d0_ref[c, p]
        gz_full = gz_ref[0, 0, sl]
        gy_full = gy_ref[0, 0, sl]
        gx = gx_ref[0, 0, sl]
        gz = gz_full - d0.astype(jnp.float32)
        gy = gy_full - h0
        p_raw, dzd, dyd = _pair_weight(gz, gy, inv2s2, DB, HT)
        zz, dlzz = _log_norm(gz, inv2s2, radius)
        zy, dlzy = _log_norm(gy_full, inv2s2, radius)
        zx, dlzx = _log_norm(gx, inv2s2, radius)
        ww_raw, dxd = _axis_weight(gx, inv2s2, D)
        ww = ww_raw / (zz * zy * zx)[:, None]
        gout = cot_ref[pl.ds(d0 * HT, DB * HT), :]
        d_ww = _dot(p_raw, gout, (((1,), (0,)), ((), ())), bf16)
        d_p = _dot(ww, gout, (((1,), (1,)), ((), ())), bf16)
        pd = d_p * p_raw
        dwsum = jnp.sum(d_ww * ww, axis=1)
        dgz_ref[0, 0, sl] += (jnp.sum(pd * dzd, axis=1) * inv_s2) \
            - dlzz * dwsum
        dgy_ref[0, 0, sl] += (jnp.sum(pd * dyd, axis=1) * inv_s2) \
            - dlzy * dwsum
        dgx_ref[0, 0, sl] += (jnp.sum(d_ww * ww * dxd, axis=1) * inv_s2) \
            - dlzx * dwsum
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def _run_mse_bwd_banded(gz, gy, gx, sigma, masks, gsse, S, V, K, D, DB,
                        radius, chunk, bf16):
    P, N = gz.shape
    HT = _h_tile(D)
    margin = radius + 2
    _, chunk = _band_chunks(D, DB, HT, chunk)
    d0, _ = _band_plan(gz, chunk, D, DB, margin)
    gz, gy, gx = (c.reshape(P, 1, N) for c in (gz, gy, gx))
    coord_spec = pl.BlockSpec((1, 1, N), lambda p, h: (p, 0, 0),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, N), lambda p, h: (p, 0, 0),
                            memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((P, 1, N), jnp.float32)
    dgz, dgy, dgx = pl.pallas_call(
        functools.partial(_mse_bwd_kernel_banded, D=D, DB=DB, HT=HT,
                          radius=radius, chunk=chunk, bf16=bf16),
        grid=(P, D // HT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  coord_spec, coord_spec, coord_spec,
                  pl.BlockSpec((1, HT, D), _mask_index_map(S, V, K),
                               memory_space=pltpu.VMEM)],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(shp, shp, shp),
        scratch_shapes=[pltpu.VMEM((D * HT, D), jnp.float32),
                        pltpu.VMEM((D * HT, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(sigma.reshape(1, P), gsse.reshape(1, P), d0.T, gz, gy, gx, masks)
    return (dgz.reshape(P, N), dgy.reshape(P, N), dgx.reshape(P, N))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def render_drc_mse_banded_soa(gz, gy, gx, sigma, masks, pair_shape: tuple,
                              vox_size: int, band: int, radius: int = 13,
                              chunk: int = 512,
                              bf16: bool = False) -> jnp.ndarray:
    """Depth-banded fused render + squared-error reduction.

    Same contract as render_drc_mse_pallas_soa, PLUS: per-pair coords must
    be sorted by gz, and every fwd-chunk's in-range depth span must fit
    band - 2*(radius+2) cells (use render_drc_mse_auto, which checks and
    falls back to the dense kernel otherwise). `band` must be a multiple
    of 8 with band < vox_size."""
    B, S, V, K = pair_shape
    return _run_mse_fwd_banded(gz, gy, gx, sigma, masks, S, V, K,
                               vox_size, band, radius, chunk, bf16)


def _mse_banded_vjp_fwd(gz, gy, gx, sigma, masks, pair_shape, vox_size,
                        band, radius, chunk, bf16):
    sse = render_drc_mse_banded_soa(gz, gy, gx, sigma, masks, pair_shape,
                                    vox_size, band, radius, chunk, bf16)
    return sse, (gz, gy, gx, sigma, masks)


def _mse_banded_vjp_bwd(pair_shape, vox_size, band, radius, chunk, bf16,
                        res, gsse):
    gz, gy, gx, sigma, masks = res
    B, S, V, K = pair_shape
    dgz, dgy, dgx = _run_mse_bwd_banded(gz, gy, gx, sigma, masks, gsse,
                                        S, V, K, vox_size, band, radius,
                                        chunk, bf16)
    return dgz, dgy, dgx, jnp.zeros_like(sigma), jnp.zeros_like(masks)


render_drc_mse_banded_soa.defvjp(_mse_banded_vjp_fwd, _mse_banded_vjp_bwd)


# Measured-optimal auto-band width (r4, tools/band_crossover_bench.py)
# AT RADIUS 13 on the bench's clustered inputs: covers a 512-pt sorted
# chunk's typical depth span plus the 2*(radius+2) footprint margin.
# Kept as the crossover-bench constant; the DISPATCH derives its band
# from auto_band(radius) below.
AUTO_BAND = 56

# Realistic per-chunk depth-span budget the band must cover (r5 span
# analysis at 8k-point density under perspective: spans run ~9-27 cells
# typical with tails to ~56 — the nearest/farthest sorted chunks fatten
# under projection). A band sized below this makes render_drc_mse_auto's
# all-or-nothing lax.cond silently fall back to dense on REAL clouds —
# exactly what happened to the r5 256^3 quality runs at band 80 (budget
# 26; BASELINE.md honesty note). 58 covers the measured max.
AUTO_SPAN_BUDGET = 58


def auto_band(radius: int) -> int:
    """Band width for the D>=192 auto dispatch: the measured realistic
    span budget plus the kernel's 2*(radius+2) planning margin, rounded
    up to the /8 Mosaic alignment. radius 13 -> 88, radius 25 -> 112
    (the c4xl preset value, measured banded-engaged at 1.29M ppv/s vs
    the 1.1M dense fallback)."""
    need = AUTO_SPAN_BUDGET + 2 * (radius + 2)
    return ((need + 7) // 8) * 8


def fused_mse_train_flops(pairs: int, n_padded: int, vox_size: int,
                          band: int = 0) -> int:
    """MXU FLOPs for ONE value_and_grad of the fused render+MSE path —
    the kernels' own cost model, hoisted for MFU accounting (VERDICT r4
    missing #4: bench.py / tools/e2e_profile.py report
    mfu = this / dt / peak, peak documented in BASELINE.md).

    Derivation (per pair, per HT tile, summed over N/chunk chunks and
    D/HT tiles; n_padded is the kernel's operand length — the chunk
    padding is executed work, so it counts):
      fwd grid accumulation  p_raw^T (chunk, D*HT) @ ww (chunk, D)
                             -> 2*N*D^3
      bwd cotangent contractions  d_ww = p_raw @ gout, d_p = ww @ gout^T
                             -> 2 x 2*N*D^3
    Total 6*N*D^3 per pair; the one-pass kernel fuses all three into one
    launch but executes the same matmuls. The depth-banded kernel shrinks
    every contraction's depth extent from D to `band`. VPU exp work
    (transcendentals) is excluded: MFU counts MXU work only."""
    depth = band if band else vox_size
    return 6 * pairs * n_padded * depth * vox_size * vox_size


def fused_rgb_mse_train_flops(pairs: int, n_padded: int, vox_size: int,
                              mode: str) -> int:
    """MXU FLOPs for ONE value_and_grad of the fused RGB render+MSE path
    (companion of fused_mse_train_flops; same conventions, MXU work only).

    Per pair the 4-grid lane-packed contractions cost, in units of
    N*D^3 (N = n_padded):
      accumulate  p_raw (chunk, D*HT) @ wk4 (chunk, 4D)      -> 8
      grad chunks d_ww4 = p_raw @ cot4, d_p = ww4 @ cot4^T   -> 8 + 8
      sil-column grad (narrow D-wide cotangent, onepass2)    -> 2 + 2
    mode: "onepass_ct" = accumulate + grad = 24;
          "onepass2"   = accumulate + grad + sil grad = 28;
          "twokernel"  = fwd (accumulate, 8) + bwd (accumulate again +
          grad, 24) = 32 — the bwd rematerializes the grids in-kernel."""
    unit = pairs * n_padded * vox_size ** 3
    return {"onepass_ct": 24, "onepass2": 28, "twokernel": 32}[mode] * unit


def render_drc_mse_auto(gz, gy, gx, sigma, masks, pair_shape: tuple,
                        vox_size: int, radius: int = 13, chunk: int = 512,
                        bf16: bool = False,
                        band: int | None = None) -> jnp.ndarray:
    """Fused render+MSE with optional depth banding (explicit opt-in).

    band: window width DB (multiple of 8), 0/None for the dense kernel.

    MEASURED NEGATIVE RESULT (r3, v5e-1, P=20 pairs x 8192 pts, D=128):
    the banded kernel alone is 1.43x faster than dense (19.5 vs 27.9ms
    fwd+bwd), but the depth-sort wrapper costs more than the 8.4ms it
    saves — argsort 2.0ms + 3x take_along_axis 7.3ms fwd + gather-grad
    scatters ~8ms bwd; a one-hot-matmul permutation is no better (6.1ms
    fwd: the (N,3) output uses 3 of the MXU's 128 lanes, and bf16
    operands lose coordinate precision, max err 0.25 at D=128). On TPU
    the dense kernel's "wasted" VPU exps are cheaper than any data
    movement that avoids them, so dense stays the default at the
    BASELINE grid sizes (<=128³).

    MEASURED CROSSOVER (r4, v5e-1, 20 pairs x 8192 pts, fwd+bwd via
    jax.grad, sort tax included — tools/band_crossover_bench.py): the
    band/D waste ratio grows with D while the sort tax grows only with
    N, so the balance flips between 128³ and 192³:
      128³ band=48: dense 25.2ms, auto 26.0ms  (dense wins — r3 stands)
      192³ band=56: dense 73.3ms, auto 39.9ms  (banded 1.84x)
      256³ band=56: dense 126.6ms, auto 49.8ms (banded 2.54x)
    The `c4xl_256grid` preset ships with pallas_band=56 accordingly.

    When banding, sorts each pair's points by depth (the SSE is
    permutation-invariant over points; gradients route back through the
    gather), plans per-chunk windows, and lax.cond-dispatches: banded
    when every chunk's depth span fits the band budget, dense otherwise
    — bitwise-safe for any input."""
    D = vox_size
    if band is None:
        band = 0
    if not band or band >= D:
        return render_drc_mse_pallas_soa(gz, gy, gx, sigma, masks,
                                         pair_shape, D, radius, chunk,
                                         bf16)
    assert band % 8 == 0, band
    order = jnp.argsort(gz, axis=-1)
    gzs, gys, gxs = (jnp.take_along_axis(c, order, axis=-1)
                     for c in (gz, gy, gx))
    HT = _h_tile(D)
    fwd_chunk, _ = _band_chunks(D, band, HT, chunk)
    _, ok = _band_plan(gzs, fwd_chunk, D, band, radius + 2)

    def banded(g3):
        return render_drc_mse_banded_soa(g3[0], g3[1], g3[2], sigma,
                                         masks, pair_shape, D, band,
                                         radius, chunk, bf16)

    def dense(g3):
        return render_drc_mse_pallas_soa(g3[0], g3[1], g3[2], sigma,
                                         masks, pair_shape, D, radius,
                                         chunk, bf16)

    return jax.lax.cond(ok, banded, dense, (gzs, gys, gxs))


# ===================================================================
# Fused RGB render + MSE: neither silhouettes NOR composited images ever
# leave VMEM — the c5 training path. Per (pair, H-tile) the forward splats
# the four grids (occ + 3 color channels), runs the expected-color collapse,
# and emits only per-row sums of (sil - mask)^2 and of the MASKED color
# squared error sum_c (img_c - target_c)^2 * mask. The backward recomputes
# the tile, reruns the collapse to rebuild img, seeds BOTH cotangents
# in-kernel (gsil = g0 * 2 * (sil - mask); gimg_c = g1 * 2 * (img_c -
# target_c) * mask) and reuses the shared reverse sweep + chunk backward.
# Masks and target images stay compact (B*V, ...) — the S*K pairs per
# target view read the same blocks via the index_maps.
#
# Removes, per pair vs the unfused c5 path: the sil + img HBM writes and
# reads, their cotangent round-trips, and the XLA-side (P, H, W[, 3])
# mask/image broadcasts. Pair convention p = ((b*S+s)*V+t)*K+k, as in
# render_drc_mse_pallas_soa.
# ===================================================================

def _imgt_index_map(S, V, K):
    """(p, ht) -> block index of the compact (B*V, 3, H, W) target images."""
    def index_map(p, ht):
        b = p // (S * V * K)
        t = (p // K) % V
        return b * V + t, 0, ht, 0
    return index_map


def _rgb_mse_fwd_kernel_soa(sigma_ref, gz_ref, gy_ref, gx_ref, cr_ref,
                            cg_ref, cb_ref, mask_ref, imgt_ref, sse_ref,
                            packed_s, occ_s, r_s, g_s, b_s, *, D, HT,
                            radius, chunk, bf16):
    p = pl.program_id(0)
    ht = pl.program_id(1)
    sigma = sigma_ref[0, p]
    packed_s[...] = jnp.zeros_like(packed_s)
    _accumulate_rgb_packed(packed_s, gz_ref, gy_ref, gx_ref, cr_ref,
                           cg_ref, cb_ref, sigma, D, HT, radius, chunk,
                           (ht * HT).astype(jnp.float32), bf16)
    _unpack4(packed_s, occ_s, r_s, g_s, b_s, D)

    def body(d, carry):
        trans, img = carry
        raw = occ_s[pl.ds(d * HT, HT), :]
        v = jnp.clip(raw, 0.0, 1.0 - _EPS)
        # one divide per depth step (VPU: 3 divides measured as real cost
        # in the D-long sweep), then 3 multiplies
        wd = v * trans / jnp.maximum(raw, _ONORM_EPS)
        img = img + jnp.stack([
            wd * r_s[pl.ds(d * HT, HT), :],
            wd * g_s[pl.ds(d * HT, HT), :],
            wd * b_s[pl.ds(d * HT, HT), :]])
        return trans * (1.0 - v), img

    trans, img = jax.lax.fori_loop(
        0, D, body, (jnp.ones((HT, D), jnp.float32),
                     jnp.zeros((3, HT, D), jnp.float32)))
    mask = mask_ref[0]
    err_s = (1.0 - trans) - mask
    err_i = img - imgt_ref[0]                             # (3, HT, W)
    # two (W,) row sums land in sublanes 0 (sil) and 1 (rgb) of the
    # (8, W)-aligned output block (same alignment rule as the sil-only
    # MSE kernel: a sub-(8, W) block fails Mosaic lowering at D//HT > 1)
    sse_ref[...] = jnp.zeros_like(sse_ref)
    sse_ref[0, 0, 0, :] = jnp.sum(err_s * err_s, axis=0)
    sse_ref[0, 0, 1, :] = jnp.sum(jnp.sum(err_i * err_i, axis=0) * mask,
                                  axis=0)


def _run_rgb_mse_fwd_soa(gz, gy, gx, cr, cg, cb, sigma, masks, images,
                         S, V, K, D, radius, chunk, bf16):
    P, N = gz.shape
    HT = _h_tile_rgb(D)
    chunk = _chunk_budget(D, HT, chunk, live=2,
                          reserve=8 * D * HT * D * 4)
    ops = tuple(c.reshape(P, 1, N) for c in (gz, gy, gx, cr, cg, cb))
    spec = pl.BlockSpec((1, 1, N), lambda p, h: (p, 0, 0),
                        memory_space=pltpu.VMEM)
    sse = pl.pallas_call(
        functools.partial(_rgb_mse_fwd_kernel_soa, D=D, HT=HT,
                          radius=radius, chunk=chunk, bf16=bf16),
        grid=(P, D // HT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * 6 + [
            pl.BlockSpec((1, HT, D), _mask_index_map(S, V, K),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, HT, D), _imgt_index_map(S, V, K),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 8, D), lambda p, h: (p, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, D // HT, 8, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((D * HT, 4 * D), jnp.float32)]
                       + [pltpu.VMEM((D * HT, D), jnp.float32)
                          for _ in range(4)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=8 * P * N * D * D * D,
            bytes_accessed=P * (N * 24 + D * D * 16),
            transcendentals=P * N * (D * D + D)),
        interpret=_interpret(),
    )(sigma.reshape(1, P), *ops, masks, images)
    s = jnp.sum(sse, axis=(1, 3))                         # (P, 8)
    return s[:, :2]                                       # (P, 2)


def _rgb_mse_bwd_kernel_soa(sigma_ref, gsse_ref, gz_ref, gy_ref, gx_ref,
                            cr_ref, cg_ref, cb_ref, mask_ref, imgt_ref,
                            dgz_ref, dgy_ref, dgx_ref, dcr_ref, dcg_ref,
                            dcb_ref, packed_s, occ_s, r_s, g_s, b_s, t_s,
                            *, D, HT, radius, chunk, bf16):
    p = pl.program_id(0)
    ht = pl.program_id(1)
    sigma = sigma_ref[0, p]
    inv2s2 = 0.5 / (sigma * sigma)
    h0 = (ht * HT).astype(jnp.float32)

    @pl.when(ht == 0)
    def _():
        for ref in (dgz_ref, dgy_ref, dgx_ref, dcr_ref, dcg_ref, dcb_ref):
            ref[...] = jnp.zeros_like(ref)

    packed_s[...] = jnp.zeros_like(packed_s)
    _accumulate_rgb_packed(packed_s, gz_ref, gy_ref, gx_ref, cr_ref,
                           cg_ref, cb_ref, sigma, D, HT, radius, chunk,
                           h0, bf16)
    _unpack4(packed_s, occ_s, r_s, g_s, b_s, D)

    # forward sweep: transmittances into t_s AND the composited image
    # (needed to seed gimg — the sil-only kernel's sweep skips it)
    def fwd_sweep(d, carry):
        trans, img = carry
        sl = pl.ds(d * HT, HT)
        t_s[sl, :] = trans
        raw = occ_s[sl, :]
        v = jnp.clip(raw, 0.0, 1.0 - _EPS)
        # one divide per depth step, then 3 multiplies (see _rgb_fwd)
        wd = v * trans / jnp.maximum(raw, _ONORM_EPS)
        img = img + jnp.stack([
            wd * r_s[sl, :],
            wd * g_s[sl, :],
            wd * b_s[sl, :]])
        return trans * (1.0 - v), img

    trans, img = jax.lax.fori_loop(
        0, D, fwd_sweep, (jnp.ones((HT, D), jnp.float32),
                          jnp.zeros((3, HT, D), jnp.float32)))
    mask = mask_ref[0]
    # in-kernel loss seeds: d sse_sil/d sil and d sse_rgb/d img
    gsil = gsse_ref[0, p] * 2.0 * ((1.0 - trans) - mask)
    gimg = gsse_ref[1, p] * 2.0 * (img - imgt_ref[0]) * mask[None]
    _rgb_rev_sweep(occ_s, r_s, g_s, b_s, t_s, gsil, gimg, D, HT)
    _pack4(packed_s, occ_s, r_s, g_s, b_s, D)
    _rgb_grad_chunks(gz_ref, gy_ref, gx_ref, cr_ref, cg_ref, cb_ref,
                     dgz_ref, dgy_ref, dgx_ref, dcr_ref, dcg_ref, dcb_ref,
                     packed_s, inv2s2, h0, D, HT, radius, chunk, bf16)


def _run_rgb_mse_bwd_soa(gz, gy, gx, cr, cg, cb, sigma, masks, images,
                         gsse, S, V, K, D, radius, chunk, bf16):
    P, N = gz.shape
    HT = _h_tile_rgb(D)
    chunk = _chunk_budget(D, HT, chunk, live=12,
                          reserve=9 * D * HT * D * 4,
                          budget=56 * 2 ** 20)
    ops = tuple(c.reshape(P, 1, N) for c in (gz, gy, gx, cr, cg, cb))
    spec = pl.BlockSpec((1, 1, N), lambda p, h: (p, 0, 0),
                        memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((P, 1, N), jnp.float32)
    outs = pl.pallas_call(
        functools.partial(_rgb_mse_bwd_kernel_soa, D=D, HT=HT,
                          radius=radius, chunk=chunk, bf16=bf16),
        grid=(P, D // HT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)]
                 + [spec] * 6 + [
            pl.BlockSpec((1, HT, D), _mask_index_map(S, V, K),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, HT, D), _imgt_index_map(S, V, K),
                         memory_space=pltpu.VMEM)],
        out_specs=tuple([spec] * 6),
        out_shape=tuple([shp] * 6),
        scratch_shapes=[pltpu.VMEM((D * HT, 4 * D), jnp.float32)]
                       + [pltpu.VMEM((D * HT, D), jnp.float32)
                          for _ in range(5)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(sigma.reshape(1, P), gsse.T, *ops, masks, images)
    return tuple(o.reshape(P, N) for o in outs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13))
def render_drc_rgb_mse_pallas_soa(gz, gy, gx, cr, cg, cb, sigma, masks,
                                  images, pair_shape: tuple,
                                  vox_size: int, radius: int = 13,
                                  chunk: int = 512,
                                  bf16: bool = False) -> jnp.ndarray:
    """Fused RGB render + squared-error reductions.

    Args:
      gz/gy/gx: (P, N) fractional grid coords, P = B*S*V*K flattened as
        ((b*S+s)*V+t)*K+k; N a chunk multiple (pad with large negatives).
      cr/cg/cb: (P, N) per-point colors (pad with zeros).
      sigma: (P,) per-pair footprint std.
      masks: (B*V, H, W) target masks, flattened b*V+t.
      images: (B*V, 3, H, W) target images, flattened b*V+t.
      pair_shape: static (B, S, V, K).

    Returns (P, 2): [:, 0] = sum (sil - mask)^2 over pixels, [:, 1] =
    sum_c (img_c - target_c)^2 * mask. Differentiable w.r.t. coords and
    colors (analytic in-kernel seeds); sigma/masks/images get zero
    cotangents."""
    B, S, V, K = pair_shape
    return _run_rgb_mse_fwd_soa(gz, gy, gx, cr, cg, cb, sigma, masks,
                                images, S, V, K, vox_size, radius, chunk,
                                bf16)


def _rgb_mse_soa_vjp_fwd(gz, gy, gx, cr, cg, cb, sigma, masks, images,
                         pair_shape, vox_size, radius, chunk, bf16):
    sse = render_drc_rgb_mse_pallas_soa(gz, gy, gx, cr, cg, cb, sigma,
                                        masks, images, pair_shape,
                                        vox_size, radius, chunk, bf16)
    return sse, (gz, gy, gx, cr, cg, cb, sigma, masks, images)


def _rgb_mse_soa_vjp_bwd(pair_shape, vox_size, radius, chunk, bf16, res,
                         gsse):
    gz, gy, gx, cr, cg, cb, sigma, masks, images = res
    B, S, V, K = pair_shape
    grads = _run_rgb_mse_bwd_soa(gz, gy, gx, cr, cg, cb, sigma, masks,
                                 images, gsse, S, V, K, vox_size, radius,
                                 chunk, bf16)
    return grads + (jnp.zeros_like(sigma), jnp.zeros_like(masks),
                    jnp.zeros_like(images))


render_drc_rgb_mse_pallas_soa.defvjp(_rgb_mse_soa_vjp_fwd,
                                     _rgb_mse_soa_vjp_bwd)


# ===================================================================
# ONE-PASS fused RGB render + MSE + gradient — same DCE discovery as
# render_drc_mse_onepass (see that block's comment), applied to the c5
# training path where both kernels are ~3x bigger. The SSE here has TWO
# columns (sil, masked-RGB) whose cotangents differ, so the unscaled-
# Jacobian trick would double the gradient contractions; instead the
# caller passes the per-pair cotangent ct (P, 2) INTO the kernel (it
# seeds both in-kernel cotangents exactly as the two-kernel backward
# does) and the custom VJP's backward rescales the stored ct-weighted
# gradients by the per-pair ratio gsse/ct.
#
# CONTRACT: the surrounding loss must be linear in sse with per-pair
# coefficient vectors PROPORTIONAL to ct (write it as sum(ct * sse), so
# the incoming cotangent equals ct and the rescale is exactly 1). That
# holds for the known-pose c5 branch, where ct is a batch constant
# (pair weights / mask-sum normalizers). The pose-ensemble RGB branch
# has argmin-dependent cotangents — it keeps the two-kernel op.
# ===================================================================

def _rgb_mse_onepass_kernel_soa(sigma_ref, ct_ref, gz_ref, gy_ref, gx_ref,
                                cr_ref, cg_ref, cb_ref, mask_ref, imgt_ref,
                                sse_ref, dgz_ref, dgy_ref, dgx_ref,
                                dcr_ref, dcg_ref, dcb_ref, packed_s,
                                occ_s, r_s, g_s, b_s, t_s, *, D, HT,
                                radius, chunk, bf16):
    p = pl.program_id(0)
    ht = pl.program_id(1)
    sigma = sigma_ref[0, p]
    inv2s2 = 0.5 / (sigma * sigma)
    h0 = (ht * HT).astype(jnp.float32)

    @pl.when(ht == 0)
    def _():
        for ref in (dgz_ref, dgy_ref, dgx_ref, dcr_ref, dcg_ref, dcb_ref):
            ref[...] = jnp.zeros_like(ref)

    packed_s[...] = jnp.zeros_like(packed_s)
    _accumulate_rgb_packed(packed_s, gz_ref, gy_ref, gx_ref, cr_ref,
                           cg_ref, cb_ref, sigma, D, HT, radius, chunk,
                           h0, bf16)
    _unpack4(packed_s, occ_s, r_s, g_s, b_s, D)

    def fwd_sweep(d, carry):
        trans, img = carry
        sl = pl.ds(d * HT, HT)
        t_s[sl, :] = trans
        raw = occ_s[sl, :]
        v = jnp.clip(raw, 0.0, 1.0 - _EPS)
        # one divide per depth step, then 3 multiplies (see _rgb_fwd)
        wd = v * trans / jnp.maximum(raw, _ONORM_EPS)
        img = img + jnp.stack([
            wd * r_s[sl, :],
            wd * g_s[sl, :],
            wd * b_s[sl, :]])
        return trans * (1.0 - v), img

    trans, img = jax.lax.fori_loop(
        0, D, fwd_sweep, (jnp.ones((HT, D), jnp.float32),
                          jnp.zeros((3, HT, D), jnp.float32)))
    mask = mask_ref[0]
    err_s = (1.0 - trans) - mask
    err_i = img - imgt_ref[0]
    sse_ref[...] = jnp.zeros_like(sse_ref)
    sse_ref[0, 0, 0, :] = jnp.sum(err_s * err_s, axis=0)
    sse_ref[0, 0, 1, :] = jnp.sum(jnp.sum(err_i * err_i, axis=0) * mask,
                                  axis=0)
    # ct-weighted in-kernel seeds (the VJP backward rescales by gsse/ct)
    gsil = ct_ref[0, p] * 2.0 * err_s
    gimg = ct_ref[1, p] * 2.0 * err_i * mask[None]
    _rgb_rev_sweep(occ_s, r_s, g_s, b_s, t_s, gsil, gimg, D, HT)
    _pack4(packed_s, occ_s, r_s, g_s, b_s, D)
    _rgb_grad_chunks(gz_ref, gy_ref, gx_ref, cr_ref, cg_ref, cb_ref,
                     dgz_ref, dgy_ref, dgx_ref, dcr_ref, dcg_ref, dcb_ref,
                     packed_s, inv2s2, h0, D, HT, radius, chunk, bf16)


def _run_rgb_mse_onepass_soa(gz, gy, gx, cr, cg, cb, sigma, masks, images,
                             ct, S, V, K, D, radius, chunk, bf16):
    P, N = gz.shape
    HT = _h_tile_rgb(D)
    chunk = _chunk_budget(D, HT, chunk, live=12,
                          reserve=9 * D * HT * D * 4,
                          budget=56 * 2 ** 20)
    ops = tuple(c.reshape(P, 1, N) for c in (gz, gy, gx, cr, cg, cb))
    spec = pl.BlockSpec((1, 1, N), lambda p, h: (p, 0, 0),
                        memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((P, 1, N), jnp.float32)
    outs = pl.pallas_call(
        functools.partial(_rgb_mse_onepass_kernel_soa, D=D, HT=HT,
                          radius=radius, chunk=chunk, bf16=bf16),
        grid=(P, D // HT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)]
                 + [spec] * 6 + [
            pl.BlockSpec((1, HT, D), _mask_index_map(S, V, K),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, HT, D), _imgt_index_map(S, V, K),
                         memory_space=pltpu.VMEM)],
        out_specs=tuple([pl.BlockSpec((1, 1, 8, D),
                                      lambda p, h: (p, h, 0, 0),
                                      memory_space=pltpu.VMEM)]
                        + [spec] * 6),
        out_shape=tuple([jax.ShapeDtypeStruct((P, D // HT, 8, D),
                                              jnp.float32)] + [shp] * 6),
        scratch_shapes=[pltpu.VMEM((D * HT, 4 * D), jnp.float32)]
                       + [pltpu.VMEM((D * HT, D), jnp.float32)
                          for _ in range(5)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(sigma.reshape(1, P), ct.T, *ops, masks, images)
    sse = jnp.sum(outs[0], axis=(1, 3))[:, :2]            # (P, 2)
    return (sse,) + tuple(o.reshape(P, N) for o in outs[1:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14))
def render_drc_rgb_mse_onepass(gz, gy, gx, cr, cg, cb, sigma, masks,
                               images, ct, pair_shape: tuple,
                               vox_size: int, radius: int = 13,
                               chunk: int = 512,
                               bf16: bool = False) -> jnp.ndarray:
    """One-pass fused RGB render + squared-errors + ct-weighted gradient.

    Same contract and return value as render_drc_rgb_mse_pallas_soa,
    plus ct: (P, 2) per-pair loss coefficients — the surrounding loss
    must be sum(ct * sse) (or proportional per pair; see the block
    comment). value_and_grad runs ONE kernel instead of two. ct, sigma,
    masks and images get zero cotangents."""
    B, S, V, K = pair_shape
    out = _run_rgb_mse_onepass_soa(gz, gy, gx, cr, cg, cb, sigma, masks,
                                   images, ct, S, V, K, vox_size, radius,
                                   chunk, bf16)
    return out[0]


def _rgb_mse_onepass_vjp_fwd(gz, gy, gx, cr, cg, cb, sigma, masks, images,
                             ct, pair_shape, vox_size, radius, chunk,
                             bf16):
    B, S, V, K = pair_shape
    out = _run_rgb_mse_onepass_soa(gz, gy, gx, cr, cg, cb, sigma, masks,
                                   images, ct, S, V, K, vox_size, radius,
                                   chunk, bf16)
    return out[0], (out[1:], ct, sigma, masks, images)


def _rgb_mse_onepass_vjp_bwd(pair_shape, vox_size, radius, chunk, bf16,
                             res, gsse):
    grads, ct, sigma, masks, images = res
    # per-pair rescale gsse/ct: exactly 1 when the loss is sum(ct * sse);
    # proportional losses (gsse = lam * ct) rescale by lam. Excluded
    # pairs (ct == 0 in both columns) carry zero stored gradients.
    lam = jnp.where(ct[:, 0] != 0, gsse[:, 0] / jnp.where(ct[:, 0] != 0,
                                                          ct[:, 0], 1.0),
                    jnp.where(ct[:, 1] != 0,
                              gsse[:, 1] / jnp.where(ct[:, 1] != 0,
                                                     ct[:, 1], 1.0), 0.0))
    lam = lam[:, None]
    return tuple(lam * g for g in grads) + (
        jnp.zeros_like(sigma), jnp.zeros_like(masks),
        jnp.zeros_like(images), jnp.zeros_like(ct))


render_drc_rgb_mse_onepass.defvjp(_rgb_mse_onepass_vjp_fwd,
                                  _rgb_mse_onepass_vjp_bwd)


# ===================================================================
# ONE-PASS RGB render + MSE with TWO-COLUMN UNSCALED Jacobians — the
# pose-ensemble fast path (VERDICT r4 missing #5). The ct-weighted
# kernel above needs the per-pair loss coefficients at FORWARD time,
# which the pose branch cannot provide (its cotangents depend on the
# argmin over the very sse this kernel computes). Instead this variant
# emits the two columns' Jacobians separately and the custom VJP
# combines them under the true cotangents:
#     dL/dcoord = gsse[:,0]*J_sil + gsse[:,1]*J_rgb
#     dL/dcolor = gsse[:,1]*J_rgb_color          (J_sil_color == 0:
#                 the silhouette does not depend on colors)
# — exact for ANY downstream loss, argmin selection included (same
# argument as render_drc_mse_onepass).
#
# Why this beats the two-kernel op (per pair, units of N*D^3 MXU work):
#     two-kernel:  fwd accumulate 8 + bwd (accumulate 8 + packed grad
#                  contractions 16) = 32, with THREE exp evaluations of
#                  the chunk weights (fwd, bwd-rematerialize, grad) and
#                  two kernel launches reading the operands twice.
#     this kernel: accumulate 8 + RGB-column grad 16 + SIL-column grad
#                  4 (the sil cotangent is one D-wide grid, not the
#                  4D-wide pack) = 28, ONE launch, TWO exp evaluations
#                  (accumulate + one merged grad-chunk loop that feeds
#                  both columns' contractions from the same weights).
# The sil-column occupancy cotangent has the closed form of the
# sil-only kernel (2*err_s*trans_total/(1-v)*[v<1-eps]) — no second
# reverse sweep needed; the RGB column runs _rgb_rev_sweep with a zero
# silhouette seed.
# ===================================================================

def _rgb_grad_chunks2(gz_ref, gy_ref, gx_ref, cr_ref, cg_ref, cb_ref,
                      dgz_s_ref, dgy_s_ref, dgx_s_ref, dgz_r_ref,
                      dgy_r_ref, dgx_r_ref, dcr_ref, dcg_ref, dcb_ref,
                      cot4_s, cot_sil_s, inv2s2, h0, D, HT, radius,
                      chunk, bf16):
    """Merged grad-chunk loop: per chunk, compute the Gaussian weights
    ONCE and contract them against BOTH cotangent grids — the packed
    (D*HT, 4D) RGB-column cotangents (identities as _rgb_grad_chunks)
    and the narrow (D*HT, D) sil-column cotangent (identities as the
    sil one-pass chunk body)."""
    inv_s2 = 2.0 * inv2s2
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

        # ---- RGB column: packed 4-grid cotangent ----
        cot4 = cot4_s[...]
        d_ww4 = _dot(p_raw, cot4, (((1,), (0,)), ((), ())), bf16)
        ww_t4 = jnp.concatenate([ww] * 4, axis=1)
        prod = d_ww4 * ww_t4                       # (chunk, 4W)
        dcr_ref[0, 0, sl] += jnp.sum(prod[:, D:2 * D], axis=1)
        dcg_ref[0, 0, sl] += jnp.sum(prod[:, 2 * D:3 * D], axis=1)
        dcb_ref[0, 0, sl] += jnp.sum(prod[:, 3 * D:4 * D], axis=1)
        ones = jnp.ones_like(ww)
        val4 = jnp.concatenate(
            [ones] + [vals[k][:, None] * ones for k in range(3)], axis=1)
        pv = prod * val4
        dwsum_r = jnp.sum(pv, axis=1)
        dx_term = jnp.sum(pv * jnp.concatenate([dxd] * 4, axis=1), axis=1)
        ww4 = ww_t4 * val4
        d_p = _dot(ww4, cot4, (((1,), (1,)), ((), ())), bf16)
        pd = d_p * p_raw
        dgz_r_ref[0, 0, sl] += (jnp.sum(pd * dzd, axis=1) * inv_s2) \
            - dlzz * dwsum_r
        dgy_r_ref[0, 0, sl] += (jnp.sum(pd * dyd, axis=1) * inv_s2) \
            - dlzy * dwsum_r
        dgx_r_ref[0, 0, sl] += (dx_term * inv_s2) - dlzx * dwsum_r

        # ---- SIL column: narrow occupancy cotangent ----
        cot1 = cot_sil_s[...]
        d_ww1 = _dot(p_raw, cot1, (((1,), (0,)), ((), ())), bf16)
        d_p1 = _dot(ww, cot1, (((1,), (1,)), ((), ())), bf16)
        pd1 = d_p1 * p_raw
        dww_w = d_ww1 * ww
        dwsum_s = jnp.sum(dww_w, axis=1)
        dgz_s_ref[0, 0, sl] += (jnp.sum(pd1 * dzd, axis=1) * inv_s2) \
            - dlzz * dwsum_s
        dgy_s_ref[0, 0, sl] += (jnp.sum(pd1 * dyd, axis=1) * inv_s2) \
            - dlzy * dwsum_s
        dgx_s_ref[0, 0, sl] += (jnp.sum(dww_w * dxd, axis=1) * inv_s2) \
            - dlzx * dwsum_s
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def _rgb_mse_onepass2_kernel_soa(sigma_ref, gz_ref, gy_ref, gx_ref,
                                 cr_ref, cg_ref, cb_ref, mask_ref,
                                 imgt_ref, sse_ref, dgz_s_ref, dgy_s_ref,
                                 dgx_s_ref, dgz_r_ref, dgy_r_ref,
                                 dgx_r_ref, dcr_ref, dcg_ref, dcb_ref,
                                 packed_s, occ_s, r_s, g_s, b_s, t_s,
                                 cot_sil_s, *, D, HT, radius, chunk,
                                 bf16):
    p = pl.program_id(0)
    ht = pl.program_id(1)
    sigma = sigma_ref[0, p]
    inv2s2 = 0.5 / (sigma * sigma)
    h0 = (ht * HT).astype(jnp.float32)

    @pl.when(ht == 0)
    def _():
        for ref in (dgz_s_ref, dgy_s_ref, dgx_s_ref, dgz_r_ref,
                    dgy_r_ref, dgx_r_ref, dcr_ref, dcg_ref, dcb_ref):
            ref[...] = jnp.zeros_like(ref)

    packed_s[...] = jnp.zeros_like(packed_s)
    _accumulate_rgb_packed(packed_s, gz_ref, gy_ref, gx_ref, cr_ref,
                           cg_ref, cb_ref, sigma, D, HT, radius, chunk,
                           h0, bf16)
    _unpack4(packed_s, occ_s, r_s, g_s, b_s, D)

    def fwd_sweep(d, carry):
        trans, img = carry
        sl = pl.ds(d * HT, HT)
        t_s[sl, :] = trans
        raw = occ_s[sl, :]
        v = jnp.clip(raw, 0.0, 1.0 - _EPS)
        # one divide per depth step, then 3 multiplies (see _rgb_fwd)
        wd = v * trans / jnp.maximum(raw, _ONORM_EPS)
        img = img + jnp.stack([
            wd * r_s[sl, :],
            wd * g_s[sl, :],
            wd * b_s[sl, :]])
        return trans * (1.0 - v), img

    trans, img = jax.lax.fori_loop(
        0, D, fwd_sweep, (jnp.ones((HT, D), jnp.float32),
                          jnp.zeros((3, HT, D), jnp.float32)))
    mask = mask_ref[0]
    err_s = (1.0 - trans) - mask
    err_i = img - imgt_ref[0]
    sse_ref[...] = jnp.zeros_like(sse_ref)
    sse_ref[0, 0, 0, :] = jnp.sum(err_s * err_s, axis=0)
    sse_ref[0, 0, 1, :] = jnp.sum(jnp.sum(err_i * err_i, axis=0) * mask,
                                  axis=0)

    # SIL-column occupancy cotangent, closed form (cf. the sil one-pass
    # kernel's fill_cot): gt = 2*err_s*trans_total, cot[d] =
    # gt/(1-v_d)*[raw_d < 1-eps]. UNSCALED seed (gsse_sil = 1).
    gt = 2.0 * err_s * trans

    def fill_cot(d, _):
        sl = pl.ds(d * HT, HT)
        raw = occ_s[sl, :]
        v = jnp.clip(raw, 0.0, 1.0 - _EPS)
        keep = (raw < 1.0 - _EPS).astype(jnp.float32)
        cot_sil_s[sl, :] = gt / (1.0 - v) * keep
        return 0

    jax.lax.fori_loop(0, D, fill_cot, 0)

    # RGB column: reverse sweep with a ZERO silhouette seed and the
    # unscaled image cotangent (gsse_rgb = 1)
    gimg = 2.0 * err_i * mask[None]
    _rgb_rev_sweep(occ_s, r_s, g_s, b_s, t_s,
                   jnp.zeros((HT, D), jnp.float32), gimg, D, HT)
    _pack4(packed_s, occ_s, r_s, g_s, b_s, D)
    _rgb_grad_chunks2(gz_ref, gy_ref, gx_ref, cr_ref, cg_ref, cb_ref,
                      dgz_s_ref, dgy_s_ref, dgx_s_ref, dgz_r_ref,
                      dgy_r_ref, dgx_r_ref, dcr_ref, dcg_ref, dcb_ref,
                      packed_s, cot_sil_s, inv2s2, h0, D, HT, radius,
                      chunk, bf16)


def _run_rgb_mse_onepass2_soa(gz, gy, gx, cr, cg, cb, sigma, masks,
                              images, S, V, K, D, radius, chunk, bf16):
    P, N = gz.shape
    HT = _h_tile_rgb(D)
    # live=12 like the ct one-pass kernel: the sil- and RGB-column
    # contraction phases run SEQUENTIALLY inside the chunk body, so the
    # peak set of live (chunk, D*HT) buffers matches the single-column
    # kernels (~5-6 + Mosaic's conservative 2x margin). live=14 halved
    # the chunk to 256 at 64^3 and erased the kernel's MXU advantage
    # (measured 67.3ms vs the two-kernel op's 66.7ms at c3-RGB shapes).
    chunk = _chunk_budget(D, HT, chunk, live=12,
                          reserve=10 * D * HT * D * 4,
                          budget=56 * 2 ** 20)
    ops = tuple(c.reshape(P, 1, N) for c in (gz, gy, gx, cr, cg, cb))
    spec = pl.BlockSpec((1, 1, N), lambda p, h: (p, 0, 0),
                        memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((P, 1, N), jnp.float32)
    outs = pl.pallas_call(
        functools.partial(_rgb_mse_onepass2_kernel_soa, D=D, HT=HT,
                          radius=radius, chunk=chunk, bf16=bf16),
        grid=(P, D // HT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * 6 + [
            pl.BlockSpec((1, HT, D), _mask_index_map(S, V, K),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, HT, D), _imgt_index_map(S, V, K),
                         memory_space=pltpu.VMEM)],
        out_specs=tuple([pl.BlockSpec((1, 1, 8, D),
                                      lambda p, h: (p, h, 0, 0),
                                      memory_space=pltpu.VMEM)]
                        + [spec] * 9),
        out_shape=tuple([jax.ShapeDtypeStruct((P, D // HT, 8, D),
                                              jnp.float32)] + [shp] * 9),
        scratch_shapes=[pltpu.VMEM((D * HT, 4 * D), jnp.float32)]
                       + [pltpu.VMEM((D * HT, D), jnp.float32)
                          for _ in range(6)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=28 * P * N * D * D * D,
            bytes_accessed=P * (N * 60 + D * D * 16),
            transcendentals=2 * P * N * (D * D + D)),
        interpret=_interpret(),
    )(sigma.reshape(1, P), *ops, masks, images)
    sse = jnp.sum(outs[0], axis=(1, 3))[:, :2]            # (P, 2)
    return (sse,) + tuple(o.reshape(P, N) for o in outs[1:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13))
def render_drc_rgb_mse_onepass2(gz, gy, gx, cr, cg, cb, sigma, masks,
                                images, pair_shape: tuple,
                                vox_size: int, radius: int = 13,
                                chunk: int = 512,
                                bf16: bool = False) -> jnp.ndarray:
    """One-pass fused RGB render + squared-errors + two-column Jacobian.

    Same contract and return value as render_drc_rgb_mse_pallas_soa —
    (P, 2) sse, differentiable w.r.t. coords and colors, zero cotangents
    for sigma/masks/images — but value_and_grad runs ONE kernel, and
    unlike render_drc_rgb_mse_onepass there is NO ct-proportionality
    requirement: the backward combines the separately-emitted sil and
    RGB Jacobian columns under the true incoming cotangents, exact for
    any downstream loss (argmin candidate selection included). This is
    the pose-ensemble RGB training path; value-only callers should
    prefer the two-kernel op (this one always pays the gradient
    contractions)."""
    out = _run_rgb_mse_onepass2_soa(gz, gy, gx, cr, cg, cb, sigma, masks,
                                    images, *pair_shape[1:], vox_size,
                                    radius, chunk, bf16)
    return out[0]


def _rgb_mse_onepass2_vjp_fwd(gz, gy, gx, cr, cg, cb, sigma, masks,
                              images, pair_shape, vox_size, radius,
                              chunk, bf16):
    out = _run_rgb_mse_onepass2_soa(gz, gy, gx, cr, cg, cb, sigma, masks,
                                    images, *pair_shape[1:], vox_size,
                                    radius, chunk, bf16)
    return out[0], (out[1:], sigma, masks, images)


def _rgb_mse_onepass2_vjp_bwd(pair_shape, vox_size, radius, chunk, bf16,
                              res, gsse):
    (jz_s, jy_s, jx_s, jz_r, jy_r, jx_r, jcr, jcg, jcb), sigma, masks, \
        images = res
    g_s = gsse[:, 0, None]
    g_r = gsse[:, 1, None]
    return (g_s * jz_s + g_r * jz_r, g_s * jy_s + g_r * jy_r,
            g_s * jx_s + g_r * jx_r, g_r * jcr, g_r * jcg, g_r * jcb,
            jnp.zeros_like(sigma), jnp.zeros_like(masks),
            jnp.zeros_like(images))


render_drc_rgb_mse_onepass2.defvjp(_rgb_mse_onepass2_vjp_fwd,
                                   _rgb_mse_onepass2_vjp_bwd)
