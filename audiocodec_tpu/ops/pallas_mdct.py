"""Fused Pallas TPU kernels for the MDCT filter bank — single-matmul design.

The XLA path evaluates the polyphase fold sparsely (2 mul + 1 add/sample,
ops/folding.py) and feeds ONE [N, N] DCT matmul. A naive fused kernel can't
replicate that because the fold needs lane reversals and Mosaic has no lane
reverse — round 1's kernel dodged the flips by folding the diamond into the
matrices, paying 2x matmul FLOPs, and lost to XLA at HIGHEST precision.

This version restores 1x FLOPs by moving every flip OUT of the kernel:

* The signal enters in a *swizzled* layout ``xs = [flip(x[:h]), x[h:]]``.
  The flip fuses into the transpose/reshape prologue XLA already runs (one
  HBM pass either way). In that basis the analysis fold is pure per-lane
  work: with weight vectors wa (previous block) and wb (current block),

      folded[n] = [ sa(xs[n-1] * wa),  sa(xs[n] * wb) ]      sa(v) = v[:h] + v[h:]

  and the spectrum is ONE matmul ``y[n] = folded[n] @ M`` where M stacks
  the DCT-IV rows for the lower half and the *row-reversed* upper half
  (row permutations of an exact precompute — free).

* The synthesis runs the mirror image: ``z[n] = y[n] @ Ms`` with Ms's
  upper-half columns reversed (so z = [z_low, flip(z_high)]), then a
  per-lane scatter combining z[n] with z[n-1]:

      out_s[n] = [ sa(u * va), sa(u * vb) ],   u = [z[n][:h], z[n-1][h:]]

  whose lower half the XLA epilogue un-flips while merging blocks.

Each kernel reads the signal from HBM exactly once (plus a tiny aligned
halo window per tile) and writes the output exactly once. The one-block
halo (x[n-1] / z[n-1]) is NOT carried through scratch across a sequential
grid — that design serialized every tile behind a blocking DMA and lost to
XLA at one-pass precision. Instead each tile is fully independent: the
previous block is *read again* through a second, overlapping input
BlockSpec (an aligned 8/16-row window ending at the tile start), and the
synthesis recomputes the one halo frame's matmul (1/tb extra FLOPs).
Independence lets Mosaic's standard pipeline double-buffer every
input/output block, so DMA hides behind the MXU. FLOPs equal the bare DCT
matmul — the XLA path's — with its fold/unfold HBM passes eliminated.

The two kernels are each other's transpose: the VJP of fold->matmul is
matmul->scatter on the block-reversed cotangent with a column-swapped M^T
(and vice versa), so both are fully differentiable via jax.custom_vjp
(pallas_call has no autodiff; the op is linear).

Large blocks: the matrix residents (f32 at 'highest', bf16 hi/lo at
'high', single bf16 at 'default' — see _mxu) are DMA'd into VMEM scratch
once per launch and stay resident for the whole grid (v5e-class VMEM is
128 MB — Mosaic's default 16 MB scoped limit is just conservative, so the
call passes an explicit vmem_limit_bytes); routing them through scratch
instead of blocked inputs also avoids the pipeline's double buffering,
which would double their footprint. Measured hardware ceilings cap
eligibility at N=1024 ('highest') / N=2048 ('high'/'default') — enforced
with reasons in mdct.MDCT.create.

Layout: channel-folded rows [rows = B*C, blocks, N]. N must be a multiple
of 256 (half-lanes slice at h = N/2, a 128-lane boundary).

Reference parity: this computes exactly the reference's transform
(audiocodec/mdctransformer.py:62-153) including the blocks+1 framing; the
diamond-sparsity insight is its self-documented todo (mdctransformer.py:16-18).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audiocodec_tpu.ops import dct as _dct
from audiocodec_tpu.ops import folding as _folding

_FOLD_MM = "fold_mm"      # analysis: per-lane fold, then matmul
_MM_SCATTER = "mm_scatter"  # synthesis: matmul, then per-lane scatter


def forward_params(filters_n: int, window_type):
    """(wa [1,N], wb [1,N], M [N,N]) float64: analysis fold weights in the
    swizzled basis plus the row-permuted, 1/sqrt(4N)-scaled DCT matrix."""
    c = _folding.make_fold_coefficients(filters_n, window_type)
    mat = _dct.dct4_matrix(filters_n)
    h = filters_n // 2
    s = 1.0 / math.sqrt(4.0 * filters_n)
    wa = np.concatenate([c.wa_r, c.wb])[None, :]
    wb = np.concatenate([c.wc[::-1], -c.ffr[::-1]])[None, :]
    m = np.concatenate(
        [mat[:h, :], mat[filters_n - 1 - np.arange(h), :]], axis=0
    ) * s
    return wa, wb, m


def inverse_params(filters_n: int, window_type):
    """(va [1,N], vb [1,N], Ms [N,N]) float64: synthesis scatter weights
    plus the column-permuted, sqrt(4N)-scaled DCT matrix."""
    c = _folding.make_fold_coefficients(filters_n, window_type)
    mat = _dct.dct4_matrix(filters_n)
    h = filters_n // 2
    s = math.sqrt(4.0 * filters_n)
    va = np.concatenate([c.p, c.r[::-1]])[None, :]
    vb = np.concatenate([c.q, c.s_r])[None, :]
    m = np.concatenate(
        [mat[:, :h], mat[:, filters_n - 1 - np.arange(h)]], axis=1
    ) * s
    return va, vb, m


def _radix_pieces(filters_n: int):
    """Shared precompute for the radix-2 DCT-IV split (float64).

    The orthonormal DCT-IV of length N decomposes over the pairing
    (f_n, f_{N-1-n}) — exactly the lane layout the swizzled fold already
    produces — into a per-lane rotation by phi_n = pi/(2N)(n+1/2),

        r_n  = a_n cos(phi_n) + b_n sin(phi_n)
        t~_n = (-1)^n (b_n cos(phi_n) - a_n sin(phi_n)),

    two SHARED [M, M] DCT-II-kernel matmuls (M = N/2, the sqrt(2/N)
    orthonormal scale folded in),

        U_j  = sum_n r_n  cos(pi j (n+1/2) / M)          (j = 0..M-1)
        V2_j = sum_n t~_n cos(pi (M-1-j)(n+1/2) / M),

    and a one-lane-shift butterfly: X_even = U + shift_right(V2),
    X_odd = shift_left(U) - V2 (exact because the dropped boundary terms
    Cr_M and St_0 vanish analytically: cos(pi(n+1/2)) = sin(0) = 0).
    Matmul cost per frame: 2 M^2 = N^2/2 MACs — HALF the single-matmul
    kernel — with residents a QUARTER of its [N, N] matrix bytes."""
    m = filters_n // 2
    n_ = np.arange(m, dtype=np.float64)
    phi = np.pi / (2.0 * filters_n) * (n_ + 0.5)
    sgn = (-1.0) ** n_
    j_ = np.arange(m, dtype=np.float64)
    base = np.cos(np.pi / m * np.outer(n_ + 0.5, j_))
    flip = np.cos(np.pi / m * np.outer(n_ + 0.5, m - 1 - j_))
    return phi, sgn, base, flip


def radix_forward_params(filters_n: int, window_type):
    """(wa, wb, rot1, rot2 [1,N], P, Q [M,M]) float64 — analysis fold
    weights (identical to :func:`forward_params`), the rotation-layer
    vectors, and the two half-size matmul residents. See _radix_pieces."""
    c = _folding.make_fold_coefficients(filters_n, window_type)
    wa = np.concatenate([c.wa_r, c.wb])[None, :]
    wb = np.concatenate([c.wc[::-1], -c.ffr[::-1]])[None, :]
    phi, sgn, base, flip = _radix_pieces(filters_n)
    rot1 = np.concatenate([np.cos(phi), np.cos(phi) * sgn])[None, :]
    rot2 = np.concatenate([np.sin(phi), -np.sin(phi) * sgn])[None, :]
    s = math.sqrt(2.0 / filters_n) / math.sqrt(4.0 * filters_n)
    return wa, wb, rot1, rot2, base * s, flip * s


def radix_inverse_params(filters_n: int, window_type):
    """(va, vb, rotA, rotB [1,N], Pi, Qi [M,M]) float64 — synthesis
    scatter weights (identical to :func:`inverse_params`) plus the
    TRANSPOSED radix factors: the synthesis kernel runs the butterfly
    first (on the de-interleaved spectrum), then the transposed matmuls,
    then the transposed rotation, landing in exactly the column-permuted
    layout the scatter epilogue expects."""
    c = _folding.make_fold_coefficients(filters_n, window_type)
    va = np.concatenate([c.p, c.r[::-1]])[None, :]
    vb = np.concatenate([c.q, c.s_r])[None, :]
    phi, sgn, base, flip = _radix_pieces(filters_n)
    rot_a = np.concatenate([np.cos(phi), np.sin(phi)])[None, :]
    rot_b = np.concatenate([-np.sin(phi) * sgn, np.cos(phi) * sgn])[None, :]
    s = math.sqrt(2.0 / filters_n) * math.sqrt(4.0 * filters_n)
    return va, vb, rot_a, rot_b, base.T * s, flip.T * s


def _shift_add(v, h):
    return v[:, :h] + v[:, h:]


def _load_matrices(m_hbms, m_scratches, sems):
    """DMA the [N, N] matrix (or its bf16 hi/lo split) into VMEM scratch
    once, on the first grid step; scratch persists across the (sequential
    on one core) grid, so every later step reads it for free. Routing it
    through scratch instead of a blocked input also avoids the pipeline's
    double buffering, which would not fit at N=4096 (2 x 64 MB f32)."""
    r, t = pl.program_id(0), pl.program_id(1)

    @pl.when(jnp.logical_and(r == 0, t == 0))
    def _():
        for m_hbm, m_s, sem in zip(m_hbms, m_scratches, sems):
            cp = pltpu.make_async_copy(m_hbm, m_s, sem)
            cp.start()
            cp.wait()


# THE int8 quantization recipe, shared with the XLA lowering so the two
# tiers cannot drift numerically (ops/dct.py). Mosaic-traceable.
_int8_rowquant = _dct.int8_rowquant


def _mxu(u, m_scratches, prec_mode, mat_scale=1.0):
    """The kernel's matmul, per precision tier.

    'highest' uses Mosaic's native HIGHEST dot on the f32-resident matrix
    — but Mosaic's internal hi/lo decomposition of a VMEM-resident [N, N]
    f32 operand costs ~7x the matrix bytes of scoped VMEM (measured
    114.6 MiB demanded at N=2048 vs the 95.5 MiB cap), so that tier is
    hardware-eligible only at N <= 1024. 'high' sidesteps the
    decomposition entirely: the matrix arrives PRE-SPLIT as two bf16
    residents (hi + lo, same total bytes as f32) and the product runs as
    three explicit one-pass bf16 matmuls with f32 accumulation
    (xh@mh + xh@ml + xl@mh — the classic 3-pass split, ~1e-6 relative),
    which is also ~2x faster than the 6-pass native HIGHEST. 'default'
    is one bf16 pass against a single bf16 resident.

    'int8' / 'int8g' run the MXU's int8 path (~2x the bf16 TOPS; Mosaic's
    int8 dot measured 259 TF/s vs 132 for its bf16 dot on this shape,
    benchmarks/pallas_int8_probe.py): the matrix arrives PRE-QUANTIZED
    (host-side, exact f64 scale baked into the static ``mat_scale`` =
    s_m/127^2), the input is quantized dynamically on the VPU, products
    accumulate exactly in int32, and one fused f32 rescale restores
    magnitudes. 'int8' uses one scale per row — right for the analysis
    side, whose folded time-domain rows have modest crest. 'int8g' uses
    one scale per (row, 128-lane group) at the cost of 8 K=128 dots with
    an f32 rescale-accumulate — required on the synthesis side, where
    spectra run 30+ dB of crest and a flat per-row error lands above the
    masking threshold in quiet bands (measured composed NMR 0.30 flat
    vs 0.029 grouped — docs/DESIGN.md §3c)."""
    if prec_mode == "int8":
        q, s = _int8_rowquant(u)
        y32 = jnp.dot(
            q, m_scratches[0][:, :], preferred_element_type=jnp.int32
        )
        return y32.astype(jnp.float32) * (s * jnp.float32(mat_scale))
    if prec_mode == "int8g":
        g = 128
        uf = u.astype(jnp.float32)
        acc = None
        for j in range(uf.shape[1] // g):
            q, s = _int8_rowquant(uf[:, j * g:(j + 1) * g])
            y32 = jnp.dot(
                q, m_scratches[0][j * g:(j + 1) * g, :],
                preferred_element_type=jnp.int32,
            )
            term = y32.astype(jnp.float32) * s
            acc = term if acc is None else acc + term
        return acc * jnp.float32(mat_scale)
    if prec_mode == "highest":
        return jnp.dot(
            u, m_scratches[0][:, :],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    if prec_mode == "default":
        return jnp.dot(
            u.astype(jnp.bfloat16), m_scratches[0][:, :],
            preferred_element_type=jnp.float32,
        )
    mh, ml = m_scratches[0][:, :], m_scratches[1][:, :]
    uh = u.astype(jnp.bfloat16)
    y = jnp.dot(uh, mh, preferred_element_type=jnp.float32) + jnp.dot(
        uh, ml, preferred_element_type=jnp.float32
    )
    if u.dtype != jnp.bfloat16:  # bf16 inputs have no low part
        ul = (u - uh.astype(u.dtype)).astype(jnp.bfloat16)
        y = y + jnp.dot(ul, mh, preferred_element_type=jnp.float32)
    return y


def _fwd_kernel(
    x_ref, halo_ref, wa_ref, wb_ref, *rest,
    n_mats, h, align, prec_mode, out_dtype, mat_scale=1.0
):
    """Analysis tile: per-lane fold (VPU), then the matmul tier (MXU).

    Every tile is independent: the one-block halo x[t*tb - 1] arrives
    through ``halo_ref`` — an aligned 8/16-row window of the SAME input
    array ending at the tile start (overlapping BlockSpec) — instead of
    scratch carried across a serialized grid. Mosaic's standard pipeline
    therefore double-buffers all tile DMAs behind the matmul."""
    m_hbms = rest[:n_mats]
    out_ref = rest[n_mats]
    m_scratches = rest[n_mats + 1 : 2 * n_mats + 1]
    sems = rest[2 * n_mats + 1 :]
    _load_matrices(m_hbms, m_scratches, sems)
    t = pl.program_id(1)
    cur = x_ref[0]
    prev_last = halo_ref[0, align - 1 : align, :]
    prev_last = jnp.where(t == 0, jnp.zeros_like(prev_last), prev_last)
    prev = jnp.concatenate([prev_last, cur[:-1]], axis=0)
    ta = prev * wa_ref[0:1, :]
    tc = cur * wb_ref[0:1, :]
    folded = jnp.concatenate([_shift_add(ta, h), _shift_add(tc, h)], axis=1)
    out_ref[0] = _mxu(
        folded, m_scratches, prec_mode, mat_scale
    ).astype(out_dtype)


def _inv_kernel(
    y_ref, halo_ref, va_ref, vb_ref, *rest,
    n_mats, h, align, prec_mode, out_dtype, mat_scale=1.0
):
    """Synthesis tile: the matmul tier (MXU), then the per-lane scatter
    (VPU). The halo frame z[t*tb - 1] is RECOMPUTED from its spectrum row
    (one extra [1, N] matmul, 1/tb overhead) rather than carried in
    scratch — same independence/pipelining rationale as _fwd_kernel."""
    m_hbms = rest[:n_mats]
    out_ref = rest[n_mats]
    m_scratches = rest[n_mats + 1 : 2 * n_mats + 1]
    sems = rest[2 * n_mats + 1 :]
    _load_matrices(m_hbms, m_scratches, sems)
    t = pl.program_id(1)
    z = _mxu(y_ref[0], m_scratches, prec_mode, mat_scale).astype(
        jnp.float32 if prec_mode == "int8g" else y_ref.dtype
    )
    zh = _mxu(
        halo_ref[0, align - 1 : align, :], m_scratches, prec_mode, mat_scale
    ).astype(z.dtype)
    zh = jnp.where(t == 0, jnp.zeros_like(zh), zh)
    zp = jnp.concatenate([zh, z[:-1]], axis=0)
    u = jnp.concatenate([z[:, :h], zp[:, h:]], axis=1)
    a = u * va_ref[0:1, :]
    b = u * vb_ref[0:1, :]
    out_ref[0] = jnp.concatenate(
        [_shift_add(a, h), _shift_add(b, h)], axis=1
    ).astype(out_dtype)


def _roll_lanes(v, shift):
    """pltpu.roll, routed through f32 for sub-32-bit dtypes: Mosaic's
    tpu.dynamic_rotate is only implemented for 32-bit data (hardware
    compile error observed on vector<...xbf16>), and the f32 round trip
    is value-exact for bf16 (a pure widening)."""
    if v.dtype.itemsize < 4:
        return pltpu.roll(
            v.astype(jnp.float32), shift=shift, axis=1
        ).astype(v.dtype)
    return pltpu.roll(v, shift=shift, axis=1)


def _shift_right_z(v):
    """Lane shift by +1 with zero fill: out_j = v_{j-1}, out_0 = 0."""
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    return jnp.where(lane == 0, 0.0, _roll_lanes(v, 1))


def _shift_left_z(v):
    """Lane shift by -1 with zero fill: out_j = v_{j+1}, out_{M-1} = 0.
    (pltpu.roll only accepts non-negative shifts: roll by M-1.)"""
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    return jnp.where(
        lane == v.shape[1] - 1, 0.0,
        _roll_lanes(v, v.shape[1] - 1),
    )


def _radix_dct(rt, h, p_scr, q_scr, prec_mode):
    """The shared radix core: [r | t~] lanes -> [X_even | X_odd] lanes
    via the two [M, M] matmuls and the one-lane-shift butterfly
    (derivation in _radix_pieces)."""
    u = _mxu(rt[:, :h], p_scr, prec_mode)
    v2 = _mxu(rt[:, h:], q_scr, prec_mode)
    return jnp.concatenate(
        [u + _shift_right_z(v2), _shift_left_z(u) - v2], axis=1
    )


def _fwd_kernel_radix(
    x_ref, halo_ref, wa_ref, wb_ref, rot1_ref, rot2_ref, *rest,
    n_mats, h, align, prec_mode, out_dtype, mat_scale=1.0
):
    """Radix analysis tile: fold (VPU), per-lane rotation (VPU), two
    half-size matmuls + butterfly (MXU + lane shifts). Output spectra are
    in EVEN/ODD-SPLIT lane order ([X_0, X_2, .. | X_1, X_3, ..]); the XLA
    wrapper interleaves (a reshape-transpose that fuses into consumers).
    Halo handling is identical to _fwd_kernel."""
    m_hbms = rest[:n_mats]
    out_ref = rest[n_mats]
    m_scratches = rest[n_mats + 1 : 2 * n_mats + 1]
    sems = rest[2 * n_mats + 1 :]
    _load_matrices(m_hbms, m_scratches, sems)
    k = n_mats // 2
    t = pl.program_id(1)
    cur = x_ref[0]
    prev_last = halo_ref[0, align - 1 : align, :]
    prev_last = jnp.where(t == 0, jnp.zeros_like(prev_last), prev_last)
    prev = jnp.concatenate([prev_last, cur[:-1]], axis=0)
    ta = prev * wa_ref[0:1, :]
    tc = cur * wb_ref[0:1, :]
    folded = jnp.concatenate([_shift_add(ta, h), _shift_add(tc, h)], axis=1)
    swap = jnp.concatenate([folded[:, h:], folded[:, :h]], axis=1)
    rt = folded * rot1_ref[0:1, :] + swap * rot2_ref[0:1, :]
    out_ref[0] = _radix_dct(
        rt, h, m_scratches[:k], m_scratches[k:], prec_mode
    ).astype(out_dtype)


def _inv_kernel_radix(
    y_ref, halo_ref, va_ref, vb_ref, rota_ref, rotb_ref, *rest,
    n_mats, h, align, prec_mode, out_dtype, mat_scale=1.0
):
    """Radix synthesis tile: transposed butterfly (lane shifts), two
    transposed half-size matmuls (MXU), transposed rotation (VPU), then
    the scatter epilogue of _inv_kernel. Input spectra must be in
    even/odd-split lane order (the XLA wrapper de-interleaves)."""
    m_hbms = rest[:n_mats]
    out_ref = rest[n_mats]
    m_scratches = rest[n_mats + 1 : 2 * n_mats + 1]
    sems = rest[2 * n_mats + 1 :]
    _load_matrices(m_hbms, m_scratches, sems)
    k = n_mats // 2
    t = pl.program_id(1)

    def radix_z(rows):
        ye, yo = rows[:, :h], rows[:, h:]
        us = ye + _shift_right_z(yo)
        vs = _shift_left_z(ye) - yo
        rs = _mxu(us, m_scratches[:k], prec_mode)
        ts = _mxu(vs, m_scratches[k:], prec_mode)
        dup_r = jnp.concatenate([rs, rs], axis=1)
        dup_t = jnp.concatenate([ts, ts], axis=1)
        return (
            dup_r * rota_ref[0:1, :] + dup_t * rotb_ref[0:1, :]
        ).astype(rows.dtype)

    z = radix_z(y_ref[0])
    zh = radix_z(halo_ref[0, align - 1 : align, :])
    zh = jnp.where(t == 0, jnp.zeros_like(zh), zh)
    zp = jnp.concatenate([zh, z[:-1]], axis=0)
    u = jnp.concatenate([z[:, :h], zp[:, h:]], axis=1)
    a = u * va_ref[0:1, :]
    b = u * vb_ref[0:1, :]
    out_ref[0] = jnp.concatenate(
        [_shift_add(a, h), _shift_add(b, h)], axis=1
    ).astype(out_dtype)


# Scoped-VMEM planning, calibrated against real compiler rejections:
# v5e VMEM is 128 MiB. Beyond the matrix residents, measured scoped-stack
# demand runs ~25x the [tb, N] tile bytes (double-buffered in/out tiles +
# fold/matmul temporaries — a 4096-'high' compile demanded 113 MB at
# tb=112 with 67 MB of residents), so tiles shrink against a 28x planning
# multiplier. The vmem_limit REQUEST is sized per call from the same
# model, NOT a flat maximum: over-requesting starves the surrounding XLA
# program of VMEM — a flat 100 MiB request measurably halved the
# composed bf16 pipeline's throughput around an otherwise-identical
# kernel.
_VMEM_PLAN = 88 << 20
_TILE_COST = 28


def _vmem_request(eff_mat, tb, n, itemsize):
    # The non-resident scoped demand has a FLAT floor (~12-14 MB of
    # fixed pipeline/temporary structures, observed at N=2048 'high'
    # with an 8-row tile demanding 28.05 MiB against 17.6 MiB of
    # residents) in addition to the tile-proportional ~28x term; take
    # whichever is larger so tiny-tile launches don't under-request.
    tiles = max(_TILE_COST * tb * n * itemsize, 14 << 20)
    return min(int(eff_mat + tiles + (8 << 20)), 100 << 20)


def _tile_size(itemsize, num_out, n, mat_bytes, precision):
    """Block-tile rows: 512 amortizes per-step grid overhead and keeps
    the [tb, N] @ [N, N] matmul on large MXU passes; small inputs shrink
    to the aligned cover of their frames, and large N shrinks tb so the
    residents + pipeline buffers + temporaries stay inside scoped VMEM.
    At 'highest', Mosaic internally decomposes the f32 resident to ~7x
    its bytes (the reason that tier caps at N=1024 — see _mxu)."""
    align = 16 if itemsize == 2 else 8
    eff_mat = 7 * mat_bytes if precision == "highest" else mat_bytes
    tb = min(512, -(-num_out // align) * align)
    while (
        tb > align
        and eff_mat + _TILE_COST * tb * n * itemsize + (8 << 20) > _VMEM_PLAN
    ):
        # halve in ALIGNED units — Mosaic requires sublane-dim blocks in
        # multiples of 8 (f32) / 16 (bf16)
        tb = max(align, (tb // 2) // align * align)
    return tb


def _split_mats(mat, precision):
    """The per-tier matrix residents (see _mxu): f32 as-is at 'highest',
    bf16 hi/lo split at 'high', single bf16 at 'default'. The split runs
    in XLA before the kernel — O(N^2) elementwise, fused and negligible
    next to the transform."""
    if precision == "highest":
        return (mat,)
    mh = mat.astype(jnp.bfloat16)
    if precision == "default":
        return (mh,)
    ml = (mat.astype(jnp.float32) - mh.astype(jnp.float32)).astype(
        jnp.bfloat16
    )
    return (mh, ml)


def _call(x, num_out, wa, wb, mat, precision, mode, rots=(), mat_scale=1.0):
    """Launch one kernel. ``mat`` is the [N, N] resident (single-matmul
    design) or a tuple of two [M, M] residents (radix design, selected by
    a non-empty ``rots`` — the two [1, N] rotation vectors). At
    ``precision="int8"`` the resident arrives PRE-QUANTIZED int8 (exact
    f64 host scale baked into the static ``mat_scale`` = s_m/127^2) and
    the tier maps per direction: flat per-row dynamic quantization on the
    analysis side, per-128-lane grouped on the synthesis side (see
    _mxu)."""
    rows, blocks_n, n = x.shape  # blocks_n = padded count >= num_out
    h = n // 2
    itemsize = x.dtype.itemsize
    align = 16 if itemsize == 2 else 8
    mat_list = mat if isinstance(mat, tuple) else (mat,)
    if precision == "int8":
        if rots:
            raise ValueError(
                "int8 matmuls are not supported by the radix kernel "
                "design (it never wins at one-pass precisions)"
            )
        if mat_list[0].dtype != jnp.int8:
            raise ValueError(
                "precision='int8' expects a host-quantized int8 resident"
            )
        precision = "int8" if mode == _FOLD_MM else "int8g"
        mats = mat_list
    elif mat_list[0].dtype == jnp.bfloat16:
        # bf16 operands admit exactly ONE matmul pass — higher precision
        # tiers are identical math through Mosaic's (more scoped-VMEM-
        # hungry, and for 'highest' decomposition-heavy) lowerings, so
        # canonicalize to the single-pass tier.
        precision = "default"
        mats = tuple(
            m for one in mat_list for m in _split_mats(one, precision)
        )
    else:
        mats = tuple(
            m for one in mat_list for m in _split_mats(one, precision)
        )
    mat_bytes = sum(int(m.size) * m.dtype.itemsize for m in mats)
    eff_mat = 7 * mat_bytes if precision == "highest" else mat_bytes
    tb = _tile_size(itemsize, num_out, n, mat_bytes, precision)
    n_tiles = pl.cdiv(num_out, tb)
    tpb = tb // align  # tile size in halo-window units
    if rots:
        body = _fwd_kernel_radix if mode == _FOLD_MM else _inv_kernel_radix
        mac_per_frame = n * h
    else:
        body = _fwd_kernel if mode == _FOLD_MM else _inv_kernel
        mac_per_frame = n * n
    kernel = functools.partial(
        body, n_mats=len(mats), h=h, align=align, prec_mode=precision,
        out_dtype=x.dtype, mat_scale=float(mat_scale),
    )
    return pl.pallas_call(
        kernel,
        grid=(rows, n_tiles),
        in_specs=[
            # the tile; auto-pipelined (double-buffered) by Mosaic
            pl.BlockSpec(
                (1, tb, n), lambda r, t: (r, t, 0), memory_space=pltpu.VMEM
            ),
            # the SAME array again: an aligned window whose last row is
            # block t*tb - 1 (the halo); clamped to 0 and zero-substituted
            # in-kernel for the first tile
            pl.BlockSpec(
                (1, align, n),
                lambda r, t: (r, jnp.maximum(t * tpb - 1, 0), 0),
                memory_space=pltpu.VMEM,
            ),
        ] + [
            pl.BlockSpec((1, n), lambda r, t: (0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(2 + len(rots))  # wa, wb (+ rot1, rot2)
        ] + [
            pl.BlockSpec(memory_space=pl.ANY)  # matrices; DMA'd once
            for _ in mats
        ],
        out_specs=pl.BlockSpec(
            (1, tb, n), lambda r, t: (r, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, num_out, n), x.dtype),
        scratch_shapes=[
            pltpu.VMEM(m.shape, m.dtype) for m in mats  # residents
        ] + [
            pltpu.SemaphoreType.DMA for _ in mats       # their DMAs
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_request(eff_mat, tb, n, itemsize),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * num_out * mac_per_frame
            * (3 if precision == "high" else 1),
            bytes_accessed=itemsize * rows * (blocks_n + num_out) * n,
            transcendentals=0,
        ),
    )(x, x, wa, wb, *rots, *mats)


def _pad_blocks(rows_arr):
    """Zero-pad the blocks axis to cover T+1 output frames at the DMA
    row-alignment granularity (8 rows f32, 16 rows bf16): the final frame's
    missing current block then reads a REAL zero block, so the kernel needs
    no row masking, and every DMA offset/size stays aligned."""
    mult = 16 if rows_arr.dtype.itemsize == 2 else 8
    blocks_n = rows_arr.shape[1]
    padded = -(-(blocks_n + 1) // mult) * mult
    return jnp.pad(rows_arr, ((0, 0), (0, padded - blocks_n), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fold_matmul(x_rows, wa, wb, mat, precision="highest", mat_scale=1.0):
    """Analysis kernel: [rows, T, N] swizzled signal -> [rows, T+1, N]
    spectrum.  y[n] = [sa(x[n-1]*wa), sa(x[n]*wb)] @ mat. At
    precision="int8", ``mat`` is the host-quantized int8 resident and
    ``mat_scale`` its exact static rescale (s_m/127^2)."""
    blocks_n = x_rows.shape[1]
    return _call(
        _pad_blocks(x_rows), blocks_n + 1, wa, wb, mat, precision,
        _FOLD_MM, mat_scale=mat_scale,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def matmul_scatter(y_rows, va, vb, mat, precision="highest", mat_scale=1.0):
    """Synthesis kernel: [rows, T, N] spectrum -> [rows, T+1, N] swizzled
    blocks.  out[n] = [sa(u*va), sa(u*vb)], u = [(y[n]@mat)[:h], (y[n-1]@mat)[h:]].
    At precision="int8" (per-128-lane grouped quantization inside — see
    _mxu), ``mat`` is the host-quantized int8 resident and ``mat_scale``
    its exact static rescale."""
    blocks_n = y_rows.shape[1]
    return _call(
        _pad_blocks(y_rows), blocks_n + 1, va, vb, mat, precision,
        _MM_SCATTER, mat_scale=mat_scale,
    )


def _fold_matmul_fwd(x_rows, wa, wb, mat, precision, mat_scale):
    return (
        fold_matmul(x_rows, wa, wb, mat, precision, mat_scale),
        (wa, wb, mat),
    )


def _fold_matmul_bwd(precision, mat_scale, res, g):
    """Transpose of fold->matmul is matmul->scatter on the block-reversed
    cotangent: dx[m] = g[m] @ (Wb M_hi)^T + g[m+1] @ (Wa M_lo)^T, realized
    with M^T's column halves swapped and the weight quarters shuffled.

    At int8 the forward is only piecewise-linear (dynamic quantization);
    the VJP treats it as the underlying linear map (straight-through) —
    the resident is dequantized and the cotangent runs at one-pass
    precision, matching the tier's error order."""
    wa, wb, mat = res
    if precision == "int8":
        mat = mat.astype(jnp.float32) * jnp.float32(mat_scale * 127.0)
        precision = "default"
    n = mat.shape[0]
    h = n // 2
    m2 = jnp.concatenate([mat[h:, :].T, mat[:h, :].T], axis=1)
    va = jnp.concatenate([wb[:, :h], wa[:, :h]], axis=1)
    vb = jnp.concatenate([wb[:, h:], wa[:, h:]], axis=1)
    full = matmul_scatter(jnp.flip(g, axis=1), va, vb, m2, precision)
    dx = jnp.flip(full[:, 1:-1], axis=1)
    # Weights and matrix are deterministic precomputes, never trained.
    return dx, jnp.zeros_like(wa), jnp.zeros_like(wb), jnp.zeros_like(mat)


fold_matmul.defvjp(_fold_matmul_fwd, _fold_matmul_bwd)


def _matmul_scatter_fwd(y_rows, va, vb, mat, precision, mat_scale):
    return (
        matmul_scatter(y_rows, va, vb, mat, precision, mat_scale),
        (va, vb, mat),
    )


def _matmul_scatter_bwd(precision, mat_scale, res, g):
    """Transpose of matmul->scatter is fold->matmul on the block-reversed
    cotangent (the mirror of _fold_matmul_bwd; straight-through at int8,
    see _fold_matmul_bwd)."""
    va, vb, mat = res
    if precision == "int8":
        mat = mat.astype(jnp.float32) * jnp.float32(mat_scale * 127.0)
        precision = "default"
    n = mat.shape[0]
    h = n // 2
    m2 = jnp.concatenate([mat[:, h:].T, mat[:, :h].T], axis=0)
    wa = jnp.concatenate([va[:, h:], vb[:, h:]], axis=1)
    wb = jnp.concatenate([va[:, :h], vb[:, :h]], axis=1)
    full = fold_matmul(jnp.flip(g, axis=1), wa, wb, m2, precision)
    dy = jnp.flip(full[:, 1:-1], axis=1)
    return dy, jnp.zeros_like(va), jnp.zeros_like(vb), jnp.zeros_like(mat)


matmul_scatter.defvjp(_matmul_scatter_fwd, _matmul_scatter_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def radix_fold_matmul(x_rows, wa, wb, rot1, rot2, p, q, precision="highest"):
    """Radix analysis kernel: [rows, T, N] swizzled signal ->
    [rows, T+1, N] spectrum in EVEN/ODD-SPLIT lane order (use
    :func:`interleave` to restore standard order)."""
    blocks_n = x_rows.shape[1]
    return _call(
        _pad_blocks(x_rows), blocks_n + 1, wa, wb, (p, q), precision,
        _FOLD_MM, rots=(rot1, rot2),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def radix_matmul_scatter(
    y_rows, va, vb, rot_a, rot_b, p, q, precision="highest"
):
    """Radix synthesis kernel: [rows, T, N] spectrum in even/odd-split
    lane order (see :func:`deinterleave`) -> [rows, T+1, N] swizzled
    blocks."""
    blocks_n = y_rows.shape[1]
    return _call(
        _pad_blocks(y_rows), blocks_n + 1, va, vb, (p, q), precision,
        _MM_SCATTER, rots=(rot_a, rot_b),
    )


def _radix_fold_matmul_fwd(x_rows, wa, wb, rot1, rot2, p, q, precision):
    return (
        radix_fold_matmul(x_rows, wa, wb, rot1, rot2, p, q, precision),
        (wa, wb, rot1, rot2, p, q),
    )


def _radix_fold_matmul_bwd(precision, res, g):
    """Transpose of the radix analysis: the same algebra as
    _fold_matmul_bwd, with the matrix-stage transpose expressed in radix
    factors — transposed butterfly, transposed [M, M] matmuls, and the
    rotation with its output halves swapped (the swap _fold_matmul_bwd
    bakes into m2's column order)."""
    wa, wb, rot1, rot2, p, q = res
    n = wa.shape[1]
    h = n // 2
    va = jnp.concatenate([wb[:, :h], wa[:, :h]], axis=1)
    vb = jnp.concatenate([wb[:, h:], wa[:, h:]], axis=1)
    rot_a = jnp.concatenate([rot2[:, :h], rot1[:, :h]], axis=1)
    rot_b = jnp.concatenate([rot1[:, h:], rot2[:, h:]], axis=1)
    full = radix_matmul_scatter(
        jnp.flip(g, axis=1), va, vb, rot_a, rot_b, p.T, q.T, precision
    )
    dx = jnp.flip(full[:, 1:-1], axis=1)
    zeros = [jnp.zeros_like(v) for v in (wa, wb, rot1, rot2, p, q)]
    return (dx, *zeros)


radix_fold_matmul.defvjp(_radix_fold_matmul_fwd, _radix_fold_matmul_bwd)


def _radix_matmul_scatter_fwd(y_rows, va, vb, rot_a, rot_b, p, q, precision):
    return (
        radix_matmul_scatter(y_rows, va, vb, rot_a, rot_b, p, q, precision),
        (va, vb, rot_a, rot_b, p, q),
    )


def _radix_matmul_scatter_bwd(precision, res, g):
    """Transpose of the radix synthesis (mirror of _radix_fold_matmul_bwd):
    the scatter transposes to the fold with quarter-shuffled weights, and
    the radix z-stage transposes to rotation -> matmuls -> butterfly with
    the rotation's INPUT halves swapped (realized by exchanging the two
    rotation vectors' roles)."""
    va, vb, rot_a, rot_b, p, q = res
    n = va.shape[1]
    h = n // 2
    wa = jnp.concatenate([va[:, h:], vb[:, h:]], axis=1)
    wb = jnp.concatenate([va[:, :h], vb[:, :h]], axis=1)
    rot1 = jnp.concatenate([rot_a[:, h:], rot_b[:, :h]], axis=1)
    rot2 = jnp.concatenate([rot_a[:, :h], rot_b[:, h:]], axis=1)
    full = radix_fold_matmul(
        jnp.flip(g, axis=1), wa, wb, rot1, rot2, p.T, q.T, precision
    )
    dy = jnp.flip(full[:, 1:-1], axis=1)
    zeros = [jnp.zeros_like(v) for v in (va, vb, rot_a, rot_b, p, q)]
    return (dy, *zeros)


radix_matmul_scatter.defvjp(
    _radix_matmul_scatter_fwd, _radix_matmul_scatter_bwd
)


def interleave(rows_arr):
    """Even/odd-split lane order -> standard spectral order:
    [X_0, X_2, ... | X_1, X_3, ...] -> [X_0, X_1, X_2, ...]. A
    reshape-transpose-reshape XLA fuses into neighboring ops (and folds
    into a following matmul's dimension numbers)."""
    *lead, n = rows_arr.shape
    return (
        rows_arr.reshape(*lead, 2, n // 2)
        .swapaxes(-1, -2)
        .reshape(*lead, n)
    )


def deinterleave(rows_arr):
    """Standard spectral order -> even/odd-split lane order (inverse of
    :func:`interleave`)."""
    *lead, n = rows_arr.shape
    return (
        rows_arr.reshape(*lead, n // 2, 2)
        .swapaxes(-1, -2)
        .reshape(*lead, n)
    )


def swizzle(rows_arr):
    """[..., N] -> the kernel's lane layout: first half lanes reversed.
    Self-inverse; fuses into the neighboring XLA transpose/reshape."""
    h = rows_arr.shape[-1] // 2
    return jnp.concatenate(
        [jnp.flip(rows_arr[..., :h], axis=-1), rows_arr[..., h:]], axis=-1
    )
