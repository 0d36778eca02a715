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

Each kernel reads the signal from HBM exactly once and writes the output
exactly once; the one-block halo (x[n-1] / z[n-1]) rides VMEM scratch
across the sequential grid. FLOPs equal the bare DCT matmul — the XLA
path's — with its fold/unfold HBM passes eliminated.

The two kernels are each other's transpose: the VJP of fold->matmul is
matmul->scatter on the block-reversed cotangent with a column-swapped M^T
(and vice versa), so both are fully differentiable via jax.custom_vjp
(pallas_call has no autodiff; the op is linear).

Large blocks: the [N, N] matrix is DMA'd into VMEM scratch once per launch
and stays resident for the whole grid (v5e-class VMEM is 128 MB — Mosaic's
default 16 MB scoped limit is just conservative, so the call passes an
explicit vmem_limit_bytes). Even N=4096 f32 (64 MB) stays resident; routing
the matrix through scratch instead of a blocked input also avoids the
pipeline's double buffering, which would double its footprint.

Layout: channel-folded rows [rows = B*C, blocks, N]. N must be a multiple
of 256 (half-lanes slice at h = N/2, a 128-lane boundary) and <= 4096.

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


def _shift_add(v, h):
    return v[:, :h] + v[:, h:]


def _kernel(
    x_hbm, wa_ref, wb_ref, m_hbm, out_ref, m_s, cur_s, halo_s, sem_m, sem,
    *, mode, tb, blocks_n, n_tiles, h, precision, out_dtype
):
    """Shared skeleton: the [N, N] matrix is DMA'd into VMEM scratch ONCE
    (first grid step) and stays resident — v5e-class chips have 128 MB of
    VMEM, so even N=4096 f32 (64 MB) fits; routing it through scratch
    instead of a blocked input also avoids the pipeline's double buffering.
    Per block-tile t: DMA [tb, N] of input, one [tb, N] @ [N, N] matmul,
    and the per-lane fold (analysis) / scatter (synthesis).

    The one-block halo exploits sequential grid execution: scratch persists
    across steps, so the previous tile's last block (analysis: signal;
    synthesis: z) is saved at the end of each tile — zero extra HBM traffic.
    Mosaic DMA slices on the second-to-last dim must be 8-row aligned in
    offset AND size; the wrapper pads the blocks axis so they always are.
    """
    r, t = pl.program_id(0), pl.program_id(1)
    # The wrapper zero-pads the blocks axis PAST num_out (the final output
    # frame's missing current block reads a real zero block), so no
    # in-kernel row masking is ever needed. All DMA sizes stay 8/16-row
    # aligned; the last tile just reads fewer rows.
    last_size = min(tb, blocks_n - (n_tiles - 1) * tb)  # static

    @pl.when(jnp.logical_and(r == 0, t == 0))
    def _():
        cp = pltpu.make_async_copy(m_hbm, m_s, sem_m)
        cp.start()
        cp.wait()

    if n_tiles > 1 and last_size == tb:
        cp = pltpu.make_async_copy(
            x_hbm.at[r, pl.ds(t * tb, tb), :], cur_s, sem
        )
        cp.start()
        cp.wait()
    else:
        if n_tiles > 1:

            @pl.when(t < n_tiles - 1)
            def _():
                cp = pltpu.make_async_copy(
                    x_hbm.at[r, pl.ds(t * tb, tb), :], cur_s, sem
                )
                cp.start()
                cp.wait()

        @pl.when(t == n_tiles - 1)
        def _():
            cp = pltpu.make_async_copy(
                x_hbm.at[r, pl.ds((n_tiles - 1) * tb, last_size), :],
                cur_s.at[pl.ds(0, last_size), :],
                sem,
            )
            cp.start()
            cp.wait()

    @pl.when(t == 0)
    def _():
        halo_s[0:1, :] = jnp.zeros_like(halo_s[0:1, :])

    if mode == _FOLD_MM:
        # Per-lane fold (VPU), then one matmul (MXU).
        cur = cur_s[:, :]
        prev = jnp.concatenate([halo_s[0:1, :], cur[0 : tb - 1, :]], axis=0)
        ta = prev * wa_ref[0:1, :]
        tc = cur * wb_ref[0:1, :]
        folded = jnp.concatenate(
            [_shift_add(ta, h), _shift_add(tc, h)], axis=1
        )
        halo_s[0:1, :] = cur[tb - 1 : tb, :]
        out_ref[0, :, :] = jnp.dot(
            folded,
            m_s[:, :],
            preferred_element_type=jnp.float32,
            precision=precision,
        ).astype(out_dtype)
    else:
        # One matmul (MXU), then the per-lane scatter (VPU).
        z = jnp.dot(
            cur_s[:, :],
            m_s[:, :],
            preferred_element_type=jnp.float32,
            precision=precision,
        ).astype(cur_s.dtype)
        zp = jnp.concatenate([halo_s[0:1, :], z[0 : tb - 1, :]], axis=0)
        u = jnp.concatenate([z[:, :h], zp[:, h:]], axis=1)
        a = u * wa_ref[0:1, :]
        b = u * wb_ref[0:1, :]
        out_ref[0, :, :] = jnp.concatenate(
            [_shift_add(a, h), _shift_add(b, h)], axis=1
        ).astype(out_dtype)
        halo_s[0:1, :] = z[tb - 1 : tb, :]


def _tile_size(itemsize, num_out):
    """Block-tile rows: 128 keeps the [tb, N] @ [N, N] matmul on full MXU
    tiles; small inputs shrink to the aligned cover of their frames."""
    align = 16 if itemsize == 2 else 8
    return min(128, -(-num_out // align) * align)


def _vmem_limit(n, tb, itemsize):
    """Explicit scoped-VMEM budget: resident matrix + input window + halo
    + double-buffered output block + weights, plus compiler slack. Mosaic's
    default limit is a conservative 16 MB; the hardware has 128 MB."""
    need = (n * n + 4 * tb * n + 16 * n) * itemsize + (16 << 20)
    return min(int(need), 127 << 20)


def _call(x, num_out, wa, wb, mat, precision, mode):
    rows, blocks_n, n = x.shape  # blocks_n = padded count >= num_out
    h = n // 2
    tb = _tile_size(x.dtype.itemsize, num_out)
    n_tiles = pl.cdiv(num_out, tb)
    # Mosaic supports only DEFAULT and HIGHEST dot precisions; 'high'
    # falls back to 'highest' inside kernels (accurate, slightly slower).
    if precision == "high":
        precision = "highest"
    kernel = functools.partial(
        _kernel, mode=mode, tb=tb, blocks_n=blocks_n, n_tiles=n_tiles,
        h=h, precision=_dct.PRECISIONS[precision], out_dtype=x.dtype,
    )
    return pl.pallas_call(
        kernel,
        grid=(rows, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # signal; row-indexed DMA
            pl.BlockSpec((1, n), lambda r, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda r, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # matrix; DMA'd once
        ],
        out_specs=pl.BlockSpec(
            (1, tb, n), lambda r, t: (r, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, num_out, n), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((n, n), x.dtype),   # resident matrix
            pltpu.VMEM((tb, n), x.dtype),  # current input window
            pltpu.VMEM((8, n), x.dtype),   # halo block (8-row tile-padded)
            pltpu.SemaphoreType.DMA,       # matrix DMA
            pltpu.SemaphoreType.DMA,       # input-window DMA
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(n, tb, x.dtype.itemsize),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * num_out * n * n,
            bytes_accessed=x.dtype.itemsize * rows * (blocks_n + num_out) * n,
            transcendentals=0,
        ),
    )(x, wa, wb, mat)


def _pad_blocks(rows_arr):
    """Zero-pad the blocks axis to cover T+1 output frames at the DMA
    row-alignment granularity (8 rows f32, 16 rows bf16): the final frame's
    missing current block then reads a REAL zero block, so the kernel needs
    no row masking, and every DMA offset/size stays aligned."""
    mult = 16 if rows_arr.dtype.itemsize == 2 else 8
    blocks_n = rows_arr.shape[1]
    padded = -(-(blocks_n + 1) // mult) * mult
    return jnp.pad(rows_arr, ((0, 0), (0, padded - blocks_n), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fold_matmul(x_rows, wa, wb, mat, precision="highest"):
    """Analysis kernel: [rows, T, N] swizzled signal -> [rows, T+1, N]
    spectrum.  y[n] = [sa(x[n-1]*wa), sa(x[n]*wb)] @ mat."""
    blocks_n = x_rows.shape[1]
    return _call(
        _pad_blocks(x_rows), blocks_n + 1, wa, wb, mat, precision, _FOLD_MM
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def matmul_scatter(y_rows, va, vb, mat, precision="highest"):
    """Synthesis kernel: [rows, T, N] spectrum -> [rows, T+1, N] swizzled
    blocks.  out[n] = [sa(u*va), sa(u*vb)], u = [(y[n]@mat)[:h], (y[n-1]@mat)[h:]]."""
    blocks_n = y_rows.shape[1]
    return _call(
        _pad_blocks(y_rows), blocks_n + 1, va, vb, mat, precision,
        _MM_SCATTER,
    )


def _fold_matmul_fwd(x_rows, wa, wb, mat, precision):
    return fold_matmul(x_rows, wa, wb, mat, precision), (wa, wb, mat)


def _fold_matmul_bwd(precision, res, g):
    """Transpose of fold->matmul is matmul->scatter on the block-reversed
    cotangent: dx[m] = g[m] @ (Wb M_hi)^T + g[m+1] @ (Wa M_lo)^T, realized
    with M^T's column halves swapped and the weight quarters shuffled."""
    wa, wb, mat = res
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


def _matmul_scatter_fwd(y_rows, va, vb, mat, precision):
    return matmul_scatter(y_rows, va, vb, mat, precision), (va, vb, mat)


def _matmul_scatter_bwd(precision, res, g):
    """Transpose of matmul->scatter is fold->matmul on the block-reversed
    cotangent (the mirror of _fold_matmul_bwd)."""
    va, vb, mat = res
    n = mat.shape[0]
    h = n // 2
    m2 = jnp.concatenate([mat[:, h:].T, mat[:, :h].T], axis=0)
    wa = jnp.concatenate([va[:, h:], vb[:, h:]], axis=1)
    wb = jnp.concatenate([va[:, :h], vb[:, :h]], axis=1)
    full = fold_matmul(jnp.flip(g, axis=1), wa, wb, m2, precision)
    dy = jnp.flip(full[:, 1:-1], axis=1)
    return dy, jnp.zeros_like(va), jnp.zeros_like(vb), jnp.zeros_like(mat)


matmul_scatter.defvjp(_matmul_scatter_fwd, _matmul_scatter_bwd)


def swizzle(rows_arr):
    """[..., N] -> the kernel's lane layout: first half lanes reversed.
    Self-inverse; fuses into the neighboring XLA transpose/reshape."""
    h = rows_arr.shape[-1] // 2
    return jnp.concatenate(
        [jnp.flip(rows_arr[..., :h], axis=-1), rows_arr[..., h:]], axis=-1
    )
