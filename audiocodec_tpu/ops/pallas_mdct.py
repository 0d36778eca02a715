"""Fused Pallas TPU kernels for the MDCT filter bank.

Forward: window-fold + DCT-IV matmul + normalization in ONE kernel — the
input signal is read from HBM exactly once and the spectrum written exactly
once; the folded intermediate lives only in VMEM. Inverse: DCT-IV matmul +
unfold, same single-pass property. This is the memory-bandwidth-limited
design goal the XLA path can only approximate (SURVEY.md §7 step 5).

The polyphase fold couples adjacent blocks, so each frame tile needs a
one-block halo. Instead of padding the array in HBM (a full extra copy),
the kernels keep the signal in ANY/HBM memory space and DMA the
[tile + 1 halo] window into VMEM scratch themselves. Edge tiles (first /
last) zero-fill the out-of-range rows; every DMA has a Python-static size
because which grid step is first/last is known at trace time.

Shapes use the channel-folded layout [rows = B*C, blocks, N]; N must be a
multiple of 256 (the fold splits blocks into halves of >= 128 lanes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fold_tile(prev, cur, wa_r, wb, wc, ffr):
    """Fold TB frames from their (previous, current) input blocks.

    prev, cur: [TB, N]. Returns [TB, N]:
      lower = flip(prev_lo) * wa_r + prev_hi * wb
      upper = cur_lo * wc - flip(cur_hi) * ffr
    """
    h = prev.shape[-1] // 2
    lower = jnp.flip(prev[:, :h], axis=-1) * wa_r + prev[:, h:] * wb
    upper = cur[:, :h] * wc - jnp.flip(cur[:, h:], axis=-1) * ffr
    return jnp.concatenate([lower, upper], axis=-1)


def _unfold_tile(zprev, zcur, p, q, r, s_r):
    """Synthesis combine: out[n] from (z[n-1], z[n]); inputs [TB, N]."""
    h = zcur.shape[-1] // 2
    low = jnp.flip(zcur[:, :h] * p, axis=-1) + zprev[:, h:] * r
    up = zcur[:, :h] * q + jnp.flip(zprev[:, h:], axis=-1) * s_r
    return jnp.concatenate([low, up], axis=-1)


def _load_halo_window(src_hbm, scratch, sem, *, r_ref, t_ref, tb, blocks_n, n_tiles):
    """DMA blocks [t*tb - 1, t*tb + tb - 1] of row r of src into scratch
    [tb+1, N], zero-filling out-of-range rows. All DMA sizes are
    Python-static.

    src_hbm: full-array ref [rows, blocks_n, N] (ANY/HBM — block index maps
    do not slice HBM-resident inputs, so the kernel indexes the row itself);
    scratch: VMEM [tb+1, N].
    """
    t = t_ref
    r = r_ref
    if n_tiles == 1:
        # one tile covers all frames: halo row 0 and any tail rows are zero
        scratch[:, :] = jnp.zeros_like(scratch)
        cp = pltpu.make_async_copy(
            src_hbm.at[r, pl.ds(0, blocks_n), :],
            scratch.at[pl.ds(1, blocks_n), :],
            sem,
        )
        cp.start()
        cp.wait()
        return

    first_valid = min(tb, blocks_n)  # static; == tb when n_tiles > 1
    last_lo = (n_tiles - 1) * tb - 1
    last_valid = blocks_n - last_lo  # static, >= 1

    @pl.when(t == 0)
    def _():
        scratch[0:1, :] = jnp.zeros_like(scratch[0:1, :])
        cp = pltpu.make_async_copy(
            src_hbm.at[r, pl.ds(0, first_valid), :],
            scratch.at[pl.ds(1, first_valid), :],
            sem,
        )
        cp.start()
        cp.wait()

    @pl.when(jnp.logical_and(t > 0, t < n_tiles - 1))
    def _():
        cp = pltpu.make_async_copy(
            src_hbm.at[r, pl.ds(t * tb - 1, tb + 1), :],
            scratch.at[pl.ds(0, tb + 1), :],
            sem,
        )
        cp.start()
        cp.wait()

    @pl.when(t == n_tiles - 1)
    def _():
        scratch[:, :] = jnp.zeros_like(scratch)
        cp = pltpu.make_async_copy(
            src_hbm.at[r, pl.ds(last_lo, last_valid), :],
            scratch.at[pl.ds(0, last_valid), :],
            sem,
        )
        cp.start()
        cp.wait()


def _mdct_fwd_kernel(
    x_hbm, coef_ref, dct_ref, out_ref, scratch, sem, *, tb, blocks_n, n_tiles
):
    _load_halo_window(
        x_hbm, scratch, sem,
        r_ref=pl.program_id(0), t_ref=pl.program_id(1),
        tb=tb, blocks_n=blocks_n, n_tiles=n_tiles,
    )
    h = scratch.shape[-1] // 2
    folded = _fold_tile(
        scratch[0:tb, :],
        scratch[1 : tb + 1, :],
        coef_ref[0, :h], coef_ref[1, :h], coef_ref[2, :h], coef_ref[3, :h],
    )
    out_ref[0, :, :] = jnp.dot(
        folded,
        dct_ref[:, :],
        preferred_element_type=folded.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )


def _mdct_inv_kernel(
    y_hbm, coef_ref, dct_ref, out_ref, yscratch, sem, *, tb, blocks_n, n_tiles
):
    _load_halo_window(
        y_hbm, yscratch, sem,
        r_ref=pl.program_id(0), t_ref=pl.program_id(1),
        tb=tb, blocks_n=blocks_n, n_tiles=n_tiles,
    )
    # DCT all tb+1 frames; the halo frame's DCT is recomputed by the
    # neighboring tile (one extra [1,N]x[N,N] row per tile — far cheaper
    # than a second HBM pass to share it).
    z = jnp.dot(
        yscratch[:, :],
        dct_ref[:, :],
        preferred_element_type=yscratch.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    h = z.shape[-1] // 2
    out_ref[0, :, :] = _unfold_tile(
        z[0:tb, :], z[1 : tb + 1, :],
        coef_ref[0, :h], coef_ref[1, :h], coef_ref[2, :h], coef_ref[3, :h],
    )


def _call(kernel_fn, rows, blocks_n, n, tb, dtype, coeffs, dct_mat, x):
    num_out = blocks_n + 1
    n_tiles = pl.cdiv(num_out, tb)
    kernel = functools.partial(
        kernel_fn, tb=tb, blocks_n=blocks_n, n_tiles=n_tiles
    )
    return pl.pallas_call(
        kernel,
        grid=(rows, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # full array; row-indexed
                                                   # inside the kernel
            pl.BlockSpec(
                (4, n // 2), lambda r, t: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((n, n), lambda r, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tb, n), lambda r, t: (r, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, num_out, n), dtype),
        scratch_shapes=[
            pltpu.VMEM((tb + 1, n), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * (num_out + n_tiles) * n * n,
            bytes_accessed=4 * rows * (blocks_n + num_out) * n,
            transcendentals=0,
        ),
    )(x, coeffs, dct_mat)


def mdct_forward_pallas(x_rows, coeffs, dct_fwd, *, tile_blocks=64):
    """Fused forward MDCT: [rows, blocks, N] -> [rows, blocks+1, N].

    :param coeffs: [4, N/2] stacked (wa_r, wb, wc, ffr), compute dtype.
    :param dct_fwd: [N, N] DCT-IV matrix with 1/sqrt(4N) folded in.
    """
    rows, blocks_n, n = x_rows.shape
    tb = min(tile_blocks, blocks_n + 1)
    return _call(
        _mdct_fwd_kernel, rows, blocks_n, n, tb, x_rows.dtype,
        coeffs, dct_fwd, x_rows,
    )


def mdct_inverse_pallas(y_rows, coeffs, dct_inv, *, tile_blocks=64):
    """Fused inverse MDCT: [rows, blocks, N] spectral frames ->
    [rows, blocks+1, N] time blocks (caller reshapes to samples).

    :param coeffs: [4, N/2] stacked (p, q, r, s_r), compute dtype.
    :param dct_inv: [N, N] DCT-IV matrix with sqrt(4N) folded in.
    """
    rows, blocks_n, n = y_rows.shape
    tb = min(tile_blocks, blocks_n + 1)
    return _call(
        _mdct_inv_kernel, rows, blocks_n, n, tb, y_rows.dtype,
        coeffs, dct_inv, y_rows,
    )
