"""Fused Pallas TPU kernels for the MDCT filter bank.

Design: the polyphase stage is a 2-tap coupling y[n] = x[n] @ H0 +
x[n-1] @ H1 followed by the DCT-IV matmul C. H0/H1 each have ONE nonzero
per row (the diamond), so H1 @ C and H0 @ C are scaled row-permutations of
C — still dense [N, N], but exact precomputes. The whole forward therefore
collapses to

    y[n] = x[n-1] @ M_prev + x[n] @ M_cur        (M_* = H_* @ C / sqrt(4N))

two MXU matmuls per tile with ZERO elementwise work in between — no
flips (Mosaic has no lane-reverse primitive), no fold pass, no separate
normalization. The inverse factors identically:

    out[n] = z[n] @ G0 + z[n-1] @ G1,  z = sqrt(4N) * (y @ C)
           = y[n] @ (C @ G0 * s) + y[n-1] @ (C @ G1 * s)

The signal is read from HBM exactly once and the output written exactly
once; each grid tile DMAs its own [tile + 1 halo] window into VMEM
(adjacent-block coupling = one-block halo). Edge tiles zero-fill; every DMA
size is Python-static because which grid step is first/last is known at
trace time.

FLOP cost is 2x the bare DCT matmul, paid to eliminate every intermediate
HBM pass — the right trade on a bandwidth-bound chip.

Shapes use the channel-folded layout [rows = B*C, blocks, N]. N must be a
multiple of 128 and N <= 1024 (two [N, N] matrices must fit VMEM).
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

_DEFAULT_TILE_BLOCKS = 64


def fused_forward_matrices(filters_n: int, window_type) -> tuple:
    """(M_prev, M_cur) float64 [N, N]: fold + DCT-IV + 1/sqrt(4N), fused."""
    h0, h1 = _folding.dense_fold_matrices(filters_n, window_type)
    c = _dct.dct4_matrix(filters_n)
    s = 1.0 / math.sqrt(4.0 * filters_n)
    return h1 @ c * s, h0 @ c * s


def fused_inverse_matrices(filters_n: int, window_type) -> tuple:
    """(M_prev, M_cur) float64 [N, N]: sqrt(4N) + DCT-IV + unfold, fused."""
    g0, g1 = _folding.dense_unfold_matrices(filters_n, window_type)
    c = _dct.dct4_matrix(filters_n)
    s = math.sqrt(4.0 * filters_n)
    return c @ g1 * s, c @ g0 * s


def _mdct_kernel(
    x_hbm, mprev_ref, mcur_ref, out_ref, cur_s, halo_s, sem_cur,
    *, tb, blocks_n, n_tiles, precision
):
    """Shared forward/inverse body: out = prev @ M_prev + cur @ M_cur.

    Mosaic requires second-to-last-dim DMA slices to be 8-aligned in offset
    AND size, which rules out a 1-block halo DMA. But TPU grid steps run
    SEQUENTIALLY and scratch persists across them, so the halo block is
    simply the previous tile's last block saved into ``halo_s`` at the end
    of each step — zero extra HBM traffic. The wrapper zero-pads the blocks
    axis to a multiple of 8, keeping the tail DMA aligned too; stale
    scratch rows past the tail are masked in-register before the matmul.
    """
    r, t = pl.program_id(0), pl.program_id(1)
    f0 = t * tb
    # blocks_n is a multiple of 8 (the wrapper zero-pads), so every DMA
    # offset and size below is 8-aligned.
    last_valid = blocks_n - (n_tiles - 1) * tb  # static, in [0, tb)
    last_size = last_valid

    if n_tiles > 1:

        @pl.when(t < n_tiles - 1)
        def _():
            cp = pltpu.make_async_copy(
                x_hbm.at[r, pl.ds(f0, tb), :], cur_s, sem_cur
            )
            cp.start()
            cp.wait()

    @pl.when(t == n_tiles - 1)
    def _():
        if last_size > 0:
            cp = pltpu.make_async_copy(
                x_hbm.at[r, pl.ds((n_tiles - 1) * tb, last_size), :],
                cur_s.at[pl.ds(0, last_size), :],
                sem_cur,
            )
            cp.start()
            cp.wait()

    @pl.when(t == 0)
    def _():
        halo_s[0:1, :] = jnp.zeros_like(halo_s[0:1, :])

    # Mask rows past the end of the signal (the final output frame has no
    # current block; tail-tile DMA may have read tile padding).
    valid_rows = jnp.where(t == n_tiles - 1, last_valid, tb)
    row = jax.lax.broadcasted_iota(jnp.int32, (tb, 1), 0)
    cur = jnp.where(row < valid_rows, cur_s[:, :], 0)

    prev = jnp.concatenate([halo_s[0:1, :], cur[0 : tb - 1, :]], axis=0)
    acc = jnp.dot(
        prev,
        mprev_ref[:, :],
        preferred_element_type=cur.dtype,
        precision=precision,
    )
    out_ref[0, :, :] = acc + jnp.dot(
        cur,
        mcur_ref[:, :],
        preferred_element_type=cur.dtype,
        precision=precision,
    )
    # Save this tile's last block as the next tile's halo (sequential grid).
    halo_s[0:1, :] = cur[tb - 1 : tb, :]


def _call(rows, blocks_n, n, tb, dtype, m_prev, m_cur, x, precision):
    num_out = blocks_n + 1
    n_tiles = pl.cdiv(num_out, tb)
    # Mosaic supports only DEFAULT and HIGHEST dot precisions; 'high'
    # falls back to 'highest' inside kernels (accurate, slightly slower).
    if precision == "high":
        precision = "highest"
    kernel = functools.partial(
        _mdct_kernel, tb=tb, blocks_n=blocks_n, n_tiles=n_tiles,
        precision=_dct.PRECISIONS[precision],
    )
    return pl.pallas_call(
        kernel,
        grid=(rows, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # full array; row-indexed
                                                   # inside the kernel
            pl.BlockSpec((n, n), lambda r, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda r, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tb, n), lambda r, t: (r, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, num_out, n), dtype),
        scratch_shapes=[
            pltpu.VMEM((tb, n), dtype),  # current-blocks window
            pltpu.VMEM((8, n), dtype),  # halo block (8-row tile-padded)
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * rows * num_out * n * n,
            bytes_accessed=4 * rows * (blocks_n + num_out) * n,
            transcendentals=0,
        ),
    )(x, m_prev, m_cur)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _two_tap_matmul(x_rows, m_prev, m_cur, precision="highest"):
    """y[n] = x[n-1] @ m_prev + x[n] @ m_cur via the fused kernel.

    Linear in x, so the VJP is the SAME kernel run on the block-reversed
    cotangent with transposed matrices:

      dx[m] = g[m] @ m_cur^T + g[m+1] @ m_prev^T
            = reverse(K(reverse(g); m_prev^T, m_cur^T))[1:-1]

    (pallas_call is not differentiable by tracing, and the filter bank
    must be differentiable — it exists to sit in neural pipelines.)
    """
    rows, blocks_n, n = x_rows.shape
    xp, padded = _pad_blocks8(x_rows)
    tb = min(_DEFAULT_TILE_BLOCKS, -(-(padded + 1) // 8) * 8)
    out = _call(
        rows, padded, n, tb, xp.dtype, m_prev, m_cur, xp, precision
    )
    return out[:, : blocks_n + 1]


def _two_tap_fwd(x_rows, m_prev, m_cur, precision):
    return _two_tap_matmul(x_rows, m_prev, m_cur, precision), (
        m_prev,
        m_cur,
    )


def _two_tap_bwd(precision, res, g):
    m_prev, m_cur = res
    grev = jnp.flip(g, axis=1)
    full = _two_tap_matmul(grev, m_prev.T, m_cur.T, precision)
    dx = jnp.flip(full[:, 1:-1], axis=1)
    # The matrices are deterministic precomputes, never trained.
    return dx, jnp.zeros_like(m_prev), jnp.zeros_like(m_cur)


_two_tap_matmul.defvjp(_two_tap_fwd, _two_tap_bwd)


def mdct_forward_pallas(x_rows, m_prev, m_cur, precision="highest"):
    """Fused forward MDCT: [rows, blocks, N] -> [rows, blocks+1, N].

    :param m_prev, m_cur: [N, N] fused matrices from
        :func:`fused_forward_matrices` (float32, or bfloat16 for the
        fast_bf16 policy).
    """
    return _two_tap_matmul(x_rows, m_prev, m_cur, precision)


def _pad_blocks8(rows_arr):
    """Zero-pad the blocks axis to a multiple of 8 (keeps every kernel DMA
    8-aligned; zero blocks are valid signal so no masking subtleties). In a
    jit pipeline the pad fuses into the producing transpose/reshape."""
    blocks_n = rows_arr.shape[1]
    padded = -(-blocks_n // 8) * 8
    if padded != blocks_n:
        rows_arr = jnp.pad(
            rows_arr, ((0, 0), (0, padded - blocks_n), (0, 0))
        )
    return rows_arr, padded


def mdct_inverse_pallas(y_rows, m_prev, m_cur, precision="highest"):
    """Fused inverse MDCT: [rows, blocks, N] spectral frames ->
    [rows, blocks+1, N] time blocks (caller reshapes to samples).

    :param m_prev, m_cur: [N, N] fused matrices from
        :func:`fused_inverse_matrices` (float32, or bfloat16 for the
        fast_bf16 policy).
    """
    return _two_tap_matmul(y_rows, m_prev, m_cur, precision)
