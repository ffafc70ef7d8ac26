"""Pallas ELL SpMM kernel (scalar-prefetch gather).

``A @ M`` with A in ELL form (SURVEY.md section 2.3(a): the native SpMM
surface; reference feeds torch dense matmuls, here the scaled-n path is
gather-based). Two implementations exist:

  * XLA (ops/sparse.py:ell_spmm): pad-gather ``M[indices]`` + einsum. XLA
    lowers the gather to the TPU's native dynamic-gather support and fuses
    the multiply-reduce; measured ~20us at (n=1024, K=16, H=128) on v5e --
    essentially HBM speed-of-light for the gathered-intermediate formulation.
  * This kernel: grid over row tiles; ``indices``/``values`` tiles ride in
    SMEM, M stays resident in VMEM, and each output row accumulates its K
    neighbour rows via scalar-index dynamic slices. No (n, K, H) intermediate
    ever exists, so HBM traffic is O(nnz + nH) instead of O(nnz * H).

Measured on v5e (benchmarks/sparse_micro.py): the scalar row loop serialises
on the sublane dimension, so despite the bandwidth win the kernel runs ~40x
slower than the XLA gather at production shapes. Mosaic on this toolchain
cannot lower a vectorised row gather (``jnp.take``/``take_along_axis`` along
the sublane axis fail to compile -- verified), which caps this kernel's
throughput at one row per loop step. ``ell_spmm`` therefore stays the
production path; this kernel is the correctness-verified seed for when
Mosaic grows sublane dynamic_gather support.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sparse import ELL


def _spmm_kernel(idx_ref, val_ref, m_ref, out_ref, *, tile: int, K: int, H: int):
    """One row tile: out[r] = sum_k val[r,k] * M[idx[r,k]]."""

    def row_body(r, _):
        def k_body(k, acc_row):
            idx = idx_ref[r, k]
            w = val_ref[r, k]
            # Padding slots carry idx == n (one past the last row of the
            # padded M input) whose row is all-zero, so no masking is needed.
            return acc_row + w * m_ref[pl.ds(idx, 1), :]

        out_ref[pl.ds(r, 1), :] = jax.lax.fori_loop(
            0, K, k_body, jnp.zeros((1, H), jnp.float32)
        )
        return 0

    jax.lax.fori_loop(0, tile, row_body, 0)


@functools.partial(jax.jit, static_argnames=("n", "tile"))
def _spmm_pallas(indices, values, M_pad, *, n: int, tile: int):
    K = indices.shape[1]
    H = M_pad.shape[1]
    kernel = functools.partial(_spmm_kernel, tile=tile, K=K, H=H)
    return pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, K), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, K), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # M_pad resident
        ],
        out_specs=pl.BlockSpec((tile, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, H), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * K * H,
            bytes_accessed=n * K * 8 + (n + 1) * H * 4 + n * H * 4,
            transcendentals=0,
        ),
    )(indices, values, M_pad)


def ell_spmm_pallas(ell: ELL, M: jax.Array, tile: int = 256) -> jax.Array:
    """``A @ M`` via the Pallas scalar-prefetch-gather kernel.

    Allclose-matches ops.sparse.ell_spmm (tests/test_sparse.py). ``tile``
    must divide n; rows are padded M-side so padding indices (== n) read a
    zero row.
    """
    n = ell.n
    K = ell.indices.shape[1]
    H = M.shape[1]
    # indices+values tiles live in SMEM (keep each under ~16KB) and the
    # output block's sublane dim must stay a multiple of 8.
    budget = max(8, 4096 // max(K, 1))
    tile = 8
    while tile * 2 <= min(budget, 256) and n % (tile * 2) == 0:
        tile *= 2
    if n % tile != 0:
        raise ValueError(f"ell_spmm_pallas requires n % 8 == 0, got n={n}")
    # Mosaic requires the last block dim to be lane-aligned: pad H to 128.
    Hp = max(128, -(-H // 128) * 128)
    M_pad = jnp.zeros((n + 1, Hp), jnp.float32).at[:n, :H].set(M.astype(jnp.float32))
    out = _spmm_pallas(
        ell.indices, ell.values.astype(jnp.float32), M_pad, n=n, tile=tile
    )
    return out[:, :H]
