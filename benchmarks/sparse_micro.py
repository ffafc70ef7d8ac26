"""Microbenchmark: sparse ELL message passing vs dense, XLA vs Pallas SpMM.

Run on the TPU chip:  python benchmarks/sparse_micro.py

Reports (a) ell_spmm XLA vs ell_spmm_pallas, (b) sparse_fused_apply vs the
dense rank-structured fused_apply at scaled n, the regime the sparse path
exists for (VERDICT item 2; SURVEY.md section 2.3(a)).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr

from gncde_tpu.ops import equiv_basis
from gncde_tpu.ops.sparse import ELL, ell_spmm, sparse_fused_apply
from gncde_tpu.ops.pallas.sparse_spmm import ell_spmm_pallas


def bench(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def random_ell(key, n, K):
    rng = np.random.default_rng(int(jr.randint(key, (), 0, 2**31 - 1)))
    indices = np.full((n, K), n, np.int32)
    values = rng.uniform(0.1, 1.0, (n, K)).astype(np.float32)
    for r in range(n):
        indices[r] = np.sort(rng.choice(n, size=K, replace=False))
    return ELL(jnp.asarray(indices), jnp.asarray(values), n)


def main():
    print(f"backend: {jax.default_backend()}")
    for n, K, H in [(1024, 16, 128), (4096, 40, 64), (8192, 80, 64)]:
        key = jr.PRNGKey(n)
        ell = random_ell(key, n, K)
        M = jr.normal(jr.fold_in(key, 1), (n, H))
        t_xla = bench(jax.jit(ell_spmm), ell, M)
        try:
            t_pl = bench(ell_spmm_pallas, ell, M)
        except Exception as e:  # pragma: no cover
            t_pl = float("nan")
            print(f"  pallas failed: {str(e)[:120]}")
        err = float(jnp.max(jnp.abs(ell_spmm_pallas(ell, M) - ell_spmm(ell, M)))) if t_pl == t_pl else float("nan")
        print(
            f"spmm n={n} K={K} H={H}: xla {t_xla*1e6:8.1f}us  pallas {t_pl*1e6:8.1f}us"
            f"  (pallas/xla {t_pl/t_xla:5.2f}x, max_err {err:.2e})"
        )

    # Fused apply: sparse vs dense rank-structured at scaled n.
    for n, K, H in [(4096, 40, 16), (8192, 80, 16)]:
        key = jr.PRNGKey(n + 7)
        ell_A = random_ell(key, n, K)
        ell_dA = ELL(ell_A.indices, ell_A.values * 0.3, n)
        M = jr.normal(jr.fold_in(key, 2), (n, H))
        params = [
            1 / 15 * jr.uniform(k, (2,), minval=-1.0, maxval=1.0)
            for k in jr.split(jr.fold_in(key, 3), 8)
        ]

        sp = jax.jit(lambda a, d, m: sparse_fused_apply(a, d, m, params, True))
        t_sparse = bench(sp, ell_A, ell_dA, M)

        # dense comparison point (same operator, densified once outside)
        def densify(e):
            out = np.zeros((n, n), np.float32)
            idx, vals = np.array(e.indices), np.array(e.values)
            m = idx < n
            rows = np.broadcast_to(np.arange(n)[:, None], idx.shape)
            out[rows[m], idx[m]] = vals[m]
            return jnp.asarray(out)

        A_d, dA_d = densify(ell_A), densify(ell_dA)
        dn = jax.jit(lambda a, d, m: m + equiv_basis.fused_apply(a, d, m, params))
        t_dense = bench(dn, A_d, dA_d, M)
        print(
            f"fused n={n} K={K} H={H}: dense {t_dense*1e6:8.1f}us  "
            f"sparse {t_sparse*1e6:8.1f}us  (speedup {t_dense/t_sparse:5.2f}x)"
        )


if __name__ == "__main__":
    main()
