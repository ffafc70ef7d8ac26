"""Full (store-all) adjoint in the TILED regime (VERDICT r4 item 4) and the
merged tiled backward under vmap (ADVICE r4 item 1).

The flagship (megakernel, n <= 640) full-adjoint A/B was validated in round
4; these tests pin the same contract for the n > MEGAKERNEL_MAX_N tiled
dispatch (interpret-mode kernels off-TPU): identical loss, matching
gradients, and per-example gradient parity when the training vmap batches
the merged one-sweep backward.
"""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from gncde_tpu import ops as ops_config
from gncde_tpu.interp import (
    CubicInterpolation,
    MatrixControl,
    backward_hermite_coefficients,
)
from gncde_tpu.models.vector_fields import PermEquivGraphVectorField
from gncde_tpu.nn import combine, is_inexact_array, partition
from gncde_tpu.ops.pallas import megakernel as mk
from gncde_tpu.ops.pallas import tiled
from gncde_tpu.solve import ODETerm, PIDController, SaveAt, diffeqsolve


@pytest.fixture
def backend_guard():
    prev = ops_config._BACKEND
    ops_config.set_fusion_backend("megakernel")
    yield
    ops_config.set_fusion_backend(prev)


def _tiled_problem(n, H=4, L=2, T=4, key=0):
    assert n > mk.MEGAKERNEL_MAX_N  # must dispatch to the tiled path
    vf = PermEquivGraphVectorField(
        input_dim=H, hidden_dim=H, output_dim=H, num_layers=L,
        data_embed_dim=1, num_nodes=n, key=jr.PRNGKey(key),
    )
    ts = jnp.linspace(0.0, 1.0, T)
    A_path = jr.uniform(jr.PRNGKey(key + 1), (T, n, n)) * 0.1
    coeffs = tuple(backward_hermite_coefficients(ts, A_path))
    y0 = jr.normal(jr.PRNGKey(key + 2), (n, H)) * 0.1
    return vf, ts, coeffs, y0


def test_tiled_full_adjoint_matches_checkpointed(backend_guard):
    """adjoint="full" through the TILED Pallas dispatch: bit-identical loss
    (forward is adjoint-independent) and matching parameter gradients."""
    n = 648  # > MEGAKERNEL_MAX_N, small enough for CPU interpret
    vf, ts, coeffs, y0 = _tiled_problem(n)
    params0, static = partition(vf, is_inexact_array)
    red = tiled.cubic_plane_reductions(coeffs)

    def loss(params, adjoint):
        model = combine(params, static)
        ctrl = MatrixControl(CubicInterpolation(ts, coeffs), red=red)
        sol = diffeqsolve(
            ODETerm(model), "Tsit5", t0=ts[0], t1=ts[-1], dt0=None, y0=y0,
            args=ctrl, stepsize_controller=PIDController(rtol=1e-2, atol=1e-4),
            saveat=SaveAt(t1=True), max_steps=32, adjoint=adjoint,
        )
        return jnp.mean(sol.ys**2)

    out = {}
    for adj in ("checkpointed", "full"):
        out[adj] = jax.jit(
            jax.value_and_grad(lambda p: loss(p, adj))
        )(params0)
    l_ck, g_ck = out["checkpointed"]
    l_fu, g_fu = out["full"]
    assert float(l_ck) == float(l_fu), "loss must be adjoint-independent"
    # Gradients agree to bf16 matmul precision: the two adjoints evaluate
    # the same VJP chain but in different fusion contexts (checkpointed
    # remat vs stored-state replay), so bf16 kernel rounding can differ at
    # the ~3e-3 level (bf16 eps ~= 8e-3). Structural errors are orders of
    # magnitude larger.
    for a, b in zip(
        jax.tree_util.tree_leaves(g_ck), jax.tree_util.tree_leaves(g_fu)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-2
        )


def test_tiled_merged_bwd_vmap_matches_unbatched(backend_guard):
    """ADVICE r4: the merged one-sweep backward (_bwd2_call: SMEM (1, 4)
    accumulator, whole-grid-resident col block) under the loss-level vmap
    must give per-example gradients identical to unbatched calls."""
    n, H, B = 648, 4, 2
    vf, ts, coeffs0, y0_single = _tiled_problem(n, H=H)
    params0, static = partition(vf, is_inexact_array)
    coeffs = jax.tree_util.tree_map(
        lambda c: jnp.stack([c, c * 0.9]), coeffs0
    )
    y0 = jnp.stack([y0_single, y0_single * 1.1])
    eval_ts = jnp.asarray([0.2, 0.7])

    def one_loss(params, coeffs_i, y0_i):
        model = combine(params, static)
        ctrl = MatrixControl(
            CubicInterpolation(ts, tuple(coeffs_i)),
            red=tiled.cubic_plane_reductions(tuple(coeffs_i)),
        )

        def body(y, t):
            # params perturbed, planes/tau not -> the merged path dispatches
            return y + 1e-2 * model(t, y, ctrl), None

        y_fin, _ = jax.lax.scan(body, y0_i, eval_ts)
        return jnp.sum(y_fin**2)

    def batched_loss(params):
        return jnp.sum(jax.vmap(
            lambda c, y: one_loss(params, c, y)
        )(coeffs, y0))

    g_batched = jax.jit(jax.grad(batched_loss))(params0)

    def summed_unbatched(params):
        per = [
            one_loss(
                params,
                jax.tree_util.tree_map(lambda c: c[i], coeffs),
                y0[i],
            )
            for i in range(B)
        ]
        return sum(per)

    g_unbatched = jax.jit(jax.grad(summed_unbatched))(params0)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_batched),
        jax.tree_util.tree_leaves(g_unbatched),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3
        )
