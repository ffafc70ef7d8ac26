"""Fused RK-step Pallas kernel: one pallas_call per solver step.

VERDICT r4 item 6. The per-eval megakernel's cost at the flagship shape
(n=400, H=32, L=3, B=16) decomposes as ~1.2 us kernel-launch overhead +
~1.6 us interval-plane DMA + ~2.4 us serial compute per eval, with no
DMA/compute overlap (benchmarks/mk_probe5.py ablation profile; every
restructure of the compute itself -- precomputed reductions, 4-plain-matmul
operand absorption, dot_general transposes -- measured SLOWER,
benchmarks/mk_probe4.py / mk_probe6.py). Launch + DMA are per-CALL costs,
and an explicit FSAL RK step makes S-1 back-to-back calls whose stages
almost always share one interval's coefficient planes.

This kernel runs the ENTIRE step in one pallas_call with grid
``(batch, stages)`` and a VMEM k-scratch:

  * launch overhead amortised over the stages;
  * plane DMA issued per grid step through the same scalar-prefetch index
    maps as the batch-grid eval kernel -- Mosaic skips the copy when the
    block index repeats (consecutive stages of one element in one
    interval), so the planes are read ~once per step instead of once per
    stage;
  * the stage combinations ``y + h * sum_j a_ij k_j`` move from XLA glue
    between kernel launches into O(nH) VPU work inside the kernel;
  * the tableau rows ride in SMEM (scalar-prefetch operands), so one
    compiled kernel serves any explicit FSAL tableau of the same stage
    count.

Measured (v5e, marginal-cost method, benchmarks/mk_probe7.py): 4.37 vs
5.25 us/eval against the sequential batch-grid arrangement -- 1.20x on the
whole forward solve. The eval math is byte-identical to the per-eval
megakernel (both build on megakernel._make_vf_body).

The backward replays the step through the per-eval ``megakernel_vf_eval``
calls (each with its own fused backward kernel), composed by ``jax.vjp`` --
exactly the recomputation the checkpointed adjoint performs today, so
training gradients are unchanged.

Reference semantics served: the hot loop of src/models/graph_neural_cde.py
:94-104 (Tsit5/PID adaptive solve whose stage evals are
perm_equiv_graph_vector_field.py:85-129).
"""

from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .megakernel import (
    _interval,
    _layer_param_arrays,
    _make_vf_body,
    megakernel_vf_eval,
    _unwrap,
    _perturbed,
)


def _tableau_arrays(tab) -> tp.Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(amat, bvec, berr, cvec) as dense numpy arrays over [f0, k1..k_last].

    amat[s, j]: weight of k_j in the input of evaluated stage s+1 (zero
    padded); bvec/berr: solution / embedded-error weights; cvec[s]: node of
    evaluated stage s+1.
    """
    s_eval = tab.num_stages - 1
    amat = np.zeros((s_eval, s_eval), np.float32)
    for srow in range(s_eval):
        for j, aij in enumerate(tab.a[srow + 1]):
            amat[srow, j] = aij
    bvec = np.zeros((s_eval + 1,), np.float32)
    for j, bj in enumerate(tab.b):
        bvec[j] = bj
    berr = np.zeros((s_eval + 1,), np.float32)
    for j, bj in enumerate(tab.b_err or ()):
        berr[j] = bj
    cvec = np.asarray(tab.c[1:], np.float32)
    return amat, bvec, berr, cvec


def _make_step_kernel(n, dims, bf16, directed, s_eval, n_layer_refs,
                      with_ks):
    """``with_ks``: emit the stage derivatives as a 4th output (B, S, n, H)
    instead of keeping them in scratch -- the manual-chain backward consumes
    them, so the differentiated forward pays one extra O(S n H) write and
    the backward runs ZERO forward recomputation."""
    body = _make_vf_body(n, list(dims), bf16, directed)

    def kernel(idx_sref, tau_sref, h_sref, amat_ref, bvec_ref, berr_ref,
               d_ref, c_ref, b_ref, a_ref, y_ref, f0_ref, *rest):
        del idx_sref  # consumed by the index maps
        layer_refs = rest[:n_layer_refs]
        y1_ref = rest[n_layer_refs]
        err_ref = rest[n_layer_refs + 1]
        f1_ref = rest[n_layer_refs + 2]
        ks_ref = rest[n_layer_refs + 3]  # output block or scratch: (S, n, H)
        i = pl.program_id(0)
        s = pl.program_id(1)
        tau = tau_sref[i, s]
        h = h_sref[i]

        @pl.when(s == 0)
        def _():
            # k-slots beyond the current stage are read (weight 0) before
            # they are written; VMEM scratch starts as garbage which may be
            # non-finite, and 0 * inf = nan.
            ks_ref[...] = jnp.zeros_like(ks_ref)

        f0 = f0_ref[:]
        y = y_ref[:]
        acc = amat_ref[s, 0] * f0
        for j in range(1, s_eval):
            acc = acc + amat_ref[s, j] * ks_ref[j - 1]
        Yi = y + h * acc

        d = d_ref[:].astype(jnp.float32)
        c = c_ref[:].astype(jnp.float32)
        b = b_ref[:].astype(jnp.float32)
        a = a_ref[:].astype(jnp.float32)
        k = body(tau, d, c, b, a, Yi, layer_refs)
        ks_ref[s] = k

        @pl.when(s == s_eval - 1)
        def _():
            bacc = bvec_ref[0] * f0
            eacc = berr_ref[0] * f0
            for j in range(1, s_eval):
                bacc = bacc + bvec_ref[j] * ks_ref[j - 1]
                eacc = eacc + berr_ref[j] * ks_ref[j - 1]
            bacc = bacc + bvec_ref[s_eval] * k
            eacc = eacc + berr_ref[s_eval] * k
            y1_ref[:] = y + h * bacc
            err_ref[:] = h * eacc
            f1_ref[:] = k  # FSAL: the last stage input IS y1 (a[last] == b)

    return kernel


def _step_call(coeffs, coeffs_batched, idx_bs, tau_bs, h_b, Y_b, F0_b,
               layer_arrays, tab_np, n, dims, bf16, directed,
               with_ks=False):
    """Batched fused step: grid (B, s_eval); k's in VMEM scratch, or in a
    4th output when ``with_ks`` (for the manual-chain backward)."""
    d, c, b, a = coeffs
    amat, bvec, berr, _ = tab_np
    s_eval = amat.shape[0]
    B = Y_b.shape[0]
    H_in = Y_b.shape[2]
    flat_layers = []
    for la in layer_arrays:
        for key in ("norm_w", "norm_b", "W", "lin_b", "basis"):
            flat_layers.append(la[key])
    kernel = _make_step_kernel(n, tuple(dims), bf16, directed, s_eval,
                               len(flat_layers), with_ks)

    if coeffs_batched:
        plane_spec = pl.BlockSpec(
            (None, None, n, n),
            lambda i, s, idx, tau, h, am, bv, be: (i, idx[i, s], 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        plane_spec = pl.BlockSpec(
            (None, n, n),
            lambda i, s, idx, tau, h, am, bv, be: (idx[i, s], 0, 0),
            memory_space=pltpu.VMEM,
        )
    nh_spec = pl.BlockSpec(
        (None, n, H_in), lambda i, s, idx, tau, h, am, bv, be: (i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [plane_spec] * 4 + [nh_spec, nh_spec] + [
        pl.BlockSpec(memory_space=pltpu.VMEM)
    ] * len(flat_layers)
    out_specs = [nh_spec, nh_spec, nh_spec]
    out_shape = [jax.ShapeDtypeStruct((B, n, H_in), jnp.float32)] * 3
    scratch_shapes = [pltpu.VMEM((s_eval, n, H_in), jnp.float32)]
    if with_ks:
        out_specs.append(pl.BlockSpec(
            (None, s_eval, n, H_in),
            lambda i, s, idx, tau, h, am, bv, be: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ))
        out_shape.append(
            jax.ShapeDtypeStruct((B, s_eval, n, H_in), jnp.float32))
        scratch_shapes = []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,  # idx, tau, h, amat, bvec, berr
        grid=(B, s_eval),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
    )(idx_bs.astype(jnp.int32), tau_bs.astype(jnp.float32),
      h_b.astype(jnp.float32), jnp.asarray(amat), jnp.asarray(bvec),
      jnp.asarray(berr), d, c, b, a, Y_b, F0_b, *flat_layers)
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _fused_step_forward(n, dims, bf16, directed, tab_key, with_ks=False):
    """custom_vmap-wrapped step forward for one (shape, tableau) pair.

    The unbatched call runs the same (1, s_eval)-grid kernel; the solve-level
    batch vmap (loss vmaps the model over the batch) dispatches to the
    (B, s_eval) grid -- one pallas_call for the whole batched step.
    """
    import jax.custom_batching

    tab_np = _TAB_CACHE[tab_key]
    n_out = 4 if with_ks else 3

    def _unbatched(coeffs, idx_s, tau_s, y, h, f0, layer_arrays):
        out = _step_call(
            coeffs, False,
            idx_s[None], tau_s[None], h[None], y[None], f0[None],
            layer_arrays, tab_np, n, list(dims), bf16, directed,
            with_ks=with_ks,
        )
        return tuple(o[0] for o in out)

    @jax.custom_batching.custom_vmap
    def step(coeffs, idx_s, tau_s, y, h, f0, layer_arrays):
        return _unbatched(coeffs, idx_s, tau_s, y, h, f0, layer_arrays)

    @step.def_vmap
    def _rule(axis_size, in_batched, coeffs, idx_s, tau_s, y, h, f0,
              layer_arrays):
        coeff_flags = jax.tree_util.tree_leaves(in_batched[0])
        cb = all(coeff_flags)
        mixed_coeffs = any(coeff_flags) and not cb
        params_batched = any(jax.tree_util.tree_leaves(in_batched[6]))
        if params_batched or mixed_coeffs:
            # Per-element parameters / partially-batched coeffs (no trainer
            # does this): generic vmap of the UNWRAPPED impl -- vmapping
            # `step` itself would re-enter this rule with identical flags
            # and recurse forever (same pattern as megakernel._fused_forward).
            axes = jax.tree_util.tree_map(
                lambda bt: 0 if bt else None, in_batched
            )
            out = jax.vmap(_unbatched, in_axes=tuple(axes))(
                coeffs, idx_s, tau_s, y, h, f0, layer_arrays
            )
            return out, (True,) * n_out
        s_eval = tab_np[0].shape[0]
        idx_b = idx_s if in_batched[1] else jnp.broadcast_to(
            idx_s, (axis_size, s_eval))
        tau_b = tau_s if in_batched[2] else jnp.broadcast_to(
            tau_s, (axis_size, s_eval))
        y_b = y if in_batched[3] else jnp.broadcast_to(
            y, (axis_size,) + y.shape)
        h_b = h if in_batched[4] else jnp.broadcast_to(h, (axis_size,))
        f0_b = f0 if in_batched[5] else jnp.broadcast_to(
            f0, (axis_size,) + f0.shape)
        out = _step_call(coeffs, cb, idx_b, tau_b, h_b, y_b, f0_b,
                         layer_arrays, tab_np, n, list(dims), bf16, directed,
                         with_ks=with_ks)
        return out, (True,) * n_out

    return step


# Tableau arrays keyed by tableau name (hashable key for the lru_cache).
_TAB_CACHE: tp.Dict[str, tuple] = {}


def _step_reference(coeffs, ts, t, y, h, f0, vf, tab):
    """The same step composed from per-eval megakernel calls (backward path
    and parity oracle; mirrors solve._rk_step for explicit FSAL tableaus)."""
    ks = [f0]
    s_eval = tab.num_stages - 1
    for i in range(1, s_eval + 1):
        acc = None
        for j, aij in enumerate(tab.a[i]):
            if aij == 0.0:
                continue
            term = aij * ks[j]
            acc = term if acc is None else acc + term
        yi = y if acc is None else y + h * acc
        ks.append(megakernel_vf_eval(coeffs, ts, t + tab.c[i] * h, yi, vf))
    acc = None
    for i, bi in enumerate(tab.b):
        if bi == 0.0:
            continue
        term = bi * ks[i]
        acc = term if acc is None else acc + term
    y1 = y + h * acc
    if tab.b_err:
        eacc = None
        for i, bi in enumerate(tab.b_err):
            if bi == 0.0:
                continue
            term = bi * ks[i]
            eacc = term if eacc is None else eacc + term
        err = h * eacc
    else:
        err = jnp.zeros_like(y)
    return y1, err, ks[-1]


def _dispatch_args(vf, y):
    from ... import ops as ops_config

    n = y.shape[0]
    dims = tuple(
        (l.conv_layer.linear.in_features, l.conv_layer.linear.out_features)
        for l in vf.gnn_layers
    )
    bf16 = ops_config.get_fusion_precision() == "bf16"
    directed = (
        type(vf.gnn_layers[0]).__name__ == "ConvEquivFusionDirectedLayer"
    )
    return n, dims, bf16, directed


def _stage_nodes(tab_key, ts, t, h):
    _, _, _, cvec = _TAB_CACHE[tab_key]
    t_stages = t + jnp.asarray(cvec) * h  # (s_eval,)
    iv = jax.vmap(lambda tt: jnp.stack(_interval(ts, tt)))(t_stages)
    return iv[:, 0].astype(jnp.int32), iv[:, 1]


@functools.lru_cache(maxsize=None)
def _fused_step_vjp(tab_key):
    """The custom_vjp-wrapped fused step for one tableau.

    Primal-only execution (inference/eval solves) runs the scratch-ks kernel.
    Under differentiation the forward emits the stage derivatives k_1..k_S
    as a 4th kernel output and the backward applies the explicit-RK chain
    rule MANUALLY: per stage (reverse order) one fused backward megakernel
    (megakernel_bwd.megakernel_vf_bwd) on the reconstructed stage input,
    plus O(nH) accumulator glue -- ZERO forward recomputation, unlike a
    jax.vjp over the stage composition (which re-runs all S forward evals
    to build its linearisation; measured +16% on the fixed-step train step).
    """
    tab = _TAB_OBJ_CACHE[tab_key]

    @jax.custom_vjp
    def fused_step(coeffs, ts, t, y, h, f0, vf):
        n, dims, bf16, directed = _dispatch_args(vf, y)
        layer_arrays = _layer_param_arrays(vf)
        idx_s, tau_s = _stage_nodes(tab_key, ts, t, h)
        fwd = _fused_step_forward(n, dims, bf16, directed, tab_key)
        return fwd(coeffs, idx_s, tau_s, y, h, f0, layer_arrays)

    def _fwd(coeffs, ts, t, y, h, f0, vf):
        needs = (
            _perturbed(coeffs), _perturbed(t), _perturbed(y),
            _perturbed(h), _perturbed(f0), _perturbed(vf),
        )
        coeffs_v, ts_v, t_v, y_v, h_v, f0_v, vf_v = (
            _unwrap(coeffs), _unwrap(ts), _unwrap(t), _unwrap(y),
            _unwrap(h), _unwrap(f0), _unwrap(vf),
        )
        n, dims, bf16, directed = _dispatch_args(vf_v, y_v)
        layer_arrays = _layer_param_arrays(vf_v)
        idx_s, tau_s = _stage_nodes(tab_key, ts_v, t_v, h_v)
        fwd = _fused_step_forward(n, dims, bf16, directed, tab_key,
                                  with_ks=True)
        y1, err, f1, ks = fwd(coeffs_v, idx_s, tau_s, y_v, h_v, f0_v,
                              layer_arrays)
        return (y1, err, f1), (
            coeffs_v, ts_v, t_v, y_v, h_v, f0_v, vf_v, ks, needs,
        )

    def _bwd(res, g):
        import operator

        from .megakernel import _bwd_max_n
        from .megakernel_bwd import megakernel_vf_bwd

        coeffs, ts, t, y, h, f0, vf, ks, needs = res
        need_coeffs, need_t, need_y, need_h, need_f0, need_vf = needs
        SymZero = jax.custom_derivatives.SymbolicZero
        if all(isinstance(gi, SymZero) for gi in g):
            return (None,) * 7
        g_y1, g_err, g_f1 = (
            jnp.zeros(gi.shape, gi.dtype) if isinstance(gi, SymZero) else gi
            for gi in g
        )
        n = y.shape[0]

        if need_coeffs or n > _bwd_max_n():
            # Rare paths (perturbed coefficient planes; the 512 < n <= 640
            # sliver where the backward megakernel's VMEM doesn't fit):
            # jax.vjp over the per-eval composition.
            gg = (g_y1, g_err, g_f1)
            if need_coeffs:
                def f(coeffs_, t_, y_, h_, f0_, vf_):
                    return _step_reference(
                        coeffs_, ts, t_, y_, h_, f0_, vf_, tab)

                _, vjp = jax.vjp(f, coeffs, t, y, h, f0, vf)
                d_coeffs, d_t, d_y, d_h, d_f0, d_vf = vjp(gg)
            else:
                def f(t_, y_, h_, f0_, vf_):
                    return _step_reference(
                        coeffs, ts, t_, y_, h_, f0_, vf_, tab)

                _, vjp = jax.vjp(f, t, y, h, f0, vf)
                d_t, d_y, d_h, d_f0, d_vf = vjp(gg)
                d_coeffs = None
            return (
                d_coeffs, None,
                d_t if need_t else None,
                d_y if need_y else None,
                d_h if need_h else None,
                d_f0 if need_f0 else None,
                d_vf if need_vf else None,
            )

        # Manual explicit-RK chain rule over the kernel-stored stage
        # derivatives. Stage i (1-based) evaluates k_i = f(t_i, Yi_i) with
        # t_i = t + c_i h, Yi_i = y + h sum_{j<i} a_ij k_j; the outputs are
        # y1 = y + h sum_j b_j k_j, err = h sum_j e_j k_j, f1 = k_S.
        amat, bvec, berr, cvec = _TAB_CACHE[tab_key]
        s_eval = amat.shape[0]
        k = [f0] + [ks[j] for j in range(s_eval)]  # k[0]=f0, k[i]=stage i

        def dot(x, gv):
            return jnp.sum(x * gv)

        kbar = [
            h * (float(bvec[j]) * g_y1 + float(berr[j]) * g_err)
            for j in range(s_eval + 1)
        ]
        kbar[s_eval] = kbar[s_eval] + g_f1
        ybar = g_y1
        hbar = sum(
            float(bvec[j]) * dot(k[j], g_y1) + float(berr[j]) * dot(k[j], g_err)
            for j in range(s_eval + 1)
        )
        tbar = jnp.zeros_like(t)
        d_vf = None
        want_dt = need_t or need_h
        for i in range(s_eval, 0, -1):
            t_i = t + float(cvec[i - 1]) * h
            acc = None
            for j in range(i):
                aij = float(amat[i - 1, j])
                if aij == 0.0:
                    continue
                term = aij * k[j]
                acc = term if acc is None else acc + term
            Yi = y if acc is None else y + h * acc
            d_ti, d_Yi, d_vf_i = megakernel_vf_bwd(
                coeffs, ts, t_i, Yi, vf, kbar[i], need_t=want_dt
            )
            if want_dt:
                tbar = tbar + d_ti
                hbar = hbar + float(cvec[i - 1]) * d_ti
            ybar = ybar + d_Yi
            if acc is not None:
                hbar = hbar + dot(acc, d_Yi)
            for j in range(i):
                aij = float(amat[i - 1, j])
                if aij != 0.0:
                    kbar[j] = kbar[j] + (h * aij) * d_Yi
            d_vf = d_vf_i if d_vf is None else jax.tree_util.tree_map(
                operator.add, d_vf, d_vf_i
            )
        return (
            None,
            None,  # ts: knot grid, never differentiated
            tbar if need_t else None,
            ybar if need_y else None,
            hbar if need_h else None,
            kbar[0] if need_f0 else None,
            d_vf if need_vf else None,
        )

    fused_step.defvjp(_fwd, _bwd, symbolic_zeros=True)
    return fused_step


_TAB_OBJ_CACHE: tp.Dict[str, tp.Any] = {}


def fused_rk_step(tab, coeffs, ts, t, y, h, f0, vf):
    """One explicit FSAL RK step fused into a single Pallas kernel.

    Returns ``(y1, err, f1)`` with the same semantics as solve._rk_step.
    Callers must ensure ``tab.fsal and not tab.implicit`` (the FSAL property
    ``a[last] == b`` is what makes the last stage's eval the next step's
    f0).
    """
    key = tab.name
    if key not in _TAB_CACHE:
        _TAB_CACHE[key] = _tableau_arrays(tab)
        _TAB_OBJ_CACHE[key] = tab
    elif _TAB_OBJ_CACHE[key] != tab:
        # The caches (and the lru_cached vjp/forward builders) key on
        # tab.name; a DIFFERENT tableau reusing a seen name would silently
        # integrate with the first tableau's coefficients.
        raise ValueError(
            f"fused_rk_step: tableau name {key!r} was already registered "
            "with different coefficients; give distinct tableaus distinct "
            "names"
        )
    return _fused_step_vjp(key)(coeffs, ts, t, y, h, f0, vf)
