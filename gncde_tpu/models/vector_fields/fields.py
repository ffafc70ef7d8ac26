"""Graph vector fields (the functions integrated by the CDE/ODE solvers).

Re-implements every vector field in reference src/models/vector_fields/
with the fused message-passing layers from layers.py. Call signature follows
the solver convention ``vf(t, y, args) -> dy/dt`` (reference:
perm_equiv_graph_vector_field.py:85-129).

Control-path channel layout (set by the data layer, reference
dataset_configs.py:160-165): channel 0 is the time index, channel -1 the
adjacency value, so ``evaluate(t)[..., -1]`` is A(t) and
``derivative(t)[..., 0]`` the time-channel gradient.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import jax.random as jr

from ...nn import Module, Linear, MLP, Embedding, static_field
from .layers import (
    ConvLayer,
    ConvEquivFusionLayer,
    ConvEquivFusionDirectedLayer,
    ConvPreMultFusionLayer,
)
from ..neural_nets import IdxEncoder


def _make_stack(layer_cls, input_dim, hidden_dim, output_dim, num_layers, key, **kw):
    """num_layers-1 hidden layers + one output layer, reference key order
    (perm_equiv_graph_vector_field.py:47-61)."""
    layers = []
    for _ in range(num_layers - 1):
        tempkey, key = jr.split(key, 2)
        layers.append(layer_cls(input_dim=input_dim, output_dim=hidden_dim, key=tempkey, **kw))
        input_dim = hidden_dim
    tempkey, key = jr.split(key, 2)
    layers.append(layer_cls(input_dim=input_dim, output_dim=output_dim, key=tempkey, **kw))
    return layers, key


def _run_stack(layers, node_features, *mp_args):
    for i, layer in enumerate(layers):
        node_features = layer(node_features, *mp_args)
        if i < len(layers) - 1:
            node_features = jax.nn.relu(node_features)
    return node_features


def _time_scale(t_gradient_matrix: jax.Array, node_features: jax.Array) -> jax.Array:
    """Per-node time-gradient scaling (reference .py:127-128)."""
    t_gradient = jnp.mean(t_gradient_matrix, axis=0)  # [nodes]
    return t_gradient[:, None] * node_features


def control_terms(control_adj, t):
    """(A(t), dA(t), time-gradient matrix or None).

    Fast path: :class:`gncde_tpu.interp.MatrixControl` carries only the value
    channel (implicit time channel with unit gradient) -- half the
    coefficient gathers per evaluation. Reference-layout paths (channels
    stacked as [time, value]) evaluate both channels, as the reference does
    (perm_equiv_graph_vector_field.py:97-102).
    """
    if getattr(control_adj, "tgrad_is_unit", False):
        return control_adj.adj(t), control_adj.dadj(t), None
    deriv = control_adj.derivative(t)
    return control_adj.evaluate(t)[..., -1], deriv[..., -1], deriv[..., 0]


def _maybe_time_scale(tgrad, node_features):
    if tgrad is None:
        return node_features
    return _time_scale(tgrad, node_features)


def _modulate_matrix(mat: jax.Array, mlp: MLP, emb: jax.Array) -> jax.Array:
    """Per-edge MLP modulation: concat([mat_ij, emb_i, emb_j]) -> scalar
    (reference perm_equiv_dir_graph_vector_field.py:185-199; the undirected
    variants' enc_idx path is dead code in the reference -- commented-out
    fields, graph_vector_field.py:21-22,71-77 -- re-enabled here with the
    same semantics).

    TPU-native decomposition (same math as the reference's nested-vmap MLP
    over the (n, n, 2 idx_dim + 1) concat): the FIRST layer is affine in
    the concat, so its pairwise part is two (n, idx_dim) @ (idx_dim, w)
    matmuls broadcast-added -- the concat (9 GB at tgbn-genre's n=1505,
    idx_dim=512) is never materialised, and per-eval work drops from
    O(n^2 (2 idx_dim + 1) w) to O(n^2 w^2) (~200x at the reference's
    idx_dim=512, width 8). ``emb``: per-node embeddings (n, idx_dim).
    """
    from ...nn.layers import _ACTIVATIONS

    W1 = mlp.layers[0].weight  # (w, 2 d + 1), columns [a | emb_i | emb_j]
    b1 = mlp.layers[0].bias
    d = emb.shape[1]
    wa = W1[:, 0]
    # HIGHEST matmul precision throughout: these contractions are tiny
    # (n x d x w and w x w), but the TPU default (bf16 passes) loses ~1e-2
    # relative accuracy on the d=512-wide sums the reference evaluates in
    # f32.
    hp = jax.lax.Precision.HIGHEST
    Ei = jnp.einsum("nd,wd->nw", emb, W1[:, 1 : 1 + d], precision=hp)
    Ej = jnp.einsum("nd,wd->nw", emb, W1[:, 1 + d :], precision=hp)
    # Channel-FIRST activations (w, n, n): with the tiny width minormost,
    # XLA pads w=8 to the 128-lane register width and every intermediate
    # carries 16x dead memory (measured 1.9x total win instead of ~50x);
    # with n minormost the layout is dense and the hidden layers are
    # einsum contractions over the leading axis.
    z = (wa[:, None, None] * mat[None, :, :]
         + Ei.T[:, :, None] + Ej.T[:, None, :])
    if b1 is not None:
        z = z + b1[:, None, None]
    act = _ACTIVATIONS[mlp.activation]
    z = act(z)
    for layer in mlp.layers[1:-1]:
        z = jnp.einsum("vw,wij->vij", layer.weight, z, precision=hp)
        if layer.bias is not None:
            z = z + layer.bias[:, None, None]
        z = act(z)
    last = mlp.layers[-1]
    z = jnp.einsum("vw,wij->vij", last.weight, z, precision=hp)
    if last.bias is not None:
        z = z + last.bias[:, None, None]
    z = _ACTIVATIONS[mlp.final_activation](z)
    return jnp.squeeze(z, axis=0)


@jax.custom_vjp
def fused_modulate(A, dA, mlp_a, mlp_d, emb):
    """Differentiable fused enc_idx modulation of both planes.

    Forward: ONE Pallas tile sweep evaluating both per-edge MLP chains in
    registers (ops/pallas/modulate.py) -- one HBM read of (A, dA), one write
    of the modulated pair, vs ~6 (w, n, n) intermediates per plane on the
    decomposed XLA path. Returns planes PADDED to pick_tile(n) multiples
    (zero pad), in the fusion-precision dtype, ready for
    tiled_vf_eval_planes. Backward: recompute through the decomposed XLA
    path (:func:`_modulate_matrix`) -- the forward is the solver-loop hot
    side; the backward runs once per training step per eval and reuses the
    already-verified XLA chain.
    """
    from ... import ops as ops_config
    from ...ops.pallas import modulate as _mod
    from ...ops.pallas.tiled import _cdiv, pick_tile

    out_dtype = (jnp.bfloat16 if ops_config.get_fusion_precision() == "bf16"
                 else jnp.float32)
    n = A.shape[0]
    consumer_tile = pick_tile(n)  # what tiled_vf_eval_planes will pick
    NP_out = _cdiv(n, consumer_tile) * consumer_tile
    # Kernel tile stays <= 256: the unrolled MLP holds ~2(w + 3) live tiles
    # and a 512 tile exceeds scoped VMEM; the output still pads to the
    # consumer's grid.
    return _mod.modulate_pair(
        A, dA, mlp_a, mlp_d, emb, tile=min(256, NP_out),
        out_dtype=out_dtype, pad_to=NP_out)


def _fused_modulate_ref(A, dA, mlp_a, mlp_d, emb):
    """XLA reference with IDENTICAL output structure (padding + dtype)."""
    from ... import ops as ops_config
    from ...ops.pallas.tiled import _cdiv, pick_tile

    out_dtype = (jnp.bfloat16 if ops_config.get_fusion_precision() == "bf16"
                 else jnp.float32)
    n = A.shape[0]
    tile = pick_tile(n)
    NP = _cdiv(n, tile) * tile
    Am = _modulate_matrix(A, mlp_a, emb)
    dAm = _modulate_matrix(dA, mlp_d, emb)
    if NP != n:
        Am = jnp.zeros((NP, NP), Am.dtype).at[:n, :n].set(Am)
        dAm = jnp.zeros((NP, NP), dAm.dtype).at[:n, :n].set(dAm)
    return Am.astype(out_dtype), dAm.astype(out_dtype)


def _fused_modulate_fwd(A, dA, mlp_a, mlp_d, emb):
    return fused_modulate(A, dA, mlp_a, mlp_d, emb), (A, dA, mlp_a, mlp_d, emb)


def _fused_modulate_bwd(res, g):
    _, vjp = jax.vjp(_fused_modulate_ref, *res)
    return vjp(g)


fused_modulate.defvjp(_fused_modulate_fwd, _fused_modulate_bwd)


def _enc_idx_pallas_eval(vf, control_adj, t, node_features):
    """enc_idx evaluation on the Pallas plane surface (VERDICT r4 item 2).

    Materialise A(t)/dA(t) from the interval Hermite slabs (one fused XLA
    polynomial), modulate them with the decomposed per-edge MLP
    (:func:`_modulate_matrix` -- never materialises the (n, n, 2 idx_dim + 1)
    concat), then run the layer stack through
    :func:`~gncde_tpu.ops.pallas.tiled.tiled_vf_eval_planes`: per-layer
    Pallas pair sweeps with the modulated planes as differentiable inputs,
    so MLP/embedding gradients flow through the kernel's rank-H plane
    cotangents. Replaces the XLA dense-stack fallback the 4 enc_idx
    reference configs (configs/tgb/*/perm_equiv_dir_enc_idx_gncde_config
    .yaml) previously ran."""
    from ... import ops as ops_config
    from ...ops.pallas import tiled as _tiled

    path = control_adj.path
    idx, tau = _tiled._interval(path.ts, t)
    slabs = tuple(
        jax.lax.dynamic_index_in_dim(p, idx, axis=0, keepdims=False)
        for p in path.coeffs
    )
    df, cf, bf, af = (s.astype(jnp.float32) for s in slabs)
    A_t = ((df * tau + cf) * tau + bf) * tau + af
    dA_t = (3.0 * df * tau + 2.0 * cf) * tau + bf
    from ...ops.pallas import modulate as _mod

    emb = vf.idx_enc.node_embedding()
    if (_mod.modulate_supported(vf.msg_func_adj)
            and _mod.modulate_supported(vf.msg_func_adj_deriv)
            and vf.msg_func_adj.width_size == vf.msg_func_adj_deriv.width_size
            and vf.msg_func_adj.depth == vf.msg_func_adj_deriv.depth):
        # Fused kernel: both MLP chains in one tile sweep, pre-padded
        # outputs at the same tile size tiled_vf_eval_planes picks.
        A_m, dA_m = fused_modulate(
            A_t, dA_t, vf.msg_func_adj, vf.msg_func_adj_deriv, emb)
    else:
        A_m = _modulate_matrix(A_t, vf.msg_func_adj, emb)
        dA_m = _modulate_matrix(dA_t, vf.msg_func_adj_deriv, emb)
        if ops_config.get_fusion_precision() == "bf16":
            A_m = A_m.astype(jnp.bfloat16)
            dA_m = dA_m.astype(jnp.bfloat16)
    return _tiled.tiled_vf_eval_planes(A_m, dA_m, node_features, vf)


def _pallas_plane_dispatch_ok(control_adj) -> bool:
    """The shared outer gate for every Pallas plane-surface fast path
    (per-eval megakernel/tiled dispatch AND the fused RK-step hook): the
    megakernel backend is selected, the control's time-gradient is the
    implicit unit channel, and the path is a cubic Hermite interpolation
    whose interval planes the kernels can slice."""
    from ... import ops as ops_config

    return (
        ops_config.get_fusion_backend() == "megakernel"
        and getattr(control_adj, "tgrad_is_unit", False)
        and type(control_adj.path).__name__ == "CubicInterpolation"
    )


def _fused_rk_step_hook(vf, tab, t, y, h, args, f0):
    """Step-level fast path (solve._rk_step hook): run one explicit FSAL RK
    step as ONE Pallas kernel when the per-eval dispatch would use the
    megakernel anyway (ops/pallas/fused_step.py; VERDICT r4 item 6).

    Returns None (statically) when the conditions don't hold, and the solver
    falls back to per-stage vf calls.
    """
    from ... import ops as ops_config

    control_adj = args
    if vf.enc_idx:
        return None
    if not ops_config.get_fused_step():
        return None
    if not _pallas_plane_dispatch_ok(control_adj):
        return None
    from ...ops.pallas import megakernel as _mk

    n = y.shape[0]
    if n > _mk.MEGAKERNEL_MAX_N:
        return None
    dims = [
        (l.conv_layer.linear.in_features, l.conv_layer.linear.out_features)
        for l in vf.gnn_layers
    ]
    if dims[0][0] != dims[-1][1] or y.shape[1] != dims[0][0]:
        return None  # k and y must be the same shape for the stage combos
    from ...ops.pallas import fused_step as _fs

    path = control_adj.path
    return _fs.fused_rk_step(
        tab, tuple(path.coeffs), path.ts, t, y, h, f0, vf
    )


class PermEquivGraphVectorField(Module):
    """Undirected permutation-equivariant vf (perm_equiv_graph_vector_field.py).

    ``enc_idx=True`` is a working FIXED mode here: the reference's undirected
    enc_idx branch references commented-out fields and crashes
    (perm_equiv_graph_vector_field.py:14-16,69-83 + SURVEY.md section 7.4);
    this implementation re-enables it with the semantics of those
    commented-out constructors and of the live Dir variant: a pairwise
    IdxEncoder embedding and per-edge MLPs modulating A(t) and dA(t). When
    ``enc_idx=False`` the encoder trio is absent, keeping parameter-count
    parity with the reference's models.
    """

    gnn_layers: list
    idx_enc: tp.Optional[IdxEncoder]
    msg_func_adj: tp.Optional[MLP]
    msg_func_adj_deriv: tp.Optional[MLP]
    data_embed_dim: int = static_field()
    num_nodes: int = static_field()
    enc_idx: bool = static_field()

    def __init__(
        self,
        input_dim: int,
        hidden_dim: int,
        output_dim: int,
        num_layers: int,
        data_embed_dim: int,
        num_nodes: int,
        enc_idx: bool = False,
        enc_type: str = "mlp",
        idx_dim: int = 512,
        *,
        key: jax.Array,
    ):
        self.gnn_layers, key = _make_stack(
            ConvEquivFusionLayer, input_dim, hidden_dim, output_dim, num_layers, key
        )
        self.data_embed_dim = data_embed_dim
        self.num_nodes = num_nodes
        self.enc_idx = enc_idx

        # Reference key choreography: the split happens unconditionally
        # (perm_equiv_graph_vector_field.py:66) even though the consumers are
        # commented out, so layer weights are unaffected either way.
        idx_enc_key, msg_func_adj_key, msg_func_adj_deriv_key = jr.split(key, 3)
        if enc_idx:
            self.idx_enc = IdxEncoder(num_nodes, idx_dim, key=idx_enc_key, type=enc_type)
            self.msg_func_adj = MLP(
                in_size=2 * idx_dim + 1, out_size=1, width_size=8, depth=2,
                key=msg_func_adj_key,
            )
            self.msg_func_adj_deriv = MLP(
                in_size=2 * idx_dim + 1, out_size=1, width_size=8, depth=2,
                key=msg_func_adj_deriv_key,
            )
        else:
            self.idx_enc = None
            self.msg_func_adj = None
            self.msg_func_adj_deriv = None

    fused_rk_step = _fused_rk_step_hook

    def __call__(self, t, y, args):
        node_features, control_adj = y, args

        from ... import ops as ops_config

        if _pallas_plane_dispatch_ok(control_adj):
            from ...ops.pallas import megakernel as _mk
            from ...ops.pallas import tiled as _tiled

            n = node_features.shape[0]
            path = control_adj.path
            if self.enc_idx:
                if n <= _tiled.TILED_MAX_N:
                    # Modulated planes through the Pallas pair surface (the
                    # Hermite factorisation doesn't survive the per-edge
                    # MLP, so the megakernel/tiled fast paths don't apply).
                    return _enc_idx_pallas_eval(
                        self, control_adj, t, node_features)
            elif n <= _mk.MEGAKERNEL_MAX_N:
                return _mk.megakernel_vf_eval(
                    tuple(path.coeffs), path.ts, t, node_features, self
                )
            elif n <= _tiled.TILED_MAX_N:
                # Whole-VMEM kernel doesn't fit: tiled grid kernel (serves
                # twitter n=1000, tgbn-genre n=1505, and beyond).
                return _tiled.tiled_vf_eval(
                    tuple(path.coeffs), path.ts, t, node_features, self,
                    red=getattr(control_adj, "red", None),
                )
            # Beyond the tiled cap: the layer dispatch below falls back to
            # the XLA dense path (or sparse, by control type).

        adj, adj_derivative, tgrad = control_terms(control_adj, t)
        if self.enc_idx:
            emb = self.idx_enc.node_embedding()
            adj = _modulate_matrix(adj, self.msg_func_adj, emb)
            adj_derivative = _modulate_matrix(
                adj_derivative, self.msg_func_adj_deriv, emb
            )
        out = _run_stack(self.gnn_layers, node_features, adj, adj_derivative)
        return _maybe_time_scale(tgrad, out)


class PermEquivDirGraphVectorField(Module):
    """Directed 11-term vf with optional node-index message modulation
    (perm_equiv_dir_graph_vector_field.py:10-130)."""

    gnn_layers: list
    idx_enc: IdxEncoder
    msg_func_adj: MLP
    msg_func_adj_deriv: MLP
    data_embed_dim: int = static_field()
    num_nodes: int = static_field()
    enc_idx: bool = static_field()

    def __init__(
        self,
        input_dim: int,
        hidden_dim: int,
        output_dim: int,
        num_layers: int,
        data_embed_dim: int,
        num_nodes: int,
        enc_idx: bool = False,
        enc_type: str = "mlp",
        idx_dim: int = 512,
        *,
        key: jax.Array,
    ):
        self.gnn_layers, key = _make_stack(
            ConvEquivFusionDirectedLayer,
            input_dim,
            hidden_dim,
            output_dim,
            num_layers,
            key,
        )
        self.data_embed_dim = data_embed_dim
        self.num_nodes = num_nodes
        self.enc_idx = enc_idx

        idx_enc_key, msg_func_adj_key, msg_func_adj_deriv_key = jr.split(key, 3)
        self.idx_enc = IdxEncoder(num_nodes, idx_dim, key=idx_enc_key, type=enc_type)
        self.msg_func_adj = MLP(
            in_size=2 * idx_dim + 1, out_size=1, width_size=8, depth=2,
            key=msg_func_adj_key,
        )
        self.msg_func_adj_deriv = MLP(
            in_size=2 * idx_dim + 1, out_size=1, width_size=8, depth=2,
            key=msg_func_adj_deriv_key,
        )

    fused_rk_step = _fused_rk_step_hook

    def _modulate(self, mat: jax.Array, mlp: MLP, emb: jax.Array) -> jax.Array:
        return _modulate_matrix(mat, mlp, emb)

    def __call__(self, t, y, args):
        node_features, control_adj = y, args

        from ... import ops as ops_config

        if _pallas_plane_dispatch_ok(control_adj):
            from ...ops.pallas import megakernel as _mk
            from ...ops.pallas import tiled as _tiled

            n = node_features.shape[0]
            path = control_adj.path
            if self.enc_idx:
                if n <= _tiled.TILED_MAX_N:
                    # The 4 enc_idx reference configs land here: modulated
                    # planes through the Pallas pair surface.
                    return _enc_idx_pallas_eval(
                        self, control_adj, t, node_features)
            elif n <= _mk.MEGAKERNEL_MAX_N:
                return _mk.megakernel_vf_eval(
                    tuple(path.coeffs), path.ts, t, node_features, self
                )
            elif n <= _tiled.TILED_MAX_N:
                # Directed 11-term basis shares the same tiled kernel: the
                # extra primed terms are all rank-structured (column sums),
                # handled in the O(n) XLA glue of tiled_vf_eval.
                return _tiled.tiled_vf_eval(
                    tuple(path.coeffs), path.ts, t, node_features, self,
                    red=getattr(control_adj, "red", None),
                )

        adj, adj_derivative, tgrad = control_terms(control_adj, t)

        if self.enc_idx:
            emb = self.idx_enc.node_embedding()
            adj = self._modulate(adj, self.msg_func_adj, emb)
            adj_derivative = self._modulate(
                adj_derivative, self.msg_func_adj_deriv, emb
            )

        out = _run_stack(self.gnn_layers, node_features, adj, adj_derivative)
        return _maybe_time_scale(tgrad, out)


class GraphVectorField(Module):
    """Message matrix = A(t) + dA(t) (graph_vector_field.py:95).

    ``enc_idx=True`` is a working FIXED mode (dead in the reference:
    commented-out fields at graph_vector_field.py:21-22,71-77 crash its
    enc_idx branch): one per-edge MLP modulates the combined message matrix,
    per the reference's own commented-out constructor shapes.
    """

    gnn_layers: list
    idx_enc: tp.Optional[IdxEncoder]
    msg_func: tp.Optional[MLP]
    data_embed_dim: int = static_field()
    num_nodes: int = static_field()
    enc_idx: bool = static_field()

    def __init__(
        self,
        input_dim: int,
        hidden_dim: int,
        output_dim: int,
        num_layers: int,
        data_embed_dim: int,
        num_nodes: int,
        enc_idx: bool = False,
        enc_type: str = "mlp",
        idx_dim: int = 512,
        *,
        key: jax.Array,
    ):
        self.gnn_layers, key = _make_stack(
            ConvLayer, input_dim, hidden_dim, output_dim, num_layers, key
        )
        self.data_embed_dim = data_embed_dim
        self.num_nodes = num_nodes
        self.enc_idx = enc_idx

        # Reference splits these keys unconditionally (graph_vector_field.py:69).
        idx_enc_key, msg_func_key = jr.split(key, 2)
        if enc_idx:
            self.idx_enc = IdxEncoder(num_nodes, idx_dim, key=idx_enc_key, type=enc_type)
            self.msg_func = MLP(
                in_size=2 * idx_dim + 1, out_size=1, width_size=8, depth=2,
                key=msg_func_key,
            )
        else:
            self.idx_enc = None
            self.msg_func = None

    def __call__(self, t, y, args):
        node_features, control_adj = y, args
        adj, dadj, tgrad = control_terms(control_adj, t)
        from ...ops.sparse import ELL

        if isinstance(adj, ELL):
            message = adj.combine(dadj)  # shared pattern: values add
        else:
            message = adj + dadj
        if self.enc_idx:
            emb = self.idx_enc.node_embedding()
            message = _modulate_matrix(message, self.msg_func, emb)
        out = _run_stack(self.gnn_layers, node_features, message)
        return _maybe_time_scale(tgrad, out)


class GNODEVectorField(Module):
    """Message matrix = A(t) only (gnode_vector_field.py:72)."""

    gnn_layers: list

    def __init__(
        self,
        input_dim: int,
        hidden_dim: int,
        output_dim: int,
        data_embed_dim: int,
        num_nodes: int,
        num_layers: int,
        *,
        key: jax.Array,
    ):
        self.gnn_layers, key = _make_stack(
            ConvLayer, input_dim, hidden_dim, output_dim, num_layers, key
        )

    def __call__(self, t, y, args):
        node_features, control_adj = y, args
        adj, _, tgrad = control_terms(control_adj, t)
        out = _run_stack(self.gnn_layers, node_features, adj)
        return _maybe_time_scale(tgrad, out)


class GNODEFloorVectorField(Module):
    """Piecewise-constant adjacency indexed by event time
    (gnode_floor_vector_field.py:149-165)."""

    gnn_layers: list

    def __init__(
        self,
        input_dim: int,
        hidden_dim: int,
        output_dim: int,
        num_layers: int,
        *,
        key: jax.Array,
    ):
        self.gnn_layers, key = _make_stack(
            ConvLayer, input_dim, hidden_dim, output_dim, num_layers, key
        )

    def __call__(self, t, y, args):
        node_features = y
        if len(args) == 3:
            control_adj, adjacency_list, events_time = args
            index = jnp.searchsorted(events_time, t, side="right") - 1
            index = jnp.clip(index, 0, events_time.shape[0] - 1)
        elif len(args) == 2:
            control_adj, adjacency_list = args
            index = jnp.asarray(jnp.floor(t), jnp.int32)
        else:
            raise ValueError("Invalid number of arguments")

        if getattr(control_adj, "tgrad_is_unit", False):
            tgrad = None
        else:
            tgrad = control_adj.derivative(t)[..., 0]
        message = adjacency_list[index]
        out = _run_stack(self.gnn_layers, node_features, message)
        return _maybe_time_scale(tgrad, out)


class PreMultFusionGraphVectorField(Module):
    """Dense premultiplication-fusion ablation
    (pre_mult_fusion_graph_vector_field.py)."""

    gnn_layers: list
    data_embed_dim: int = static_field()

    def __init__(
        self,
        input_dim: int,
        hidden_dim: int,
        output_dim: int,
        data_embed_dim: int,
        num_layers: int,
        num_nodes: int = 400,
        *,
        key: jax.Array,
    ):
        self.data_embed_dim = data_embed_dim
        # Reference hardcodes 400x400 fusion matrices regardless of num_nodes
        # (layers.py:390-391); honour num_nodes when given, else 400.
        nn_ = num_nodes if num_nodes and num_nodes > 0 else 400
        self.gnn_layers, key = _make_stack(
            ConvPreMultFusionLayer,
            input_dim,
            hidden_dim,
            output_dim,
            num_layers,
            key,
            num_nodes=nn_,
        )

    def __call__(self, t, y, args):
        node_features, control_adj = y, args
        adj, dadj, tgrad = control_terms(control_adj, t)
        out = _run_stack(self.gnn_layers, node_features, adj, dadj)
        return _maybe_time_scale(tgrad, out)


class MLPVectorField(Module):
    """Per-node MLP over [y, t] (mlp_vector_field.py)."""

    mlp: MLP

    def __init__(
        self,
        input_dim: int,
        hidden_dim: int,
        output_dim: int,
        num_layers: int,
        *,
        key: jax.Array,
        **_,
    ):
        self.mlp = MLP(
            in_size=input_dim + 1,
            out_size=output_dim,
            width_size=hidden_dim,
            depth=num_layers,
            activation="relu",
            key=key,
        )

    def __call__(self, t, y, args):
        t_col = jnp.broadcast_to(jnp.asarray(t), (y.shape[0],))[:, None]
        y = jnp.concatenate([y, t_col], axis=-1)
        return jax.vmap(self.mlp)(y)


class ConstVectorField(Module):
    """Learnable constant drift (const_vector_field.py) -- sanity baseline."""

    bias: jax.Array
    data_embed_dim: int = static_field()
    num_nodes: int = static_field()

    def __init__(
        self,
        input_dim: int,
        hidden_dim: int,
        output_dim: int,
        num_layers: int,
        data_embed_dim: int,
        num_nodes: int,
        *,
        key: jax.Array,
    ):
        self.bias = jr.uniform(key, (output_dim,), minval=-1.0, maxval=1.0)
        self.data_embed_dim = data_embed_dim
        self.num_nodes = num_nodes

    def __call__(self, t, y, args):
        return jnp.broadcast_to(self.bias, y.shape)
