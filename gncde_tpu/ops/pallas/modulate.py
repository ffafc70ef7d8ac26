"""Fused Pallas kernel for enc_idx per-edge MLP modulation of (A, dA).

The enc_idx configs modulate A(t) and dA(t) entrywise with a small MLP over
``concat([X_ij, emb_i, emb_j])`` (reference
perm_equiv_dir_graph_vector_field.py:185-199). The first layer is affine in
the concat, so its pairwise part reduces to two per-node projections
``Ei = emb @ W1_i^T``, ``Ej = emb @ W1_j^T`` (computed once in XLA -- MXU
matmuls); everything after is strictly pointwise with a tiny width (the
reference ships w=8, depth=2, relu). The XLA formulation of that pointwise
tail walks ~6 (w, n, n) f32 intermediates through HBM per plane; this kernel
evaluates BOTH planes' full MLP chains in one tile sweep with everything in
registers:

    per (TM, TK) tile:  read A, dA (+ 4 tiny Ei/Ej slices)
      z_c = wa_c * X + Ei[:, c] + Ej[c, :]          (lane/sublane broadcasts)
      relu -> (depth-1) x unrolled w x w FMA mixes -> w-FMA output head
      write modulated A, dA (bf16 or f32)

HBM traffic = one read of the 2 input planes + one write of the 2 outputs --
the floor for this operator. Channel count w is a compile-time constant and
the channel loops are fully unrolled (w=8: ~110 VPU ops/element/plane).

The training backward recomputes through the decomposed XLA path
(fields._modulate_matrix) -- see fields.fused_modulate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _should_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _mlp_tail(X, Ei_t, Ej_t, wa_ref, hw_ref, hb_ref, ow_ref, ob_ref,
              w: int, depth: int):
    """Pointwise MLP over one plane tile. X: (TM, TK) f32; Ei_t: (TM, w)
    with b1 folded in; Ej_t: (w, TK). Channel loops unrolled (w static)."""
    r = []
    for c in range(w):
        z = wa_ref[0, c] * X + Ei_t[:, c][:, None] + Ej_t[c, :][None, :]
        r.append(jnp.maximum(z, 0.0))
    for l in range(depth - 1):
        h = []
        for v in range(w):
            acc = jnp.full_like(X, hb_ref[l, v])
            for c in range(w):
                acc += hw_ref[l, v * w + c] * r[c]
            h.append(jnp.maximum(acc, 0.0))
        r = h
    out = jnp.full_like(X, ob_ref[0, 0])
    for c in range(w):
        out += ow_ref[0, c] * r[c]
    return out


def _mod_kernel(w, depth, nr, nc, TM, TK, ragged, out_dtype,
                wa_a_ref, hw_a_ref, hb_a_ref, ow_a_ref, ob_a_ref,
                wa_d_ref, hw_d_ref, hb_d_ref, ow_d_ref, ob_d_ref,
                A_ref, dA_ref, EiA_ref, EjA_ref, EiD_ref, EjD_ref,
                outA_ref, outD_ref):
    A = A_ref[:].astype(jnp.float32)
    dA = dA_ref[:].astype(jnp.float32)
    oA = _mlp_tail(A, EiA_ref[:], EjA_ref[:],
                   wa_a_ref, hw_a_ref, hb_a_ref, ow_a_ref, ob_a_ref,
                   w, depth)
    oD = _mlp_tail(dA, EiD_ref[:], EjD_ref[:],
                   wa_d_ref, hw_d_ref, hb_d_ref, ow_d_ref, ob_d_ref,
                   w, depth)
    if ragged:
        ii = pl.program_id(0)
        kk = pl.program_id(1)
        rows_ok = (jax.lax.broadcasted_iota(jnp.int32, (TM, TK), 0)
                   + ii * TM) < nr
        cols_ok = (jax.lax.broadcasted_iota(jnp.int32, (TM, TK), 1)
                   + kk * TK) < nc
        valid = rows_ok & cols_ok
        oA = jnp.where(valid, oA, 0.0)
        oD = jnp.where(valid, oD, 0.0)
    outA_ref[:] = oA.astype(out_dtype)
    outD_ref[:] = oD.astype(out_dtype)


def _mlp_scalars(mlp):
    """(wa (1, w), hw (depth-1, w*w), hb (depth-1, w), ow (1, w), ob (1, 1))
    SMEM payloads for one modulation MLP (layers: 2d+1 -> w, (w -> w)
    x(depth-1), w -> 1). Zero-filled biases when absent."""
    w = mlp.width_size
    depth = mlp.depth
    first = mlp.layers[0]
    wa = first.weight[:, 0].reshape(1, w)
    hidden = mlp.layers[1:-1]
    if hidden:
        hw = jnp.stack([l.weight.reshape(-1) for l in hidden])
        hb = jnp.stack([
            l.bias if l.bias is not None else jnp.zeros((w,), jnp.float32)
            for l in hidden
        ])
    else:
        # Dummy row (never read: the kernel's hidden loop runs depth-1
        # times); avoids zero-size SMEM operands.
        hw = jnp.zeros((1, w * w), jnp.float32)
        hb = jnp.zeros((1, w), jnp.float32)
    last = mlp.layers[-1]
    ow = last.weight.reshape(1, w)
    ob = (last.bias if last.bias is not None
          else jnp.zeros((1,), jnp.float32)).reshape(1, 1)
    return (wa.astype(jnp.float32), hw.astype(jnp.float32),
            hb.astype(jnp.float32), ow.astype(jnp.float32),
            ob.astype(jnp.float32))


def _edge_projections(mlp, emb):
    """Per-node first-layer projections: Ei (n, w) with the first-layer bias
    folded in, Ej (w, n) pre-transposed (lane-aligned row reads in-kernel).
    One pair of (n, idx_dim) @ (idx_dim, w) MXU matmuls."""
    W1 = mlp.layers[0].weight  # (w, 2 d + 1), columns [x | emb_i | emb_j]
    b1 = mlp.layers[0].bias
    d = emb.shape[1]
    hp = jax.lax.Precision.HIGHEST
    Ei = jnp.einsum("nd,wd->nw", emb, W1[:, 1:1 + d], precision=hp)
    Ej = jnp.einsum("nd,wd->wn", emb, W1[:, 1 + d:], precision=hp)
    if b1 is not None:
        Ei = Ei + b1[None, :]
    return Ei.astype(jnp.float32), Ej.astype(jnp.float32)


def modulate_supported(mlp) -> bool:
    """The kernel covers the reference configuration family: relu hidden
    activations, identity final activation, depth >= 1."""
    return (mlp.activation == "relu"
            and mlp.final_activation == "identity"
            and mlp.depth >= 1 and mlp.width_size <= 32)


def modulate_pair(A, dA, mlp_a, mlp_d, emb, *, tile: int = 256,
                  out_dtype=jnp.float32, pad_to: int = 0):
    """Fused forward: (A_m, dA_m) = entrywise-MLP(A; emb), (dA; emb).

    A/dA: (nr, nc) planes (any float dtype; the MLP runs in f32). Returns
    planes padded to tile multiples (rows/cols >= nr/nc are zero) in
    ``out_dtype`` -- callers feeding :func:`tiled_vf_eval_planes` keep the
    padding (it expects padded planes anyway) or slice [:nr, :nc].
    ``pad_to`` (a tile multiple >= the natural padded size) grows the output
    to a downstream consumer's grid while the KERNEL tile stays small -- the
    unrolled MLP keeps ~2(w + 3) live (TM, TK) registers, so a 512 tile
    blows scoped VMEM where 256 fits.
    FORWARD ONLY -- differentiate through fields.fused_modulate, whose
    custom VJP recomputes via the decomposed XLA path.
    """
    nr, nc = A.shape
    w = mlp_a.width_size
    depth = mlp_a.depth
    TM = TK = tile
    NPr = NPc = max(pad_to, _cdiv(max(nr, nc), tile) * tile)
    if NPr % tile != 0:
        raise ValueError(f"pad_to={pad_to} must be a multiple of tile={tile}")
    I, K = NPr // TM, NPc // TK
    ragged = (NPr != nr) or (NPc != nc)

    EiA, EjA = _edge_projections(mlp_a, emb)
    EiD, EjD = _edge_projections(mlp_d, emb)
    if NPr != nr:
        EiA = jnp.zeros((NPr, w), jnp.float32).at[:nr].set(EiA)
        EiD = jnp.zeros((NPr, w), jnp.float32).at[:nr].set(EiD)
    if NPc != nc:
        EjA = jnp.zeros((w, NPc), jnp.float32).at[:, :nc].set(EjA)
        EjD = jnp.zeros((w, NPc), jnp.float32).at[:, :nc].set(EjD)

    kern = functools.partial(_mod_kernel, w, depth, nr, nc, TM, TK, ragged,
                             out_dtype)
    plane_spec = pl.BlockSpec((TM, TK), lambda i, k: (i, k),
                              memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    ei_spec = pl.BlockSpec((TM, w), lambda i, k: (i, 0),
                           memory_space=pltpu.VMEM)
    ej_spec = pl.BlockSpec((w, TK), lambda i, k: (0, k),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((TM, TK), lambda i, k: (i, k),
                            memory_space=pltpu.VMEM)
    scal_a = _mlp_scalars(mlp_a)
    scal_d = _mlp_scalars(mlp_d)
    return pl.pallas_call(
        kern,
        grid=(I, K),
        in_specs=[smem] * 10 + [plane_spec, plane_spec,
                                ei_spec, ej_spec, ei_spec, ej_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((NPr, NPc), out_dtype),
            jax.ShapeDtypeStruct((NPr, NPc), out_dtype),
        ],
        interpret=_should_interpret(),
    )(*scal_a, *scal_d, A, dA, EiA, EjA, EiD, EjD)
