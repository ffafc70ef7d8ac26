"""Graph operator library.

Backend selection for the equivariant fusion operator:
  * "auto"       -- (default) "megakernel" on TPU, "dense" elsewhere,
                    resolved lazily on first use so importing the package
                    never spins up a device backend.
  * "megakernel" -- whole-VMEM Pallas kernel fusing coefficient evaluation +
                    the full undirected vf layer stack (ops/pallas/
                    megakernel.py). The production TPU path: 2.7x over the
                    XLA dense-bf16 path at reference scale (v5e, see
                    PERFORMANCE.md). Applies at the vector-field level for
                    undirected perm-equiv fields with a slim cubic control
                    and n <= MEGAKERNEL_MAX_N; every other shape falls back
                    to "dense" inside the layer dispatch.
  * "dense"      -- reference-algorithm formulation; XLA fuses the 8/11 basis
                    terms into the single matmul's operand. The CPU/debug
                    default, the oracle anchor, and the fastest XLA-only TPU
                    path (with precision "bf16").
  * "decomposed" -- rank-structured 2-matmul path (equiv_basis.fused_apply).
                    The building block for the sparse/edge-partitioned scaled
                    regime where A_bar cannot be materialised.
  * (sparse)     -- ELL sparse message passing (ops/sparse.py) is NOT a
                    backend name: it dispatches by control type. Build an
                    interp.SparseMatrixControl (dyn trainer knob
                    ``sparse_control: true``) and every fusion layer routes
                    to sparse_fused_apply automatically. Memory-feasibility
                    path for scaled n (PERFORMANCE.md: dense bf16 wins on
                    speed while its coefficient planes fit HBM).
  * "pipeline"   -- streamed fixed-tile Pallas kernel (ops/pallas/
                    pipeline.py). Measured slower than XLA dense-bf16 on v5e
                    at both n=400 and n=2048 (benchmarks/pipeline_micro.py);
                    kept as a comparison point.
  * "pallas"     -- whole-block Pallas kernel over the decomposition
                    (superseded; kept for comparison).
"""

from . import equiv_basis

_BACKEND = "auto"
_VALID = ("auto", "pipeline", "dense", "decomposed", "sparse", "pallas", "megakernel")
_PRECISION = "f32"
_VALID_PRECISION = ("f32", "bf16")
_AUTO_RESOLVED: str | None = None


def set_fusion_backend(name: str) -> None:
    global _BACKEND
    if name not in _VALID:
        raise ValueError(f"backend must be one of {_VALID}")
    _BACKEND = name


def get_fusion_backend() -> str:
    global _AUTO_RESOLVED
    if _BACKEND != "auto":
        return _BACKEND
    if _AUTO_RESOLVED is None:
        import jax

        _AUTO_RESOLVED = "megakernel" if jax.default_backend() == "tpu" else "dense"
    return _AUTO_RESOLVED


def set_fusion_precision(name: str) -> None:
    """"bf16" runs the fused basis operator and its matmul in bfloat16 with
    f32 accumulation: ~1.3x on v5e with ~3e-3 relative error -- safe at the
    reference's rtol=1e-3 training tolerance, keep "f32" for tight-tolerance
    studies."""
    global _PRECISION
    if name not in _VALID_PRECISION:
        raise ValueError(f"precision must be one of {_VALID_PRECISION}")
    _PRECISION = name


def get_fusion_precision() -> str:
    return _PRECISION


_FUSED_STEP = False


def set_fused_step(enabled: bool) -> None:
    """Enable the fused RK-step kernel (ops/pallas/fused_step.py): one
    pallas_call per explicit FSAL solver step when the megakernel backend
    serves the vector field.

    DEFAULT OFF -- a documented negative (PERFORMANCE.md round-5 item-6
    section): the step kernel wins the chained microbenchmark (1.10x,
    benchmarks/mk_probe7.py, reproduced 3x) but is performance-neutral on
    the production fixed-step solve and ~4% slower on the adaptive train
    step on v5e, because XLA already overlaps the per-eval kernels'
    launch/DMA with the solver glue that the monolithic kernel serialises.
    The path stays fully tested (tests/test_fused_step.py: value + gradient
    parity incl. a zero-recompute manual RK chain-rule backward) for
    environments where per-call overhead dominates."""
    global _FUSED_STEP
    _FUSED_STEP = bool(enabled)


def get_fused_step() -> bool:
    return _FUSED_STEP
