"""Graph operator library.

Backend selection for the equivariant fusion operator:
  * "auto"       -- (default) "pipeline" on TPU, "dense" elsewhere, resolved
                    lazily on first use so importing the package never spins
                    up a device backend.
  * "pipeline"   -- streamed tiled Pallas kernel (ops/pallas/pipeline.py):
                    one pass over (A, dA) per layer computes the row- and
                    transpose-matmul families plus the rank-structured
                    epilogues; fixed tile shapes so Mosaic compile time is
                    n-independent. The production TPU path.
  * "dense"      -- reference-algorithm formulation; XLA fuses the 8/11 basis
                    terms into the single matmul's operand. The CPU/debug
                    default and the oracle anchor.
  * "decomposed" -- rank-structured 2-matmul path (equiv_basis.fused_apply).
                    The building block for the sparse/edge-partitioned scaled
                    regime where A_bar cannot be materialised.
  * "sparse"     -- ELL sparse message passing (ops/sparse.py) for scaled-n
                    graphs; requires a sparse control path (interp.SparseMatrixControl).
  * "pallas"     -- whole-block Pallas kernel over the decomposition
                    (superseded by "pipeline"; kept for comparison).
  * "megakernel" -- experimental whole-VMEM single-kernel vf evaluation.
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

        _AUTO_RESOLVED = "pipeline" if jax.default_backend() == "tpu" else "dense"
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
