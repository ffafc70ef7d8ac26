"""Graph operator library.

Backend selection for the equivariant fusion operator:
  * "dense"      -- reference-algorithm formulation; XLA fuses the 8/11 basis
                    terms into the single matmul's operand. Fastest for the
                    dense small/medium-n regime (measured on v5e: ~4x faster
                    than the 2-matmul decomposition at n=400).
  * "decomposed" -- rank-structured 2-matmul path (equiv_basis.fused_apply).
                    The building block for the sparse/edge-partitioned scaled
                    regime where A_bar cannot be materialised.
  * "pallas"     -- hand-fused Pallas TPU kernel over the decomposition.
"""

from . import equiv_basis

_BACKEND = "dense"
_VALID = ("dense", "decomposed", "pallas", "megakernel")
_PRECISION = "f32"
_VALID_PRECISION = ("f32", "bf16")


def set_fusion_backend(name: str) -> None:
    global _BACKEND
    if name not in _VALID:
        raise ValueError(f"backend must be one of {_VALID}")
    _BACKEND = name


def get_fusion_backend() -> str:
    return _BACKEND


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
