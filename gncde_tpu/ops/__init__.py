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
_VALID = ("dense", "decomposed", "pallas")


def set_fusion_backend(name: str) -> None:
    global _BACKEND
    if name not in _VALID:
        raise ValueError(f"backend must be one of {_VALID}")
    _BACKEND = name


def get_fusion_backend() -> str:
    return _BACKEND
