from .paths import (
    LinearInterpolation,
    CubicInterpolation,
    MatrixControl,
    linear_interpolation,
    backward_hermite_coefficients,
    fill_nan_linear,
)
from .sparse_paths import (
    SparseMatrixControl,
    SparseCubicMatrixPath,
    SparseLinearMatrixPath,
    union_ell_pattern,
)
from .bcsr_paths import (
    BCSRMatrixControl,
    BCSRCubicMatrixPath,
    BCSRLinearMatrixPath,
    bcsr_control_from_edge_snapshots,
    build_sparse_control,
)
