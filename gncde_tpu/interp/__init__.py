from .paths import (
    LinearInterpolation,
    CubicInterpolation,
    MatrixControl,
    linear_interpolation,
    backward_hermite_coefficients,
    fill_nan_linear,
)
