from .paths import (
    LinearInterpolation,
    CubicInterpolation,
    linear_interpolation,
    backward_hermite_coefficients,
    fill_nan_linear,
)
