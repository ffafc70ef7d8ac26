"""gncde_tpu: TPU-native permutation-equivariant graph neural CDE framework.

See README.md for the architecture overview and SURVEY_MAPPING.md for the
component-by-component mapping to the reference repo.
"""

__version__ = "0.1.0"
