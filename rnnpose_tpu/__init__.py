"""rnnpose_tpu: TPU-native recurrent 6-DoF object pose refinement.

See README.md for the architecture and PARITY.md for the reference mapping.
"""

__version__ = "0.1.0"
