"""diffusion_feature_tpu — a TPU-native (JAX/Flax/Pallas) rebuild of the
generic-diffusion-feature framework (NeurIPS'24, arXiv 2410.03558).

Public API mirrors the reference's installable ``diffusion_feature`` package
(reference: feature/diffusion_feature.py): ``FeatureExtractor`` is the facade.
"""

__version__ = '0.1.0'

from .taps import TapSpec
from .facade import FeatureExtractor  # noqa: E402,F401
