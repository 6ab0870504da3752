"""diffusion_feature_tpu — a TPU-native (JAX/Flax/Pallas) rebuild of the
generic-diffusion-feature framework (NeurIPS'24, arXiv 2410.03558).

Public API mirrors the reference's installable ``diffusion_feature`` package
(reference: feature/diffusion_feature.py): ``FeatureExtractor`` is the facade.
"""

__version__ = '0.1.0'

import os as _os


def _enable_persistent_compilation_cache():
    """XLA programs here are large (a full diffusion forward per extract
    config) and recompile per process; the persistent cache makes repeated
    CLI invocations and TPU cold starts near-instant.  Opt out with
    DFT_NO_COMPILE_CACHE=1 or point elsewhere with JAX_COMPILATION_CACHE_DIR.
    """
    if _os.environ.get('DFT_NO_COMPILE_CACHE'):
        return
    try:
        import jax
        # some PJRT plugins (e.g. tunneled TPUs) register themselves even
        # when JAX_PLATFORMS says otherwise; enforce the user's choice
        plat = _os.environ.get('JAX_PLATFORMS')
        if plat:
            jax.config.update('jax_platforms', plat)
        cache_dir = _os.environ.get(
            'JAX_COMPILATION_CACHE_DIR',
            _os.path.join(_os.path.expanduser('~'), '.cache',
                          'diffusion_feature_tpu', 'jax_cache'))
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    except Exception:           # cache is an optimization, never a hard dep
        pass


_enable_persistent_compilation_cache()

from .taps import TapSpec  # noqa: E402,F401
from .facade import FeatureExtractor  # noqa: E402,F401
