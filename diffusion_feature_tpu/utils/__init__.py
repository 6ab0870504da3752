import jax
import jax.numpy as jnp


def normal_like(rng, shape, dtype):
    """Gaussian noise drawn at fp32 and cast to the serving dtype.

    jax.random.normal(key, ..., bfloat16) produces a DIFFERENT pseudo-random
    sequence than the fp32 draw of the same key, so drawing at the model
    dtype would make bf16 extraction see a different noise *realization*
    than fp32 — dtype fidelity would be unmeasurable end-to-end and a seed
    would not reproduce across serving dtypes.  Drawing fp32-then-cast
    matches torch semantics (half-precision normal_ fills via float) and
    keeps the realization identical across fp32/bf16/fp16/int8 paths.
    Lives here (leaf module) so facade.py and models/vae.py share ONE copy
    of the invariant.
    """
    return jax.random.normal(rng, shape, jnp.float32).astype(dtype)
