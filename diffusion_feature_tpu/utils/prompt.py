"""Chunked long-prompt encoding — the reference's community workaround for
the 77-token CLIP limit (feature/components/encode_long_prompt.py:5-40),
triggered for prompts >70 words (diffusion_feature.py:165-171).

Tokenize without truncation, pad prompt/negative to a common length, encode in
max_length-sized chunks, concat along the sequence axis.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rescale_noise_cfg(noise_cfg, noise_pred_text, guidance_rescale: float = 0.0):
    """Rescale CFG output per Lin et al. "Common Diffusion Noise Schedules
    and Sample Steps are Flawed" §3.4 — parity with the reference's
    (main-path-unused) helper ``_rescale_noise_cfg``
    (feature/diffusion_feature.py:576-587)."""
    axes = tuple(range(1, noise_pred_text.ndim))
    std_text = jnp.std(noise_pred_text, axis=axes, keepdims=True)
    std_cfg = jnp.std(noise_cfg, axis=axes, keepdims=True)
    rescaled = noise_cfg * (std_text / std_cfg)
    return guidance_rescale * rescaled + (1 - guidance_rescale) * noise_cfg


def encode_long_prompt(extractor, prompt: str, negative_prompt: str = ''):
    tok = extractor.tokenizers[0]
    te = extractor.text_encoders[0]
    params = extractor.params['text'][0]
    max_length = tok.model_max_length

    ids = tok.encode(prompt)
    nids = tok.encode(negative_prompt)
    ids = [tok.bos_token_id] + ids + [tok.eos_token_id]
    nids = [tok.bos_token_id] + nids + [tok.eos_token_id]
    target = max(len(ids), len(nids))
    # round up to a multiple of max_length
    target = ((target + max_length - 1) // max_length) * max_length
    ids = ids + [tok.pad_token_id] * (target - len(ids))
    nids = nids + [tok.pad_token_id] * (target - len(nids))

    chunks, nchunks = [], []
    for i in range(0, target, max_length):
        a = jnp.asarray([ids[i:i + max_length]], jnp.int32)
        b = jnp.asarray([nids[i:i + max_length]], jnp.int32)
        last, _, _ = te.apply({'params': params}, a)
        nlast, _, _ = te.apply({'params': params}, b)
        chunks.append(last)
        nchunks.append(nlast)
    return (jnp.concatenate(chunks, axis=1),
            jnp.concatenate(nchunks, axis=1))
