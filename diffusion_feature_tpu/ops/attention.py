"""Attention ops with optional score-map export.

The reference exports q·k score maps by replacing fused SDPA with an explicit
softmax(QK^T)V (reference: feature/components/attention.py:232-247 and
my_scaled_dot_product_attention at :265-292) — materializing the full
(B·H, Sq, Sk) probability matrix in HBM.  Here the *default* path never
materializes scores (XLA fuses the softmax into the matmul chain, and a Pallas
flash kernel covers the largest shapes); the explicit path is only selected
when a ``*-map`` tap or the facade-level attention store needs the scores.

All functions take q/k/v in the reference's pre-head-split layout (B, S, inner)
so the q/k/v taps observe identical tensors
(feature/diffusers/models/attention_processor.py:1128-1131).
"""

from __future__ import annotations

from typing import Optional, Tuple

import functools

import jax
import jax.numpy as jnp


def split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    """(B, S, H*D) -> (B, H, S, D)."""
    b, s, inner = x.shape
    return x.reshape(b, s, heads, inner // heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, S, D) -> (B, S, H*D)."""
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def attention_with_probs(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    *,
    scale: Optional[float] = None,
    mask: Optional[jnp.ndarray] = None,
    upcast: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Explicit attention returning (out (B,Sq,inner), probs (B,H,Sq,Sk)).

    Matches torch ``Attention.get_attention_scores`` + ``bmm`` numerics:
    softmax over the key axis, optional fp32 upcast (SD-2.1's
    ``upcast_attention``), probabilities cast back to the value dtype before
    the PV matmul.
    """
    dtype = q.dtype
    d = q.shape[-1] // heads
    scale = d ** -0.5 if scale is None else scale
    qh, kh, vh = split_heads(q, heads), split_heads(k, heads), split_heads(v, heads)
    if upcast:
        qh, kh = qh.astype(jnp.float32), kh.astype(jnp.float32)
    scores = jnp.einsum('bhqd,bhkd->bhqk', qh, kh,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
    out = jnp.einsum('bhqk,bhkd->bhqd', probs, vh,
                     preferred_element_type=jnp.float32).astype(dtype)
    return merge_heads(out), probs


def attention_with_probs_heads(
    qh: jnp.ndarray,
    kh: jnp.ndarray,
    vh: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Explicit attention on pre-split heads (B,H,S,D) returning
    (out (B,H,Sq,D), probs (B,H,Sq,Sk)).  For RoPE-family models (Flux /
    Hunyuan) whose q/k are modified after the head split."""
    dtype = qh.dtype
    scale = qh.shape[-1] ** -0.5 if scale is None else scale
    scores = jnp.einsum('bhqd,bhkd->bhqk', qh, kh,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
    out = jnp.einsum('bhqk,bhkd->bhqd', probs, vh,
                     preferred_element_type=jnp.float32).astype(dtype)
    return out, probs


def attention_fused_heads(
    qh: jnp.ndarray,
    kh: jnp.ndarray,
    vh: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fast-path attention on pre-split heads (B,H,S,D): Pallas flash kernel
    when compatible, fused XLA softmax otherwise."""
    dtype = qh.dtype
    scale = qh.shape[-1] ** -0.5 if scale is None else scale
    if mask is None:
        try:
            from .flash_attention import flash_attention, is_flash_compatible
            if is_flash_compatible(qh.shape, kh.shape):
                return flash_attention(qh, kh, vh, scale=scale).astype(dtype)
        except ImportError:
            pass
    out, _ = attention_with_probs_heads(qh, kh, vh, scale=scale, mask=mask)
    return out


def _headmean_explicit(qh, kh, vh, scale):
    out, probs = attention_with_probs_heads(qh, kh, vh, scale=scale)
    return out, probs.mean(axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _headmean_kernel_path(qh, kh, vh, scale):
    from .flash_attention import flash_attention_with_lse, headmean_probs
    out, lse = flash_attention_with_lse(qh, kh, vh, scale=scale)
    mean_p = headmean_probs(qh, kh, lse, scale=scale)
    return out, mean_p.astype(qh.dtype)


def _headmean_fwd(qh, kh, vh, scale):
    return _headmean_kernel_path(qh, kh, vh, scale), (qh, kh, vh)


def _headmean_bwd(scale, res, g):
    qh, kh, vh = res
    _, vjp = jax.vjp(lambda a, b, c: _headmean_explicit(a, b, c, scale),
                     qh, kh, vh)
    return vjp(g)


_headmean_kernel_path.defvjp(_headmean_fwd, _headmean_bwd)


def attention_with_headmean_heads(
    qh: jnp.ndarray,
    kh: jnp.ndarray,
    vh: jnp.ndarray,
    *,
    scale: Optional[float] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Attention + HEAD-MEAN probabilities: (out (B,H,Sq,D),
    mean_probs (B,Sq,Sk)).

    This is the attention-store path (facade ``attention=...``): the
    reference materializes per-head (B,H,Sq,Sk) scores and then means them
    (components/attention.py:238-242) — 1.3 GiB per SDXL-1024 self-attention
    layer.  On TPU the Pallas pair (flash_attention_with_lse +
    headmean_probs) streams score tiles and only the O(Sq·Sk) mean ever
    touches HBM."""
    scale = qh.shape[-1] ** -0.5 if scale is None else scale
    try:
        from .flash_attention import is_flash_compatible
        if is_flash_compatible(qh.shape, kh.shape, min_seq=512):
            return _headmean_kernel_path(qh, kh, vh, scale)
    except ImportError:
        pass
    return _headmean_explicit(qh, kh, vh, scale)


def attention_fused(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    *,
    scale: Optional[float] = None,
    mask: Optional[jnp.ndarray] = None,
    upcast: bool = False,
) -> jnp.ndarray:
    """Fast path: no score materialization.  Uses the Pallas TPU flash kernel
    for large, tile-aligned shapes and XLA einsum-softmax otherwise (XLA
    fuses the latter well at SD sizes)."""
    d = q.shape[-1] // heads
    scale = d ** -0.5 if scale is None else scale
    dtype = q.dtype
    qh, kh, vh = split_heads(q, heads), split_heads(k, heads), split_heads(v, heads)
    if mask is None:
        try:
            from .flash_attention import flash_attention, is_flash_compatible
            if is_flash_compatible(qh.shape, kh.shape):
                out = flash_attention(qh, kh, vh, scale=scale)
                return merge_heads(out.astype(dtype))
        except ImportError:
            pass
    if upcast:
        qh, kh = qh.astype(jnp.float32), kh.astype(jnp.float32)
    scores = jnp.einsum('bhqd,bhkd->bhqk', qh, kh,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
    out = jnp.einsum('bhqk,bhkd->bhqd', probs, vh,
                     preferred_element_type=jnp.float32).astype(dtype)
    return merge_heads(out)
