"""Pallas TPU flash attention (forward, non-causal, no mask).

Online-softmax blockwise attention: never materializes the (Sq, Sk) score
matrix in HBM.  This replaces the reference's explicit
``softmax(QK^T)V`` GPU path (feature/components/attention.py:265-292) for the
shapes where materialization is prohibitive — SDXL@1024 level-0 self-attention
is 16384 tokens, i.e. a 10-GiB fp32 score tensor per image that the reference
only avoids by leaning on xformers (SURVEY §5 long-context note).

Layout: q, k, v are (B, H, S, D).  D is zero-padded to a multiple of 128
(lane width); zero-padded key columns contribute zero logits and zero value
rows, so results are exact.  Softmax/accumulation run in fp32 on the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_K = 1024
_LANE = 128
NEG_INF = -1e30


def _pick_block(seq: int, preferred: int) -> int:
    """Largest 256-multiple block <= preferred that divides ``seq``
    (is_flash_compatible guarantees seq % 256 == 0)."""
    b = min(preferred, seq)
    while b > 256 and seq % b != 0:
        b -= 256
    return b


def _clamp_blocks_for_width(d: int, block_q: int, block_k: int):
    """Shrink blocks for wide heads (d > 256, the VAE's single-head d=512):
    at d_pad=512 a 1024-row fp32 block is 2 MiB per operand, and with
    Mosaic's double-buffered q/k/v inputs + the output accumulator + the
    (bq, bk) probs tile the working set overruns v5e VMEM (16 MiB).
    512-row blocks keep it ~9 MiB."""
    if d > 256:
        return min(block_q, 512), min(block_k, 512)
    return block_q, block_k


def _pad_to(x, multiple, axis):
    size = x.shape[axis]
    rem = size % multiple
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, multiple - rem)
    return jnp.pad(x, pad)


def is_flash_compatible(q_shape, k_shape, min_seq: int = 1024) -> bool:
    """Use the kernel only where it wins: long self-attention with
    block-aligned sequence lengths (SD spatial sequences are powers of two).

    Thresholds measured on v5e with 1024x1024 blocks: seq 4096 b8h10d64
    7.9 ms vs 18.6 ms XLA (2.3x); seq 1024 b16h10d64 1.89 vs 2.69 ms
    (1.4x); at seq 256 per-program overhead makes the kernel LOSE
    (1.08 vs 0.66 ms b16h20d64), so short sequences stay on the XLA
    path.

    Wide single-head attention (the SD VAE mid block, d=512) is admitted
    only at seq >= 8192, where it is a MEMORY necessity, not a perf win:
    at 1024x1024 images the VAE latent is 16384 tokens and the explicit
    path's f32 score temp is B*16384^2*4 = 1 GiB/image — batch 16 OOMs a
    16 GiB v5e (measured: 17.75G requested). At 512x512 (seq 4096,
    1 GiB total) the XLA explicit path measured 82% MXU and stays."""
    *_, sq, d = q_shape
    sk = k_shape[-2]
    return (
        sq >= min_seq
        and sq % 256 == 0
        and sk % 256 == 0
        and (d <= 256 or (d <= 512 and sq >= 8192))
    )


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, scale, nk):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32)          # (bq, d)
    k = k_ref[0].astype(jnp.float32)          # (bk, d)
    v = v_ref[0].astype(jnp.float32)          # (bk, d)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                  # (bq, bk)

    m_prev = m_ref[:, :1]                      # (bq, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)            # (bq, 1)
    p = jnp.exp(s - m_new)                     # (bq, bk)

    l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ki == nk - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


def _flash_lse_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                      m_ref, l_ref, acc_ref, *, scale, nk):
    """Flash forward that additionally writes per-row logsumexp — the
    residual needed to reconstruct normalized score tiles later without a
    second softmax pass."""
    _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                  scale=scale, nk=nk)
    ki = pl.program_id(2)

    @pl.when(ki == nk - 1)
    def _write_lse():
        # lse block is (block_q, 8): minor dim padded to a full sublane so
        # Mosaic accepts the layout; host slices [..., 0]
        lse = m_ref[:, :1] + jnp.log(l_ref[:, :1])
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _use_interpret() -> bool:
    # CPU backend (tests / virtual meshes) only supports interpret mode
    return jax.default_backend() != 'tpu'


def _reference_attention(q, k, v, scale):
    """XLA einsum-softmax twin of the kernel's math — the backward pass
    (flash has no Pallas VJP; training through taps differentiates this)."""
    scores = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum('bhqk,bhkd->bhqd', probs, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_diff(q, k, v, scale, block_q, block_k):
    return _flash_impl(q, k, v, scale=scale, block_q=block_q, block_k=block_k)


def _flash_diff_fwd(q, k, v, scale, block_q, block_k):
    return (_flash_impl(q, k, v, scale=scale, block_q=block_q,
                        block_k=block_k), (q, k, v))


#: Above this sq*sk the einsum backward's fp32 score temp (b*h*sq*sk*4,
#: twice: probs forward + recompute in the VJP) stops fitting HBM at the
#: batches the forward runs — the same shapes is_flash_compatible admits
#: as a memory necessity (seq-16384 wide-head = 1 GiB/img per temp).
_CHUNKED_BWD_ELEMS = 8192 * 8192


def _chunked_attention_bwd(q, k, v, scale, g, chunk=512):
    """O(sk*chunk)-memory attention backward: lax.scan over q-row chunks,
    recomputing scores per chunk with the flash-backward identity
    rowsum(dP*P) == rowsum(g*O) (so O is re-derived per chunk, nothing
    S²-sized is ever live). Engaged only above _CHUNKED_BWD_ELEMS — the
    shapes the forward admits to flash because the one-shot einsum path
    OOMs; below it the XLA-fused jax.vjp twin stays (faster, and the
    path every existing grad golden pins)."""
    in_dtype = q.dtype
    sq = q.shape[2]
    qp = _pad_to(q, chunk, 2)
    gp = _pad_to(g, chunk, 2).astype(jnp.float32)
    n = qp.shape[2] // chunk
    # (n, b, h, chunk, d) scan order; padded q rows carry g == 0 so their
    # dS is exactly zero — they contribute nothing to dk/dv and their dq
    # rows are sliced off below.
    q_ch = jnp.moveaxis(qp.reshape(*qp.shape[:2], n, chunk, -1), 2, 0)
    g_ch = jnp.moveaxis(gp.reshape(*gp.shape[:2], n, chunk, -1), 2, 0)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    def step(carry, qg):
        dk, dv = carry
        qi, gi = qg
        s = jnp.einsum('bhcd,bhkd->bhck', qi.astype(jnp.float32), kf) * scale
        p = jax.nn.softmax(s, axis=-1)
        oi = jnp.einsum('bhck,bhkd->bhcd', p, vf)
        d_row = jnp.sum(gi * oi, axis=-1, keepdims=True)
        dv = dv + jnp.einsum('bhck,bhcd->bhkd', p, gi)
        dp = jnp.einsum('bhcd,bhkd->bhck', gi, vf)
        ds = p * (dp - d_row) * scale
        dqi = jnp.einsum('bhck,bhkd->bhcd', ds, kf)
        dk = dk + jnp.einsum('bhck,bhcd->bhkd', ds, qi.astype(jnp.float32))
        return (dk, dv), dqi

    zeros = jnp.zeros(k.shape, jnp.float32)
    (dk, dv), dq_ch = jax.lax.scan(step, (zeros, zeros), (q_ch, g_ch))
    dq = jnp.moveaxis(dq_ch, 0, 2).reshape(
        *qp.shape[:2], n * chunk, -1)[:, :, :sq]
    return dq.astype(in_dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def _flash_diff_bwd(scale, block_q, block_k, res, g):
    q, k, v = res
    if q.shape[2] * k.shape[2] >= _CHUNKED_BWD_ELEMS:
        return _chunked_attention_bwd(q, k, v, scale, g)
    _, vjp = jax.vjp(lambda a, b, c: _reference_attention(a, b, c, scale),
                     q, k, v)
    return vjp(g)


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jnp.ndarray:
    """(B, H, Sq, D) x (B, H, Sk, D) -> (B, H, Sq, D).  Pallas forward,
    einsum-softmax backward (differentiable for train_unet/prompt tuning)."""
    return _flash_diff(q, k, v, scale, block_q, block_k)


@functools.partial(jax.jit, static_argnames=('scale', 'block_q', 'block_k'))
def _flash_impl(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jnp.ndarray:
    """(B, H, Sq, D) x (B, H, Sk, D) -> (B, H, Sq, D), fp32 accumulation."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    block_q, block_k = _clamp_blocks_for_width(d, block_q, block_k)
    block_q = _pick_block(sq, block_q)
    block_k = _pick_block(sk, block_k)
    assert sq % block_q == 0 and sk % block_k == 0, (sq, sk, block_q, block_k)

    d_pad = max(_LANE, ((d + _LANE - 1) // _LANE) * _LANE)
    qf = _pad_to(q.reshape(b * h, sq, d), d_pad, axis=2)
    kf = _pad_to(k.reshape(b * h, sk, d), d_pad, axis=2)
    vf = _pad_to(v.reshape(b * h, sk, d), d_pad, axis=2)

    nq, nk = sq // block_q, sk // block_k
    grid = (b * h, nq, nk)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, nk=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda bh, qi, ki: (bh, ki, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda bh, qi, ki: (bh, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda bh, qi, ki: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, sq, d_pad), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANE), jnp.float32),   # running max
            pltpu.VMEM((block_q, _LANE), jnp.float32),   # running denom
            pltpu.VMEM((block_q, d_pad), jnp.float32),   # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary'),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * sk * d_pad,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
        interpret=_use_interpret(),
    )(qf, kf, vf)

    return out[:, :, :d].reshape(b, h, sq, d)


@functools.partial(jax.jit, static_argnames=('scale', 'block_q', 'block_k'))
def flash_attention_with_lse(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
):
    """Flash forward returning (out (B,H,Sq,D), lse (B,H,Sq) fp32)."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    block_q, block_k = _clamp_blocks_for_width(d, block_q, block_k)
    block_q = _pick_block(sq, block_q)
    block_k = _pick_block(sk, block_k)
    assert sq % block_q == 0 and sk % block_k == 0, (sq, sk, block_q, block_k)

    d_pad = max(_LANE, ((d + _LANE - 1) // _LANE) * _LANE)
    qf = _pad_to(q.reshape(b * h, sq, d), d_pad, axis=2)
    kf = _pad_to(k.reshape(b * h, sk, d), d_pad, axis=2)
    vf = _pad_to(v.reshape(b * h, sk, d), d_pad, axis=2)

    nq, nk = sq // block_q, sk // block_k
    grid = (b * h, nq, nk)

    out, lse = pl.pallas_call(
        functools.partial(_flash_lse_kernel, scale=scale, nk=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda bh, qi, ki: (bh, ki, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda bh, qi, ki: (bh, ki, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d_pad), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, block_q, 8), lambda bh, qi, ki: (bh, qi, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, sq, d_pad), q.dtype),
            jax.ShapeDtypeStruct((b * h, sq, 8), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANE), jnp.float32),
            pltpu.VMEM((block_q, _LANE), jnp.float32),
            pltpu.VMEM((block_q, d_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary'),
        ),
        interpret=_use_interpret(),
    )(qf, kf, vf)

    return (out[:, :, :d].reshape(b, h, sq, d),
            lse[:, :, 0].reshape(b, h, sq))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _short_diff(q, k, v, scale):
    return short_attention(q, k, v, scale=scale)


def _short_diff_fwd(q, k, v, scale):
    return short_attention(q, k, v, scale=scale), (q, k, v)


def _short_diff_bwd(scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: _reference_attention(a, b, c, scale),
                     q, k, v)
    return vjp(g)


_short_diff.defvjp(_short_diff_fwd, _short_diff_bwd)


def short_attention_diff(q, k, v, *, scale):
    """short_attention with an einsum-softmax backward (same contract as
    flash_attention: Pallas forward, XLA VJP for train_unet/prompt tuning)."""
    return _short_diff(q, k, v, scale)


def _short_attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, sk_true, heads):
    """Direct-softmax attention for short sequences: several heads per
    program (amortizes Mosaic per-program overhead, the reason the blockwise
    flash kernel loses below seq ~512), whole K sequence in VMEM, fp32
    math.  Zero-padded key columns are masked to -inf so any Sk (e.g. the
    77-token text cross-attention) is exact."""
    sq = q_ref.shape[1]
    sk_pad = k_ref.shape[1]
    need_mask = sk_true != sk_pad
    if need_mask:
        col = jax.lax.broadcasted_iota(jnp.int32, (sq, sk_pad), 1)
    for g in range(heads):
        q = q_ref[g].astype(jnp.float32)
        k = k_ref[g].astype(jnp.float32)
        v = v_ref[g].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if need_mask:
            s = jnp.where(col < sk_true, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        out = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        o_ref[g] = (out / jnp.sum(p, axis=-1, keepdims=True)).astype(o_ref.dtype)


def is_short_attn_compatible(q_shape, k_shape, max_seq: int = 512) -> bool:
    """Shape gate for ``short_attention``: Sq a lane multiple up to
    ``max_seq`` (whole scores tile lives in VMEM), any Sk (padded+masked).

    NOT wired into the auto dispatch: measured on a real v5e (b16 h20 d64)
    the kernel LOSES to XLA's fused einsum-softmax at these sizes —
    459 vs 355 us at 256x256 self, 387 vs 321 us at 256x77 cross — the
    sequential per-head dot chain can't beat XLA's batched matmul once the
    score tensor is small enough to stay cheap.  Kept (with tests) as the
    measured record and for callers that need a no-score-materialization
    guarantee at short lengths regardless of speed."""
    *_, sq, d = q_shape
    sk = k_shape[-2]
    return (8 <= sq <= max_seq and sq % 128 == 0
            and sk <= max_seq and d <= 256)


@functools.partial(jax.jit, static_argnames=('scale', 'group'))
def short_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    group: int = 8,
) -> jnp.ndarray:
    """(B, H, Sq, D) x (B, H, Sk, D) -> (B, H, Sq, D) for short sequences,
    never writing the score matrix to HBM (the XLA path materializes fp32
    scores — the measured bottleneck at the SDXL seq-256 bands)."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    bh = b * h
    while group > 1 and bh % group != 0:
        group //= 2
    d_pad = max(_LANE, ((d + _LANE - 1) // _LANE) * _LANE)
    sk_pad = max(_LANE, ((sk + _LANE - 1) // _LANE) * _LANE)
    qf = _pad_to(q.reshape(bh, sq, d), d_pad, axis=2)
    kf = _pad_to(_pad_to(k.reshape(bh, sk, d), d_pad, axis=2), sk_pad, axis=1)
    vf = _pad_to(_pad_to(v.reshape(bh, sk, d), d_pad, axis=2), sk_pad, axis=1)

    out = pl.pallas_call(
        functools.partial(_short_attn_kernel, scale=scale, sk_true=sk,
                          heads=group),
        grid=(bh // group,),
        in_specs=[
            pl.BlockSpec((group, sq, d_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((group, sk_pad, d_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((group, sk_pad, d_pad), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((group, sq, d_pad), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d_pad), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel',),
        ),
        interpret=_use_interpret(),
    )(qf, kf, vf)
    return out[:, :, :d].reshape(b, h, sq, d)


def _headmean_kernel(q_ref, k_ref, lse_ref, o_ref, *, scale, heads):
    """Head-mean normalized score tile: (1/H) Σ_h exp(q_h k_h^T·scale -
    lse_h).  q_ref (1,H,bq,d), k_ref (1,H,bk,d), lse_ref (1,H,bq),
    o_ref (1,bq,bk).  Accumulation is fp32; the write-back takes o_ref's
    dtype, so the (Sq, Sk) map can stream to HBM at bf16 (halves the HBM
    write volume at the 16k DiT self-map band, ~0.5 GiB/layer-image instead
    of 1 GiB)."""
    acc = jnp.zeros(o_ref.shape[1:], jnp.float32)
    for hh in range(heads):          # static unroll; H is small
        s = jax.lax.dot_general(
            q_ref[0, hh].astype(jnp.float32), k_ref[0, hh].astype(jnp.float32),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ) * scale
        acc = acc + jnp.exp(s - lse_ref[0, hh][:, None])
    o_ref[0] = (acc / heads).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=('scale', 'block_q', 'block_k',
                                    'out_dtype'))
def headmean_probs(
    q: jnp.ndarray,
    k: jnp.ndarray,
    lse: jnp.ndarray,
    *,
    scale: float,
    block_q: int = 256,
    block_k: int = 256,
    out_dtype=None,
) -> jnp.ndarray:
    """(B,H,Sq,D), (B,H,Sk,D), (B,H,Sq) -> head-mean probs (B,Sq,Sk)
    without ever materializing the per-head (B,H,Sq,Sk) tensor — the memory
    cliff that forces the reference onto 11-GiB caps (SURVEY §5).  The map
    streams out at ``out_dtype`` (default: q's dtype, i.e. bf16 in
    production; the store would down-cast it anyway)."""
    out_dtype = q.dtype if out_dtype is None else out_dtype
    b, h, sq, d = q.shape
    sk = k.shape[2]
    block_q = _pick_block(sq, block_q)
    block_k = _pick_block(sk, block_k)
    assert sq % block_q == 0 and sk % block_k == 0, (sq, sk, block_q, block_k)

    d_pad = max(_LANE, ((d + _LANE - 1) // _LANE) * _LANE)
    qf = _pad_to(q, d_pad, axis=3)
    kf = _pad_to(k, d_pad, axis=3)

    grid = (b, sq // block_q, sk // block_k)
    return pl.pallas_call(
        functools.partial(_headmean_kernel, scale=scale, heads=h),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, block_q, d_pad), lambda bi, qi, ki: (bi, 0, qi, 0)),
            pl.BlockSpec((1, h, block_k, d_pad), lambda bi, qi, ki: (bi, 0, ki, 0)),
            pl.BlockSpec((1, h, block_q), lambda bi, qi, ki: (bi, 0, qi)),
        ],
        out_specs=pl.BlockSpec((1, block_q, block_k),
                               lambda bi, qi, ki: (bi, qi, ki)),
        out_shape=jax.ShapeDtypeStruct((b, sq, sk), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'parallel'),
        ),
        interpret=_use_interpret(),
    )(qf, kf, lse)
