"""Device-mesh construction and sharding rules.

The reference has no real parallelism layer (SURVEY §2.12): it places whole
models on separate GPUs and moves tensors with Python threads.  The TPU-native
replacement is a ``jax.sharding.Mesh`` with named axes:

  dp — data parallel: batch dimension of extraction/training
  sp — sequence parallel: the DiT token dimension (Flux @1024² is 4096
       image tokens, @2048² 16k — past one chip's activation budget at
       batch>1).  Token-dim sharding constraints at block boundaries let
       XLA's SPMD partitioner insert the all-gathers over ICI; weights stay
       replicated (or tp-sharded) so sp composes with dp and tp.
  tp — tensor parallel: attention heads / FFN inner dim / conv channels

Batch extraction shards images over dp; the U-Net itself is replicated unless
tp > 1, in which case qkv/ffn weights are column-sharded and output
projections row-sharded so each layer needs one psum (ridden on ICI by XLA).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, tp: int = 1, sp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // (tp * sp)
    assert dp * tp * sp == n, \
        f'dp({dp}) * sp({sp}) * tp({tp}) != n_devices({n})'
    arr = np.asarray(devices).reshape(dp, sp, tp)
    return Mesh(arr, ('dp', 'sp', 'tp'))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P('dp'))


def has_sp(mesh: Optional[Mesh]) -> bool:
    return (mesh is not None and 'sp' in mesh.axis_names
            and mesh.shape['sp'] > 1)


def constrain_tokens(x, token_pspec):
    """Re-assert (batch, token, feature) sharding on a (B, S, D) activation
    at a DiT block boundary (sequence parallelism).  ``token_pspec`` is the
    (batch_axis, token_axis) name pair, e.g. ('dp', 'sp'); None is a no-op.
    Requires tracing inside the mesh context (facade._jit_sharded enters
    it)."""
    if token_pspec is None:
        return x
    return jax.lax.with_sharding_constraint(
        x, P(token_pspec[0], token_pspec[1], None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# ---------------------------------------------------------------- param rules
def _param_pspec(path: Tuple[str, ...], value) -> P:
    """Tensor-parallel partition spec for a U-Net/text-encoder param leaf.

    Column-parallel (shard output features): to_q/to_k/to_v kernels, FFN
    in-projection, conv kernels' output channel.
    Row-parallel (shard input features): to_out_0 / net_2 kernels.
    Everything else replicated.  Biases of column-parallel layers shard on
    their only axis.
    """
    name = path[-2] if len(path) >= 2 else ''
    leaf = path[-1]
    # column-parallel (shard output features): qkv projections (incl. Flux's
    # context-stream add_*_proj), FFN in-projections (GEGLU 'proj', Flux
    # 'net_0_proj'/'proj_mlp')
    col = name in ('to_q', 'to_k', 'to_v', 'add_q_proj', 'add_k_proj',
                   'add_v_proj', 'proj', 'net_0_proj', 'proj_mlp')
    # row-parallel (shard input features): output projections
    row = name in ('to_out_0', 'to_add_out', 'net_2', 'proj_out')
    # int8 weight-only layers (ops/quant.Int8Dense) shard exactly like
    # full-precision kernels; their per-OUTPUT-channel 'scale' follows the
    # output-feature axis (sharded for col, replicated for row — a
    # row-parallel layer keeps every output channel on each chip)
    if leaf in ('kernel', 'kernel_q') and value.ndim == 2:
        if col:
            return P(None, 'tp')
        if row:
            return P('tp', None)
    if leaf in ('bias', 'scale') and col and value.ndim == 1:
        return P('tp')
    return P()


def unet_param_shardings(mesh: Mesh, params):
    """Build a NamedSharding pytree for tensor-parallel U-Net params."""
    from flax import traverse_util
    flat = traverse_util.flatten_dict(params)
    out = {}
    for path, v in flat.items():
        out[path] = NamedSharding(mesh, _param_pspec(path, v))
    return traverse_util.unflatten_dict(out)


def denoiser_param_shardings(mesh: Mesh, params, family: str = 'unet'):
    """NamedSharding pytree for any denoiser family's params (facade entry
    point for tp extraction).  The projection-name rules in ``_param_pspec``
    already cover U-Net (to_q/to_out_0/net_2), DiT and Flux/MMDiT
    (add_*_proj, proj_mlp, to_add_out) naming, so all families route through
    the same table; ``family`` is kept for future family-specific rules."""
    del family
    return unet_param_shardings(mesh, params)


def shard_params(mesh: Mesh, params, tensor_parallel: bool = False):
    """Place params on the mesh: replicated, or tp-sharded where profitable."""
    if tensor_parallel:
        shardings = unet_param_shardings(mesh, params)
    else:
        shardings = jax.tree.map(lambda _: replicated(mesh), params)
    return jax.device_put(params, shardings)
