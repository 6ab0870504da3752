"""TPU deployment bundles: pre-converted param trees on disk.

The reference re-parses the torch checkpoint on every process start
(``get_diffusion_model`` -> ``from_pretrained``, reference
feature/components/models.py:10-172).  In this build the expensive part of
startup is ``convert_torch_state`` (safetensors parse, HF key renames,
per-tensor transposes, int8 quantization for flux) — minutes for 12B-class
models on a single-core host.  ``save_bundle`` writes the ALREADY CONVERTED
tree at the serving dtype (including int8 kernels + their per-channel
scales) next to copies of the checkpoint's ``config.json`` / tokenizer
files, producing a self-contained deployment dir that the facade loads
directly: one mmap'd ``.npy`` per leaf, no torch-format parsing, no
transposes, no quantization pass.

Layout (mirrors the diffusers checkpoint layout so the facade's spec
adaptation and tokenizer loading work unchanged on a bundle dir)::

    bundle/
      tpu_bundle.json            manifest: meta + per-leaf file/dtype/shape
      params/000000.npy ...      one file per param leaf, flatten order
      {unet|transformer}/config.json   copied from the source checkpoint
      vae/config.json  text_encoder*/config.json
      tokenizer/  tokenizer_2/   copied verbatim
      controlnet_*/  depth_estimator/   copied verbatim when present
                                 (still torch-format: converted at load by
                                 ControlNetPipeline — small vs the denoiser)

bfloat16 has no portable .npy descr, so bf16 leaves are stored as uint16
bit patterns and viewed back on load (the manifest records the true dtype).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

MANIFEST = 'tpu_bundle.json'
_FORMAT = 1
# checkpoint pieces copied verbatim so a bundle dir behaves like a
# checkpoint dir for everything that is NOT the converted param tree
_CONFIG_COMPONENTS = ('unet', 'transformer', 'vae',
                      'text_encoder', 'text_encoder_2')
_COPY_TREES = ('tokenizer', 'tokenizer_2', 'depth_estimator')


def is_bundle(root: str) -> bool:
    return os.path.isfile(os.path.join(root, MANIFEST))


def read_meta(root: str) -> Dict:
    """The manifest's ``meta`` dict (the configuration ``save_bundle`` ran
    under). The facade uses it to resolve auto (None) construction flags —
    e.g. ``transformer_8bit`` — to what the bundle actually contains, so a
    bf16-exported flux bundle warm-starts with default arguments instead of
    tripping the auto-int8 heuristic into a leaf-count mismatch."""
    with open(os.path.join(str(root), MANIFEST)) as f:
        return json.load(f).get('meta', {})


def _keystr(path) -> str:
    return jax.tree_util.keystr(path)


def save_bundle(params, out_root: str, *, meta: Dict,
                src_checkpoint: Optional[str] = None) -> str:
    """Write ``params`` (any pytree of arrays) + ``meta`` to ``out_root``.

    ``src_checkpoint``, when given, is a diffusers-layout dir whose
    config.json files, tokenizer dirs, and controlnet/depth dirs are copied
    into the bundle so it is self-contained.
    """
    out_root = str(out_root)
    if os.path.isdir(out_root) and os.listdir(out_root):
        # a partial overwrite would silently mix artifacts: stale
        # higher-numbered params/*.npy surviving next to a new manifest,
        # or a previous checkpoint's tokenizer dirs (copytree below never
        # replaces an existing tree) being served with new weights
        raise ValueError(
            f'bundle output dir {out_root} exists and is not empty; '
            'delete it first')
    # all-or-nothing: build in a sibling temp dir and rename on success. A
    # crash mid-export (disk full 10 GiB into a flux bundle) must not leave
    # a manifest-less half-bundle at out_root that blocks retries ('not
    # empty') and takes the torch-checkpoint load path (is_bundle False).
    tmp_root = f'{out_root}.partial-{os.getpid()}'
    try:
        return _write_bundle(params, tmp_root, out_root, meta,
                             src_checkpoint)
    except BaseException:
        shutil.rmtree(tmp_root, ignore_errors=True)
        raise


def _write_bundle(params, tmp_root, out_root, meta, src_checkpoint):
    pdir = os.path.join(tmp_root, 'params')
    os.makedirs(pdir)

    leaves_meta = []
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    for i, (path, leaf) in enumerate(flat):
        arr = np.asarray(leaf)
        true_dtype = str(arr.dtype)
        if arr.dtype == jnp.bfloat16:
            arr = arr.view(np.uint16)
        fname = f'{i:06d}.npy'
        np.save(os.path.join(pdir, fname), arr)
        leaves_meta.append({'file': f'params/{fname}',
                            'path': _keystr(path),
                            'dtype': true_dtype,
                            'shape': list(arr.shape)})

    if src_checkpoint:
        for comp in _CONFIG_COMPONENTS:
            cj = os.path.join(src_checkpoint, comp, 'config.json')
            if os.path.isfile(cj):
                os.makedirs(os.path.join(tmp_root, comp), exist_ok=True)
                shutil.copy2(cj, os.path.join(tmp_root, comp, 'config.json'))
        copy_trees = list(_COPY_TREES) + sorted(
            d for d in os.listdir(src_checkpoint)
            if d.startswith('controlnet_'))
        for tree in copy_trees:
            src = os.path.join(src_checkpoint, tree)
            if os.path.isdir(src):
                dst = os.path.join(tmp_root, tree)
                if not os.path.isdir(dst):
                    shutil.copytree(src, dst)

    manifest = {'format': _FORMAT, 'kind': 'diffusion_feature_tpu_bundle',
                'meta': dict(meta), 'leaves': leaves_meta}
    with open(os.path.join(tmp_root, MANIFEST), 'w') as f:
        json.dump(manifest, f, indent=1)
    # POSIX rename replaces an existing EMPTY out_root (the non-empty case
    # was refused up front)
    os.rename(tmp_root, out_root)
    return out_root


def load_bundle(root: str, template, *, expect_meta: Optional[Dict] = None):
    """Fill ``template`` (an abstract/eval_shape pytree) from a bundle dir.

    The bundle's leaf list must match the template's flatten order exactly —
    it does whenever the constructing configuration (version, adapted spec,
    quantization flags) matches the one ``save_bundle`` ran under.  On
    mismatch the error leads with the differing meta entries (e.g. a bundle
    saved with ``transformer_8bit=True`` loaded into a bf16 template).
    """
    root = str(root)
    with open(os.path.join(root, MANIFEST)) as f:
        manifest = json.load(f)
    if manifest.get('format') != _FORMAT:
        raise ValueError(f'unsupported bundle format '
                         f'{manifest.get("format")!r} at {root}')
    saved_meta = manifest.get('meta', {})

    def _mismatch_hint() -> str:
        if not expect_meta:
            return ''
        diffs = [f'  {k}: bundle={saved_meta.get(k)!r} '
                 f'vs this extractor={v!r}'
                 for k, v in sorted(expect_meta.items())
                 if saved_meta.get(k) != v]
        if not diffs:
            return ''
        return ('\nbundle/extractor configuration differs:\n'
                + '\n'.join(diffs)
                + '\nconstruct the FeatureExtractor with the settings the '
                  'bundle was saved under')

    if expect_meta and 'dtype' in expect_meta:
        saved_d, exp_d = saved_meta.get('dtype'), expect_meta['dtype']
        if saved_d != exp_d:
            # leaves load AS STORED (bit-exact with the cold-start
            # conversion that produced them); casting float leaves to a
            # different serving dtype here would have to guess which
            # leaves are serving-dtype weights vs intentionally-fp32 int8
            # scales — refuse instead
            raise ValueError(
                f'bundle at {root} was exported at dtype={saved_d!r} but '
                f'this extractor serves dtype={exp_d!r}; re-export the '
                'bundle at the serving dtype' + _mismatch_hint())

    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    entries = manifest['leaves']
    if len(entries) != len(flat):
        raise ValueError(
            f'bundle at {root} has {len(entries)} param leaves but this '
            f'extractor expects {len(flat)}' + _mismatch_hint())

    leaves = []
    for (path, tmpl), ent in zip(flat, entries):
        ks = _keystr(path)
        if ent['path'] != ks:
            raise ValueError(
                f'bundle leaf order mismatch at {ks}: bundle has '
                f'{ent["path"]}' + _mismatch_hint())
        arr = np.load(os.path.join(root, ent['file']), mmap_mode='r')
        if ent['dtype'] == 'bfloat16':
            arr = arr.view(jnp.bfloat16)
        if (list(arr.shape) != list(ent['shape'])
                or str(arr.dtype) != ent['dtype']):
            # file/manifest skew — an .npy replaced or regenerated out of
            # band; distinct from a configuration mismatch (below)
            raise ValueError(
                f'bundle leaf {ks}: {ent["file"]} does not match the '
                f'manifest (file {tuple(arr.shape)}/{arr.dtype} vs manifest '
                f'{tuple(ent["shape"])}/{ent["dtype"]}) — the bundle is '
                'corrupt; re-export it')
        if tuple(arr.shape) != tuple(tmpl.shape):
            raise ValueError(
                f'bundle leaf {ks} has shape {tuple(arr.shape)}, expected '
                f'{tuple(tmpl.shape)}' + _mismatch_hint())
        if arr.dtype != tmpl.dtype and not (
                jnp.issubdtype(arr.dtype, jnp.floating)
                and jnp.issubdtype(tmpl.dtype, jnp.floating)):
            raise ValueError(
                f'bundle leaf {ks} has dtype {arr.dtype}, expected '
                f'{tmpl.dtype}' + _mismatch_hint())
        # load AS STORED: float leaves are already at the serving dtype
        # (meta-enforced above); the eval_shape template's float leaves
        # are fp32 (flax param_dtype default) even for bf16 serving, so
        # tmpl.dtype must NOT be imposed here — that would silently
        # double param memory for bf16 bundles
        leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)
