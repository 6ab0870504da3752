"""FeatureExtractor — the public facade, mirroring the reference's
``diffusion_feature.FeatureExtractor`` (feature/diffusion_feature.py:26-517).

TPU-native design: one extract() call compiles to ONE jitted XLA program —
VAE encode -> posterior sample -> scheduler noise injection -> single
U-Net/DiT forward with taps compiled in -> per-tap post-processing — cached
per (t, batch, image size, layer set).  There are no hooks and no Python in
the hot loop.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .taps import TapSpec, flatten_taps
from .store import postprocess_taps, select_background_encounters
from .ops.resize import interpolate_bilinear_nchw
from .models.registry import ModelSpec, get_model_spec
from .models.unet2d import UNet2DConditionModel
from .models.vae import AutoencoderKL
from .models.clip_text import CLIPTextModel
from .models.convert import (
    convert_torch_state, load_component_state,
)
from .schedulers import make_scheduler
from .tokenizers.clip_bpe import load_clip_tokenizer
from .utils.prompt import encode_long_prompt
from .io.images import preprocess_pil_batch, resize_tensor_batch


_DTYPES = {'bfloat16': jnp.bfloat16, 'float16': jnp.float16,
           'float32': jnp.float32}


from .utils import normal_like  # noqa: F401 — shared with models/vae.py


class FeatureExtractor:
    """Public API parity with the reference facade: ``encode_prompt``,
    ``offload_prompt_encoder``, ``preprocess_image``, ``extract``,
    ``set_background_extraction`` / ``get_background_extraction``.

    Additional TPU-specific knobs:
      weights:  local diffusers-format checkpoint dir (zero-egress env);
                None -> deterministic random init.
      mesh:     optional jax.sharding.Mesh for data-parallel batch sharding.
    """

    def __init__(
        self,
        layer,                     # layer JSON path / dict / None (show-all)
        version: str,
        device=None,               # accepted for API parity; placement is XLA's
        dtype: str = 'bfloat16',
        img_size: int = 1024,
        offline_lora: Optional[str] = None,
        offline_lora_filename: Optional[str] = None,
        feature_resize: int = 1,
        control=None,
        attention: Optional[Sequence[str]] = None,
        train_unet: bool = False,
        external_model=None,
        weights: Optional[str] = None,
        weights_variant: Optional[str] = None,  # pick a dtype variant set
                                   # (e.g. 'fp16') in an ambiguous ckpt dir
        mesh=None,
        seed: int = 0,
        attn_store_sizes=None,   # override the size band (tests/tiny models)
        t5_8bit=None,            # int8 T5 weights; None -> auto (flux+weights)
        transformer_8bit=None,   # int8 flux transformer; None -> auto
        validate_layers: bool = True,  # reject unknown layer ids up front
    ):
        self.spec: ModelSpec = get_model_spec(version)
        self.version = version
        self.img_size = img_size
        self.feature_resize = feature_resize
        self.attention = list(attention) if attention else None
        self.train_unet = train_unet
        self.control = control
        self.mesh = mesh
        self.dtype = _DTYPES[dtype]
        # features keep full precision when the U-Net is being trained
        # (reference FeatureStore skips the fp16 cast, feature_extractor.py:59-64)
        self.feature_dtype = None if train_unet else jnp.bfloat16

        self.taps = TapSpec.from_config(layer)
        self.store_vae_output = ((not self.taps.accept_all)
                                 and 'vae-out' in self.taps.ids
                                 and self.spec.vae is not None)

        # attention-store size band (reference components/attention.py:542, :569)
        if self.attention:
            if attn_store_sizes is not None:
                self._attn_sizes = tuple(attn_store_sizes)
            elif self.spec.family in ('pixart', 'hunyuan', 'flux'):
                self._attn_sizes = (img_size // 32, img_size // 8)
            else:
                self._attn_sizes = (img_size // 32, img_size // 16)
        else:
            self._attn_sizes = None

        self.scheduler = make_scheduler(self.spec.scheduler,
                                        self.spec.scheduler_config)
        # pipeline vae_scale_factor: 2^(n_levels-1); 8 for the real SD VAEs
        if self.spec.vae is not None:
            self.vae_scale = 2 ** (len(self.spec.vae.block_out_channels) - 1)
        else:
            self.vae_scale = 1
        # reference loads Flux's T5-XXL in 8-bit (models.py:158-163); here
        # int8 weight-only quantization kicks in for flux when real weights
        # are given (random-init mode keeps fp weights; zeros would be
        # degenerate), overridable for any T5 family via t5_8bit
        self._t5_8bit = t5_8bit
        # Flux-dev's 12B bf16 weights (23.8 GiB) exceed a single v5e's HBM;
        # int8 weight-only block projections (11.9 GiB) make the flagship
        # DiT single-chip viable, mirroring the reference's quantize-to-fit
        # stance (bnb-8bit T5 + 11-GiB device_map, models.py:150-172).
        # Auto-on for flux with real weights UNLESS a mesh is given (tensor
        # parallelism is the bf16 multi-chip path) or a LoRA must merge
        # (LoRA deltas apply to full-precision kernels).
        if transformer_8bit and self.spec.family != 'flux':
            raise ValueError('transformer_8bit is only supported for flux '
                             '(the only family whose bf16 weights exceed '
                             'one chip\'s HBM)')
        self._transformer_8bit = transformer_8bit
        self._rng = jax.random.PRNGKey(seed)
        self.store_idx = None           # background extraction
        self._background_feats = {}
        self._fn_cache = {}             # jitted step programs, per instance
        self._offline_lora = offline_lora
        self._weights_root = weights
        self._weights_variant = weights_variant

        self._build_models(weights, seed, external_model)
        if validate_layers and not self.taps.accept_all:
            self._validate_layer_ids()
        if offline_lora:
            from .models.lora import apply_lora_to_params
            self.params['unet'] = apply_lora_to_params(
                self.params['unet'], offline_lora, offline_lora_filename)

        if control:
            from .models.controlnet import ControlNetPipeline
            self.control_pipe = ControlNetPipeline(self, control, weights)
        else:
            self.control_pipe = None

    def _validate_layer_ids(self):
        """Fail fast on unknown layer ids with near-miss suggestions.

        The reference silently drops ids the store never sees
        (feature/components/feature_extractor.py:36): a typo'd layer yields
        an empty feature dict with no diagnostic.  Here the weight-free
        enumeration (jax.eval_shape over the post-checkpoint-adaptation
        architecture) knows every valid id, so a bad request raises up front
        instead of surfacing as a missing key after an expensive extract.
        """
        from .taps import is_filtered_id
        known = set(self.show_all_layers())
        pseudo = set()
        if self.attention:
            # 'attn' is assembled by _collect_feats only when attention
            # categories were requested (:492-500); accepting it otherwise
            # would recreate the silent-missing-feature failure this check
            # exists to prevent
            pseudo.add('attn')
        if (self.spec.vae is not None
                and self.spec.family not in ('flux', 'hunyuan')):
            pseudo.add('vae-out')  # diffusion_feature.py:477-485; the
            # pipeline-driven flux/hunyuan paths return straight from the
            # tap store (reference :236-254) and never assemble it
        unknown = [i for i in sorted(self.taps.ids)
                   if i not in known and i not in pseudo
                   and not is_filtered_id(i)]
        if not unknown:
            return
        import difflib
        lines = []
        for i in unknown[:10]:
            if i == 'attn':
                lines.append("  'attn' needs the attention= argument (e.g. "
                             "attention=['up_cross']) so there are "
                             'aggregated maps to assemble')
                continue
            if i == 'vae-out' and self.spec.family in ('flux', 'hunyuan'):
                lines.append("  'vae-out' is unavailable for the "
                             f'pipeline-driven {self.spec.family} path '
                             '(one denoiser forward, no decode step)')
                continue
            near = difflib.get_close_matches(i, known, n=3, cutoff=0.55)
            hint = f" (did you mean: {', '.join(near)}?)" if near else ''
            lines.append(f'  {i!r}{hint}')
        more = ('' if len(unknown) <= 10
                else f'\n  ... and {len(unknown) - 10} more')
        raise ValueError(
            f'{len(unknown)} unknown/unavailable layer id(s) for version '
            f'{self.version!r} at img_size={self.img_size}:\n'
            + '\n'.join(lines) + more
            + '\nUse show_all_layers() / --show_all_layers for the full list,'
              ' or pass validate_layers=False to skip this check.')

    # ------------------------------------------------------------------ build
    def _build_models(self, weights, seed, external_model):
        spec = self.spec
        if external_model is not None:
            # reuse another extractor's models/params (reference
            # external_model path, diffusion_feature.py:46-47).  The shared
            # denoiser is re-instrumented with THIS extractor's tap spec —
            # the reference re-runs prepare_feature_extractor on the shared
            # pipe (:59); taps never affect params, so the trees share.
            src = external_model
            kw = {'taps': self.taps}
            if hasattr(src.unet, 'attn_store_sizes'):
                kw['attn_store_sizes'] = self._attn_sizes
            self.unet = src.unet.clone(**kw)
            self.vae = src.vae
            self.text_encoders = src.text_encoders
            self.tokenizers = src.tokenizers
            self.params = src.params
            return

        bundle_meta = None
        if weights:
            spec = self.spec = _adapt_spec_to_checkpoint(spec, weights)
            if spec.vae is not None:
                self.vae_scale = 2 ** (len(spec.vae.block_out_channels) - 1)
            from .io.bundle import is_bundle, read_meta
            if is_bundle(weights):
                if self._offline_lora:
                    # raise here, before the manifest-resolved int8 flags
                    # can trip the generic int8+LoRA guard below with a
                    # misleading suggestion
                    raise ValueError(
                        'offline_lora cannot be applied on top of a '
                        'deployment bundle: bundles carry already-merged '
                        'weights — merge the LoRA when exporting (build '
                        'from the checkpoint with offline_lora, then '
                        'save_converted)')
                # a bundle records the quantization flags it was exported
                # under; auto (None) flags resolve to those instead of the
                # cold-start heuristics below, so e.g. a bf16 flux bundle
                # (make_bundle --no_transformer_8bit, or LoRA-merged) loads
                # with default constructor arguments. Explicit args still
                # win — a true mismatch then fails with the differing meta
                # named (load_bundle's hint).
                bundle_meta = read_meta(weights)
        if getattr(spec, 't5', None) is not None:
            use_int8 = (self._t5_8bit if self._t5_8bit is not None
                        else bundle_meta.get('t5_8bit', False)
                        if bundle_meta is not None
                        else (spec.family == 'flux' and weights is not None))
            if use_int8 and weights is None:
                raise ValueError(
                    't5_8bit=True requires real weights: int8 kernels '
                    'initialize to zeros (ops/quant.py), so a random-init '
                    'quantized encoder would emit degenerate embeddings')
            if use_int8:
                import dataclasses as _dc
                spec = self.spec = _dc.replace(
                    spec, t5=_dc.replace(spec.t5, quantize_int8=True))
        if spec.family == 'flux':
            # auto rule: quantize to fit UNLESS the weights are actually
            # tp-sharded (a dp/sp-only mesh still replicates the full tree
            # per chip) or a LoRA must merge into full-precision kernels
            has_tp = (self.mesh is not None and 'tp' in self.mesh.axis_names
                      and self.mesh.shape['tp'] > 1)
            use_int8 = (self._transformer_8bit
                        if self._transformer_8bit is not None
                        else bundle_meta.get('transformer_8bit', False)
                        if bundle_meta is not None
                        else (weights is not None and not has_tp
                              and not self._offline_lora))
            if use_int8 and self._offline_lora:
                raise ValueError(
                    'transformer_8bit=True cannot be combined with '
                    'offline_lora: LoRA deltas merge into full-precision '
                    'kernels (models/lora.py), which int8 layers do not '
                    'carry — merge the LoRA at bf16 (transformer_8bit='
                    'False) or shard with tp instead')
            if use_int8 and weights is None:
                raise ValueError(
                    'transformer_8bit=True requires real weights: int8 '
                    'kernels initialize to zeros (ops/quant.py), so a '
                    'random-init quantized transformer is degenerate')
            if use_int8:
                import dataclasses as _dc
                spec = self.spec = _dc.replace(
                    spec, dit=_dc.replace(spec.dit, quantize_int8=True))

        rng = jax.random.PRNGKey(seed)
        sz = self.img_size
        lat = sz // self.vae_scale
        self.vae = AutoencoderKL(cfg=spec.vae, dtype=self.dtype) \
            if spec.vae is not None else None

        if spec.family == 'hunyuan':
            from .models.hunyuan import HunyuanDiT2D
            from .models.bert_text import BertTextModel
            from .models.t5 import T5EncoderModel
            from .tokenizers.t5_tok import load_t5_tokenizer, T5HashTokenizer
            import os
            from .parallel.mesh import has_sp
            self.unet = HunyuanDiT2D(
                cfg=spec.dit, dtype=self.dtype, taps=self.taps,
                attn_store_sizes=self._attn_sizes,
                token_pspec=('dp', 'sp') if has_sp(self.mesh) else None)
            self.text_encoders = (
                BertTextModel(cfg=spec.bert, dtype=self.dtype),
                T5EncoderModel(cfg=spec.t5, dtype=self.dtype))
            # BERT WordPiece from the checkpoint's tokenizer/vocab.txt;
            # hash tokenizer as the offline fallback
            from .tokenizers.wordpiece import load_bert_tokenizer
            self.tokenizers = (
                load_bert_tokenizer(
                    os.path.join(weights, 'tokenizer') if weights else None,
                    model_max_length=spec.dit.text_len,
                    vocab_size=spec.bert.vocab_size),
                load_t5_tokenizer(
                    os.path.join(weights, 'tokenizer_2') if weights else None,
                    model_max_length=spec.dit.text_len_t5,
                    vocab_size=spec.t5.vocab_size))

            def init_all():
                r1, r2, r3, r4 = jax.random.split(rng, 4)
                sample = jnp.zeros((1, spec.dit.in_channels, lat, lat),
                                   self.dtype)
                bert_ctx = jnp.zeros(
                    (1, spec.dit.text_len, spec.dit.cross_attention_dim),
                    self.dtype)
                t5_ctx = jnp.zeros(
                    (1, spec.dit.text_len_t5, spec.dit.cross_attention_dim_t5),
                    self.dtype)
                plain = HunyuanDiT2D(cfg=spec.dit, dtype=self.dtype)
                p = {'unet': plain.init(r1, sample, 50.0, bert_ctx, None,
                                        t5_ctx, None)['params']}
                p['vae'] = self.vae.init(
                    r2, jnp.zeros((1, 3, sz, sz), self.dtype),
                    method=AutoencoderKL.full_pass)['params']
                ids = jnp.zeros((1, spec.dit.text_len), jnp.int32)
                t5_ids = jnp.zeros((1, spec.dit.text_len_t5), jnp.int32)
                p['text'] = [
                    self.text_encoders[0].init(r3, ids)['params'],
                    self.text_encoders[1].init(r4, t5_ids)['params']]
                return p
        elif spec.family == 'flux':
            from .models.flux import FluxTransformer2D, pack_latents
            from .models.t5 import T5EncoderModel
            from .tokenizers.t5_tok import load_t5_tokenizer
            import os
            grid = lat // 2
            from .parallel.mesh import has_sp
            self.unet = FluxTransformer2D(
                cfg=spec.dit, grid_hw=(grid, grid),
                text_len=spec.prompt_max_length, dtype=self.dtype,
                taps=self.taps, attn_store_sizes=self._attn_sizes,
                token_pspec=('dp', 'sp') if has_sp(self.mesh) else None)
            self.text_encoders = (
                CLIPTextModel(cfg=spec.text_encoders[0], dtype=self.dtype),
                T5EncoderModel(cfg=spec.t5, dtype=self.dtype))
            clip_tok_dir = os.path.join(weights, 'tokenizer') if weights else None
            t5_tok_dir = os.path.join(weights, 'tokenizer_2') if weights else None
            self.tokenizers = (
                load_clip_tokenizer(
                    clip_tok_dir if clip_tok_dir and os.path.isdir(clip_tok_dir)
                    else None, vocab_size=spec.text_encoders[0].vocab_size),
                load_t5_tokenizer(
                    t5_tok_dir if t5_tok_dir and os.path.isdir(t5_tok_dir)
                    else None, model_max_length=spec.prompt_max_length,
                    vocab_size=spec.t5.vocab_size))

            def init_all():
                r1, r2, r3, r4 = jax.random.split(rng, 4)
                packed = jnp.zeros((1, grid * grid, spec.dit.in_channels),
                                   self.dtype)
                ctx = jnp.zeros((1, spec.prompt_max_length, spec.t5.d_model),
                                self.dtype)
                pooled = jnp.zeros((1, spec.dit.pooled_projection_dim),
                                   self.dtype)
                plain = FluxTransformer2D(
                    cfg=spec.dit, grid_hw=(grid, grid),
                    text_len=spec.prompt_max_length, dtype=self.dtype)
                p = {'unet': plain.init(r1, packed, 50.0, ctx, pooled)['params']}
                p['vae'] = self.vae.init(
                    r2, jnp.zeros((1, 3, sz, sz), self.dtype),
                    method=AutoencoderKL.full_pass)['params']
                ids = jnp.zeros((1, 77), jnp.int32)
                t5_ids = jnp.zeros((1, spec.prompt_max_length), jnp.int32)
                p['text'] = [
                    self.text_encoders[0].init(r3, ids)['params'],
                    self.text_encoders[1].init(r4, t5_ids)['params']]
                return p
        elif spec.family == 'if':
            from .models.unet_if import IFUNet
            from .models.t5 import T5EncoderModel
            from .tokenizers.t5_tok import load_t5_tokenizer
            import os
            self.unet = IFUNet(cfg=spec.unet, dtype=self.dtype, taps=self.taps)
            self.text_encoders = (T5EncoderModel(cfg=spec.t5, dtype=self.dtype),)
            tok_dir = os.path.join(weights, 'tokenizer') if weights else None
            self.tokenizers = (load_t5_tokenizer(
                tok_dir, model_max_length=spec.prompt_max_length,
                vocab_size=spec.t5.vocab_size),)

            def init_all():
                r1, r3 = jax.random.split(rng)
                sample = jnp.zeros((1, spec.unet.in_channels, sz, sz),
                                   self.dtype)
                ctx = jnp.zeros((1, spec.prompt_max_length, spec.t5.d_model),
                                self.dtype)
                plain = IFUNet(cfg=spec.unet, dtype=self.dtype)
                p = {'unet': plain.init(r1, sample, 50, ctx)['params']}
                ids = jnp.zeros((1, spec.prompt_max_length), jnp.int32)
                p['text'] = [self.text_encoders[0].init(r3, ids)['params']]
                return p
        elif spec.family == 'pixart':
            from .models.dit_pixart import PixArtTransformer2D
            from .models.t5 import T5EncoderModel
            from .tokenizers.t5_tok import load_t5_tokenizer
            import os
            from .parallel.mesh import has_sp
            self.unet = PixArtTransformer2D(
                cfg=spec.dit, dtype=self.dtype, taps=self.taps,
                attn_store_sizes=self._attn_sizes,
                token_pspec=('dp', 'sp') if has_sp(self.mesh) else None)
            self.text_encoders = (T5EncoderModel(cfg=spec.t5, dtype=self.dtype),)
            tok_dir = os.path.join(weights, 'tokenizer') if weights else None
            self.tokenizers = (load_t5_tokenizer(
                tok_dir, model_max_length=spec.prompt_max_length,
                vocab_size=spec.t5.vocab_size),)
            def init_all():
                r1, r2, r3 = jax.random.split(rng, 3)
                sample = jnp.zeros((1, spec.dit.in_channels, lat, lat), self.dtype)
                ctx = jnp.zeros((1, spec.prompt_max_length,
                                 spec.t5.d_model), self.dtype)
                mask = jnp.ones((1, spec.prompt_max_length), jnp.int32)
                plain = PixArtTransformer2D(cfg=spec.dit, dtype=self.dtype)
                p = {'unet': plain.init(r1, sample, 50, ctx, mask)['params']}
                p['vae'] = self.vae.init(
                    r2, jnp.zeros((1, 3, sz, sz), self.dtype),
                    method=AutoencoderKL.full_pass)['params']
                ids = jnp.zeros((1, spec.prompt_max_length), jnp.int32)
                p['text'] = [self.text_encoders[0].init(r3, ids)['params']]
                return p
        else:
            self.unet = UNet2DConditionModel(
                cfg=spec.unet, dtype=self.dtype, taps=self.taps,
                attn_store_sizes=self._attn_sizes)
            self.text_encoders = tuple(
                CLIPTextModel(cfg=c, dtype=self.dtype) for c in spec.text_encoders)
            tok_dirs = [None] * len(spec.text_encoders)
            if weights:
                import os
                cand = [os.path.join(weights, 'tokenizer'),
                        os.path.join(weights, 'tokenizer_2')]
                tok_dirs = [c if os.path.isdir(c) else None
                            for c in cand[:len(spec.text_encoders)]]
            self.tokenizers = tuple(
                # tokenizer_2 (OpenCLIP) pads with id 0 ('!'); the first
                # tokenizer pads with EOS (transformers CLIPTokenizer)
                load_clip_tokenizer(d, vocab_size=c.vocab_size,
                                    pad_with_eos=(i == 0))
                for i, (d, c) in enumerate(zip(tok_dirs, spec.text_encoders)))

            sample = jnp.zeros((1, spec.unet.in_channels, lat, lat), self.dtype)
            ctx = jnp.zeros((1, 77, spec.unet.cross_attention_dim), self.dtype)
            added = None
            if spec.unet.addition_embed_type == 'text_time':
                pooled_dim = (spec.text_encoders[-1].projection_dim
                              or spec.text_encoders[-1].hidden_size)
                added = {'text_embeds': jnp.zeros((1, pooled_dim), self.dtype),
                         'time_ids': jnp.zeros((1, 6), self.dtype)}

            def init_all():
                r1, r2, r3 = jax.random.split(rng, 3)
                # tap-free U-Net for param init (taps never affect params)
                unet_init = UNet2DConditionModel(cfg=spec.unet, dtype=self.dtype)
                p = {'unet': unet_init.init(r1, sample, 50, ctx, added)['params']}
                if self.vae is not None:
                    p['vae'] = self.vae.init(
                        r2, jnp.zeros((1, 3, sz, sz), self.dtype),
                        method=AutoencoderKL.full_pass)['params']
                p['text'] = []
                for i, te in enumerate(self.text_encoders):
                    ids = jnp.zeros((1, 77), jnp.int32)
                    p['text'].append(
                        te.init(jax.random.fold_in(r3, i), ids)['params'])
                return p

        if weights:
            # weights will replace EVERY leaf (convert_torch_state is
            # strict), so only the param SHAPES are needed up front:
            # jax.eval_shape allocates nothing.  Materializing a random
            # fp32 init first would double peak HBM (SDXL: +10.3 GiB) and
            # make real-size Flux-12B un-loadable on one chip outright.
            self.params = jax.eval_shape(init_all)
            self._load_weights(weights)
        else:
            self.params = init_all()
            if self.dtype != jnp.float32:
                # store weights at the compute dtype (reference keeps fp16
                # weights on GPU): halves HBM traffic and avoids per-op
                # casts.  Cast leaf-by-leaf with the fp32 tree dismantled
                # first so each source buffer frees as it converts — a
                # whole-tree tree_map holds both precisions at once
                # (SDXL random-init at bf16: 15.5 GiB transient, OOM on a
                # 16-GiB chip).
                tree, self.params = self.params, None
                leaves, treedef = jax.tree.flatten(tree)
                del tree
                for i, x in enumerate(leaves):
                    if hasattr(x, 'dtype') and x.dtype == jnp.float32:
                        leaves[i] = x.astype(self.dtype)
                self.params = jax.tree.unflatten(treedef, leaves)

    def _bundle_meta(self) -> dict:
        """The configuration a deployment bundle must be re-constructed
        under for its leaf list to match (see io/bundle.py)."""
        dtype_name = {jnp.float32: 'float32', jnp.bfloat16: 'bfloat16',
                      jnp.float16: 'float16'}.get(self.dtype, str(self.dtype))
        return {
            'version': self.version,
            'family': self.spec.family,
            'dtype': dtype_name,
            'transformer_8bit': bool(getattr(self.spec.dit, 'quantize_int8',
                                             False)
                                     if self.spec.dit is not None else False),
            't5_8bit': bool(getattr(getattr(self.spec, 't5', None),
                                    'quantize_int8', False)),
            'offline_lora': self._offline_lora,
        }

    def _bundle_tree(self) -> dict:
        """The param subtree a deployment bundle carries: the stack the
        facade itself converts (denoiser + vae + text encoders).
        'controlnet' params are re-converted at construction from the
        copied controlnet_* dirs."""
        return {k: self.params[k] for k in ('unet', 'vae', 'text')
                if k in self.params}

    def save_converted(self, out_dir: str) -> str:
        """Export a self-contained TPU deployment bundle to ``out_dir``.

        Writes the ALREADY CONVERTED param tree (at the serving dtype,
        including int8 kernels + scales and any merged LoRA deltas) plus
        copies of the source checkpoint's config.json / tokenizer /
        controlnet dirs.  A later ``FeatureExtractor(weights=out_dir, ...)``
        with the same configuration skips torch-format parsing, key
        renames, transposes, and quantization entirely — the serving
        warm-start path the reference lacks (it re-runs from_pretrained
        every process start, models.py:10-172).

        ControlNet/depth weights stay in their torch layout inside the
        bundle (small next to the denoiser); ``control=`` loads them from
        the bundle dir exactly as from a checkpoint dir.
        """
        from .io.bundle import save_bundle
        if not self._weights_root:
            raise ValueError(
                'save_converted requires the extractor to have been built '
                'from real weights (weights=<checkpoint dir>) — a '
                'random-init tree is not a deployable artifact')
        if not self.params.get('text'):
            raise ValueError(
                'the text encoders were offloaded persistently; rebuild '
                'the extractor before exporting a bundle')
        return save_bundle(self._bundle_tree(), out_dir,
                           meta=self._bundle_meta(),
                           src_checkpoint=self._weights_root)

    def _load_weights(self, root: str):
        """Fill the random-init trees from a local diffusers checkpoint dir."""
        import os
        from .io.bundle import is_bundle, load_bundle
        if is_bundle(root):
            if self._offline_lora:
                raise ValueError(
                    'offline_lora cannot be applied on top of a deployment '
                    'bundle: bundles carry already-merged weights — merge '
                    'the LoRA when exporting (build from the checkpoint '
                    'with offline_lora, then save_converted)')
            # offline_lora stays in the SAVED manifest as provenance, but is
            # excluded from the match check: a bundle carries already-merged
            # weights and can only ever be loaded with offline_lora=None
            # (raise above), so a path diff here would produce advice that
            # is impossible to follow
            expect = {k: v for k, v in self._bundle_meta().items()
                      if k != 'offline_lora'}
            loaded = load_bundle(root, self._bundle_tree(),
                                 expect_meta=expect)
            self.params.update(loaded)
            return
        denoiser_comp = ('transformer'
                         if self.spec.family in ('pixart', 'flux', 'hunyuan')
                         else 'unet')
        comp_map = [('unet', denoiser_comp)]
        if self.spec.vae is not None:          # IF is pixel-space: no VAE dir
            comp_map.append(('vae', 'vae'))
        for key, comp in comp_map:
            state = load_component_state(root, comp,
                                         variant=self._weights_variant)
            self.params[key], _, unused = convert_torch_state(
                state, self.params[key], dtype=self.dtype)
        from .models.convert import rename_for_text_encoder
        text_dirs = ['text_encoder', 'text_encoder_2']
        for i in range(len(self.text_encoders)):
            state = load_component_state(root, text_dirs[i],
                                         variant=self._weights_variant)
            state = rename_for_text_encoder(state, self.text_encoders[i])
            self.params['text'][i], _, _ = convert_torch_state(
                state, self.params['text'][i], dtype=self.dtype)

    # ---------------------------------------------------------------- prompts
    def encode_prompt(self, prompt_str: Optional[str] = None,
                      prompt_file: Optional[str] = None):
        """Returns the reference's 4-tuple contract
        (prompt_embeds, negative_prompt_embeds, pooled, negative_pooled)
        (diffusion_feature.py:203-206)."""
        assert (prompt_str is None) != (prompt_file is None)
        if prompt_file:
            with open(prompt_file) as f:
                prompts = f.read()
        else:
            prompts = prompt_str
        negative = ''

        if self.spec.family == 'pixart':
            # raw 4-tuple with attention masks (diffusion_feature.py:195-202)
            pe, mask = self._encode_t5(prompts)
            ne, nmask = self._encode_t5(negative)
            return pe, mask, ne, nmask

        if self.spec.family == 'flux':
            # CLIP pooled + T5 sequence (FluxPipeline.encode_prompt contract;
            # the reference feeds the raw string to the pipeline instead,
            # diffusion_feature.py:246-254 — extract() accepts both)
            return self._encode_flux(prompts)

        if self.spec.family == 'hunyuan':
            return self._encode_hunyuan(prompts)

        if self.spec.family == 'if':
            # T5 embeds, 2-tuple unpacking path (diffusion_feature.py:189-194)
            pe, _ = self._encode_t5(prompts)
            ne, _ = self._encode_t5(negative)
            return pe, ne, None, None

        if len(prompts.split(' ')) > 70:
            pe, ne = encode_long_prompt(self, prompts, negative)
            return pe, ne, None, None

        pe, pooled = self._encode_one(prompts)
        ne, neg_pooled = self._encode_one(negative)
        return pe, ne, pooled, neg_pooled

    def _require_text_params(self):
        if not self.params.get('text'):
            raise ValueError(
                'the text encoders were offloaded persistently '
                '(offload_prompt_encoder(persistent=True)); pass '
                'pre-encoded prompts, or rebuild the extractor to encode '
                'raw strings')

    def _encode_t5(self, text: str):
        self._require_text_params()
        tok = self.tokenizers[0]
        ids, mask = tok([text])
        ids = jnp.asarray(ids, jnp.int32)
        mask = jnp.asarray(mask, jnp.int32)
        emb = self.text_encoders[0].apply(
            {'params': self.params['text'][0]}, ids, mask)
        return emb, mask

    def _encode_flux(self, text: str):
        """Returns (t5_prompt_embeds, None, clip_pooled, None)."""
        self._require_text_params()
        clip_tok, t5_tok = self.tokenizers
        ids = jnp.asarray(clip_tok([text]), jnp.int32)
        _, pooled, _ = self.text_encoders[0].apply(
            {'params': self.params['text'][0]}, ids)
        t5_ids, _ = t5_tok([text])
        pe = self.text_encoders[1].apply(
            {'params': self.params['text'][1]}, jnp.asarray(t5_ids, jnp.int32))
        return pe, None, pooled, None

    def _encode_hunyuan(self, text: str):
        """Returns two nested pairs ``((bert_embeds, bert_mask),
        (t5_embeds, t5_mask))`` — the dual conditioning the HunyuanDiT
        pipeline feeds the transformer.  NOTE: this deliberately diverges
        from the other families' flat 4-tuple encode contract because the
        two streams travel together through ``_extract_hunyuan``."""
        self._require_text_params()
        bert_tok, t5_tok = self.tokenizers
        ids, mask = bert_tok([text])
        ids = jnp.asarray(ids, jnp.int32)
        mask = jnp.asarray(mask, jnp.int32)
        bert_emb = self.text_encoders[0].apply(
            {'params': self.params['text'][0]}, ids, mask)
        t5_ids, t5_mask = t5_tok([text])
        t5_ids = jnp.asarray(t5_ids, jnp.int32)
        t5_mask = jnp.asarray(t5_mask, jnp.int32)
        t5_emb = self.text_encoders[1].apply(
            {'params': self.params['text'][1]}, t5_ids, t5_mask)
        return (bert_emb, mask), (t5_emb, t5_mask)

    def _encode_one(self, text: str):
        self._require_text_params()
        spec = self.spec
        embeds, pooled = [], None
        for tok, te, params, cfg in zip(
                self.tokenizers, self.text_encoders, self.params['text'],
                spec.text_encoders):
            ids = jnp.asarray(tok([text]), jnp.int32)
            last, pool, hidden = te.apply({'params': params}, ids)
            if spec.clip_layer == 'penultimate':
                embeds.append(hidden[-2])
            else:
                embeds.append(last)
            pooled = pool  # last encoder's pooled wins (SDXL: text_encoder_2)
        pe = jnp.concatenate(embeds, axis=-1) if len(embeds) > 1 else embeds[0]
        if spec.clip_layer != 'penultimate':
            pooled = None
        return pe, pooled

    def offload_prompt_encoder(self, persistent: bool = False):
        """Free text-encoder memory (reference diffusion_feature.py:209-219).
        On TPU this drops the device buffers; with persistent=True the params
        are deleted outright."""
        if persistent:
            self.params['text'] = []
        else:
            self.params['text'] = jax.device_get(self.params['text'])

    # ----------------------------------------------------------------- images
    def preprocess_image(self, x, is_tensor: bool = False):
        if not is_tensor:
            return preprocess_pil_batch([x], self.img_size)
        return resize_tensor_batch(x, self.img_size)

    # ---------------------------------------------------------------- extract
    def extract(
        self,
        prompts,
        batch_size: int,
        image,
        image_type: str = 'image',
        t: int = 50,
        denoising_from: Optional[int] = None,
        use_control: bool = False,
        use_ddim_inversion: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        spec = self.spec

        if spec.family == 'flux':
            # pipeline-driven single-step path (reference
            # diffusion_feature.py:246-254): accepts the raw prompt string
            return self._extract_flux(prompts, batch_size, image, image_type, t)

        if spec.family == 'hunyuan':
            # pipeline-driven single-step path (reference :236-244; overlay
            # pipeline_hunyuandit.py:1080 early return)
            return self._extract_hunyuan(prompts, batch_size, image,
                                         image_type, t)

        if use_ddim_inversion and (
                spec.family != 'unet'
                or getattr(spec.unet, 'addition_embed_type', None) is not None
                or spec.scheduler_config.prediction_type != 'epsilon'):
            # the reference only exercises DDIM inversion on the epsilon SD
            # U-Nets (1-5/2-1); SDXL needs micro-conditioning the inversion
            # loop doesn't thread, and v-prediction breaks its algebra
            raise NotImplementedError(
                'use_ddim_inversion supports the epsilon-prediction SD '
                "U-Net families ('1-5'/'2-1'), as in the reference")

        enc_mask = None
        if spec.family == 'pixart':
            pe, enc_mask, _, _ = prompts
            pooled = None
            enc_mask = jnp.broadcast_to(
                jnp.asarray(enc_mask), (batch_size,) + tuple(np.shape(enc_mask)[1:]))
        elif spec.clip_layer == 'penultimate':
            pe, ne, pooled, neg_pooled = prompts
        else:
            pe, ne, pooled, neg_pooled = prompts[0], prompts[1], None, None
        pe = jnp.broadcast_to(jnp.asarray(pe, self.dtype),
                              (batch_size,) + tuple(np.shape(pe)[1:]))
        if pooled is not None:
            pooled = jnp.broadcast_to(jnp.asarray(pooled, self.dtype),
                                      (batch_size,) + tuple(np.shape(pooled)[1:]))

        # image preprocessing (host)
        if image_type == 'image':
            img = preprocess_pil_batch(image, self.img_size)
        else:
            img = resize_tensor_batch(image, self.img_size)
        img = jnp.asarray(img, self.dtype)

        # control images: host preprocessing only; the ControlNet forward runs
        # inside the jitted step (reference runs it eagerly, :409-441)
        control_args = ()
        if use_control and self.control_pipe is not None:
            if image_type == 'image':
                raw = image
            else:
                raw = self.control_pipe.tensors_to_pil(img)
            control_args = self.control_pipe.prepare_control_images(
                raw, batch_size)

        self._rng, step_rng = jax.random.split(self._rng)
        if denoising_from is None and not use_ddim_inversion:
            # t-generic program: the scheduler's timestep-dependent scalars
            # travel as runtime arguments, so sweeping t (segmentation
            # random-t training, extract_ensemble) reuses ONE compiled
            # program instead of compiling per t
            fn = self._get_step_fn_generic(
                bool(use_control and self.control_pipe))
            kit = {k: jnp.float32(v)
                   for k, v in self._img2img_kit(int(t)).items()}
            feats = fn(self.params, img, pe, pooled, enc_mask, step_rng,
                       kit, *control_args)
        else:
            fn = self._get_step_fn(int(t),
                                   None if denoising_from is None else int(denoising_from),
                                   bool(use_control and self.control_pipe),
                                   bool(use_ddim_inversion))
            feats = fn(self.params, img, pe, pooled, enc_mask, step_rng,
                       *control_args)

        if self.store_idx is not None:
            self._background_feats = select_background_encounters(
                feats, self.store_idx)
        return feats

    def extract_ensemble(self, prompts, batch_size: int, image,
                         image_type: str = 'image', ts: Sequence[int] = (50,),
                         prompt_list: Optional[Sequence] = None,
                         concat: bool = True):
        """Multi-timestep / multi-prompt ensembling: extract at every t in
        ``ts`` (crossed with every prompt in ``prompt_list`` when given) and
        channel-concat per layer — the ensembling pattern the reference's
        tasks build by hand (segmentation random-t lists, correspondence
        multi-extractor stacks).

        Returns {layer: (B, len(ts)*len(prompts)*C, h, w)} when ``concat``,
        else {(t_index, prompt_index): features}.
        """
        prompt_sets = list(prompt_list) if prompt_list is not None else [prompts]
        per = {}
        for pi, p in enumerate(prompt_sets):
            for ti, t in enumerate(ts):
                per[(ti, pi)] = self.extract(p, batch_size, image,
                                             image_type=image_type, t=int(t))
        if not concat:
            return per
        out = {}
        first = per[(0, 0)]
        for layer in first:
            out[layer] = jnp.concatenate(
                [per[k][layer] for k in sorted(per)], axis=1)
        return out

    def _extract_flux(self, prompts, batch_size: int, image,
                      image_type: str, t: int):
        if isinstance(prompts, str):
            prompts = self._encode_flux(prompts)
        pe, _, pooled, _ = prompts
        pe = jnp.broadcast_to(jnp.asarray(pe, self.dtype),
                              (batch_size,) + tuple(np.shape(pe)[1:]))
        pooled = jnp.broadcast_to(jnp.asarray(pooled, self.dtype),
                                  (batch_size,) + tuple(np.shape(pooled)[1:]))
        if image_type == 'image':
            img = preprocess_pil_batch(image, self.img_size)
        else:
            img = resize_tensor_batch(image, self.img_size)
        img = jnp.asarray(img, self.dtype)
        self._rng, step_rng = jax.random.split(self._rng)
        kit = {k: jnp.float32(v) for k, v in self._flux_kit(int(t)).items()}
        feats = self._get_flux_step_fn()(self.params, img, pe, pooled,
                                         step_rng, kit)
        if self.store_idx is not None:
            self._background_feats = select_background_encounters(
                feats, self.store_idx)
        return feats

    def _extract_hunyuan(self, prompts, batch_size: int, image,
                         image_type: str, t: int):
        if isinstance(prompts, str):
            prompts = self._encode_hunyuan(prompts)
        (bert_emb, bert_mask), (t5_emb, t5_mask) = prompts

        def bcast(x):
            return jnp.broadcast_to(jnp.asarray(x),
                                    (batch_size,) + tuple(np.shape(x)[1:]))
        bert_emb, bert_mask = bcast(bert_emb), bcast(bert_mask)
        t5_emb, t5_mask = bcast(t5_emb), bcast(t5_mask)
        if image_type == 'image':
            img = preprocess_pil_batch(image, self.img_size)
        else:
            img = resize_tensor_batch(image, self.img_size)
        img = jnp.asarray(img, self.dtype)
        self._rng, step_rng = jax.random.split(self._rng)
        kit = {k: jnp.float32(v) for k, v in self._hunyuan_kit(int(t)).items()}
        feats = self._get_hunyuan_step_fn()(
            self.params, img, bert_emb, bert_mask, t5_emb, t5_mask, step_rng,
            kit)
        if self.store_idx is not None:
            self._background_feats = select_background_encounters(
                feats, self.store_idx)
        return feats

    def _hunyuan_kit(self, t: int, num_inference_steps: int = 50):
        """Host scalars for the Hunyuan pipeline path: scheduler-mapped
        timestep + DDPM noise-injection coefficients, so t is a runtime
        argument of one compiled program."""
        sched = self.scheduler
        state = sched.set_timesteps(num_inference_steps)
        timesteps, _ = sched.get_timesteps(state, num_inference_steps,
                                           t / 1000)
        latent_t = int(timesteps[0])
        a = float(sched.alphas_cumprod[latent_t])
        return {'T': float(latent_t), 'A': float(np.sqrt(a)),
                'B': float(np.sqrt(1 - a))}

    def _get_hunyuan_step_fn(self, num_inference_steps: int = 50):
        key = ('hunyuan', num_inference_steps)
        if key in self._fn_cache:
            return self._fn_cache[key]
        """VAE encode -> DDPM add_noise at the img2img timestep -> ONE
        HunyuanDiT forward with taps (the reference pipeline's first-step
        early return).  Timestep scalars arrive via the kit argument."""
        vae = self.vae
        unet = self.unet

        def step(params, img, bert_emb, bert_mask, t5_emb, t5_mask, rng, kit):
            r1, r2 = jax.random.split(rng)
            latents = vae.apply({'params': params['vae']}, img, r1)
            dt = latents.dtype
            noise = normal_like(r2, latents.shape, dt)
            latents = kit['A'].astype(dt) * latents + kit['B'].astype(dt) * noise
            out, tap_state = unet.apply(
                {'params': params['unet']}, latents, kit['T'],
                bert_emb, bert_mask, t5_emb, t5_mask,
                mutable=['taps', 'attn_store'])
            return self._collect_feats(tap_state)

        self._fn_cache[key] = self._jit_sharded(step)
        return self._fn_cache[key]

    def _flux_kit(self, t: int, num_inference_steps: int = 28):
        """Host scalars for the Flux pipeline path: flow-match sigma(t)
        under the resolution-shifted schedule (x_t = A*x0 + B*eps with
        A = 1-sigma, B = sigma)."""
        from .schedulers.flow_match import calculate_shift
        sched = self.scheduler
        lat = self.img_size // self.vae_scale
        seq_len = (lat // 2) ** 2
        sigmas = np.linspace(1.0, 1.0 / num_inference_steps,
                             num_inference_steps)
        mu = calculate_shift(seq_len, sched.config)
        state = sched.set_timesteps(num_inference_steps, mu=mu, sigmas=sigmas)
        timesteps, _ = sched.get_timesteps(state, num_inference_steps,
                                           t / 1000)
        latent_t = float(timesteps[0])
        sigma = float(state.sigmas[sched._index(state, latent_t)])
        return {'T': latent_t, 'A': 1.0 - sigma, 'B': sigma}

    def _get_flux_step_fn(self, num_inference_steps: int = 28):
        key = ('flux', num_inference_steps)
        if key in self._fn_cache:
            return self._fn_cache[key]
        """One jitted program: VAE encode -> flow-match noise scale at
        sigma(t) -> 2x2 pack -> single Flux forward with taps (the
        reference's early-``return`` pipeline path, overlay
        pipeline_flux_img2img.py:841).  Timestep scalars arrive via the
        kit argument."""
        from .models.flux import pack_latents

        vae = self.vae
        unet = self.unet

        def step(params, img, pe, pooled, rng, kit):
            r1, r2 = jax.random.split(rng)
            latents = vae.apply({'params': params['vae']}, img, r1)
            dt = latents.dtype
            noise = normal_like(r2, latents.shape, dt)
            latents = kit['A'].astype(dt) * latents + kit['B'].astype(dt) * noise
            packed = pack_latents(latents)
            _, tap_state = unet.apply(
                {'params': params['unet']}, packed, kit['T'], pe, pooled,
                mutable=['taps', 'attn_store'])
            return self._collect_feats(tap_state)

        self._fn_cache[key] = self._jit_sharded(step)
        return self._fn_cache[key]

    def _added_cond(self, pooled, bsz):
        """SDXL text_time micro-conditioning dict (diffusion_feature.py:534)
        — shared by every step builder so the paths cannot drift."""
        spec = self.spec
        if not (spec.unet is not None
                and getattr(spec.unet, 'addition_embed_type', None)
                == 'text_time'):
            return None
        s = float(self.img_size)
        time_ids = jnp.asarray(
            [[s, s, 0.0, 0.0, s, s]], self.dtype).repeat(bsz, axis=0)
        return {'text_embeds': pooled, 'time_ids': time_ids}

    def _collect_feats(self, tap_state):
        """Shared extraction tail: tap flatten/post-process + attention-store
        aggregation (reference feature store + aggregate_attention)."""
        feats = postprocess_taps(flatten_taps(tap_state.get('taps', {})),
                                 resize_ratio=self.feature_resize,
                                 out_dtype=self.feature_dtype)
        if self.attention:
            agg = _aggregate_attention(
                flatten_taps(tap_state.get('attn_store', {})),
                self.attention, self.img_size, self.feature_dtype)
            if agg is not None:
                feats['attn'] = agg
        return feats

    def _img2img_kit(self, t: int) -> Dict[str, float]:
        """Host-side scalars for one img2img extraction step at ``t``.

        Everything timestep-dependent in the single-step program reduces to
        seven floats, so ``t`` can be a RUNTIME argument of one jitted
        program instead of a compile-time constant (a program per t):

          T        scheduler-mapped model timestep (reference
                   ``t = timesteps[:1]``, diffusion_feature.py:295)
          A, B     noise injection  latents <- A*latents + B*noise
                   (DDPM-family sqrt(ᾱ)/sqrt(1-ᾱ); Euler 1/σ)
          S        scale_model_input divisor (Euler sqrt(σ²+1), else 1)
          X1,X2    x0 reconstruction  x0 = X1*latents + X2*model_output
                   (prediction-type- AND family-correct: Euler v-pred
                   differs from the DDPM-family formula)
          C1,C2,C3 one *fresh-state* scheduler step for the vae-out decode
                   (diffusion_feature.py:477-485):
                   prev = C1*x0 + C2*latents + C3*model_output
        """
        cache = getattr(self, '_kit_cache', None)
        if cache is None:
            cache = self._kit_cache = {}
        if t in cache:
            return cache[t]
        from .schedulers.diffusion import (
            DDIMScheduler, DDPMScheduler, DPMSolverMultistepScheduler,
            EulerDiscreteScheduler, PNDMScheduler,
        )
        sched = self.scheduler
        state = sched.set_timesteps(1000)
        timesteps, _ = sched.get_timesteps(state, 1000, t / 1000)
        lt = timesteps[0]
        pred = sched.config.prediction_type
        acp = getattr(sched, 'alphas_cumprod', None)

        if isinstance(sched, EulerDiscreteScheduler):
            idx = sched._sigma_index(state, lt)
            sigma = float(state.sigmas[idx])
            sigma_next = float(state.sigmas[idx + 1])
            A, B, S = 1.0, sigma, float(np.sqrt(sigma ** 2 + 1))
            if pred == 'v_prediction':
                c = sigma ** 2 + 1
                X1, X2 = 1.0 / c, float(-sigma / np.sqrt(c))
            elif pred == 'sample':
                X1, X2 = 0.0, 1.0
            else:
                X1, X2 = 1.0, -sigma
            r = (sigma_next - sigma) / sigma
            C1, C2, C3 = -r, 1.0 + r, 0.0
        elif isinstance(sched, DPMSolverMultistepScheduler):
            ts = np.asarray(state.timesteps)
            idx = int(np.nonzero(ts == int(lt))[0][0])
            prev_t = int(ts[idx + 1]) if idx + 1 < len(ts) else 0
            ti = int(lt)
            A = float(np.sqrt(acp[ti]))
            B = float(np.sqrt(1 - acp[ti]))
            S = 1.0
            h = sched._lambda_t[prev_t] - sched._lambda_t[ti]
            # first step: ets empty -> d = x0 (step() above)
            C1 = float(-sched._alpha_t[prev_t] * np.expm1(-h))
            C2 = float(sched._sigma_t[prev_t] / sched._sigma_t[ti])
            C3 = 0.0
        elif isinstance(sched, PNDMScheduler):
            ti = int(lt)
            step_size = (sched.config.num_train_timesteps
                         // state.num_inference_steps)
            prev_t = ti - step_size
            a_t = float(acp[ti])
            a_prev = float(acp[prev_t]) if prev_t >= 0 else 1.0
            A, B, S = float(np.sqrt(a_t)), float(np.sqrt(1 - a_t)), 1.0
            beta_t, beta_prev = 1 - a_t, 1 - a_prev
            denom = a_t * np.sqrt(beta_prev) + np.sqrt(a_t * beta_t * a_prev)
            # counter-0 PLMS: out = model_output (after the v-pred
            # transform, folded host-side below); prev from _get_prev_sample
            C1 = 0.0
            C2 = float(np.sqrt(a_prev / a_t))
            C3 = float(-(a_prev - a_t) / denom)
            if pred == 'v_prediction':
                # out' = sqrt(a_t)*mo + sqrt(beta_t)*sample
                C2 += C3 * float(np.sqrt(beta_t))
                C3 *= float(np.sqrt(a_t))
        elif isinstance(sched, DDIMScheduler):
            ti = int(lt)
            step_size = (sched.config.num_train_timesteps
                         // state.num_inference_steps)
            prev_t = ti - step_size
            a_t = float(acp[ti])
            a_prev = (float(acp[prev_t]) if prev_t >= 0
                      else sched.final_alpha_cumprod)
            A, B, S = float(np.sqrt(a_t)), float(np.sqrt(1 - a_t)), 1.0
            # prev = sqrt(a_prev)*x0 + sqrt(1-a_prev)*eps; eps folded for
            # the pred type (epsilon: eps = mo; v: eps = A*mo + B*sample)
            C1 = float(np.sqrt(a_prev))
            if pred == 'v_prediction':
                C2 = float(np.sqrt(1 - a_prev)) * B
                C3 = float(np.sqrt(1 - a_prev)) * A
            elif pred == 'sample':
                # eps = (sample - sqrt(a_t)·x0)/sqrt(1-a_t), x0 = out
                C2 = float(np.sqrt(1 - a_prev)) / B
                C3 = float(-np.sqrt(1 - a_prev) * A / B)
            else:
                C2 = 0.0
                C3 = float(np.sqrt(1 - a_prev))
        else:                                   # DDPM (IF / Hunyuan config)
            assert isinstance(sched, DDPMScheduler), type(sched)
            ti = int(lt)
            step_size = (sched.config.num_train_timesteps
                         // state.num_inference_steps)
            prev_t = ti - step_size
            a_t = float(acp[ti])
            a_prev = float(acp[prev_t]) if prev_t >= 0 else 1.0
            A, B, S = float(np.sqrt(a_t)), float(np.sqrt(1 - a_t)), 1.0
            beta_prod = 1 - a_t
            current_beta = 1 - a_t / a_prev
            C1 = float(np.sqrt(a_prev) * current_beta / beta_prod)
            C2 = float(np.sqrt(a_t / a_prev) * (1 - a_prev) / beta_prod)
            C3 = 0.0

        if not isinstance(sched, EulerDiscreteScheduler):
            # DDPM-family x0 algebra (Euler computed its own above)
            if pred == 'sample':
                # step() takes x0 = model_output directly (_predict_x0_eps);
                # DDPM/DPM's C-coefficients multiply x0 so no further change,
                # DDIM's eps-fold is handled in its branch above.  PNDM is
                # the one family whose PLMS fold has no 'sample' form
                # (diffusers' PNDM step_plms raises for it too)
                if isinstance(sched, PNDMScheduler):
                    raise NotImplementedError(
                        "prediction_type='sample' with PNDMScheduler")
                X1, X2 = 0.0, 1.0
            elif pred == 'v_prediction':
                X1, X2 = A, -B
            else:
                X1, X2 = 1.0 / A, -B / A
        kit = {'T': float(lt), 'A': A, 'B': B, 'S': S,
               'X1': float(X1), 'X2': float(X2),
               'C1': C1, 'C2': C2, 'C3': C3}
        cache[t] = kit
        return kit

    def _get_step_fn_generic(self, use_control: bool):
        """The t-generic single-step extraction program (see _img2img_kit):
        one compiled XLA program serves every timestep."""
        key = ('stepT', use_control)
        if key in self._fn_cache:
            return self._fn_cache[key]
        spec = self.spec
        unet = self.unet
        vae = self.vae
        feature_dtype = self.feature_dtype
        store_vae_output = self.store_vae_output
        is_pixart = spec.family == 'pixart'
        added_cond = self._added_cond
        # mirror DDPMScheduler.step's x0 clamp (diffusion.py:199-201) so the
        # t-generic vae-out matches sched.step exactly; the other scheduler
        # families' step() never clamps
        from .schedulers.diffusion import DDPMScheduler
        x0_clamp = None
        if isinstance(self.scheduler, DDPMScheduler):
            if self.scheduler.config.thresholding:
                x0_clamp = 'threshold'
            elif self.scheduler.config.clip_sample:
                x0_clamp = 'clip'

        def step(params, img, pe, pooled, enc_mask, rng, kit, *control_args):
            rng_vae, rng_noise = jax.random.split(rng)
            if spec.is_pixel_space:
                latents = img
            else:
                latents = vae.apply({'params': params['vae']}, img, rng_vae,
                                    method=AutoencoderKL.__call__)
            dt = latents.dtype
            noise = normal_like(rng_noise, latents.shape, dt)
            latents = (kit['A'].astype(dt) * latents
                       + kit['B'].astype(dt) * noise)
            lat_in = latents / kit['S'].astype(dt)
            T = kit['T']

            down_res = mid_res = None
            if use_control:
                down_res, mid_res = self.control_pipe.encode_all(
                    params['controlnet'], lat_in, T, pe, control_args,
                    added_cond(pooled, lat_in.shape[0]))
            if is_pixart:
                out, tap_state = unet.apply(
                    {'params': params['unet']}, lat_in, T, pe, enc_mask,
                    mutable=['taps', 'attn_store'])
                out = out[:, :latents.shape[1]]
            else:
                out, tap_state = unet.apply(
                    {'params': params['unet']}, lat_in, T, pe,
                    added_cond(pooled, latents.shape[0]),
                    down_block_additional_residuals=down_res,
                    mid_block_additional_residual=mid_res,
                    mutable=['taps', 'attn_store'])

            feats = self._collect_feats(tap_state)

            if store_vae_output:
                # one fresh-state scheduler step + decode
                # (diffusion_feature.py:477-485)
                x0 = (kit['X1'].astype(dt) * latents
                      + kit['X2'].astype(dt) * out)
                if x0_clamp == 'threshold':
                    x0 = self.scheduler._threshold(x0)
                elif x0_clamp == 'clip':
                    x0 = jnp.clip(x0, -1.0, 1.0)
                lat2 = (kit['C1'].astype(dt) * x0
                        + kit['C2'].astype(dt) * latents
                        + kit['C3'].astype(dt) * out)
                decoded = vae.apply(
                    {'params': params['vae']},
                    lat2 / spec.vae.scaling_factor + spec.vae.shift_factor,
                    method=AutoencoderKL.decode)
                feats['vae-out'] = decoded.astype(feature_dtype
                                                  or decoded.dtype)
            return feats

        self._fn_cache[key] = self._jit_sharded(step)
        return self._fn_cache[key]

    def _get_step_fn(self, t: int, denoising_from: Optional[int],
                     use_control: bool, use_ddim_inversion: bool,
                     unroll_denoise: bool = False):
        """Build & jit the fused extraction step for a given timestep config.

        Reproduces reference extract() steps 3-9 (diffusion_feature.py:288-517)
        as one XLA program.
        """
        key = ('step', t, denoising_from, use_control, use_ddim_inversion,
               unroll_denoise)
        if key in self._fn_cache:
            return self._fn_cache[key]
        spec = self.spec
        sched = self.scheduler
        state = sched.set_timesteps(1000)
        if denoising_from is None:
            timesteps, _ = sched.get_timesteps(state, 1000, t / 1000)
            latent_t = timesteps[0]
            # reference sets t = timesteps[:1] (diffusion_feature.py:295): the
            # denoiser forward must run at the scheduler-mapped timestep, not
            # the caller's raw t (they differ for spacing/offset edge cases)
            t = float(latent_t)
            denoise_ts = []
        else:
            # multi-step denoising_from path (diffusion_feature.py:296-320)
            if denoising_from - t <= 50:
                timesteps, _ = sched.get_timesteps(state, 1000, denoising_from / 1000)
            else:
                state = sched.set_timesteps(100)
                timesteps, _ = sched.get_timesteps(state, 100, denoising_from / 100)
            n = len([ts for ts in timesteps if ts >= t])
            timesteps = timesteps[:n]
            latent_t = timesteps[0]
            denoise_ts = list(timesteps[:-1])
            t = timesteps[-1]

        unet = self.unet
        vae = self.vae
        feature_dtype = self.feature_dtype

        is_pixart = spec.family == 'pixart'
        added_cond = self._added_cond
        # denoising_from walk: per-position coefficient rows so the N
        # intermediate forwards run under one lax.scan body (same machinery
        # as the sampling loop; PLMS history rides the carry).  Intermediate
        # tap/attn-store encounters are discarded either way — the reference
        # store's last-write-wins semantics keep only the final forward.
        denoise_plan = None
        if denoise_ts and not unroll_denoise and hasattr(sched, 'scan_plan'):
            denoise_plan = sched.scan_plan(
                state, timesteps=np.asarray(denoise_ts))

        def denoiser_apply(params, model_in, timestep, pe, pooled, enc_mask,
                           down_res=None, mid_res=None):
            """One denoiser forward on an already-scaled input; timestep may
            be static (final forward) or traced (scan walk)."""
            if is_pixart:
                out, tap_state = unet.apply(
                    {'params': params['unet']}, model_in, timestep, pe,
                    enc_mask, mutable=['taps', 'attn_store'])
                # learned-sigma models return 2x latent channels; the noise
                # prediction is the first half (diffusers scheduler contract)
                out = out[:, :model_in.shape[1]]
            else:
                out, tap_state = unet.apply(
                    {'params': params['unet']}, model_in, timestep, pe,
                    added_cond(pooled, model_in.shape[0]),
                    down_block_additional_residuals=down_res,
                    mid_block_additional_residual=mid_res,
                    mutable=['taps', 'attn_store'])
            return out, tap_state

        def unet_forward(params, latents, timestep, pe, pooled, enc_mask,
                         down_res=None, mid_res=None):
            lat_in = sched.scale_model_input(state, latents, timestep)
            return denoiser_apply(params, lat_in, float(timestep), pe, pooled,
                                  enc_mask, down_res, mid_res)

        def step(params, img, pe, pooled, enc_mask, rng, *control_args):
            rng_vae, rng_noise = jax.random.split(rng)
            if spec.is_pixel_space:
                latents = img
            elif use_ddim_inversion:
                from .ddim_inversion import ddim_invert
                latents = ddim_invert(self, params, img, pe, stop_at_t=t,
                                      rng=rng_vae)
            else:
                latents = vae.apply({'params': params['vae']}, img, rng_vae,
                                    method=AutoencoderKL.__call__)
            if not use_ddim_inversion:
                noise = normal_like(rng_noise, latents.shape, latents.dtype)
                latents = sched.add_noise(state, latents, noise, latent_t)

            if denoise_plan is not None:
                plan = {k: jnp.asarray(v) for k, v in denoise_plan.items()}
                extra0 = sched.scan_carry_init(latents)

                def walk(carry, row):
                    lat, extra = carry
                    model_in = lat
                    if 'scale' in plan:
                        model_in = model_in * row['scale'].astype(lat.dtype)
                    out, _ = denoiser_apply(params, model_in,
                                            row['timestep'], pe, pooled,
                                            enc_mask)
                    lat, extra = sched.scan_step(row, out, lat, None, extra)
                    return (lat, extra), None

                (latents, _), _ = jax.lax.scan(
                    walk, (latents, extra0), plan)
            else:
                st = state
                for ts in denoise_ts:
                    noise_pred, _ = unet_forward(params, latents, ts, pe,
                                                 pooled, enc_mask)
                    latents, st = sched.step(st, noise_pred, ts, latents)

            down_res = mid_res = None
            if use_control:
                # ControlNet encodes the *scaled* latent input (reference
                # diffusion_feature.py:406-413) with summed multi-net residuals
                lat_in = sched.scale_model_input(state, latents, t)
                down_res, mid_res = self.control_pipe.encode_all(
                    params['controlnet'], lat_in, float(t), pe, control_args,
                    added_cond(pooled, lat_in.shape[0]))
            noise_pred, tap_state = unet_forward(
                params, latents, t, pe, pooled, enc_mask, down_res, mid_res)

            feats = self._collect_feats(tap_state)
            if self.store_vae_output:
                # decode one denoised step (diffusion_feature.py:477-485)
                lat2, _ = sched.step(state, noise_pred, t, latents)
                decoded = vae.apply(
                    {'params': params['vae']},
                    lat2 / spec.vae.scaling_factor + spec.vae.shift_factor,
                    method=AutoencoderKL.decode)
                feats['vae-out'] = decoded.astype(feature_dtype or decoded.dtype)
            return feats

        self._fn_cache[key] = self._jit_sharded(step)
        return self._fn_cache[key]

    def _jit_sharded(self, step):
        """jit the extraction step; with a mesh, shard the image batch over
        'dp' and (optionally) the denoiser weights over 'tp' so multi-chip
        extraction scales without code changes — the TPU-native replacement
        for the reference's thread-per-GPU placement (SURVEY §2.12/§5.8).

        Param placement is done ONCE and cached on the instance: the jitted
        program doesn't need a fresh host round-trip per call once params are
        resident (a second ``extract()`` issues no param transfers).  The
        cache is invalidated when any leaf of ``self.params`` is replaced
        (LoRA merge, offload, train step) or the mesh changes.
        """
        if self.mesh is None:
            return jax.jit(step)
        from jax.sharding import NamedSharding, PartitionSpec as P
        batch_sh = NamedSharding(self.mesh, P('dp'))
        repl = NamedSharding(self.mesh, P())
        param_shardings = self._param_shardings(repl)

        jitted = jax.jit(step)

        def place(params):
            leaves = jax.tree.leaves(params)
            key = (id(self.mesh), tuple(id(l) for l in leaves))
            cached = getattr(self, '_placed_params', None)
            if cached is not None and cached[0] == key:
                return cached[1]
            placed = jax.tree.map(
                lambda x, sh: jax.device_put(x, sh)
                if getattr(x, 'ndim', None) is not None else x,
                params, param_shardings(params))
            # keep strong refs to the keyed leaves: pins their id()s for the
            # cache's lifetime, so CPython id reuse after a freed tree can
            # never produce a false hit with stale placed weights
            self._placed_params = (key, placed, leaves)
            return placed

        def wrapped(params, img, *rest):
            # batches that don't divide the dp axis (e.g. sample() with the
            # default batch_size=1 on a dp=4 mesh) fall back to replicated
            # placement — correct, just without the dp speedup — instead of
            # crashing in device_put with an unpartitionable-axis error
            n_dp = dict(self.mesh.shape).get('dp', 1)
            divisible = n_dp <= 1 or np.shape(img)[0] % n_dp == 0
            img = jax.device_put(img, batch_sh if divisible else repl)
            # trace inside the mesh context so bare-PartitionSpec sharding
            # constraints (sequence parallelism, models/flux.py) resolve
            with self.mesh:
                return jitted(place(params), img, *rest)

        return wrapped

    def _param_shardings(self, repl):
        """Return a fn mapping a param tree -> same-structure tree of
        NamedShardings: replicated everywhere, except the denoiser weights
        follow the tensor-parallel rules when the mesh has a 'tp' axis >1
        (VERDICT round-1 item 4: tp reachable from the facade)."""
        use_tp = (self.mesh is not None and 'tp' in self.mesh.axis_names
                  and self.mesh.shape['tp'] > 1)
        if not use_tp:
            return lambda params: jax.tree.map(lambda _: repl, params)
        from .parallel.mesh import denoiser_param_shardings

        def shardings(params):
            out = {}
            for k, v in params.items():
                if k == 'unet':
                    out[k] = denoiser_param_shardings(
                        self.mesh, v, family=self.spec.family)
                else:
                    out[k] = jax.tree.map(lambda _: repl, v)
            return out

        return shardings

    # --------------------------------------------------------------- sampling
    def sample(self, prompts, batch_size: int = 1,
               num_inference_steps: int = 50, guidance_scale: float = 7.5,
               return_features: bool = True, unrolled: bool = False):
        """Full text2img generation with taps firing at every denoise step —
        the substrate for background extraction (reference
        generate_with_extraction.py: a stock StableDiffusionPipeline run with
        the store capturing selected U-Net-call encounters).

        Covers every zoo family: U-Nets, IF, PixArt (reference
        np_inference_call parity), HunyuanDiT and Flux — the reference's
        patched hunyuan/flux pipelines cannot generate at all (their denoise
        loops early-return after one step); here generation follows the
        stock HunyuanDiTPipeline / FluxPipeline semantics.  hunyuan and flux
        accept a raw prompt string like their extract() paths; for flux,
        guidance_scale feeds the guidance-distilled embedding (sensible
        value 3.5) instead of a CFG double-batch.

        Returns (images (B,3,H,W) in [0,1], features) where features maps
        layer -> tuple of per-encounter tensors (CFG-doubled batch, exactly
        what the reference's store sees).  With set_background_extraction()
        active, get_background_extraction() returns the filtered
        {layer: {step_idx: tensor}} view afterwards.
        """
        spec = self.spec
        if spec.family not in ('unet', 'if', 'pixart', 'hunyuan', 'flux'):
            raise NotImplementedError(
                f'sampling loop does not cover family {spec.family!r}')

        def bcast(x, dtype=None):
            if x is None:
                return None
            return jnp.broadcast_to(
                jnp.asarray(x, dtype or self.dtype),
                (batch_size,) + tuple(np.shape(x)[1:]))

        enc_mask = None
        if spec.family == 'flux':
            # Flux.1-dev is guidance-distilled: no CFG pass — guidance_scale
            # rides the guidance embedding instead (stock FluxPipeline
            # semantics; the reference's patched pipeline cannot generate at
            # all, its denoise loop early-returns — overlay
            # pipeline_flux_img2img.py:841).  Accepts a raw prompt string
            # like the flux extract() path.
            if isinstance(prompts, str):
                prompts = self._encode_flux(prompts)
            pe, _, pooled, _ = prompts
            ne = neg_pooled = None
            pe, pooled = bcast(pe), bcast(pooled)
        elif spec.family == 'hunyuan':
            # dual-stream conditioning (BERT 77 + T5 256) with masks; the T5
            # stream rides the generic sampler's pooled slot.  Semantics
            # follow the stock HunyuanDiTPipeline ([negative; positive] CFG
            # order, learned-sigma halves dropped before the DDPM step) —
            # the reference's patched pipeline cannot generate (overlay
            # pipeline_hunyuandit.py:1080 early return).
            pos, neg = self._hunyuan_sample_prompts(prompts, guidance_scale)
            (pe, bmask), (t5, tmask) = pos
            pe, pooled = bcast(pe), bcast(t5)
            bmask = bcast(bmask, jnp.int32)
            tmask = bcast(tmask, jnp.int32)
            if neg is not None:
                (ne, nbmask), (nt5, ntmask) = neg
                ne, neg_pooled = bcast(ne), bcast(nt5)
                enc_mask = (
                    jnp.concatenate([bcast(nbmask, jnp.int32), bmask]),
                    jnp.concatenate([bcast(ntmask, jnp.int32), tmask]))
            else:
                ne = neg_pooled = None
                enc_mask = (bmask, tmask)
        elif spec.family == 'pixart':
            # encode_prompt's raw 4-tuple with attention masks
            # (diffusion_feature.py:195-202); context order under CFG is
            # [negative; positive], so the masks concat the same way
            pe, mask, ne, nmask = prompts
            pooled = neg_pooled = None
            mask = bcast(mask, jnp.int32)
            nmask = bcast(nmask, jnp.int32)
            enc_mask = (jnp.concatenate([nmask, mask])
                        if guidance_scale > 1.0 else mask)
        else:
            pe, ne, pooled, neg_pooled = prompts
        pe, ne = bcast(pe), bcast(ne)
        pooled, neg_pooled = bcast(pooled), bcast(neg_pooled)
        self._rng, rng = jax.random.split(self._rng)
        fn = self._get_sample_fn(int(num_inference_steps),
                                 float(guidance_scale), bool(unrolled))
        images, feats = fn(self.params, pe, ne, pooled, neg_pooled, rng,
                           enc_mask)
        if self.store_idx is not None:
            self._background_feats = select_background_encounters(
                feats, self.store_idx)
        return images, (feats if return_features else None)

    def _hunyuan_sample_prompts(self, prompts, guidance_scale: float):
        """Resolve hunyuan sample() conditioning into (positive, negative)
        nested encode pairs.  Accepts a raw prompt string (the negative ''
        is encoded for CFG, HunyuanDiTPipeline's default), one
        encode_prompt() result, or a (positive, negative) pair of them."""
        do_cfg = guidance_scale > 1.0
        if isinstance(prompts, str):
            pos = self._encode_hunyuan(prompts)
            return pos, (self._encode_hunyuan('') if do_cfg else None)
        if isinstance(prompts[0][0], (tuple, list)):
            pos, neg = prompts
            return pos, (neg if do_cfg else None)
        if not do_cfg:
            return prompts, None
        if not self.params.get('text'):
            raise ValueError(
                'hunyuan sample() with guidance_scale > 1 needs a negative '
                'encoding: pass a raw prompt string, a (positive, negative) '
                'pair of encode_prompt() results, or keep the text encoders '
                'loaded so the empty negative prompt can be encoded here')
        return prompts, self._encode_hunyuan('')

    def _get_sample_fn(self, num_inference_steps: int, guidance_scale: float,
                       unrolled: bool = False):
        """Build & jit the generation loop.

        Schedulers with per-position coefficient rows (Euler/DDPM/
        DPM-Solver/PNDM — ``scan_plan``, schedulers/diffusion.py) run the
        denoise loop as ONE ``lax.scan`` body: cold-compile cost is one
        U-Net forward instead of ``num_inference_steps`` forwards traced
        into the graph (a many-minute difference at real size on this
        single-core host).  ``unrolled=True`` keeps the statically
        unrolled path; both produce identical images/features
        (regression-tested in tests/test_extras.py).
        """
        key = ('sample', num_inference_steps, guidance_scale, unrolled)
        if key in self._fn_cache:
            return self._fn_cache[key]
        spec = self.spec
        sched = self.scheduler
        is_flux = spec.family == 'flux'
        is_hunyuan = spec.family == 'hunyuan'
        lat = (self.img_size // self.vae_scale
               if not spec.is_pixel_space else self.img_size)
        if is_flux:
            # resolution-shifted rectified-flow schedule over the packed
            # token count (stock FluxPipeline: linspace sigmas + mu shift)
            from .schedulers.flow_match import calculate_shift
            sigmas = np.linspace(1.0, 1.0 / num_inference_steps,
                                 num_inference_steps)
            state0 = sched.set_timesteps(
                num_inference_steps,
                mu=calculate_shift((lat // 2) ** 2, sched.config),
                sigmas=sigmas)
        else:
            state0 = sched.set_timesteps(num_inference_steps)
        timesteps = list(state0.timesteps)
        # flux is guidance-distilled: guidance_scale feeds the guidance
        # embedding, never a CFG double-batch
        do_cfg = guidance_scale > 1.0 and not is_flux
        guidance_emb = guidance_scale * 1000.0  # FluxTransformer units
        unet = self.unet
        vae = self.vae
        lat_ch = (spec.unet.in_channels if spec.unet is not None
                  else spec.dit.in_channels if spec.family == 'pixart'
                  else spec.vae.latent_channels)
        added_static = (spec.unet is not None
                        and getattr(spec.unet, 'addition_embed_type', None)
                        == 'text_time')
        is_pixart = spec.family == 'pixart'
        img_size = self.img_size
        from .models.flux import pack_latents, unpack_latents
        from .schedulers.diffusion import DDPMScheduler
        is_ddpm = isinstance(sched, DDPMScheduler)
        use_scan = (not unrolled) and hasattr(sched, 'scan_plan')

        def added_cond(pooled, neg_pooled, bsz):
            if is_flux:
                return pooled  # CLIP pooled projections
            if is_hunyuan:
                # the T5 stream rides the pooled slot (see sample())
                return (jnp.concatenate([neg_pooled, pooled])
                        if do_cfg else pooled)
            if not added_static:
                return None
            s = float(img_size)
            time_ids = jnp.asarray(
                [[s, s, 0.0, 0.0, s, s]], self.dtype).repeat(
                2 * bsz if do_cfg else bsz, axis=0)
            pp = (jnp.concatenate([neg_pooled, pooled]) if do_cfg else pooled)
            return {'text_embeds': pp, 'time_ids': time_ids}

        def forward(params, model_in, t, ctx, added, enc_mask):
            """One denoiser forward; returns (model_out, taps_tree)."""
            if is_flux:
                # ctx = T5 embeds, added = CLIP pooled (sample() packing)
                out, tap_state = unet.apply(
                    {'params': params['unet']}, model_in, t, ctx, added,
                    guidance=guidance_emb, mutable=['taps', 'attn_store'])
            elif is_hunyuan:
                # ctx = BERT embeds, added = T5 embeds,
                # enc_mask = (bert_mask, t5_mask), CFG-concatenated
                bmask, tmask = enc_mask
                out, tap_state = unet.apply(
                    {'params': params['unet']}, model_in, t, ctx, bmask,
                    added, tmask, mutable=['taps', 'attn_store'])
            elif is_pixart:
                out, tap_state = unet.apply(
                    {'params': params['unet']}, model_in, t, ctx, enc_mask,
                    mutable=['taps', 'attn_store'])
            else:
                out, tap_state = unet.apply(
                    {'params': params['unet']}, model_in, t, ctx,
                    added, mutable=['taps'])
            return out, tap_state.get('taps', {})

        def combine(out, latents):
            """CFG combine + learned-variance split (IF pipeline
            semantics: CFG on the prediction, conditional variance)."""
            learned_var = (is_ddpm
                           and sched.config.variance_type == 'learned_range'
                           and out.shape[1] == 2 * latents.shape[1])
            if learned_var:
                pred, varp = jnp.split(out, 2, axis=1)
                if do_cfg:
                    u, c = jnp.split(pred, 2)
                    pred = u + guidance_scale * (c - u)
                    varp = jnp.split(varp, 2)[1]
                return jnp.concatenate([pred, varp], axis=1)
            if out.shape[1] != latents.shape[1]:
                out = out[:, :latents.shape[1]]
            if do_cfg:
                uncond, cond = jnp.split(out, 2)
                out = uncond + guidance_scale * (cond - uncond)
            return out

        def finish(params, latents):
            if is_flux:
                latents = unpack_latents(latents, lat, lat)
            if vae is not None and not spec.is_pixel_space:
                images = vae.apply(
                    {'params': params['vae']},
                    latents / spec.vae.scaling_factor + spec.vae.shift_factor,
                    method=AutoencoderKL.decode)
            else:
                images = latents
            return jnp.clip(images / 2 + 0.5, 0.0, 1.0)

        def init_latents(rng, bsz):
            latents = normal_like(
                rng, (bsz, lat_ch, lat, lat), self.dtype)
            latents = latents * jnp.asarray(
                getattr(state0, 'init_noise_sigma', None)
                or sched.init_noise_sigma, self.dtype)
            # flux denoises in the 2x2-packed token representation
            # (FluxPipeline._pack_latents); the scheduler update is
            # elementwise so packing commutes with it
            return pack_latents(latents) if is_flux else latents

        def run_scan(params, pe, ne, pooled, neg_pooled, rng, enc_mask=None):
            bsz = pe.shape[0]
            rng, r0 = jax.random.split(rng)
            latents = init_latents(r0, bsz)
            ctx = jnp.concatenate([ne, pe]) if do_cfg else pe
            added = added_cond(pooled, neg_pooled, bsz)
            plan = {k: jnp.asarray(v) for k, v in sched.scan_plan(state0).items()}
            extra0 = sched.scan_carry_init(latents)

            def body(carry, row):
                latents, rng, extra = carry
                model_in = (jnp.concatenate([latents] * 2)
                            if do_cfg else latents)
                if 'scale' in plan:
                    model_in = model_in * row['scale'].astype(model_in.dtype)
                out, taps = forward(params, model_in, row['timestep'], ctx,
                                    added, enc_mask)
                out = combine(out, latents)
                noise = None
                if is_ddpm:
                    rng, rn = jax.random.split(rng)
                    noise = normal_like(rn, latents.shape,
                                        latents.dtype)
                latents, extra = sched.scan_step(row, out, latents, noise,
                                                 extra)
                return (latents, rng, extra), taps

            (latents, _, _), tap_ys = jax.lax.scan(
                body, (latents, rng, extra0), plan)
            images = finish(params, latents)
            # unstack the scan-stacked taps into the same step-major,
            # encounter-minor tuples the unrolled path produces
            merged: Dict[str, tuple] = {}
            for k, v in flatten_taps(tap_ys).items():
                vs = v if isinstance(v, tuple) else (v,)
                merged[k] = tuple(x[i] for i in range(len(timesteps))
                                  for x in vs)
            return images, merged

        def run(params, pe, ne, pooled, neg_pooled, rng, enc_mask=None):
            bsz = pe.shape[0]
            rng, r0 = jax.random.split(rng)
            latents = init_latents(r0, bsz)
            ctx = jnp.concatenate([ne, pe]) if do_cfg else pe
            added = added_cond(pooled, neg_pooled, bsz)

            st = state0
            tap_states = []
            for t in timesteps:
                model_in = (jnp.concatenate([latents] * 2)
                            if do_cfg else latents)
                model_in = sched.scale_model_input(st, model_in, t)
                out, taps = forward(params, model_in, float(t), ctx, added,
                                    enc_mask)
                tap_states.append(taps)
                out = combine(out, latents)
                if is_ddpm:
                    rng, rn = jax.random.split(rng)
                    noise = normal_like(rn, latents.shape, latents.dtype)
                    latents, st = sched.step(st, out, t, latents, noise)
                else:
                    latents, st = sched.step(st, out, t, latents)

            images = finish(params, latents)
            # merge per-step tap pytrees into encounter tuples
            merged: Dict[str, tuple] = {}
            for ts_tree in tap_states:
                flat = flatten_taps(ts_tree)
                for k, v in flat.items():
                    vs = v if isinstance(v, tuple) else (v,)
                    merged[k] = merged.get(k, ()) + vs
            return images, merged

        # _jit_sharded batch-shards arg[1] (here the prompt embeds, whose
        # leading dim is the generation batch) over 'dp' and places params
        # once — multi-chip generation from the same facade mesh knob
        self._fn_cache[key] = self._jit_sharded(run_scan if use_scan else run)
        return self._fn_cache[key]

    # ------------------------------------------------------------- background
    def set_background_extraction(self, idxs):
        self.store_idx = list(idxs)

    def get_background_extraction(self):
        return {k: v['feat'] for k, v in self._background_feats.items()}

    # ------------------------------------------------------------ enumeration
    def show_all_layers(self, batch_size: int = 1) -> Dict[str, tuple]:
        """Enumerate every tappable layer + shape WITHOUT running the model —
        jax.eval_shape needs no weights (reference --show_all_layers runs a
        real forward; extract_feature.py:102-110)."""
        spec = self.spec
        lat = (self.img_size // self.vae_scale
               if not spec.is_pixel_space else self.img_size)
        S = jax.ShapeDtypeStruct
        if spec.family == 'flux':
            from .models.flux import FluxTransformer2D
            grid = lat // 2
            all_model = FluxTransformer2D(
                cfg=spec.dit, grid_hw=(grid, grid),
                text_len=spec.prompt_max_length, dtype=self.dtype,
                taps=TapSpec.all())
            args = (S((batch_size, grid * grid, spec.dit.in_channels), self.dtype),
                    50.0,
                    S((batch_size, spec.prompt_max_length, spec.t5.d_model),
                      self.dtype),
                    S((batch_size, spec.dit.pooled_projection_dim), self.dtype))
        elif spec.family == 'hunyuan':
            from .models.hunyuan import HunyuanDiT2D
            all_model = HunyuanDiT2D(cfg=spec.dit, dtype=self.dtype,
                                     taps=TapSpec.all())
            args = (S((batch_size, spec.dit.in_channels, lat, lat), self.dtype),
                    50.0,
                    S((batch_size, spec.dit.text_len,
                       spec.dit.cross_attention_dim), self.dtype),
                    None,
                    S((batch_size, spec.dit.text_len_t5,
                       spec.dit.cross_attention_dim_t5), self.dtype),
                    None)
        elif spec.family == 'pixart':
            from .models.dit_pixart import PixArtTransformer2D
            all_model = PixArtTransformer2D(cfg=spec.dit, dtype=self.dtype,
                                            taps=TapSpec.all())
            args = (S((batch_size, spec.dit.in_channels, lat, lat), self.dtype),
                    50.0,
                    S((batch_size, spec.prompt_max_length, spec.t5.d_model),
                      self.dtype),
                    None)
        elif spec.family == 'if':
            from .models.unet_if import IFUNet
            all_model = IFUNet(cfg=spec.unet, dtype=self.dtype,
                               taps=TapSpec.all())
            args = (S((batch_size, spec.unet.in_channels, lat, lat), self.dtype),
                    50.0,
                    S((batch_size, spec.prompt_max_length, spec.t5.d_model),
                      self.dtype),
                    None)
        else:
            added = None
            if spec.unet.addition_embed_type == 'text_time':
                pooled_dim = (spec.text_encoders[-1].projection_dim
                              or spec.text_encoders[-1].hidden_size)
                added = {'text_embeds': S((batch_size, pooled_dim), self.dtype),
                         'time_ids': S((batch_size, 6), self.dtype)}
            all_model = UNet2DConditionModel(cfg=spec.unet, dtype=self.dtype,
                                            taps=TapSpec.all())
            args = (S((batch_size, spec.unet.in_channels, lat, lat), self.dtype),
                    50.0,
                    S((batch_size, 77, spec.unet.cross_attention_dim),
                      self.dtype),
                    added)

        def fwd(params, *a):
            return all_model.apply({'params': params}, *a, mutable=['taps'])

        _, tap_state = jax.eval_shape(fwd, self.params['unet'], *args)
        flat = flatten_taps(tap_state['taps'])
        from .store import tokens_to_map
        out = {}
        for k, v in flat.items():
            shape = v.shape
            if len(shape) == 3:
                import math
                size = int(math.sqrt(shape[1]))
                shape = (shape[0], shape[2], size, size)
            out[k] = shape
        return out


def _adapt_spec_to_checkpoint(spec: ModelSpec, weights: str) -> ModelSpec:
    """Rebuild architecture configs from the checkpoint's own config.json
    files when present, so fine-tunes that deviate from the published presets
    load exactly (U-Net families + VAE; the DiT presets match their single
    published checkpoints)."""
    import os
    from .models.convert import load_component_config
    updates = {}
    try:
        if spec.family in ('unet',) and os.path.exists(
                os.path.join(weights, 'unet', 'config.json')):
            from .models.unet2d import UNetConfig
            updates['unet'] = UNetConfig.from_diffusers_config(
                load_component_config(weights, 'unet'))
        elif spec.family == 'if' and os.path.exists(
                os.path.join(weights, 'unet', 'config.json')):
            from .models.unet_if import IFUNetConfig
            updates['unet'] = IFUNetConfig.from_diffusers_config(
                load_component_config(weights, 'unet'))
        elif spec.dit is not None and os.path.exists(
                os.path.join(weights, 'transformer', 'config.json')):
            updates['dit'] = spec.dit.from_diffusers_config(
                load_component_config(weights, 'transformer'))
        if spec.vae is not None and os.path.exists(
                os.path.join(weights, 'vae', 'config.json')):
            updates['vae'] = spec.vae.from_diffusers_config(
                load_component_config(weights, 'vae'))
        if spec.text_encoders:
            from .models.clip_text import CLIPTextConfig
            dirs = ['text_encoder', 'text_encoder_2']
            adapted = []
            for i, base in enumerate(spec.text_encoders):
                cj = os.path.join(weights, dirs[i], 'config.json')
                if os.path.exists(cj):
                    adapted.append(CLIPTextConfig.from_diffusers_config(
                        load_component_config(weights, dirs[i]), base))
                else:
                    adapted.append(base)
            if any(a is not b for a, b in zip(adapted, spec.text_encoders)):
                updates['text_encoders'] = tuple(adapted)
        if getattr(spec, 't5', None) is not None:
            # T5 lives in text_encoder_2 when a CLIP/BERT encoder comes first
            # (flux/hunyuan checkpoint layouts), else in text_encoder
            t5_dir = ('text_encoder_2' if spec.family in ('flux', 'hunyuan')
                      else 'text_encoder')
            if os.path.exists(os.path.join(weights, t5_dir, 'config.json')):
                from .models.t5 import T5Config
                updates['t5'] = T5Config.from_hf_config(
                    load_component_config(weights, t5_dir), spec.t5)
        if getattr(spec, 'bert', None) is not None and os.path.exists(
                os.path.join(weights, 'text_encoder', 'config.json')):
            from .models.bert_text import BertConfig
            updates['bert'] = BertConfig.from_hf_config(
                load_component_config(weights, 'text_encoder'), spec.bert)
    except (OSError, ValueError, KeyError):
        return spec
    return dataclasses.replace(spec, **updates) if updates else spec


def _aggregate_attention(store: Dict[str, jnp.ndarray], categories: List[str],
                         img_size: int, out_dtype):
    """AttentionStore.aggregate_attention + the facade's resize/concat
    (reference components/attention.py:143-161, diffusion_feature.py:492-500).

    store maps '{place}_{kind}' -> tuple of (B, Sq, Sk) head-mean maps.
    """
    import math
    all_attns = []
    for cat in categories:
        maps = store.get(cat, ())
        if not isinstance(maps, tuple):
            maps = (maps,)
        by_size: Dict[int, list] = {}
        for m in maps:
            size = int(math.sqrt(m.shape[1]))
            reshaped = m.reshape(m.shape[0], size, size, m.shape[2])
            reshaped = jnp.transpose(reshaped, (0, 3, 1, 2))  # B, Sk, h, w
            by_size.setdefault(size, []).append(reshaped)
        for size in sorted(by_size):
            group = by_size[size]
            avg = sum(group) / len(group)
            target = img_size // 8
            all_attns.append(interpolate_bilinear_nchw(avg, (target, target)))
    if not all_attns:
        return None
    out = jnp.concatenate(all_attns, axis=1)
    return out.astype(out_dtype) if out_dtype else out
