"""End-to-end CLI dump oracle (VERDICT r3 item 6).

Runs the real ``extract_feature.py`` CLI against a synthetic SD checkpoint
and fixed images, then compares the produced ``.npy`` tree — file NAMES and
VALUES — against a torch oracle that reloads the SAME checkpoint tensors
into the test-local torch transcriptions and replays the whole pipeline:

  tokenize -> CLIP encode -> PIL preprocess -> VAE posterior sample ->
  PNDM add_noise at t=50 -> tapped U-Net forward -> token->map reshape ->
  bf16 feature cast -> fp16 dump,

covering the reference output matrix (/root/reference/extract_feature.py:
113-148): default per-layer layout, --sample_name_first, and
--aggregate_output (+ --use_original_filename).  This pins the
facade->store->naming-matrix->writer INTEGRATION that the per-block goldens
cannot see (e.g. a swapped naming dimension or a double dtype cast).

RNG replication: the facade's draws are deterministic jax.random chains
(facade.py:807 ``split(self._rng)`` then :1186 ``split(rng)``), so the
oracle materializes the exact posterior/noise arrays by replaying the same
key schedule — parity is then pure arithmetic, not seed luck.

Tolerance: features are computed fp32 but stored through a bf16 cast
(facade feature_dtype) then fp16 (dump).  fp32 forward noise (~3e-5, the
forward-golden level) can flip one bf16 ulp (2^-8 = 3.9e-3 relative), so
values match at rtol 1e-2 / atol 1e-2·max|oracle| — far below any
integration-bug signature (wrong image order, wrong layer, missing
scheduler scale are all O(1))."""

import os
import sys
from pathlib import Path

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import extract_feature  # noqa: E402
import torch_ref as tr  # noqa: E402
from synth_checkpoint import write_sd_checkpoint  # noqa: E402

LAYERS = ('up-level1-repeat0-res-out', 'mid-vit-block0-cross-q')
LAYER_JSON = '{"up-level1-repeat0-res-out": true, ' \
             '"mid-vit-block0-cross-q": true}'
PROMPT = 'a photo of a cat'
IMG_SIZE = 64
T = 50


@pytest.fixture(scope='module')
def ckpt(tmp_path_factory):
    return write_sd_checkpoint(tmp_path_factory.mktemp('sd_ckpt'))


@pytest.fixture(scope='module')
def images(tmp_path_factory):
    d = tmp_path_factory.mktemp('imgs')
    rng = np.random.RandomState(3)
    for name in ('imgA', 'imgB'):   # sorted order == glob order
        Image.fromarray((rng.rand(80, 80, 3) * 255).astype('uint8')).save(
            d / f'{name}.png')
    return d


def _load_torch_modules(ckpt):
    """Reload the checkpoint tensors into the torch transcriptions, with
    every model config read from the checkpoint's own config.json files —
    weight AND config parity with what the CLI converts is by
    construction (no literals duplicated from the fixture writer)."""
    import json
    from safetensors.numpy import load_file
    from transformers import CLIPTextConfig, CLIPTextModel

    def cfg_of(comp):
        with open(os.path.join(ckpt, comp, 'config.json')) as f:
            return json.load(f)

    ucfg = {k: tuple(v) if isinstance(v, list) else v
            for k, v in cfg_of('unet').items()}
    unet = tr.UNet2DConditionModel(ucfg)
    unet.load_state_dict({k: torch.tensor(v) for k, v in load_file(
        os.path.join(ckpt, 'unet', 'model.safetensors')).items()})
    unet.eval()

    vcfg = cfg_of('vae')
    enc = tr.AutoencoderKLEncoder(dict(
        in_channels=vcfg['in_channels'],
        latent_channels=vcfg['latent_channels'],
        block_out_channels=tuple(vcfg['block_out_channels']),
        layers_per_block=vcfg['layers_per_block']))
    vae_state = load_file(os.path.join(ckpt, 'vae', 'model.safetensors'))
    want = set(enc.state_dict())
    enc.load_state_dict({k: torch.tensor(v) for k, v in vae_state.items()
                         if k in want})
    enc.eval()

    clip = CLIPTextModel(CLIPTextConfig(**cfg_of('text_encoder')))
    clip.load_state_dict({k: torch.tensor(v) for k, v in load_file(
        os.path.join(ckpt, 'text_encoder', 'model.safetensors')).items()})
    clip.eval()
    return unet, enc, clip, vcfg


@pytest.fixture(scope='module')
def oracle(ckpt, images):
    """{layer: (2, ...) float32} exactly as the CLI's one batch computes,
    plus the bf16->store view the dump writes."""
    import ml_dtypes
    from diffusion_feature_tpu.io.images import preprocess_pil_batch
    from diffusion_feature_tpu.tokenizers.clip_bpe import load_clip_tokenizer

    unet, enc, clip, vcfg = _load_torch_modules(ckpt)

    # --- prompt: builtin BPE tokenizer (no tokenizer dir in the ckpt) ->
    #     transformers CLIP last_hidden_state (test-sd: final layer)
    tok = load_clip_tokenizer(None, vocab_size=clip.config.vocab_size,
                              pad_with_eos=True)
    ids = np.asarray(tok([PROMPT]), np.int64)
    with torch.no_grad():
        pe = clip(torch.tensor(ids)).last_hidden_state.numpy()
    pe = np.broadcast_to(pe, (2,) + pe.shape[1:])

    # --- images: sorted glob order, loader RGB-converts, then the
    #     reference preprocess (resize + [-1,1])
    paths = sorted(str(p) for p in Path(images).glob('*.png'))
    pil = [Image.open(p).convert('RGB') for p in paths]
    img = preprocess_pil_batch(pil, IMG_SIZE)

    # --- the facade's rng chain (seed=0, first extract call)
    key = jax.random.PRNGKey(0)
    _, step_rng = jax.random.split(key)
    rng_vae, rng_noise = jax.random.split(step_rng)

    # --- VAE posterior sample + prepare_latents scaling
    with torch.no_grad():
        moments = enc(torch.tensor(img)).numpy()
    mean, logvar = np.split(moments, 2, axis=1)
    std = np.exp(0.5 * np.clip(logvar, -30.0, 20.0))
    eps = np.asarray(jax.random.normal(rng_vae, mean.shape, jnp.float32))
    z = (mean + std * eps) * vcfg['scaling_factor']

    # --- PNDM img2img noise injection at t=50 (independent transcription,
    #     as in test_golden_parity.TestSchedulerGolden: steps_offset=1 +
    #     the duplicated plms entry land extraction at timestep 51)
    betas = np.linspace(0.00085 ** 0.5, 0.012 ** 0.5, 1000,
                        dtype=np.float64) ** 2
    acp = np.cumprod(1.0 - betas)
    t51 = 51
    noise = np.asarray(jax.random.normal(rng_noise, z.shape, jnp.float32))
    latents = (np.sqrt(acp[t51]) * z + np.sqrt(1 - acp[t51]) * noise
               ).astype(np.float32)

    # --- tapped U-Net forward at the mapped timestep
    taps = {}
    with torch.no_grad():
        unet(torch.tensor(latents), float(t51), torch.tensor(pe), taps=taps)

    feats = {}
    for layer in LAYERS:
        a = taps[layer].numpy().astype(np.float32)
        if a.ndim == 3:                      # tokens -> (B, C, s, s) map
            b, s, c = a.shape
            side = int(np.sqrt(s))
            a = a.reshape(b, side, side, c).transpose(0, 3, 1, 2)
        # facade feature_dtype: bf16 cast inside the step program
        feats[layer] = a.astype(ml_dtypes.bfloat16).astype(np.float32)
    return feats


def _run_cli(ckpt, images, out, *extra):
    extract_feature.main([
        '--layer', LAYER_JSON, '--version', 'test-sd',
        '--dtype', 'float32', '--img_size', str(IMG_SIZE),
        '--batch_size', '2', '--t', str(T),
        '--weights', str(ckpt),
        '--input_dir', str(Path(images) / '*.png'),
        '--prompt', PROMPT, '--output_dir', str(out), *extra,
    ])


def _tree(out):
    return sorted(str(p.relative_to(out)) for p in Path(out).rglob('*.npy'))


def _assert_values(stored, want_f32, label):
    got = np.asarray(stored, np.float32)
    assert got.shape == want_f32.shape, label
    np.testing.assert_allclose(
        got, want_f32, rtol=1e-2, atol=1e-2 * np.abs(want_f32).max(),
        err_msg=label)


class TestCLIDumpOracle:
    def test_default_layout_names_and_values(self, ckpt, images, oracle,
                                             tmp_path):
        out = tmp_path / 'out'
        _run_cli(ckpt, images, out)
        assert _tree(out) == sorted(
            f'{layer}/train{i}.npy' for layer in LAYERS for i in (0, 1))
        for layer in LAYERS:
            for i in (0, 1):
                stored = np.load(out / layer / f'train{i}.npy')
                assert stored.dtype == np.float16    # dump dtype
                _assert_values(stored, oracle[layer][i],
                               f'{layer}/train{i}')

    def test_sample_name_first(self, ckpt, images, oracle, tmp_path):
        out = tmp_path / 'out'
        _run_cli(ckpt, images, out, '--sample_name_first')
        assert _tree(out) == sorted(
            f'train{i}/{layer}.npy' for layer in LAYERS for i in (0, 1))
        for layer in LAYERS:
            for i in (0, 1):
                _assert_values(np.load(out / f'train{i}' / f'{layer}.npy'),
                               oracle[layer][i], f'train{i}/{layer}')

    def test_aggregate_output_original_names(self, ckpt, images, oracle,
                                             tmp_path):
        out = tmp_path / 'out'
        _run_cli(ckpt, images, out, '--aggregate_output',
                 '--use_original_filename')
        assert _tree(out) == ['imgA.npy', 'imgB.npy']

        # oracle aggregation: nearest-resize every layer to the max spatial
        # size (32), channel-concat (reference extract_feature.py:113-126;
        # F.interpolate defaults to nearest).  16->32 is an exact factor-2
        # repeat.  The concat order is PINNED: the features dict comes from
        # flatten_taps over the flax taps collection, whose keys follow the
        # U-Net's module-path order — mid_block before up_blocks — so the
        # mid cross-q channels come first.  A swapped order here is exactly
        # the integration regression this test exists to catch.
        def up2(a):
            return np.repeat(np.repeat(a, 2, axis=-2), 2, axis=-1)

        res = oracle['up-level1-repeat0-res-out']            # (2,32,32,32)
        q = up2(oracle['mid-vit-block0-cross-q'])            # (2,64,32,32)
        for i, name in enumerate(('imgA', 'imgB')):
            got = np.asarray(np.load(out / f'{name}.npy'), np.float32)
            assert got.shape == (96, 32, 32), got.shape
            want = np.concatenate([q[i], res[i]], axis=0)
            np.testing.assert_allclose(
                got, want, rtol=1e-2, atol=1e-2 * np.abs(want).max(),
                err_msg=f'{name} aggregate (mid cross-q channels first)')
