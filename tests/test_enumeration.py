"""Registry-wide architecture validation: enumerate every REAL-SIZE model's
tap surface via jax.eval_shape (no weights, no compute).  Catches config
errors in the full architectures that tiny test models can't."""

import pytest

from diffusion_feature_tpu.enumerate_layers import enumerate_layers


class TestRealSizeEnumeration:
    def test_sd15(self):
        shapes = enumerate_layers('1-5', 512)
        # reference practical config layers; channels sum to the published
        # Ours-v1.5 feature_len 3520 = 1280+1280+640+320
        assert shapes['up-level1-repeat1-vit-block0-cross-q'] == (1, 1280, 16, 16)
        assert shapes['up-level1-repeat2-res-out'] == (1, 1280, 16, 16)
        assert shapes['up-level2-repeat1-vit-block0-cross-q'] == (1, 640, 32, 32)
        assert shapes['up-level3-repeat0-vit-block0-self-k'] == (1, 320, 64, 64)
        # legacy layers
        assert shapes['up-level0-upsampler-out'] == (1, 1280, 16, 16)
        assert shapes['up-level3-repeat2-vit-out'] == (1, 320, 64, 64)
        assert shapes['unet-in'] == (1, 4, 64, 64)

    def test_sd21(self):
        shapes = enumerate_layers('2-1', 512)
        assert shapes['unet-out'] == (1, 4, 64, 64)
        assert 'mid-vit-block0-self-q' in shapes

    def test_sdxl(self):
        shapes = enumerate_layers('xl', 1024)
        # Ours-XL practical config (config_xl_practical.json); channel sums
        # match the published feature_len 3840 = 1280+1280+640+640
        assert shapes['up-level0-repeat0-vit-block7-out'] == (1, 1280, 32, 32)
        assert shapes['up-level0-repeat0-vit-block5-out'] == (1, 1280, 32, 32)
        assert shapes['up-level1-repeat0-vit-block0-cross-q'] == (1, 640, 64, 64)
        assert shapes['up-level1-repeat0-vit-block0-out'] == (1, 640, 64, 64)

    def test_pgv2(self):
        shapes = enumerate_layers('pgv2', 1024)
        # pg-amalgamation layer, feature_len 1280
        assert shapes['up-level0-repeat0-vit-block3-out'] == (1, 1280, 32, 32)

    def test_pixart_sigma(self):
        shapes = enumerate_layers('pixart-sigma', 1024)
        assert shapes['vit-block0-out'] == (1, 1152, 64, 64)
        assert shapes['vit-block27-ffn-inner'][1] == 1152 * 4
        assert 'vit-block28-out' not in shapes     # 28 layers exactly

    def test_if(self):
        shapes = enumerate_layers('if', 64)
        assert shapes['unet-in'] == (1, 3, 64, 64)
        assert shapes['unet-out'] == (1, 6, 64, 64)   # learned variance
        assert 'down-level0-downsampler-out' in shapes
        assert not any('-self-' in k or '-cross-' in k for k in shapes)

    def test_hunyuan(self):
        shapes = enumerate_layers('hunyuan', 1024)
        assert shapes['vit-block0-self-q'] == (1, 1408, 64, 64)
        # cross map: queries = image tokens, keys = 77 + 256 text tokens
        assert shapes['vit-block0-cross-map'] == (1, 16, 4096, 333)
        assert 'vit-block39-ffn-inner' in shapes
        assert 'vit-block0-out' not in shapes         # reference quirk

    def test_flux(self):
        shapes = enumerate_layers('flux', 1024)
        # packed grid 64x64 image tokens, inner 3072
        assert shapes['vit-block0-out'] == (1, 3072, 64, 64)
        assert shapes['vit-block0-norm-out'] == (1, 3072, 64, 64)
        assert shapes['vit-block18-attn-out'] == (1, 3072, 64, 64)
        assert shapes['vit-block19-out'] == (1, 3072, 64, 64)   # single blocks
        assert shapes['vit-block56-out'] == (1, 3072, 64, 64)
        assert shapes['vit-block0-cross-map'] == (1, 24, 4096, 512)
        assert shapes['vit-block0-self-map'] == (1, 24, 4096, 4096)


REFERENCE = '/root/reference/feature/configs'


@pytest.mark.skipif(not __import__('os').path.isdir(REFERENCE),
                    reason='reference checkout not mounted')
class TestReferenceConfigParity:
    def test_layer_id_sets_match_reference_full_configs(self):
        """Byte-exact tap-id parity: our enumerated surfaces equal the
        reference's config_15_full.json (197 ids) and config_xl_full.json
        (612 ids) element for element."""
        import json, os
        ours = set(enumerate_layers('1-5', 512))
        ref = set(json.load(open(os.path.join(REFERENCE,
                                              'config_15_full.json'))))
        assert ours == ref
        ours_xl = set(enumerate_layers('xl', 1024))
        ref_xl = set(json.load(open(os.path.join(REFERENCE,
                                                 'config_xl_full.json'))))
        assert ours_xl == ref_xl


@pytest.mark.skipif(not __import__('os').path.isdir(REFERENCE),
                    reason='reference checkout not mounted')
class TestBuiltinConfigParity:
    """Every builtin layer config's enabled-id sequence equals the reference
    JSON it mirrors — including the generated analysis sweeps and the figure
    set (reference feature/configs/*.json)."""

    PAIRS = [
        ('15-practical', 'config_15_practical.json'),
        ('15-legacy', 'config_15_legacy.json'),
        ('xl-practical', 'config_xl_practical.json'),
        ('xl-legacy', 'config_xl_legacy.json'),
        ('15-amalgamation', 'config_15_amalgamation.json'),
        ('15-amalgamation-small', 'config_15_amalgamation_small.json'),
        ('pg-amalgamation', 'config_pg_amalgamation.json'),
        ('15-analysis', 'config_15_analysis.json'),
        ('xl-analysis', 'config_xl_analysis.json'),
        ('xl-analysis2', 'config_xl_analysis2.json'),
        ('figure', 'config_figure.json'),
    ]

    @pytest.mark.parametrize('name,ref_file', PAIRS)
    def test_builtin_matches_reference(self, name, ref_file):
        import json, os
        from diffusion_feature_tpu.configs import BUILTIN_CONFIGS
        ref = json.load(open(os.path.join(REFERENCE, ref_file)))
        enabled = [k for k, v in ref.items() if v]
        assert list(BUILTIN_CONFIGS[name]) == enabled, name

    def test_builtin_ids_exist_in_enumerated_surface(self):
        from diffusion_feature_tpu.configs import BUILTIN_CONFIGS
        surfaces = {'15': enumerate_layers('1-5', 512),
                    'xl': enumerate_layers('xl', 1024),
                    'pg': enumerate_layers('pgv2', 1024)}
        for name, ids in BUILTIN_CONFIGS.items():
            fam = name.split('-')[0]
            shapes = surfaces.get(fam, surfaces['15'])
            # 'figure' is an SD-1.5 + XL mix: check against the union
            if name == 'figure':
                for lid in ids:
                    assert (lid in surfaces['15'] or lid in surfaces['xl']), lid
                continue
            for lid in ids:
                assert lid in shapes, f'{name}: {lid}'
