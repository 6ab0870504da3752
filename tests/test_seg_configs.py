"""All 12 reference segmentation configs are ported and structurally valid:
every layer id exists in the real-size enumerated tap surface with the
declared channel count, and per-level channel sums match the reference
configs' UPerHead in_channels (segmentation/configs/{ade_*,city_*}.py).
"""

import json
import os

import pytest

from diffusion_feature_tpu.enumerate_layers import enumerate_layers

ROOT = os.path.join(os.path.dirname(__file__), '..', 'seg_configs')

# reference c_per_level (UPerHead in_channels) per config file
EXPECTED = {
    'ade_sd15': ([2560, 640, 320], 150, (512, 512)),
    'city_sd15': ([2560, 640, 320], 19, (1024, 1024)),
    'ade_sdxl': ([2560, 1280], 150, (512, 512)),
    'city_sdxl': ([2560, 1280], 19, (1024, 1024)),
    'ade_legacy_sd15': ([1280, 1280, 960], 150, (512, 512)),
    'city_legacy_sd15': ([1280, 1280, 960], 19, (1024, 1024)),
    'ade_legacy_sdxl': ([1280, 960], 150, (512, 512)),
    'city_legacy_sdxl': ([1280, 960], 19, (1024, 1024)),
    'ade_vpd': ([1280, 1280, 640], 150, (512, 512)),
    'city_vpd': ([1280, 1280, 640, 308], 19, (1024, 1024)),
    'ade_full': ([2560 + 1280, 1280 + 640, 640 + 640], 150, (512, 512)),
    'city_full': ([2560 + 1280, 1280 + 640, 640 + 640], 19, (1024, 1024)),
}

_enum_cache = {}


def enum(version, img_size):
    key = (version, img_size)
    if key not in _enum_cache:
        _enum_cache[key] = enumerate_layers(version, img_size)
    return _enum_cache[key]


def load(name):
    with open(os.path.join(ROOT, f'{name}.json')) as f:
        return json.load(f)


class TestSegConfigSuite:
    def test_all_twelve_present(self):
        present = {os.path.splitext(f)[0] for f in os.listdir(ROOT)
                   if f.endswith('.json')}
        assert present == set(EXPECTED), (
            f'missing: {set(EXPECTED) - present}, '
            f'extra: {present - set(EXPECTED)}')

    @pytest.mark.parametrize('name', sorted(EXPECTED))
    def test_channel_sums_match_reference_in_channels(self, name):
        cfg = load(name)
        c_per_level, num_classes, crop = EXPECTED[name]
        assert cfg['num_classes'] == num_classes
        assert tuple(cfg['crop_size']) == crop
        assert tuple(cfg['stride']) == (512, 512)
        fl = cfg['feature_layers']
        if isinstance(cfg['diffusion_feature'], list):
            # multi-model: per-level sum ACROSS models
            n_levels = max(len(m) for m in fl)
            sums = [sum(int(c) for m in fl if lvl < len(m)
                        for _, c in m[lvl]) for lvl in range(n_levels)]
        else:
            sums = [sum(int(c) for _, c in lvl) for lvl in fl]
        assert sums == c_per_level, f'{name}: {sums} != {c_per_level}'

    @pytest.mark.parametrize('name', sorted(EXPECTED))
    def test_layer_ids_exist_with_declared_channels(self, name):
        cfg = load(name)
        dfs = cfg['diffusion_feature']
        dfs = dfs if isinstance(dfs, list) else [dfs]
        fls = (cfg['feature_layers'] if isinstance(cfg['diffusion_feature'],
                                                   list)
               else [cfg['feature_layers']])
        for df, fl in zip(dfs, fls):
            shapes = enum(df['version'], df['img_size'])
            for lid in df['layer']:
                assert lid in shapes, f'{name}: {lid} not in {df["version"]}'
            declared = {lid: int(c) for lvl in fl for lid, c in lvl}
            for lid, c in declared.items():
                if lid == 'attn':
                    # pseudo-layer: 77 prompt tokens x size groups within the
                    # store band (16, 32 at 512^2) x selector categories
                    n_cat = len(df['attention'])
                    assert c == 77 * 2 * n_cat, f'{name}: attn {c}'
                    continue
                assert lid in df['layer'], f'{name}: {lid} not requested'
                assert shapes[lid][1] == c, (
                    f'{name}: {lid} channel {shapes[lid][1]} != {c}')

    def test_vpd_prompts(self):
        """ade_vpd carries the exact 150-class-name prompt (reference
        ade_vpd.py) and both VPD configs enable prompt tuning + the
        down/up cross-attention stores."""
        ade = load('ade_vpd')
        assert ade['prompt_tuning'] is True
        assert ade['prompt'].startswith('wall, building, sky, floor')
        assert ade['prompt'].endswith('glass, clock, flag')
        assert ade['prompt'].count(',') == 149
        assert ade['diffusion_feature']['attention'] == ['down_cross',
                                                         'up_cross']
        city = load('city_vpd')
        assert city['prompt_tuning'] is True
        assert city['diffusion_feature']['attention'] == ['down_cross',
                                                          'up_cross']

    def test_full_is_dual_model_xl_pgv2(self):
        for name in ('ade_full', 'city_full'):
            cfg = load(name)
            dfs = cfg['diffusion_feature']
            assert [d['version'] for d in dfs] == ['xl', 'pgv2']
            assert all(d['img_size'] == 1024 for d in dfs)
            assert len(cfg['feature_layers']) == 2
