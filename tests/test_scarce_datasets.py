"""Scarce-task dataset-setting parity vs the reference's data_util.py values
(VERDICT round-1 item 3): all 6 datasets with settings, palettes, and class
names."""

import numpy as np
import pytest

from diffusion_feature_tpu.tasks.scarce import (
    get_class_names, get_dataset_setting, get_palette,
)

# (number_class, first 2 class names, first non-bg palette RGB) straight from
# reference scarce_segmentation/segmentation/data_util.py
REFERENCE = {
    'ffhq_34': (34, ['background', 'head'], (112, 130, 107)),
    'bedroom_28': (29, ['background', 'bed'], (238, 229, 102)),
    'cat_15': (15, ['background', 'back'], (190, 153, 153)),
    'horse_21': (21, ['background', 'person'], (255, 74, 70)),
    'ade_bedroom_30': (30, ['wall', 'bed'], (69, 88, 93)),
    'celeba_19': (19, ['background', 'cloth'], (238, 229, 102)),
}


class TestDatasetSettings:
    @pytest.mark.parametrize('name', sorted(REFERENCE))
    def test_setting_parity(self, name):
        s = get_dataset_setting(name)
        ncls, first_names, _ = REFERENCE[name]
        # exact reference field values (data_util.py:30-100)
        assert s['number_class'] == ncls
        assert s['ignore_label'] == 255
        assert s['model_num'] == 10
        assert s['max_training'] == 30
        assert s['upsample_mode'] == 'bilinear'
        assert s['training_number'] == 50
        assert s['testing_number'] == 650
        assert s['dim'] == [256, 256, 8448]

    def test_bedroom_28_has_29_classes_quirk(self):
        # the reference's bedroom_28 setting says number_class=29 and its
        # class list has 29 entries — the name undercounts; keep the quirk
        assert get_dataset_setting('bedroom_28')['number_class'] == 29
        assert len(get_class_names('bedroom_28')) == 29

    @pytest.mark.parametrize('name', sorted(REFERENCE))
    def test_palette_and_class_names(self, name):
        ncls, first_names, rgb1 = REFERENCE[name]
        pal = get_palette(name)
        names = get_class_names(name)
        assert pal.shape == (ncls, 3) and pal.dtype == np.uint8
        assert len(names) == ncls
        assert names[:2] == first_names
        assert tuple(pal[1]) == rgb1

    def test_ffhq_palette_float_conversion(self):
        # reference stores ffhq as floats and int(v*255)'s them at import:
        # background (1.0, 1.0, 1.0) -> 255, head (0.4420, ...) -> 112
        pal = get_palette('ffhq_34')
        assert tuple(pal[0]) == (255, 255, 255)
        assert pal[1][0] == int(0.4420 * 255)

    def test_ade_bedroom_30_is_prefix_of_50(self):
        # ade_bedroom_30 = first 30 entries of the 50-class table
        # (data_util.py:141-143)
        names = get_class_names('ade_bedroom_30')
        assert names[0] == 'wall' and names[29] == 'television'

    def test_face_34_alias(self):
        assert get_dataset_setting('face_34') == get_dataset_setting('ffhq_34')
        assert get_class_names('face_34') == get_class_names('ffhq_34')

    def test_unknown_raises(self):
        with pytest.raises(KeyError):
            get_dataset_setting('nope_7')
