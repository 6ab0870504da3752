from .pixel_classifier import (
    PixelClassifier, train_ensemble, predict_labels, compute_iou,
)
from .data import (
    get_dataset_setting, shuffle_split, get_palette, get_class_names,
)
