from .heads import FCNHead, ResBlockAdapter, UPerHead
from .losses import (
    cross_entropy_loss, lovasz_softmax_loss, segmentation_loss,
)
from .segmentor import DiffusionSegmentor, SegHead
