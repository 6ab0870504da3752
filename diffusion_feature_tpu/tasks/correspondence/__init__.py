from .utils import (
    rescale_points, points_to_idxs, compute_pck, batch_cosine_sim,
    draw_correspondences, find_nn_source_correspondences, load_annotation,
)
from .aggregation import AggregationNetwork, SPAIR_PROMPT
