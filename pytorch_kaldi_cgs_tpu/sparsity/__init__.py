from .hcgs import hcgs_mask, guided_hcgs_mask, mask_density
from .quantize import quantize_weight, quantize_input, ste_quantize_weight, ste_quantize_input
from .prune import magnitude_mask, global_magnitude_masks
from .pattern import (pattern_mask, coo_mask, pattern_coo_mask, random_patterns,
                      find_top_k_by_kmeans, apply_patterns,
                      generate_complete_pattern_set, find_top_k_by_similarity,
                      cal_sparsity)
from .pruning import PruningConfig, prune_params, pruning, model_sparsity
from . import storage
