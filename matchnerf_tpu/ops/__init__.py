from .grid_sample import grid_sample_2d
from .resize import resize_bilinear_align_corners, upsample_nearest_x2, upsample_bilinear_x2
from .norm import instance_norm_2d, layer_norm
from .posenc import sine_position_embedding_2d, nerf_posenc, nerf_posenc_legacy, ray_sinusoid_table
from .attention import (full_attention, split_window_attention,
                        generate_shift_window_attn_mask, split_feature, merge_splits)
