from .cond_nerf import init_cond_nerf, apply_cond_nerf, composite
