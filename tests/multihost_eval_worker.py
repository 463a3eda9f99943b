"""Worker for the 2-process multi-host EVAL test: the production
render_by_slices (shard_map over the ray axis, full kernel stack in
interpret mode) must run across a 2-process mesh and reproduce the
single-process pixels. Writes the rendered rgb to <out>.<pid>.npy.
"""
import sys


def main():
    out_path = sys.argv[1]
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    sys.path.insert(0, "/root/repo")

    import numpy as np

    from matchnerf_tpu.parallel import distributed, make_mesh, replicate_tree

    assert distributed.maybe_initialize(None)
    pid = jax.process_index()

    import __graft_entry__ as ge
    from matchnerf_tpu.models.matchnerf import init_matchnerf
    from matchnerf_tpu.parallel.distributed import make_global_array
    from matchnerf_tpu.parallel.mesh import replicate
    from matchnerf_tpu.renderer import Renderer, extract_poses
    from matchnerf_tpu.utils import DotDict

    cfg = ge._tiny_cfg(n_layers=1, sample_intvs=8)
    cfg = DotDict(dict(cfg))
    cfg.precision = DotDict({"cond_sample_dtype": "int8",
                             "color_sample_dtype": "uint8",
                             "banded_kernel": True, "block_kernel": True,
                             "decoder_kernel": True,
                             "color_block_kernel": True})
    H, W = 16, 32
    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    d = ge._synthetic_inputs(cfg, 1, H, W, R=16)
    poses = extract_poses({"extrinsics": d["poses"], "intrinsics": d["intr"],
                           "near_fars": d["near_fars"]})

    mesh = make_mesh()
    params = replicate_tree(params, mesh)
    ref_images = make_global_array(d["images"][:, : cfg.n_src_views],
                                   replicate(mesh))
    r = Renderer(cfg, mesh=mesh)
    feats = r.encode(params, ref_images)
    tables = r.build_tables(ref_images, feats)
    out = r.render_by_slices(params, poses, ref_images, feats, H, W,
                             tables=tables)
    rgb = np.asarray(out["rgb"])
    assert np.isfinite(rgb).all()
    np.save(f"{out_path}.{pid}.npy", rgb)
    print(f"eval worker {pid}: OK rgb {rgb.shape}")


if __name__ == "__main__":
    main()
