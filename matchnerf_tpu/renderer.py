"""Host-device render orchestration: jit caching, slice rendering, video paths.

The reference renders full images in slices of `rand_rays_test` rays
(models/matchnerf.py:145-161) with dynamic slice sizes; under XLA every shape
compiles a program, so here every slice is a fixed `rays_per_slice` chunk and
the ragged tail is padded — one compiled executable per (H, W, V, R) config,
cached across images and frames.

Pose preparation (legacy float64 inverse, pixel grids, video trajectories)
stays host-side in numpy; everything per-ray runs inside the jitted
`render_rays` core.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import camera
from .models.matchnerf import (encode, prepare_sampling_tables,  # noqa: F401
                               render_rays, sample_depth)
from .utils import DotDict, effective_precision, log


def cond_sample_dtype(cfg):
    """dtype for the packed sampling tables: bf16 halves gather traffic with
    ~1e-3 relative sampling error (measured 79.8 dB vs f32 at DTU shapes);
    int8 halves it again via per-channel abs-max quantization; f32 for strict
    parity runs."""
    prec = effective_precision(cfg)
    name = prec.get("cond_sample_dtype", "bfloat16") if hasattr(prec, "get") else "bfloat16"

    def one(n):
        n = str(n)
        if n in ("bf16", "bfloat16"):
            return jnp.bfloat16
        if n == "int8":
            return jnp.int8
        if n.startswith("int4"):
            return n       # nibble-packed uint8 carrier, optional "int4pXX"
        return jnp.float32

    if isinstance(name, (list, tuple)):
        return [one(n) for n in name]      # per-scale (e.g. [int4, int8])
    return one(name)


def color_sample_dtype(cfg):
    """dtype for the packed color table: uint8 stores round(img*255) — exact
    for the 8-bit source datasets and ~4x faster to gather (the 640x512x12
    u8 table stays VMEM-resident); f32 for strict parity on float inputs."""
    prec = effective_precision(cfg)
    name = prec.get("color_sample_dtype", "float32") if hasattr(prec, "get") else "float32"
    if str(name) in ("u8", "uint8"):
        return jnp.uint8
    return None


def banded_impl(cfg) -> Optional[str]:
    """Which run-length-deduped ("banded") cond-query path to use, if any.

    - 'block' (precision.block_kernel): block-level shared dilated-union
      megakernel on unpacked tables (ops/pallas_block_banded.py) — fastest;
      requires contiguous slice rays; falls back per-scale to 'pallas' when
      the measured union bucket overflows
    - 'pallas' (precision.banded_kernel): per-ray dedup gather + VMEM-fused
      interp+cosine megakernel (ops/pallas_banded.py)
    - 'xla' (precision.banded_gather): pure-XLA dedup + one-hot expansion
      (ops/banded_gather.py) — numerically exact but measured a wash on v5e
      (the expansion materializes [R,S,4C] in HBM); kept for parity testing
    - None: direct packed gathers
    """
    prec = effective_precision(cfg)
    if not hasattr(prec, "get"):
        return None
    if bool(prec.get("block_kernel", False)):
        return "block"
    if bool(prec.get("banded_kernel", False)):
        return "pallas"
    if bool(prec.get("banded_gather", False)):
        return "xla"
    return None


def decoder_impl(cfg) -> str:
    """'pallas' routes the view_dep CondNeRF through the VMEM-resident
    decoder megakernel (ops/pallas_decoder.py) on the eval path.

    The kernel keeps samples on the 128-lane axis and slices lanes at
    multiples of S, so Mosaic lowering requires S % 128 == 0 ("offset
    mismatch on non-concat dimension" otherwise); non-aligned S (tiny demo
    shapes) falls back to the XLA decoder except in CPU interpret mode,
    where tests exercise the kernel at small S."""
    prec = effective_precision(cfg)
    if hasattr(prec, "get") and bool(prec.get("decoder_kernel", False)):
        nerf = cfg.get("nerf") if hasattr(cfg, "get") else None
        S = int(nerf.get("sample_intvs", 128)) \
            if nerf is not None and hasattr(nerf, "get") else 128
        if S % 128 == 0 or jax.default_backend() == "cpu":
            return "pallas"
        log.info("decoder kernel off: sample_intvs %d not lane-aligned" % S)
    return "xla"


def banded_kt_host(cfg, tgt_c2w, tgt_intr, tgt_nf, ref_w2c, ref_intr,
                   scale_hws, img_h: int, img_w: int):
    """Per-scale banded-gather Kt buckets for one target pose, or None.

    Host decision, once per (image set, target pose): project each target
    pixel's near/far depth endpoints into every source view. For points in
    front of a camera (z>0) the projected pixel path over depth is monotone,
    so per-ray distinct cells <= |dx|+|dy|+1 from the endpoint cells alone
    (ops/banded_gather.py). Numpy replica of the device math; the bucket
    margin absorbs f32 drift. The bound covers EVERY image pixel, so it is
    valid for any sampled ray subset (training uses random rays).

    tgt_c2w: [1,3,4]; tgt_intr: [3,3]; tgt_nf: [2]; ref_w2c: [V,3,4];
    ref_intr: [V,3,3]; scale_hws: [(h,w) per scale]."""
    from .ops.banded_gather import banded_bound_from_endpoints, bucket_kt

    S = int(cfg.nerf.sample_intvs)
    grid = np.asarray(camera.pixel_grid(img_h, img_w,
                                        legacy=cfg.nerf.legacy_coord))
    hom = np.concatenate([grid, np.ones((grid.shape[0], 1), np.float32)], -1)
    dirs = hom @ np.linalg.inv(tgt_intr).T @ tgt_c2w[0, :, :3].T   # [HW,3]
    center = tgt_c2w[0, :, 3]
    dvals = np.asarray(tgt_nf, np.float64)
    if cfg.nerf.depth.param == "inverse":
        dvals = 1.0 / (dvals + 1e-8)
    pts = center[None, None] + dirs[:, None] * dvals[None, :, None]  # [HW,2,3]

    kts = []
    for (h, w) in scale_hws:
        bound = 1
        safe = True
        for v in range(ref_w2c.shape[0]):
            p_ref = pts.reshape(-1, 3) @ ref_w2c[v, :, :3].T + ref_w2c[v, :, 3]
            pix = p_ref @ ref_intr[v].T
            z = pix[:, 2]
            safe = safe and bool((z > 1e-6).all())
            if not safe:
                break
            ndc = pix[:, :2] / z[:, None] / np.array(
                [img_w - 1, img_h - 1], np.float64)
            xs = np.clip(ndc[:, 0] * (w - 1), 0, w - 1)
            ys = np.clip(ndc[:, 1] * (h - 1), 0, h - 1)
            cells = (np.floor(ys).astype(np.int64) * w
                     + np.floor(xs).astype(np.int64)).reshape(-1, 2)
            b, _ = banded_bound_from_endpoints(cells[:, 0], cells[:, 1],
                                               np.ones(1, bool), w)
            bound = max(bound, b)
        kts.append(bucket_kt(bound, S) if safe else None)
    if all(k is None for k in kts):
        return None
    return tuple(kts)


def _index_batch(tree, b: int):
    """Slice every array leaf of a poses/tables/feats pytree to batch element
    [b:b+1]; scalars/None (e.g. color_scale) pass through."""
    if tree is None:
        return None
    if isinstance(tree, dict):
        return type(tree)({k: _index_batch(v, b) for k, v in tree.items()})
    if isinstance(tree, (list, tuple)):
        return type(tree)(_index_batch(v, b) for v in tree)
    if hasattr(tree, "ndim") and tree.ndim >= 1:
        return tree[b:b + 1]
    return tree


def extract_poses(batch: Dict) -> Dict:
    """Split the (V+1)-view batch into target (last) and reference poses
    (models/matchnerf.py:75-86). Host-side numpy."""
    return {
        "tgt": {
            "extrinsics": batch["extrinsics"][:, -1, :3, :],
            "intrinsics": batch["intrinsics"][:, -1],
            "near_fars": batch["near_fars"][:, -1],
        },
        "ref": {
            "extrinsics": batch["extrinsics"][:, :-1, :3, :],
            "intrinsics": batch["intrinsics"][:, :-1],
            "near_fars": batch["near_fars"][:, :-1],
        },
    }


class Renderer:
    """Caches jitted encode/render executables keyed by static shapes."""

    def __init__(self, cfg: DotDict, setbg_opaque: bool = False, mesh=None):
        self.cfg = cfg
        self.nerf_setbg_opaque = setbg_opaque
        self._encode_jit = None
        self._render_jit = {}
        self.mesh = mesh

    def set_mesh(self, mesh):
        """Shard eval rays over the mesh's 'data' axis (rays are
        embarrassingly parallel — zero collectives). Clears cached
        executables so they re-trace with the sharding constraints."""
        self.mesh = mesh
        self._render_jit = {}
        self._gather_jit = {}

    def _ray_constraint(self, pix, ray_dim: int):
        """Constrain `pix`'s ray axis over the mesh when it divides evenly."""
        if self.mesh is None or pix.shape[ray_dim] % self.mesh.devices.size:
            return pix
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = [None] * pix.ndim
        spec[ray_dim] = "data"
        return jax.lax.with_sharding_constraint(
            pix, NamedSharding(self.mesh, P(*spec)))

    # ------------------------------ encode ---------------------------------

    def encode(self, params, ref_images: jnp.ndarray) -> List[jnp.ndarray]:
        """ref_images: [B,V,H,W,3]. With a mesh, the encoder's view/pair
        streams distribute across it (once-per-image work; otherwise each
        chip would recompute the full encoder)."""
        if self._encode_jit is None:
            cfg = self.cfg
            ss = None
            par = cfg.get("parallel") or {}
            # default ON in configs/base.yaml (measured: 106 dB agreement
            # PSNR vs single-device on the 8-dev mesh + full kernel stack,
            # max |d| 7e-5 — far inside the 0.05 dB budget). GSPMD
            # reassociation does cost bit-equality, so precision.strict
            # forces it off; raw DotDict test cfgs without a parallel
            # section also stay off (bit-parity guards).
            from .utils.containers import effective_precision
            strict = bool((effective_precision(cfg) or {}).get("strict",
                                                               False))
            if (self.mesh is not None and hasattr(par, "get")
                    and par.get("shard_encoder_streams_eval", False)
                    and not strict):
                from jax.sharding import NamedSharding, PartitionSpec as P
                ss = NamedSharding(self.mesh, P("data"))

            @jax.jit
            def _enc(p, imgs):
                return encode(p, cfg, imgs, stream_sharding=ss)

            self._encode_jit = _enc
        return self._encode_jit(params, ref_images)

    def build_tables(self, ref_images: jnp.ndarray, pair_feats):
        """Packed 2x2 sampling tables, built once per image set."""
        if not hasattr(self, "_tables_jit") or self._tables_jit is None:
            cfg = self.cfg
            dt = cond_sample_dtype(cfg)
            cdt = color_sample_dtype(cfg)

            keep_unpacked = banded_impl(cfg) == "block"

            @jax.jit
            def _prep(imgs, feats):
                return prepare_sampling_tables(cfg, feats, imgs, feat_dtype=dt,
                                               color_dtype=cdt,
                                               keep_unpacked=keep_unpacked)

            self._tables_jit = _prep
        return self._tables_jit(ref_images, pair_feats)

    # ------------------------------ render ---------------------------------

    def _get_render_fn(self, img_h: int, img_w: int, setbg: bool, stratified: bool):
        key = (img_h, img_w, setbg, stratified)
        if key not in self._render_jit:
            cfg = self.cfg

            @jax.jit
            def _render(params, pix_xy, tgt_intr, tgt_c2w, tgt_nf,
                        ref_w2c, ref_intr, ref_nf, ref_images, pair_feats,
                        tables, rng):
                # experimental Pallas interp+cosine fusion; measured slower
                # than XLA's own fusion on v5e (208 vs 182 ms/8k rays), so off
                # by default — flip precision.fused_cosine to re-evaluate
                prec = effective_precision(cfg)
                fused = bool(prec.get("fused_cosine", False)) if hasattr(prec, "get") else False
                pix_xy = self._ray_constraint(pix_xy, 1)
                return render_rays(params, cfg, pix_xy, tgt_intr, tgt_c2w, tgt_nf,
                                   ref_w2c, ref_intr, ref_nf, ref_images, pair_feats,
                                   img_h=img_h, img_w=img_w, rng=rng,
                                   stratified=stratified, setbg_opaque=setbg,
                                   tables=tables, fused_cosine=fused)

            self._render_jit[key] = _render
        return self._render_jit[key]

    def prepare_target(self, tgt_extr: np.ndarray):
        """Host-side c2w with the legacy f64 inverse when configured."""
        if self.cfg.nerf.legacy_coord:
            return camera.pose_inverse_legacy_np(tgt_extr)
        return np.asarray(camera.pose_inverse(jnp.asarray(tgt_extr)))

    def render_given_rays(self, params, poses, ref_images, pair_feats,
                          pix_xy: np.ndarray, img_h: int, img_w: int,
                          rng=None, stratified: bool = False,
                          tgt_override: Optional[Dict] = None,
                          tables: Optional[Dict] = None) -> Dict:
        """Render the given pixel coords [B,R,2] -> dict of [B,R,*] arrays."""
        tgt = tgt_override or poses["tgt"]
        c2w = self.prepare_target(np.asarray(tgt["extrinsics"]))
        fn = self._get_render_fn(img_h, img_w, self.nerf_setbg_opaque, stratified)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return fn(params, jnp.asarray(pix_xy), jnp.asarray(tgt["intrinsics"]),
                  jnp.asarray(c2w), jnp.asarray(tgt["near_fars"]),
                  jnp.asarray(poses["ref"]["extrinsics"]),
                  jnp.asarray(poses["ref"]["intrinsics"]),
                  jnp.asarray(poses["ref"]["near_fars"]),
                  ref_images, pair_feats, tables, rng)

    def _get_multislice_fn(self, img_h: int, img_w: int, setbg: bool, G: int,
                           banded_kt=None, block_ut=None, color_ut=None):
        """Jitted scan over G sub-slices per dispatch: keeps per-step memory
        at one slice while amortizing the per-dispatch overhead (the TPU
        relay charges ~30ms per call).

        With a mesh, the whole per-dispatch render runs under `shard_map`
        over the ray axis: every device renders its ray shard locally (rays
        are embarrassingly parallel — zero collectives), so the Pallas
        megakernels execute natively per shard instead of relying on XLA's
        auto-partitioning of pallas_call."""
        impl = banded_impl(self.cfg) or "xla"
        dec_impl = decoder_impl(self.cfg)
        key = ("multi", img_h, img_w, setbg, G, banded_kt, block_ut, color_ut,
               impl, dec_impl)
        if key not in self._render_jit:
            cfg = self.cfg
            prec = effective_precision(cfg)
            fused = bool(prec.get("fused_cosine", False)) if hasattr(prec, "get") else False

            def _render_groups_local(params, pix_groups, tgt_intr, tgt_c2w,
                                     tgt_nf, ref_w2c, ref_intr, ref_nf,
                                     ref_images, pair_feats, tables):
                def step(_, pix_xy):
                    out = render_rays(params, cfg, pix_xy, tgt_intr, tgt_c2w,
                                      tgt_nf, ref_w2c, ref_intr, ref_nf,
                                      ref_images, pair_feats,
                                      img_h=img_h, img_w=img_w,
                                      setbg_opaque=setbg, tables=tables,
                                      fused_cosine=fused, banded_kt=banded_kt,
                                      banded_impl=impl, decoder_impl=dec_impl,
                                      block_ut=block_ut, color_ut=color_ut)
                    return (), out
                _, outs = jax.lax.scan(step, (), pix_groups)   # [G,B,R,*]
                return outs

            if self.mesh is None:
                fn = jax.jit(_render_groups_local)
            else:
                try:
                    from jax import shard_map
                except ImportError:          # older jax
                    from jax.experimental.shard_map import shard_map
                from jax.sharding import PartitionSpec as P
                ray_spec = P(None, None, "data", None)         # [G,B,R,2]
                out_spec = P(None, None, "data", None)         # [G,B,R,c]
                rep = P()
                import inspect
                rep_kw = ("check_vma"
                          if "check_vma" in inspect.signature(shard_map).parameters
                          else "check_rep")
                fn = jax.jit(shard_map(
                    _render_groups_local, mesh=self.mesh,
                    in_specs=(rep, ray_spec) + (rep,) * 9,
                    out_specs={"rgb": out_spec, "depth": out_spec,
                               "opacity": out_spec},
                    **{rep_kw: False}))
            self._render_jit[key] = fn
        return self._render_jit[key]

    def _banded_kt(self, poses, tgt, tables, img_h: int, img_w: int):
        """Per-scale banded-gather Kt buckets for this target pose, or None."""
        cfg = self.cfg
        if tables is None or banded_impl(cfg) is None:
            return None
        c2w = self.prepare_target(np.asarray(tgt["extrinsics"]))
        if c2w.shape[0] != 1:
            return None                              # batched eval: direct path
        scale_hws = [(v.shape[2], v.shape[3]) for v in tables["view_feats"]]
        return banded_kt_host(
            cfg, c2w, np.asarray(tgt["intrinsics"])[0],
            np.asarray(tgt["near_fars"]).reshape(-1)[:2],
            np.asarray(poses["ref"]["extrinsics"])[0],
            np.asarray(poses["ref"]["intrinsics"])[0],
            scale_hws, img_h, img_w)

    def _get_pose_prep_fn(self, img_h: int, img_w: int, R: int,
                          n_chunks: int, scale_hws,
                          measure_color: bool = False):
        """Jitted per-pose prep, fused into ONE dispatch + host sync:
        z-safety, the per-ray run bound (the device mirror of
        `banded_kt_host` — 0.44s of host numpy per pose), the exact max
        dilated block-union size per scale from RAW per-sample cells
        (`block_union_size_raw` — the identical set the production union
        build consumes, so the measurement needs no kt and the former
        endpoint-bound -> kt -> union two-dispatch chain collapses), and,
        with measure_color, the full-res SUPERCELL union size for the color
        kernel (ops/pallas_color.py). The endpoint bound is still returned
        — it picks kt buckets for the per-ray banded fallback when a union
        overflows every bucket."""
        key = ("pose_prep", img_h, img_w, R, n_chunks, tuple(scale_hws),
               measure_color)
        if key not in self._render_jit:
            cfg = self.cfg
            from .models.matchnerf import sample_depth
            from .ops.pallas_block_banded import block_union_size_raw
            from .ops.pallas_color import color_union_size
            S = int(cfg.nerf.sample_intvs)

            @jax.jit
            def _prep(pix_groups, tgt_intr, tgt_c2w, tgt_nf,
                      ref_w2c, ref_intr, ref_nf):
                """pix_groups [n_chunks,1,R,2] -> (steps [n_scales] i32,
                zok bool, sizes [n_scales(+1)] i32)."""
                inv_scale = jnp.tile(jnp.array([[img_w - 1, img_h - 1]],
                                               jnp.float32), (1, 1))

                # ---- endpoint bound + z-safety (2 depths, all pixels) ----
                pix_all = pix_groups.reshape(1, n_chunks * R, 2)
                center, ray = camera.get_center_and_ray(
                    pix_all, tgt_intr, tgt_c2w)
                depth = sample_depth(cfg, tgt_nf, 1, pix_all.shape[1])
                depth2 = jnp.concatenate([depth[:, :, :1],
                                          depth[:, :, S - 1:S]], axis=2)
                pts = camera.get_3d_points_from_depth(
                    center, ray, depth2, multi_samples=True)   # [1,HW,2,3]
                ndc = jax.vmap(
                    lambda e, i, n: camera.get_coord_ref_ndc(
                        e, i, pts, inv_scale, n),
                    in_axes=(1, 1, 1))(ref_w2c, ref_intr, ref_nf)
                egrids = ndc[..., :2] * 2.0 - 1.0              # [V,1,HW,2,2]
                # z-safety at the sample endpoints: z is affine in depth, so
                # z>0 at both ends => z>0 (monotone projection) throughout
                ep = pts.reshape(-1, 3)

                def zmin(e):                                   # e [1,3,4]
                    pr = ep @ jnp.swapaxes(e[0, :, :3], 0, 1) + e[0, :, 3]
                    return jnp.min(pr[..., 2])
                zok = jnp.min(jax.vmap(zmin, in_axes=1)(ref_w2c)) > 1e-6
                e0 = egrids[:, 0, :, 0, :]                     # [V,HW,2]
                e1 = egrids[:, 0, :, 1, :]
                steps = []
                for (h, w) in scale_hws:
                    def cell_xy(e):
                        xs = jnp.clip((e[..., 0] * 0.5 + 0.5) * (w - 1),
                                      0, w - 1)
                        ys = jnp.clip((e[..., 1] * 0.5 + 0.5) * (h - 1),
                                      0, h - 1)
                        return (jnp.floor(xs).astype(jnp.int32),
                                jnp.floor(ys).astype(jnp.int32))
                    x0, y0 = cell_xy(e0)
                    x1, y1 = cell_xy(e1)
                    steps.append(
                        jnp.max(jnp.abs(x0 - x1) + jnp.abs(y0 - y1)) + 1)

                # ---- exact raw-cell union sizes, scanned over chunks ----
                def step(carry, pix_xy):                    # pix_xy [1,R,2]
                    center, ray = camera.get_center_and_ray(
                        pix_xy, tgt_intr, tgt_c2w)
                    depth = sample_depth(cfg, tgt_nf, 1, R)
                    pts = camera.get_3d_points_from_depth(
                        center, ray, depth, multi_samples=True)
                    ndc = jax.vmap(
                        lambda e, i, n: camera.get_coord_ref_ndc(
                            e, i, pts, inv_scale, n),
                        in_axes=(1, 1, 1))(ref_w2c, ref_intr, ref_nf)
                    grids = ndc[..., :2] * 2.0 - 1.0        # [V,1,R,S,2]
                    sizes = [block_union_size_raw(grids[:, 0], h, w)
                             for (h, w) in scale_hws]
                    if measure_color:
                        sizes.append(color_union_size(grids[:, 0],
                                                      img_h, img_w))
                    return jnp.maximum(carry, jnp.stack(sizes)), None

                n_out = len(scale_hws) + (1 if measure_color else 0)
                sizes, _ = jax.lax.scan(
                    step, jnp.zeros(n_out, jnp.int32), pix_groups)
                return jnp.stack(steps), zok, sizes

            self._render_jit[key] = _prep
        return self._render_jit[key]

    def _pose_prep(self, poses, tgt, scale_hws, img_h: int, img_w: int,
                   measure_color: bool = False):
        """Device-side per-pose prep for the block path: returns
        (banded_kt tuple or None, block_ut tuple or None, color_ut int or
        None). scale_hws: the per-scale feature-table (h, w) — from tables,
        or from the encoder config (the engine uses this for patch-based
        training). measure_color additionally measures the full-res
        supercell union for the color kernel."""
        cfg = self.cfg
        from .ops.banded_gather import bucket_kt
        from .ops.pallas_block_banded import bucket_ut
        from .ops.pallas_color import bucket_color_ut
        S = int(cfg.nerf.sample_intvs)
        R = 8192
        n_pix = img_h * img_w
        n_chunks = (n_pix + R - 1) // R
        grid = np.asarray(camera.pixel_grid(img_h, img_w,
                                            legacy=cfg.nerf.legacy_coord))
        idx = np.minimum(np.arange(n_chunks * R), n_pix - 1)
        pix_groups = jnp.asarray(grid[idx].reshape(n_chunks, 1, R, 2))
        scale_hws = [tuple(hw) for hw in scale_hws]
        c2w = self.prepare_target(np.asarray(tgt["extrinsics"]))
        args = (jnp.asarray(np.asarray(tgt["intrinsics"])),
                jnp.asarray(c2w),
                jnp.asarray(np.asarray(tgt["near_fars"]).reshape(1, -1)[:, :2]),
                jnp.asarray(np.asarray(poses["ref"]["extrinsics"])[:, :, :3, :]),
                jnp.asarray(poses["ref"]["intrinsics"]),
                jnp.asarray(poses["ref"]["near_fars"]))
        prep_fn = self._get_pose_prep_fn(img_h, img_w, R, n_chunks,
                                         scale_hws,
                                         measure_color=measure_color)
        st, zok, ut = jax.device_get(prep_fn(pix_groups, *args))
        if not bool(zok):
            return None, None, None
        kts_ray = tuple(bucket_kt(int(b) + 4, S) for b in np.asarray(st))
        # the endpoint bound only gates the PER-RAY banded kernels: a ray's
        # distinct run count is structurally capped by S (S samples), so the
        # block path clamps an overflowed scale to kt=S and lets the measured
        # union decide profitability (at LLFF/TnT 960x640 the scale-1 bound
        # exceeds every kt bucket, yet the 8-ray dilated union still fits)
        kts_blk = tuple(S if k is None else k for k in kts_ray)
        ut = np.asarray(ut)
        color_ut = None
        if measure_color:
            # overflow -> None -> packed-gather color fallback
            color_ut = bucket_color_ut(int(ut[-1]))
            ut = ut[:len(scale_hws)]
        uts = tuple(bucket_ut(int(n)) for n in ut)
        kt_out, ut_out = [], []
        for k_ray, k_blk, u in zip(kts_ray, kts_blk, uts):
            if u is not None:
                kt_out.append(k_blk)
                ut_out.append(u)
            else:
                # union overflow: this scale runs the per-ray banded kernel
                # when its endpoint bound fit a bucket, else the direct gather
                kt_out.append(k_ray)
                ut_out.append(None)
        if all(k is None for k in kt_out):
            return None, None, color_ut
        if all(u is None for u in ut_out):
            return tuple(kt_out), None, color_ut
        return tuple(kt_out), tuple(ut_out), color_ut

    def _block_ut(self, poses, tgt, tables, img_h: int, img_w: int,
                  banded_kt):
        """Per-scale block-union buckets for this pose (device-measured,
        exact), or None -> the per-ray banded kernel handles the pose.
        Thin wrapper over `_pose_prep` (kept for tests/callers that already
        hold a host-computed banded_kt)."""
        cfg = self.cfg
        if (tables is None or banded_kt is None
                or banded_impl(cfg) != "block"
                or not (hasattr(tables, "get")
                        and tables.get("view_feats_unpacked") is not None)):
            return None
        if any(k is None for k in banded_kt):
            return None
        scale_hws = [(v.shape[2], v.shape[3]) for v in tables["view_feats"]]
        return self._pose_prep(poses, tgt, scale_hws, img_h, img_w)[1]

    def render_by_slices(self, params, poses, ref_images, pair_feats,
                         img_h: int, img_w: int,
                         tgt_override: Optional[Dict] = None,
                         tables: Optional[Dict] = None) -> Dict:
        """Full-image rendering in fixed-size ray slices with tail padding
        (TPU-shaped analog of models/matchnerf.py:145-161). Slices are
        processed `nerf.slices_per_dispatch` at a time inside one compiled
        scan."""
        B = ref_images.shape[0]
        if (B > 1 and banded_impl(self.cfg) == "block" and tables is not None
                and hasattr(tables, "get")
                and tables.get("view_feats_unpacked") is not None):
            # batched eval rides the block kernel by splitting into per-pose
            # sub-renders (the block path needs single-pose union buckets);
            # each element renders bit-identically to a B=1 call, at the full
            # per-slice ray budget instead of R//B
            per = [self.render_by_slices(
                       params, _index_batch(poses, b), ref_images[b:b + 1],
                       _index_batch(pair_feats, b), img_h, img_w,
                       tgt_override=_index_batch(tgt_override, b),
                       tables=_index_batch(tables, b))
                   for b in range(B)]
            return {k: np.concatenate([o[k] for o in per], axis=0)
                    for k in per[0]}
        R = int(self.cfg.nerf.rand_rays_test) // max(B, 1)
        # packed-gather intermediates OOM HBM beyond ~8k rays/slice on a
        # 16GB chip; cap unless the user overrides (nerf.max_rays_per_slice)
        cap = self.cfg.nerf.get("max_rays_per_slice", 8192)
        if cap and jax.default_backend() not in ("cpu",):
            R = min(R, int(cap))
        if self.mesh is not None:
            n_dev = self.mesh.devices.size
            R = max(((R + n_dev - 1) // n_dev) * n_dev, n_dev)
        n_pix = img_h * img_w
        grid = np.asarray(camera.pixel_grid(img_h, img_w,
                                            legacy=self.cfg.nerf.legacy_coord))
        n_slices = (n_pix + R - 1) // R
        # 10 x 8192-ray slices per dispatch: 4 dispatches per DTU image.
        # Measured 3.54s -> 3.18s/image vs G=4 (relay overhead ~30ms/call);
        # the scan keeps only ONE slice's intermediates live at a time
        G = max(1, min(int(self.cfg.nerf.get("slices_per_dispatch", 10)), n_slices))

        # all slice pixel coords, padded to a multiple of G slices
        idx = np.arange(n_pix)
        total = ((n_slices + G - 1) // G) * G * R
        idx = np.concatenate([idx, np.full(total - n_pix, n_pix - 1)])
        pix_all = grid[idx].reshape(-1, G, R, 2)                 # [n_groups,G,R,2]
        pix_all = np.broadcast_to(pix_all[:, :, None], (pix_all.shape[0], G, B, R, 2))

        tgt = tgt_override or poses["tgt"]
        c2w = self.prepare_target(np.asarray(tgt["extrinsics"]))
        # the block kernel's 8-ray blocks must align with the measured
        # absolute 8-pixel partition (and with shard boundaries under a mesh)
        shard_r = R // self.mesh.devices.size if self.mesh is not None else R
        block_ut = None
        color_ut = None
        if (banded_impl(self.cfg) == "block" and tables is not None
                and hasattr(tables, "get")
                and tables.get("view_feats_unpacked") is not None
                and c2w.shape[0] == 1 and shard_r % 8 == 0):
            # fused device prep: z-safety + run bound + union buckets in one
            # dispatch (the host numpy bound alone cost 0.44s/pose)
            scale_hws = [(v.shape[2], v.shape[3])
                         for v in tables["view_feats"]]
            banded_kt, block_ut, color_ut = self._pose_prep(
                poses, tgt, scale_hws, img_h, img_w,
                measure_color=tables.get("colors_sc") is not None)
        else:
            if banded_impl(self.cfg) == "block" and tables is not None:
                # the block kernel needs single-pose dispatches with 8-ray-
                # aligned shards; log the ~2x throughput downgrade instead of
                # silently taking the per-ray/direct path (VERDICT r2)
                why = ("batched eval (B>1)" if c2w.shape[0] != 1
                       else f"ray shard {shard_r} not 8-aligned"
                       if shard_r % 8 != 0 else "tables lack unpacked views")
                log.info(f"block kernel unavailable ({why}); "
                         "falling back to the per-ray banded/direct path")
            banded_kt = self._banded_kt(poses, tgt, tables, img_h, img_w)
        fn = self._get_multislice_fn(img_h, img_w, self.nerf_setbg_opaque, G,
                                     banded_kt=banded_kt, block_ut=block_ut,
                                     color_ut=color_ut)

        outs: Dict[str, list] = {}
        for gi in range(pix_all.shape[0]):
            ret = fn(params, jnp.asarray(pix_all[gi]),
                     jnp.asarray(tgt["intrinsics"]), jnp.asarray(c2w),
                     jnp.asarray(tgt["near_fars"]),
                     jnp.asarray(poses["ref"]["extrinsics"]),
                     jnp.asarray(poses["ref"]["intrinsics"]),
                     jnp.asarray(poses["ref"]["near_fars"]),
                     ref_images, pair_feats, tables)
            for k, v in ret.items():
                # [G,B,R,*] -> [B,G*R,*]
                v = jnp.moveaxis(v, 0, 1).reshape(B, G * R, *v.shape[3:])
                outs.setdefault(k, []).append(v)
        # keep results on-device until all groups are dispatched (device->host
        # transfers through the TPU tunnel would otherwise serialize slices)
        final = {k: jnp.concatenate(v, axis=1) for k, v in outs.items()}
        if self.mesh is not None and jax.process_count() > 1:
            # multi-host: the ray-sharded outputs span non-addressable
            # devices; one jitted identity with replicated out-shardings
            # all-gathers them over ICI so every host can read the image
            # (cached — a fresh lambda per call would recompile per image)
            key = tuple(sorted(final))
            if getattr(self, "_gather_jit", None) is None:
                self._gather_jit = {}
            if key not in self._gather_jit:
                from jax.sharding import NamedSharding, PartitionSpec as P
                rep = NamedSharding(self.mesh, P())
                self._gather_jit[key] = jax.jit(
                    lambda t: t, out_shardings={k: rep for k in key})
            final = self._gather_jit[key](final)
        return {k: np.asarray(v)[:, :n_pix] for k, v in final.items()}

    # ------------------------------ video ----------------------------------

    def get_video_rendering_path(self, poses, mode: str, n_frames: int,
                                 batch: Optional[Dict] = None) -> List[Dict]:
        """Per-frame target-pose dicts along an interpolated or spiral
        trajectory (models/matchnerf.py:295-325). Host-side."""
        src_extr = np.asarray(poses["ref"]["extrinsics"])         # [B,V,3,4]
        B = src_extr.shape[0]
        per_batch_w2cs = []
        for b in range(B):
            if mode == "interpolate":
                c2ws = camera.pose_inverse_legacy_np(src_extr[b])  # f64 inverse, f32 out
                sq = np.repeat(np.eye(4, dtype=np.float32)[None], len(c2ws), 0)
                sq[:, :3, :] = c2ws
                path = camera.get_interpolate_render_path(sq, n_frames)
            elif mode == "spiral":
                assert batch is not None and "c2ws_all" in batch, \
                    "Must provide all c2ws for spiral rendering path."
                c2ws_all = np.asarray(batch["c2ws_all"][b])
                near_far = np.asarray(poses["tgt"]["near_fars"][b]).tolist()
                rads_scale = float(getattr(self.cfg.nerf, "video_rads_scale", 0.1))
                path = camera.get_spiral_render_path(c2ws_all, near_far,
                                                     rads_scale=rads_scale,
                                                     n_frames=n_frames)
            else:
                raise ValueError(f"Unknown video rendering path mode {mode}")
            w2cs = np.linalg.inv(path)[:, :3].astype(np.float32)   # [n,3,4]
            per_batch_w2cs.append(w2cs)
        w2cs_all = np.stack(per_batch_w2cs)                        # [B,n,3,4]

        frames = []
        for f in range(n_frames):
            frames.append({
                "extrinsics": w2cs_all[:, f],
                "intrinsics": np.asarray(poses["tgt"]["intrinsics"]),
                "near_fars": np.asarray(poses["tgt"]["near_fars"]),
            })
        return frames

    # ---------------------------- full forward -----------------------------

    def forward(self, params, batch: Dict, mode: str = "test",
                ray_idx: Optional[np.ndarray] = None, rng=None,
                render_video: bool = False,
                render_path_mode: str = "interpolate") -> Dict:
        """Counterpart of MatchNeRF.forward (models/matchnerf.py:32-73):
        encode once, then render sampled rays (train) / full image in slices
        (eval) / a trajectory of frames (video)."""
        cfg = self.cfg
        V = cfg.n_src_views
        images = np.asarray(batch["images"])                       # [B,V+1,H,W,3]
        B, _, H, W = images.shape[:4]
        ref_images = jnp.asarray(images[:, :V])
        pair_feats = self.encode(params, ref_images)
        # packed sampling tables unless the local-neighborhood sampler is on
        tables = None
        if int(cfg.encoder.feature_sample_local_radius) <= 0:
            tables = self.build_tables(ref_images, pair_feats)
        poses = extract_poses(batch)

        if render_video:
            n_frames = int(cfg.nerf.video_n_frames)
            frame_poses = self.get_video_rendering_path(poses, render_path_mode,
                                                        n_frames, batch)
            outs: Dict[str, list] = {}
            for fp in frame_poses:
                ret = self.render_by_slices(params, poses, ref_images, pair_feats,
                                            H, W, tgt_override=fp, tables=tables)
                for k, v in ret.items():
                    outs.setdefault(k, []).append(v)
            return {k: np.concatenate(v, axis=0) for k, v in outs.items()}

        if ray_idx is not None:                                    # train-style subset
            grid = np.asarray(camera.pixel_grid(H, W, legacy=cfg.nerf.legacy_coord))
            pix = np.broadcast_to(grid[ray_idx][None], (B, len(ray_idx), 2))
            stratified = mode == "train" and bool(cfg.nerf.sample_stratified)
            return self.render_given_rays(params, poses, ref_images, pair_feats,
                                          pix, H, W, rng=rng, stratified=stratified,
                                          tables=tables)

        return self.render_by_slices(params, poses, ref_images, pair_feats, H, W,
                                     tables=tables)
