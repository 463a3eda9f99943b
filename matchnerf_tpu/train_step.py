"""Jitted training step: loss, optimizer, schedules, sharding.

TPU-native counterpart of Coach.train_iteration + setup_optimizer
(coach.py:87-125, 215-243): one `jax.jit`-compiled function performs
encode -> render(1024 random rays) -> MSE -> grad -> per-group AdamW with
OneCycle schedules and encoder-only global-norm clipping. Parameter groups
(lr_enc / lr_dec, frozen when lr<=0) map to an optax.multi_transform over the
{'feat_enc','nerf_dec'} subtrees.

Data parallelism: the step function is written over batch-major arrays; the
engine shards the batch/ray dims over a `('data',)` mesh with NamedSharding
and jit inserts the gradient psum automatically (replicated params +
sharded batch -> XLA all-reduce over ICI).
"""
from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .models.matchnerf import encode, prepare_sampling_tables, render_rays
from .utils import effective_precision


def make_schedule(optim_cfg, peak_lr: float, total_steps: int):
    """OneCycleLR-equivalent schedule (configs/train.yaml:59-63; torch
    defaults div_factor=25, final_div_factor=1e4)."""
    sched = optim_cfg.get("sched") if hasattr(optim_cfg, "get") else None
    if not sched:
        return optax.constant_schedule(peak_lr)
    if sched["type"] == "OneCycleLR":
        pct_start = float(sched.get("pct_start", 0.3))
        # optax's onecycle divides by the warmup interval length; guarantee it
        # spans at least one step (only matters for tiny smoke-test runs)
        pct_start = max(pct_start, 1.0 / max(total_steps, 2))
        return optax.cosine_onecycle_schedule(
            transition_steps=total_steps,
            peak_value=peak_lr,
            pct_start=pct_start,
            div_factor=float(sched.get("div_factor", 25.0)),
            final_div_factor=float(sched.get("final_div_factor", 1e4)))
    if sched["type"] == "ExponentialLR":
        return optax.exponential_decay(peak_lr, transition_steps=1,
                                       decay_rate=float(sched.get("gamma", 1.0)))
    raise ValueError(f"Unknown scheduler {sched['type']}")


def build_optimizer(cfg, total_steps: int):
    """Two param groups (encoder/decoder) with separate LR schedules,
    weight decay, and encoder grad clipping (coach.py:87-125)."""
    optim_cfg = cfg.optim
    wd = float(optim_cfg.algo.get("weight_decay", 0.0))
    assert optim_cfg.algo.type in ("AdamW", "Adam"), optim_cfg.algo.type

    lr_enc = float(optim_cfg.lr_enc)
    lr_dec = float(optim_cfg.lr_dec)
    clip_enc = optim_cfg.get("clip_enc")

    schedules = {}

    def group(lr, clip):
        if lr <= 0:
            return optax.set_to_zero(), None
        sched = make_schedule(optim_cfg, lr, total_steps)
        chain = []
        if clip is not None:
            chain.append(optax.clip_by_global_norm(float(clip)))
        if optim_cfg.algo.type == "AdamW":
            chain.append(optax.adamw(sched, weight_decay=wd))
        else:
            chain.append(optax.adam(sched))
        return optax.chain(*chain), sched

    tx_enc, schedules["enc"] = group(lr_enc, clip_enc)
    tx_dec, schedules["dec"] = group(lr_dec, None)

    def label_fn(params):
        return {"feat_enc": jax.tree_util.tree_map(lambda _: "enc", params["feat_enc"]),
                "nerf_dec": jax.tree_util.tree_map(lambda _: "dec", params["nerf_dec"])}

    tx = optax.multi_transform({"enc": tx_enc, "dec": tx_dec}, label_fn)
    return tx, schedules


def make_train_step(cfg, tx, img_h: int, img_w: int, n_rays: int,
                    mesh=None, shard_rays: bool = False, banded_kt=None,
                    block_ut=None):
    """Build the jitted train step for a fixed (H, W, rays) shape.

    Parallel modes (mesh from `parallel.make_mesh`):
    - batch mode (shard_rays=False): caller shards the batch dim of `batch`
      over the 'data' axis; jit infers the SPMD program from input shardings.
    - ray mode (shard_rays=True): for the flagship `batch_size: 1` recipe
      (configs/train.yaml) where the batch dim can't split, the 1024-ray axis
      is sharded instead via an in-graph constraint; params stay replicated
      and XLA psums the grads over ICI. Rays are embarrassingly parallel so
      the only collectives are the loss/grad reductions.

    banded_kt: optional per-scale run-bound buckets (renderer.banded_kt_host,
    computed per batch pose by the engine) — routes the cond query through
    the custom-VJP banded megakernel (ops/pallas_banded.py), which dedups
    gather rows AND scatter-add rows in the backward. Compiled per bucket.
    block_ut: optional per-scale block-union buckets. With
    nerf.train_ray_patches (rays sampled as 8-aligned pixel strips), routes
    through the custom-VJP BLOCK-banded megakernel instead: one shared
    dilated-union gather/scatter per 8-ray block (~2.4x fewer rows both
    ways than per-ray dedup).
    """
    render_w = cfg.loss_weight.get("render", 1.0) or 0.0
    stratified = bool(cfg.nerf.sample_stratified)
    ray_sharding = None
    stream_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        par = cfg.get("parallel") or {}
        shard_streams = (not hasattr(par, "get")
                         or par.get("shard_encoder_streams", True))
        if shard_rays:
            n_dev = mesh.devices.size
            assert n_rays % n_dev == 0, (
                f"ray-sharded training needs n_rays ({n_rays}) divisible by "
                f"the mesh size ({n_dev})")
            ray_sharding = NamedSharding(mesh, P(None, "data"))
        # Encoder stream sharding. Ray mode (batch_size=1): without it the
        # encoder fwd+bwd (the dominant cost) REPLICATES on every chip.
        # Batch mode: GSPMD already infers the same batch-major layout from
        # the sharded inputs; the explicit sharding additionally routes the
        # fused window-attention kernel through its shard_map wrapper
        # (a bare pallas_call under GSPMD would all-gather).
        if shard_streams:
            stream_sharding = NamedSharding(mesh, P("data"))

    prec = effective_precision(cfg)
    train_tables = bool(prec.get("train_packed_tables", True)) \
        if hasattr(prec, "get") else True
    ray_patches = bool(cfg.nerf.get("train_ray_patches", False)) \
        if hasattr(cfg.nerf, "get") else False
    use_block = ray_patches and block_ut is not None and banded_kt is not None
    if ray_patches:
        assert n_rays % 8 == 0, "patch sampling needs n_rays divisible by 8"

    def loss_fn(params, batch, rng):
        ref_images = batch["images"][:, :cfg.n_src_views]          # [B,V,H,W,3]
        pair_feats = encode(params, cfg, ref_images,
                            stream_sharding=stream_sharding)
        # packed tables are pure reshuffles — differentiable; keep f32 in
        # training so encoder grads aren't bf16-rounded. Their backward
        # scatter-adds ~5ms/table, but the raw 4-tap alternative measured
        # slower overall (178 vs 200 ms/step on v5e) — knob kept for
        # re-evaluation on other topologies.
        tables = None
        if train_tables and int(cfg.encoder.feature_sample_local_radius) <= 0:
            tables = prepare_sampling_tables(cfg, pair_feats, ref_images,
                                             keep_unpacked=use_block)

        rng_rays, rng_depth = jax.random.split(rng)
        B = ref_images.shape[0]
        sampler = str(cfg.nerf.get("train_ray_sampler", "permutation")) \
            if hasattr(cfg.nerf, "get") else "permutation"

        def sample_wo_replacement(rng_s, n_total, k):
            """Uniform k-subset without replacement. 'permutation' argsorts
            the full index range (the reference's randperm semantics);
            'topk' orders random keys with lax.top_k instead — the same
            distribution (order by iid uniform keys), a different lowering."""
            if sampler == "topk":
                keys = jax.random.uniform(rng_s, (n_total,))
                _, idx = jax.lax.top_k(keys, k)
                return idx
            return jax.random.permutation(rng_s, n_total)[:k]

        if ray_patches:
            # 8-aligned horizontal pixel strips: each strip is one block of
            # the block-banded kernel (the absolute 8-alignment matches the
            # per-pose union measurement partition). Strips are sampled
            # without replacement, pixels within a strip are correlated —
            # an opt-in deviation from the reference's iid-ray recipe.
            starts = sample_wo_replacement(
                rng_rays, (img_h * img_w) // 8, n_rays // 8) * 8
            ray_idx = (starts[:, None] + jnp.arange(8)[None, :]).reshape(-1)
        else:
            # same random subset for all batch elements (matchnerf.py:53)
            ray_idx = sample_wo_replacement(rng_rays, img_h * img_w, n_rays)
        off = 0.0 if cfg.nerf.legacy_coord else 0.5
        pix_x = (ray_idx % img_w).astype(jnp.float32) + off
        pix_y = (ray_idx // img_w).astype(jnp.float32) + off
        pix = jnp.broadcast_to(jnp.stack([pix_x, pix_y], -1)[None], (B, n_rays, 2))
        if ray_sharding is not None:
            pix = jax.lax.with_sharding_constraint(pix, ray_sharding)

        out = render_rays(
            params, cfg, pix,
            tgt_intr=batch["intrinsics"][:, -1],
            tgt_c2w=batch["tgt_c2w"],
            tgt_near_far=batch["near_fars"][:, -1],
            ref_w2c=batch["extrinsics"][:, :-1, :3, :],
            ref_intr=batch["intrinsics"][:, :-1],
            ref_near_far=batch["near_fars"][:, :-1],
            ref_images=ref_images,
            pair_feats=pair_feats, tables=tables,
            img_h=img_h, img_w=img_w, rng=rng_depth, stratified=stratified,
            banded_kt=banded_kt if tables is not None else None,
            banded_impl="block" if use_block else "pallas",
            block_ut=block_ut if (use_block and tables is not None) else None)

        tgt = batch["images"][:, -1].reshape(B, img_h * img_w, 3)
        tgt = jnp.take_along_axis(tgt, jnp.broadcast_to(
            ray_idx[None, :, None], (B, n_rays, 3)), axis=1)
        if ray_sharding is not None:
            tgt = jax.lax.with_sharding_constraint(tgt, ray_sharding)
        mse = jnp.mean((out["rgb"] - tgt) ** 2)
        loss_all = render_w * mse
        return loss_all, {"render": mse}

    @jax.jit
    def train_step(params, opt_state, batch, rng):
        (loss_all, loss_parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        loss_parts = dict(loss_parts)
        loss_parts["all"] = loss_all
        return params, opt_state, loss_parts

    return train_step
