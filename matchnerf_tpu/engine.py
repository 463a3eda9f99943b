"""Training/eval orchestrator — the reference `Coach` (coach.py:27-529),
re-built around jitted pure functions.

Lifecycle: load datasets -> init/import params -> optax optimizer with
per-group OneCycle schedules -> epoch loop calling the jitted train step ->
periodic validate/test/checkpoint -> metric aggregation files. Host code
only moves numpy in/out and logs; all math lives in compiled programs.
"""
from __future__ import annotations

import math
import os
import time
from collections import OrderedDict
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import camera
from .data import DataLoader, datas_dict
from .parallel import distributed as dist
from .metrics import EvalTools, summarize_loss, summarize_metrics
from .models.matchnerf import init_matchnerf
from .renderer import Renderer, extract_poses
from .train_step import build_optimizer, make_train_step
from .utils import DotDict, effective_precision, log
from .utils.checkpoint import restore_checkpoint, save_checkpoint
from .utils.logging import update_timer
from .utils.visualize import save_image, visualize_depth, write_video


class Coach:
    def __init__(self, cfg: DotDict):
        self.cfg = cfg
        self.n_src_views = cfg.n_src_views
        self.epoch_start = 0
        self.iter_start = 0
        self.params = None
        self.opt_state = None
        self.mesh = None
        self.parallel_mode = None
        self.renderer = Renderer(cfg)
        self.scalars_path = os.path.join(cfg.output_path, "scalars.jsonl")
        self._tb = None
        os.makedirs(cfg.output_path, exist_ok=True)

    # ------------------------------ datasets --------------------------------

    def _parallel_plan(self):
        """Decide the parallel mode from config + the GLOBAL device view
        (multi-host: jax.devices() spans every process after
        `parallel.maybe_initialize`). Returns (mode, n_devices): mode is
        'batch' (global batch dim sharded; each process loads its chunk),
        'rays' (batch_size=1 flagship recipe: the ray axis shards, data is
        replicated so every process loads the full batch), or None."""
        n = int((self.cfg.get("parallel") or {}).get("data_parallel", -1) or -1)
        avail = len(jax.devices())
        if n <= 0:
            n = avail
        n = min(n, avail)
        n_proc = jax.process_count()
        if n_proc > 1 and n != avail:
            # a mesh that omits some process's chips would deadlock its
            # collectives; multi-host always spans the full global view
            log.warn(f"parallel.data_parallel={n} ignored under "
                     f"{n_proc} processes; using all {avail} devices")
            n = avail
        bsz = int(self.cfg.batch_size)
        # eval-only configs carry no rand_rays_train; ray mode then never
        # applies (eval sharding is per-slice, renderer-side)
        n_rays = int((self.cfg.get("nerf") or {}).get("rand_rays_train")
                     or 0) // max(bsz, 1)
        if n > 1 and bsz % n == 0 and bsz % n_proc == 0:
            return "batch", n
        if n > 1 and n_rays and n_rays % n == 0:
            return "rays", n
        return None, n

    def load_dataset(self, splits: List[str]):
        log.info("loading datasets...")
        mode, _ = self._parallel_plan()
        n_shards, shard_id = ((jax.process_count(), jax.process_index())
                              if mode == "batch" else (1, 0))
        for split in splits:
            if not self.cfg.get(f"data_{split}"):
                continue
            if split == "test":
                data_cfg_list = list(self.cfg.data_test.values())
                self.test_loaders = []
            else:
                data_cfg_list = [self.cfg.get(f"data_{split}")]
            for data_cfg in data_cfg_list:
                if data_cfg is None:
                    continue
                ds_cls = datas_dict[data_cfg.dataset_name]
                dataset = ds_cls(
                    data_cfg.root_dir, split, n_views=self.n_src_views,
                    img_wh=tuple(data_cfg.img_wh), max_len=data_cfg.get("max_len", -1),
                    scene_list=data_cfg.get("scene_list"),
                    test_views_method=data_cfg.get("test_views_method", "nearest"),
                    nf_mode=data_cfg.get("nf_mode", "avg"),
                    eval_mode=data_cfg.get("eval_mode", "mvsnerf"),
                    n_add_train_views=data_cfg.get("n_add_train_views", 2),
                    meta_dir=data_cfg.get("meta_dir"))
                loader = DataLoader(dataset, batch_size=self.cfg.batch_size,
                                    shuffle=(split == "train"),
                                    num_workers=data_cfg.get("num_workers", 4),
                                    seed=int(self.cfg.get("seed") or 0),
                                    num_shards=(n_shards if split == "train"
                                                else 1),
                                    shard_id=(shard_id if split == "train"
                                              else 0))
                if split == "test":
                    self.test_loaders.append(loader)
                else:
                    setattr(self, f"{split}_loader", loader)
                log.info(f"  * loaded {split} set of {data_cfg.dataset_name}")

    # ------------------------------ networks --------------------------------

    def build_networks(self):
        log.info("building networks...")
        key = jax.random.PRNGKey(int(self.cfg.get("seed") or 0))
        self.params = init_matchnerf(key, self.cfg)
        pretrain = self.cfg.encoder.get("pretrain_weight")
        if pretrain and not self.cfg.get("load") and not self.cfg.get("resume"):
            if os.path.isfile(pretrain):
                from .import_torch import import_gmflow_pretrained
                self.params["feat_enc"] = import_gmflow_pretrained(
                    pretrain, self.params["feat_enc"],
                    gmflow_n_blocks=self.cfg.encoder.num_transformer_layers)
                log.info(f"loaded gmflow pretrained weight for encoder from {pretrain}.")
            else:
                log.warn(f"pretrain weight {pretrain} not found; encoder starts "
                         "from random init.")

    # ------------------------------ optimizer -------------------------------

    def setup_parallel(self):
        """Create the device mesh for data-parallel training (replaces the
        reference's DataParallel wrap, coach.py:83-85). With n>1 devices and
        batch_size divisible by n, batches shard over the 'data' axis and
        params replicate; XLA inserts the gradient psum."""
        from .parallel import make_mesh, replicate_tree

        self.parallel_mode, n = self._parallel_plan()
        if self.parallel_mode is None:
            self.mesh = None
            return
        self.mesh = make_mesh(n_devices=n)
        self.params = replicate_tree(self.params, self.mesh)
        if self.opt_state is not None:
            self.opt_state = replicate_tree(self.opt_state, self.mesh)
        self.renderer.set_mesh(self.mesh)
        log.info(f"  * {self.parallel_mode}-parallel mesh over {n} devices"
                 f" ({jax.process_count()} processes)")

    def setup_eval_parallel(self):
        """Standalone-eval mesh (test.py path): replicate params and shard
        render-slice rays over all attached chips. During training,
        setup_parallel already configured this."""
        if self.mesh is not None:
            return
        from .parallel import make_mesh, replicate_tree

        n = int((self.cfg.get("parallel") or {}).get("data_parallel", -1) or -1)
        avail = len(jax.devices())
        n = avail if n <= 0 else min(n, avail)
        if jax.process_count() > 1:
            n = avail  # multi-host meshes must span every process's chips
        if n <= 1:
            return
        self.mesh = make_mesh(n_devices=n)
        self.params = replicate_tree(self.params, self.mesh)
        self.renderer.set_mesh(self.mesh)
        log.info(f"  * eval ray-sharding mesh over {n} devices")

    def setup_optimizer(self):
        log.info("setting up optimizers...")
        assert hasattr(self, "train_loader"), "load the training data first"
        steps_per_epoch = len(self.train_loader)
        total_steps = steps_per_epoch * int(self.cfg.max_epoch)
        self.tx, self.schedules = build_optimizer(self.cfg, total_steps)
        self.opt_state = self.tx.init(self.params)
        self.steps_per_epoch = steps_per_epoch
        log.info(f"  * {self.cfg.optim.algo.type} optimizer, "
                 f"lr_enc={self.cfg.optim.lr_enc}, lr_dec={self.cfg.optim.lr_dec}, "
                 f"{total_steps} total steps")

    # ------------------------------ checkpoint ------------------------------

    def restore_checkpoint_if_needed(self):
        cfg = self.cfg
        if cfg.get("resume"):
            ckpt_path = os.path.join(cfg.output_path, "models", "latest.ckpt")
            if not os.path.isfile(ckpt_path):
                log.warn(f"can NOT find previous checkpoints at {ckpt_path}")
                log.warn("start training from scratch.")
            else:
                log.info("resuming from previous checkpoint...")
                self.params, opt, ep, it = restore_checkpoint(
                    self.params, ckpt_path, resume=True,
                    optim_state=self.opt_state)
                if opt is not None:
                    self.opt_state = opt
                self.epoch_start, self.iter_start = ep, it
        elif cfg.get("load"):
            log.info(f"loading weights from checkpoint {cfg.load}...")
            self.params, _, _, _ = restore_checkpoint(self.params, cfg.load)
        else:
            log.info("initializing weights from scratch...")
        self._sync_state_from_host0()

    def _sync_state_from_host0(self):
        """Multi-host: only host 0 writes checkpoints, and on clusters
        without a shared filesystem the other hosts may not see the file at
        all — or, worse, restore different bytes. Every host adopts host 0's
        params/opt-state/progress so the replicated-params invariant holds
        regardless of checkpoint visibility. No-op single-process."""
        if jax.process_count() == 1:
            return
        state = dist.broadcast_tree({
            "params": self.params,
            "opt": self.opt_state,
            "ep": np.int64(self.epoch_start),
            "it": np.int64(self.iter_start)})
        self.params = state["params"]
        if self.opt_state is not None:
            self.opt_state = state["opt"]
        self.epoch_start = int(state["ep"])
        self.iter_start = int(state["it"])

    def save_checkpoint_now(self, ep: int, it: int, backup_ckpt: bool = True,
                            async_write: bool = False):
        """async_write is used for the frequent mid-epoch `latest.ckpt` saves
        (training never blocks on disk); epoch-end/preemption saves are sync.
        Multi-host: params are fully replicated, so process 0 alone writes
        (all other hosts skip; no cross-host gather needed)."""
        if not dist.is_main_process():
            return
        ckpt = {"model": self.params}
        if self.opt_state is not None:
            ckpt["optim"] = self.opt_state
        save_checkpoint(self.cfg.output_path, ckpt, ep=ep, it=it,
                        backup_ckpt=backup_ckpt, async_write=async_write)

    # ------------------------------- logging --------------------------------

    def setup_visualizer(self):
        if self.cfg.get("tb"):
            try:
                from torch.utils import tensorboard
                self._tb = tensorboard.SummaryWriter(log_dir=self.cfg.output_path,
                                                     flush_secs=10)
            except Exception:
                log.warn("tensorboard unavailable; falling back to scalars.jsonl only")

    def log_scalars(self, loss=None, metric=None, lrates=None, step=0, split="train"):
        import json
        if not dist.is_main_process():
            return  # one scalars.jsonl / TB stream per run, owned by host 0
        record = {"step": int(step), "split": split, "time": time.time()}
        if loss is not None:
            for k, v in loss.items():
                if k != "all":
                    record[f"loss_{k}"] = float(v)
        if metric is not None:
            for k, v in metric.items():
                record[k] = float(np.mean(np.asarray(v, np.float64)))
        if lrates is not None:
            for k, v in lrates.items():
                record[f"lr_{k}"] = float(v)
        with open(self.scalars_path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self._tb is not None:
            for k, v in record.items():
                if k not in ("step", "split", "time"):
                    self._tb.add_scalar(f"{split}/{k}", v, step)

    def get_cur_lrates(self) -> Dict[str, float]:
        step = getattr(self, "it", 0)
        out = {}
        for name in ("enc", "dec"):
            sched = self.schedules.get(name) if hasattr(self, "schedules") else None
            base = float(self.cfg.optim.get(f"lr_{name}", 0.0))
            out[name] = float(sched(step)) if (sched and base > 0) else base
        return out

    # ------------------------------ training --------------------------------

    def _prep_train_batch(self, batch: Dict) -> Dict:
        tgt_extr = np.asarray(batch["extrinsics"][:, -1, :3, :])
        c2w = (camera.pose_inverse_legacy_np(tgt_extr) if self.cfg.nerf.legacy_coord
               else np.asarray(camera.pose_inverse(jnp.asarray(tgt_extr))))
        if getattr(self, "mesh", None) is not None:
            from .parallel.mesh import shard_batch_tree
            host = {
                "images": np.asarray(batch["images"]),
                "extrinsics": np.asarray(batch["extrinsics"]),
                "intrinsics": np.asarray(batch["intrinsics"]),
                "near_fars": np.asarray(batch["near_fars"]),
                "tgt_c2w": np.asarray(c2w),
            }
            mode = "batch" if self.parallel_mode == "batch" else "replicated"
            return shard_batch_tree(host, self.mesh, mode=mode)
        return {
            "images": jnp.asarray(batch["images"]),
            "extrinsics": jnp.asarray(batch["extrinsics"]),
            "intrinsics": jnp.asarray(batch["intrinsics"]),
            "near_fars": jnp.asarray(batch["near_fars"]),
            "tgt_c2w": jnp.asarray(c2w),
        }

    def _install_preemption_handler(self):
        """Save a resumable checkpoint on SIGTERM/SIGINT (preemption-safe
        training — absent in the reference, SURVEY.md §5 'failure detection')."""
        import signal

        def _handler(signum, frame):
            log.warn(f"received signal {signum}; saving checkpoint before exit...")
            self.save_checkpoint_now(ep=getattr(self, "ep", 0),
                                     it=getattr(self, "it", 0), backup_ckpt=False)
            raise SystemExit(128 + signum)

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                signal.signal(sig, _handler)
            except ValueError:
                pass  # not in main thread

    def train_model(self):
        cfg = self.cfg
        log.title("TRAINING START")
        self._install_preemption_handler()
        self.timer = {"start": time.time(), "it_mean": None}
        self.it = self.iter_start
        self.ep = self.epoch_start
        n_loader = len(self.train_loader)
        freq = cfg.freq
        self.val_it = math.ceil(freq.val_it * n_loader) if freq.val_it > 0 else freq.val_it
        self.test_it = math.ceil(freq.test_it * n_loader) if freq.test_it > 0 else freq.test_it
        self.ckpt_it = math.ceil(freq.ckpt_it * n_loader) if freq.ckpt_it > 0 else freq.ckpt_it

        self.setup_parallel()
        W, H = cfg.data_train.img_wh
        n_rays = int(cfg.nerf.rand_rays_train) // max(int(cfg.batch_size), 1)
        self._train_hw = (H, W, n_rays)
        self._train_steps = {}        # banded_kt bucket -> compiled step
        self._banded_kt_cache = {}    # pose-bytes -> banded_kt bucket
        self._train_step = self._get_train_step(None)
        self._rng = jax.random.PRNGKey(int(cfg.get("seed") or 0))

        if cfg.get("sanity_check") and self.it == 0:
            if self.val_it and self.val_it > 0 and hasattr(self, "val_loader"):
                self.validate_model(iteration=self.it, is_sanity_check=True)
            if freq.test_ep > 0 and hasattr(self, "test_loaders"):
                self.test_model(ep=0, save_images=False, is_sanity_check=True)

        trace_dir = cfg.get("profile_trace_dir")
        if trace_dir:
            from .utils.profiling import trace
            with trace(trace_dir):
                for self.ep in range(self.epoch_start, int(cfg.max_epoch)):
                    self.train_epoch()
        else:
            for self.ep in range(self.epoch_start, int(cfg.max_epoch)):
                self.train_epoch()

        if self._tb is not None:
            self._tb.flush()
        log.title("TRAINING DONE")

    def train_epoch(self):
        cfg = self.cfg
        self.train_loader.set_epoch(self.ep)
        last_loss = None
        for batch_idx, batch in enumerate(self.train_loader):
            if cfg.get("resume") and self.ep * len(self.train_loader) + batch_idx < self.iter_start:
                continue
            last_loss = self.train_iteration(batch)

        lr_dict = self.get_cur_lrates()
        if cfg.freq.log_ep > 0 and (self.ep + 1) % cfg.freq.log_ep == 0 and last_loss:
            log.loss_train(cfg.max_epoch, self.ep + 1, lr_dict, last_loss["all"], self.timer)
        if cfg.freq.val_ep > 0 and (self.ep + 1) % cfg.freq.val_ep == 0:
            self.validate_model(iteration=self.it)
        if (self.ep >= cfg.freq.test_ep_start and cfg.freq.test_ep > 0
                and (self.ep + 1) % cfg.freq.test_ep == 0):
            self.test_model(ep=self.ep + 1, save_images=cfg.get("save_test_image", False))
        if cfg.freq.ckpt_ep > 0 and (self.ep + 1) % cfg.freq.ckpt_ep == 0:
            self.save_checkpoint_now(ep=self.ep + 1, it=self.it, backup_ckpt=True)

    _train_hw = None
    _train_steps = None
    _banded_kt_cache = None

    def _get_train_step(self, buckets):
        if self._train_hw is None:
            # test harnesses install _train_step directly without the
            # train_model() setup; honor it for the default (direct) path
            return self._train_step
        if self._train_steps is None:
            self._train_steps = {}
        if buckets not in self._train_steps:
            H, W, n_rays = self._train_hw
            banded_kt, block_ut = buckets if buckets is not None \
                else (None, None)
            self._train_steps[buckets] = make_train_step(
                self.cfg, self.tx, H, W, n_rays, mesh=self.mesh,
                shard_rays=self.parallel_mode == "rays", banded_kt=banded_kt,
                block_ut=block_ut)
        return self._train_steps[buckets]

    def _train_banded_kt(self, batch: Dict):
        """Per-batch (banded_kt, block_ut) buckets for the training cond
        query (cached by pose bytes; buckets keep the jit cache small).
        block_ut engages only with nerf.train_ray_patches +
        precision.block_kernel (the trainable block megakernel);
        (None, None) = direct path."""
        cfg = self.cfg
        prec = effective_precision(cfg)
        if not (hasattr(prec, "get") and prec.get("banded_kernel")):
            return None
        if self.mesh is not None or int(cfg.batch_size) != 1:
            return None
        if self._train_hw is None:
            return None
        if self._banded_kt_cache is None:
            self._banded_kt_cache = {}
        extr = np.asarray(batch["extrinsics"])     # [1,V+1,3/4,4]
        intr = np.asarray(batch["intrinsics"])
        nf = np.asarray(batch["near_fars"])
        key = (extr.tobytes(), intr.tobytes(), nf.tobytes())
        if key not in self._banded_kt_cache:
            from .renderer import banded_kt_host, extract_poses
            W, H = cfg.data_train.img_wh
            up = int(cfg.encoder.upsample_factor)
            scale_hws = [(H // 8, W // 8), (H // 8 * up, W // 8 * up)]
            patches = bool(cfg.nerf.get("train_ray_patches", False)) \
                if hasattr(cfg.nerf, "get") else False
            if patches and prec.get("block_kernel"):
                # device-measured run bound + block-union buckets (covers
                # every 8-aligned pixel strip of the image)
                poses = extract_poses(batch)
                kt, ut, _ = self.renderer._pose_prep(
                    poses, poses["tgt"], scale_hws, H, W)
                buckets = None if kt is None else (kt, ut)
            else:
                c2w = camera.pose_inverse_legacy_np(extr[:, -1, :3, :]) \
                    if cfg.nerf.legacy_coord else \
                    np.asarray(camera.pose_inverse(
                        jnp.asarray(extr[:, -1, :3, :])))
                kt = banded_kt_host(
                    cfg, c2w, intr[0, -1], nf[0, -1],
                    extr[0, :-1, :3, :], intr[0, :-1], scale_hws, H, W)
                # the kernel path needs every scale banded; mixed None ->
                # direct
                if kt is not None and any(k is None for k in kt):
                    kt = None
                buckets = None if kt is None else (kt, None)
            self._banded_kt_cache[key] = buckets
        return self._banded_kt_cache[key]

    def train_iteration(self, batch: Dict) -> Dict:
        self.timer["it_start"] = time.time()
        self._rng, step_rng = jax.random.split(self._rng)
        dev_batch = self._prep_train_batch(batch)
        step_fn = self._get_train_step(self._train_banded_kt(batch))
        self.params, self.opt_state, loss_parts = step_fn(
            self.params, self.opt_state, dev_batch, step_rng)
        # TPU-first: do NOT materialize the loss every step — a float()
        # blocks on the step result and kills dispatch pipelining. The
        # returned dict carries device scalars; summarize_loss (host float +
        # NaN/Inf fail-fast asserts, the reference's per-step behavior,
        # coach.py:245-259) runs only on freq.scalar boundaries, or every
        # step with sync_loss_every_step: true.
        weights = self.cfg.loss_weight
        loss = {"render": loss_parts["render"],
                "all": float(weights["render"]) * loss_parts["render"]}

        self.it += 1
        self.timer["it_end"] = time.time()
        update_timer(self.timer, self.cfg.max_epoch, self.ep, len(self.train_loader))
        freq = self.cfg.freq
        if (bool(self.cfg.get("sync_loss_every_step", False))
                or (freq.scalar > 0 and self.it % freq.scalar == 0)):
            loss = summarize_loss({"render": loss_parts["render"]}, weights)
        if freq.scalar > 0 and self.it % freq.scalar == 0:
            self.log_scalars(loss=loss, lrates=self.get_cur_lrates(),
                             step=self.it, split="train")
        if self.ckpt_it and self.ckpt_it > 0 and self.it % self.ckpt_it == 0:
            self.save_checkpoint_now(ep=self.ep, it=self.it, backup_ckpt=False,
                                     async_write=True)
        if self.val_it and self.val_it > 0 and self.it % self.val_it == 0:
            self.validate_model(iteration=self.it)
        if self.test_it and self.test_it > 0 and self.it % self.test_it == 0:
            self.test_model(ep=self.ep, save_images=self.cfg.get("save_test_image", False))
        return loss

    # ----------------------------- validation -------------------------------

    def validate_model(self, iteration=None, is_sanity_check=False):
        assert hasattr(self, "val_loader"), "please load validation dataset."
        out_dir = os.path.join(self.cfg.output_path, "validation")
        os.makedirs(out_dir, exist_ok=True)
        eval_tools = EvalTools()
        metrics_dict: Dict[str, list] = {k: [] for k in eval_tools.support_metrics}

        for batch_idx, batch in enumerate(self.val_loader):
            if is_sanity_check and batch_idx > 0:
                break
            ret = self.renderer.forward(self.params, batch, mode="val")
            img_wh = batch["img_wh"][0]
            H, W = int(img_wh[1]), int(img_wh[0])
            B = batch["images"].shape[0]
            pred_rgb = np.asarray(ret["rgb"]).reshape(B, H, W, 3)
            pred_depth = np.asarray(ret["depth"]).reshape(B, H, W)
            for b in range(B):
                gt_rgb = np.asarray(batch["images"][b, -1])
                minmax = np.asarray(batch["near_fars"][b, -1]).tolist()
                depth_vis = visualize_depth(pred_depth[b], minmax)
                img_vis = np.concatenate(
                    [depth_vis, (pred_rgb[b] * 255).astype(np.uint8),
                     (gt_rgb * 255).astype(np.uint8)], axis=1)
                out_name = (f"{batch['scene'][b]}_view{batch['view_ids'][b][-1]}"
                            f"_it{iteration}.jpg")
                if dist.is_main_process():
                    save_image(os.path.join(out_dir, out_name), img_vis)

                mask = None
                if self.val_loader.dataset.get_name().startswith("dtu"):
                    assert "depth" in batch, "Must provide 'depth' for validation"
                    mask = np.asarray(batch["depth"][b]) == 0
                eval_tools.set_inputs(pred_rgb[b], gt_rgb, mask)
                for k, v in eval_tools.get_metrics().items():
                    metrics_dict[k].append(v)

        self.log_scalars(metric=metrics_dict, step=iteration, split="val")

    # -------------------------------- test ----------------------------------

    def test_model(self, ep=None, save_images=True, is_sanity_check=False,
                   separate_save=False):
        assert hasattr(self, "test_loaders"), "Must load the test data for testing."
        cfg = self.cfg
        test_outroot = os.path.join(cfg.output_path, "test")
        os.makedirs(test_outroot, exist_ok=True)
        eval_tools = EvalTools()
        metrics_dict: Dict[str, OrderedDict] = {}

        for data_loader in self.test_loaders:
            dataname = data_loader.dataset.get_name()
            metrics_dict[dataname] = OrderedDict()
            data_outdir = os.path.join(test_outroot, dataname)
            os.makedirs(data_outdir, exist_ok=True)
            self.renderer.nerf_setbg_opaque = dataname == "blender"

            for batch_idx, batch in enumerate(data_loader):
                if is_sanity_check and batch_idx > 0:
                    break
                ret = self.renderer.forward(self.params, batch, mode="test")
                img_wh = batch["img_wh"][0]
                H, W = int(img_wh[1]), int(img_wh[0])
                B = batch["images"].shape[0]
                pred_rgb = np.asarray(ret["rgb"]).reshape(B, H, W, 3)
                pred_depth = np.asarray(ret["depth"]).reshape(B, H, W)

                for b in range(B):
                    gt_rgb = np.asarray(batch["images"][b, -1])
                    pred_u8 = (pred_rgb[b] * 255).astype(np.uint8)
                    gt_u8 = (gt_rgb * 255).astype(np.uint8)
                    src_ids = "_".join(f"{x:02d}" for x in
                                       batch["view_ids"][b][: self.n_src_views])
                    out_name = (f"{batch['scene'][b]}_view"
                                f"{batch['view_ids'][b][-1]:02d}_src{src_ids}")
                    if hasattr(self, "it"):
                        out_name = f"it{self.it}_{out_name}"
                    if ep is not None:
                        out_name = f"ep{ep}_{out_name}"
                    if (save_images or separate_save) and dist.is_main_process():
                        if separate_save:
                            save_image(os.path.join(data_outdir, f"{out_name}_pred.png"), pred_u8)
                            save_image(os.path.join(data_outdir, f"{out_name}_gt.png"), gt_u8)
                            for s in range(self.n_src_views):
                                src_u8 = (np.asarray(batch["images"][b, s]) * 255).astype(np.uint8)
                                save_image(os.path.join(data_outdir,
                                                        f"{out_name}_{s}_src.png"), src_u8)
                        else:
                            if cfg.get("vis_depth"):
                                minmax = np.asarray(batch["near_fars"][b, -1]).tolist()
                                dv = visualize_depth(pred_depth[b], minmax)
                                img_vis = np.concatenate([dv, pred_u8, gt_u8], axis=1)
                            else:
                                img_vis = np.concatenate([pred_u8, gt_u8], axis=1)
                            save_image(os.path.join(data_outdir, f"{out_name}.png"), img_vis)

                    mask = np.asarray(batch["depth"][b]) == 0 if "depth" in batch else None
                    eval_tools.set_inputs(pred_rgb[b], gt_rgb, mask)
                    data_test_cfg = (cfg.get("data_test") or {}).get(dataname) or {}
                    report_full = bool(data_test_cfg.get("report_full_scores", False))
                    cur_metrics = eval_tools.get_metrics(return_full=report_full)
                    pred_img_id = f"{batch['scene'][b]}_{batch['view_ids'][b][-1]:03d}"
                    metrics_dict[dataname][pred_img_id] = cur_metrics
            self.renderer.nerf_setbg_opaque = False

        sum_dict = summarize_metrics(
            metrics_dict, test_outroot if dist.is_main_process() else None,
            ep=ep)
        log_msg = (f"{self.ep:02d},{self.it:06d};"
                   if hasattr(self, "ep") and hasattr(self, "it") else "")
        for dataname, data_metric in sum_dict.items():
            # skip all-NaN metrics (e.g. LPIPS without its VGG weights)
            # instead of tripping nanmean's empty-slice RuntimeWarning
            avg = {k: float(np.nanmean(vv))
                   for k, v in data_metric.items()
                   if not np.all(np.isnan(vv := np.asarray(v, np.float64)))}
            log_msg += (f" {dataname.upper()[0]}: {avg.get('PSNR', float('nan')):.2f}, "
                        f"{avg.get('SSIM', float('nan')):.3f}, "
                        f"{avg.get('LPIPS', float('nan')):.3f},")
            self.log_scalars(metric=avg, step=ep or 0, split=dataname)
        log.metric_test(log_msg)
        return sum_dict

    # ------------------------------- video ----------------------------------

    def test_model_video(self, ep=None):
        assert hasattr(self, "test_loaders"), "Must load the test data for testing."
        cfg = self.cfg
        out_root = os.path.join(cfg.output_path, "test_videos")
        os.makedirs(out_root, exist_ok=True)

        for data_loader in self.test_loaders:
            dataname = data_loader.dataset.get_name()
            data_outdir = os.path.join(out_root, dataname)
            os.makedirs(data_outdir, exist_ok=True)
            if "dtu" in dataname:
                self.renderer.nerf_setbg_opaque, mode = False, "interpolate"
            elif dataname == "blender":
                self.renderer.nerf_setbg_opaque, mode = True, "interpolate"
            elif dataname == "llff":
                self.renderer.nerf_setbg_opaque, mode = False, "spiral"
            elif dataname == "colmap":
                self.renderer.nerf_setbg_opaque = False
                mode = cfg.data_test.colmap.get("render_path_mode", "interpolate")
            else:
                raise ValueError(f"Unknown dataset for rendering video {dataname}")

            for batch in data_loader:
                ret = self.renderer.forward(self.params, batch, mode="test",
                                            render_video=True, render_path_mode=mode)
                img_wh = batch["img_wh"][0]
                H, W = int(img_wh[1]), int(img_wh[0])
                B = batch["images"].shape[0]
                n_frames = int(cfg.nerf.video_n_frames)
                # forward() concatenates frames along axis 0: [n_frames*B, H*W, 3]
                pred_rgb = (np.asarray(ret["rgb"]).reshape(n_frames, B, H, W, 3)
                            .transpose(1, 0, 2, 3, 4))
                if not dist.is_main_process():
                    continue
                for b in range(B):
                    frames_u8 = [(pred_rgb[b, f] * 255).astype(np.uint8)
                                 for f in range(n_frames)]
                    src_ids = "_".join(f"{x:02d}" for x in
                                       batch["view_ids"][b][: self.n_src_views])
                    out_name = (f"{batch['scene'][b]}_view"
                                f"{batch['view_ids'][b][-1]:02d}_src{src_ids}")
                    if ep is not None:
                        out_name = f"ep{ep}_{out_name}"
                    if cfg.nerf.get("save_frames"):
                        for f_idx, frame in enumerate(frames_u8):
                            save_image(os.path.join(data_outdir,
                                                    f"{out_name}_f{f_idx}.jpg"), frame)
                    write_video(os.path.join(data_outdir, f"{out_name}.mp4"), frames_u8,
                                pts_rate=float(cfg.nerf.get("video_pts_rates", 2.0)))
                    if cfg.nerf.get("save_gif"):
                        import imageio
                        imageio.mimsave(os.path.join(data_outdir, f"{out_name}.gif"),
                                        frames_u8, fps=12)
                    srcs = np.concatenate(
                        [(np.asarray(batch["images"][b, i]) * 255).astype(np.uint8)
                         for i in range(self.n_src_views)], axis=1)
                    save_image(os.path.join(data_outdir, f"{out_name}.jpg"), srcs)
