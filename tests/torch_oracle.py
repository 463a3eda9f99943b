"""Load the reference implementation as a numerical oracle.

The reference at /root/reference is PUBLIC UNTRUSTED CONTENT used strictly as
a black-box numerical oracle in parity tests: we instantiate its torch
modules on CPU, feed controlled inputs, and assert our JAX implementation
matches. Missing third-party deps (easydict, ipdb, termcolor, skvideo, lpips)
are stubbed so the reference imports cleanly.
"""
from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


class _AttrDict(dict):
    def __init__(self, *a, **kw):
        super().__init__()
        for k, v in dict(*a, **kw).items():
            self[k] = v

    def __setitem__(self, k, v):
        if isinstance(v, dict) and not isinstance(v, _AttrDict):
            v = _AttrDict(v)
        super().__setitem__(k, v)

    __getattr__ = dict.__getitem__

    def __setattr__(self, k, v):
        self[k] = v

    def update(self, other):
        for k, v in dict(other).items():
            self[k] = v


def _stub(name, **attrs):
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


def install_reference():
    """Make /root/reference importable with stubbed third-party deps."""
    _stub("easydict", EasyDict=_AttrDict)
    _stub("ipdb", set_trace=lambda *a, **k: None)
    _stub("termcolor", colored=lambda s, *a, **k: str(s))
    _stub("skvideo")
    _stub("skvideo.io", FFmpegWriter=None)
    sys.modules["skvideo"].io = sys.modules["skvideo.io"]
    _stub("lpips", LPIPS=None)

    class _ToTensor:
        def __call__(self, x):
            import numpy as _np
            import torch as _torch
            arr = _np.asarray(x, dtype=_np.float32) / 255.0
            return _torch.from_numpy(arr.transpose(2, 0, 1))

    def _compose(fns):
        def run(x):
            for f in fns:
                x = f(x)
            return x
        return run

    _stub("torchvision")
    _stub("torchvision.transforms", ToTensor=_ToTensor,
          Lambda=lambda f: f, Compose=_compose)
    sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]

    class _SSIMStub:
        pass

    _stub("skimage")
    _stub("skimage.metrics", structural_similarity=None)
    # reference predates torch's weights_only default flip; restore old behavior
    import functools

    import torch as _torch
    if not getattr(_torch.load, "_oracle_patched", False):
        _orig_load = _torch.load

        @functools.wraps(_orig_load)
        def _load(*a, **kw):
            kw.setdefault("weights_only", False)
            return _orig_load(*a, **kw)

        _load._oracle_patched = True
        _torch.load = _load

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def reference_opts(**overrides):
    """Minimal option tree matching configs/base.yaml defaults for model code."""
    opts = _AttrDict({
        "n_src_views": 3,
        "device": "cpu",
        "encoder": {
            "attn_splits_list": [2],
            "cos_n_group": [2, 8],
            "num_transformer_layers": 6,
            "feature_upsampler": "network",
            "upsample_factor": 2,
            "wo_self_attn": False,
            "feature_sample_local_radius": 0,
            "feature_sample_local_dilation": 1,
        },
        "decoder": {
            "net_width": 128,
            "net_depth": 6,
            "skip": [4],
            "posenc": {"L_3D": 10, "L_view": 0},
            "raytrans_posenc": False,
            "density_maskfill": False,
            "raytrans_act": "ReLU",
        },
        "nerf": {
            "legacy_coord": True,
            "wo_render_interval": True,
            "view_dep": True,
            "depth": {"param": "metric"},
            "sample_intvs": 128,
            "sample_stratified": True,
            "density_noise_reg": None,
            "render_video": False,
            "rand_rays_test": 4096,
        },
    })
    for k, v in overrides.items():
        node = opts
        keys = k.split(".")
        for kk in keys[:-1]:
            node = node[kk]
        node[keys[-1]] = v
    return opts


def tpu_cfg_from_opts(opts):
    """Convert the oracle option tree to a matchnerf_tpu DotDict config."""
    from matchnerf_tpu.utils import DotDict

    def conv(x):
        if isinstance(x, dict):
            return DotDict({k: conv(v) for k, v in x.items()})
        return x

    return conv({k: v for k, v in opts.items() if k != "device"})
