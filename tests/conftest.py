"""Test configuration: force an 8-device virtual CPU mesh.

The session environment preloads an `axon` TPU PJRT plugin via sitecustomize
(and sets JAX_PLATFORMS=axon), so plain env vars are not enough — jax is
already imported and its platform list says "axon". Override the config
directly before any backend initializes. Sharding/pjit tests then run against
8 fake CPU devices exactly as the driver's multi-chip dry-run does, and
numerical parity tests compare against the torch reference with exact f32
CPU matmuls.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA:CPU compilation cache: the suite runs on a single-core host
# where XLA compiles dominate wall-clock (full fast loop ~60 min, cold);
# cache entries are keyed on HLO+options+backend so unchanged tests hit disk
# on re-runs. Same .jax_cache dir the CLI/bench path uses (gitignored).
from matchnerf_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import inspect  # noqa: E402

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Auto-mark torch-oracle tests as `parity` so the fast loop
    (`pytest -m "not parity"`) skips them.

    A module whose top level activates the oracle (`install_reference()` /
    `importorskip("torch")` / a plain torch import) is parity-marked
    wholesale; otherwise individual functions whose source touches the
    oracle are marked (mixed modules like test_precision_modes keep their
    pure-JAX tests in the fast group). Importing `reference_opts` /
    `tpu_cfg_from_opts` alone does NOT make a module parity — those are
    config helpers, not oracle comparisons. The split is purely a
    scheduling aid — `pytest tests/` still runs everything.
    """
    module_is_parity: dict = {}
    for item in items:
        mod = getattr(item, "module", None)
        src_file = getattr(mod, "__file__", None)
        if src_file not in module_is_parity:
            try:
                with open(src_file) as f:
                    head = f.read()
            except (OSError, TypeError):
                head = ""
            module_is_parity[src_file] = (
                "install_reference()" in head.split("def ")[0]
                or 'importorskip("torch")' in head.split("def ")[0]
                or "\nimport torch\n" in head.split("def ")[0])
        if module_is_parity[src_file]:
            item.add_marker(pytest.mark.parity)
            continue
        fn = getattr(item, "function", None)
        if fn is None:
            continue
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            continue
        if ("torch_oracle" in src or "install_reference" in src
                or 'importorskip("torch")' in src or "import torch" in src):
            item.add_marker(pytest.mark.parity)
