"""Gather microbenchmark: what limits the conditional-feature query on TPU?

Measures the marginal per-iteration cost (K-scan slope, relay-safe — see
CLAUDE.md) of row gathers shaped like the MatchNeRF cond query
(models/matchnerf.py::query_cond_info): N point indices into an [n_rows, C]
table, consumed by a small reduction so XLA can fuse like the real pipeline.

Sweeps: row width (channels), dtype (bf16/f32/int8), index count, index
order (random / sorted / epipolar-coherent), and a one-hot-matmul expansion
alternative for banded reads.

Usage: nohup python tools/bench_gather.py > /tmp/bench_gather.log 2>&1 &
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    K1, K2 = 4, 12

    def slope(run, *args):
        """Marginal ms/iter between K1 and K2 iterations of the scan body.

        block_until_ready lies through the axon relay; a device->host
        transfer (np.asarray) is the only true sync. The transfer cost is
        K-independent so it cancels in the slope."""
        np.asarray(run(K1, *args))                # compile K1
        np.asarray(run(K2, *args))                # compile K2
        t0 = time.time(); np.asarray(run(K1, *args)); t1 = time.time()
        t2 = time.time(); np.asarray(run(K2, *args)); t3 = time.time()
        return ((t3 - t2) - (t1 - t0)) / (K2 - K1) * 1000.0

    def make_gather_bench(consume="sum"):
        import functools

        @functools.partial(jax.jit, static_argnums=0)
        def run(K, table, idx):
            def step(carry, _):
                rows = jnp.take(table, carry, axis=0)           # [N,C]
                s = rows.astype(jnp.float32).sum()
                carry = carry + (s * 1e-30).astype(jnp.int32)
                return carry, ()
            carry, _ = jax.lax.scan(step, idx, None, length=K)
            return carry

        return run

    rng = np.random.default_rng(0)
    run_gather = make_gather_bench()

    def bench_gather(n_rows, n_idx, n_chan, dtype, order="random"):
        if dtype == "int8":
            table = jnp.asarray(rng.integers(-127, 127, (n_rows, n_chan)),
                                jnp.int8)
        else:
            table = jnp.asarray(rng.normal(0, 1, (n_rows, n_chan)),
                                jnp.dtype(dtype))
        if order == "random":
            idx = rng.integers(0, n_rows, n_idx)
        elif order == "sorted":
            idx = np.sort(rng.integers(0, n_rows, n_idx))
        elif order == "coherent":
            # epipolar-like: S=128 consecutive samples per ray walk a short
            # monotone segment from a random start
            S = 128
            n_rays = n_idx // S
            start = rng.integers(0, n_rows - 4 * S, n_rays)
            step = rng.uniform(0.05, 1.5, n_rays)               # px per sample
            walk = start[:, None] + (np.arange(S)[None, :] * step[:, None])
            idx = walk.astype(np.int64).reshape(-1) % n_rows
        idx = jnp.asarray(idx, jnp.int32)
        ms = slope(run_gather, table, idx)
        gb = n_idx * n_chan * table.dtype.itemsize / 1e9
        print(f"gather rows={n_rows:7d} idx={n_idx:8d} C={n_chan:5d} "
              f"{dtype:8s} {order:9s}: {ms:7.2f} ms  "
              f"{n_idx/ms/1e3:8.1f} Midx/s  {gb/ms*1000:7.1f} GB/s", flush=True)
        return ms

    print("=== A. row-width sweep (scale-1-sized table, 1M random idx, bf16)")
    for C in (16, 64, 128, 256, 512, 1024, 2048):
        bench_gather(81920, 1 << 20, C, "bfloat16")

    print("=== B. dtype sweep (C=1024)")
    for dt in ("float32", "bfloat16", "int8"):
        bench_gather(81920, 1 << 20, 1024, dt)

    print("=== C. index-count sweep (C=1024 bf16)")
    for n in (1 << 17, 1 << 18, 1 << 19, 1 << 20, 1 << 21):
        bench_gather(81920, n, 1024, "bfloat16")

    print("=== D. index order (C=1024 bf16, 1M idx)")
    for order in ("random", "sorted", "coherent"):
        bench_gather(81920, 1 << 20, 1024, "bfloat16", order)

    print("=== E. table size (C=1024 bf16, 1M random idx)")
    for rows in (20480, 81920, 327680):
        bench_gather(rows, 1 << 20, 1024, "bfloat16")

    print("=== F. small-table color-style gather (C=12, f32, 1M idx)")
    bench_gather(327680, 1 << 20, 12, "float32")
    bench_gather(327680, 1 << 20, 16, "bfloat16")

    print("=== G. banded gather + one-hot matmul expansion "
          "(R=8192 rays, S=128 samples, K taps/ray, C=1024 bf16)")
    import functools

    @functools.partial(jax.jit, static_argnums=0)
    def run_band(K, table, tap_idx, onehot):
        # tap_idx: [R*Kt] band-cell indices; onehot: [R, S, Kt] expansion
        def step(carry, _):
            rows = jnp.take(table, carry, axis=0)                # [R*Kt, C]
            R, S, Kt = onehot.shape
            rows = rows.reshape(R, Kt, -1)
            expanded = jnp.einsum("rsk,rkc->rsc", onehot,
                                  rows.astype(jnp.bfloat16))     # MXU
            s = expanded.astype(jnp.float32).sum()
            carry = carry + (s * 1e-30).astype(jnp.int32)
            return carry, ()
        carry, _ = jax.lax.scan(step, tap_idx, None, length=K)
        return carry

    R, S = 8192, 128
    table = jnp.asarray(rng.normal(0, 1, (81920, 1024)), jnp.bfloat16)
    for Kt in (16, 32, 64):
        start = rng.integers(0, 81920 - 2 * Kt, R)
        taps = (start[:, None] + np.arange(Kt)[None, :]).reshape(-1)
        tap_idx = jnp.asarray(taps, jnp.int32)
        oh = np.zeros((R, S, Kt), np.float32)
        oh[np.arange(R)[:, None], np.arange(S)[None, :],
           rng.integers(0, Kt, (R, S))] = 1.0
        onehot = jnp.asarray(oh, jnp.bfloat16)
        ms = slope(run_band, table, tap_idx, onehot)
        print(f"band Kt={Kt:3d}: {ms:7.2f} ms  "
              f"(vs direct 1M-idx gather above)", flush=True)


if __name__ == "__main__":
    main()
