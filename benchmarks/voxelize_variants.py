"""Micro-benchmark of voxelize_average building blocks on TPU.

Decides the fastest decomposition of "sort 3.5M (cellid, xyz) rows +
segmented mean": lax.sort operand-count scaling, gather cost, doubling
loop vs cumsum-diff, packed-payload variants.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/voxelize_variants.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from ros_gpu_depthmap_fusion_tpu.utils.profiling import hard_sync

    n = 8 * 480 * 848 + 131072
    m = 3_360_000
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, m, size=n).astype(np.int32))
    pts = jnp.asarray(rng.uniform(-20, 20, size=(n, 4)).astype(np.float32))
    idx = jnp.arange(n, dtype=jnp.int32)
    packed = jnp.asarray(rng.integers(0, 2**31, size=n).astype(np.uint32))

    def bench(name, fn, *args, iters=5):
        f = jax.jit(fn)
        t0 = time.perf_counter()
        hard_sync(f(*args))
        compile_t = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        hard_sync(out)
        t = (time.perf_counter() - t0) / iters
        print(f"{name:44s} {t*1e3:9.2f} ms   (compile {compile_t:5.1f}s)")
        return t

    print(f"n={n} m={m} platform={jax.devices()[0].platform}")

    bench("sort pairs (i32,i32)",
          lambda k, i: jax.lax.sort((k, i), num_keys=1), key, idx)
    bench("sort 3-op (i32,u32,f32)",
          lambda k, p, z: jax.lax.sort((k, p, z), num_keys=1),
          key, packed, pts[:, 2])
    bench("sort 4-op (key,x,y,z)",
          lambda k, p: jax.lax.sort((k, p[:, 0], p[:, 1], p[:, 2]),
                                    num_keys=1), key, pts)
    bench("gather rows [n,4] by perm",
          lambda p, i: jnp.take(p, i, axis=0), pts, idx)
    bench("gather 1d x3 by perm",
          lambda p, i: (jnp.take(p[:, 0], i), jnp.take(p[:, 1], i),
                        jnp.take(p[:, 2], i)), pts, idx)

    def doubling(ks, p):
        acc = p
        s = 1
        while s < n:
            shifted = jnp.pad(acc[:-s], ((s, 0), (0, 0)))
            same = jnp.pad(ks[s:] == ks[:-s], (s, 0))
            acc = acc + jnp.where(same[:, None], shifted, 0.0)
            s *= 2
        return acc

    bench("doubling segsum 22 it [n,4]", doubling, key, pts)

    def cumsum_diff(ks, p):
        c = jnp.cumsum(p, axis=0)
        is_end = jnp.concatenate([ks[1:] != ks[:-1], jnp.array([True])])
        start_c = jnp.pad(c[:-1], ((1, 0), (0, 0)))
        # per-run sum at run ends: c[end] - c[start-1]
        return jnp.where(is_end[:, None], c - start_c, 0.0)

    bench("cumsum [n,4] + diff", cumsum_diff, key, pts)

    from ros_gpu_depthmap_fusion_tpu.ops.mask_ops import compact_multi
    is_end = jnp.asarray(rng.random(n) < 0.3)
    bench("compact_multi (means3, ks) cap=1M",
          lambda p, k, e: compact_multi((p[:, :3], k), e, 1_048_576),
          pts, key, is_end)

    # scatter occupancy from 1M compacted cells
    cells = jnp.asarray(rng.integers(0, m, size=1_048_576).astype(np.int32))
    bench("scatter occ 1M compacted cells",
          lambda c: jnp.zeros((m,), jnp.int32).at[c].max(1, mode="drop"),
          cells)


if __name__ == "__main__":
    main()
