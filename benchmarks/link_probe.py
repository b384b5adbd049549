"""Characterize the host->device link: size scaling, multi-array batching,
concurrency, dtype effects, and overlap with device compute.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/link_probe.py
"""

import concurrent.futures as cf
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from ros_gpu_depthmap_fusion_tpu.utils.profiling import hard_sync

    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"platform={dev.platform}")

    def t_put(payload, iters=6):
        hard_sync(jax.device_put(payload))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jax.device_put(payload)
        hard_sync(out)
        return (time.perf_counter() - t0) / iters

    # --- size scaling, single u8 array ---
    for mb in (0.25, 0.5, 1.0, 2.0, 4.0, 8.0):
        a = rng.integers(0, 255, size=int(mb * 1e6), dtype=np.uint8)
        t = t_put(a)
        print(f"h2d 1x{mb:4.2f}MB u8:        {t*1e3:8.2f} ms "
              f"({mb/t:8.1f} MB/s)")

    # --- one 2MB vs 8x 0.25MB in one device_put (list) ---
    parts = [rng.integers(0, 255, size=262144, dtype=np.uint8)
             for _ in range(8)]
    t = t_put(parts)
    print(f"h2d 8x0.25MB one put:      {t*1e3:8.2f} ms ({2.1/t:8.1f} MB/s)")

    # --- 8 sequential device_puts then one sync ---
    def seq_puts():
        outs = [jax.device_put(p) for p in parts]
        return outs
    hard_sync(seq_puts())
    t0 = time.perf_counter()
    for _ in range(6):
        outs = seq_puts()
    hard_sync(outs)
    t = (time.perf_counter() - t0) / 6
    print(f"h2d 8x0.25MB seq puts:     {t*1e3:8.2f} ms ({2.1/t:8.1f} MB/s)")

    # --- 4 threads x 2 puts ---
    def put_one(p):
        return jax.device_put(p)
    with cf.ThreadPoolExecutor(4) as ex:
        hard_sync(list(ex.map(put_one, parts)))
        t0 = time.perf_counter()
        for _ in range(6):
            outs = list(ex.map(put_one, parts))
        hard_sync(outs)
        t = (time.perf_counter() - t0) / 6
    print(f"h2d 8x0.25MB 4 threads:    {t*1e3:8.2f} ms ({2.1/t:8.1f} MB/s)")

    # --- many tiny arrays (the FrameInputs shape) ---
    tiny = [np.zeros((4, 4), np.float32) for _ in range(15)]
    t = t_put(tiny)
    print(f"h2d 15 tiny arrays:        {t*1e3:8.2f} ms")
    t = t_put(np.zeros((15, 4, 4), np.float32))
    print(f"h2d 1 packed tiny array:   {t*1e3:8.2f} ms")

    # --- overlap with device compute: big sort + put ---
    k = jnp.asarray(rng.integers(0, 2**31, size=3_400_000).astype(np.int32))
    srt = jax.jit(lambda x: jax.lax.sort((x, x), num_keys=1))
    hard_sync(srt(k))
    t0 = time.perf_counter()
    for _ in range(6):
        s = srt(k)
    hard_sync(s)
    t_sort = (time.perf_counter() - t0) / 6
    big = rng.integers(0, 255, size=2_000_000, dtype=np.uint8)
    t_big = t_put(big)
    t0 = time.perf_counter()
    for _ in range(6):
        s = srt(k)
        o = jax.device_put(big)
    hard_sync(s)
    hard_sync(o)
    t_both = (time.perf_counter() - t0) / 6
    print(f"sort {t_sort*1e3:.1f} ms, put {t_big*1e3:.1f} ms, "
          f"both {t_both*1e3:.1f} ms "
          f"({'overlaps' if t_both < t_sort + t_big - 2e-3 else 'serial'})")

    # --- d2h for comparison ---
    d = jax.device_put(big)
    hard_sync(d)
    t0 = time.perf_counter()
    for _ in range(6):
        _ = np.asarray(d)
    t = (time.perf_counter() - t0) / 6
    print(f"d2h 2MB:                   {t*1e3:8.2f} ms ({2.0/t:8.1f} MB/s)")


if __name__ == "__main__":
    main()
