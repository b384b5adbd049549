"""Does the tunnel h2d link multiplex? Aggregate bandwidth of K
concurrent device_puts of 1/K-size chunks vs one big put.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/link_probe5.py
"""

import concurrent.futures
import time

import numpy as np


def main():
    import jax
    from ros_gpu_depthmap_fusion_tpu.utils.profiling import hard_sync

    total = 1_770_000  # bytes ~ the bench packet
    n = total // 4
    host = np.arange(n, dtype=np.uint32)
    hard_sync(jax.device_put(host))
    N = 12

    for k in [1, 2, 4, 8]:
        chunks = np.array_split(host, k)
        ex = concurrent.futures.ThreadPoolExecutor(k)
        # warm
        hard_sync(list(ex.map(jax.device_put, chunks))[-1])
        t0 = time.perf_counter()
        for _ in range(N):
            outs = list(ex.map(jax.device_put, chunks))
        for o in outs:
            hard_sync(o)
        dt = (time.perf_counter() - t0) / N
        print(f"k={k}: {dt*1e3:8.2f} ms  ({total/1e6/dt:6.1f} MB/s)")
        ex.shutdown()

    # sequential small puts (does size matter?)
    for sz in [total, total // 4, total // 16]:
        arr = np.arange(sz // 4, dtype=np.uint32)
        hard_sync(jax.device_put(arr))
        t0 = time.perf_counter()
        for _ in range(N):
            o = jax.device_put(arr)
        hard_sync(o)
        dt = (time.perf_counter() - t0) / N
        print(f"size={sz/1e6:5.2f}MB: {dt*1e3:8.2f} ms "
              f"({sz/1e6/dt:6.1f} MB/s)")


if __name__ == "__main__":
    main()
