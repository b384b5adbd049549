"""Can h2d transfers overlap device compute on this tunnel?

Measures: (a) steps alone on resident inputs, (b) device_puts alone,
(c) both interleaved from one thread, (d) puts issued from a worker
thread while the main thread dispatches steps. If (d) ~= max(a, b) the
tunnel overlaps DMA with compute and the engine should pipeline ingest
on a thread; if (d) ~= a + b the link serializes and payload size is the
only lever.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/link_overlap_probe.py
"""

import concurrent.futures
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from ros_gpu_depthmap_fusion_tpu.utils.profiling import hard_sync

    n = 1_770_000 // 4  # ~ the bench packet, in u32 words
    host = np.arange(n, dtype=np.uint32)

    # a matmul chain sized to ~28 ms (the fused step's cost)
    a = jnp.ones((2048, 2048), jnp.float32)

    @jax.jit
    def work(x, iters):
        def body(i, x):
            return x @ a * (1.0 / 2048.0)
        return jax.lax.fori_loop(0, iters, body, x)

    x0 = jnp.ones((2048, 2048), jnp.float32)
    hard_sync(work(x0, 10))
    # calibrate compute to ~28 ms
    t0 = time.perf_counter()
    hard_sync(work(x0, 100))
    per_iter = (time.perf_counter() - t0) / 100
    iters = max(1, int(0.028 / per_iter))
    t0 = time.perf_counter()
    hard_sync(work(x0, iters))
    t_work = time.perf_counter() - t0
    print(f"compute chunk: {t_work*1e3:.1f} ms ({iters} matmuls)")

    N = 15
    # (b) puts alone, drained
    hard_sync(jax.device_put(host))
    t0 = time.perf_counter()
    for _ in range(N):
        o = jax.device_put(host)
    hard_sync(o)
    t_put = (time.perf_counter() - t0) / N
    print(f"put alone:    {t_put*1e3:8.2f} ms "
          f"({host.nbytes/1e6/t_put:.1f} MB/s)")

    # (c) interleaved, one thread
    t0 = time.perf_counter()
    for _ in range(N):
        o = jax.device_put(host)
        r = work(x0, iters)
    hard_sync(o)
    hard_sync(r)
    t_inter = (time.perf_counter() - t0) / N
    print(f"interleaved:  {t_inter*1e3:8.2f} ms "
          f"(serial would be {(t_put+t_work)*1e3:.1f})")

    # (d) puts from a worker thread, steps from main
    ex = concurrent.futures.ThreadPoolExecutor(1)
    hard_sync(jax.device_put(host))
    t0 = time.perf_counter()
    futs = []
    for _ in range(N):
        futs.append(ex.submit(jax.device_put, host))
        r = work(x0, iters)
    o = futs[-1].result()
    hard_sync(o)
    hard_sync(r)
    t_thread = (time.perf_counter() - t0) / N
    print(f"threaded put: {t_thread*1e3:8.2f} ms")
    ex.shutdown()

    # (e) d2h while compute runs (the mapping worker's occupancy fetch)
    big = jnp.arange(3_400_000, dtype=jnp.uint8)
    hard_sync(big)
    t0 = time.perf_counter()
    for _ in range(N):
        _ = np.asarray(big)
    t_d2h = (time.perf_counter() - t0) / N
    print(f"d2h 3.4MB:    {t_d2h*1e3:8.2f} ms "
          f"({big.nbytes/1e6/t_d2h:.1f} MB/s)")


if __name__ == "__main__":
    main()
