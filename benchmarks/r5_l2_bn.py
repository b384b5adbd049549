"""r5: level-2 RLE block-size sweep at the current operating point
(448k sorted partial rows -> ~7.5k cells), A/B in one process."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from ros_gpu_depthmap_fusion_tpu.ops.pallas.segreduce import (
        rle_reduce_pallas)
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    n, cells, cap = 448 * 1024, 7500, 16384
    sentinel = 3360000
    # sorted keys: ~385k live rows spread over `cells` distinct cells,
    # rest sentinel (the real stream's shape after the partials sort)
    live = 385_000
    keys = np.sort(rng.integers(0, sentinel, cells))[
        np.sort(rng.integers(0, cells, live))]
    keys = np.concatenate([np.sort(keys),
                           np.full(n - live, sentinel, np.int64)])
    vals = rng.integers(0, 1 << 12, (n, 4)).astype(np.float32)
    kj = jnp.asarray(keys.astype(np.int32))
    vj = jnp.asarray(vals)

    import functools
    for bn in (4096, 8192, 16384):
        f = jax.jit(functools.partial(
            rle_reduce_pallas, capacity=cap, sentinel=sentinel, bn=bn))
        r = f(kj, vj)
        _ = np.asarray(r[2])
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                r = f(kj, vj)
            _ = np.asarray(r[2])
            best = min(best, (time.perf_counter() - t0) / 10 * 1e3)
        print(f"level-2 rle bn={bn:6d}: {best:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
