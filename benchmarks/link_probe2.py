"""h2d dtype/shape sensitivity + back-to-back pipelining of the link.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/link_probe2.py
"""

import time

import numpy as np


def main():
    import jax
    from ros_gpu_depthmap_fusion_tpu.utils.profiling import hard_sync

    rng = np.random.default_rng(0)
    print(f"platform={jax.devices()[0].platform}")

    def t_put(payload, iters=8):
        hard_sync(jax.device_put(payload))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jax.device_put(payload)
        hard_sync(out)
        return (time.perf_counter() - t0) / iters

    mb = 2.0
    variants = {
        "u8  [2M]": rng.integers(0, 255, size=int(mb*1e6)).astype(np.uint8),
        "u16 [1M]": rng.integers(0, 2**16, size=int(mb*5e5)).astype(np.uint16),
        "i32 [500k]": rng.integers(0, 2**31, size=int(mb*2.5e5)).astype(np.int32),
        "f32 [500k]": rng.standard_normal(int(mb*2.5e5)).astype(np.float32),
        "i32 [480,1060]": rng.integers(0, 2**31, size=(480, 1060)).astype(np.int32),
        "i32 [8,480,132]": rng.integers(0, 2**31, size=(8, 480, 132)).astype(np.int32),
        "u16 [8,480,848] (raw depth)": rng.integers(0, 2**16, size=(8, 480, 848)).astype(np.uint16),
    }
    for name, a in variants.items():
        t = t_put(a)
        print(f"h2d {name:28s} {a.nbytes/1e6:5.2f}MB  {t*1e3:8.2f} ms "
              f"({a.nbytes/1e6/t:7.1f} MB/s)")

    # pipelining: 6 back-to-back 2MB puts, one sync — per-put effective time
    a = variants["i32 [500k]"]
    hard_sync(jax.device_put(a))
    t0 = time.perf_counter()
    outs = [jax.device_put(a) for _ in range(6)]
    hard_sync(outs)
    t = (time.perf_counter() - t0) / 6
    print(f"6 back-to-back 2MB i32 puts: {t*1e3:8.2f} ms each "
          f"({a.nbytes/1e6/t:7.1f} MB/s)")


if __name__ == "__main__":
    main()
