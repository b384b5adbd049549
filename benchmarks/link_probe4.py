"""Wire-compression-aware codec probe: the tunnel compresses payloads, so
compare REAL bench-frame encodings: 4-bit packed stream vs byte-aligned
codes (low entropy per byte, wire-compressible) vs raw.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/link_probe4.py
"""

import time

import numpy as np


def main():
    import jax
    from ros_gpu_depthmap_fusion_tpu.utils.profiling import hard_sync
    from ros_gpu_depthmap_fusion_tpu.utils import native
    from ros_gpu_depthmap_fusion_tpu.ops.depth_codec import B_BUCKETS

    rng = np.random.default_rng(0)
    u, v = np.meshgrid(np.arange(848), np.arange(480))
    base = 2500 + 200 * np.sin(u / 150.0) + 150 * np.cos(v / 120.0)
    depth = np.stack([(base + rng.standard_normal((480, 848)))
                      .astype(np.uint16) for _ in range(8)])
    depth[rng.random(depth.shape) < 0.01] = 0

    enc, bits = native.depth_encode(depth, allowed_bits=B_BUCKETS)
    words = np.ascontiguousarray(enc["words"]).reshape(-1)
    print(f"bits={bits} packed={words.nbytes/1e6:.2f}MB")

    # byte-aligned zigzag codes (esc=255): recompute via reference-ish numpy
    d = depth.reshape(8 * 480, 848).astype(np.int32)
    zz8 = np.zeros_like(d, np.uint8)
    for r in range(d.shape[0]):
        row = d[r]
        nz = row != 0
        vals = row[nz]
        if len(vals):
            deltas = np.diff(vals)
            z = (deltas << 1) ^ (deltas >> 31)
            z = np.clip(z, 0, 254)
            out = np.zeros(len(vals), np.uint8)
            out[1:] = z.astype(np.uint8)
            tmp = np.full(848, 255, np.uint8)
            tmp[nz] = out
            zz8[r] = tmp
        else:
            zz8[r] = 255
    zz8 = zz8.reshape(-1)
    print(f"zz8={zz8.nbytes/1e6:.2f}MB")
    import zlib
    t0 = time.perf_counter()
    c1 = zlib.compress(words.tobytes(), 1)
    t1 = time.perf_counter()
    c2 = zlib.compress(zz8.tobytes(), 1)
    t2 = time.perf_counter()
    print(f"zlib1: packed->{len(c1)/1e6:.2f}MB ({(t1-t0)*1e3:.0f}ms) "
          f"zz8->{len(c2)/1e6:.2f}MB ({(t2-t1)*1e3:.0f}ms)")

    def t_put(name, a, iters=8):
        hard_sync(jax.device_put(a))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jax.device_put(a)
        hard_sync(out)
        t = (time.perf_counter() - t0) / iters
        print(f"{name:40s} {a.nbytes/1e6:5.2f}MB {t*1e3:8.2f} ms")

    t_put("4-bit packed words (real)", words)
    t_put("byte codes zz8 (real)", zz8)
    t_put("byte codes zz8 as u32 view",
          np.ascontiguousarray(zz8).view(np.uint32))
    t_put("raw depth u16 (real)", depth)
    half = words[: words.size // 2].copy()
    t_put("half the packed words", half)


if __name__ == "__main__":
    main()
