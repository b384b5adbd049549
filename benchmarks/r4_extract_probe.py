"""A/B code-extraction layouts: the aligned unpack's [.., wpr, ppw]
intermediate has a ppw(=16)-wide minor dim — 1/8 vector-lane utilization
on TPU. Variants keep the minor dim at the pixel width instead."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from ros_gpu_depthmap_fusion_tpu.utils.profiling import hard_sync

    C, H, W, bits = 8, 480, 848, 2
    ppw = 32 // bits
    wpr = (W * bits + 31) // 32
    rng = np.random.default_rng(0)
    words = jnp.asarray(rng.integers(0, 2**32, (C, H, wpr), np.uint64)
                        .astype(np.uint32))
    print(f"platform={jax.devices()[0].platform}", flush=True)

    def v0(w):
        fields32 = (w[..., None]
                    >> (jnp.arange(ppw, dtype=jnp.uint32)
                        * jnp.uint32(bits))) & jnp.uint32((1 << bits) - 1)
        return fields32.reshape(C, H, wpr * ppw)[..., :W].astype(jnp.int32)

    def v1(w):
        rep = jnp.broadcast_to(w[..., None], (C, H, wpr, ppw)).reshape(
            C, H, wpr * ppw)[..., :W]
        sh = ((jnp.arange(wpr * ppw, dtype=jnp.uint32) % ppw)
              * jnp.uint32(bits))[:W]
        return ((rep >> sh) & jnp.uint32((1 << bits) - 1)).astype(jnp.int32)

    def v2(w):
        flat = w.reshape(C, H * wpr)
        planes = jnp.stack(
            [(flat >> jnp.uint32(k * bits)) & jnp.uint32((1 << bits) - 1)
             for k in range(ppw)], axis=-1)      # [C, H*wpr, ppw]
        return planes.reshape(C, H, wpr * ppw)[..., :W].astype(jnp.int32)

    def t(name, fn, *args, iters=10):
        f = jax.jit(fn)
        hard_sync(f(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        hard_sync(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:46s} {dt * 1e3:8.2f} ms", flush=True)
        return dt

    r0 = np.asarray(jax.jit(v0)(words))
    for name, fn in (("v0 field-minor (current)", v0),
                     ("v1 broadcast+pixel-minor shift", v1),
                     ("v2 plane-stack", v2)):
        r = np.asarray(jax.jit(fn)(words))
        ok = np.array_equal(r, r0)
        t(f"{name} correct={ok}", fn, words)


if __name__ == "__main__":
    main()
