"""Attribute the spatial depth decode's ~5 ms: code extraction vs
exception scatter vs row cumsum."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from ros_gpu_depthmap_fusion_tpu.utils.profiling import hard_sync
    from ros_gpu_depthmap_fusion_tpu.ops import depth_codec as dc
    from ros_gpu_depthmap_fusion_tpu.utils import native

    H, W, C = 480, 848, 8
    rng = np.random.default_rng(0)
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    base = 2500 + 200 * np.sin(u / 150.0) + 150 * np.cos(v / 120.0)
    d0 = (base + rng.standard_normal((H, W))).astype(np.uint16)
    d0[rng.random((H, W)) < 0.01] = 0
    depth = np.stack([d0] * C)
    enc, bits = native.depth_encode(depth, 12288,
                                    allowed_bits=dc.B_BUCKETS,
                                    quant_shift=3)
    print(f"platform={jax.devices()[0].platform} bits={bits}", flush=True)
    ed = dc.EncodedDepth(
        words=jnp.asarray(enc["words"]),
        row_first=jnp.asarray(enc["row_first"]),
        exc_idx=jnp.asarray(enc["exc_idx"].astype(np.int32)),
        exc_zz=jnp.asarray(enc["exc_zz"].astype(np.int32)),
        exc_count=jnp.int32(enc["exc_count"]))

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

    t("extract codes only", lambda e: dc._extract_codes(e.words, W, bits),
      ed)
    t("extract + scatter exceptions (zz front half)",
      lambda e: dc._extract_zz(e, W, bits)[0], ed)

    def no_exc(e):
        codes = dc._extract_codes(e.words, W, bits)
        is_hole = codes == (1 << bits) - 1
        zz = jnp.where(is_hole, 0, codes)
        delta = (zz >> 1) ^ -(zz & 1)
        series = e.row_first.astype(jnp.int32)[..., None] + jnp.cumsum(
            delta, axis=-1)
        return jnp.where(is_hole, 0, series).astype(jnp.uint16)

    t("full decode MINUS exception scatter", no_exc, ed)
    t("full decode_depth", lambda e: dc.decode_depth(e, H, W, bits, 3), ed)

    # cumsum lowering cost in isolation
    x = jnp.asarray(rng.integers(-3, 3, (C, H, W)).astype(np.int32))
    t("bare cumsum [8,480,848] axis=-1", lambda a: jnp.cumsum(a, axis=-1),
      x)
    t("bare assoc_scan cumsum", lambda a: jax.lax.associative_scan(
        jnp.add, a, axis=-1), x)


if __name__ == "__main__":
    main()
# appended: the matmul cumsum variant is benched by rerunning this file
