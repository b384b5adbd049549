"""r5 link-leg probes (all A/B within ONE process — tunnel phases drift):

A. sustained h2d throughput of back-to-back async device_puts at packet
   size (the pipelined loop's real link ceiling, no per-call sync floor).
B. does a SECOND concurrent put stream raise AGGREGATE throughput, or is
   the tunnel a single serialized stream? (decides whether two-packets-
   in-flight can mask slow puts)
C. monotone-gather expansion cost on device: out[j] = vals[prefix[j]]
   where prefix is a cumsum of a bitmap — THE primitive any
   variable-rate depth code (zero-run / per-row width) needs at decode.
   Measured at word (203k) and nibble (814k) granularity.
D. d2h direction for reference (mapping consumers).
"""
import os
import sys
import time
import concurrent.futures as cf

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def sync(x):
    return np.asarray(x if x.ndim == 0 else x.reshape(-1)[:1])


def main():
    import jax
    import jax.numpy as jnp
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    mb = 1.0
    words = int(mb * 1e6 / 4)
    snaps = [rng.integers(0, 2**32, words, dtype=np.uint32)
             for _ in range(4)]
    # warm
    for s in snaps:
        sync(jax.device_put(s))

    def sustained(k=24):
        t0 = time.perf_counter()
        devs = [jax.device_put(snaps[i % 4]) for i in range(k)]
        for d in devs:
            sync(d)
        dt = time.perf_counter() - t0
        return k * mb / dt

    def sustained2(k=12):
        def leg(off):
            ds = [jax.device_put(snaps[(off + i) % 4]) for i in range(k)]
            for d in ds:
                sync(d)
        t0 = time.perf_counter()
        with cf.ThreadPoolExecutor(2) as ex:
            list(ex.map(leg, (0, 2)))
        dt = time.perf_counter() - t0
        return 2 * k * mb / dt

    for rep in range(3):
        s1 = sustained()
        s2 = sustained2()
        print(f"A/B rep{rep}: 1-stream {s1:6.1f} MB/s | "
              f"2-stream aggregate {s2:6.1f} MB/s", flush=True)

    # C: monotone gather expansion
    def make_case(n, p_nz, m_extra=1.15):
        bits = (rng.random(n) < p_nz)
        m = int(n * p_nz * m_extra) + 8
        vals = rng.integers(0, 2**31, m, dtype=np.int32)
        return jnp.asarray(bits), jnp.asarray(vals)

    import functools

    @functools.partial(jax.jit, static_argnames=("sorted_",))
    def expand(bits, vals, sorted_=False):
        prefix = jnp.cumsum(bits.astype(jnp.int32)) - 1
        got = jnp.take(vals, jnp.maximum(prefix, 0),
                       indices_are_sorted=sorted_, mode="clip")
        return jnp.where(bits, got, 0)

    for n, tag in ((203_520, "word-level 203k"),
                   (814_080, "nibble-level 814k"),
                   (3_256_320, "pixel-level 3.26M")):
        bits, vals = make_case(n, 0.45)
        for sorted_ in (False, True):
            r = expand(bits, vals, sorted_=sorted_)
            sync(r)  # compile
            reps = 10
            t0 = time.perf_counter()
            for _ in range(reps):
                r = expand(bits, vals, sorted_=sorted_)
            sync(r)
            dt = (time.perf_counter() - t0) / reps * 1e3
            print(f"C expand {tag:18s} sorted={int(sorted_)}: "
                  f"{dt:6.2f} ms", flush=True)

    # C2: the same expansion done per-row with a one-hot MXU matmul
    # (no gather at all): rows of 53 words, window = the row's slice of
    # the compacted stream fetched via a row-offset gather of [rows, 64]
    rows, wpr = 3840, 53

    @jax.jit
    def expand_onehot(bits2d, vals):
        # bits2d [rows, wpr]; per-row counts and exclusive offsets
        cnt = jnp.sum(bits2d.astype(jnp.int32), axis=1)
        row_off = jnp.cumsum(cnt) - cnt                       # [rows]
        win = 64
        idx = row_off[:, None] + jnp.arange(win, dtype=jnp.int32)
        window = jnp.take(vals, jnp.minimum(idx, vals.shape[0] - 1),
                          mode="clip")                        # [rows, 64]
        pr = jnp.cumsum(bits2d.astype(jnp.int32), axis=1) - 1  # in-row
        onehot = (pr[:, :, None]
                  == jnp.arange(win, dtype=jnp.int32)[None, None, :])
        onehot = onehot & bits2d[:, :, None]
        out = jax.lax.dot_general(
            onehot.astype(jnp.float32), window.astype(jnp.float32),
            (((2,), (1,)), ((0,), (0,))))
        return out  # [rows, wpr] f32 (payload-split handled elsewhere)

    bits, vals = make_case(rows * wpr, 0.45)
    bits2d = bits.reshape(rows, wpr)
    r = expand_onehot(bits2d, vals)
    sync(r)
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        r = expand_onehot(bits2d, vals)
    sync(r)
    print(f"C2 per-row one-hot matmul (203k words, win64): "
          f"{(time.perf_counter() - t0) / reps * 1e3:6.2f} ms", flush=True)

    # D: d2h reference
    dev = jax.device_put(snaps[0])
    sync(dev)
    t0 = time.perf_counter()
    for _ in range(8):
        _ = np.asarray(dev)
    dt = (time.perf_counter() - t0) / 8
    print(f"D d2h 1 MB: {dt * 1e3:.1f} ms ({mb / dt:.0f} MB/s)",
          flush=True)


if __name__ == "__main__":
    main()
