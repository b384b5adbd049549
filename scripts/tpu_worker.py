"""Long-lived TPU job worker: start once, then execute python snippets
dropped into /tmp/tpuq/*.job.py (lexicographic order), writing each
job's stdout + status to the matching .out file.

Motivation: the axon tunnel wedges fresh processes at startup with high
probability, but an established process keeps working — so pay the
startup roulette ONCE and feed all probes/benches through this worker.
Jobs share a persistent globals dict, so expensive state (engines,
compiled steps, staged scenes) can be built once and reused across jobs.

Run: PYTHONPATH=/root/repo:$PYTHONPATH timeout 14400 python -u scripts/tpu_worker.py
"""

import contextlib
import io
import os
import time
import traceback

QDIR = "/tmp/tpuq"


def main():
    os.makedirs(QDIR, exist_ok=True)
    import jax  # touch the backend now so readiness implies a live tunnel
    print(f"[worker] backend={jax.default_backend()} "
          f"devices={jax.device_count()}", flush=True)
    print("[worker] ready", flush=True)
    g = {"__name__": "__tpu_worker__"}
    while True:
        jobs = sorted(f for f in os.listdir(QDIR) if f.endswith(".job.py"))
        for j in jobs:
            path = os.path.join(QDIR, j)
            out = path[: -len(".job.py")] + ".out"
            with open(path) as f:
                code = f.read()
            os.rename(path, path + ".taken")
            print(f"[worker] start {j}", flush=True)
            t0 = time.time()
            # STREAM job stdout into the .out file as it happens (a wedged
            # RPC is then distinguishable from a long compile by whether
            # progress lines appear)
            with open(out, "w", buffering=1) as f:
                f.write("[RUNNING]\n")
                try:
                    with contextlib.redirect_stdout(f):
                        exec(compile(code, j, "exec"), g)
                    status = "OK"
                except BaseException:
                    f.write(traceback.format_exc())
                    status = "ERR"
                f.write(f"[{status}] {time.time() - t0:.1f}s\n")
            print(f"[worker] done {j} {status} {time.time() - t0:.1f}s",
                  flush=True)
        time.sleep(0.5)


if __name__ == "__main__":
    main()
