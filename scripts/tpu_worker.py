"""Long-lived TPU job runner.

The axon relay allocates one pool session per python process; killed or
overlapping processes park the next session on a futex for minutes (see
.claude/skills/verify: "One JAX process at a time").  Iterating on TPU
measurements through short-lived scripts therefore serialises on session
teardown.  This runner registers ONCE and then executes job files
in-process:

    echo '...python...' > /tmp/tpu_jobs/001_myjob.py
    # runner picks it up, writes 001_myjob.out, then 001_myjob.done
    # (.done contains "ok" or "error")

Jobs share the interpreter: jax/jnp/np are pre-imported in the exec
globals, the jit/compilation cache is warm, and `LOG(msg)` appends a
timestamped line to the job's .out as it runs.  State does NOT persist
between jobs (fresh globals each time) except via the STASH dict.

Usage: python scripts/tpu_worker.py   (run inside tmux; Ctrl-C to stop)
"""

import glob
import io
import os
import sys
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_hp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Job dir defaults to a user-owned 0700 directory (a world-writable /tmp
# path would let any local user drop jobs that exec() as this user).
JOBS = os.environ.get(
    "TPU_JOBS_DIR", os.path.join(os.path.expanduser("~"), ".tpu_jobs")
)
os.makedirs(JOBS, mode=0o700, exist_ok=True)
_st = os.stat(JOBS)
if _st.st_uid != os.getuid():
    sys.exit(f"[worker] refusing job dir {JOBS}: owned by uid {_st.st_uid}")
if _st.st_mode & 0o022:
    os.chmod(JOBS, 0o700)

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    t0 = time.time()
    a = jnp.ones((128, 128))
    print(
        f"[worker] backend={jax.default_backend()} "
        f"health={float(np.asarray(a @ a)[0, 0])} ({time.time() - t0:.1f}s)",
        flush=True,
    )
    stash = {}
    while True:
        if os.path.exists(os.path.join(JOBS, "STOP")):
            print("[worker] STOP sentinel — exiting", flush=True)
            return
        # Re-glob every iteration and take ONE job: a job submitted while
        # another runs must still win on filename order (the old
        # run-the-whole-snapshot loop deferred newly-added earlier names
        # until the pass ended — hours behind a queued sweep), and STOP
        # must be honored between jobs, not between passes.
        pending = [
            f for f in sorted(glob.glob(os.path.join(JOBS, "*.py")))
            if not os.path.exists(f[:-3] + ".done")
        ]
        for f in pending[:1]:
            base = f[:-3]
            print(f"[worker] running {f}", flush=True)
            # Fresh hiddenpose source per job (jobs edit the package
            # between submissions); jax/flax stay warm.
            for m in [m for m in sys.modules if m.startswith("hiddenpose_tpu")]:
                del sys.modules[m]
            out = open(base + ".out", "w")

            def LOG(msg):
                out.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")
                out.flush()

            def SYNC(o):
                np.asarray(jnp.ravel(jax.tree.leaves(o)[0])[0])

            def TIMEIT(tag, fn, iters=5, warmup=2):
                t = time.perf_counter()
                for _ in range(warmup):
                    SYNC(fn())
                LOG(f"{tag}: compile+warmup {time.perf_counter() - t:.0f}s")
                t = time.perf_counter()
                for _ in range(iters):
                    o = fn()
                SYNC(o)
                dt = (time.perf_counter() - t) / iters
                LOG(f"{tag}: {dt * 1000:.2f} ms")
                return dt

            g = {
                "jax": jax, "jnp": jnp, "np": np, "os": os, "sys": sys,
                "time": time, "LOG": LOG, "SYNC": SYNC, "TIMEIT": TIMEIT,
                "STASH": stash, "print": lambda *a, **k: LOG(" ".join(map(str, a))),
            }
            status = "ok"
            try:
                exec(compile(open(f).read(), f, "exec"), g)
            except Exception:
                out.write(traceback.format_exc())
                status = "error"
            out.close()
            with open(base + ".done", "w") as dn:
                dn.write(status)
            # Host-memory hygiene: jax's global jit registries pin every
            # executable + its traced host constants forever; 18 jobs of
            # full-model work grew this process to 113 GB and the kernel
            # OOM-killed it (dmesg 2026-08-18).  Dropping the caches costs
            # a recompile on reuse — the relay's remote compile isn't
            # locally cached anyway.
            import gc
            jax.clear_caches()
            gc.collect()
            print(f"[worker] {f}: {status}", flush=True)
        time.sleep(2)


if __name__ == "__main__":
    main()
