"""Persistent TPU job runner: holds the device once, executes queued jobs.

The axon tunnel serializes device access per PROCESS and lock churn
between short-lived processes costs minutes; this worker grabs the TPU
once and then exec()s job files as they appear.

Protocol: drop `NNN_name.py` into /tmp/tpu_jobs/; the worker runs jobs
in lexical order, writing stdout+traceback to `NNN_name.out` (plus a
final line DONE/FAIL).  A job named `quit.py` stops the worker.  Each
job runs in a fresh namespace but the process (and so the jax runtime,
compile cache, and live buffers in _G) persists.  `_G` is a dict shared
across jobs for caching compiled fns/scenes.
"""

import io
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/rtrt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

QUEUE = "/tmp/tpu_jobs"
os.makedirs(QUEUE, exist_ok=True)

# Grab the device now.
import jax.numpy as jnp

jnp.zeros(8).block_until_ready()
print("worker ready, devices:", jax.devices(), flush=True)

_G = {}

while True:
    jobs = sorted(f for f in os.listdir(QUEUE)
                  if f.endswith(".py") and not f.startswith("_"))
    if not jobs:
        time.sleep(0.5)
        continue
    job = jobs[0]
    path = os.path.join(QUEUE, job)
    if job == "quit.py":
        os.remove(path)
        print("worker quitting", flush=True)
        break
    with open(path) as f:
        src = f.read()
    os.rename(path, path + ".running")
    outpath = path[:-3] + ".out"
    buf = io.StringIO()
    old = sys.stdout
    t0 = time.time()
    try:
        sys.stdout = buf
        ns = {"_G": _G, "jax": jax, "jnp": jnp}
        exec(compile(src, job, "exec"), ns)
        status = "DONE"
    except BaseException:
        buf.write(traceback.format_exc())
        status = "FAIL"
    finally:
        sys.stdout = old
    buf.write(f"\n{status} in {time.time() - t0:.1f}s\n")
    with open(outpath, "w") as f:
        f.write(buf.getvalue())
    os.remove(path + ".running")
    print(f"{job}: {status}", flush=True)
