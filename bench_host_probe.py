#!/usr/bin/env python
"""Engine-independent host-parallelism probe.

The sandbox is a VM whose 32 vCPUs are backed by a varying number of physical
cores per boot (no cgroup quota is visible; throttling happens at the
hypervisor). This probe measures the HOST's own compute-scaling ceiling with
pure multiprocessing numpy (no Spark, no JVM, no shuffle): a fixed bag of 32
identical matmul tasks timed under 1/2/8/32 worker processes.

Interpretation: if the probe itself stops scaling past ~k processes, no
distributed engine can show >k-way speedup on this boot — compare
bench_scaling.py's efficiency against THIS ceiling, not against the vCPU
count. Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

# Pin BLAS to one thread BEFORE numpy import, in parent and (via fork /
# initializer) workers: otherwise the 1-process baseline already uses many
# cores through multithreaded matmul, deflating the measured host speedup and
# inflating any host-normalized efficiency computed against it.
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
           "NUMEXPR_NUM_THREADS", "VECLIB_MAXIMUM_THREADS"):
    os.environ[_v] = "1"

import numpy as np  # noqa: E402

N_TASKS = 32
LEVELS = (1, 2, 8, 32)


def _init_worker():
    for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
               "NUMEXPR_NUM_THREADS", "VECLIB_MAXIMUM_THREADS"):
        os.environ[_v] = "1"


def burn(_):
    a = np.random.default_rng(1).standard_normal((600, 600))
    s = 0.0
    for _ in range(60):
        s += float((a @ a).sum())
    return s


def measure(n_procs: int) -> float:
    with mp.Pool(n_procs, initializer=_init_worker) as p:
        t0 = time.perf_counter()
        p.map(burn, range(N_TASKS))
        return time.perf_counter() - t0


def main() -> None:
    burn(0)  # warm BLAS
    walls = {n: round(measure(n), 2) for n in LEVELS}
    base = walls[LEVELS[0]]
    print(json.dumps({
        "fixed_tasks": N_TASKS,
        "wall_s": {str(k): v for k, v in walls.items()},
        "host_speedup_vs_1proc": {str(k): round(base / v, 2) for k, v in walls.items()},
    }))


if __name__ == "__main__":
    main()
