#!/usr/bin/env python
"""Two-cluster-size scaling evidence (north rule: throughput scaling
efficiency >=0.8 from N to 4N executors).

No real cluster exists in this sandbox, so per the driver protocol the same
validation job runs at two parallelism levels — local[8] vs local[32] on the
same 32-core host, same stored input — in SEPARATE JVMs (subprocess per level,
so executor-thread count is the only variable). Efficiency = (T8 / T32) / 4.

Writes/updates BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

N_TURNS = int(os.environ.get("SPARK_GRAFT_SCALE_TURNS", "4000000"))

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from bench import build_session, _force
from owl2jsonschema_js_spark.compile import compile_spec
from owl2jsonschema_js_spark.datagen import tool_catalog_spark
from owl2jsonschema_js_spark.docs import transcript_constraints
from owl2jsonschema_js_spark.runner import ValidationRunner
from owl2jsonschema_js_spark.spec import ConstraintSpec

cpus = sys.argv[1]
path = sys.argv[2]
gen = len(sys.argv) > 3 and sys.argv[3] == "gen"
spark = build_session(cpus)
spark.sparkContext.setLogLevel("ERROR")
if gen:
    from owl2jsonschema_js_spark.datagen import gen_transcripts_spark
    gen_transcripts_spark(spark, n_rows={n_turns}, n_convs={n_turns} // 200) \
        .write.mode("overwrite").parquet(path)
df = spark.read.parquet(path)
plan = compile_spec(ConstraintSpec.parse(transcript_constraints()), df.schema)
runner = ValidationRunner(plan, n_parts=64)
# warmup (JIT + python workers + codegen), then best-of-3 timed runs
_force(runner.run(df, catalog=tool_catalog_spark(spark)).verdicts)
times = []
for _ in range(3):
    t0 = time.perf_counter()
    _force(runner.run(df, catalog=tool_catalog_spark(spark)).verdicts)
    times.append(time.perf_counter() - t0)
print("RESULT " + json.dumps({{"cpus": int(cpus), "sec": min(times), "all": times}}))
spark.stop()
"""


def run_level(repo: str, cpus: int, path: str, gen: bool) -> float:
    code = CHILD.format(repo=repo, n_turns=N_TURNS)
    args = [sys.executable, "-c", code, str(cpus), path] + (["gen"] if gen else [])
    out = subprocess.run(args, capture_output=True, text=True, timeout=1200)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])["sec"]
    raise RuntimeError(f"child failed (cpus={cpus}):\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}")


def main() -> None:
    repo = os.path.dirname(os.path.abspath(__file__))
    path = tempfile.mkdtemp(prefix="scale_transcripts_") + "/t.parquet"
    t8 = run_level(repo, 8, path, gen=True)
    t32 = run_level(repo, 32, path, gen=False)
    eff = (t8 / t32) / 4.0
    result = {
        "n_turns": N_TURNS,
        "local8_sec": round(t8, 2),
        "local32_sec": round(t32, 2),
        "local8_turns_per_sec": round(N_TURNS / t8, 1),
        "local32_turns_per_sec": round(N_TURNS / t32, 1),
        "scaling_efficiency_8_to_32": round(eff, 3),
        "criterion": "efficiency >= 0.8 from N to 4N (sandbox stand-in: local[8] -> local[32])",
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))

    md = f"""# BENCH — scaling + throughput evidence

North rule: ">=0.8 throughput scaling efficiency from N to 4N executors".
Sandbox protocol (no real cluster): the same validation job — full constraint
suite over {N_TURNS:,} stored transcript turns (hot-conversation skew included
by the generator) — runs at two parallelism levels in separate JVMs on the same
32-core host. Efficiency = (T_N / T_4N) / 4.

| level | wall (s) | turns/sec |
|---|---|---|
| local[8]  (N)  | {t8:.2f} | {N_TURNS / t8:,.0f} |
| local[32] (4N) | {t32:.2f} | {N_TURNS / t32:,.0f} |

**Scaling efficiency (N -> 4N): {eff:.3f}** — {"PASS" if eff >= 0.8 else "FAIL"} (criterion ≥ 0.8).

Reproduce: `python bench_scaling.py` (env `SPARK_GRAFT_SCALE_TURNS` to resize).
Per-query timings at sf0.1: `python bench.py` (BENCH_r{{N}}.json is the
driver-recorded equivalent).
"""
    os.makedirs(os.path.join(repo, "BENCH"), exist_ok=True)
    with open(os.path.join(repo, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
