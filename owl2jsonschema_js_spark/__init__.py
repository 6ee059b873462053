"""owl2jsonschema_js_spark — a PySpark-native schema + constraint validation engine.

A from-scratch engine (NOT a port) that compiles owl2jsonschema-style canonical
JSON Schema (draft 4) declarations — the exact constraint vocabulary the reference
compiler emits (``/root/reference/lib/index.js:832-1150``) — into vectorized Spark
Column predicate trees, and executes them over partitioned tables of multi-turn
conversation/agent transcripts:

    conv_id:string, turn_idx:int32, role:string, text:string, tool:string, ts:timestamp

Design goals (BASELINE.json north rule):
 * DataFrame API + pandas/Arrow vectorized UDFs only — no per-row Python.
 * exact per-partition pass/fail verdicts + violation rows,
 * single mapInPandas pass per partition for column stats,
 * salted / full-key-hash shuffles that survive hot-conversation skew,
 * KS/PSI distribution drift vs a checkpointed baseline profile,
 * resumable runs via a per-partition checkpoint manifest with lineage.
"""

from owl2jsonschema_js_spark.spec import ConstraintSpec
from owl2jsonschema_js_spark.compile import compile_spec, compile_schema, RulePlan
from owl2jsonschema_js_spark.runner import ValidationRunner, ValidationResult
from owl2jsonschema_js_spark.checkpoint import Manifest, ResumableValidator
from owl2jsonschema_js_spark.sources import TableIO
from owl2jsonschema_js_spark.evolve import delta_plan, merge_verdicts, plan_diff
from owl2jsonschema_js_spark.suggest import suggest_constraints

__version__ = "0.2.0"

__all__ = [
    "ConstraintSpec",
    "compile_spec",
    "compile_schema",
    "RulePlan",
    "ValidationRunner",
    "ValidationResult",
    "Manifest",
    "ResumableValidator",
    "TableIO",
    "plan_diff",
    "delta_plan",
    "merge_verdicts",
    "suggest_constraints",
]
