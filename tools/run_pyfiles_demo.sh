#!/usr/bin/env bash
# The north rule's literal launch shape — `spark-submit --py-files engine.zip`
# — executed end-to-end (last run 2026-08-17, round 3: manifest-resumable
# validation over a generated transcripts table; violations parquet +
# canonical verdicts JSON emitted; exit 0).
#
# On a cluster, replace --master with your cluster master and add
# --num-executors N; the same zip + entry script work unchanged.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="${1:-$(mktemp -d /tmp/pyfiles_run.XXXX)}"

cd "$REPO" && zip -qr "$WORK/engine.zip" owl2jsonschema_js_spark

PYTHONPATH="$REPO" python - "$WORK" <<'EOF'
import sys, json
work = sys.argv[1]
from pyspark.sql import SparkSession
from owl2jsonschema_js_spark.datagen import gen_transcripts_pandas
from owl2jsonschema_js_spark.docs import transcript_constraints
spark = SparkSession.builder.master("local[4]").config("spark.ui.enabled","false").getOrCreate()
fx = gen_transcripts_pandas(n_convs=40, seed=42)
fx.to_spark(spark).write.mode("overwrite").parquet(f"{work}/transcripts.parquet")
fx.catalog_spark(spark).write.mode("overwrite").parquet(f"{work}/catalog.parquet")
json.dump(transcript_constraints(), open(f"{work}/constraints.json", "w"))
spark.stop()
EOF

cat > "$WORK/run_validate.py" <<'EOF'
from owl2jsonschema_js_spark.__main__ import main
import sys
sys.exit(main(sys.argv[1:]))
EOF

spark-submit --master "local[8]" --py-files "$WORK/engine.zip" "$WORK/run_validate.py" \
  --input "$WORK/transcripts.parquet" \
  --constraints "$WORK/constraints.json" \
  --catalog "$WORK/catalog.parquet" \
  --manifest "$WORK/manifest.json" \
  --output "$WORK/out" --n-parts 8

test -f "$WORK/out/verdicts.json" && echo "OK: $WORK/out/verdicts.json"
