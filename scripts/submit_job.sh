#!/usr/bin/env bash
# U5 — cluster-agnostic job submission (replaces the reference's
# provider-specific create_cluster.sh). Cluster PROVISIONING stays with
# your platform; this wrapper owns everything Spark-level:
#
#   MASTER=yarn NUM_EXECUTORS=1000 scripts/submit_job.sh your_job.py args...
#
# Geometry env vars (defaults = the docs/deploy_100tb.md sizing):
#   MASTER              yarn | k8s://... | spark://...   (default yarn)
#   DEPLOY_MODE         cluster | client                 (default cluster)
#   NUM_EXECUTORS       default 1000
#   EXECUTOR_CORES      default 5
#   EXECUTOR_MEMORY     default 20g
#   DRIVER_MEMORY       default 8g
#   SHUFFLE_PARTITIONS  default 2 x total cores (AQE coalesces down)
#
# The Spark conf itself is NOT duplicated here: it is emitted from
# session.py (the same _DEFAULTS every in-process session uses) into a
# --properties-file, so submitted jobs and local runs share one tuning
# source of truth.
set -euo pipefail

MASTER=${MASTER:-yarn}
DEPLOY_MODE=${DEPLOY_MODE:-cluster}
NUM_EXECUTORS=${NUM_EXECUTORS:-1000}
EXECUTOR_CORES=${EXECUTOR_CORES:-5}
EXECUTOR_MEMORY=${EXECUTOR_MEMORY:-20g}
DRIVER_MEMORY=${DRIVER_MEMORY:-8g}
SHUFFLE_PARTITIONS=${SHUFFLE_PARTITIONS:-$((NUM_EXECUTORS * EXECUTOR_CORES * 2))}
SPARK_SUBMIT=${SPARK_SUBMIT:-spark-submit}
PYTHON=${PYTHON:-python}

if [ "$#" -lt 1 ]; then
  echo "usage: [GEOMETRY=...] $0 <job.py> [job args...]" >&2
  exit 2
fi

PROPS=$(mktemp "${TMPDIR:-/tmp}/spark_graft_props.XXXXXX")
trap 'rm -f "$PROPS"' EXIT
"$PYTHON" -m big_data_analytics_project_spark.session \
  --emit-conf --shuffle-partitions "$SHUFFLE_PARTITIONS" > "$PROPS"

"$SPARK_SUBMIT" \
  --master "$MASTER" \
  --deploy-mode "$DEPLOY_MODE" \
  --num-executors "$NUM_EXECUTORS" \
  --executor-cores "$EXECUTOR_CORES" \
  --executor-memory "$EXECUTOR_MEMORY" \
  --driver-memory "$DRIVER_MEMORY" \
  --properties-file "$PROPS" \
  "$@"
