#!/bin/bash
# Launch a graft main class directly from compiled classes + the Spark
# jar dir — avoids holding the sbt build lock during long measurement
# probes (CrossoverProbeMain, RecallProbeMain, ScaleRehearsal) so
# compilation and verification can proceed in parallel.
# Usage: tools/run_main.sh graft.CrossoverProbeMain [args...]
set -euo pipefail
cd "$(dirname "$0")/.."
MAIN="$1"; shift
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java -Xmx48g $ADD_OPENS \
  -Dspark.ui.enabled=false \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$MAIN" "$@"
