#!/usr/bin/env bash
# Bench entry whose ONLY stdout is the one-line JSON result.
# All build output and Spark logs go to stderr; the same JSON is also
# written to bench_out.json. Usage:
#   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 scripts/bench.sh
set -euo pipefail
cd "$(dirname "$0")/.."

CP="target/scala-2.13/classes:/opt/spark/jars/*"
AO="--add-opens java.base/java.lang=ALL-UNNAMED \
    --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
    --add-opens java.base/java.lang.reflect=ALL-UNNAMED \
    --add-opens java.base/java.io=ALL-UNNAMED \
    --add-opens java.base/java.net=ALL-UNNAMED \
    --add-opens java.base/java.nio=ALL-UNNAMED \
    --add-opens java.base/java.util=ALL-UNNAMED \
    --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
    --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
    --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
    --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
    --add-opens java.base/sun.security.action=ALL-UNNAMED \
    --add-opens java.base/sun.util.calendar=ALL-UNNAMED"

if [ ! -d target/scala-2.13/classes ]; then
  sbt -batch compile 1>&2
fi

# graft.Bench prints exactly one stdout line (the JSON); Spark logs are
# on stderr already, so just pass stdout through untouched.
exec java $AO -Xmx8g -cp "$CP" graft.Bench
