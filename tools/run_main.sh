#!/usr/bin/env bash
# Run a graft main class in a fresh isolated JVM (no sbt lock, no sbt
# overhead) — the "isolated-warm" measurement protocol's runner. Mirrors
# build.sbt's fork options exactly (JDK17 add-opens, UI off, UTC, heap).
#
#   bash tools/run_main.sh graft.Bench                       # envs pass through
#   bash tools/run_main.sh graft.tools.FixtureGen <src> <dst> 10
#
# Requires a prior `sbt Test/compile` (classes under target/scala-2.13).
set -euo pipefail
cd "$(dirname "$0")/.."

ADD_OPENS=()
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS+=(--add-opens "java.base/$p=ALL-UNNAMED")
done

exec java "${ADD_OPENS[@]}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  "-Xmx${SPARK_DRIVER_MEM:-16g}" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$@"
