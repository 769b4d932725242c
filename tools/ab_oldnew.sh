#!/usr/bin/env bash
# Dev-only: interleaved old-vs-new A/B. "old" runs the classes built
# from the pre-round commit in a git worktree (OLD_CLASSES), "new"
# runs this tree's classes. Same JVM flags, same box, alternating.
set -u
QS="${AB_QUERIES:?set AB_QUERIES}"
REPS="${AB_REPS:-3}"
OLD_CLASSES="${OLD_CLASSES:-/tmp/old18/target/scala-2.13/classes}"
NEW_CLASSES="/root/repo/target/scala-2.13/classes"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
cd /root/repo
for rep in $(seq 1 "$REPS"); do
  for cfg in old new; do
    CP_DIR=$([ "$cfg" = old ] && echo "$OLD_CLASSES" || echo "$NEW_CLASSES")
    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
      SPARK_GRAFT_QUERIES="$QS" SPARK_GRAFT_AB_CHILD=1 \
      SPARK_GRAFT_DETAIL_OUT=/tmp/abon_${cfg}_${rep}.json \
      timeout 1500 java $ADD_OPENS \
        -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx8g \
        -cp "$CP_DIR:/opt/spark/jars/*" graft.Bench \
        >/dev/null 2>/tmp/abon_${cfg}_${rep}.err
    echo "rep=$rep cfg=$cfg rc=$?"
  done
done
echo AB_DONE
