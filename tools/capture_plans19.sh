#!/bin/bash
# Capture .explain("formatted") per query into plans/r19/<query>_<tag>.txt
# Usage: tools/capture_plans19.sh <classesDir> <tag> <q1> [q2 ...]
# Runs PlanAudit from the given compiled classes dir and splits its output.
set -e
CLASSES="$1"; TAG="$2"; shift 2
OUT=/root/repo/plans/r19
mkdir -p "$OUT"
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
java $ADDOPENS -Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:/opt/spark/jars/*" graft.examples.PlanAudit "$@" 2>/dev/null |
awk -v out="$OUT" -v tag="$TAG" '
  /^=+ q_/ { if (f) close(f); q=$2; f=out "/" q "_" tag ".txt"; next }
  f { print > f }
'
ls "$OUT" | grep -c "_$TAG.txt"
