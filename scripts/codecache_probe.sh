#!/bin/bash
# Bare-JVM codegen-pathology probe (VERDICT r14 item 4).
#
# Reproduces the methodology note from PLANS.md Round-14: the full
# 135-query Bench run under `java -Xmx100g` (instead of the committed
# sbt fork at -Xmx8g) makes a handful of codegen-hot queries 20-80x
# slower late in the run, with zero GC time inside the slow samples.
#
# Hypothesis under test: a 100 GB heap almost never GCs, Janino
# codegen classes are only unloaded AT a GC, so their JIT'd methods
# accumulate until the 240 MB code cache fills, HotSpot disables the
# compiler ("CodeCache is full"), and late queries run interpreted.
# The probe samples `jcmd Compiler.codecache` and `jstat -class`
# (loaded/unloaded class counts) every 15 s alongside the run, so the
# artifact shows code-cache occupancy and class-unload activity at the
# moment the pathology starts — or proves it absent under a candidate
# fix.
#
# Usage: scripts/codecache_probe.sh <tag> [extra JVM flags...]
#   e.g. scripts/codecache_probe.sh heap100g -Xmx100g
#        scripts/codecache_probe.sh heap100g-bigcc -Xmx100g -XX:ReservedCodeCacheSize=1g
# Outputs: /tmp/ccprobe_<tag>.{log,json,samples}
set -u
TAG="$1"; shift
CP="${GRAFT_CLASSES:-/root/repo/target/scala-2.13/classes}:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done

SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
SPARK_GRAFT_BENCH_OUT=/tmp/ccprobe_${TAG}.json \
java $OPENS "$@" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.Bench > /tmp/ccprobe_${TAG}.log 2>&1 &
PID=$!

: > /tmp/ccprobe_${TAG}.samples
while kill -0 $PID 2>/dev/null; do
  {
    echo "=== $(date +%s)"
    jcmd $PID Compiler.codecache 2>/dev/null | grep -E 'CodeHeap|bounds' | head -6
    jstat -class $PID 2>/dev/null | tail -1
    # RSS + OS page cache: the alternative (non-codegen) mechanism is a
    # never-collected heap ballooning RSS and evicting the page cache
    echo "rss_kb $(ps -o rss= -p $PID 2>/dev/null | tr -d ' ')" \
         "cached_kb $(awk '/^Cached:/{print $2}' /proc/meminfo)"
  } >> /tmp/ccprobe_${TAG}.samples
  sleep 15
done
wait $PID
echo "exit: $?"
grep -iE 'codecache (is full|full)|compiler has been disabled' /tmp/ccprobe_${TAG}.log && \
  echo "== CODECACHE-FULL WARNING PRESENT" || echo "== no codecache-full warning"
