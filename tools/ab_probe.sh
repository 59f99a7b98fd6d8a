#!/bin/bash
# A/B timing driver (r11 verdict #2): alternate graft.AbProbe sessions
# between two checked-out trees so machine drift cancels, appending every
# session's medians + calibration readings to one committed JSONL record.
#
#   tools/ab_probe.sh <treeA_dir> <tagA> <treeB_dir> <tagB> <out.jsonl> <queries...>
#
# Runs INTERLEAVED JVMs (A B A B ...; 2 rounds by default, override with
# AB_ROUNDS) — a same-day level shift shows up as BOTH trees moving
# together, a code regression as a one-tree offset that survives the
# interleave. Each tree needs graft.AbProbe on its compile path (copy
# src/main/scala/graft/AbProbe.scala in; it is self-contained).
set -e
A_DIR=$1; A_TAG=$2; B_DIR=$3; B_TAG=$4; shift 4
# resolve the record path BEFORE any cd: a relative path would otherwise
# split the record into two per-tree files (each JVM resolves it against
# its own tree) and the "single interleaved record" would never exist
OUT=$(realpath -m "$1"); shift
QUERIES="$*"
ROUNDS=${AB_ROUNDS:-2}
for r in $(seq 1 "$ROUNDS"); do
  for side in A B; do
    if [ $side = A ]; then DIR=$A_DIR; TAG=$A_TAG; else DIR=$B_DIR; TAG=$B_TAG; fi
    echo "== round $r tree $TAG =="
    LOG=$(mktemp /tmp/ab_probe_XXXX.log)
    # run sbt to a log and CHECK ITS EXIT: a tree that fails to compile
    # (AbProbe.scala not copied in, a broken checkout) must abort the
    # A/B naming the tree, never complete "successfully" with a
    # one-sided record that reads as evidence about both trees
    if ! (cd "$DIR" && SPARK_GRAFT_AB_TREE="$TAG" SPARK_GRAFT_AB_OUT="$OUT" \
        SPARK_GRAFT_AB_SESSIONS=${AB_SESSIONS:-3} \
        sbt -batch "runMain graft.AbProbe $QUERIES" > "$LOG" 2>&1); then
      echo "ABORT: tree $TAG ($DIR) failed — tail of $LOG:" >&2
      tail -20 "$LOG" >&2
      exit 1
    fi
    grep -F '"query"' "$LOG" || true
    rm -f "$LOG"
  done
done
echo "record: $OUT"
