#!/bin/bash
# Round-close ritual (r12 verdict #6 — third repeat of the hygiene
# finding): round artifacts must be COMMITTED at judge time, and the
# committed bench artifact must be the post-everything run chosen by
# RULE, not by hand. Run this as the LAST step of a round, then commit.
#
#   tools/round_close.sh            # full: tests + verify + bench
#   tools/round_close.sh --quick    # skip the test suite (already green)
#
# Exits nonzero if anything is left dirty/untracked at the end.
set -euo pipefail
cd "$(dirname "$0")/.."

if [ "${1:-}" != "--quick" ]; then
  echo "== 1/4 full test suite =="
  sbt -batch test
fi

echo "== 2/4 correctness dump + DuckDB oracle (sf0.01) =="
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_close"
python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_close

echo "== 3/4 bench: 2 interleaved passes + frozen drift control =="
# direct java (no sbt JVM overhead); writes bench_full_latest.json in CWD
java -Xmx48g $(for p in java.lang java.lang.invoke java.lang.reflect java.io \
  java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic \
  sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do \
  echo --add-opens java.base/$p=ALL-UNNAMED; done) \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench 2>/dev/null \
  | grep '"metric"'

echo "== 4/4 artifact hygiene =="
git add -A -- bench_full_latest.json BENCH_r*.json CORRECTNESS_r*.json \
  LEAKCHECK.json BASELINE.md SURVEY.md 2>/dev/null || true
if [ -n "$(git status --porcelain)" ]; then
  echo "ROUND CLOSE FAILED: working tree dirty — commit everything below:"
  git status --short
  exit 1
fi
echo "round close clean: artifacts staged, tree otherwise clean"
