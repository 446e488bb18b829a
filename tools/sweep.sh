#!/bin/bash
# Full multi-scale correctness sweep — the round-closing gate described in
# .claude/skills/verify/SKILL.md. The driver only gates sf0.01; sf0.1 has
# caught real scale-dependent nondeterminism (w2_window_running, round 6),
# so every round should end with all three scales green.
set -e
cd "$(dirname "$0")/.."
for sf in sf0.01 sf0.1 sf0.001; do
  out="/tmp/graft_sweep_$sf"
  echo "=== $sf ==="
  sbt -batch "runMain graft.Verify /root/testdata/$sf $out" >/dev/null 2>&1
  python3 tools/check_oracle.py "/root/testdata/$sf" "$out" | tail -1
done
