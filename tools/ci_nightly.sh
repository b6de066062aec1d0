#!/usr/bin/env bash
# The nightly / pre-merge depth contract (ADVICE r3: the --slow tier must
# be a REQUIRED job, not a convention). Run from the repo root:
#
#   bash tools/ci_nightly.sh
#
# Exits non-zero if any depth-tier test, the multi-chip dryrun, or the
# bench smoke fails. Wall: ~30 min warm-cache on a 1-core box.
set -euo pipefail
cd "$(dirname "$0")/.."

python -m pytest tests/ -q --slow
python __graft_entry__.py
python - <<'EOF'
import json, os, subprocess, sys
env = dict(os.environ, BENCH_BUDGET_S="1")  # headline-only smoke
out = subprocess.run([sys.executable, "bench.py"], capture_output=True,
                     text=True, env=env, timeout=3600)
line = out.stdout.strip().splitlines()[-1]
row = json.loads(line)
assert row.get("value", 0) > 0, f"bench produced no throughput: {line}"
print("bench ok:", line)
EOF
echo "nightly contract: ALL GREEN"
