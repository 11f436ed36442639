#!/usr/bin/env bash
# One-command end-of-project reproduction (r4 VERDICT item 6): the artifact a
# new maintainer runs on a fresh checkout (or a real cluster) to re-establish
# every claim this repo makes.
#
#   bash scripts/reproduce.sh            # full: pytest + all-query sweeps at
#                                        # sf0.001 AND sf0.01 + two-level scaling
#   GRAFT_REPRO_FAST=1 bash scripts/... # skip the scaling protocol (CI-sized)
#
# Outputs land under $GRAFT_REPRO_OUT (default /tmp/graft_repro):
#   pytest.txt, sweep_sf0.001.txt, sweep_sf0.01.txt, scaling.json, summary.json
# Exit code 0 iff every gate is green.
set -u
cd "$(dirname "$0")/.."
OUT="${GRAFT_REPRO_OUT:-/tmp/graft_repro}"
SF_ROOT="${GRAFT_SF_ROOT:-/root/testdata}"
mkdir -p "$OUT"
rc=0

echo "== 1/4 pytest (CI gate) =="
python -m pytest tests/ -q > "$OUT/pytest.txt" 2>&1 || rc=1
tail -2 "$OUT/pytest.txt"

echo "== 2/4 oracle value-hash sweep, all queries, sf0.001 =="
python scripts/check_oracle.py "$SF_ROOT/sf0.001" > "$OUT/sweep_sf0.001.txt" 2>/dev/null || rc=1
echo "green: $(grep -c '^ok' "$OUT/sweep_sf0.001.txt")  failed: $(grep -c '^FAIL' "$OUT/sweep_sf0.001.txt")"

echo "== 3/4 oracle value-hash sweep, all queries, sf0.01 (the driver gate) =="
python scripts/check_oracle.py "$SF_ROOT/sf0.01" > "$OUT/sweep_sf0.01.txt" 2>/dev/null || rc=1
echo "green: $(grep -c '^ok' "$OUT/sweep_sf0.01.txt")  failed: $(grep -c '^FAIL' "$OUT/sweep_sf0.01.txt")"

if [ -z "${GRAFT_REPRO_FAST:-}" ]; then
  echo "== 4/4 two-level scaling protocol (north rule: N vs 4N, fresh processes) =="
  python bench.py --scaling > "$OUT/scaling.json" 2>/dev/null || rc=1
  tail -1 "$OUT/scaling.json"
else
  echo "== 4/4 scaling SKIPPED (GRAFT_REPRO_FAST) =="
  rm -f "$OUT/scaling.json"   # never fold a STALE prior run into summary.json
fi

python - "$OUT" "$rc" <<'EOF'
import json, re, sys
out, rc = sys.argv[1], int(sys.argv[2])
def counts(p):
    try:
        txt = open(p).read()
    except OSError:
        return None
    return {"ok": len(re.findall(r"^ok ", txt, re.M)),
            "fail": len(re.findall(r"^FAIL", txt, re.M))}
summary = {
    "pytest_tail": open(f"{out}/pytest.txt").read().strip().splitlines()[-1],
    "sweep_sf0.001": counts(f"{out}/sweep_sf0.001.txt"),
    "sweep_sf0.01": counts(f"{out}/sweep_sf0.01.txt"),
    "green": rc == 0,
}
try:
    summary["scaling"] = json.loads(open(f"{out}/scaling.json").read().strip().splitlines()[-1])
except Exception:
    summary["scaling"] = None
json.dump(summary, open(f"{out}/summary.json", "w"), indent=1)
print(json.dumps(summary, indent=1))
EOF

exit $rc
