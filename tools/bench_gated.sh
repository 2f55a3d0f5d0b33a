#!/bin/bash
# Steal-gated bench capture — the committed-reference protocol
# (BASELINE.md r14/r15 sections): hypervisor steal poisons totals
# (r13 forensics: bursty 1.5–6% steal inflated runs up to 2×), so a
# committed bench reference must carry a bracketed steal <0.5%.
#
#   1. probe: wait for a 30 s window with /proc/stat col-8 steal <0.5%
#   2. run python bench.py (which self-brackets and records
#      host_steal_pct in its JSON)
#   3. accept only if rc=0 AND the run's own bracketed steal <0.5%;
#      otherwise git-restore bench_results/ and retry (max 6 attempts)
#
# Never hand-adjust a contaminated number — reject and retry.
cd "$(dirname "$0")/.." || exit 1
for attempt in 1 2 3 4 5 6; do
  for probe in $(seq 1 40); do
    read -r s0 t0 < <(awk '/^cpu /{print $9, $2+$3+$4+$5+$6+$7+$8+$9}' /proc/stat)
    sleep 30
    read -r s1 t1 < <(awk '/^cpu /{print $9, $2+$3+$4+$5+$6+$7+$8+$9}' /proc/stat)
    pct=$(awk -v a="$s0" -v b="$s1" -v c="$t0" -v d="$t1" 'BEGIN{print 100*(b-a)/(d-c)}')
    ok=$(awk -v p="$pct" 'BEGIN{print (p<0.5)?1:0}')
    echo "probe $probe steal=$pct ok=$ok"
    [ "$ok" = "1" ] && break
  done
  echo "=== attempt $attempt starting $(date +%T)"
  python bench.py > "/tmp/bench_attempt_$attempt.json" 2>"/tmp/bench_attempt_$attempt.err"
  rc=$?
  steal=$(python -c "import json;print(json.load(open('/tmp/bench_attempt_$attempt.json'))['host_steal_pct'])" 2>/dev/null || echo 99)
  echo "attempt $attempt rc=$rc steal=$steal"
  good=$(awk -v p="$steal" 'BEGIN{print (p<0.5)?1:0}')
  if [ "$rc" = "0" ] && [ "$good" = "1" ]; then
    echo "CLEAN RUN CAPTURED (attempt $attempt) — bench_results/ holds it"
    exit 0
  fi
  git restore bench_results/ 2>/dev/null
done
echo "NO CLEAN WINDOW FOUND"
exit 1
