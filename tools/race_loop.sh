#!/usr/bin/env bash
# Deflake evidence for the exactly-once race specs (r12 verdict item 4):
# run the forced-schedule concurrency tests N consecutive times and count
# clean passes. The schedules themselves are DETERMINISTIC (latch-forced
# split-win, mid-commit reader, crash injection); this loop is the
# regression net proving no timing-dependent path crept back in.
#
# Usage: tools/race_loop.sh [iterations]   (default 20)
# r12 result: 20/20 green (CorpusProfileSpec race subset), plus 5/5 over
# the full PostingsIndex/IvfAdmission/CorpusProfile concurrency suites.
# r15 result: 8/8 green over the four suites with the revision-overlay
# upsert paths (UpsertSpec latch/crash windows on the overlay members).
# r16: the perceptual/frame index suites join the loop — they carry the
# racing-admitters case, the crash-window gates, and the keeper/supersede
# tombstone folds (r16 result recorded in COVERAGE.md).
# r17: SignatureIndexSpec joins — the text family became a manifest-
# governed overlay (bucketed projection tiers + rm member), so its
# supersede/fold/replay paths now exercise the OverlayLock discipline.
set -euo pipefail
cd "$(dirname "$0")/.."
n="${1:-20}"
cmds=()
for _ in $(seq 1 "$n"); do
  cmds+=("testOnly graft.CorpusProfileSpec graft.IvfAdmissionSpec graft.PostingsIndexSpec graft.UpsertSpec graft.PerceptualIndexSpec graft.FrameIndexSpec graft.SignatureIndexSpec")
done
log=$(mktemp /tmp/graft_race_loop.XXXXXX.log)
sbt -batch "${cmds[@]}" >"$log" 2>&1 || true
passes=$(grep -c "All tests passed" "$log" || true)
fails=$(grep -cE "\*\*\* FAILED" "$log" || true)
echo "race loop: $passes/$n clean iterations, $fails test failures (log: $log)"
[ "$passes" -eq "$n" ] && [ "$fails" -eq 0 ]
