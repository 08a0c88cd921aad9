#!/usr/bin/env bash
# The round's single test entry point (r16 VERDICT #6): the scalatest
# suite AND the end-to-end importer smoke in one command that fails
# red on either. tools/smoke_importer.sh runs its own `sbt -batch
# package` — sequencing it AFTER the test run (instead of shelling it
# from inside a suite) avoids nested sbt servers fighting over the
# project lock, and keeps `sbt test` itself fast for inner-loop use.
#
# Usage: tools/ci.sh            (from anywhere; cd's to the repo root)
set -euo pipefail
cd "$(cd "$(dirname "$0")/.." && pwd)"

echo "[ci] sbt test"
sbt -batch test

echo "[ci] importer smoke"
tools/smoke_importer.sh

echo "[ci] PASS"
