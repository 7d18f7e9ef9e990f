#!/usr/bin/env bash
# Compile gate: run before every commit (and before the end-of-round
# snapshot). A commit that does not compile zeroes the whole round's
# correctness battery — see VERDICT round 3.
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch compile Test/compile
