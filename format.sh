#!/usr/bin/env bash
# Lint gate (≙ reference format.sh). Runs the stdlib checker over the
# package, tests, and scripts; exits nonzero on findings.
set -e
cd "$(dirname "$0")"
python scripts/lint.py "$@"
