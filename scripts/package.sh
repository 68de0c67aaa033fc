#!/usr/bin/env bash
# Build the --py-files bundle for spark-submit (see jobs/extract_job.py).
set -euo pipefail
cd "$(dirname "$0")/.."
out="${1:-pkg.zip}"
rm -f "$out"
zip -qr "$out" action_pdf_accessibility_paddle_docker_spark -x '*__pycache__*'
echo "built $out"
