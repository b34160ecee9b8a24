#!/usr/bin/env bash
# Extract frames from a video and run the COLMAP pipeline (port of the
# reference's demo/preprocess.sh). Requires ffmpeg + colmap.
set -euo pipefail
VIDEO=${1:?usage: preprocess.sh <video> <out_dir> [fps]}
OUT=${2:?usage: preprocess.sh <video> <out_dir> [fps]}
FPS=${3:-2}

mkdir -p "$OUT/images"
ffmpeg -i "$VIDEO" -vf "fps=$FPS" -q:v 2 "$OUT/images/%06d.jpg"
"$(dirname "$0")/run_colmap.sh" "$OUT"
