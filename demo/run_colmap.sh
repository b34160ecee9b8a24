#!/usr/bin/env bash
# Full COLMAP CLI pipeline for a raw image folder (port of the reference's
# demo/run_colmap.sh workflow: feature extraction -> sequential matching ->
# mapping -> bundle adjustment -> undistortion). Requires the `colmap`
# binary on the host.
set -euo pipefail
DATA_DIR=${1:?usage: run_colmap.sh <data_dir with images/>}

colmap feature_extractor \
    --database_path "$DATA_DIR/database.db" \
    --image_path "$DATA_DIR/images" \
    --ImageReader.camera_model PINHOLE \
    --ImageReader.single_camera 1

colmap sequential_matcher --database_path "$DATA_DIR/database.db"

mkdir -p "$DATA_DIR/sparse"
colmap mapper \
    --database_path "$DATA_DIR/database.db" \
    --image_path "$DATA_DIR/images" \
    --output_path "$DATA_DIR/sparse"

colmap bundle_adjuster \
    --input_path "$DATA_DIR/sparse/0" \
    --output_path "$DATA_DIR/sparse/0"

colmap image_undistorter \
    --image_path "$DATA_DIR/images" \
    --input_path "$DATA_DIR/sparse/0" \
    --output_path "$DATA_DIR/undistorted" \
    --output_type COLMAP
echo "COLMAP reconstruction at $DATA_DIR/sparse/0"
