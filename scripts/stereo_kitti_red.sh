#!/usr/bin/env bash
# Run a reduced KITTI stereo sequence: first 500 frames (the reference's
# scripts/stereo_kitti_red.sh runs seq 03 with `reduced`,
# arducam_images.cpp:64-67).
# Usage: scripts/stereo_kitti_red.sh /path/to/KITTI/odometry/03
set -euo pipefail
SEQ=${1:?usage: $0 <kitti_sequence_dir>}
cd "$(dirname "$0")/.."
python examples/run_slam.py kitti "$SEQ" --reduced
