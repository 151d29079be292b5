#!/usr/bin/env bash
# Run the full KITTI stereo sequence 07 (the reference's
# scripts/stereo_kitti_full.sh invokes ./stereo_kitti on seq 07).
# Usage: scripts/stereo_kitti_full.sh /path/to/KITTI/odometry/07
set -euo pipefail
SEQ=${1:?usage: $0 <kitti_sequence_dir>}
cd "$(dirname "$0")/.."
python examples/run_slam.py kitti "$SEQ"
