#!/usr/bin/env bash
# Download the real benchmark sequences named in BASELINE.md.
#
# This build sandbox has NO network egress, so this script cannot run here —
# it documents the exact acquisition path for any networked environment.
# After downloading, run the same CLI commands recorded in RESULTS.md
# against these roots instead of the datasets/*_proxy directories; nothing
# else in the pipeline changes.
set -euo pipefail
ROOT="${1:-datasets/real}"
mkdir -p "$ROOT"

echo "== TUM RGB-D fr1_xyz + fr1_desk =="
for seq in rgbd_dataset_freiburg1_xyz rgbd_dataset_freiburg1_desk; do
  curl -L -o "$ROOT/$seq.tgz" \
    "https://cvg.cit.tum.de/rgbd/dataset/freiburg1/$seq.tgz"
  tar -xzf "$ROOT/$seq.tgz" -C "$ROOT"
done

echo "== EuRoC MH_01_easy =="
curl -L -o "$ROOT/MH_01_easy.zip" \
  "http://robotics.ethz.ch/~asl-datasets/ijrr_euroc_mav_dataset/machine_hall/MH_01_easy/MH_01_easy.zip"
mkdir -p "$ROOT/MH_01_easy" && unzip -q "$ROOT/MH_01_easy.zip" -d "$ROOT/MH_01_easy"

echo "== KITTI odometry grayscale (22 GB; sequence 00 needed) =="
echo "KITTI requires registration: https://www.cvlibs.net/datasets/kitti/eval_odometry.php"
echo "Download data_odometry_gray.zip + data_odometry_poses.zip and unzip into $ROOT/kitti"

echo "done. Run e.g.:"
echo "  python -m coslam_tpu.cli mono --dataset tum --root $ROOT/rgbd_dataset_freiburg1_xyz --out traj.txt"
echo "  python -m coslam_tpu.cli rgbd --dataset tum --root $ROOT/rgbd_dataset_freiburg1_desk"
echo "  python -m coslam_tpu.cli mono --dataset euroc --root $ROOT/MH_01_easy"
echo "  python -m coslam_tpu.cli stereo --dataset kitti --root $ROOT/kitti --seq 00"
