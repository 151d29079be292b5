"""I/O: datasets (KITTI/TUM + synthetic), trajectory writers, checkpoints."""
