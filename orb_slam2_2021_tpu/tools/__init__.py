"""Offline tooling: saved-map post-processing and camera calibration."""
