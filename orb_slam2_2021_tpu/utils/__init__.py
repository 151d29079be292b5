"""Utility modules (speed-of-light analysis, etc.)."""
