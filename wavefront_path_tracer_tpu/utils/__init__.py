"""Configuration, imaging, progress, and profiling utilities."""
