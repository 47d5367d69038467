"""Utilities: config IO, progress, profiling, visualization."""
