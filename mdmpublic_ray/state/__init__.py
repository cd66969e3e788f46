"""Lineage manifests, metrics sidecars, and the resumable checkpoint
runner (SURVEY.md §4.2 checkpoint/resume)."""
