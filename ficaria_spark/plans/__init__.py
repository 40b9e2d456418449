"""Execution-plan utilities: lineage manifests, checkpoint resume, metrics."""
