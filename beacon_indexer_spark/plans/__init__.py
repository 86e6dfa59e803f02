"""Logical-plan layer: the engine's declared query surface and the raw →
structured transform pipelines."""
