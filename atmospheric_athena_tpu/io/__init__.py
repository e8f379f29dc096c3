"""Outputs, dumps, restart (reference: src/output.c and friends)."""
