"""Utilities: dtype policy, metrics."""
