"""Placeholder — queries land incrementally."""
