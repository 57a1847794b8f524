"""Placeholder — dia model lands in a later milestone of this build."""
