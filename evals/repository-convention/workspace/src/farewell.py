"""Farewell strings."""

FAREWELL = "goodbye"
