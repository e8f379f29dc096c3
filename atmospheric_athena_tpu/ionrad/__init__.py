"""Ionizing radiative transfer (reference: src/ionradiation/)."""
