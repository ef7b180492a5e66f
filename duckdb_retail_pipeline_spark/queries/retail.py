"""Retail pipeline parity queries — populated in pipeline stage."""
