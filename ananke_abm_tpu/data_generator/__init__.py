"""Synthetic data generation: mock worlds, personas, populations."""
