"""Population visualization (matplotlib, Agg backend)."""
