"""Multi-model comparison harness (metric tables + overview plots)."""
