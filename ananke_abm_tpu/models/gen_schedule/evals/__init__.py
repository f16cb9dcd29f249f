"""Core evaluation metrics + report for generated populations."""
