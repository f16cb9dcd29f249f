"""Trajectory-figure utilities: buffer grid + stacked/zoomed figures."""
