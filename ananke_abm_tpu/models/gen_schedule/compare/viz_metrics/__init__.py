"""Comparison visualizations: ToD curves, duration boxplots, Lorenz/Gini."""
