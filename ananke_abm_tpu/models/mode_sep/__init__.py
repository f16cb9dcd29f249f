"""mode_sep: deterministic 2nd-order ODE location-only trajectory model."""
