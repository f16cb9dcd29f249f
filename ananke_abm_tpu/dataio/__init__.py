"""Host-side data contracts: rasterization, splits, CSV schemas, batching."""
