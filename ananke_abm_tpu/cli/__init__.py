"""Console entry points: ``ananke`` and ``rgen_schedule``."""
