"""gen_schedule pipelines: train / sample / eval / viz / comparisons."""
