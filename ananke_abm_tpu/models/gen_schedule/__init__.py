"""gen_schedule: discrete daily-schedule VAE (+CRF) population synthesis."""
