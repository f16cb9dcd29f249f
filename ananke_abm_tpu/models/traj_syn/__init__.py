"""traj_syn (TrajEmbed): purpose-catalog-conditioned trajectory VAE with
linear-CRF or semi-CRF structured decoding.

This family is referenced-but-missing in the reference snapshot; its
behavior contract is pinned by its callers (SURVEY.md §2.8):
cli/run_models/traj_embed.py (train, crf_mode in {linear, semi}),
gen_n_val_traj.py (generate + validate with semi_Dmax_minutes ~ 300),
and the traj_embed shell scripts (5-min steps over an 1800-min allocation
horizon, vae_only variant, ckpt_best checkpoint).
"""
