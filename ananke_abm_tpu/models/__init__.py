"""Model families: gen_schedule, mode_sep, latent_ode, traj_syn, gnn_embed."""
