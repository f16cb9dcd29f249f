"""latent_ode: generative latent SDE/ODE trajectory family
(location + purpose + mode)."""
