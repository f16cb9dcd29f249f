"""Pure loss functions shared across model families."""
from ananke_abm_tpu.losses.schedule import (
    cross_entropy_masked,
    kl_gaussian,
    minutes_share_loss,
    presence_rate_loss,
    start_end_home_loss,
    time_of_day_marginal_loss,
    time_total_variation,
)
from ananke_abm_tpu.losses.jsd import jsd

__all__ = [
    "kl_gaussian",
    "time_total_variation",
    "start_end_home_loss",
    "time_of_day_marginal_loss",
    "presence_rate_loss",
    "minutes_share_loss",
    "cross_entropy_masked",
    "jsd",
]
