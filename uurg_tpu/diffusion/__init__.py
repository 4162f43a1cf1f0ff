from uurg_tpu.diffusion.schedules import (
    get_beta_schedule,
    DiffusionSchedule,
    make_schedule,
)
from uurg_tpu.diffusion.losses import (
    noise_estimation_loss,
    adaptive_weights,
    adaptive_loss,
    cosine_alpha_decay,
)
from uurg_tpu.diffusion import sampling
