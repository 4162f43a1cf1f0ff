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
from uurg_tpu.diffusion.timestep_sampler import (
    LossSecondMomentState,
    init_loss_second_moment,
    sampler_weights,
    sample_timesteps,
    update_with_all_losses,
    update_with_local_losses,
    uniform_timesteps,
)
