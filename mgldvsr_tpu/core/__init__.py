from mgldvsr_tpu.core.schedules import (
    DiffusionSchedule,
    make_beta_schedule,
    space_timesteps,
    respace_schedule,
)
