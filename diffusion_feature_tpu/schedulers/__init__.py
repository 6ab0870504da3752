from .diffusion import (
    SchedulerConfig,
    SchedulerState,
    DiffusionScheduler,
    DDIMScheduler,
    DDPMScheduler,
    PNDMScheduler,
    EulerDiscreteScheduler,
    DPMSolverMultistepScheduler,
    make_scheduler,
)
from .flow_match import FlowMatchEulerDiscreteScheduler, FlowMatchConfig, calculate_shift
