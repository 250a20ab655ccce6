from photoverse_tpu.core.schedulers import (
    DDPMSchedule,
    DPMSolverMultistep,
    SCHEDULER_NAMES,
    make_sd15_schedule,
    make_solver,
)
