from photoverse_tpu.core.schedulers import (
    DDPMSchedule,
    DPMSolverMultistep,
    make_sd15_schedule,
)
