#!/usr/bin/env python
"""Record DPM-Solver++(2M) golden trajectories from diffusers.

Run this on a NETWORKED machine with `diffusers` installed, then commit the
output to tests/fixtures/dpm_goldens_diffusers.json. The test suite
(tests/test_scheduler_goldens.py) automatically asserts my static-coefficient
solver (photoverse_tpu.core.schedulers.DPMSolverMultistep) against this
fixture when it exists — closing the loop that the in-repo golden test is
otherwise self-referential (this environment has no network and no
diffusers; reference sampler instantiation: /root/reference/models/
infer.py:39-40).

Protocol (must match tests/test_scheduler_goldens.py exactly):
  - SD-1.5 scheduler config: 1000 train steps, beta 0.00085..0.012
    scaled_linear, epsilon prediction, DPM-Solver++ order 2 midpoint,
    lower_order_final, timestep_spacing="linspace", final_sigmas_type="zero"
  - analytic model: eps(x, t) = 0.1 * x  (linear, deterministic)
  - x0 ~ numpy RandomState(1234).randn(2, 4, 4, 4), float32
  - record x after the full trajectory for num_inference_steps in
    {5, 10, 25, 50}
"""

import json
import os
import sys

import numpy as np

STEPS = (5, 10, 25, 50)
OUT = os.path.join(
    os.path.dirname(__file__), "..", "tests", "fixtures",
    "dpm_goldens_diffusers.json",
)


def main():
    import torch
    from diffusers import DPMSolverMultistepScheduler

    record = {"model": "eps = 0.1 * x", "seed": 1234, "shape": [2, 4, 4, 4],
              "runs": {}}
    for n in STEPS:
        sched = DPMSolverMultistepScheduler(
            num_train_timesteps=1000,
            beta_start=0.00085,
            beta_end=0.012,
            beta_schedule="scaled_linear",
            algorithm_type="dpmsolver++",
            solver_order=2,
            solver_type="midpoint",
            lower_order_final=True,
            timestep_spacing="linspace",
            final_sigmas_type="zero",
            prediction_type="epsilon",
        )
        sched.set_timesteps(n)
        x = torch.from_numpy(
            np.random.RandomState(1234).randn(2, 4, 4, 4).astype(np.float32)
        )
        for t in sched.timesteps:
            eps = 0.1 * x
            x = sched.step(eps, t, x).prev_sample
        record["runs"][str(n)] = {
            "timesteps": [int(t) for t in sched.timesteps],
            "x_final": x.numpy().astype(np.float64).ravel().tolist(),
        }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(record, f)
    print(f"wrote {OUT}")

    # DDIM goldens (same protocol; SD-1.5 DDIM config: leading spacing,
    # steps_offset 1, set_alpha_to_one, eta=0, no clipping) — consumed by
    # tests/test_round3.py::test_ddim_diffusers_goldens
    from diffusers import DDIMScheduler

    ddim_record = {"model": "eps = 0.1 * x", "seed": 1234,
                   "shape": [2, 4, 4, 4], "runs": {}}
    for n in STEPS:
        sched = DDIMScheduler(
            num_train_timesteps=1000,
            beta_start=0.00085,
            beta_end=0.012,
            beta_schedule="scaled_linear",
            clip_sample=False,
            set_alpha_to_one=True,
            steps_offset=1,
            prediction_type="epsilon",
            timestep_spacing="leading",
        )
        sched.set_timesteps(n)
        x = torch.from_numpy(
            np.random.RandomState(1234).randn(2, 4, 4, 4).astype(np.float32)
        )
        for t in sched.timesteps:
            eps = 0.1 * x
            x = sched.step(eps, t, x, eta=0.0).prev_sample
        ddim_record["runs"][str(n)] = {
            "timesteps": [int(t) for t in sched.timesteps],
            "x_final": x.numpy().astype(np.float64).ravel().tolist(),
        }
    ddim_out = os.path.join(os.path.dirname(OUT), "ddim_goldens_diffusers.json")
    with open(ddim_out, "w") as f:
        json.dump(ddim_record, f)
    print(f"wrote {ddim_out}")


if __name__ == "__main__":
    sys.exit(main())
