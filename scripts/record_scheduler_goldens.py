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

    # DPM-Solver++(2M) on the Karras sigma grid (use_karras_sigmas=True) —
    # consumed by tests/test_scheduler_goldens.py::test_dpm_karras_diffusers_goldens
    karras_record = {"model": "eps = 0.1 * x", "seed": 1234,
                     "shape": [2, 4, 4, 4], "runs": {}}
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
            use_karras_sigmas=True,
        )
        sched.set_timesteps(n)
        x = torch.from_numpy(
            np.random.RandomState(1234).randn(2, 4, 4, 4).astype(np.float32)
        )
        for t in sched.timesteps:
            eps = 0.1 * x
            x = sched.step(eps, t, x).prev_sample
        karras_record["runs"][str(n)] = {
            "timesteps": [int(t) for t in sched.timesteps],
            "x_final": x.numpy().astype(np.float64).ravel().tolist(),
        }
    karras_out = os.path.join(
        os.path.dirname(OUT), "dpm_karras_goldens_diffusers.json"
    )
    with open(karras_out, "w") as f:
        json.dump(karras_record, f)
    print(f"wrote {karras_out}")

    # Euler / Euler-Karras (EulerDiscreteScheduler). Protocol: the model
    # sees the SCALED input (scale_model_input) — which is exactly the
    # VP-space latent my static-affine formulation carries — so
    # eps = 0.1 * scaled_input keeps both sides consistent. x starts at
    # z * init_noise_sigma in diffusers' VE space; the final sample (sigma
    # 0) is directly comparable. Consumed by
    # tests/test_scheduler_goldens.py::test_euler_diffusers_goldens.
    from diffusers import EulerDiscreteScheduler

    for karras, fname in ((False, "euler_goldens_diffusers.json"),
                          (True, "euler_karras_goldens_diffusers.json")):
        rec = {"model": "eps = 0.1 * scale_model_input(x)", "seed": 1234,
               "shape": [2, 4, 4, 4], "runs": {}}
        for n in STEPS:
            sched = EulerDiscreteScheduler(
                num_train_timesteps=1000,
                beta_start=0.00085,
                beta_end=0.012,
                beta_schedule="scaled_linear",
                prediction_type="epsilon",
                timestep_spacing="linspace",
                use_karras_sigmas=karras,
            )
            sched.set_timesteps(n)
            x = torch.from_numpy(
                np.random.RandomState(1234).randn(2, 4, 4, 4).astype(np.float32)
            ) * sched.init_noise_sigma
            for t in sched.timesteps:
                xin = sched.scale_model_input(x, t)
                eps = 0.1 * xin
                x = sched.step(eps, t, x).prev_sample
            rec["runs"][str(n)] = {
                "timesteps": [float(t) for t in sched.timesteps],
                "init_noise_sigma": float(sched.init_noise_sigma),
                "sigmas": [float(s) for s in sched.sigmas],
                "x_final": x.numpy().astype(np.float64).ravel().tolist(),
            }
        out = os.path.join(os.path.dirname(OUT), fname)
        with open(out, "w") as f:
            json.dump(rec, f)
        print(f"wrote {out}")

    # Euler-Ancestral. The scheduler draws its per-step noise internally
    # from `generator`; a twin generator seeded identically reproduces the
    # exact draws (one randn per step, unconditional in diffusers' step()),
    # which are recorded so the offline consumer can replay the trajectory
    # without torch. Consumed by test_euler_a_diffusers_goldens.
    from diffusers import EulerAncestralDiscreteScheduler

    anc_record = {"model": "eps = 0.1 * scale_model_input(x)", "seed": 1234,
                  "noise_seed": 4321, "shape": [2, 4, 4, 4], "runs": {}}
    for n in STEPS:
        sched = EulerAncestralDiscreteScheduler(
            num_train_timesteps=1000,
            beta_start=0.00085,
            beta_end=0.012,
            beta_schedule="scaled_linear",
            prediction_type="epsilon",
            timestep_spacing="linspace",
        )
        sched.set_timesteps(n)
        g = torch.Generator().manual_seed(4321)
        g_twin = torch.Generator().manual_seed(4321)
        x = torch.from_numpy(
            np.random.RandomState(1234).randn(2, 4, 4, 4).astype(np.float32)
        ) * sched.init_noise_sigma
        noises = []
        for t in sched.timesteps:
            xin = sched.scale_model_input(x, t)
            eps = 0.1 * xin
            x = sched.step(eps, t, x, generator=g).prev_sample
            noises.append(
                torch.randn(x.shape, generator=g_twin, dtype=x.dtype)
                .numpy().astype(np.float64).ravel().tolist()
            )
        anc_record["runs"][str(n)] = {
            "timesteps": [float(t) for t in sched.timesteps],
            "init_noise_sigma": float(sched.init_noise_sigma),
            "noises": noises,
            "x_final": x.numpy().astype(np.float64).ravel().tolist(),
        }
    anc_out = os.path.join(
        os.path.dirname(OUT), "euler_a_goldens_diffusers.json"
    )
    with open(anc_out, "w") as f:
        json.dump(anc_record, f)
    print(f"wrote {anc_out}")

    # DPM++ 2M SDE (algorithm_type "sde-dpmsolver++", midpoint) — plain +
    # Karras grids. The scheduler draws its per-step noise internally from
    # `generator`; a twin generator captures the identical draws (one
    # randn per step) so the offline consumer can replay without torch.
    # Consumed by tests/test_scheduler_goldens.py::test_dpm_sde_diffusers_goldens
    for karras, fname in ((False, "dpm_sde_goldens_diffusers.json"),
                          (True, "dpm_sde_karras_goldens_diffusers.json")):
        rec = {"model": "eps = 0.1 * x", "seed": 1234, "noise_seed": 4321,
               "shape": [2, 4, 4, 4], "runs": {}}
        for n in STEPS:
            sched = DPMSolverMultistepScheduler(
                num_train_timesteps=1000,
                beta_start=0.00085,
                beta_end=0.012,
                beta_schedule="scaled_linear",
                algorithm_type="sde-dpmsolver++",
                solver_order=2,
                solver_type="midpoint",
                lower_order_final=True,
                timestep_spacing="linspace",
                final_sigmas_type="zero",
                prediction_type="epsilon",
                use_karras_sigmas=karras,
            )
            sched.set_timesteps(n)
            g = torch.Generator().manual_seed(4321)
            g_twin = torch.Generator().manual_seed(4321)
            x = torch.from_numpy(
                np.random.RandomState(1234).randn(2, 4, 4, 4).astype(np.float32)
            )
            noises = []
            for t in sched.timesteps:
                eps = 0.1 * x
                x = sched.step(eps, t, x, generator=g).prev_sample
                noises.append(
                    torch.randn(x.shape, generator=g_twin, dtype=x.dtype)
                    .numpy().astype(np.float64).ravel().tolist()
                )
            rec["runs"][str(n)] = {
                "timesteps": [int(t) for t in sched.timesteps],
                "noises": noises,
                "x_final": x.numpy().astype(np.float64).ravel().tolist(),
            }
        out = os.path.join(os.path.dirname(OUT), fname)
        with open(out, "w") as f:
            json.dump(rec, f)
        print(f"wrote {out}")

    # UniPC (bh2, order 2, corrector on) — plain + Karras grids; consumed
    # by tests/test_scheduler_goldens.py::test_unipc_diffusers_goldens
    from diffusers import UniPCMultistepScheduler

    for karras, fname in ((False, "unipc_goldens_diffusers.json"),
                          (True, "unipc_karras_goldens_diffusers.json")):
        rec = {"model": "eps = 0.1 * x", "seed": 1234,
               "shape": [2, 4, 4, 4], "runs": {}}
        for n in STEPS:
            sched = UniPCMultistepScheduler(
                num_train_timesteps=1000,
                beta_start=0.00085,
                beta_end=0.012,
                beta_schedule="scaled_linear",
                prediction_type="epsilon",
                solver_order=2,
                solver_type="bh2",
                predict_x0=True,
                lower_order_final=True,
                timestep_spacing="linspace",
                final_sigmas_type="zero",
                use_karras_sigmas=karras,
            )
            sched.set_timesteps(n)
            x = torch.from_numpy(
                np.random.RandomState(1234).randn(2, 4, 4, 4).astype(np.float32)
            )
            for t in sched.timesteps:
                eps = 0.1 * x
                x = sched.step(eps, t, x).prev_sample
            rec["runs"][str(n)] = {
                "timesteps": [int(t) for t in sched.timesteps],
                "x_final": x.numpy().astype(np.float64).ravel().tolist(),
            }
        out = os.path.join(os.path.dirname(OUT), fname)
        with open(out, "w") as f:
            json.dump(rec, f)
        print(f"wrote {out}")

    # Heun (HeunDiscreteScheduler) — plain + Karras grids. diffusers walks
    # 2N-1 interleaved timesteps (one step() call per model eval), which is
    # exactly our 2N-1 static-affine substeps, so eps =
    # 0.1 * scale_model_input(x) at every call keeps both sides consistent.
    # Consumed by tests/test_scheduler_goldens.py::test_heun_diffusers_goldens
    from diffusers import HeunDiscreteScheduler

    for karras, fname in ((False, "heun_goldens_diffusers.json"),
                          (True, "heun_karras_goldens_diffusers.json")):
        rec = {"model": "eps = 0.1 * scale_model_input(x)", "seed": 1234,
               "shape": [2, 4, 4, 4], "runs": {}}
        for n in STEPS:
            sched = HeunDiscreteScheduler(
                num_train_timesteps=1000,
                beta_start=0.00085,
                beta_end=0.012,
                beta_schedule="scaled_linear",
                prediction_type="epsilon",
                timestep_spacing="linspace",
                use_karras_sigmas=karras,
            )
            sched.set_timesteps(n)
            x = torch.from_numpy(
                np.random.RandomState(1234).randn(2, 4, 4, 4).astype(np.float32)
            ) * sched.init_noise_sigma
            for t in sched.timesteps:
                xin = sched.scale_model_input(x, t)
                eps = 0.1 * xin
                x = sched.step(eps, t, x).prev_sample
            assert torch.isfinite(x).all()
            rec["runs"][str(n)] = {
                "timesteps": [float(t) for t in sched.timesteps],
                "init_noise_sigma": float(sched.init_noise_sigma),
                "x_final": x.numpy().astype(np.float64).ravel().tolist(),
            }
        out = os.path.join(os.path.dirname(OUT), fname)
        with open(out, "w") as f:
            json.dump(rec, f)
        print(f"wrote {out}")

    # LMS (LMSDiscreteScheduler, order 4) — plain + Karras grids; same
    # scale_model_input protocol as the Euler family. Consumed by
    # tests/test_scheduler_goldens.py::test_lms_diffusers_goldens
    from diffusers import LMSDiscreteScheduler

    for karras, fname in ((False, "lms_goldens_diffusers.json"),
                          (True, "lms_karras_goldens_diffusers.json")):
        rec = {"model": "eps = 0.1 * scale_model_input(x)", "seed": 1234,
               "shape": [2, 4, 4, 4], "runs": {}}
        for n in STEPS:
            sched = LMSDiscreteScheduler(
                num_train_timesteps=1000,
                beta_start=0.00085,
                beta_end=0.012,
                beta_schedule="scaled_linear",
                prediction_type="epsilon",
                timestep_spacing="linspace",
                use_karras_sigmas=karras,
            )
            sched.set_timesteps(n)
            x = torch.from_numpy(
                np.random.RandomState(1234).randn(2, 4, 4, 4).astype(np.float32)
            ) * sched.init_noise_sigma
            for t in sched.timesteps:
                xin = sched.scale_model_input(x, t)
                eps = 0.1 * xin
                x = sched.step(eps, t, x).prev_sample
            assert torch.isfinite(x).all()
            rec["runs"][str(n)] = {
                "timesteps": [float(t) for t in sched.timesteps],
                "init_noise_sigma": float(sched.init_noise_sigma),
                "x_final": x.numpy().astype(np.float64).ravel().tolist(),
            }
        out = os.path.join(os.path.dirname(OUT), fname)
        with open(out, "w") as f:
            json.dump(rec, f)
        print(f"wrote {out}")

    # PNDM/PLMS (PNDMScheduler, skip_prk_steps=True — the SD-1.5 original
    # default config). init_noise_sigma is 1 and scale_model_input the
    # identity, so the protocol is plain eps = 0.1 * x. Consumed by
    # tests/test_scheduler_goldens.py::test_pndm_diffusers_goldens
    from diffusers import PNDMScheduler

    rec = {"model": "eps = 0.1 * x", "seed": 1234,
           "shape": [2, 4, 4, 4], "runs": {}}
    for n in STEPS:
        sched = PNDMScheduler(
            num_train_timesteps=1000,
            beta_start=0.00085,
            beta_end=0.012,
            beta_schedule="scaled_linear",
            prediction_type="epsilon",
            skip_prk_steps=True,
            set_alpha_to_one=False,
            steps_offset=1,
            timestep_spacing="leading",
        )
        sched.set_timesteps(n)
        x = torch.from_numpy(
            np.random.RandomState(1234).randn(2, 4, 4, 4).astype(np.float32)
        )
        for t in sched.timesteps:
            eps = 0.1 * x
            x = sched.step(eps, t, x).prev_sample
        rec["runs"][str(n)] = {
            "timesteps": [int(t) for t in sched.timesteps],
            "x_final": x.numpy().astype(np.float64).ravel().tolist(),
        }
    out = os.path.join(os.path.dirname(OUT), "pndm_goldens_diffusers.json")
    with open(out, "w") as f:
        json.dump(rec, f)
    print(f"wrote {out}")

    # DPM++ 2S ancestral — k-diffusion is the canonical implementation
    # (diffusers has no ancestral singlestep), so this stanza is OPTIONAL:
    # it records only when `k_diffusion` is importable. Protocol: the
    # denoiser model is denoised = x - 0.1*sigma*x/sqrt(sigma^2+1), i.e.
    # eps = 0.1 * scaled_input like every other golden here; per-step
    # noise is captured via the noise_sampler hook and interleaved with
    # zero placeholders at the A substeps so the offline consumer
    # (test_dpm_2s_a_kdiffusion_goldens) can replay substep-by-substep.
    try:
        from k_diffusion.sampling import (
            get_sigmas_karras, sample_dpmpp_2s_ancestral,
        )
    except ImportError:
        print("k_diffusion not installed — skipping dpm_2s_a goldens")
    else:
        from photoverse_tpu.core.schedulers import (
            DDPMSchedule, DPMSolverMultistep,
        )

        for karras, fname in (
            (False, "dpm_2s_a_goldens_kdiffusion.json"),
            (True, "dpm_2s_a_karras_goldens_kdiffusion.json"),
        ):
            rec = {"model": "denoised = x - 0.1*sigma*x/sqrt(sigma^2+1)",
                   "seed": 1234, "noise_seed": 4321,
                   "shape": [2, 4, 4, 4], "runs": {}}
            for n in STEPS:
                # identical sigma grid to create_dpm_2s_ancestral
                solver = DPMSolverMultistep.create_dpm_2s_ancestral(
                    DDPMSchedule.create(), n, use_karras_sigmas=karras
                )
                grid = np.concatenate(
                    [np.asarray(solver.sigmas)[0::2], [0.0]]
                )
                sigmas_t = torch.from_numpy(grid.astype(np.float64))

                def model(x, sigma, **kw):
                    return x - 0.1 * sigma * x / (sigma**2 + 1.0) ** 0.5

                g = torch.Generator().manual_seed(4321)
                draws = []

                def noise_sampler(sigma, sigma_next):
                    z = torch.randn(2, 4, 4, 4, generator=g,
                                    dtype=torch.float64)
                    draws.append(z.numpy().ravel().tolist())
                    return z

                x = torch.from_numpy(
                    np.random.RandomState(1234)
                    .randn(2, 4, 4, 4).astype(np.float64)
                ) * grid[0]
                out_x = sample_dpmpp_2s_ancestral(
                    model, x, sigmas_t, eta=1.0,
                    noise_sampler=noise_sampler, disable=True,
                )
                zeros = [0.0] * (2 * 4 * 4 * 4)
                noises = []
                for i in range(n - 1):
                    noises.extend([zeros, draws[i]])
                noises.append(zeros)  # final first-order substep
                rec["runs"][str(n)] = {
                    "noises": noises,
                    "x_final": out_x.numpy().astype(np.float64)
                    .ravel().tolist(),
                }
            out = os.path.join(os.path.dirname(OUT), fname)
            with open(out, "w") as f:
                json.dump(rec, f)
            print(f"wrote {out}")


if __name__ == "__main__":
    sys.exit(main())
