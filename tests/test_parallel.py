"""Data-parallel execution tests on the 8-device virtual CPU mesh:
sharded batched inference and the mesh helpers."""

import jax
import jax.numpy as jnp
import numpy as np

from photoverse_tpu.core.schedulers import DPMSolverMultistep
from photoverse_tpu.engine.inference import run_inference
from photoverse_tpu.parallel.mesh import (
    batch_sharding,
    host_batch_slice,
    make_mesh,
    replicated,
    shard_batch,
)
from tests.tiny_models import LATENT, RES, tiny_batch, tiny_bundle


def test_mesh_helpers():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (8,)
    assert host_batch_slice(8) == slice(0, 8)


def test_sharded_batched_inference_matches_single_device():
    """BASELINE config 2 (batched CFG inference) sharded over the mesh must
    equal the unsharded result — GSPMD only changes placement."""
    modules, params = tiny_bundle()
    solver = DPMSolverMultistep.create(modules.schedule, 3)
    B = 8
    example = {k: jnp.asarray(v) for k, v in tiny_batch(B=B, seed=0).items()}
    uncond = jnp.zeros((B, 12), jnp.int32)

    def gen(params, ex, uncond, key):
        return run_inference(
            modules, params, solver, ex, key,
            guidance_scale=3.0, token_index=0, latent_size=LATENT,
            uncond_input_ids=uncond,
        )

    key = jax.random.PRNGKey(0)
    ref = gen(params, example, uncond, key)

    mesh = make_mesh(8)
    repl = replicated(mesh)
    bs = batch_sharding(mesh)
    params_r = jax.device_put(params, repl)
    ex_s = shard_batch(mesh, example)
    uncond_s = jax.device_put(uncond, bs)
    jgen = jax.jit(
        gen,
        in_shardings=(repl, {k: bs for k in example}, bs, repl),
        out_shardings=bs,
    )
    out = jgen(params_r, ex_s, uncond_s, key)
    assert out.shape == (B, RES, RES, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)
