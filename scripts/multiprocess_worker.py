#!/usr/bin/env python
"""Worker for the true multi-process (multi-controller) integration test.

Launched N times (once per process) by tests/test_multiprocess.py or by
hand:

    JAX_PLATFORMS=cpu python scripts/multiprocess_worker.py \
        <process_id> <num_processes> <coordinator_port> <out_dir>

Each process gets 2 virtual CPU devices, joins a `jax.distributed` cluster
(the multi-controller contract of a real TPU pod), and drives the code
paths that single-process tests can only simulate
(VERDICT.md round-2 weak #6):

  1. `host_batch_slice` + `shard_batch`'s
     `make_array_from_process_local_data` branch assembling a global batch
     from per-process rows (parallel/mesh.py:49-101);
  2. a jitted computation with the batch sharded over the mesh and a
     replicated output — GSPMD emits the CROSS-PROCESS reduction;
  3. ZeRO-1: optimizer-style state sharded over the data axis, updated
     under jit, then gathered with the jit-identity used before checkpoint
     saves (cli/train.py:391-403) — the collective every process must enter
     (process-0-only would deadlock, the round-2 bug class);
  4. process 0 writes a checkpoint from the gathered state; all processes
     barrier; every process reloads and verifies it.

An optional 5th argv selects an FSDP phase (VERDICT round-3 #7):

  fsdp1: FSDP-shard a trainable tree over the data axis
         (parallel/fsdp.fsdp_shardings — ZeRO-3 semantics: XLA gathers
         weights on use, reduce-scatters the update), run 2 jitted update
         steps, gather on ALL processes, process-0 saves the checkpoint.
  fsdp2: a SEPARATE cluster launch (a real restart) reloads that
         checkpoint, re-shards it, runs 1 more step, and verifies the
         result equals 3 straight steps computed by an independent numpy
         reference — the sharded-checkpoint save -> restart -> resume
         round trip.

Writes <out_dir>/result_<pid>.json with the observed values.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, nproc, port, out_dir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    phase = sys.argv[5] if len(sys.argv) > 5 else ""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid

    import jax.numpy as jnp
    import numpy as np

    from photoverse_tpu.parallel.mesh import (
        batch_sharding,
        host_batch_slice,
        make_mesh,
        replicated,
        shard_batch,
        zero1_sharding,
    )

    n_dev = jax.device_count()  # nproc * 2 virtual CPU devices
    mesh = make_mesh(n_dev)
    repl = replicated(mesh)
    result = {"pid": pid, "n_global_devices": n_dev}

    # 1. global batch assembled from per-process rows
    global_bs = 2 * n_dev
    full = np.arange(global_bs * 3, dtype=np.float32).reshape(global_bs, 3)
    local = {"x": full[host_batch_slice(global_bs)]}
    dev_batch = shard_batch(mesh, local)
    assert dev_batch["x"].shape == (global_bs, 3), dev_batch["x"].shape

    # 2. cross-process reduction: sum over the globally-sharded batch
    f = jax.jit(
        lambda b: jnp.sum(b["x"]),
        in_shardings=({"x": batch_sharding(mesh)},),
        out_shardings=repl,
    )
    result["global_sum"] = float(f(dev_batch))
    result["global_sum_expected"] = float(full.sum())

    # 3. ZeRO-1 sharded state -> jitted update -> all-process gather
    opt_state = {"m": np.zeros((n_dev, 4), np.float32), "count": np.int32(0)}
    opt_sh = zero1_sharding(mesh, opt_state)
    opt_state = jax.tree.map(jax.device_put, opt_state, opt_sh)
    upd = jax.jit(
        lambda s, b: {
            "m": s["m"] + jnp.sum(b["x"]) * (1.0 + jnp.arange(4, dtype=jnp.float32)),
            "count": s["count"] + 1,
        },
        in_shardings=(opt_sh, {"x": batch_sharding(mesh)}),
        out_shardings=opt_sh,
    )
    opt_state = upd(opt_state, dev_batch)
    gather = jax.jit(lambda t: t, out_shardings=jax.tree.map(lambda _: repl, opt_state))
    gathered = gather(opt_state)  # every process participates (train.py:391-403)
    host_state = jax.tree.map(np.asarray, gathered)
    result["opt_m_row0"] = host_state["m"][0].tolist()
    result["opt_count"] = int(host_state["count"])

    # 4. checkpoint from the gathered state on process 0; barrier; reload all
    ckpt_path = os.path.join(out_dir, "state.msgpack")
    if pid == 0:
        from flax.serialization import msgpack_serialize

        tmp = ckpt_path + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(msgpack_serialize(host_state))
        os.replace(tmp, ckpt_path)
    # barrier so non-zero processes read only after the write completes
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("ckpt_written")
    from flax.serialization import msgpack_restore

    with open(ckpt_path, "rb") as fh:
        restored = msgpack_restore(fh.read())
    np.testing.assert_allclose(restored["m"], host_state["m"])
    result["ckpt_roundtrip"] = True

    if phase in ("fsdp1", "fsdp2"):
        result.update(_fsdp_stage(phase, pid, out_dir, mesh, repl))

    with open(os.path.join(out_dir, f"result_{pid}.json"), "w") as fh:
        json.dump(result, fh)
    print(f"process {pid}: ok")


def _fsdp_stage(phase, pid, out_dir, mesh, repl):
    """FSDP-sharded training state: save (fsdp1) / restart+resume (fsdp2)."""
    import jax
    import numpy as np
    from flax.serialization import msgpack_restore, msgpack_serialize
    from jax.experimental import multihost_utils

    from photoverse_tpu.parallel.fsdp import fsdp_shardings
    from photoverse_tpu.parallel.mesh import batch_sharding

    n_dev = jax.device_count()
    ckpt_path = os.path.join(out_dir, "fsdp_state.msgpack")
    # deterministic init so the fsdp2 restart and the numpy reference can
    # reconstruct it (every process holds the same full batch formula —
    # the sharded dev_batch is NOT fully addressable per process)
    init_w = (np.arange(64 * 32, dtype=np.float32).reshape(64, 32) % 7) / 7.0
    global_bs = 2 * n_dev
    x = ((np.arange(global_bs * 64, dtype=np.float32).reshape(global_bs, 64)
          % 11.0) - 5.0) / 5.0

    def one_step_np(w):
        y = x @ w
        return w - 1e-3 * (x.T @ y)

    if phase == "fsdp1":
        w_start, start_step = init_w, 0
    else:
        with open(ckpt_path, "rb") as fh:
            saved = msgpack_restore(fh.read())
        assert int(saved["step"]) == 2, saved["step"]
        w_start, start_step = np.asarray(saved["w"], np.float32), 2

    params = {"w": w_start}
    sh = fsdp_shardings(mesh, params, min_size=8)
    # the weight's largest dim must actually shard over all devices —
    # otherwise this stage silently degrades to a replicated test
    assert sh["w"].spec != jax.sharding.PartitionSpec(), sh["w"].spec
    params = jax.tree.map(jax.device_put, params, sh)

    step_fn = jax.jit(
        lambda p, b: {"w": p["w"] - 1e-3 * (b.T @ (b @ p["w"]))},
        in_shardings=(sh, batch_sharding(mesh)),
        out_shardings=sh,
    )
    xb = jax.device_put(np.asarray(x), batch_sharding(mesh))
    n_steps = 2 if phase == "fsdp1" else 1
    for _ in range(n_steps):
        params = step_fn(params, xb)

    gather = jax.jit(lambda t: t, out_shardings=jax.tree.map(lambda _: repl, params))
    host_w = np.asarray(jax.device_get(gather(params)["w"]))

    out = {"fsdp_phase": phase, "fsdp_devices": n_dev}
    if phase == "fsdp1":
        if pid == 0:
            tmp = ckpt_path + ".tmp"
            with open(tmp, "wb") as fh:
                fh.write(msgpack_serialize({"w": host_w, "step": np.int32(2)}))
            os.replace(tmp, ckpt_path)
        multihost_utils.sync_global_devices("fsdp_ckpt_written")
        out["fsdp_saved_step"] = 2
    else:
        ref = init_w
        for _ in range(3):
            ref = one_step_np(ref)
        out["fsdp_resume_exact"] = bool(
            np.allclose(host_w, ref, rtol=2e-4, atol=2e-5)
        )
        out["fsdp_final_checksum"] = float(np.sum(host_w))
        out["fsdp_ref_checksum"] = float(np.sum(ref))
    return out


if __name__ == "__main__":
    main()
