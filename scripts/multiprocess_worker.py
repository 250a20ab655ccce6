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

    with open(os.path.join(out_dir, f"result_{pid}.json"), "w") as fh:
        json.dump(result, fh)
    print(f"process {pid}: ok")


if __name__ == "__main__":
    main()
