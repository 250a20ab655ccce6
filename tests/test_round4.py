"""Round-4 regression tests: bench outlier handling, CLI guards."""

import importlib.util
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestBenchRobustTrials:
    """VERDICT r3 #5: a 46x-off tunnel stall must not inflate the spread."""

    def test_clean_trials_untouched(self):
        b = _load_bench()
        vals = iter([2.35, 2.36, 2.34, 2.355, 2.345])
        kept, disc = b.robust_trials(lambda s: next(vals), 5, "t")
        assert len(kept) == 5 and disc == []

    def test_outlier_retried_and_recovered(self):
        b = _load_bench()
        vals = iter([2.35, 0.05, 2.36, 2.34, 2.35, 2.355])
        kept, disc = b.robust_trials(lambda s: next(vals), 5, "t")
        assert len(kept) == 5
        assert disc == [0.05]
        assert all(abs(k - 2.35) < 0.05 for k in kept)

    def test_outlier_retry_also_off_dropped(self):
        b = _load_bench()
        vals = iter([2.35, 0.05, 2.36, 2.34, 2.35, 0.06])
        kept, disc = b.robust_trials(lambda s: next(vals), 5, "t")
        assert len(kept) == 4
        assert disc == [0.05, 0.06]

    def test_all_divergent_falls_back_to_raw(self):
        # pathological: no two trials agree — report raw rather than empty
        b = _load_bench()
        seq = [1.0, 2.0, 8.0, 16.0, 64.0] + [100.0] * 10
        vals = iter(seq)
        kept, disc = b.robust_trials(lambda s: next(vals), 5, "t")
        assert len(kept) >= 1


class TestGenerateKarrasGuard:
    """ADVICE r3: pndm + --karras_sigmas must fail BEFORE the model load."""

    @pytest.mark.parametrize("sched", ["ddim", "pndm"])
    def test_pre_load_rejection(self, sched):
        r = subprocess.run(
            [sys.executable, "-c",
             "from photoverse_tpu.cli.generate import main; "
             f"main(['--input_image_path', 'x.png', '--scheduler', '{sched}',"
             " '--karras_sigmas'])"],
            capture_output=True, text=True, timeout=120, cwd=REPO,
        )
        assert r.returncode != 0
        assert "karras_sigmas is invalid" in r.stderr
        # SystemExit fires before any model/jax heavy lifting
        assert "Traceback" not in r.stderr


class TestClipActSharding:
    """VERDICT r3 #4: explicit batch-over-data activation constraints in
    the CLIP text encoder must (a) leave the numerics bit-identical and
    (b) rid the dp x model train backward of SPMD involuntary-full-
    rematerialization reshards."""

    def _setup(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from photoverse_tpu.models.clip import CLIPTextConfig, CLIPTextEncoder
        from photoverse_tpu.parallel.mesh import batch_sharding, replicated
        from photoverse_tpu.parallel.tp import make_mesh_2d

        cfg = CLIPTextConfig(
            vocab_size=64, hidden_size=16, num_layers=2, num_heads=2,
            intermediate_size=32, max_position_embeddings=12,
        )
        enc = CLIPTextEncoder(cfg)
        rng = np.random.RandomState(0)
        B = 4
        ids = jnp.asarray(rng.randint(1, 64, (B, 12)), jnp.int32)
        concept = jnp.asarray(rng.randn(B, 5, 16), jnp.float32)
        pidx = jnp.full((B,), 3, jnp.int32)
        params = enc.init(jax.random.PRNGKey(0), ids, concept, pidx)["params"]
        mesh = make_mesh_2d(4, 2)
        return enc, params, ids, concept, pidx, mesh, batch_sharding(mesh), replicated(mesh)

    def _grad_fn(self, enc, sharded):
        import jax

        def loss(params, ids, concept, pidx, act_sh):
            out, _ = enc.apply(
                {"params": params}, ids, concept, pidx, act_sharding=act_sh
            )
            return (out.astype("float32") ** 2).mean()

        return lambda p, i, c, x, sh: jax.grad(loss, argnums=2)(p, i, c, x, sh)

    def test_constraint_is_numerically_transparent(self):
        import jax
        import numpy as np

        enc, params, ids, concept, pidx, mesh, bsh, repl = self._setup()
        g = self._grad_fn(enc, None)
        base = jax.jit(lambda p, i, c, x: g(p, i, c, x, None))(
            params, ids, concept, pidx
        )
        jit_sharded = jax.jit(
            lambda p, i, c, x: g(p, i, c, x, bsh),
            in_shardings=(repl, bsh, bsh, bsh),
            out_shardings=repl,
        )
        got = jit_sharded(params, ids, concept, pidx)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(base), rtol=1e-6, atol=1e-7
        )

    def test_no_involuntary_remat_in_text_backward(self, capfd):
        import jax

        enc, params, ids, concept, pidx, mesh, bsh, repl = self._setup()
        g = self._grad_fn(enc, None)
        jit_sharded = jax.jit(
            lambda p, i, c, x: g(p, i, c, x, bsh),
            in_shardings=(repl, bsh, bsh, bsh),
            out_shardings=repl,
        )
        capfd.readouterr()  # drain anything emitted before this compile
        jax.block_until_ready(jit_sharded(params, ids, concept, pidx))
        err = capfd.readouterr().err
        assert "Involuntary full rematerialization" not in err, err[-3000:]


class TestSeqTransformer:
    """VERDICT r3 #1 (layout-level): seq_transformer streams each
    transformer block in (B, S, C) with proj_in/proj_out as matmuls on
    the SAME conv params — the param tree and the numerics must be
    interchangeable with the NHWC conv form."""

    def _build(self, seq, **extra):
        import dataclasses as dc

        from photoverse_tpu.models.unet import UNet2DCondition, UNetConfig

        cfg = UNetConfig(
            block_out_channels=(32, 64),
            layers_per_block=1,
            cross_attention_dim=16,
            num_heads=2,
            norm_num_groups=8,
            seq_transformer=seq,
        )
        cfg = dc.replace(cfg, **extra)
        return UNet2DCondition(config=cfg)

    def _inputs(self):
        import jax.numpy as jnp
        import numpy as np

        rng = np.random.RandomState(0)
        B = 2
        return (
            jnp.asarray(rng.randn(B, 16, 16, 4), jnp.float32),
            jnp.asarray([3, 777], jnp.int32),
            jnp.asarray(rng.randn(B, 7, 16), jnp.float32),
            jnp.asarray(rng.randn(B, 3, 16), jnp.float32),
        )

    def test_param_tree_identical(self):
        import jax

        s, t, tx, idc = self._inputs()
        p_off = self._build(False).init(jax.random.PRNGKey(0), s, t, tx, idc)
        p_on = self._build(True).init(jax.random.PRNGKey(0), s, t, tx, idc)
        shapes = lambda p: jax.tree.map(lambda a: a.shape, p)
        assert shapes(p_off) == shapes(p_on)

    def test_eval_outputs_identical(self):
        import jax
        import numpy as np

        s, t, tx, idc = self._inputs()
        u_off, u_on = self._build(False), self._build(True)
        params = u_off.init(jax.random.PRNGKey(0), s, t, tx, idc)
        eps0, n0 = u_off.apply(params, s, t, tx, idc)
        eps1, n1 = u_on.apply(params, s, t, tx, idc)
        np.testing.assert_allclose(
            np.asarray(eps1), np.asarray(eps0), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(n1), np.asarray(n0), rtol=1e-5, atol=1e-5
        )

    def test_train_grads_match(self):
        import jax
        import numpy as np

        s, t, tx, idc = self._inputs()
        u_off, u_on = self._build(False), self._build(True)
        params = u_off.init(jax.random.PRNGKey(0), s, t, tx, idc)

        def loss(u):
            def f(p):
                eps, _ = u.apply(
                    p, s, t, tx, idc,
                    train=True, fusion_rng=jax.random.PRNGKey(7),
                )
                return (eps**2).mean()

            return jax.grad(f)(params)

        g_off, g_on = loss(u_off), loss(u_on)
        flat_off = jax.tree.leaves(g_off)
        flat_on = jax.tree.leaves(g_on)
        for a, b in zip(flat_off, flat_on):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-5
            )


class TestCheckpointSnapshotAndFinal:
    """Round-4 review fixes: host_save_snapshot must be save-equivalent to
    the full tree while dropping the frozen backbone, and final=True must
    give boundary- and non-boundary-ending runs identical resume semantics."""

    def test_host_save_snapshot_save_equivalent(self, tmp_path):
        import torch

        from photoverse_tpu.ckpt.checkpoint import (
            host_save_snapshot,
            save_progress,
            save_progress_pt,
        )
        from tests.tiny_models import tiny_bundle

        _, params = tiny_bundle(lora_rank=4, seed=11)
        snap = host_save_snapshot(params)
        # the heavy frozen components are dropped entirely...
        assert snap.vae == {} and snap.text_encoder == {} and snap.vision_encoder == {}
        # ...and every retained leaf is already host numpy (no device fetch
        # left for AsyncCheckpointer.submit's blanket snapshot)
        import jax

        for leaf in jax.tree.leaves(
            (snap.unet, snap.text_adapter, snap.image_adapter)
        ):
            assert isinstance(leaf, __import__("numpy").ndarray)

        lora_cfg = {"r": 4, "lora_alpha": 1, "lora_dropout": 0.1}
        a = save_progress(str(tmp_path / "full"), params, step=7,
                          lora_config=lora_cfg)
        b = save_progress(str(tmp_path / "snap"), snap, step=7,
                          lora_config=lora_cfg)
        assert open(a, "rb").read() == open(b, "rb").read()

        pa = save_progress_pt(str(tmp_path / "full"), params, step=7,
                              lora_config=lora_cfg)
        pb = save_progress_pt(str(tmp_path / "snap"), snap, step=7,
                              lora_config=lora_cfg)
        sa = torch.load(pa, map_location="cpu", weights_only=False)
        sb = torch.load(pb, map_location="cpu", weights_only=False)
        for section in ("image_adapter", "text_adapter", "cross_attention_adapter"):
            assert set(sa[section]) == set(sb[section]), section
            for k in sa[section]:
                assert torch.equal(sa[section][k], sb[section][k]), (section, k)

    def test_final_embeds_step(self, tmp_path):
        from flax import serialization

        from photoverse_tpu.ckpt.checkpoint import save_progress, save_progress_pt
        from tests.tiny_models import tiny_bundle

        _, params = tiny_bundle(seed=3)
        path = save_progress(str(tmp_path), params, step=13, final=True)
        assert path.endswith("photoverse.msgpack")
        payload = serialization.msgpack_restore(open(path, "rb").read())
        # the embedded step makes --resume_from photoverse.msgpack continue
        # at 13 — the same semantics a boundary-promoted final has
        assert payload["step"] == 13
        pt = save_progress_pt(str(tmp_path), params, step=13, final=True)
        assert pt.endswith("photoverse.pt")
