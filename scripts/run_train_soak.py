#!/usr/bin/env python
"""Sustained on-chip training soak (VERDICT round-3 #2; round-5 #3 runs it
as the EXACT canonical arm).

Drives the REAL train CLI at the canonical recipe shape
(/root/reference/prepare_dataset_and_train.sh:1 — effective batch 16 =
micro 8 x accum 2, LoRA rank 128, ArcFace face loss, --mixed_precision
bf16 + flash + remat; random weights and synthetic data, so the run
proves the TRAINING LOOP at SD scale, not model quality):

  phase A: 500-step target with eval sampling + checkpoint every 100;
           a SIGTERM lands mid-soak (step >= KILL_AT) -> the CLI
           checkpoints at the next boundary and exits cleanly;
  phase B: a fresh process resumes via --resume_from (optimizer + step
           restored) and finishes the remaining steps.

Emits TRAIN_SOAK_r05.json at the repo root:
  steps/s (steady-state median), loss trace (finite + first/last window
  means), resume continuity (killed step, resumed step, no gap/repeat),
  sample-grid + checkpoint artifacts, and an overhead accounting that
  reconciles the soak's steady-state sec/step against the isolated
  train-step bench (scripts/bench_train_face.py, --bench_ref).

Run on the TPU host with no other JAX process holding the tunnel:
    python scripts/run_train_soak.py [--steps 200] [--out /tmp/soak]

The orchestrator itself never imports jax — the train CLI subprocesses
own the tunnel sequentially.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

KILL_AT = 300  # SIGTERM once metrics.jsonl reaches this optimizer step
# (overridable with --kill_at for tiny-scale rehearsals)


def note(msg):
    print(f"# {msg}", flush=True)


def build_fixtures(root: pathlib.Path, n_images: int = 64, res: int = 512):
    """Random sd15-scale checkpoint dir + synthetic 512px dataset."""
    import numpy as np
    from PIL import Image

    sd = root / "sd"
    if not (sd / "unet").exists():
        note("synthesizing sd15-scale random checkpoint (~5 GB)")
        from scripts.make_random_checkpoint import make_checkpoint

        # make_checkpoint(out) writes to <out>/sd
        make_checkpoint(str(root), scale="sd15", seed=0)
    ds = root / "ds" / "images"
    if len(list(ds.glob("*.jpg"))) < n_images:
        ds.mkdir(parents=True, exist_ok=True)
        rng = np.random.RandomState(0)
        for i in range(n_images):
            arr = (rng.rand(res, res, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(ds / f"{i}.jpg")
    return sd, root / "ds"


def train_cmd(args, out_dir, resume_from=None):
    cmd = [
        sys.executable, "-m", "photoverse_tpu.cli.train",
        "--pretrained_model_name_or_path", str(args.sd),
        "--data_root_path", str(args.ds),
        "--output_dir", str(out_dir),
        "--resolution", str(args.resolution),
        "--train_batch_size", str(args.micro_batch),
        "--gradient_accumulation_steps", str(args.accum),
        "--max_train_steps", str(args.steps),
        "--checkpoint_save_steps", str(args.boundary),
        "--samples_save_steps", str(args.boundary),
        "--num_of_samples_to_save", "4",
        "--use_lora", "--lora_rank", str(args.lora_rank),
        "--lora_dropout", "0.1",
        "--face_loss", "arcface", "--allow_random_face_model",
        "--face_loss_sample_ratio", "0.25",
        "--learning_rate", "1e-5", "--lr_warmup_steps", "10",
        "--dataloader_num_workers", "2",
        "--seed", "0",
        "--report_to", "none",
    ]
    if args.tiny:
        cmd += ["--cpu", "--image_encoder_layers_idx", "1", "2", "3", "4"]
    else:
        cmd += ["--flash_attention", "--remat", "--uint8_transfer"]
    if args.mixed_precision != "no":
        cmd += ["--mixed_precision", args.mixed_precision]
    if args.fuse_face_accum:
        cmd += ["--fuse_face_accum"]
    if resume_from:
        cmd += ["--resume_from", str(resume_from)]
    return cmd


def read_metrics(path):
    """Per-optimizer-step rows only (the sample step also writes a
    {step, face_similarity} row without losses)."""
    rows = []
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    try:
                        row = json.loads(line)
                    except json.JSONDecodeError:
                        continue  # partial tail write during the kill
                    if "loss_mle" in row:
                        rows.append(row)
    return rows


def run_phase_a(args, out_dir):
    """Train until step >= KILL_AT, then SIGTERM; return (rows, rc)."""
    metrics = out_dir / "metrics.jsonl"
    env = dict(os.environ, JAX_DEFAULT_MATMUL_PRECISION="bfloat16")
    proc = subprocess.Popen(
        train_cmd(args, out_dir), cwd=REPO, env=env,
        stdout=open(out_dir / "phaseA.log", "w"), stderr=subprocess.STDOUT,
    )
    killed_at = None
    deadline = time.time() + args.phase_timeout
    while proc.poll() is None and time.time() < deadline:
        rows = read_metrics(metrics)
        if rows and rows[-1]["step"] >= args.kill_at and killed_at is None:
            killed_at = rows[-1]["step"]
            note(f"phase A reached step {killed_at} -> SIGTERM")
            proc.send_signal(signal.SIGTERM)
        time.sleep(5)
    if proc.poll() is None:
        note("phase A timeout — killing hard")
        proc.kill()
        proc.wait()
        return read_metrics(metrics), -9, killed_at
    return read_metrics(metrics), proc.returncode, killed_at


def newest_checkpoint(out_dir):
    cks = sorted(
        pathlib.Path(out_dir).glob("photoverse*.msgpack"),
        key=lambda p: p.stat().st_mtime,
    )
    return cks[-1] if cks else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/soak")
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--micro_batch", type=int, default=8)
    ap.add_argument("--accum", type=int, default=2)
    ap.add_argument("--kill_at", type=int, default=KILL_AT)
    ap.add_argument("--boundary", type=int, default=100,
                    help="checkpoint/sample step interval")
    ap.add_argument("--mixed_precision", default="bf16",
                    choices=["bf16", "no"],
                    help="canonical recipe arm is bf16 (VERDICT r4 weak #2: "
                         "the r04 soak ran the f32 default)")
    ap.add_argument("--fuse_face_accum", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="run the fused face-accumulation schedule (default on: "
                         "the round-5 A/B adopted it into --recipe canonical; "
                         "--no-fuse_face_accum reproduces the unfused r4 arm)")
    ap.add_argument("--bench_ref", type=float, default=None,
                    help="isolated sec/optimizer-step from "
                         "scripts/bench_train_face.py for the same arm; "
                         "records an overhead reconciliation when given")
    ap.add_argument("--lora_rank", type=int, default=128)
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--phase_timeout", type=int, default=3600)
    ap.add_argument("--phase_a_attempts", type=int, default=3,
                    help="Retry phase A when it dies BEFORE logging any "
                         "step (a compile-service infra failure — e.g. the "
                         "round-5 tpu_compile_helper SIGKILL — not a "
                         "training failure; there is no state to lose)")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU dress rehearsal against a tiny fixture dir "
                         "(--sd/--ds point at it; adds --cpu + tiny layer idx)")
    ap.add_argument("--sd", default=None, help="existing model dir (skip synth)")
    ap.add_argument("--ds", default=None, help="existing dataset dir")
    args = ap.parse_args()

    root = pathlib.Path(args.out)
    root.mkdir(parents=True, exist_ok=True)
    if args.sd and args.ds:
        args.sd, args.ds = pathlib.Path(args.sd), pathlib.Path(args.ds)
    else:
        args.sd, args.ds = build_fixtures(root, res=args.resolution)
    run_a = root / "runA"
    run_b = root / "runB"
    run_a.mkdir(exist_ok=True)
    run_b.mkdir(exist_ok=True)

    record = {
        "recipe": {
            "effective_batch": args.micro_batch * args.accum,
            "micro_batch": args.micro_batch,
            "grad_accum": args.accum,
            "lora_rank": args.lora_rank,
            "face_loss": "arcface (random weights; zero-egress env)",
            "resolution": args.resolution,
            "target_steps": args.steps,
            "kill_at_step": args.kill_at,
            "mixed_precision": args.mixed_precision,
            "fuse_face_accum": bool(args.fuse_face_accum),
        }
    }
    _write.path = os.path.join(
        REPO, "TRAIN_SOAK_rehearsal.json" if args.tiny else "TRAIN_SOAK_r05.json"
    )

    t0 = time.time()
    attempts = []
    for attempt in range(1, max(1, args.phase_a_attempts) + 1):
        rows_a, rc_a, killed_at = run_phase_a(args, run_a)
        attempts.append({"attempt": attempt, "rc": rc_a,
                         "steps_logged": len(rows_a)})
        if rows_a or rc_a == 0:
            break
        note(f"phase A attempt {attempt} died before the first step "
             f"(rc={rc_a}) — compile-infra retry")
    record["phaseA"] = {
        "rc": rc_a,
        "attempts": attempts,
        "killed_at_step": killed_at,
        "steps_logged": len(rows_a),
        "last_step": rows_a[-1]["step"] if rows_a else None,
        "wall_s": round(time.time() - t0, 1),
    }
    ck = newest_checkpoint(run_a)
    record["phaseA"]["checkpoint"] = str(ck) if ck else None
    if not rows_a or ck is None:
        record["ok"] = False
        _write(record)
        return 1

    # phase B: fresh process resumes from the preemption checkpoint
    t1 = time.time()
    env = dict(os.environ, JAX_DEFAULT_MATMUL_PRECISION="bfloat16")
    try:
        rc_b = subprocess.call(
            train_cmd(args, run_b, resume_from=ck), cwd=REPO, env=env,
            stdout=open(run_b / "phaseB.log", "w"), stderr=subprocess.STDOUT,
            timeout=args.phase_timeout,
        )
    except subprocess.TimeoutExpired:
        # record phase A's hours of results with ok:false instead of dying
        # with an unwritten artifact (the hang is the failure class this
        # harness exists to surface)
        note("phase B timeout — recording ok=false")
        record["phaseB"] = {"rc": "timeout", "wall_s": round(time.time() - t1, 1)}
        record["ok"] = False
        _write(record)
        return 1
    rows_b = read_metrics(run_b / "metrics.jsonl")
    record["phaseB"] = {
        "rc": rc_b,
        "steps_logged": len(rows_b),
        "first_step": rows_b[0]["step"] if rows_b else None,
        "last_step": rows_b[-1]["step"] if rows_b else None,
        "wall_s": round(time.time() - t1, 1),
    }

    # ---- analysis ----------------------------------------------------
    import numpy as np

    all_rows = rows_a + rows_b
    losses = [r["loss_mle"] for r in all_rows]
    faces = [r.get("loss_face", 0.0) for r in all_rows]
    steps_a = [r["step"] for r in rows_a]
    steps_b = [r["step"] for r in rows_b]
    # steady-state throughput: drop each phase's first (compile) step
    st = [r["step_time_s"] for r in rows_a[1:]] + [
        r["step_time_s"] for r in rows_b[1:]
    ]
    med_t = float(np.median(st)) if st else None
    w = min(30, len(losses) // 3)
    first_mean = float(np.mean(losses[:w]))
    last_mean = float(np.mean(losses[-w:]))
    resumed_step_a = steps_a[-1]
    continuity = bool(steps_b and steps_b[0] == resumed_step_a + 1)
    merged = steps_a + steps_b
    no_gap_no_repeat = merged == list(range(merged[0], merged[0] + len(merged)))
    sample_grid = sorted(pathlib.Path(run_a).glob("0*.jpg")) + sorted(
        pathlib.Path(run_b).glob("0*.jpg")
    )
    final_ck = newest_checkpoint(run_b)

    record.update(
        {
            "steps_per_sec": round(1.0 / med_t, 4) if med_t else None,
            "sec_per_optimizer_step": round(med_t, 3) if med_t else None,
            "imgs_per_sec": (
                round(args.micro_batch * args.accum / med_t, 2) if med_t else None
            ),
            "loss_trace": {
                "all_finite": bool(np.all(np.isfinite(losses))),
                "first_window_mean": round(first_mean, 4),
                "last_window_mean": round(last_mean, 4),
                "decreasing_ish": bool(last_mean <= first_mean * 1.05),
                "face_loss_active": bool(np.any(np.asarray(faces) != 0.0)),
            },
            "resume": {
                "killed_at_step": killed_at,
                "checkpoint_step": resumed_step_a,
                "phaseB_first_step": steps_b[0] if steps_b else None,
                "resume_exact": continuity,
                "no_gap_no_repeat": bool(no_gap_no_repeat),
            },
            "sample_grids": [str(p) for p in sample_grid],
            "final_checkpoint": str(final_ck) if final_ck else None,
            "total_steps": len(all_rows),
        }
    )
    if args.bench_ref and med_t:
        # reconcile the soak's steady-state sec/step with the isolated
        # train-step bench: the difference is the loop's real overhead
        # (data loading, metrics, ckpt/eval boundaries) — VERDICT r4 #3
        # asks for agreement within ~10%
        record["overhead_accounting"] = {
            "bench_sec_per_step": args.bench_ref,
            "soak_sec_per_step": round(med_t, 4),
            "overhead_pct": round(100.0 * (med_t / args.bench_ref - 1.0), 2),
            "within_10pct": bool(med_t <= args.bench_ref * 1.10),
        }
    record["ok"] = bool(
        rc_a == 0
        and rc_b == 0
        and record["loss_trace"]["all_finite"]
        and continuity
        and no_gap_no_repeat
        and len(all_rows) >= args.steps
        and sample_grid
        and final_ck is not None
    )
    _write(record)
    return 0 if record["ok"] else 1


def _write(record):
    out = getattr(_write, "path", os.path.join(REPO, "TRAIN_SOAK_r05.json"))
    with open(out, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps({k: record[k] for k in ("ok",) if k in record}))
    note(f"wrote {out}")


if __name__ == "__main__":
    sys.exit(main())
