#!/usr/bin/env bash
# Preemption-aware training supervisor (VERDICT r1 #10 / BASELINE config 5).
#
# Runs the train CLI in a retry loop: on any non-zero exit (TPU preemption,
# OOM-kill, spot reclaim) it finds the newest native checkpoint in
# $OUTPUT_DIR and restarts with --resume_from, which restores weights,
# optimizer state AND the global step (ckpt/checkpoint.py load_progress).
# SIGTERM reaching the trainer triggers its own checkpoint-and-exit handler
# first (cli/train.py), so the resume point is at most one step old.
#
# Usage: OUTPUT_DIR=results MAX_RESTARTS=100 scripts/run_train_resumable.sh \
#          --pretrained_model_name_or_path ... --data_root_path ... [flags]
set -u

OUTPUT_DIR="${OUTPUT_DIR:-results}"
MAX_RESTARTS="${MAX_RESTARTS:-100}"
RESTART_DELAY="${RESTART_DELAY:-10}"

attempt=0
last_resume=""
same_ckpt_failures=0
while :; do
    resume_args=()
    latest=$(ls -1t "${OUTPUT_DIR}"/photoverse_*.msgpack 2>/dev/null | head -1)
    if [[ -n "${latest:-}" ]]; then
        echo "[resumable] resuming from ${latest}"
        resume_args=(--resume_from "${latest}")
    fi
    python -m photoverse_tpu.cli.train --output_dir "${OUTPUT_DIR}" \
        "${resume_args[@]}" "$@"
    rc=$?
    if [[ $rc -eq 0 ]]; then
        echo "[resumable] training completed"
        exit 0
    fi
    # if the SAME checkpoint fails twice in a row, assume it is corrupt
    # (writes are atomic, but disks lie) and quarantine it so the next
    # attempt falls back to the previous good checkpoint
    if [[ -n "${latest:-}" && "${latest}" == "${last_resume}" ]]; then
        same_ckpt_failures=$((same_ckpt_failures + 1))
        if [[ $same_ckpt_failures -ge 2 ]]; then
            echo "[resumable] quarantining ${latest} -> ${latest}.corrupt"
            mv -f "${latest}" "${latest}.corrupt"
            same_ckpt_failures=0
        fi
    else
        same_ckpt_failures=0
    fi
    last_resume="${latest:-}"
    attempt=$((attempt + 1))
    if [[ $attempt -ge $MAX_RESTARTS ]]; then
        echo "[resumable] giving up after ${attempt} restarts (last rc=$rc)"
        exit "$rc"
    fi
    echo "[resumable] trainer exited rc=$rc — restart ${attempt}/${MAX_RESTARTS} in ${RESTART_DELAY}s"
    sleep "${RESTART_DELAY}"
done
