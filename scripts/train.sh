#!/bin/sh
# Training launcher — parity wrapper for the reference's scripts/train.sh
# (torch.distributed.launch over 8*V100). Here there is no launcher: JAX
# owns every local TPU chip in one process and the train step is data-
# parallel over all of them automatically (cfg.mesh_axis_data=0 = all).
# Multi-host: set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
# JAX_PROCESS_ID and run this script once per host.
#
# Usage: sh ./scripts/train.sh [EXP_NAME]
set -e

EXP_NAME="${1:-default_8chip}"

python -m transhuman_tpu.cli.train --cfg_file configs/train_or_eval.yaml \
    run_mode train \
    exp_name "${EXP_NAME}" \
    resume True \
    jitter True
