#!/bin/sh
# Evaluation launcher — parity wrapper for the reference's scripts/test.sh.
# Same positional contract: $1 was the CUDA card (ignored here — JAX owns
# the chips; shard a frame over several with opts `mesh_axis_rays N`),
# $2 the checkpoint epoch, $3 the experiment name.
#
# Usage: sh ./scripts/test.sh 0 2100 official
set -e

CARD=$1   # accepted for muscle-memory compatibility; unused on TPU
EPOCH=${2:-2100}
EXP_NAME="${3:-official}"

### training set fitting
# test_input_view="0,7,15"
# test_target_view="3,5,10,12,18,20"
# test_mode='model_o_motion_o'

### pose generalization
# test_input_view="0,7,15"
# test_target_view="3,5,10,12,18,20"
# test_mode='model_o_motion_x'

### identity generalization
test_input_view="0,7,15"
test_target_view="3,5,10,12,18,20"
test_mode='model_x_motion_x'

### one-shot generalization
# test_input_view="0,"
# test_target_view="3,5,10,12,18,20"
# test_mode='model_x_motion_x'

LOG_DIR="./data/result/transhuman/${EXP_NAME}"
mkdir -p "${LOG_DIR}"
# unique per invocation: a fixed path raced concurrent runs of the same
# EXP_NAME (one run reading the other's status) and a stale file could
# report success after a SIGKILL
EXIT_FILE="${LOG_DIR}/.exit_code.$$"
rm -f "${EXIT_FILE}"

( set +e; python -m transhuman_tpu.cli.run --type evaluate --cfg_file configs/train_or_eval.yaml \
    run_mode test \
    test.input_view "${test_input_view}" \
    test.target_view "${test_target_view}" \
    test.mode "${test_mode}" \
    exp_name "${EXP_NAME}" \
    test.epoch "${EPOCH}" \
    test.exp_folder_name "zjumocap_${test_mode}" \
    test.full_eval False \
    2>&1; echo $? > "${EXIT_FILE}" ) \
    | tee "${LOG_DIR}/log_E${EPOCH}_${test_mode}.txt"
# a plain pipeline returns tee's status, defeating set -e on a python
# failure; the subshell writes the real exit code, propagated here
RC="$(cat "${EXIT_FILE}" 2>/dev/null || echo 1)"
rm -f "${EXIT_FILE}"
exit "${RC}"
