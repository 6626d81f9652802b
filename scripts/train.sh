#!/usr/bin/env bash
# Training launcher (reference scripts/train.sh used torch.distributed.launch
# with one process per GPU; on TPU a single process drives all local devices
# through the mesh — multi-host pods pass --multihost on every host).
set -euo pipefail

EXP_NAME=${1:-dat}
CONFIG=${2:-configs/DAT.yaml}

python train.py --exp_name "${EXP_NAME}" --config "${CONFIG}" "${@:3}"
