#!/usr/bin/env bash
# Convenience launcher — counterpart of the reference train.sh.
#
#   -c  config directory (contains smswsj.yml / reverb_2mix.yml)
#   -d  dataset:  SMS_WSJ | REVERB_2MIX
#   -m  mode:     Extraction | Train | Test
#   -t  target:   MISO1 | Beamforming | MISO2 | MISO3
#   -n  log/run directory (TensorBoard + checkpoints)
#
# Unlike the reference (which hard-codes NN_BSS.yml regardless of -d,
# run.py:290), -c/-d select the config that is actually used.
set -euo pipefail

python run.py \
  -c ./configs \
  -d SMS_WSJ \
  -m Train \
  -t MISO1 \
  -n ./runs/miso1 \
  "$@"
