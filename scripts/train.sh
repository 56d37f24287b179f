#!/usr/bin/env bash
# Launch training (the reference's Train/train.sh equivalent).
#
# Single host (all local TPU chips form the data-parallel mesh):
#   scripts/train.sh configs/KDLAES.yml
#
# Multi-host TPU pod: run the same command on every host; JAX picks up the
# pod topology from the TPU runtime (parallel.init_distributed), each
# process loads its rank-strided shard (EnlargedShuffleSampler), and XLA's
# gradient all-reduce rides ICI. No torchrun / NCCL.
set -euo pipefail
OPT="${1:?usage: scripts/train.sh <config.yml> [extra raie-train args]}"
shift || true
exec python -m rethink_acoustic_image_enhancement_tpu.cli train -opt "$OPT" "$@"
