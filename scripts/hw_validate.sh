#!/bin/bash
# On-hardware validation sequence for the deformable kernels, run after any
# kernel change once the TPU tunnel is reachable. Order matters:
#   1. golden numerical check on the TPU backend (Mosaic lowering)
#   2. per-kernel micro timings (compare vs the log in README perf notes)
#   3. train-step micro at bs32 (the bench configuration)
# bench.py is NOT run here — run it last, after code freeze, so the driver's
# bench invocation hits the persistent compile cache.
set -x
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/hw_validate.log}
{
  date
  echo "=== 1. kernel golden check (TPU backend) ==="
  timeout 2400 python scripts/tpu_kernel_check.py 2 || exit 1
  echo "=== 2. micro kernel timings bs8 P=6 ==="
  timeout 2400 python scripts/micro_bwd.py 8 6
  echo "=== 3. train-step micro bs32 ==="
  timeout 3600 python scripts/micro_train.py 32
  date
  echo "=== hw_validate done ==="
} >"$LOG" 2>&1
