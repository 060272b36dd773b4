#!/bin/bash
# On-hardware validation sequence for the deformable kernels, run after any
# kernel change once the TPU tunnel is reachable. Order matters:
#   1. golden numerical check on the TPU backend (Mosaic lowering)
#   2. per-kernel micro timings (compare vs the log in README perf notes)
#   3. train-step micro at bs32 (the bench configuration)
#   4. bench.py — kernel code is frozen, so this warms the persistent
#      compile cache for the driver's bench invocation AND records numbers.
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
  echo "=== 4. bench.py (warms driver compile cache) ==="
  timeout 5400 python bench.py | tee /tmp/bench_r3s4.json
  date
  echo "=== hw_validate done ==="
} >"$LOG" 2>&1
