#!/bin/bash
# Sequential TPU measurement sweep — ONE process at a time, generous
# timeouts (SIGTERM on a TPU process wedges the remote claim).
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

log=${GS_SWEEP_LOG:-/tmp/sweep.log}
: > $log

run() {
  echo "=== $* ===" >> $log
  timeout 2400 "$@" >> $log 2>&1
  echo "rc=$?" >> $log
  sleep 5
}

# 1. correctness first: on-chip parity of default pipeline
run python tools/tpu_parity_check.py
# 2. headline bench, default flags
run python bench.py
# 3. stage profile
run python tools/profile_frame.py
# 4. flag A/Bs: parity + bench per flag
run env GS_SELECT_DOT3=1 python tools/tpu_parity_check.py
run env GS_SELECT_DOT3=1 python bench.py
run env GS_COMP_DOT3=1 python tools/tpu_parity_check.py
run env GS_COMP_DOT3=1 python bench.py
# 5. backward: grad parity + A/B
run python tools/tpu_grad_check.py
run env GS_BWD_DOT3=1 python tools/tpu_grad_check.py
run env GS_SELECT_DOT3=1 python tools/tpu_grad_check.py
# 6. full metric set (render/surfel/train/mesh + parity gates)
run python bench_all.py

# 7. compositor supertiling A/B (GS_TILES_PER_PROG)
run env GS_TILES_PER_PROG=2 python tools/tpu_parity_check.py
run env GS_TILES_PER_PROG=2 python bench.py
run env GS_TILES_PER_PROG=4 python tools/tpu_parity_check.py
run env GS_TILES_PER_PROG=4 python bench.py

# sentinel LAST: anything grepping for it must only match when all steps ran
echo "SWEEP DONE" >> $log
