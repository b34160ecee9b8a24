#!/bin/bash
# Round-4 TPU measurement sweep — ONE process at a time, generous
# timeouts (SIGTERM on a TPU process wedges the remote claim).
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

log=${GS_SWEEP_LOG:-/tmp/sweep_r4.log}
: > $log

run() {
  echo "=== $* ===" >> $log
  timeout 2400 "$@" >> $log 2>&1
  echo "rc=$?" >> $log
  sleep 5
}

# 1. correctness first: on-chip parity with the r4 default flags
#    (SUBBLK=64 sub-block termination, RGB10 color pack, KEY1 fused key)
run python tools/tpu_parity_check.py
# 2. backward parity (bwd n_contrib block clamp is new)
run python tools/tpu_grad_check.py
run python tools/tpu_surfel_grad_check.py
# 3. headline bench, r4 defaults
run python bench.py
# 4. stage profile with the new flags
run python tools/profile_frame.py
# 5. flag A/Bs vs the r3 configuration
run env GS_SUBBLK=0 python bench.py
run env GS_SUBBLK=32 python bench.py
run env GS_SUBBLK=128 python bench.py
run env GS_PACK_RGB10=0 GS_PACK_KEY1=0 python bench.py
run env GS_PACK_KEY1=0 python bench.py
# 6. surfel throughput at r4 defaults
run python tools/bench_surfel.py

# sentinel LAST: anything grepping for it must only match when all steps ran
echo "SWEEP DONE" >> $log
