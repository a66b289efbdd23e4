#!/bin/bash
# Round-5 training queue: serialized TPU jobs with a health probe
# between jobs (the axon worker is single-tenant and occasionally
# degrades; see .claude/skills/verify/SKILL.md). Each job logs to
# logs/ and checkpoints under ckpts/.
#
# Usage: bash tools/queue_r5.sh [start_job] 2>&1 | tee -a logs/queue_r5.log
set -u
cd /root/repo
mkdir -p logs ckpts

probe() {
  # Gate: tiny-matmul probe must run <5 ms/call (not degraded).
  for i in $(seq 1 60); do
    timeout 120 python - <<'EOF' && return 0
import time, jax, jax.numpy as jnp
x = jnp.ones((4096, 4096))
f = jax.jit(lambda a: a @ a)
f(x).block_until_ready()
t0 = time.perf_counter()
for _ in range(5):
    out = f(x)
out.block_until_ready()
dt = (time.perf_counter() - t0) / 5
print(f'probe {dt*1e3:.1f} ms/call')
assert dt < 0.05, dt
EOF
    echo "probe failed/degraded; retry in 180s (attempt $i)"
    sleep 180
  done
  return 1
}

run_job() {
  name=$1; budget=$2; shift 2
  echo "=== job $name: $(date -u +%H:%M:%S) budget=${budget}s ==="
  probe || { echo "TPU unhealthy, skipping $name"; return 1; }
  timeout "$budget" "$@" > "logs/${name}.log" 2>&1
  rc=$?
  echo "=== job $name done rc=$rc $(date -u +%H:%M:%S) ==="
  tail -3 "logs/${name}.log"
}

START=${1:-1}

# 1. Flight LL to plateau (auto-resumes from ckpts/flight_ll @ 576000).
[ "$START" -le 1 ] && run_job flight_ll_r5 7200 \
  python -m flybody_tpu.train.run --task flight_imitation \
    --num-envs 2048 --rollout-length 16 --iterations 1200 \
    --replay-capacity 300000 --batch-size 256 \
    --ckpt-dir ckpts/flight_ll --ckpt-minutes 20 \
    --log-jsonl logs/flight_ll_r5.jsonl

# 2. HL steering net on vision_bumps around the frozen LL.
[ "$START" -le 2 ] && run_job vision_hl_r5 5400 \
  python -m flybody_tpu.train.run --task vision_bumps \
    --ll-snapshot ckpts/flight_ll/policy \
    --num-envs 256 --rollout-length 16 --iterations 900 \
    --replay-capacity 200000 --batch-size 256 \
    --ckpt-dir ckpts/vision_hl_r5 --ckpt-minutes 15 \
    --log-jsonl logs/vision_hl_r5.jsonl

# 3. Controller-reuse eval table (3 seeds).
if [ "$START" -le 3 ]; then
  for s in 0 1 2; do
    run_job eval_reuse_s$s 1200 \
      python -m flybody_tpu.train.eval_reuse --task vision_bumps \
        --ll-snapshot ckpts/flight_ll/policy \
        --hl-ckpt-dir ckpts/vision_hl_r5 --num-envs 128 --seed $s
  done
fi

# 4. walk_on_ball (the reference's default task) — short curve.
[ "$START" -le 4 ] && run_job ball_r5 2400 \
  python -m flybody_tpu.train.run --task walk_on_ball \
    --num-envs 1024 --rollout-length 16 --iterations 200 \
    --replay-capacity 200000 --batch-size 256 \
    --ckpt-dir ckpts/ball_r5 --log-jsonl logs/ball_r5.jsonl

# 5. template task — short run (curve = episode survival).
[ "$START" -le 5 ] && run_job template_r5 1500 \
  python -m flybody_tpu.train.run --task template \
    --num-envs 1024 --rollout-length 16 --iterations 100 \
    --replay-capacity 200000 --batch-size 256 \
    --log-jsonl logs/template_r5.jsonl

# 6/7. Walking imitation toward plateau: accurate vs bench-solver arms.
[ "$START" -le 6 ] && run_job walk_acc_r5 5400 \
  python -m flybody_tpu.train.run --task walk_imitation \
    --ref-path datasets/walk_engine.h5 \
    --num-envs 1024 --rollout-length 16 --iterations 900 \
    --replay-capacity 300000 --batch-size 256 \
    --ckpt-dir ckpts/walk_acc_r5 --ckpt-minutes 20 \
    --log-jsonl logs/walk_acc_r5.jsonl

[ "$START" -le 7 ] && run_job walk_bench_r5 5400 \
  python -m flybody_tpu.train.run --task walk_imitation --bench-solver \
    --ref-path datasets/walk_engine.h5 \
    --num-envs 1024 --rollout-length 16 --iterations 900 \
    --replay-capacity 300000 --batch-size 256 \
    --ckpt-dir ckpts/walk_bench_r5 --ckpt-minutes 20 \
    --log-jsonl logs/walk_bench_r5.jsonl

# 8. Vision throughput artifact.
[ "$START" -le 8 ] && run_job vision_bench_r5 1800 \
  env BENCH_TASK=vision_bumps BENCH_BATCH=512 python bench.py

echo "queue complete $(date -u)"
