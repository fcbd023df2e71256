#!/bin/bash
# Round-3 TPU measurement autorun.
#
# Waits for the tunneled TPU to come back, then runs the highest-value
# items of tools/r3_tpu_program.md sequentially (one TPU process at a
# time, every command under timeout), logging to tools/r3_results.log.
# Within-process A/B only — each tool compares its own arms in-process.
set -u
cd "$(dirname "$0")/.."
LOG=tools/r3_results.log

say() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }
run() { say "RUN: $*"; timeout "$1" "${@:2}" 2>&1 | tee -a "$LOG"; }

say "waiting for TPU tunnel..."
until timeout 120 python -c \
    "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; do
  sleep 240
done
say "tunnel is UP"

# 0. sanity drive: tiny parity + finite grads on hardware
run 580 python - <<'EOF'
import jax, jax.numpy as jnp, numpy as np
import flash_cosine_sim_attention_tpu as fcsa
assert jax.default_backend() == "tpu"
rng = np.random.default_rng(0)
t = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)
q, k, v = t(4,8,1024,64), t(4,8,1024,64), t(4,8,1024,64)
val, grads = jax.value_and_grad(
    lambda q,k,v: jnp.mean(fcsa.flash_cosine_sim_attention(
        q,k,v,causal=True).astype(jnp.float32)**2), argnums=(0,1,2))(q,k,v)
print("sanity:", val,
      [bool(jnp.isfinite(g.astype(jnp.float32)).all()) for g in grads])
qf,kf,vf = (x.astype(jnp.float32) for x in (q[:1],k[:1],v[:1]))
print("parity:", float(jnp.abs(
    fcsa.flash_cosine_sim_attention(qf,kf,vf,causal=True) -
    fcsa.plain_cosine_sim_attention(qf,kf,vf,causal=True)).max()))
EOF

# 1. dQ block sweep (headline lever; within-process arms)
run 1500 python tools/bench_bwd.py --sweep

# 2. dKdV sweep pinned at the dQ winner parsed from the log
BEST=$(grep -oP 'BEST \(\(\K[0-9]+, [0-9]+, [0-9]+' "$LOG" | tail -1 \
       | tr -d ' ')
if [ -n "${BEST:-}" ]; then
  run 1500 python tools/bench_bwd.py --blocks "$BEST" --sweep-kv
else
  say "no dQ BEST parsed; running kv sweep at defaults"
  run 1500 python tools/bench_bwd.py --sweep-kv
fi

# 2b. dKdV straddle-narrowing A/B (within-process env toggle)
if [ -n "${BEST:-}" ]; then
  run 900 python tools/bench_bwd.py --blocks "$BEST" --dkdv-narrow-ab
else
  run 900 python tools/bench_bwd.py --dkdv-narrow-ab
fi

# 3. fwd block sweep (within-process config list incl. narrowed arms)
run 1500 python tools/tune_blocks.py

# 4. headline check with current defaults
run 580 python bench.py

# 5. f32 backward defaults + sweep (VERDICT #2), f32 forward sweep
run 900 python tools/bench_bwd.py --f32
run 1500 python tools/bench_bwd.py --f32 --sweep
run 1500 python tools/tune_blocks.py --f32

# 6. bias path (VERDICT #3 done-check)
run 900 python tools/bench_bias.py

# 7. decode: lane-packed int8 vs einsum at long context (VERDICT #6)
run 900 python tools/bench_decode.py

# 8. int8-QK prefill (VERDICT #7)
run 900 python tools/bench_int8qk.py

say "autorun complete"
