import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, dataclasses, json
import jax, jax.numpy as jnp
import __graft_entry__ as ge
from dvae_tpu.models import init_vae_params
from dvae_tpu.training import create_train_state, kl_weight_vector, make_train_step

variant = sys.argv[1]
# default matches the production default (flat_optimizer off)
flat = "--flat" in sys.argv
if "--cache" in sys.argv:
    # warm-start via the persistent compilation cache (round 3); leave OFF
    # when measuring cold-compile costs
    from dvae_tpu.utils import enable_compilation_cache
    enable_compilation_cache("auto")
if "--rbg" in sys.argv:
    # TPU hardware RNG instead of threefry: distribution-equal draws,
    # bit-different streams; measures the threefry share of sampling cost
    jax.config.update("jax_default_prng_impl", "rbg")
from benchmarks.variants import VARIANTS
kw = VARIANTS[variant]
B = 128
unroll = 1
vpad = -1
for a in sys.argv[2:]:
    if a.startswith("--batch="):
        B = int(a.split("=")[1])
    if a.startswith("--unroll="):
        unroll = int(a.split("=")[1])
    if a.startswith("--vpad="):
        vpad = int(a.split("=")[1])
base = ge._flagship_cfg(vocab_size=20000, emb=256, hidden=256, layers=2, max_length=17)
cfg = dataclasses.replace(base, decode_unroll=unroll, padded_vocab_size=vpad, **kw)
batch_np = ge._synthetic_batch(cfg, B=B, seed=0)
batch = {k: (jnp.asarray(v) if not isinstance(v, dict) else {n: jnp.asarray(a) for n, a in v.items()}) for k, v in batch_np.items()}
params, constants = init_vae_params(jax.random.PRNGKey(0), cfg)
state = create_train_state(params, 3e-4, 0, flat=flat)
step = jax.jit(make_train_step(cfg, constants, 3e-4, flat=flat), donate_argnums=(0,))
klw = jnp.asarray(kl_weight_vector(cfg, {"default": 0.01}, 1.0))
# TIMING METHODOLOGY (round 2 fix): through the tunneled device runtime,
# jax.block_until_ready can return BEFORE device execution completes (a
# 16-step chain "measured" 1.3 ms/step while the profiler showed 6.0 ms of
# device busy time per step). Only a host VALUE fetch reliably barriers, so
# every rep ends in float(...). Rep 0 absorbs queue backlog and is dropped.
for _ in range(5):
    state, metrics, _, _ = step(state, batch, klw, jnp.asarray(0.5), jnp.asarray(0.01))
float(metrics["total_loss"])
times = []
for rep in range(4):
    t0 = time.time()
    for _ in range(32):
        state, metrics, _, _ = step(state, batch, klw, jnp.asarray(0.5), jnp.asarray(0.01))
    loss = float(metrics["total_loss"])   # host fetch = reliable barrier
    times.append((time.time() - t0) / 32)
times = sorted(times[1:])
med = times[len(times) // 2]
print(json.dumps({"variant": variant, "ms_per_step": round(med*1000,3),
                  "all_ms": [round(t*1000,3) for t in times],
                  "loss": round(loss,4)}))
