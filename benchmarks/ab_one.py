import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, dataclasses, json
import jax, jax.numpy as jnp
import __graft_entry__ as ge
from dvae_tpu.models import init_vae_params
from dvae_tpu.training import create_train_state, kl_weight_vector, make_train_step

variant = sys.argv[1]
kw = {"scan_f32": dict(lstm_backend="scan"),
      "pallas_f32": dict(lstm_backend="pallas"),
      "scan_bf16": dict(lstm_backend="scan", compute_dtype="bfloat16"),
      "pallas_bf16": dict(lstm_backend="pallas", compute_dtype="bfloat16"),
      "pallas_ce": dict(lstm_backend="pallas", fused_ce_backend="pallas"),
      "xla_ce": dict(lstm_backend="pallas", fused_ce_backend="xla")}[variant]
B = 128
base = ge._flagship_cfg(vocab_size=20000, emb=256, hidden=256, layers=2, max_length=17)
cfg = dataclasses.replace(base, **kw)
batch_np = ge._synthetic_batch(cfg, B=B, seed=0)
batch = {k: (jnp.asarray(v) if not isinstance(v, dict) else {n: jnp.asarray(a) for n, a in v.items()}) for k, v in batch_np.items()}
params, constants = init_vae_params(jax.random.PRNGKey(0), cfg)
state = create_train_state(params, 3e-4, 0)
step = jax.jit(make_train_step(cfg, constants, 3e-4), donate_argnums=(0,))
klw = jnp.asarray(kl_weight_vector(cfg, {"default": 0.01}, 1.0))
for _ in range(5):
    state, metrics, _, _ = step(state, batch, klw, jnp.asarray(0.5), jnp.asarray(0.01))
jax.block_until_ready(metrics["total_loss"])
best = 1e9
for rep in range(3):
    t0 = time.time()
    for _ in range(20):
        state, metrics, _, _ = step(state, batch, klw, jnp.asarray(0.5), jnp.asarray(0.01))
    jax.block_until_ready(metrics["total_loss"])
    best = min(best, (time.time()-t0)/20)
print(json.dumps({"variant": variant, "ms_per_step": round(best*1000,3), "loss": round(float(metrics["total_loss"]),4)}))
