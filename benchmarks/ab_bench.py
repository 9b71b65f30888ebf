import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, dataclasses, json
import jax, jax.numpy as jnp
import __graft_entry__ as ge
from dvae_tpu.models import init_vae_params
from dvae_tpu.training import create_train_state, kl_weight_vector, make_train_step

B = 128
base = ge._flagship_cfg(vocab_size=20000, emb=256, hidden=256, layers=2, max_length=17)
batch_np = ge._synthetic_batch(base, B=B, seed=0)
batch = {k: (jnp.asarray(v) if not isinstance(v, dict) else {n: jnp.asarray(a) for n, a in v.items()}) for k, v in batch_np.items()}

def measure(cfg, n=20):
    params, constants = init_vae_params(jax.random.PRNGKey(0), cfg)
    state = create_train_state(params, 3e-4, 0)
    step = jax.jit(make_train_step(cfg, constants, 3e-4), donate_argnums=(0,))
    klw = jnp.asarray(kl_weight_vector(cfg, {"default": 0.01}, 1.0))
    for _ in range(3):
        state, metrics, _, _ = step(state, batch, klw, jnp.asarray(0.5), jnp.asarray(0.01))
    jax.block_until_ready(metrics["total_loss"])
    t0 = time.time()
    for _ in range(n):
        state, metrics, _, _ = step(state, batch, klw, jnp.asarray(0.5), jnp.asarray(0.01))
    jax.block_until_ready(metrics["total_loss"])
    return (time.time() - t0) / n, float(metrics["total_loss"])

for name, kw in [("scan_f32", dict(lstm_backend="scan")),
                 ("pallas_f32", dict(lstm_backend="pallas")),
                 ("scan_bf16", dict(lstm_backend="scan", compute_dtype="bfloat16")),
                 ("pallas_bf16", dict(lstm_backend="pallas", compute_dtype="bfloat16"))]:
    cfg = dataclasses.replace(base, **kw)
    try:
        dt, loss = measure(cfg)
        print(json.dumps({"variant": name, "ms_per_step": round(dt*1000,3), "loss": round(loss,3)}))
    except Exception as e:
        print(name, "FAILED:", repr(e)[:300])
