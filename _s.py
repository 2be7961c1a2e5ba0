import sys, time, numpy as np, jax
from ramdsir_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
from ramdsir_tpu.config import TrainConfig
from ramdsir_tpu.train.state import init_state
from ramdsir_tpu.train.steps import make_train_step

remat = "--remat" in sys.argv
cfg = TrainConfig(
    dataset="fundus", ram=True, rec=True, consistency=True,
    consistency_type="kd", image_size=256, domain_idxs=(0, 1, 2),
    test_domain_idx=0, save_path="/tmp/bench", compute_dtype="bfloat16",
    remat=remat,
).resolve()
state, models = init_state(cfg, jax.random.PRNGKey(0))
bsl = [32, 32, 32]
B = 96
step = make_train_step(cfg, models, total_iters=10_000, batch_size_list=bsl, donate=True)
rng = np.random.default_rng(0)
batch = {
    "img": jax.device_put(rng.uniform(0, 255, (B, 256, 256, 3)).astype(np.float32)),
    "donor": jax.device_put(rng.uniform(0, 255, (B, 256, 256, 3)).astype(np.float32)),
    "mask": jax.device_put((rng.uniform(size=(B, 256, 256, 2)) > 0.5).astype(np.float32)),
}
key = jax.random.PRNGKey(1)
def run(n, base):
    global state
    t0 = time.perf_counter()
    for i in range(n):
        state, metrics, _ = step(state, batch, jax.random.fold_in(key, base + i))
    _ = float(np.asarray(jax.device_get(metrics["loss"])))
    return time.perf_counter() - t0
run(3, 0)
t_small = min(run(3, 100), run(3, 200))
t_big = min(run(23, 300), run(23, 400))
per_step = (t_big - t_small) / 20
print(f"batch 96 remat={remat}: {per_step*1000:.1f} ms/step -> {B/per_step:.0f} img/s", flush=True)
