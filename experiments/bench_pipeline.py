"""1D Burgers control-eval pipeline throughput (BASELINE.json metric #2):
episodes/min for the fused (guided sample -> FD solver rollout -> metrics)
evaluation program, plus calibration throughput.

The reference evaluates each batch with a host-driven 200-step DDIM loop
plus a 10,000-step host-driven einsum solver (1D/utils/metrics.py:42-65);
here the whole thing is one XLA program.
"""
import time, json
import numpy as np, jax, jax.numpy as jnp

from safediffcon_tpu.tasks.burgers.config import BurgersConformalConfig
from safediffcon_tpu.tasks.burgers.data import BurgersDataset, generate_burgers_dataset
from safediffcon_tpu.tasks.burgers import pipeline as P

def main():
    generate_burgers_dataset("/tmp/bench_pipe.npz", n_train=4, n_cal=1000, n_test=50)
    cal = BurgersDataset.load("/tmp/bench_pipe.npz", "cal")
    test = BurgersDataset.load("/tmp/bench_pipe.npz", "test")
    conf = BurgersConformalConfig(w_score=500.0)
    pipe = P.BurgersPipeline(conf, dim=128, compute_dtype="bfloat16")
    params = P.init_params(pipe.model, jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)

    # warm up / compile
    m = pipe.evaluate(params, test, jnp.zeros(()), rng)  # evaluate() floats -> blocks
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        m = pipe.evaluate(params, test, jnp.zeros(()), jax.random.PRNGKey(i))
    dt = (time.perf_counter() - t0) / reps
    episodes_per_min = 50 / dt * 60.0

    float(pipe.calibrate(params, cal.data, jnp.zeros(()), rng))  # compile+block
    t0 = time.perf_counter()
    Q = float(pipe.calibrate(params, cal.data, jnp.zeros(()), jax.random.PRNGKey(9)))
    cal_s = time.perf_counter() - t0

    print(json.dumps({
        "eval_episodes_per_min": round(episodes_per_min, 1),
        "eval_batch50_seconds": round(dt, 2),
        "calibration_1000_samples_seconds": round(cal_s, 2),
    }))

if __name__ == "__main__":
    main()
