"""Multi-host initialization: two coordinated CPU processes form one global
mesh and run a cross-process collective.

Exercises `parallel/mesh.py::init_distributed` — the JAX equivalent of the
reference's multi-node HF-Accelerate launcher (SURVEY.md §2.5; reference:
2d/default_config.yaml). Each worker subprocess calls init_distributed with
a localhost coordinator, builds the global data mesh over both processes'
CPU devices, and psums a sharded array; the test asserts both workers see
process_count == 2 and the correct global sum.
"""
import os
import socket
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# env vars that activate the axon TPU plugin via sitecustomize
_TPU_ENV = (
    "PALLAS_AXON_POOL_IPS", "AXON_POOL_SVC_OVERRIDE", "AXON_LOOPBACK_RELAY",
    "PALLAS_AXON_REMOTE_COMPILE", "PALLAS_AXON_TPU_GEN", "TPU_WORKER_HOSTNAMES",
)

_WORKER = r"""
import sys
sys.path.insert(0, sys.argv[1])
coord, pid = sys.argv[2], int(sys.argv[3])

from safediffcon_tpu.parallel.mesh import init_distributed
init_distributed(coordinator_address=coord, num_processes=2, process_id=pid)

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from safediffcon_tpu.parallel.mesh import get_mesh, DATA_AXIS

assert jax.process_count() == 2, jax.process_count()
assert jax.default_backend() == "cpu", jax.default_backend()

mesh = get_mesh()  # global mesh over both processes' devices
n = len(jax.devices())
assert n == 4, n  # 2 local CPU devices x 2 processes

# global array sharded over the data axis: each process contributes its
# local shard; psum must see all of it.
sharding = NamedSharding(mesh, P(DATA_AXIS))
local = jnp.arange(2, dtype=jnp.float32) + 2 * pid  # process 0: [0,1]; 1: [2,3]
garr = jax.make_array_from_process_local_data(sharding, local, (4,))

total = jax.jit(
    lambda x: jnp.sum(x) * jnp.ones(()),
    in_shardings=sharding, out_shardings=NamedSharding(mesh, P()),
)(garr)
assert float(total) == 6.0, float(total)
print(f"WORKER{pid} OK", flush=True)
"""


def test_two_process_init_and_collective():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"

    env = dict(os.environ)
    for k in _TPU_ENV:
        env.pop(k, None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, _REPO, coord, str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=300)
        outs.append(out)
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
    assert "WORKER0 OK" in outs[0]
    assert "WORKER1 OK" in outs[1]


def test_single_process_is_noop():
    # num_processes <= 1 returns without touching jax.distributed
    from safediffcon_tpu.parallel.mesh import init_distributed
    init_distributed(coordinator_address="localhost:1", num_processes=1,
                     process_id=0)
