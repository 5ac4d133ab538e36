"""2-process localhost jax.distributed smoke test.

Exercises `parallel/distributed.py`'s torchrun-style env contract
(reference equivalent: /root/reference/util/misc.py:449-487, which
initializes a process group in every multi-GPU run).  Two CPU processes
rendezvous via OCPG_* env vars, form a 4-device global mesh (2 local
devices each), and run a global psum + process_allgather.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
pid = int(sys.argv[1])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["OCPG_COORDINATOR"] = f"127.0.0.1:{sys.argv[2]}"
os.environ["OCPG_NUM_PROCESSES"] = "2"
os.environ["OCPG_PROCESS_ID"] = str(pid)

from ocpg_tpu.parallel.distributed import initialize_distributed, is_main_process

assert initialize_distributed(), "env contract not picked up"

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())
assert is_main_process() == (pid == 0)

from jax.experimental import multihost_utils

ranks = multihost_utils.process_allgather(np.asarray([jax.process_index()]))
assert sorted(ranks.ravel().tolist()) == [0, 1], ranks

mesh = Mesh(np.asarray(jax.devices()), ("data",))
# global (4,) array, one element per global device: value = device index
arr = jax.make_array_from_callback(
    (4,), NamedSharding(mesh, P("data")),
    lambda idx: np.arange(4, dtype=np.float32)[idx])
total = jax.jit(lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P()))(arr)
# fully-addressable replicated result
assert float(total) == 6.0, float(total)
print(f"SMOKE OK rank={pid}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_smoke(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME")}
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    procs = [
        subprocess.Popen([sys.executable, str(script), str(pid), str(port)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed smoke timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out}"
        assert f"SMOKE OK rank={pid}" in out, out
