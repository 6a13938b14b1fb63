"""Simulated multi-host run: TWO real processes joined via jax.distributed on
the CPU backend, each contributing local devices to one global mesh — the
pod-scale capability the reference approximates with per-GPU process spawn +
NCCL (`distributed.py:41-182`).

Each process builds its local batch shard, assembles the global array with
`global_batch_from_local`, runs one jitted data-parallel loss step (implicit
psum), and checks both processes compute the identical global loss."""

import os
import socket
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
proc_id = int(sys.argv[1]); coord = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from slide_tpu.parallel import (maybe_initialize_distributed, world_info,
                                global_batch_from_local, process_allgather)

assert maybe_initialize_distributed(coord, num_processes=2, process_id=proc_id)
rank, world, n_local, n_global = world_info()
assert world == 2 and n_local == 2 and n_global == 4, (rank, world, n_local, n_global)

mesh = Mesh(np.array(jax.devices()).reshape(4), ("data",))
# per-process local shard: rows [2*rank, 2*rank+2) of the global batch
full = np.arange(4 * 8 * 3, dtype=np.float32).reshape(4, 8, 3)
local = {"points": full[2 * rank:2 * rank + 2],
         "label": np.arange(4, dtype=np.int32)[2 * rank:2 * rank + 2],
         "names": ["a", "b"]}
gbatch = global_batch_from_local(mesh, local)
assert gbatch["points"].shape == (4, 8, 3)
assert gbatch["names"] == ["a", "b"]          # host metadata stays local

@jax.jit
def loss_step(pts):
    return jnp.mean(pts ** 2)                 # implicit psum over 'data'

loss = float(loss_step(gbatch["points"]))
expect = float(np.mean(full.astype(np.float64) ** 2))
assert abs(loss - expect) < 1e-3, (loss, expect)

gathered = process_allgather({"rank": np.array([rank])})
assert gathered["rank"].reshape(-1).tolist() == [0, 1]
print(f"OK rank={rank} loss={loss:.6f}", flush=True)
"""


def test_two_process_jax_distributed(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER % {"repo": _REPO})
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen([sys.executable, str(worker), str(i), coord],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              env=env, text=True) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out}"
        assert f"OK rank={i}" in out
