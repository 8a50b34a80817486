"""True multi-process `jax.distributed` smoke test (VERDICT r2 item #7).

Spawns TWO real CPU processes wired through a coordinator, exercising the
non-trivial branch of ``parallel.distributed.initialize`` (never executed
by the in-process suite): both must see ``process_count() == 2``, agree on
``host_shard`` assignments, complete a cross-process ``psum``, and pass a
``barrier``.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = """
import os, sys
sys.path.insert(0, {root!r})
import jax
from decode_tonal_langauge_tpu.parallel import distributed

active = distributed.initialize(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(os.environ["PROC_ID"]),
)
assert active, "initialize() returned False under a 2-process launch"
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == int(os.environ["PROC_ID"])

# host_shard: deterministic round-robin, no communication
mine = distributed.host_shard(["s0", "s1", "s2", "s3", "s4"])
expect = ["s0", "s2", "s4"] if jax.process_index() == 0 else ["s1", "s3"]
assert mine == expect, (mine, expect)

# a real cross-process collective over the global mesh
import jax.numpy as jnp
from jax.experimental import multihost_utils
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = distributed.global_mesh(("data",))
assert mesh.devices.size == jax.device_count()
local = jnp.ones((jax.local_device_count(),), jnp.float32)
glob = multihost_utils.host_local_array_to_global_array(local, mesh, P("data"))
total = jax.jit(
    lambda v: v.sum(), out_shardings=NamedSharding(mesh, P())
)(glob)
assert float(total) == jax.device_count(), total

distributed.barrier("smoke")
print("WORKER_OK", jax.process_index())
"""


def _run_two_process_smoke(repo_root):
    """One attempt: returns (outs, timed_out). The free-port pattern has
    an inherent race (the port is released before the coordinator binds
    it) and a loaded host can starve the rendezvous — callers retry."""
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    coord = f"127.0.0.1:{port}"

    # Child env: force a clean 1-virtual-CPU-device backend per process
    # (strip the axon injection vectors, as the proven dryrun recipe).
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS")
    }
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["COORD"] = coord

    code = _WORKER.format(root=repo_root)
    procs = []
    for pid in (0, 1):
        penv = dict(env, PROC_ID=str(pid))
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", code],
                env=penv,
                cwd=repo_root,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )

    outs = []
    for p in procs:
        try:
            # Generous: under a loaded host (parallel test workers, bench
            # jobs) process startup + compile can take minutes.
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            return None, True
        outs.append((p.returncode, out, err))
    return outs, False


def test_two_process_initialize_and_collective(tmp_path):
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    last = None
    for attempt in range(2):
        outs, timed_out = _run_two_process_smoke(repo_root)
        if timed_out:
            last = "timed out (coordinator hang?)"
            continue
        if all(rc == 0 for rc, _, _ in outs):
            break
        last = "\n".join(
            f"worker rc={rc}:\n{out}\n{err}" for rc, out, err in outs
        )
    else:
        pytest.fail(f"2-process smoke failed twice; last: {last}")

    assert "WORKER_OK 0" in outs[0][1] + outs[1][1]
    assert "WORKER_OK 1" in outs[0][1] + outs[1][1]
