"""Two-process jax.distributed smoke test (multi-host GSPMD codepath).

The reference's multi-node story is Lightning DDP; ours is
`jax.distributed.initialize()` + one global mesh (SURVEY.md §2.4 / §5.8).
Nothing in a single-process test exercises the cross-process coordination
(gRPC coordinator, global device enumeration, host-local -> global array
assembly), so this test spawns TWO real processes on localhost, each
owning 4 virtual CPU devices of an 8-device data mesh, and runs ONE
jitted train step of the tiny model end to end. Both processes must agree
on the (finite) loss — the same init path `fs2t train --distributed` uses.
"""

import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

WORKER = r"""
import os, sys
idx = int(sys.argv[1]); port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
try:
    # share the repo's persistent compile cache so repeat runs skip the
    # (CPU-slow) XLA compile of the distributed train step
    jax.config.update("jax_compilation_cache_dir", r"%(repo)s/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:
    pass
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=idx
)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8 and jax.local_device_count() == 4

import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental import multihost_utils

sys.path.insert(0, r"%(repo)s")
sys.path.insert(0, r"%(repo)s/tests")
from helpers import synthetic_batch, tiny_config, tiny_stats
from fastspeech2_lightning_tpu.models import FastSpeech2
from fastspeech2_lightning_tpu.training.state import create_train_state
from fastspeech2_lightning_tpu.training.step import make_train_step

cfg = tiny_config(learn_alignment=False)
model = FastSpeech2(
    config=cfg, stats=tiny_stats(), n_symbols=30, n_speakers=1, n_languages=1
)
rng = np.random.default_rng(0)
full = synthetic_batch(rng, B=8, L=16, T=32, learn_alignment=False)
local = {k: v[idx * 4 : (idx + 1) * 4] for k, v in full.items()}

mesh = Mesh(np.array(jax.devices()).reshape(8, 1), ("data", "model"))

def to_global(tree, spec):
    return jax.tree_util.tree_map(
        lambda x: multihost_utils.host_local_array_to_global_array(
            x, mesh, spec
        ),
        tree,
    )

# identical init on both processes (same seed) -> replicated placement
state = create_train_state(cfg, model, jax.random.PRNGKey(0), full)
state = state.replace(
    params=to_global(state.params, P()),
    opt_state=to_global(state.opt_state, P()),
    batch_stats=to_global(state.batch_stats, P())
    if state.batch_stats is not None else None,
    constants=to_global(state.constants, P())
    if state.constants is not None else None,
    step=multihost_utils.host_local_array_to_global_array(
        np.asarray(state.step), mesh, P()
    ),
)
gbatch = to_global(local, P("data"))

train_step = make_train_step(cfg, model)
with mesh:
    # AOT-compile, then hold both processes at a coordination-service
    # barrier before the first collective executes. Without this, a
    # compile-time skew (cold cache, loaded host) lets the fast process
    # start Gloo context init while the slow one is still compiling, and
    # Gloo's 30 s key-value rendezvous times out — an environment flake,
    # not a code failure.
    compiled = train_step.lower(state, gbatch, jax.random.PRNGKey(1), 0).compile()
    from jax._src import distributed as _dist
    _dist.global_state.client.wait_at_barrier("fs2t_compiled", 600_000)
    new_state, losses = compiled(state, gbatch, jax.random.PRNGKey(1), 0)
total = float(np.asarray(losses["total"].addressable_data(0)))
assert np.isfinite(total), total
print(f"LOSS {idx} {total:.6f}", flush=True)
jax.distributed.shutdown()
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_train_step(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER % {"repo": str(REPO)})
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            cwd=str(tmp_path),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        outs.append(out)
    losses = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("LOSS "):
                _, idx, val = line.split()
                losses[int(idx)] = float(val)
    assert set(losses) == {0, 1}, outs
    assert abs(losses[0] - losses[1]) < 1e-6, losses
