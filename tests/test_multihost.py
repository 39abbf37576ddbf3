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


# Full-production-path worker: runs Trainer.fit (per-process data sharding,
# process-0 checkpoint writes, validation on a cadence) instead of a
# hand-rolled step. argv: idx nproc port config_path log_dir local_devices
# [model_parallel]
FIT_WORKER = r"""
import os, sys
idx, nproc = int(sys.argv[1]), int(sys.argv[2])
port, cfg_path, log_dir, local_devices = sys.argv[3:7]
model_parallel = int(sys.argv[7]) if len(sys.argv) > 7 else 1
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={local_devices}"
)
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_compilation_cache_dir", r"%(repo)s/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:
    pass
if nproc > 1:
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=idx,
    )
sys.path.insert(0, r"%(repo)s")
from pathlib import Path
from fastspeech2_lightning_tpu.config import FastSpeech2Config
from fastspeech2_lightning_tpu.training.loop import Trainer

config = FastSpeech2Config.load_config_from_path(Path(cfg_path))
trainer = Trainer(config, log_dir=Path(log_dir), model_parallel=model_parallel)
state = trainer.fit(max_steps=4, resume=False)
print(f"FITDONE {idx} {int(state.step)}", flush=True)
if nproc > 1:
    jax.distributed.shutdown()
"""


def _fit_and_compare(tmp_path, model_parallel: int, rtol: float, atol: float):
    """Shared body: a two-process Trainer.fit (4 virtual CPU devices each)
    must produce the same final checkpoint as a single-process fit over the
    identical 8-device mesh — per-process batch slices + GSPMD collectives
    == global-batch execution."""
    import sys as _sys

    _sys.path.insert(0, str(REPO / "tests"))
    from helpers import make_training_workspace

    make_training_workspace(
        tmp_path,
        n_utts=8,
        batch_size=8,
        val_check_interval=2,
        prefetch_batches=0,
    )
    cfg_path = tmp_path / "config.yaml"
    script = tmp_path / "fit_worker.py"
    script.write_text(FIT_WORKER % {"repo": str(REPO)})
    port = _free_port()

    def run(procs_spec):
        procs = [
            subprocess.Popen(
                [
                    sys.executable, str(script), str(i), str(n), str(port),
                    str(cfg_path), str(tmp_path / f"logs_{tag}"),
                    str(local_devices), str(model_parallel),
                ],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                cwd=str(tmp_path),
            )
            for (i, n, tag, local_devices) in procs_spec
        ]
        for p in procs:
            try:
                out, err = p.communicate(timeout=900)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                pytest.fail("fit worker timed out")
            assert p.returncode == 0, f"fit worker failed:\n{err[-6000:]}"
            assert "FITDONE" in out, out

    run([(0, 2, "multi", 4), (1, 2, "multi", 4)])
    run([(0, 1, "single", 8)])

    from fastspeech2_lightning_tpu.training.checkpoint import load_checkpoint

    def final_ckpt(tag):
        ckpts = sorted(
            (tmp_path / f"logs_{tag}" / "checkpoints").glob("step=*"),
            key=lambda p: int(p.name.split("=")[1]),
        )
        assert ckpts, f"no checkpoints under logs_{tag}"
        return ckpts[-1]

    import numpy as np

    multi_path, single_path = final_ckpt("multi"), final_ckpt("single")
    assert multi_path.name == single_path.name == "step=4"
    meta_m, arrays_m = load_checkpoint(multi_path)
    meta_s, arrays_s = load_checkpoint(single_path)
    flat_m = jax_flat(arrays_m["params"])
    flat_s = jax_flat(arrays_s["params"])
    assert flat_m.keys() == flat_s.keys()
    for k in flat_m:
        np.testing.assert_allclose(
            flat_m[k], flat_s[k], rtol=rtol, atol=atol, err_msg=k
        )


@pytest.mark.slow
def test_two_process_trainer_fit_matches_single_process(tmp_path):
    """`fs2t train --distributed` production path, data-parallel mesh."""
    _fit_and_compare(tmp_path, model_parallel=1, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_two_process_tensor_parallel_fit_matches_single_process(tmp_path):
    """Two-process TENSOR-PARALLEL fit (round-4 verdict, weak #5): mesh
    data=4 x model=2 over 8 devices, the model axis spanning device pairs
    inside each process. Both runs execute the same GSPMD partitioning
    (only the process boundary differs), so the checkpoints must agree to
    float-accumulation tolerance, not the looser TP-vs-single-device one."""
    _fit_and_compare(tmp_path, model_parallel=2, rtol=1e-4, atol=1e-5)


def jax_flat(tree) -> dict:
    import jax

    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {
        "/".join(str(getattr(p, "key", p)) for p in path): leaf
        for path, leaf in flat
    }


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
