"""Multi-host (multi-process) runtime: DCN data parallelism over hosts,
ICI tensor parallelism within each host.

The reference has no distributed code at all (SURVEY.md §2.3); this is
the TPU-native multi-host layer the north star asks for ("head-sharded
multi-host v5e serving", ">=85% tokens/s scaling at 2+ hosts"):

  * ``initialize_distributed`` — one call per process wraps
    ``jax.distributed.initialize``; on TPU pods the coordinator/count/id
    are auto-detected from the TPU environment, elsewhere (GCE VMs, the
    CPU dry-run) they are passed explicitly.
  * ``make_multihost_mesh`` — a (data, model) mesh over the GLOBAL device
    list where the model axis never crosses a process boundary: JAX
    orders devices process-major, so rows of the (data, model) reshape
    stay inside one host's ICI domain and the data axis is what rides
    DCN.  Collectives are then inserted by GSPMD exactly as in the
    single-host case — the model-parallel all-reduces stay on ICI, only
    the data-parallel gradient all-reduce crosses hosts.
  * ``local_batch_to_global`` — per-process input feeding: every process
    builds only its own rows and ``jax.make_array_from_process_local_data``
    assembles the global sharded batch (a plain ``jnp.asarray`` of a full
    batch is invalid under multi-process JAX: a process can only address
    its local shard).
  * ``run_multiprocess_cpu_dryrun`` — spawns N real OS processes on one
    machine, each with its own virtual CPU devices and a shared
    coordinator, and runs sharded training steps with per-process
    feeding.  This validates the multi-host CODE PATH (device order,
    global-array assembly, cross-process collectives via gloo) without
    TPU pod hardware.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bootstrap multi-process JAX.  Call ONCE, before any device use.

    With all arguments None, relies on auto-detection (TPU pod metadata /
    cluster env vars).  Safe to call in a single-process run with
    ``num_processes=1`` — it becomes a no-op.
    """
    if num_processes == 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_multihost_mesh(
    model_parallel: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """(data, model) mesh over all processes' devices.

    The model axis is capped at the per-process device count so TP
    collectives never cross DCN; the data axis spans the rest (including
    all cross-process parallelism).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    local = jax.local_device_count()
    if model_parallel is None:
        model_parallel = min(local, 8)
        while local % model_parallel:
            model_parallel -= 1
    assert model_parallel <= local, (
        f"model_parallel={model_parallel} would cross process boundaries "
        f"(local devices: {local}); shard the model over ICI, not DCN")
    assert local % model_parallel == 0 and n % model_parallel == 0
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def local_batch_to_global(mesh: Mesh, local_batch: np.ndarray,
                          batch_axis: int = 0) -> jax.Array:
    """Assemble a data-sharded global array from per-process local rows.

    ``local_batch`` holds THIS process's rows only; its batch dim times
    the process count must equal the global batch.  The returned array is
    sharded P(..., data, ...) over ``mesh`` with no cross-host copies.
    """
    spec = [None] * local_batch.ndim
    spec[batch_axis] = DATA_AXIS
    sharding = NamedSharding(mesh, P(*spec))
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_batch))


def process_local_rows(global_rows: int) -> int:
    """Rows this process must feed for a ``global_rows`` global batch."""
    n = jax.process_count()
    assert global_rows % n == 0, (
        f"global batch {global_rows} not divisible by {n} processes")
    return global_rows // n


# ---------------------------------------------------------------------------
# multi-process CPU dry-run (one machine, N OS processes)
# ---------------------------------------------------------------------------

_WORKER_FLAG = "FCSA_MP_WORKER"


def _worker_main() -> None:
    """Subprocess body: sharded train steps with per-process feeding."""
    cfg = json.loads(os.environ[_WORKER_FLAG])
    initialize_distributed(
        coordinator_address=cfg["coordinator"],
        num_processes=cfg["num_processes"],
        process_id=cfg["process_id"],
    )
    import jax.numpy as jnp
    import optax

    from ..models import CosineSimCausalTransformer
    from . import make_sharded_train_step, shard_opt_state, shard_params

    mesh = make_multihost_mesh(model_parallel=cfg["model_parallel"])
    data_par = mesh.shape[DATA_AXIS]

    seq = cfg["seq_len"]
    global_batch = max(2, data_par)
    model = CosineSimCausalTransformer(
        num_tokens=256, dim=cfg["dim"], depth=cfg["depth"],
        max_seq_len=seq, heads=8, dim_head=cfg["dim"] // 8,
        attn_scale=1.0, pre_norm=True, dtype=jnp.float32, mesh=mesh)

    # init from a replicated dummy batch (same on every process), then
    # shard; training batches are fed per-process
    rng = jax.random.PRNGKey(0)
    dummy = jax.random.randint(rng, (global_batch, seq + 1), 0, 256)
    params = shard_params(model.init(rng, dummy, return_loss=True), mesh)
    tx = optax.chain(optax.clip_by_global_norm(0.5), optax.adam(2e-4))
    opt_state = shard_opt_state(tx, tx.init(params), params, mesh)
    step = make_sharded_train_step(model, tx, mesh)

    local_rows = process_local_rows(global_batch)
    np_rng = np.random.default_rng(1000 + cfg["process_id"])
    for i in range(cfg["steps"]):
        local = np_rng.integers(
            0, 256, (local_rows, seq + 1)).astype(np.int32)
        batch = local_batch_to_global(mesh, local)
        params, opt_state, loss = step(params, opt_state, batch)
    loss = float(loss)
    assert np.isfinite(loss), f"non-finite loss {loss}"
    # machine-parseable line for the launcher; loss is replicated, so all
    # processes must agree on it (a cross-process consistency check)
    print(f"FCSA_MP_RESULT process={cfg['process_id']} "
          f"mesh=(data={data_par},model={mesh.shape[MODEL_AXIS]}) "
          f"global_devices={len(jax.devices())} loss={loss:.6f}",
          flush=True)


def run_multiprocess_cpu_dryrun(
    num_processes: int = 2,
    devices_per_process: int = 4,
    model_parallel: Optional[int] = None,
    steps: int = 2,
    seq_len: int = 128,
    dim: int = 64,
    depth: int = 2,
    port: int = 12687,
    timeout: float = 300.0,
) -> dict:
    """Spawn the N-process CPU dry-run; returns {process_id: loss}.

    Raises on any subprocess failure or cross-process loss mismatch.
    """
    if model_parallel is None:
        model_parallel = devices_per_process
    env_base = dict(os.environ)
    # clean interpreters: the sandbox sitecustomize pins a tunneled TPU
    # backend via PYTHONPATH; workers must come up as pure CPU
    env_base.pop("PYTHONPATH", None)
    env_base["JAX_PLATFORMS"] = "cpu"
    env_base["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_process}")

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    procs = []
    for pid in range(num_processes):
        env = dict(env_base)
        env[_WORKER_FLAG] = json.dumps({
            "coordinator": f"localhost:{port}",
            "num_processes": num_processes,
            "process_id": pid,
            "model_parallel": model_parallel,
            "steps": steps,
            "seq_len": seq_len,
            "dim": dim,
            "depth": depth,
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c",
             "import sys; sys.path.insert(0, sys.argv[1]); "
             "from flash_cosine_sim_attention_tpu.parallel.distributed "
             "import _worker_main; _worker_main()",
             repo_root],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env))

    results = {}
    outputs = []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise RuntimeError(
                f"multi-process dryrun: process {pid} timed out")
        outputs.append(out)
        if p.returncode != 0:
            raise RuntimeError(
                f"multi-process dryrun: process {pid} failed "
                f"(rc={p.returncode}):\n{out[-2000:]}")
        for line in out.splitlines():
            if line.startswith("FCSA_MP_RESULT"):
                results[pid] = float(line.rsplit("loss=", 1)[1])
    if len(results) != num_processes:
        raise RuntimeError(
            f"multi-process dryrun: expected {num_processes} results, got "
            f"{sorted(results)}:\n" + "\n".join(o[-500:] for o in outputs))
    losses = list(results.values())
    assert max(losses) - min(losses) < 1e-6, (
        f"replicated loss diverged across processes: {results}")
    return results
