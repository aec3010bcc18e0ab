"""Device mesh + sharding helpers.

The reference delegates all distribution to HF accelerate over
torch.distributed (DDP data parallelism only — trainer.py:108-114,
training/utils.py).  The TPU-native equivalent is a single jitted program
over a ``jax.sharding.Mesh``: inputs carry ``P('data')`` shardings, params
are replicated (a ``model`` axis is reserved for tensor parallelism), and
XLA inserts the gradient psums over ICI — there is no explicit allreduce
anywhere in this codebase.

Multi-host: call :func:`maybe_initialize_distributed` first; the mesh then
spans all processes' devices and `jax.make_array_from_process_local_data`
builds the global batch (split_batches=True parity, trainer.py:110).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from image2text_tpu.configs.trainer import MeshConfig


def maybe_initialize_distributed() -> None:
    """jax.distributed.initialize when launched multi-process (no-op
    otherwise); DCN coordination for multi-slice jobs.

    Gate on the ENV VAR only: probing ``jax.process_count()`` first would
    itself initialise the local XLA backend, after which
    ``jax.distributed.initialize`` always raises — the guard must not
    touch any backend-initialising JAX API."""
    import os

    if "JAX_COORDINATOR_ADDRESS" not in os.environ:
        return
    try:
        jax.distributed.initialize()
    except RuntimeError as e:
        if "already" in str(e).lower():
            return  # second call in the same process: fine
        raise


def honor_platform_env() -> None:
    """Re-assert the user's ``JAX_PLATFORMS`` choice.

    Stock jax honors the env var, but a PJRT plugin's site hook can force
    its own platform list at interpreter start (observed: the axon TPU
    plugin pins ``jax_platforms="axon,cpu"``), silently overriding a
    user-exported ``JAX_PLATFORMS=cpu`` — host-side smoke runs then hang
    on a degraded TPU tunnel instead of using the CPU.  Entry points call
    this before any backend-initialising JAX API to restore the env-var
    contract."""
    import os

    env = os.environ.get("JAX_PLATFORMS")
    if env and jax.config.jax_platforms != env:
        jax.config.update("jax_platforms", env)


def make_mesh(config: Optional[MeshConfig] = None, devices=None) -> Mesh:
    devices = list(jax.devices()) if devices is None else list(devices)
    model = config.model if config is not None else 1
    data = config.data if config is not None else -1
    if data == -1:
        assert len(devices) % model == 0
        data = len(devices) // model
    assert data * model == len(devices), (
        f"mesh {data}x{model} does not cover {len(devices)} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Global-batch sharding: leading axis split over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Host arrays → global arrays with the batch split over 'data'.

    Single-host: a sharded device_put.  Multi-host: each process supplies
    its local slice and `make_array_from_process_local_data` assembles the
    global batch (split_batches=True parity, reference trainer.py:110 —
    every host feeds its shard of the global batch)."""
    sh = data_sharding(mesh)
    if jax.process_count() > 1:
        out = tuple(
            jax.make_array_from_process_local_data(sh, np.asarray(a))
            for a in arrays)
    else:
        out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]
