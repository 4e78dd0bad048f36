"""Multi-host bring-up: process groups, global meshes, and control-plane
broadcast for SPMD serving.

The reference is single-GPU with no distributed backend (SURVEY.md §2.5); here
multi-host runs are first-class:

- every host runs the SAME jitted SPMD step over a global ("dp","tp") mesh
  (collectives ride ICI within a slice, DCN across slices — XLA picks from
  the mesh device order);
- the scheduler runs on process 0 only, and each step's packed batch buffer
  (worker/batch_builder.pack_step_batch — already ONE flat i32 array) is
  broadcast to all hosts so every process enters the same program with the
  same shapes and metadata.

Single-process use is the degenerate case: ``initialize()`` is a no-op
without a coordinator, and ``broadcast_step`` is the identity.
"""

from __future__ import annotations

import os

import numpy as np

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bring up the JAX process group (jax.distributed.initialize wrapper).

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID); on single-host TPU VMs with no
    coordinator configured this is a no-op.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None:
        return   # single-process run
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)


def is_primary() -> bool:
    """True on the process that runs the control plane (scheduler/API)."""
    return jax.process_index() == 0


def global_mesh(dp_size: int, tp_size: int):
    """A ("dp","tp") mesh over ALL processes' devices.

    Device order follows jax.devices() (globally consistent), so tp groups
    land on physically adjacent chips (ICI) and dp splits across hosts (DCN)
    when dp_size is a multiple of the process count.
    """
    from swiftllm_tpu.parallel.mesh import make_mesh
    return make_mesh(dp_size, tp_size, devices=jax.devices())


def broadcast_step(flat_batch: np.ndarray | None, bucket_key=None):
    """Broadcast process 0's packed step batch (+ bucket key) to every host.

    Non-primary processes pass flat_batch=None and receive process 0's data.
    Single-process: returns the inputs unchanged. The bucket key rides along
    as a small i32 vector so every host compiles/executes the same program.
    """
    if jax.process_count() == 1:
        return flat_batch, bucket_key
    from jax.experimental import multihost_utils

    key_arr = (np.asarray(list(bucket_key), np.int32)
               if bucket_key is not None else np.zeros(4, np.int32))
    if flat_batch is None:
        flat_batch = np.zeros(0, np.int32)   # shape agreed out-of-band below
    # Broadcast the bucket key first (fixed shape), then the batch (its length
    # is derivable from the key on every host).
    key_arr = multihost_utils.broadcast_one_to_all(key_arr)
    from swiftllm_tpu.worker.batch_builder import BucketKey
    bkey = BucketKey(*[int(x) for x in key_arr])
    n = 4 * bkey.tokens + 9 * bkey.rows + bkey.rows * bkey.pages
    if flat_batch.shape[0] != n:
        flat_batch = np.zeros(n, np.int32)
    flat_batch = multihost_utils.broadcast_one_to_all(flat_batch)
    return np.asarray(flat_batch), bkey
