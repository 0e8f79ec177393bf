"""Device mesh + sharding rules (the reference's entire distributed substrate).

The reference scales with DDP over NCCL only (SURVEY.md §2.5,
`apis/train.py:226-230`). TPU-native replacement: a `jax.sharding.Mesh`
with two axes:

  * 'data'  — batch-dim data parallelism (== the reference's DDP). Gradient
    allreduce / SyncBN / eval-gather all become XLA-inserted collectives.
  * 'seq'   — "sequence"-parallel axis: the ray dimension of the rendering
    workload (rays are embarrassingly parallel given replicated voxel grids,
    SURVEY.md §5 long-context) and, at scale, the camera dimension.

Parameters are replicated (the model is ~100 M params; no TP/PP needed,
matching the reference's design point).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_seq: int = 1,
    devices=None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n_total = len(devices)
    if n_data is None:
        n_data = n_total // n_seq
    assert n_data * n_seq == n_total, (n_data, n_seq, n_total)
    arr = np.asarray(devices).reshape(n_data, n_seq)
    return Mesh(arr, axis_names=("data", "seq"))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_shardings(mesh: Mesh, batch: Dict) -> Dict:
    """Per-array NamedShardings: dim 0 over 'data'; the ray dim additionally
    over 'seq' when divisible."""
    n_seq = mesh.shape["seq"]
    out = {}
    for k, v in batch.items():
        if k == "rays" and v.ndim >= 2 and v.shape[1] % n_seq == 0 and n_seq > 1:
            out[k] = NamedSharding(mesh, P("data", "seq"))
        else:
            out[k] = NamedSharding(mesh, P("data"))
    return out


def shard_batch(mesh: Mesh, batch: Dict) -> Dict:
    """Place a host batch onto the mesh with the standard shardings.

    Single-process: a plain device_put. Multi-host: each process holds only
    its rank's slice of the global batch (see `data.loader.DataLoader`
    process striding); `make_array_from_process_local_data` assembles the
    global sharded arrays — the jax analog of the reference's
    DistributedSampler feeding DDP (`apis/train.py:207-230`)."""
    sh = batch_shardings(mesh, batch)
    if jax.process_count() > 1:
        return {
            k: jax.make_array_from_process_local_data(sh[k], np.asarray(v))
            for k, v in batch.items()
        }
    return {k: jax.device_put(v, sh[k]) for k, v in batch.items()}
