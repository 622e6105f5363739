"""Device-mesh construction — the TPU replacement for the reference's NCCL
process groups (``dist.init_process_group(backend="nccl")`` at
/root/reference/train.py:709 + env-var rendezvous :699-707).

Axes:
- ``data``: batch data parallelism (reference: HF Accelerate DP,
  /root/reference/train.py:491-496);
- ``fsdp``: parameter/optimizer sharding (reference: torch FSDP ZeRO,
  /root/reference/train.py:116-200, DeepSpeed ZeRO-3 config/zero3.json);
  batches are also sharded over this axis (ZeRO semantics: every shard-holder
  is also a data worker);
- ``tensor``: tensor parallelism for attention heads / FFN (capability the
  reference lacks, SURVEY.md §2.3 TP row — designed in from the start).

On a TPU slice the mesh should be laid out so ``tensor`` (highest traffic)
maps to the innermost ICI ring; ``jax.experimental.mesh_utils`` handles the
physical layout. Across slices (DCN), only ``data`` should cross the slice
boundary.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


AXES = ("data", "fsdp", "tensor", "expert")


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host init (replaces MASTER_ADDR/PORT/RANK/WORLD_SIZE rendezvous,
    /root/reference/train.py:699-709). No-op on single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_mesh(data: int = -1, fsdp: int = 1, tensor: int = 1,
              expert: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, fsdp, tensor, expert) mesh. ``data=-1`` absorbs
    remaining devices. The ``expert`` axis (MoE expert parallelism,
    nn/moe.py) defaults to 1 so dense models see the familiar 3-axis layout.
    Uses mesh_utils for ICI-friendly physical layout when possible."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % (fsdp * tensor * expert) == 0, (n, fsdp, tensor, expert)
        data = n // (fsdp * tensor * expert)
    assert data * fsdp * tensor * expert == n, \
        f"mesh {data}x{fsdp}x{tensor}x{expert} != {n} devices"
    try:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_device_mesh((data, fsdp, tensor, expert),
                                                  devices=devices)
    except Exception:
        dev_array = np.asarray(devices).reshape(data, fsdp, tensor, expert)
    return Mesh(dev_array, AXES)


def make_hybrid_mesh(*, dcn_data: int = 1, data: int = -1, fsdp: int = 1,
                     tensor: int = 1) -> Mesh:
    """Multi-slice mesh: ``dcn_data`` replicas of a (data, fsdp, tensor)
    slice mesh, with ONLY the leading data axis crossing the slice boundary
    (gradient all-reduce rides DCN; param all-gather / tensor collectives
    stay on ICI). The data axis of the returned mesh has size
    ``dcn_data * data`` with DCN-major ordering — shardings written for
    make_mesh work unchanged.

    Single-slice (dcn_data=1) falls back to make_mesh, so code paths are
    identical on one slice; multi-slice requires a multi-process runtime
    (initialize_distributed).
    """
    if dcn_data <= 1:
        return make_mesh(data=data, fsdp=fsdp, tensor=tensor)
    from jax.experimental import mesh_utils

    n = len(jax.devices())
    per_slice = n // dcn_data
    if data == -1:
        assert per_slice % (fsdp * tensor) == 0, (per_slice, fsdp, tensor)
        data = per_slice // (fsdp * tensor)
    expert = 1  # MoE expert parallelism stays within a slice; DCN is data-only
    # granule = TPU slice when the runtime exposes dcn_data distinct
    # slice_index values (real multi-slice); otherwise processes (CPU /
    # forced backends, where every device reports slice 0 — e.g. the
    # two-process test)
    devs = jax.devices()
    slice_ids = {getattr(d, "slice_index", None) for d in devs}
    use_slices = None not in slice_ids and len(slice_ids) == dcn_data
    dev_array = mesh_utils.create_hybrid_device_mesh(
        (data, fsdp, tensor, expert), (dcn_data, 1, 1, 1),
        process_is_granule=not use_slices)
    # fold the DCN replica axis into data: (dcn, data, fsdp, tensor, expert)
    # -> (dcn*data, fsdp, tensor, expert)
    dev_array = dev_array.reshape(dcn_data * data, fsdp, tensor, expert)
    return Mesh(dev_array, AXES)
