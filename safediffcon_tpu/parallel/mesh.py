"""Device mesh + sharding utilities.

The reference's only parallelism is HF-Accelerate DDP (NCCL all-reduce,
reference: 2d/default_config.yaml, 1D/model/trainer.py:47-50). The TPU
equivalent: a 1-axis `data` mesh over all chips; batches are sharded on
that axis, parameters are replicated, and XLA inserts the gradient psum
over ICI automatically from the sharding annotations. Models here are
<=100M params so no tensor/pipeline parallelism is needed — DP covers
training, guided sampling, calibration scoring, and solver evaluation
(which replaces the reference's CPU process pools with sharded vmap).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"
FRAME_AXIS = "frames"

# Process-wide active mesh. Production entry points (CLI, pipelines) go
# data-parallel automatically when one is active: batches are sharded over
# it and params replicated, matching the reference's always-on Accelerate
# DDP (reference: 1D/model/trainer.py:47-50, 2d/default_config.yaml).
_ACTIVE_MESH: Optional[Mesh] = None


def activate_mesh(mesh: Optional[Mesh]) -> Optional[Mesh]:
    """Set (or clear, with None) the process-wide mesh; returns previous."""
    global _ACTIVE_MESH
    prev, _ACTIVE_MESH = _ACTIVE_MESH, mesh
    return prev


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


def auto_mesh(min_devices: int = 2, sp: int = 1) -> Optional[Mesh]:
    """Activate a data mesh over all devices when more than one is
    available (the CLI calls this so `pretrain`/`calibrate`/`evaluate` are
    data-parallel on a multi-chip host with no code changes).

    sp > 1 activates a 2-D (data, frames) mesh with that many devices on
    the frame axis — sequence parallelism for the UNet3D's video frame
    dimension (CLI: `--sp N`). Devices not filling dp*sp stay idle."""
    n = jax.device_count()
    if sp > 1 and sp > n:
        raise SystemExit(
            f"--sp {sp} exceeds the {n} visible device(s); sequence "
            f"parallelism needs at least sp devices on the frame axis")
    if n >= min_devices:
        if sp > 1:
            mesh = get_mesh_2d(max(1, n // sp), sp)
        else:
            mesh = get_mesh()
        activate_mesh(mesh)
        return mesh
    return None


def maybe_shard(x, axis: int = 0, mesh: Optional[Mesh] = None,
                video: bool = False):
    """Device-put `x` with its `axis` sharded over the active mesh's data
    axis.

    Falls back to a plain (unsharded) jnp array when no mesh is active or
    the axis length is not divisible by the data-axis size — per-sample
    exactness is preserved either way, sharding is purely a placement
    optimization.

    video=True additionally shards the axis AFTER `axis` (the video frame
    axis of (B, F, H, W, C) batches) over a 2-D mesh's 'frames' axis when
    present and divisible — the smoke pipeline passes this so its UNet3D
    batches go DPxSP under a `--sp` mesh. On a 1-D mesh it is a no-op.
    """
    import jax.numpy as jnp

    mesh = mesh if mesh is not None else _ACTIVE_MESH
    if mesh is None or mesh.devices.size <= 1:
        return jnp.asarray(x)
    dp = mesh.shape.get(DATA_AXIS, 1)
    spec = [None] * x.ndim
    if dp > 1 and x.shape[axis] % dp == 0:
        spec[axis] = DATA_AXIS
    if video and FRAME_AXIS in mesh.axis_names:
        sp_size = mesh.shape[FRAME_AXIS]
        if x.ndim > axis + 1 and x.shape[axis + 1] % sp_size == 0:
            spec[axis + 1] = FRAME_AXIS
    if not any(spec):
        return jnp.asarray(x)
    return jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(*spec)))


def maybe_replicate(tree, mesh: Optional[Mesh] = None):
    """Replicate a pytree over the active mesh (no-op without one)."""
    mesh = mesh if mesh is not None else _ACTIVE_MESH
    if mesh is None or mesh.devices.size <= 1:
        return tree
    return jax.device_put(tree, replicated(mesh))


def get_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first n devices (all by default)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def get_mesh_2d(dp: int, sp: int, devices=None) -> Mesh:
    """2-D (data, frames) mesh: DP over the batch axis x sequence
    parallelism over the video frame axis of the 3D U-Net.

    The reference has no sequence parallelism anywhere (SURVEY §2.5) — its
    longest sequence is 32 frames of full temporal attention. For the
    scaled 2D config (native 128², longer horizons) the frame axis of the
    UNet3D activations is the memory axis worth splitting: activations at
    (B, F, 128, 128, C) dominate HBM, and F survives every down/upsample
    (spatial-only strides, models/unet3d.py). Sharding is pure annotation —
    XLA's SPMD partitioner inserts halo exchanges for the (3,3,3) temporal
    convs and the all-gather for full temporal attention over ICI; no
    hand-written collectives (scaling-book recipe: pick a mesh, annotate,
    let XLA insert collectives).
    """
    if devices is None:
        devices = jax.devices()
    assert dp * sp <= len(devices), (dp, sp, len(devices))
    arr = np.asarray(devices[: dp * sp]).reshape(dp, sp)
    return Mesh(arr, (DATA_AXIS, FRAME_AXIS))


def video_sharding(mesh: Mesh) -> NamedSharding:
    """(B, F, H, W, C) video batch: B over 'data', F over 'frames'.

    On a 1-D data mesh this degrades to plain batch sharding (no frame
    axis in the mesh)."""
    if FRAME_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P(DATA_AXIS, FRAME_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_video(batch, mesh: Mesh):
    """Place a host (B, F, ...) array onto the mesh with batch + frame
    axes sharded (frame axis only if the mesh has one)."""
    return jax.device_put(batch, video_sharding(mesh))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host array onto the mesh, batch axis sharded."""
    return jax.device_put(batch, batch_sharding(mesh))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params, opt state) across the mesh."""
    sharding = replicated(mesh)
    return jax.device_put(tree, sharding)


def pad_to_multiple(batch: np.ndarray, multiple: int):
    """Pad the batch axis up to a multiple (for even sharding); returns
    (padded, real_count)."""
    n = batch.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return batch, n
    pad = np.repeat(batch[-1:], rem, axis=0)
    return np.concatenate([batch, pad], axis=0), n


def init_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize multi-host JAX (ICI within a slice, DCN across hosts).

    The reference's multi-node story was HF Accelerate's launcher; the JAX
    equivalent is jax.distributed.initialize before any backend use. On
    single-host setups this is a no-op. Arguments default to the standard
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars.
    """
    import jax

    if num_processes is not None and int(num_processes) <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        # already initialized or single-process environment
        pass
