"""Device mesh construction and runtime init.

Replaces the reference's entire distributed story (HF Accelerate wrapping
torch.distributed/NCCL — /root/reference/trainers/utils/base_trainer.py:29-39)
with a named JAX mesh: data parallelism shards the batch over the ``data``
axis, tensor/expert parallelism shards weight matrices over the ``model``
axis. XLA GSPMD inserts the collectives (psum / all-gather / reduce-scatter),
which ride ICI within a slice.
"""

from __future__ import annotations

import os

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SEQ_AXIS = "seq"
STAGE_AXIS = "stage"
MODEL_AXIS = "model"


def runtime_init() -> None:
    """Initialize multi-process JAX if launched under a multi-host runtime.

    Single-process (one host driving 1..N chips) needs no init; multi-host
    TPU pods set the coordinator env vars. Safe to call unconditionally.
    """
    if not os.environ.get("JAX_COORDINATOR_ADDRESS"):
        return
    # Must run BEFORE anything that initializes the XLA backend —
    # jax.process_count()/jax.devices() would, and initialize() then raises
    # "must be called before any JAX calls". Check the coordinator client
    # directly instead (jax has no public "is initialized" predicate).
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is None:
        # coordinator_address auto-detects from JAX_COORDINATOR_ADDRESS, but
        # process count/id only come from cluster plugins (SLURM/GKE) —
        # honor the plain env vars too
        num = os.environ.get("JAX_NUM_PROCESSES")
        pid = os.environ.get("JAX_PROCESS_ID")
        jax.distributed.initialize(
            num_processes=int(num) if num else None,
            process_id=int(pid) if pid else None,
        )


def create_mesh(
    data: int = -1,
    model: int = 1,
    seq: int = 1,
    stage: int = 1,
    devices=None,
) -> Mesh:
    """Create a ``(data, model)`` mesh — growing a ``seq`` axis when
    ``seq > 1`` (sequence/context parallelism: the token dim of activations
    shards over ``seq`` and attention runs the ring kernel,
    ops/ring_attention.py) and a ``stage`` axis when ``stage > 1``
    (pipeline parallelism: scan-stacked layers shard into contiguous
    stages, parallel/pipeline.py). Axis order is
    ``(data, stage, seq, model)`` — stage ring neighbours sit close on ICI.
    ``data=-1`` means "all remaining devices". The mesh always carries the
    ``data`` and ``model`` axes so train steps can be written once and run
    at any dp×tp split."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        if n % (model * seq * stage) != 0:
            raise ValueError(
                f"{n} devices not divisible by "
                f"stage*seq*model={stage * seq * model}"
            )
        data = n // (model * seq * stage)
    if data * model * seq * stage != n:
        raise ValueError(
            f"mesh {data}x{stage}x{seq}x{model} != {n} devices"
        )
    dims = [(DATA_AXIS, data)]
    if stage > 1:
        dims.append((STAGE_AXIS, stage))
    if seq > 1:
        dims.append((SEQ_AXIS, seq))
    dims.append((MODEL_AXIS, model))
    auto = jax.sharding.AxisType.Auto
    n_slices = len({getattr(d, "slice_index", 0) for d in devices})
    if n_slices > 1:
        # Multi-slice pod: jax.make_mesh refuses these topologies outright.
        # Put the data axis over DCN (gradient all-reduce is the only
        # cross-slice collective and it overlaps with backward) and keep
        # model/seq/stage inside a slice so their chatty collectives ride ICI.
        mesh_devices = hybrid_mesh_devices(dims, devices, n_slices)
        return Mesh(
            mesh_devices,
            tuple(a for a, _ in dims),
            axis_types=(auto,) * len(dims),
        )
    # Auto axis types: let GSPMD propagate shardings through reshapes etc.
    return jax.make_mesh(
        tuple(s for _, s in dims), tuple(a for a, _ in dims),
        devices=devices, axis_types=(auto,) * len(dims),
    )


def hybrid_mesh_devices(dims, devices, n_slices: int):
    """Device ndarray for a multi-slice (DCN-connected) pod, shaped to
    ``dims`` (``[(axis_name, size), ...]``).

    The data axis is factored as ``n_slices (DCN) x data//n_slices (ICI)``;
    every other axis lives entirely within a slice, so TP/SP/PP collectives
    (all-gather, ppermute rings, all_to_all) never cross the slow network.
    Delegates the per-slice physical layout to
    ``mesh_utils.create_hybrid_device_mesh`` which orders each slice's
    granule for its ICI topology.
    """
    from jax.experimental import mesh_utils

    sizes = dict(dims)
    data = sizes[DATA_AXIS]
    if data % n_slices != 0:
        raise ValueError(
            f"data={data} must be divisible by the {n_slices} DCN-connected "
            "slices: the data axis is the only one allowed to span DCN "
            "(model/seq/stage collectives must stay on ICI). Use a dp "
            "degree that is a multiple of the slice count."
        )
    ici_shape = tuple(
        s // n_slices if a == DATA_AXIS else s for a, s in dims
    )
    dcn_shape = tuple(n_slices if a == DATA_AXIS else 1 for a, _ in dims)
    return mesh_utils.create_hybrid_device_mesh(
        ici_shape, dcn_shape, devices
    )


def ambient_mesh_if_sharded(axis: str):
    """The mesh of the enclosing ``jax.sharding.set_mesh`` scope, iff its
    ``axis`` is sharded (size > 1) — else None. Trainers set the ambient
    mesh once at construction; model code reads it from the trace context
    to decide whether to dispatch to a sharded kernel (TP/SP attention,
    the GPipe layer pipeline). Standalone model use has no ambient mesh
    and takes the single-chip paths."""
    try:
        mesh = jax.sharding.get_abstract_mesh()
    except Exception:
        return None
    if mesh is None or mesh.empty:
        return None
    if mesh.shape.get(axis, 1) <= 1:
        return None
    return mesh


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
