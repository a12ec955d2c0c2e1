"""Device mesh + sharding layer — the distributed backend the reference never
had (SURVEY.md §2.3: single-process, single-device; no NCCL/MPI anywhere).

TPU-native design:
* one logical mesh with axes ``('data', 'space'[, 'model'])`` over ICI.
  Batches shard over ``data``; optionally the image H dimension shards over
  ``space`` (XLA's SPMD partitioner inserts the halo exchanges for the 3×3
  convs automatically — the TPU analog of the reference's "spatial tiling is
  done offline in Patch.py" scale story); optionally conv output channels +
  optimizer moments shard over ``model`` (tensor parallel,
  :func:`tp_sharding_tree`).
* gradients/EMA are NOT manually all-reduced: the train step is jitted with
  replicated state sharding and batch-sharded data, so XLA emits the psum
  over ICI itself (the "let-the-compiler-insert-collectives" recipe).
* multi-host entry via ``jax.distributed.initialize`` (no-op single-host).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(**kw) -> None:
    """Multi-host bring-up (`jax.distributed.initialize`).

    No-op only in the two genuinely benign cases: nothing configured
    (single-host run, no coordinator given by args or env) and "already
    initialized". Real misconfigurations (bad coordinator address, wrong
    process count, ...) PROPAGATE — round 1 swallowed them silently."""
    import os

    env_configured = any(
        os.environ.get(k)
        for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS")
    )
    if not kw and not env_configured:
        return  # single-host: nothing to bring up
    try:
        jax.distributed.initialize(**kw)
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            return
        raise


def make_mesh(
    data: Optional[int] = None,
    space: int = 1,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'space'[, 'model']) mesh. Default: all devices on
    the data axis. ``model > 1`` adds a tensor-parallel axis (conv channels
    shard over it — see :func:`tp_sharding_tree`)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // (space * model)
    if data * space * model != n:
        raise ValueError(f"mesh {data}x{space}x{model} != {n} devices")
    if model == 1:
        return Mesh(np.asarray(devices).reshape(data, space),
                    axis_names=("data", "space"))
    return Mesh(np.asarray(devices).reshape(data, space, model),
                axis_names=("data", "space", "model"))


def make_mesh_for_batch(batch_size: int, space: int = 1, model: int = 1,
                        devices: Optional[Sequence] = None) -> Mesh:
    """Mesh whose data axis is the largest device count that divides the
    global batch (a 17M-param model never needs more than DP; leftover
    devices idle rather than fail)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices) // (space * model)
    data = 1
    for d in range(n, 0, -1):
        if batch_size % d == 0:
            data = d
            break
    return make_mesh(data=data, space=space, model=model,
                     devices=devices[: data * space * model])


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, spatial: bool = False):
    """Place a pytree of (B, ...) host arrays onto the mesh, batch-sharded.

    Single-process: plain device_put with a NamedSharding. Multi-process:
    each process passes its PROCESS-LOCAL slice of the global batch (the
    loader shards files by process — see data/loader.py) and the global
    array is assembled via ``jax.make_array_from_process_local_data``."""
    multiprocess = jax.process_count() > 1

    def put(x):
        x = np.asarray(x)
        spec = ["data"] + [None] * (x.ndim - 1)
        if spatial and x.ndim >= 3 and mesh.shape.get("space", 1) > 1:
            spec[1] = "space"
        sharding = NamedSharding(mesh, P(*spec))
        if multiprocess:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def shard_predict_batch(predict_batch, mesh: Mesh):
    """Device-parallel tile inference: place each (cond, noise) tile batch
    batch-sharded over the mesh's 'data' axis before the jitted sampler
    runs — XLA's SPMD partitioner splits the whole fused DDIM scan N-way
    (params are closed-over constants → replicated). Used by
    eval/scene.infer_scene via `infer_scene --mesh_data N` so one big
    scene's tiles run on all devices at once."""
    bshard = NamedSharding(mesh, P("data"))
    data = mesh.shape["data"]

    def wrapped(cond_b, noise_b):
        if cond_b.shape[0] % data:
            raise ValueError(
                f"tile batch {cond_b.shape[0]} not divisible by mesh data={data}"
            )
        return predict_batch(jax.device_put(cond_b, bshard),
                             jax.device_put(noise_b, bshard))

    return wrapped


def tp_sharding_tree(tree, mesh: Mesh, axis: str = "model"):
    """NamedSharding pytree for tensor parallelism: every array leaf whose
    last dimension divides the mesh's ``model`` size shards that dimension
    over it; everything else replicates.

    For the UNet this is channel parallelism: conv kernels (kh,kw,cin,cout)
    and their biases split cout N-way, so each device holds and computes
    1/N of every feature map's channels. GSPMD keeps the program correct
    for ANY annotation — it inserts the activation all-gathers where a
    consumer needs full channels — so one uniform rule covers params, EMA
    and the AdamW mu/nu tree (which mirrors params). Applied to a
    TrainState it also leaves scalars (step, skip counter) replicated."""
    m = mesh.shape.get(axis, 1)

    def spec(x):
        if (hasattr(x, "ndim") and x.ndim >= 1 and x.shape[-1] >= m > 1
                and x.shape[-1] % m == 0):
            return NamedSharding(mesh, P(*([None] * (x.ndim - 1) + [axis])))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, tree)


def shard_train_step(step_fn, mesh: Mesh, spatial: bool = False,
                     state_template=None):
    """jit a ``step(state, batch, key)`` with data-sharded batch; XLA
    inserts the grad psum over ICI. State is replicated by default; on a
    mesh with a ``model`` axis pass ``state_template`` (the TrainState, for
    its pytree structure/shapes) and params + optimizer state shard over
    that axis too (tensor parallel — each device keeps 1/model of every
    conv's output channels and XLA partitions the matching compute)."""
    repl = replicated(mesh)
    if mesh.shape.get("model", 1) > 1:
        if state_template is None:
            raise ValueError("model-parallel mesh needs state_template")
        sshard = tp_sharding_tree(state_template, mesh)
    else:
        sshard = repl
    # P shorter than ndim leaves trailing dims replicated, so one spec fits
    # both (B,H,W,C) images and the (B,H,W) mask
    spec = P("data", "space") if spatial else P("data")
    bshard = tuple(NamedSharding(mesh, spec) for _ in range(3))
    return jax.jit(
        step_fn,
        in_shardings=(sshard, bshard, repl),
        out_shardings=(sshard, repl),
        donate_argnums=(0,),
    )
