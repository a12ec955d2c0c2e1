"""Epoch-level training driver — the reference's ``train_ddpm``
(`Train_Orignal.py:218-336`) / ``train`` (`Train_v_Prediction.py:277-444`)
re-built around the fused jitted step and the device mesh.

Differences by design:
* device placement + gradient psum via s1s2.parallel (mesh data-parallel);
* loss logging reads back ONE scalar per logged step instead of per-step
  ``.item()`` syncs;
* full resume support (orbax) on top of the reference's last/best/final-EMA
  model triple.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from s1s2.core.schedule import Schedule
from s1s2.data.dataset import NpzPatchDataset
from s1s2.data.loader import batch_iterator
from s1s2.models.unet import UNetSmall
from s1s2.parallel import make_mesh_for_batch, shard_batch, shard_train_step
from s1s2.train.checkpoint import reference_artifact_paths, save_model, save_state
from s1s2.train.loop import TrainConfig, create_train_state, make_train_step


@dataclasses.dataclass
class RunConfig:
    """Run-level settings (reference CLI surface, `Train_v_Prediction.py:448-473`)."""

    patch_dir: str
    model_path: str  # .msgpack; _last/_best siblings are derived
    epochs: int = 40
    batch_size: int = 4
    base_ch: int = 96
    max_patches: Optional[int] = None
    seed: int = 1337
    schedule: str = "cosine"
    log_every: int = 50
    save_state_dir: Optional[str] = None  # orbax resume dir
    resume: bool = False  # restore params+opt+EMA+step from save_state_dir
    spatial_shard: bool = False
    model_shard: int = 1  # tensor-parallel 'model' axis (parallel/mesh.py)
    compute_dtype: str = "bfloat16"
    profile_dir: Optional[str] = None  # jax.profiler trace of epoch 1
    metrics_jsonl: Optional[str] = None  # structured metrics sink
    remat: bool = False  # rematerialize UNet blocks (memory ↔ FLOPs)
    cache_dir: Optional[str] = None  # MmapCache dir (decompress npz once)
    save_every: int = 1  # checkpoint cadence in epochs (last/best/state)


def train_loop(
    run: RunConfig,
    cfg: TrainConfig,
    progress: Optional[Callable[[dict], None]] = None,
) -> dict:
    """Full training run → history dict. Pure-Python driver; all math is in
    the jitted step."""
    if run.save_every < 1:
        raise ValueError(f"save_every must be >= 1, got {run.save_every}")
    ds = NpzPatchDataset(run.patch_dir, max_files=run.max_patches)
    Cc, Ct, H, W = ds.probe_channels()
    if run.cache_dir:
        from s1s2.data.loader import MmapCache

        ds = MmapCache(ds, run.cache_dir)

    schedule = Schedule.cosine(cfg.T) if run.schedule == "cosine" else Schedule.linear(cfg.T)
    model = UNetSmall(
        out_ch=Ct,
        base_ch=run.base_ch,
        compute_dtype=jnp.bfloat16 if run.compute_dtype == "bfloat16" else jnp.float32,
        remat=run.remat,
    )
    mlog = None
    if run.metrics_jsonl:
        from s1s2.utils.profiling import MetricsLogger

        mlog = MetricsLogger(run.metrics_jsonl)
    init_key = jax.random.PRNGKey(run.seed)
    variables = model.init(
        init_key, jnp.zeros((1, H, W, Cc + Ct), jnp.float32), jnp.zeros((1,), jnp.int32)
    )
    state = create_train_state(variables["params"], cfg)
    start_epoch = 1
    if run.resume and run.save_state_dir:
        from s1s2.train.checkpoint import restore_state

        if os.path.exists(run.save_state_dir):
            state = restore_state(run.save_state_dir, template=state)
            # Elastic recovery: state is saved at epoch boundaries, so the
            # restored step count locates the next epoch to run. Resuming
            # at that epoch replays the SAME shuffle (seed, epoch) and the
            # SAME per-step noise (fold_in(key, state.step)) as an
            # uninterrupted run — final params are bit-identical
            # (tests/test_multiprocess.py::test_kill_resume_*). The
            # reference cannot resume at all (SURVEY §5).
            steps_per_epoch = len(ds) // run.batch_size
            if steps_per_epoch > 0:
                start_epoch = int(state.step) // steps_per_epoch + 1
            if progress:
                progress({"resumed_at_step": int(state.step),
                          "resumed_at_epoch": start_epoch})

    mesh = make_mesh_for_batch(run.batch_size,
                               space=2 if run.spatial_shard else 1,
                               model=run.model_shard)
    step = shard_train_step(make_train_step(model.apply, schedule, cfg), mesh,
                            spatial=run.spatial_shard,
                            state_template=state)
    key = jax.random.PRNGKey(run.seed + 1)

    final_path, last_path, best_path = reference_artifact_paths(run.model_path)
    # best_loss survives restarts via a JSON sidecar next to model_best
    # (the orbax state holds params/opt/step only): without it, the first
    # post-resume save would overwrite a better pre-crash model_best.
    best_sidecar = best_path + ".loss.json"
    best_loss = float("inf")
    if start_epoch > 1 and os.path.exists(best_sidecar):
        with open(best_sidecar) as f:
            best_loss = float(json.load(f)["best_loss"])
    history = {"epoch_loss": [], "steps_per_sec": []}

    from s1s2.utils.profiling import trace_context

    for epoch in range(start_epoch, run.epochs + 1):
        running, n_batches = 0.0, 0
        t0 = time.perf_counter()
        profile_ctx = trace_context(run.profile_dir if epoch == 1 else None)
        profile_ctx.__enter__()
        pending = None  # delayed metric readback: no per-step host sync
        for batch in batch_iterator(
            ds, run.batch_size, shuffle=True, drop_last=True,
            seed=run.seed, epoch=epoch,
        ):
            sharded = shard_batch(batch, mesh, spatial=run.spatial_shard)
            state, metrics = step(state, sharded, key)
            if pending is not None:
                v = float(pending["loss"])
                if np.isfinite(v):
                    running += v
                    n_batches += 1
            pending = metrics
            if progress and n_batches and n_batches % run.log_every == 0:
                ch = np.asarray(pending["ch_losses"])  # reference tqdm shows ch0..3
                progress(
                    {
                        "epoch": epoch,
                        "step": int(state.step),
                        "loss": running / max(1, n_batches),
                        "p2": float(pending["p2_w"]),
                        "skipped": int(state.skipped),
                        **{f"ch{i}": round(float(v), 6) for i, v in
                           enumerate(ch[:4])},
                    }
                )
        if pending is not None:
            v = float(pending["loss"])
            if np.isfinite(v):
                running += v
                n_batches += 1
        profile_ctx.__exit__(None, None, None)
        dt = time.perf_counter() - t0
        avg_loss = running / max(1, n_batches)
        history["epoch_loss"].append(avg_loss)
        history["steps_per_sec"].append(n_batches / max(dt, 1e-9))

        # EMA-weighted last/best/final triple (`Train_Orignal.py:323-336`);
        # in multi-process runs only process 0 writes (params replicated)
        is_p0 = jax.process_index() == 0
        # save_every>1 amortizes the checkpoint cost: each save downloads
        # the full param/opt tree from the device (~20 s/epoch on the
        # remote-TPU tunnel, 4x the step compute for small models). "best"
        # is then best-at-save-points — with save_every>1 an off-cadence
        # best epoch is approximated by the next saved one. The final epoch
        # always saves, and resume granularity equals the cadence.
        do_save = (epoch % run.save_every == 0) or epoch == run.epochs
        if is_p0 and do_save:
            save_model(state.ema_params, last_path)
        if avg_loss < best_loss and do_save:
            best_loss = avg_loss
            if is_p0:
                save_model(state.ema_params, best_path)
                with open(best_sidecar, "w") as f:
                    json.dump({"best_loss": best_loss, "epoch": epoch}, f)
        # EVERY process must enter save_state: orbax's Checkpointer.save is
        # a global barrier (multihost.sync_global_processes) and the primary
        # host does the actual write — a p0-only call wedges the other
        # ranks' Gloo barrier (30 s GetKeyValue timeout, observed). The
        # cadence is deterministic across ranks, so all enter together.
        if run.save_state_dir and do_save:
            save_state(state, run.save_state_dir)
        if progress:
            progress({"epoch": epoch, "avg_loss": avg_loss,
                      "skipped": int(state.skipped), "epoch_time_s": dt})
        if mlog:
            mlog.log(epoch=epoch, avg_loss=avg_loss, skipped=int(state.skipped),
                     epoch_time_s=dt, steps_per_sec=history["steps_per_sec"][-1])

    if mlog:
        mlog.close()
    if jax.process_index() == 0:
        save_model(state.ema_params, final_path)
    history["best_loss"] = best_loss
    history["skipped"] = int(state.skipped)
    history["final_state"] = state
    return history
