"""Progressive step-distillation CLI (s1s2 extension — no reference analog;
the reference's few-step story is DDIM with fewer steps,
`Evaluation/DDIM_Sweep.py:386-416`).

Distills a trained ε- or v-checkpoint into a few-step (default 1-step)
ε-student for the anchored-DDIM grid, saving a standard s1s2 msgpack
checkpoint that every eval/inference CLI accepts (run it with
``evaluate --mode ddim --steps <final_steps>``).

The recipe that measured quality-matched on the real chip (BENCH_NOTES.md
"Step distillation"): progressive phases at --epochs_per_phase 250 THEN
--endpoint_epochs 150. Endpoint-only (--skip_progressive) from a raw
teacher underperforms badly at t_start=200; it is the right mode only for
--endpoint_mode puregen, where full-range progressive diverges.

    python -m s1s2 distill --patch_dir P --teacher out/model.msgpack \
        --model_path out/distilled.msgpack --t_start 200 \
        --teacher_steps 16 --final_steps 1 --epochs_per_phase 4

Multi-chip: with >1 visible device a data mesh is built automatically
(teacher rollouts and all distill epochs shard over it); multi-host runs
add the jax.distributed flags, one process per host, rank 0 writes:

    python -m s1s2 distill ... --coordinator host0:1234 \
        --num_processes 2 --process_id $RANK
"""

import argparse
import json


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser("s1s2 distill")
    ap.add_argument("--patch_dir", type=str, required=True)
    ap.add_argument("--teacher", type=str, required=True,
                    help="teacher checkpoint (.msgpack or reference .pth)")
    ap.add_argument("--model_path", type=str, required=True,
                    help="output .msgpack for the distilled student")
    ap.add_argument("--T", type=int, default=1000)
    ap.add_argument("--t_start", type=int, default=200,
                    help="top of the anchored-DDIM grid being distilled")
    ap.add_argument("--teacher_steps", type=int, default=16)
    ap.add_argument("--final_steps", type=int, default=1)
    ap.add_argument("--epochs_per_phase", type=int, default=4)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--weight_decay", type=float, default=1e-4)
    ap.add_argument("--grad_clip", type=float, default=0.5)
    ap.add_argument("--ema_decay", type=float, default=0.999)
    ap.add_argument("--teacher_param", choices=["eps", "v"], default="eps")
    ap.add_argument("--base_ch", type=int, default=96)
    ap.add_argument("--max_patches", type=int, default=None)
    ap.add_argument("--schedule", choices=["cosine", "linear"], default="cosine")
    ap.add_argument("--compute_dtype", choices=["bfloat16", "float32"],
                    default="bfloat16")
    ap.add_argument("--mask_as_weights", action="store_true")
    ap.add_argument("--seed", type=int, default=1337)
    # endpoint mode (trajectory-endpoint regression at the fixed grid top)
    ap.add_argument("--endpoint_epochs", type=int, default=0,
                    help="fine-tune the student on teacher ddim endpoints "
                         "for this many epochs after the progressive phases")
    ap.add_argument("--endpoint_seeds", type=int, default=4)
    ap.add_argument("--endpoint_teacher_steps", type=int, default=20,
                    help="teacher sampler budget for the endpoint targets")
    ap.add_argument("--endpoint_mode", choices=["anchored", "puregen"],
                    default="anchored",
                    help="anchored: distill the GT-anchored reconstruction "
                         "map; puregen: distill pure generation from unit "
                         "noise (use with --t_start 999)")
    ap.add_argument("--student_param", choices=["eps", "v"], default="eps",
                    help="student head for the ENDPOINT phase. Use 'v' with "
                         "--endpoint_mode puregen: the v readout "
                         "x0̂ = √ᾱ·x_t − √(1−ᾱ)·v is O(1)-conditioned at "
                         "t≈T where the ε readout divides by √ᾱ≈1e-4 "
                         "(train/distill.py make_endpoint_distill_step)")
    ap.add_argument("--guidance_scale", type=float, default=None,
                    help="roll the endpoint TEACHER with classifier-free "
                         "guidance at this scale (one stacked forward); the "
                         "student absorbs guidance so inference stays one "
                         "plain call — requires a cond-dropout-trained "
                         "teacher (train --cfg_drop_prob)")
    ap.add_argument("--student_base_ch", type=int, default=None,
                    help="WIDTH distillation: train a student of this "
                         "base_ch against the (--base_ch) teacher's map. "
                         "Implies endpoint-only (--skip_progressive); the "
                         "student starts from random init unless "
                         "--student_init is given. Measured: the int8 "
                         "1-step path at base 64 runs ~1.9x the base-96 "
                         "headline (BENCH_NOTES.md 'Width scaling')")
    ap.add_argument("--student_s2d", type=int, default=1,
                    help="ARCHITECTURE distillation: give the student a "
                         "space-to-depth stem of this factor (UNetSmall."
                         "stem_s2d) — the body runs at (H/s, W/s) with a "
                         "sub-pixel output head. At matched FLOPs "
                         "(base_ch*s) this trades memory-bound full-res "
                         "stages for MXU-friendly wide-channel ones. "
                         "Implies endpoint-only, like --student_base_ch")
    ap.add_argument("--student_init", type=str, default=None,
                    help="checkpoint to INITIALIZE the student from (e.g. an "
                         "already-distilled student, for endpoint-only head "
                         "retargeting). Default: the teacher when "
                         "--skip_progressive, else the progressive result")
    ap.add_argument("--snapshot_every", type=int, default=0,
                    help="during the endpoint phase, save a debiased-EMA "
                         "student snapshot to <model_path>.snap every N "
                         "epochs — a long run killed mid-way still leaves "
                         "a usable checkpoint")
    # multi-process (multi-host) driving — same surface as cli/train.py;
    # teacher rollouts and endpoint epochs shard over the mesh's 'data' axis
    ap.add_argument("--coordinator", type=str, default=None,
                    help="host:port of process 0 (enables jax.distributed)")
    ap.add_argument("--num_processes", type=int, default=None)
    ap.add_argument("--process_id", type=int, default=None)
    ap.add_argument("--skip_progressive", action="store_true",
                    help="endpoint-only distillation from the raw teacher. "
                         "NOTE: measured weak at t_start=200 (a raw-teacher "
                         "80-epoch endpoint run scored 0.487 vs 0.356 for "
                         "progressive+endpoint on the same teacher) — "
                         "prefer the default progressive phases followed "
                         "by --endpoint_epochs")
    return ap


def main(argv=None) -> None:
    ap = build_parser()
    args = ap.parse_args(argv)
    if args.skip_progressive and args.endpoint_epochs <= 0:
        ap.error("--skip_progressive with --endpoint_epochs 0 would run no "
                 "distillation at all (the saved 'student' would be the "
                 "unchanged teacher); pass --endpoint_epochs > 0")

    if args.coordinator is not None:
        from s1s2.parallel import initialize_distributed

        initialize_distributed(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    import jax
    import jax.numpy as jnp

    from s1s2.core import Schedule
    from s1s2.data.dataset import NpzPatchDataset
    from s1s2.data.loader import batch_iterator
    from s1s2.models import UNetSmall
    from s1s2.train.checkpoint import load_params, save_model
    from s1s2.train.distill import DistillConfig, progressive_distill

    # data-parallel mesh whenever >1 chip (or >1 process) is visible; the
    # single-chip device-resident fast path is kept when there is nothing
    # to shard over (mesh=None)
    mesh = None
    if jax.process_count() > 1 or len(jax.devices()) > 1:
        from s1s2.parallel import make_mesh_for_batch

        mesh = make_mesh_for_batch(args.batch_size)
    is_p0 = jax.process_index() == 0

    ds = NpzPatchDataset(args.patch_dir, max_files=args.max_patches)
    Cc, Ct, H, W = ds.probe_channels()
    schedule = (Schedule.cosine(args.T) if args.schedule == "cosine"
                else Schedule.linear(args.T))
    model = UNetSmall(
        out_ch=Ct, base_ch=args.base_ch,
        compute_dtype=jnp.bfloat16 if args.compute_dtype == "bfloat16"
        else jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(args.seed),
        jnp.zeros((1, H, W, Cc + Ct), jnp.float32), jnp.zeros((1,), jnp.int32))
    teacher = load_params(args.teacher, template=variables["params"])

    cfg = DistillConfig(
        T=args.T, t_start=args.t_start, teacher_steps=args.teacher_steps,
        final_steps=args.final_steps, epochs_per_phase=args.epochs_per_phase,
        lr=args.lr, weight_decay=args.weight_decay, grad_clip=args.grad_clip,
        ema_decay=args.ema_decay, teacher_param=args.teacher_param,
        mask_as_weights=args.mask_as_weights)

    def batches(phase, epoch):
        return batch_iterator(ds, args.batch_size, shuffle=True,
                              drop_last=True, seed=args.seed,
                              epoch=phase * 10_000 + epoch)

    log = lambda d: print(json.dumps(d), flush=True)
    phases = []
    student_model = model
    width_change = ((args.student_base_ch is not None
                     and args.student_base_ch != args.base_ch)
                    or args.student_s2d != 1)
    if width_change:
        if not args.skip_progressive:
            ap.error("--student_base_ch/--student_s2d require "
                     "--skip_progressive: the progressive phases alternate "
                     "teacher/student roles on one architecture; width/arch "
                     "distillation is an endpoint-only regression onto the "
                     "teacher's map")
        student_model = UNetSmall(
            out_ch=Ct, base_ch=args.student_base_ch or args.base_ch,
            stem_s2d=args.student_s2d,
            compute_dtype=jnp.bfloat16 if args.compute_dtype == "bfloat16"
            else jnp.float32)
        s_vars = student_model.init(
            jax.random.PRNGKey(args.seed + 1),
            jnp.zeros((1, H, W, Cc + Ct), jnp.float32),
            jnp.zeros((1,), jnp.int32))
        if args.student_init:
            student = jax.tree_util.tree_map(
                jnp.asarray,
                load_params(args.student_init, template=s_vars["params"]))
        else:
            student = jax.tree_util.tree_map(jnp.asarray, s_vars["params"])
    elif args.student_init:
        student = jax.tree_util.tree_map(
            jnp.asarray,
            load_params(args.student_init, template=variables["params"]))
        if not args.skip_progressive:
            ap.error("--student_init only makes sense with "
                     "--skip_progressive (progressive distillation would "
                     "overwrite the init from the teacher)")
    elif args.skip_progressive:
        student = jax.tree_util.tree_map(jnp.asarray, teacher)
    else:
        result = progressive_distill(model.apply, schedule, cfg, teacher,
                                     batches, progress=log, mesh=mesh)
        student = result["params"]
        phases = [h["student_steps"] for h in result["phase_history"]]

    if args.endpoint_epochs > 0:
        import numpy as np

        from s1s2.train.distill import endpoint_distill

        items = [ds[i] for i in range(len(ds))]
        cond = np.stack([d["cond"] for d in items])
        x0 = np.stack([d["target"] for d in items])
        mask = np.stack([
            np.ones(d["target"].shape[:2], np.float32)
            if d["mask"] is None else d["mask"] for d in items])
        def snapshot(params, ep):
            # tmp + rename: a crash mid-write must not corrupt the snapshot
            # (its whole purpose is surviving a killed run). Multi-process:
            # params are replicated, so only rank 0 touches the filesystem.
            import os
            if is_p0:
                save_model(params, args.model_path + ".snap.tmp")
                os.replace(args.model_path + ".snap.tmp",
                           args.model_path + ".snap")
            log({"snapshot_epoch": ep, "path": args.model_path + ".snap"})

        student = endpoint_distill(
            model.apply, schedule, cfg, student, teacher, cond, x0, mask,
            epochs=args.endpoint_epochs, batch_size=args.batch_size,
            teacher_steps=args.endpoint_teacher_steps,
            n_seeds=args.endpoint_seeds, progress=log, seed=args.seed,
            mode=args.endpoint_mode, student_param=args.student_param,
            guidance_scale=args.guidance_scale,
            student_apply_fn=(student_model.apply if width_change else None),
            snapshot_every=args.snapshot_every,
            snapshot_fn=snapshot if args.snapshot_every > 0 else None,
            mesh=mesh)

    if is_p0:
        save_model(student, args.model_path)
    print(json.dumps({
        "saved": args.model_path,
        "final_steps": int(args.final_steps),
        "phases": phases,
        "endpoint_epochs": args.endpoint_epochs,
        "student_param": args.student_param,
        "guidance_scale": args.guidance_scale,
        "student_base_ch": ((args.student_base_ch or args.base_ch)
                            if width_change else args.base_ch),
        "student_s2d": args.student_s2d,
    }))


if __name__ == "__main__":
    main()
