"""Progressive step distillation (s1s2.train.distill).

Core correctness is algebraic and exactly testable:
* the teacher/student grids must interleave (teacher = 2× refinement),
* `invert_ddim_step` must exactly invert the sampler update, and
* a student that emits the inverted ε must make `ddim_anchored(steps=N)`
  land on the teacher's 2N-step trajectory point.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from s1s2.core import Schedule
from s1s2.core.parametrize import q_sample
from s1s2.sampling import ddim_anchored
from s1s2.sampling.grids import linspace_grid
from s1s2.train.distill import (
    DistillConfig,
    create_distill_state,
    ddim_step_exact,
    distill_grids,
    invert_ddim_step,
    make_distill_step,
    progressive_distill,
)


def test_phase_steps_halving():
    assert DistillConfig(teacher_steps=16, final_steps=1).phase_steps() == (
        8, 4, 2, 1)
    assert DistillConfig(teacher_steps=8, final_steps=2).phase_steps() == (4, 2)
    assert DistillConfig(teacher_steps=2, final_steps=1).phase_steps() == (1,)


def test_distill_grids_align_with_sampler_grid():
    T = 1000
    for t_start in (200, 999, 100):
        for n in (16, 8, 4, 2, 1):
            sg, tg = distill_grids(t_start, n, T)
            assert len(sg) == n + 1 and len(tg) == 2 * n + 1
            assert (tg[::2] == sg).all()
            # the grid ddim_anchored will use at eval time
            assert (sg == linspace_grid(t_start, n, T)).all(), (t_start, n)
            assert sg[0] == min(t_start, T - 1) and sg[-1] == 0


def test_invert_ddim_step_roundtrip(rng):
    schedule = Schedule.cosine(1000)
    ab = schedule.alpha_bar_np()
    t_cur = np.array([200, 150], np.int64)
    t_next = np.array([100, 75], np.int64)
    sab_c = np.sqrt(ab[t_cur]).astype(np.float32)
    s1mab_c = np.sqrt(1 - ab[t_cur]).astype(np.float32)
    sab_n = np.sqrt(ab[t_next]).astype(np.float32)
    s1mab_n = np.sqrt(1 - ab[t_next]).astype(np.float32)

    x_t = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), jnp.float32)
    x_next, x0_hat = ddim_step_exact(x_t, eps, sab_c, s1mab_c, sab_n, s1mab_n)
    eps_rec, x0_rec = invert_ddim_step(x_t, x_next, sab_c, s1mab_c,
                                       sab_n, s1mab_n)
    np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(eps),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0_hat),
                               rtol=1e-4, atol=1e-5)


def test_inverted_eps_reproduces_teacher_point_through_sampler(rng):
    """A student that emits the inverted ε makes ddim_anchored(steps=1)
    output exactly the x0 consistent with the teacher's landing point —
    validates coefficient/grid agreement between distill tables and the
    production sampler."""
    schedule = Schedule.cosine(1000)
    t_start = 200
    sg, _ = distill_grids(t_start, 1, 1000)
    ab = schedule.alpha_bar_np()
    sab_c = np.float32(np.sqrt(ab[sg[0]]))
    s1mab_c = np.float32(np.sqrt(1 - ab[sg[0]]))
    sab_n = np.float32(np.sqrt(ab[sg[1]]))
    s1mab_n = np.float32(np.sqrt(1 - ab[sg[1]]))

    gt = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 3)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), jnp.float32)
    x_t = q_sample(gt, noise, sab_c, s1mab_c)
    x_next = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), jnp.float32) * 0.3
    eps_tgt, x0_tgt = invert_ddim_step(
        x_t, x_next,
        np.full((2,), sab_c), np.full((2,), s1mab_c),
        np.full((2,), sab_n), np.full((2,), s1mab_n))

    out = ddim_anchored(lambda x, t: eps_tgt, gt, jax.random.PRNGKey(0),
                        schedule, t_start=t_start, steps=1, noise=noise)
    np.testing.assert_allclose(
        np.asarray(out), np.clip(np.asarray(x0_tgt), 0.0, 1.0),
        rtol=1e-4, atol=1e-5)


def _tiny_setup(rng, base_ch=4, H=16, W=16, Cc=3, Ct=2, B=4):
    from s1s2.models import UNetSmall

    model = UNetSmall(out_ch=Ct, base_ch=base_ch, compute_dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, Cc + Ct), jnp.float32),
        jnp.zeros((1,), jnp.int32))
    batch = (
        jnp.asarray(rng.standard_normal((B, H, W, Cc)), jnp.float32),
        jnp.asarray(rng.uniform(0, 1, (B, H, W, Ct)), jnp.float32),
        jnp.ones((B, H, W), jnp.float32),
    )
    return model, variables["params"], batch


def test_distill_step_updates_and_stays_finite(rng):
    schedule = Schedule.cosine(100)
    cfg = DistillConfig(T=100, t_start=50, teacher_steps=4, lr=1e-3)
    model, teacher, batch = _tiny_setup(rng)
    step = jax.jit(make_distill_step(model.apply, schedule, cfg,
                                     student_steps=2))
    state = create_distill_state(teacher, cfg)
    for k in range(3):
        state, metrics = step(state, teacher, batch, jax.random.PRNGKey(7))
    assert int(state.step) == 3
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["eps_mse"]))
    assert int(state.skipped) == 0
    # params moved away from the teacher init
    d = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x[0] - x[1]).sum()),
        jax.tree_util.tree_map(lambda a, b: (a, b), state.params, teacher),
        0.0)
    assert d > 0


def test_distill_step_nan_batch_skipped(rng):
    schedule = Schedule.cosine(100)
    cfg = DistillConfig(T=100, t_start=50, teacher_steps=4)
    model, teacher, batch = _tiny_setup(rng)
    bad = (batch[0].at[0, 0, 0, 0].set(jnp.nan), batch[1], batch[2])
    step = jax.jit(make_distill_step(model.apply, schedule, cfg, 2))
    state = create_distill_state(teacher, cfg)
    state, metrics = step(state, teacher, bad, jax.random.PRNGKey(0))
    assert int(state.skipped) == 1
    same = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(jnp.array_equal(a, b)), state.params, teacher))
    assert same


@pytest.mark.slow  # 30-90 s on the 1-CPU box; covered by faster siblings in the default tier
def test_progressive_distill_end_to_end(rng):
    schedule = Schedule.cosine(100)
    cfg = DistillConfig(T=100, t_start=50, teacher_steps=4, final_steps=1,
                        epochs_per_phase=2, lr=1e-3)
    model, teacher, batch = _tiny_setup(rng, H=8, W=8)
    logs = []
    result = progressive_distill(
        model.apply, schedule, cfg, teacher,
        batches=lambda phase, epoch: [batch, batch],
        progress=logs.append)
    assert result["steps"] == 1
    assert [h["student_steps"] for h in result["phase_history"]] == [2, 1]
    assert all(np.isfinite(v) for h in result["phase_history"]
               for v in h["epoch_loss"])
    assert len(logs) == 4  # 2 phases × 2 epochs
    # the distilled student is a drop-in ε-model for the production sampler
    out = ddim_anchored(
        lambda x, t: model.apply({"params": result["params"]},
                                 jnp.concatenate([x, batch[0]], -1), t),
        batch[1], jax.random.PRNGKey(3), schedule, t_start=50, steps=1)
    assert np.isfinite(np.asarray(out)).all()
    assert out.shape == batch[1].shape


def test_endpoint_distill_step_learns_target(rng):
    """Endpoint mode: the 1-step student regresses onto a fixed teacher
    endpoint; with a constant target the loss must drop monotonically-ish
    and params stay finite."""
    from s1s2.train.distill import make_endpoint_distill_step

    schedule = Schedule.cosine(100)
    cfg = DistillConfig(T=100, t_start=50, lr=3e-3)
    model, teacher, batch = _tiny_setup(rng, H=8, W=8)
    cond, x0, mask = batch
    noise = jnp.asarray(rng.standard_normal(x0.shape), jnp.float32)
    x0_tgt = jnp.clip(x0 + 0.05, 0, 1)  # a fixed, reachable target
    step = jax.jit(make_endpoint_distill_step(model.apply, schedule, cfg),
                   donate_argnums=(0,))
    state = create_distill_state(teacher, cfg)
    losses = []
    for _ in range(12):
        state, metrics = step(state, (cond, x0, mask, noise, x0_tgt),
                              jax.random.PRNGKey(0))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
    assert int(state.skipped) == 0


@pytest.mark.slow  # 30-90 s on the 1-CPU box; covered by faster siblings in the default tier
def test_distill_from_v_teacher(rng):
    """A v-parameterized teacher (the reference's flagship family) distills
    into an ε-student: phase 0 consumes the teacher through the v→(x0,ε)
    algebra, later phases are ε-to-ε."""
    schedule = Schedule.cosine(100)
    cfg = DistillConfig(T=100, t_start=50, teacher_steps=4, final_steps=1,
                        epochs_per_phase=1, teacher_param="v")
    model, teacher, batch = _tiny_setup(rng, H=8, W=8)
    result = progressive_distill(
        model.apply, schedule, cfg, teacher,
        batches=lambda phase, epoch: [batch])
    assert result["steps"] == 1
    assert all(np.isfinite(v) for h in result["phase_history"]
               for v in h["epoch_loss"])


def test_distill_step_sharded_over_mesh(rng):
    """The distill step partitions SPMD over the ('data','space') mesh:
    replicated params, sharded batch — same recipe as the train step."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from s1s2.parallel import make_mesh

    schedule = Schedule.cosine(100)
    cfg = DistillConfig(T=100, t_start=50, teacher_steps=4)
    model, teacher, batch = _tiny_setup(rng, B=8)
    mesh = make_mesh(data=4, space=2, devices=jax.devices()[:8])
    repl = NamedSharding(mesh, P())
    bshard = tuple(NamedSharding(mesh, P("data", "space")) for _ in range(3))
    step = jax.jit(make_distill_step(model.apply, schedule, cfg, 2),
                   in_shardings=(repl, repl, bshard, repl),
                   out_shardings=(repl, repl), donate_argnums=(0,))
    state = create_distill_state(teacher, cfg)
    sharded = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), batch, bshard)
    state, metrics = step(state, teacher, sharded, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


@pytest.mark.slow  # 30-90 s on the 1-CPU box; covered by faster siblings in the default tier
def test_distill_cli_smoke(tmp_path, rng):
    """End-to-end CLI: make synthetic patches, train 1 epoch, distill 2→1,
    then evaluate the student with the standard eval CLI."""
    from s1s2.cli import distill as cli_distill
    from s1s2.data.synthetic import make_synthetic_patches
    from s1s2.train.checkpoint import load_any_checkpoint
    from s1s2.train.loop import TrainConfig
    from s1s2.train.trainer import RunConfig, train_loop

    patches = str(tmp_path / "patches")
    make_synthetic_patches(patches, n=6, size=16, seed=0)
    teacher_path = str(tmp_path / "teacher.msgpack")
    train_loop(RunConfig(patch_dir=patches, model_path=teacher_path,
                         epochs=1, batch_size=2, base_ch=4,
                         compute_dtype="float32"),
               TrainConfig(T=50, pred_param="eps"))
    student_path = str(tmp_path / "student.msgpack")
    cli_distill.main([
        "--patch_dir", patches, "--teacher", teacher_path,
        "--model_path", student_path, "--T", "50", "--t_start", "25",
        "--teacher_steps", "2", "--final_steps", "1",
        "--epochs_per_phase", "1", "--batch_size", "2", "--base_ch", "4",
        "--compute_dtype", "float32",
        "--endpoint_epochs", "1", "--endpoint_seeds", "1",
        "--endpoint_teacher_steps", "2",
    ])
    from s1s2.models import UNetSmall

    model = UNetSmall(out_ch=4, base_ch=4, compute_dtype=jnp.float32)
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 8), jnp.float32),
        jnp.zeros((1,), jnp.int32))["params"]
    params = load_any_checkpoint(student_path, template=template)
    assert np.isfinite(
        float(jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.abs(x).sum(), params, jnp.float32(0.0))))


def test_endpoint_puregen_mode(rng):
    """Pure-generation endpoint distillation: targets come from
    ddim_generate (unit-noise init), the student consumes x_t = noise at
    t_start, and the returned params drive a finite 1-step ddim_generate."""
    from s1s2.sampling.samplers import ddim_generate
    from s1s2.train.distill import endpoint_distill

    schedule = Schedule.cosine(100)
    cfg = DistillConfig(T=100, t_start=99, lr=1e-3)
    model, teacher, batch = _tiny_setup(rng, H=8, W=8)
    cond, x0, mask = batch
    logs = []
    student = endpoint_distill(
        model.apply, schedule, cfg, teacher, teacher, cond, x0, mask,
        epochs=2, batch_size=2, teacher_steps=4, n_seeds=1,
        mode="puregen", progress=logs.append, log_every=1)
    out = ddim_generate(
        lambda x, t: model.apply({"params": student},
                                 jnp.concatenate([x, cond], -1), t),
        x0.shape, jax.random.PRNGKey(5), schedule, t_start=99, steps=1)
    assert np.isfinite(np.asarray(out)).all()
    assert len(logs) == 2
    assert all(np.isfinite(l["loss"]) for l in logs)


def test_endpoint_puregen_v_teacher_needs_v_student(rng):
    """A v teacher's puregen targets may only feed a v-head student: the
    ε readout divides by √ᾱ≈0 at t≈T (ill-conditioned)."""
    from s1s2.train.distill import endpoint_distill

    schedule = Schedule.cosine(100)
    cfg = DistillConfig(T=100, t_start=99, teacher_param="v")
    model, teacher, batch = _tiny_setup(rng, H=8, W=8)
    cond, x0, mask = batch
    with pytest.raises(ValueError, match="v student head"):
        endpoint_distill(model.apply, schedule, cfg, teacher, teacher,
                         cond, x0, mask, epochs=1, batch_size=2,
                         mode="puregen")


def test_endpoint_v_student_readout_identity():
    """The v-head regression target is the EXACT inversion of the one-step
    readout: plugging pred_req back into x0̂ = √ᾱ·x_t − √(1−ᾱ)·v recovers
    the teacher endpoint bit-for-bit (in f64 algebra) at every t, including
    t=T−1 where the ε inversion loses ~4 digits to the 1/√ᾱ blow-up."""
    schedule = Schedule.cosine(1000)
    ab_tab = schedule.alpha_bar_np()
    rng = np.random.default_rng(0)
    x_t = rng.standard_normal((4, 4, 3))
    tgt = rng.uniform(0, 1, (4, 4, 3))
    for t in (999, 500, 200):
        sab = np.sqrt(ab_tab[t])
        s1mab = np.sqrt(1 - ab_tab[t])
        v_req = (sab * x_t - tgt) / s1mab
        x0_hat = sab * x_t - s1mab * v_req
        np.testing.assert_allclose(x0_hat, tgt, rtol=0, atol=1e-12)


@pytest.mark.slow  # CLI end-to-end; unit siblings cover the mechanism in the default tier
def test_endpoint_puregen_v_teacher_v_student_end_to_end(rng):
    """v→v pure-generation endpoint distillation: targets from the v
    family's mean-free √(1−ᾱ)-init rollout, student trained in v space;
    the returned params drive a finite 1-step v-grid sample and the loss
    stays O(1) (the regression space is well-conditioned at t≈T)."""
    from s1s2.core.parametrize import Parameterization
    from s1s2.sampling.grids import round_unique_grid
    from s1s2.sampling.samplers import ddim_grid_sample
    from s1s2.train.distill import endpoint_distill

    schedule = Schedule.cosine(100)
    cfg = DistillConfig(T=100, t_start=99, lr=1e-3, teacher_param="v")
    model, teacher, batch = _tiny_setup(rng, H=8, W=8)
    cond, x0, mask = batch
    logs = []
    student = endpoint_distill(
        model.apply, schedule, cfg, teacher, teacher, cond, x0, mask,
        epochs=2, batch_size=2, teacher_steps=4, n_seeds=1,
        mode="puregen", student_param="v", progress=logs.append,
        log_every=1)
    assert all(np.isfinite(l["loss"]) for l in logs)
    assert all(abs(l["loss"]) < 1e4 for l in logs)  # v-space: no 1/√ᾱ blow-up
    grid = round_unique_grid(99, 1, 100)
    s1mab = float(np.sqrt(1 - schedule.alpha_bar_np()[int(grid[-1])]))
    nz = jax.random.normal(jax.random.PRNGKey(5), x0.shape)
    out = ddim_grid_sample(
        lambda x, t: model.apply({"params": student},
                                 jnp.concatenate([x, cond], -1), t),
        nz * s1mab, jax.random.PRNGKey(0), schedule, grid,
        Parameterization.V)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow  # 30-90 s on the 1-CPU box; covered by faster siblings in the default tier
def test_endpoint_puregen_guidance_width_combo(rng):
    """The full r3 production recipe in one call: a NARROW v-head student
    distilled from a wider v teacher's GUIDED pure-generation endpoints
    (student_apply_fn + mode='puregen' + student_param='v' +
    guidance_scale). Loss stays O(1), the returned tree has the narrow
    architecture, and it drives a finite 1-step v-grid pure generation."""
    from s1s2.core.parametrize import Parameterization
    from s1s2.models import UNetSmall
    from s1s2.sampling.grids import round_unique_grid
    from s1s2.sampling.samplers import ddim_grid_sample
    from s1s2.train.distill import endpoint_distill

    schedule = Schedule.cosine(100)
    cfg = DistillConfig(T=100, t_start=99, lr=1e-3, teacher_param="v")
    model, teacher, batch = _tiny_setup(rng, H=8, W=8)
    cond, x0, mask = batch
    narrow = UNetSmall(out_ch=x0.shape[-1], base_ch=2,
                       compute_dtype=jnp.float32)
    n_vars = narrow.init(
        jax.random.PRNGKey(7),
        jnp.zeros((1, 8, 8, cond.shape[-1] + x0.shape[-1]), jnp.float32),
        jnp.zeros((1,), jnp.int32))
    logs = []
    student = endpoint_distill(
        model.apply, schedule, cfg, n_vars["params"], teacher, cond, x0,
        mask, epochs=2, batch_size=2, teacher_steps=2, n_seeds=1,
        mode="puregen", student_param="v", guidance_scale=2.0,
        progress=logs.append, log_every=1, student_apply_fn=narrow.apply)
    assert all(np.isfinite(l["loss"]) for l in logs)
    assert all(abs(l["loss"]) < 1e4 for l in logs)
    s_shapes = jax.tree_util.tree_map(lambda x: x.shape, student)
    n_shapes = jax.tree_util.tree_map(lambda x: x.shape, n_vars["params"])
    assert s_shapes == n_shapes
    grid = round_unique_grid(99, 1, 100)
    s1mab = float(np.sqrt(1 - schedule.alpha_bar_np()[int(grid[-1])]))
    nz = jax.random.normal(jax.random.PRNGKey(5), x0.shape)
    out = ddim_grid_sample(
        lambda x, t: narrow.apply({"params": student},
                                  jnp.concatenate([x, cond], -1), t),
        nz * s1mab, jax.random.PRNGKey(0), schedule, grid,
        Parameterization.V)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow  # 30-90 s on the 1-CPU box; covered by faster siblings in the default tier
def test_endpoint_guidance_scale_changes_targets(rng):
    """guidance_scale rolls the teacher through the CFG stacked forward;
    the distilled student absorbs the guidance, so different scales must
    produce different students (and scale=1.0 must match the plain path)."""
    from s1s2.train.distill import endpoint_distill

    schedule = Schedule.cosine(100)
    model, teacher, batch = _tiny_setup(rng, H=8, W=8)
    cond, x0, mask = batch

    def run(g):
        cfg = DistillConfig(T=100, t_start=50, lr=1e-3)
        return endpoint_distill(
            model.apply, schedule, cfg, teacher, teacher, cond, x0, mask,
            epochs=1, batch_size=2, teacher_steps=2, n_seeds=1,
            guidance_scale=g)

    flat = lambda p: np.concatenate([np.asarray(l).ravel() for l in
                                     jax.tree_util.tree_leaves(p)])
    s_none, s_one, s_two = flat(run(None)), flat(run(1.0)), flat(run(2.0))
    np.testing.assert_array_equal(s_none, s_one)  # g=1 short-circuits to plain
    assert np.isfinite(s_two).all()
    assert np.abs(s_two - s_none).max() > 1e-7  # guidance really fed through


def test_endpoint_spectral_term(rng):
    """spectral_w adds a bounded cosine term: loss stays finite and the
    step still trains (regression for the SAM-regularizer knob)."""
    from s1s2.train.distill import make_endpoint_distill_step

    schedule = Schedule.cosine(100)
    cfg = DistillConfig(T=100, t_start=50, lr=3e-3)
    model, teacher, batch = _tiny_setup(rng, H=8, W=8)
    cond, x0, mask = batch
    noise = jnp.asarray(rng.standard_normal(x0.shape), jnp.float32)
    x0_tgt = jnp.clip(x0 + 0.05, 0, 1)
    step = jax.jit(make_endpoint_distill_step(
        model.apply, schedule, cfg, spectral_w=0.5), donate_argnums=(0,))
    state = create_distill_state(teacher, cfg)
    losses = []
    for _ in range(8):
        state, metrics = step(state, (cond, x0, mask, noise, x0_tgt),
                              jax.random.PRNGKey(0))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


@pytest.mark.slow  # CLI end-to-end; unit siblings cover the mechanism in the default tier
def test_distill_cli_student_init(tmp_path, rng):
    """--student_init decouples the endpoint student's starting weights from
    the target-generating teacher (endpoint-only head retargeting: e.g.
    fine-tune an already-distilled ε student with a v head while the
    ORIGINAL teacher still rolls the ddim targets)."""
    from s1s2.cli import distill as cli_distill
    from s1s2.data.synthetic import make_synthetic_patches
    from s1s2.models import UNetSmall
    from s1s2.train.checkpoint import load_any_checkpoint, save_model

    patches = str(tmp_path / "patches")
    make_synthetic_patches(patches, n=4, size=16, seed=3)
    model = UNetSmall(out_ch=4, base_ch=4, compute_dtype=jnp.float32)
    teacher_path = str(tmp_path / "teacher.msgpack")
    init_path = str(tmp_path / "init.msgpack")
    for seed, path in ((0, teacher_path), (1, init_path)):
        save_model(model.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, 16, 16, 8), jnp.float32),
            jnp.zeros((1,), jnp.int32))["params"], path)

    student_path = str(tmp_path / "student.msgpack")
    args = [
        "--patch_dir", patches, "--teacher", teacher_path,
        "--model_path", student_path, "--T", "50", "--t_start", "25",
        "--batch_size", "2", "--base_ch", "4", "--compute_dtype", "float32",
        "--skip_progressive", "--student_init", init_path,
        "--endpoint_epochs", "1", "--endpoint_seeds", "1",
        "--endpoint_teacher_steps", "2", "--student_param", "v",
    ]
    cli_distill.main(args)
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 8), jnp.float32),
        jnp.zeros((1,), jnp.int32))["params"]
    params = load_any_checkpoint(student_path, template=template)
    assert np.isfinite(
        float(jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.abs(x).sum(), params, jnp.float32(0.0))))

    # without --skip_progressive the init would be silently overwritten —
    # must be rejected
    bad = [a for a in args if a != "--skip_progressive"]
    with pytest.raises(SystemExit):
        cli_distill.main(bad)


@pytest.mark.slow  # CLI end-to-end; unit siblings cover the mechanism in the default tier
def test_endpoint_width_distill_narrow_student(rng):
    """Width distillation: a base-2 student regresses onto a base-4
    teacher's endpoint map via student_apply_fn; the returned tree has the
    NARROW architecture and drives a finite 1-step anchored sample."""
    from s1s2.models import UNetSmall
    from s1s2.train.distill import endpoint_distill

    schedule = Schedule.cosine(100)
    cfg = DistillConfig(T=100, t_start=50, lr=1e-3)
    model, teacher, batch = _tiny_setup(rng, H=8, W=8)
    cond, x0, mask = batch
    narrow = UNetSmall(out_ch=x0.shape[-1], base_ch=2,
                       compute_dtype=jnp.float32)
    n_vars = narrow.init(
        jax.random.PRNGKey(7),
        jnp.zeros((1, 8, 8, cond.shape[-1] + x0.shape[-1]), jnp.float32),
        jnp.zeros((1,), jnp.int32))
    logs = []
    student = endpoint_distill(
        model.apply, schedule, cfg, n_vars["params"], teacher, cond, x0,
        mask, epochs=2, batch_size=2, teacher_steps=2, n_seeds=1,
        progress=logs.append, log_every=1,
        student_apply_fn=narrow.apply)
    assert all(np.isfinite(l["loss"]) for l in logs)
    # returned tree is the narrow architecture, not the teacher's
    s_shapes = jax.tree_util.tree_map(lambda x: x.shape, student)
    n_shapes = jax.tree_util.tree_map(lambda x: x.shape, n_vars["params"])
    assert s_shapes == n_shapes
    out = ddim_anchored(
        lambda x, t: narrow.apply({"params": student},
                                  jnp.concatenate([x, cond], -1), t),
        x0, jax.random.PRNGKey(3), schedule, t_start=50, steps=1)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow  # CLI end-to-end; unit siblings cover the mechanism in the default tier
def test_distill_cli_student_base_ch(tmp_path, rng):
    """--student_base_ch trains a narrower student end-to-end through the
    CLI; the saved checkpoint loads against the NARROW template and the
    flag is rejected without --skip_progressive."""
    from s1s2.cli import distill as cli_distill
    from s1s2.data.synthetic import make_synthetic_patches
    from s1s2.models import UNetSmall
    from s1s2.train.checkpoint import load_any_checkpoint, save_model

    patches = str(tmp_path / "patches")
    make_synthetic_patches(patches, n=4, size=16, seed=0)
    model = UNetSmall(out_ch=4, base_ch=4, compute_dtype=jnp.float32)
    teacher_path = str(tmp_path / "teacher.msgpack")
    save_model(model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 8), jnp.float32),
        jnp.zeros((1,), jnp.int32))["params"], teacher_path)

    student_path = str(tmp_path / "student.msgpack")
    args = [
        "--patch_dir", patches, "--teacher", teacher_path,
        "--model_path", student_path, "--T", "50", "--t_start", "25",
        "--batch_size", "2", "--base_ch", "4", "--student_base_ch", "2",
        "--compute_dtype", "float32", "--skip_progressive",
        "--endpoint_epochs", "1", "--endpoint_seeds", "1",
        "--endpoint_teacher_steps", "2",
    ]
    cli_distill.main(args)
    narrow = UNetSmall(out_ch=4, base_ch=2, compute_dtype=jnp.float32)
    template = narrow.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 8), jnp.float32),
        jnp.zeros((1,), jnp.int32))["params"]
    params = load_any_checkpoint(student_path, template=template)
    assert np.isfinite(
        float(jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.abs(x).sum(), params, jnp.float32(0.0))))

    # width change requires endpoint-only mode
    bad = [a for a in args if a != "--skip_progressive"]
    with pytest.raises(SystemExit):
        cli_distill.main(bad)


@pytest.mark.slow  # CLI end-to-end; unit siblings cover the mechanism in the default tier
def test_endpoint_snapshot_every(rng, tmp_path):
    """--snapshot_every: periodic debiased-EMA snapshots during the endpoint
    phase, so a killed long run still leaves a usable student. Snapshots
    fire at multiples of the cadence strictly BEFORE the final epoch (the
    final read-out is the function's return value), and each one is a
    finite pytree shaped like the student."""
    from s1s2.train.distill import endpoint_distill

    schedule = Schedule.cosine(100)
    cfg = DistillConfig(T=100, t_start=50, lr=1e-3)
    model, teacher, batch = _tiny_setup(rng, H=8, W=8)
    cond, x0, mask = batch
    snaps = []
    student = endpoint_distill(
        model.apply, schedule, cfg, teacher, teacher, cond, x0, mask,
        epochs=3, batch_size=2, teacher_steps=2, n_seeds=1,
        snapshot_every=1, snapshot_fn=lambda p, ep: snaps.append((ep, p)))
    assert [ep for ep, _ in snaps] == [1, 2]
    for _, p in snaps:
        assert jax.tree_util.tree_structure(p) == \
            jax.tree_util.tree_structure(teacher)
        total = jax.tree_util.tree_reduce(
            lambda a, x: a + float(jnp.abs(x).sum()), p, 0.0)
        assert np.isfinite(total)
    # the returned student is independent of snapshotting (read-out is pure)
    assert np.isfinite(jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), student, 0.0))


def test_endpoint_distill_mesh_driver_matches_single_device(rng):
    """VERDICT r4 item 1: the endpoint-distill DRIVER runs multi-chip.
    With a ('data',) mesh the teacher rollouts and endpoint epochs shard
    over devices; the result must match the single-device driver to float
    reduction tolerance (rollout_chunk=3 also exercises the wraparound
    padding of partial rounds)."""
    from s1s2.parallel import make_mesh
    from s1s2.train.distill import endpoint_distill

    schedule = Schedule.cosine(10)
    cfg = DistillConfig(T=10, t_start=8, teacher_steps=4, lr=1e-3)
    model, teacher, batch = _tiny_setup(rng, B=8)
    cond, x0, mask = (np.asarray(a) for a in batch)
    kw = dict(epochs=1, batch_size=4, teacher_steps=2, n_seeds=1, seed=3,
              rollout_chunk=3)
    p_ref = endpoint_distill(model.apply, schedule, cfg, teacher, teacher,
                             cond, x0, mask, **kw)
    mesh = make_mesh(data=4, space=1, devices=jax.devices()[:4])
    p_mesh = endpoint_distill(model.apply, schedule, cfg, teacher, teacher,
                              cond, x0, mask, mesh=mesh, **kw)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_mesh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_endpoint_distill_mesh_fallback_tiny_targets(rng):
    """Fewer targets than mesh devices: the driver falls back to the
    single-device path instead of failing on batch alignment."""
    from s1s2.parallel import make_mesh
    from s1s2.train.distill import endpoint_distill

    schedule = Schedule.cosine(10)
    cfg = DistillConfig(T=10, t_start=8, teacher_steps=4)
    model, teacher, batch = _tiny_setup(rng, B=2)
    cond, x0, mask = (np.asarray(a) for a in batch)
    mesh = make_mesh(data=8, space=1, devices=jax.devices()[:8])
    p = endpoint_distill(model.apply, schedule, cfg, teacher, teacher,
                         cond, x0, mask, epochs=1, batch_size=2,
                         teacher_steps=2, n_seeds=1, mesh=mesh)
    for leaf in jax.tree_util.tree_leaves(p):
        assert np.isfinite(np.asarray(leaf)).all()


def test_progressive_distill_mesh_matches_single_device(rng):
    """progressive_distill(mesh=...) shards each phase's step over 'data';
    same batches → same student as the unsharded driver."""
    from s1s2.parallel import make_mesh

    schedule = Schedule.cosine(10)
    cfg = DistillConfig(T=10, t_start=8, teacher_steps=4, epochs_per_phase=1,
                        final_steps=2, lr=1e-3)
    model, teacher, batch = _tiny_setup(rng, B=8)

    def batches(phase, epoch):
        yield batch

    r_ref = progressive_distill(model.apply, schedule, cfg, teacher, batches)
    mesh = make_mesh(data=4, space=1, devices=jax.devices()[:4])
    r_mesh = progressive_distill(model.apply, schedule, cfg, teacher,
                                 batches, mesh=mesh)
    for a, b in zip(jax.tree_util.tree_leaves(r_ref["params"]),
                    jax.tree_util.tree_leaves(r_mesh["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
