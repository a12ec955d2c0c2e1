"""Progressive step distillation (Salimans & Ho, 2022) for the anchored-DDIM
sampler — the framework's path past the single-chip diffusion roofline.

The reference project has no distillation (its throughput story is "run DDIM
for fewer steps", `Evaluation/DDIM_Sweep.py:386-416`); this is an s1s2
extension targeting the BASELINE.json north star (≥500 patches/s/chip at
reconstruction quality): a student trained so that ONE deterministic DDIM
step reproduces TWO teacher steps halves the sampler's UNet calls per phase,
down to a 1-step model that `ddim_anchored(..., steps=1)` drives unchanged.

Design notes (TPU-first):
* One fused jitted distill step: q_sample → 2 teacher forwards → exact
  algebraic inversion of the sampler update → student fwd/bwd → AdamW → EMA,
  with the same on-device NaN guard as `s1s2.train.loop`.
* The student keeps the ε head and the *linspace* grid convention
  (`Evaluation/DDIM_Multi-step.py:124-134`), so every existing sampler,
  eval mode, checkpoint format and the int8 quantizer apply to the distilled
  model with no new code paths.
* The ε-target inverts the EXACT eval-time update including its
  `√(ᾱ+1e-8)` guard (`s1s2.core.parametrize.x0_from_eps`): if the student
  emitted the target exactly, `ddim_anchored`'s one step would land exactly
  on the teacher's two-step output.
* Loss: truncated-SNR-weighted x0-space MSE, w = max(SNR(t), 1) — the
  paper's weighting, masked per pixel like all s1s2 losses.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from s1s2.core.parametrize import (
    Parameterization,
    pred_to_x0_eps,
    q_sample,
    snr,
    x0_from_eps,
)
from s1s2.core.schedule import Schedule
from s1s2.sampling.grids import linspace_grid
from s1s2.train.loop import TrainState, guarded_update


# ---------------------------------------------------------------------------
# grids + target algebra
# ---------------------------------------------------------------------------


def distill_grids(t_start: int, student_steps: int, T: int) -> Tuple[np.ndarray, np.ndarray]:
    """(student_grid, teacher_grid): teacher = 2× refinement of the student's
    descending linspace grid, sharing every student point.

    teacher_grid[2i] == student_grid[i] exactly in real arithmetic
    (linspace at even indices); the truncating int cast can differ by at most
    1 in degenerate float cases, so the student grid is *derived from* the
    teacher grid to guarantee alignment. For the (t_start, steps) pairs used
    in practice it equals `linspace_grid(t_start, student_steps, T)` — the
    grid `ddim_anchored` will use at eval time (asserted in tests).
    """
    tg = linspace_grid(t_start, 2 * student_steps, T)
    if np.any(np.diff(tg) >= 0):
        raise ValueError(
            f"degenerate distill grid for t_start={t_start}, "
            f"student_steps={student_steps}: the 2x teacher grid {tg} has "
            "repeated/non-decreasing timesteps, which makes the one-step "
            "inversion ill-conditioned (its denominator ~1e-9 stays finite, "
            "silently poisoning targets). Use student_steps <= t_start/2.")
    return tg[::2].copy(), tg


def ddim_step_exact(x_t, eps, sab_cur, s1mab_cur, sab_next, s1mab_next):
    """One anchored-DDIM update, bit-identical to the `_ddim_linspace_scan`
    body (`s1s2/sampling/samplers.py`): x0̂ via the guarded divide, then
    re-noise to the next grid point. Per-sample (B,) coefficients."""
    x0_hat = x0_from_eps(x_t, eps, sab_cur, s1mab_cur)
    return q_sample(x0_hat, eps, sab_next, s1mab_next), x0_hat


def invert_ddim_step(x_t, x_next, sab_cur, s1mab_cur, sab_next, s1mab_next):
    """Solve for the (ε, x0) a ONE-step anchored-DDIM update would need to
    map x_t → x_next — the distillation target.

    Inverts `ddim_step_exact` including its √(ᾱ+1e-8) guard:
        x_next = (√ᾱ_n/g)·x_t + (√(1−ᾱ_n) − √ᾱ_n·√(1−ᾱ_t)/g)·ε,
        g = √(ᾱ_t + 1e-8).
    The ε coefficient is < 0 and bounded away from 0 whenever t > t_next, so
    the solve is exact (verified round-trip in tests/test_distill.py).
    """

    def bc(c, like):
        c = jnp.asarray(c, jnp.float32)
        return c.reshape(c.shape + (1,) * (like.ndim - c.ndim))

    x_t = x_t.astype(jnp.float32)
    x_next = x_next.astype(jnp.float32)
    g = jnp.sqrt(bc(sab_cur, x_t) ** 2 + 1e-8)
    a = bc(sab_next, x_t) / g
    denom = bc(s1mab_next, x_t) - a * bc(s1mab_cur, x_t)
    eps_tgt = (x_next - a * x_t) / denom
    x0_tgt = (x_t - bc(s1mab_cur, x_t) * eps_tgt) / g
    return eps_tgt, x0_tgt


# ---------------------------------------------------------------------------
# config / step
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    """Hyperparameters for one progressive-distillation run.

    The defaults follow the s1s2 trainer where shared (AdamW, clip 0.5, EMA
    0.999 — `Train_Orignal.py:262,307-310` lineage) and Salimans & Ho where
    distillation-specific (truncated-SNR x0 loss, student init from teacher,
    step halving)."""

    T: int = 1000
    t_start: int = 200          # top of the sampling grid being distilled
    teacher_steps: int = 16     # starting sampler budget (halved per phase)
    final_steps: int = 1
    epochs_per_phase: int = 4
    lr: float = 1e-4
    weight_decay: float = 1e-4
    grad_clip: float = 0.5
    ema_decay: float = 0.999
    teacher_param: str = "eps"  # what the INITIAL teacher predicts
    mask_as_weights: bool = False

    def phase_steps(self) -> Tuple[int, ...]:
        """Student budgets per phase: teacher_steps/2, /4, …, final_steps."""
        out, s = [], self.teacher_steps
        while s > self.final_steps:
            s //= 2
            out.append(max(s, self.final_steps))
        return tuple(out)


def make_distill_optimizer(cfg: DistillConfig) -> optax.GradientTransformation:
    txs = []
    if cfg.grad_clip and cfg.grad_clip > 0:
        txs.append(optax.clip_by_global_norm(cfg.grad_clip))
    txs.append(optax.adamw(cfg.lr, weight_decay=cfg.weight_decay))
    return optax.chain(*txs)


def debiased_ema(state: TrainState, init_params: Any, decay: float) -> Any:
    """EMA read-out that corrects init domination on SHORT runs.

    Distill EMAs initialize from the phase's init params (not zeros), so
    after n steps the EMA still carries decay**n of the init. For n well
    under 1/(1-decay) that means the "student" is mostly its initializer.
    Subtracting the known init component debiases the read-out exactly:
        ema_n = decay**n * init + (1 - decay**n) * <trajectory average>
    Long runs (decay**n ≈ 0) are returned bit-unchanged; ultra-short runs
    (decay**n ≥ 0.9) fall back to the raw trained params, where an EMA is
    meaningless anyway. n counts APPLIED updates (step minus NaN-skipped
    steps — skipped steps leave the EMA unchanged, so they must not decay
    the init component).
    """
    n = int(state.step) - int(state.skipped)
    w = float(decay) ** max(n, 0)
    if w >= 0.9:
        return state.params
    if w <= 0.05:
        return state.ema_params
    return jax.tree_util.tree_map(
        lambda e, p0: (e - w * p0) / (1.0 - w),
        state.ema_params, init_params)


def create_distill_state(params, cfg: DistillConfig) -> TrainState:
    """Student state initialized FROM the teacher parameters (the paper's
    init; also how each phase chains into the next)."""
    tx = make_distill_optimizer(cfg)
    params = jax.tree_util.tree_map(jnp.copy, params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        skipped=jnp.zeros((), jnp.int32),
    )


def make_distill_step(
    apply_fn: Callable,
    schedule: Schedule,
    cfg: DistillConfig,
    student_steps: int,
    teacher_param: Optional[str] = None,
) -> Callable:
    """Build ``step(state, teacher_params, batch, key) -> (state, metrics)``
    distilling a 2·student_steps teacher into a student_steps ε-student.

    Per batch sample: draw a grid segment i, build x_t at grid[i] by forward
    diffusion of the data x0, roll the (frozen) teacher TWO sampler steps to
    grid[i+1], invert the one-step update to get the ε the student must emit,
    and take a masked truncated-SNR-weighted x0-MSE gradient step. Teacher
    and student share ``apply_fn`` (same architecture).
    """
    tx = make_distill_optimizer(cfg)
    t_param = Parameterization(teacher_param or cfg.teacher_param)
    sg, tg = distill_grids(cfg.t_start, student_steps, cfg.T)
    N = student_steps

    ab = schedule.alpha_bar_np().astype(np.float64)

    def tab(idx):  # (len,) host tables → jnp constants
        a = ab[idx]
        return (jnp.asarray(np.sqrt(a), jnp.float32),
                jnp.asarray(np.sqrt(1.0 - a), jnp.float32))

    t_cur_tab = jnp.asarray(sg[:-1], jnp.int32)        # (N,)
    t_mid_tab = jnp.asarray(tg[1::2], jnp.int32)       # (N,)
    sab_cur_tab, s1mab_cur_tab = tab(sg[:-1])
    sab_mid_tab, s1mab_mid_tab = tab(tg[1::2])
    sab_next_tab, s1mab_next_tab = tab(sg[1:])
    ab_cur_tab = jnp.asarray(ab[sg[:-1]], jnp.float32)

    def teacher_two_steps(teacher_params, cond, x_t, t_cur, t_mid, coefs):
        sab_c, s1mab_c, sab_m, s1mab_m, sab_n, s1mab_n = coefs
        pred1 = apply_fn({"params": teacher_params},
                         jnp.concatenate([x_t, cond], axis=-1), t_cur)
        x0_1, eps1 = pred_to_x0_eps(t_param, x_t, pred1, sab_c, s1mab_c)
        x_mid = q_sample(x0_1, eps1, sab_m, s1mab_m)
        pred2 = apply_fn({"params": teacher_params},
                         jnp.concatenate([x_mid, cond], axis=-1), t_mid)
        x0_2, eps2 = pred_to_x0_eps(t_param, x_mid, pred2, sab_m, s1mab_m)
        return q_sample(x0_2, eps2, sab_n, s1mab_n)

    def loss_fn(params, teacher_params, cond, x0, mask, i, noise):
        take = lambda t: jnp.take(t, i, axis=0)  # (B,) gathers of tiny tables
        t_cur, t_mid = take(t_cur_tab), take(t_mid_tab)
        coefs = tuple(take(t) for t in (
            sab_cur_tab, s1mab_cur_tab, sab_mid_tab, s1mab_mid_tab,
            sab_next_tab, s1mab_next_tab))
        sab_c, s1mab_c, sab_n, s1mab_n = coefs[0], coefs[1], coefs[4], coefs[5]

        x_t = q_sample(x0, noise, sab_c, s1mab_c)
        x_next = jax.lax.stop_gradient(
            teacher_two_steps(teacher_params, cond, x_t, t_cur, t_mid, coefs))
        eps_tgt, x0_tgt = invert_ddim_step(
            x_t, x_next, sab_c, s1mab_c, sab_n, s1mab_n)
        eps_tgt = jax.lax.stop_gradient(eps_tgt)
        x0_tgt = jax.lax.stop_gradient(x0_tgt)

        pred = apply_fn({"params": params},
                        jnp.concatenate([x_t, cond], axis=-1), t_cur)
        x0_pred, eps_pred = pred_to_x0_eps(
            Parameterization.EPS, x_t, pred, sab_c, s1mab_c)

        # truncated-SNR weighting: w = max(SNR(t), 1) on the x0-space error
        w = jnp.clip(snr(take(ab_cur_tab)), 1.0, None)  # (B,)
        m = mask[..., None].astype(jnp.float32)  # (B,H,W,1)
        if cfg.mask_as_weights:
            m = m / jnp.clip(m.mean(), 1e-6, None)
        else:
            m = (m > 0).astype(jnp.float32)
        err2 = m * (x0_pred - x0_tgt) ** 2  # (B,H,W,C)
        denom = jnp.clip(m.sum(axis=(1, 2, 3)), 1e-6, None) * x0.shape[-1]
        per_sample = err2.sum(axis=(1, 2, 3)) / denom  # (B,)
        loss = (w * per_sample).mean()

        ch = err2.sum(axis=(0, 1, 2)) / jnp.clip(
            m.sum() * jnp.float32(1.0), 1e-6, None)  # per-channel diagnostics
        eps_mse = (m * (eps_pred - eps_tgt) ** 2).sum() / jnp.clip(
            m.sum() * x0.shape[-1], 1e-6, None)
        return loss, (ch, eps_mse)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    decay = cfg.ema_decay

    def step(state: TrainState, teacher_params, batch, key: jax.Array):
        cond, x0, mask = batch
        B = x0.shape[0]
        k_i, k_noise = jax.random.split(jax.random.fold_in(key, state.step))
        i = jax.random.randint(k_i, (B,), 0, N)
        noise = jax.random.normal(k_noise, x0.shape, jnp.float32)

        (loss, (ch, eps_mse)), grads = grad_fn(
            state.params, teacher_params, cond, x0, mask, i, noise)

        finite_in = jnp.isfinite(cond).all() & jnp.isfinite(x0).all()
        new_state, ok = guarded_update(state, tx, grads, loss, decay,
                                       inputs_finite=finite_in)
        metrics = {"loss": jnp.where(ok, loss, jnp.nan), "ch_losses": ch,
                   "eps_mse": eps_mse, "skipped": new_state.skipped}
        return new_state, metrics

    return step


# ---------------------------------------------------------------------------
# endpoint distillation (single-t trajectory-endpoint regression)
# ---------------------------------------------------------------------------


def make_endpoint_distill_step(
    apply_fn: Callable,
    schedule: Schedule,
    cfg: DistillConfig,
    pure_noise_init: bool = False,
    spectral_w: float = 0.0,
    student_param: str = "eps",
) -> Callable:
    """Build ``step(state, batch, key) -> (state, metrics)`` for ENDPOINT
    distillation: the student, queried once at t = cfg.t_start, regresses
    straight onto a precomputed teacher full-chain output.

    Complements the progressive mode: progressive telescopes 2-steps-into-1
    along the whole grid (general, works at any step budget); endpoint
    specializes a 1-step student to the exact (t_start → 0) map the
    anchored-reconstruction eval runs, with the teacher's multi-step output
    as the target — the caller builds targets ONCE with the production
    sampler (e.g. ``ddim_anchored(teacher, ..., steps=20)``) under stored
    noise, so each distill step costs one student fwd/bwd and no teacher
    calls.

    ``spectral_w`` adds a per-pixel spectral-angle term
    ``w·mean(1 − cos(x0_pred, x0_tgt))`` to the ε-space regression —
    endpoint students can trade spectral direction (SAM) for magnitude
    metrics; this term buys it back (measured on the ε family, BENCH_NOTES
    "Step distillation").

    ``pure_noise_init`` switches the student input from the anchored
    ``q_sample(x0, noise, t_start)`` to the PURE-GENERATION convention —
    x_t = noise (unit scale, `ddim_generate`'s init,
    `Evaluation_Updated/Evaluation_Pure_Generation.py:278`) for ε students,
    x_t = √(1−ᾱ)·noise (the v family's mean-free init,
    `..._v_Prediction.py:154`) for v students: the student then learns the
    1-call noise→image map against teacher full-chain pure-gen outputs.

    ``student_param`` picks the regression space. "eps" inverts the 1-step
    DDIM update for the ε whose x0̂ equals the teacher endpoint — but at
    t_start≈T the readout x0̂ = (x_t − σ·ε)/√ᾱ divides by √ᾱ ≈ 1e-4, so an
    ε student is ARCHITECTURALLY ill-conditioned for pure generation (tiny
    prediction errors blow up 1e4×; measured divergence, CLAUDE.md).
    "v" regresses v_req = (√ᾱ·x_t − x0_tgt)/√(1−ᾱ) — the exact inversion of
    the v sampler's one-step readout x0̂ = √ᾱ·x_t − √(1−ᾱ)·v, whose
    conditioning is O(1) at EVERY t (at t=999, x0̂ ≈ −v). Use "v" for
    puregen endpoint students.

    batch = (cond, x0_data, mask, noise, x0_teacher): ``noise`` is the draw
    used for both the teacher rollout's init and the student's input, so
    student and teacher see the SAME x_{t_start}.
    """
    tx = make_distill_optimizer(cfg)
    t_start = int(cfg.t_start)
    ab = float(schedule.alpha_bar_np()[min(t_start, cfg.T - 1)])
    sab = np.float32(np.sqrt(ab))
    s1mab = np.float32(np.sqrt(1.0 - ab))
    decay = cfg.ema_decay

    # the ε-head's implied x0 is (x_t − σ·pred)/√(ᾱ+1e-8): at t_start≈T the
    # 1/√ᾱ factor is ~1e4, so an x0-space MSE is catastrophically scaled
    # (observed: puregen losses ~1e8). Regress in ε-space instead — same
    # minimizer (ε_req is the exact ε whose one-step x0̂ equals the teacher
    # endpoint), conditioned O(1) at every t; for the anchored t_start=200
    # case this is the x0 loss scaled by the constant ᾱ (AdamW-invariant).
    g_guard = np.float32(np.sqrt(ab + 1e-8))
    s_par = Parameterization(student_param)

    def loss_fn(params, cond, x0, mask, noise, x0_tgt):
        B = x0.shape[0]
        if pure_noise_init:
            # match each family's eval-time init convention exactly
            x_t = noise if s_par is Parameterization.EPS else noise * s1mab
        else:
            x_t = q_sample(x0, noise, jnp.full((B,), sab),
                           jnp.full((B,), s1mab))
        pred = apply_fn({"params": params},
                        jnp.concatenate([x_t, cond], axis=-1),
                        jnp.full((B,), t_start, jnp.int32))
        tgt = jax.lax.stop_gradient(x0_tgt)
        if s_par is Parameterization.EPS:
            pred_req = (x_t - g_guard * tgt) / s1mab
        else:  # v: invert x0̂ = √ᾱ·x_t − √(1−ᾱ)·v
            pred_req = (sab * x_t - tgt) / s1mab
        m = mask[..., None].astype(jnp.float32)
        if cfg.mask_as_weights:
            m = m / jnp.clip(m.mean(), 1e-6, None)
        else:
            m = (m > 0).astype(jnp.float32)
        err2 = m * (pred - pred_req) ** 2
        loss = err2.sum() / jnp.clip(m.sum() * x0.shape[-1], 1e-6, None)
        if spectral_w > 0.0:
            x0_pred = ((x_t - s1mab * pred) / g_guard
                       if s_par is Parameterization.EPS
                       else sab * x_t - s1mab * pred)
            dot = (x0_pred * tgt).sum(-1)
            nrm = (jnp.clip(jnp.sqrt((x0_pred**2).sum(-1)), 1e-6, None)
                   * jnp.clip(jnp.sqrt((tgt**2).sum(-1)), 1e-6, None))
            cos = jnp.clip(dot / nrm, -1.0, 1.0)
            mm = m[..., 0]
            loss = loss + spectral_w * ((1.0 - cos) * mm).sum() / jnp.clip(
                mm.sum(), 1e-6, None)
        ch = err2.sum(axis=(0, 1, 2)) / jnp.clip(m.sum(), 1e-6, None)
        return loss, ch

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(state: TrainState, batch, key: jax.Array):
        cond, x0, mask, noise, x0_tgt = batch
        (loss, ch), grads = grad_fn(state.params, cond, x0, mask, noise,
                                    x0_tgt)
        finite_in = (jnp.isfinite(cond).all() & jnp.isfinite(x0).all()
                     & jnp.isfinite(x0_tgt).all())
        new_state, ok = guarded_update(state, tx, grads, loss, decay,
                                       inputs_finite=finite_in)
        return new_state, {"loss": jnp.where(ok, loss, jnp.nan),
                           "ch_losses": ch, "skipped": new_state.skipped}

    return step


def endpoint_distill(
    apply_fn: Callable,
    schedule: Schedule,
    cfg: DistillConfig,
    student_params: Any,
    teacher_params: Any,
    cond: jnp.ndarray,
    x0: jnp.ndarray,
    mask: jnp.ndarray,
    epochs: int,
    batch_size: int,
    teacher_steps: int = 20,
    n_seeds: int = 4,
    teacher_param: Optional[str] = None,
    progress: Optional[Callable[[dict], None]] = None,
    log_every: int = 25,
    seed: int = 11,
    rollout_chunk: int = 32,
    mode: str = "anchored",
    spectral_w: float = 0.0,
    student_param: str = "eps",
    guidance_scale: Optional[float] = None,
    student_apply_fn: Optional[Callable] = None,
    snapshot_every: int = 0,
    snapshot_fn: Optional[Callable[[Any, int], None]] = None,
    mesh: Optional[Any] = None,
) -> Any:
    """Endpoint-distillation driver: build teacher ddim-``teacher_steps``
    endpoint targets under ``n_seeds`` stored noise draws, then fine-tune the
    (1-step) student on them with ``make_endpoint_distill_step``.

    ``mode="anchored"`` (default) distills the GT-anchored reconstruction
    map (`ddim_anchored`); ``mode="puregen"`` distills the pure-generation
    map (`ddim_generate`: x_init = unit noise, typically t_start=999) — the
    reference's true_infer operating point
    (`Evaluation_Updated/Evaluation_Pure_Generation.py:278-292`).

    Teacher rollouts run in ``rollout_chunk``-sized chunks (activations never
    scale with the dataset), and the (noise, target) set stays DEVICE-resident
    while it fits (~2 GB) — host uploads per epoch would dominate on a
    remote-device runtime — falling back to host storage + per-batch upload
    beyond that. Returns the student's EMA params. (cond, x0, mask) are
    full-dataset NHWC arrays.

    ``guidance_scale`` (g≠1) rolls the teacher with classifier-free guidance
    (one stacked cond/uncond forward, `make_cfg_denoise_fn`): the student
    absorbs cond/uncond mixing AND the scale, so guided sampling costs ONE
    plain forward at inference — the guidance-distilled operating point.
    ``student_param`` picks the student head (see
    ``make_endpoint_distill_step``; use "v" for puregen).

    ``student_apply_fn`` decouples the student ARCHITECTURE from the
    teacher's: teacher rollouts run through ``apply_fn`` while the student
    step uses ``student_apply_fn`` on ``student_params`` — this is WIDTH
    distillation (e.g. a base-64 student against a base-96 teacher's map;
    the int8 1-step path at base 64 measures ~1.9× the base-96 headline,
    BENCH_NOTES.md "Width scaling"). Default: same as ``apply_fn``.

    ``mesh`` (a ``('data', ...)`` jax Mesh) runs the driver MULTI-CHIP:
    teacher rollouts and the endpoint epochs both shard over the mesh's
    ``data`` axis. Single-process: rollout chunks and training batches are
    placed with a ``P('data')`` NamedSharding and XLA partitions the fused
    samplers/steps SPMD. Multi-process (``jax.distributed``): rollout work
    is partitioned round-robin across processes and exchanged host-side
    (``multihost_utils.process_allgather`` per bounded round, so peak
    exchange memory is processes × rollout_chunk patches, never the full
    target set), then every rank drives identical epochs over globally
    sharded batches (``jax.make_array_from_process_local_data``) — the
    psum'd loss replicates, so all ranks log identical values. Target
    arrays stay HOST-resident in mesh mode (each batch uploads sharded);
    the single-chip device-resident fast path is unchanged when ``mesh``
    is None.
    """
    from s1s2.sampling.grids import round_unique_grid
    from s1s2.sampling.samplers import (ddim_anchored, ddim_generate,
                                        ddim_grid_sample, make_cfg_denoise_fn,
                                        make_denoise_fn)

    t_par = Parameterization(teacher_param or cfg.teacher_param)
    teacher = jax.tree_util.tree_map(jnp.asarray, teacher_params)
    cond = jnp.asarray(cond)
    x0 = jnp.asarray(x0)
    mask = jnp.asarray(mask)
    n_ds = x0.shape[0]

    # target set = n_seeds full-dataset (noise, teacher-output) copies; keep
    # it device-resident when it fits comfortably (remote-runtime uploads
    # per epoch would dominate otherwise), fall back to host beyond ~2 GB
    host_store = 2 * n_seeds * x0.nbytes > 2 << 30
    # roll the teacher in bounded chunks so its sampler activations never
    # scale with the dataset size
    chunk = min(n_ds, max(1, rollout_chunk))

    if t_par is Parameterization.V:
        # v-teachers run through the round-unique grid sampler, which takes
        # host-precomputed per-step coefficients (CLAUDE.md invariant: no
        # schedule-table gathers inside sampler loops)
        grid = round_unique_grid(cfg.t_start, teacher_steps, cfg.T)
        ab_k = float(schedule.alpha_bar_np()[int(grid[-1])])
        sab_k = float(np.sqrt(ab_k))
        s1mab_k = float(np.sqrt(1.0 - ab_k))

    if mode not in ("anchored", "puregen"):
        raise ValueError(f"unknown endpoint mode {mode!r}")
    if (mode == "puregen" and t_par is not Parameterization.EPS
            and student_param != "v"):
        raise ValueError("puregen endpoint targets from a v teacher need a "
                         "v student head (student_param='v'): the ε readout "
                         "x0̂ = (x_t − σε)/√ᾱ is ill-conditioned at t≈T")

    def roll_teacher(cond_c, x0_c, nz_c):
        if guidance_scale is not None and float(guidance_scale) != 1.0:
            fn_c = make_cfg_denoise_fn(apply_fn, {"params": teacher}, cond_c,
                                       float(guidance_scale))
        else:
            fn_c = make_denoise_fn(apply_fn, {"params": teacher}, cond_c)
        if mode == "puregen":
            if t_par is Parameterization.EPS:
                return ddim_generate(fn_c, x0_c.shape, jax.random.PRNGKey(0),
                                     schedule, cfg.t_start, teacher_steps,
                                     noise=nz_c)
            # v-family pure generation: mean-free √(1−ᾱ)-scaled init
            # (`..._v_Prediction.py:154`), round-unique grid
            return ddim_grid_sample(fn_c, nz_c * s1mab_k,
                                    jax.random.PRNGKey(0), schedule, grid,
                                    t_par)
        if t_par is Parameterization.EPS:
            return ddim_anchored(fn_c, x0_c, jax.random.PRNGKey(0), schedule,
                                 cfg.t_start, teacher_steps, noise=nz_c)
        x_init = q_sample(x0_c, nz_c, sab_k, s1mab_k)
        return ddim_grid_sample(fn_c, x_init, jax.random.PRNGKey(0),
                                schedule, grid, t_par)

    pc = jax.process_count()
    use_mesh = mesh is not None and (pc > 1
                                     or int(mesh.shape.get("data", 1)) > 1)
    if pc > 1 and mesh is None:
        raise ValueError("multi-process endpoint_distill needs a mesh "
                         "(s1s2.parallel.make_mesh_for_batch)")
    if use_mesh and pc == 1 and n_seeds * n_ds < int(mesh.shape["data"]):
        use_mesh = False  # fewer targets than devices: nothing to shard
    if use_mesh:
        import math

        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        bshard = NamedSharding(mesh, P("data"))
        data_ax = int(mesh.shape["data"])
        pr = jax.process_index()
        cond_np = np.asarray(cond, np.float32)
        x0_np = np.asarray(x0, np.float32)
        mask_np = np.asarray(mask, np.float32)
        total = n_seeds * n_ds
        # noise streams are keyed identically on every rank (threefry is
        # deterministic), so only the teacher TARGETS need exchanging
        ep_noise = np.concatenate([
            np.asarray(jax.random.normal(
                jax.random.PRNGKey(50_000 + seed + s), x0_np.shape),
                np.float32)
            for s in range(n_seeds)])
        ep_tgt = np.empty((total,) + x0_np.shape[1:], np.float32)
        per_round = chunk * pc
        pad_total = math.ceil(total / per_round) * per_round
        # wraparound padding: every round is full-shape so the allgather
        # shapes agree; duplicate indices re-write identical values
        padded = np.resize(np.arange(total), pad_total)
        if pc > 1:
            from jax.experimental import multihost_utils
        for r0 in range(0, pad_total, per_round):
            my = padded[r0 + pr * chunk: r0 + (pr + 1) * chunk]
            ds_i = my % n_ds
            c_c, x_c, n_c = cond_np[ds_i], x0_np[ds_i], ep_noise[my]
            if pc == 1:
                # SPMD rollout: chunk sharded over the data axis
                n_real = c_c.shape[0]
                padn = (-n_real) % data_ax
                if padn:
                    c_c, x_c, n_c = (np.concatenate([a, a[:padn]], 0)
                                     for a in (c_c, x_c, n_c))
                out = np.asarray(roll_teacher(
                    jax.device_put(jnp.asarray(c_c), bshard),
                    jax.device_put(jnp.asarray(x_c), bshard),
                    jax.device_put(jnp.asarray(n_c), bshard)))[:n_real]
                ep_tgt[my] = out
            else:
                # process-partitioned rollout + bounded host exchange
                out = np.asarray(roll_teacher(
                    jnp.asarray(c_c), jnp.asarray(x_c), jnp.asarray(n_c)),
                    np.float32)
                gathered = np.asarray(multihost_utils.process_allgather(out))
                for q in range(pc):
                    idx_q = padded[r0 + q * chunk: r0 + (q + 1) * chunk]
                    ep_tgt[idx_q] = gathered[q]
        n_ep = total

        align = int(np.lcm(data_ax, pc))
        if n_ep < align:
            raise ValueError(
                f"endpoint target set ({n_ep}) smaller than the mesh's "
                f"batch alignment ({align}): use fewer devices/processes "
                "or more patches/seeds")
        if batch_size % align or batch_size > n_ep:
            batch_size = max(min(batch_size, n_ep) // align * align, align)

        step = jax.jit(
            make_endpoint_distill_step(
                student_apply_fn or apply_fn, schedule, cfg,
                pure_noise_init=(mode == "puregen"),
                spectral_w=spectral_w, student_param=student_param),
            in_shardings=(repl, (bshard,) * 5, repl),
            out_shardings=(repl, repl), donate_argnums=(0,))
        state = create_distill_state(student_params, cfg)
        init = jax.tree_util.tree_map(jnp.asarray, student_params)
        rng = np.random.default_rng(seed)
        local_bs = batch_size // pc
        lo_r = pr * local_bs

        def put(x):
            if pc > 1:
                return jax.make_array_from_process_local_data(
                    bshard, np.ascontiguousarray(x[lo_r: lo_r + local_bs]))
            return jax.device_put(jnp.asarray(x), bshard)

        for ep in range(1, epochs + 1):
            order = rng.permutation(n_ep)
            running, nb = 0.0, 0
            for lo in range(0, n_ep - batch_size + 1, batch_size):
                gidx = order[lo: lo + batch_size]
                ds_i = gidx % n_ds
                batch = tuple(put(a) for a in (
                    cond_np[ds_i], x0_np[ds_i], mask_np[ds_i],
                    ep_noise[gidx], ep_tgt[gidx]))
                state, metrics = step(state, batch, jax.random.PRNGKey(0))
                v = float(metrics["loss"])
                if np.isfinite(v):
                    running += v
                    nb += 1
            if progress and (ep % log_every == 0 or ep == epochs):
                progress({"endpoint_epoch": ep, "loss": running / max(1, nb),
                          "skipped": int(state.skipped)})
            if (snapshot_fn is not None and snapshot_every > 0
                    and ep % snapshot_every == 0 and ep < epochs):
                snap = jax.tree_util.tree_map(
                    lambda a: jnp.array(a, copy=True),
                    debiased_ema(state, init, cfg.ema_decay))
                snapshot_fn(snap, ep)
        return debiased_ema(state, init, cfg.ema_decay)

    ep_noise, ep_tgt = [], []
    for s in range(n_seeds):
        nz = jax.random.normal(jax.random.PRNGKey(50_000 + seed + s),
                               x0.shape)
        tgt_chunks = []
        for lo in range(0, n_ds, chunk):
            sl = slice(lo, min(lo + chunk, n_ds))
            t_c = roll_teacher(cond[sl], x0[sl], nz[sl])
            tgt_chunks.append(np.asarray(t_c) if host_store else t_c)
        ep_noise.append(np.asarray(nz) if host_store else nz)
        ep_tgt.append(np.concatenate(tgt_chunks) if host_store
                      else jnp.concatenate(tgt_chunks))
    xp = np if host_store else jnp
    ep_noise = xp.concatenate(ep_noise)
    ep_tgt = xp.concatenate(ep_tgt)
    n_ep = ep_noise.shape[0]

    if n_ep < batch_size:
        # never run zero steps: a tiny target set just becomes one batch
        batch_size = n_ep

    step = jax.jit(make_endpoint_distill_step(
        student_apply_fn or apply_fn, schedule, cfg,
        pure_noise_init=(mode == "puregen"),
        spectral_w=spectral_w, student_param=student_param),
        donate_argnums=(0,))
    state = create_distill_state(student_params, cfg)
    init = jax.tree_util.tree_map(jnp.asarray, student_params)
    rng = np.random.default_rng(seed)
    for ep in range(1, epochs + 1):
        order = rng.permutation(n_ep)
        running, nb = 0.0, 0
        for lo in range(0, n_ep - batch_size + 1, batch_size):
            idx_h = order[lo:lo + batch_size]
            idx = jnp.asarray(idx_h)
            idx_ds = idx % n_ds  # seed-tiled → underlying patch index
            batch = (jnp.take(cond, idx_ds, axis=0),
                     jnp.take(x0, idx_ds, axis=0),
                     jnp.take(mask, idx_ds, axis=0),
                     jnp.asarray(ep_noise[idx_h]) if host_store
                     else jnp.take(ep_noise, idx, axis=0),
                     jnp.asarray(ep_tgt[idx_h]) if host_store
                     else jnp.take(ep_tgt, idx, axis=0))
            state, metrics = step(state, batch, jax.random.PRNGKey(0))
            v = float(metrics["loss"])
            if np.isfinite(v):
                running += v
                nb += 1
        if progress and (ep % log_every == 0 or ep == epochs):
            progress({"endpoint_epoch": ep, "loss": running / max(1, nb),
                      "skipped": int(state.skipped)})
        if (snapshot_fn is not None and snapshot_every > 0
                and ep % snapshot_every == 0 and ep < epochs):
            # periodic debiased-EMA snapshot: a killed long run still
            # yields a usable student. COPY before handing out — the
            # read-out can alias state.params/ema_params, which the next
            # step donates (the alias would be a deleted buffer)
            snap = jax.tree_util.tree_map(
                lambda a: jnp.array(a, copy=True),
                debiased_ema(state, init, cfg.ema_decay))
            snapshot_fn(snap, ep)
    return debiased_ema(state, init, cfg.ema_decay)


# ---------------------------------------------------------------------------
# progressive driver
# ---------------------------------------------------------------------------


def progressive_distill(
    apply_fn: Callable,
    schedule: Schedule,
    cfg: DistillConfig,
    teacher_params: Any,
    batches: Callable[[int, int], Iterable],
    progress: Optional[Callable[[dict], None]] = None,
    jit: bool = True,
    mesh: Optional[Any] = None,
) -> dict:
    """Halve the sampler budget phase by phase: teacher_steps → … → final_steps.

    ``batches(phase, epoch)`` yields (cond, x0, mask) NHWC batches. Each
    phase's student initializes from (and distills against) the previous
    phase's EMA weights. Returns {'params': final EMA student,
    'phase_history': [...], 'steps': final_steps}.

    ``mesh`` runs every phase's step SPMD over the mesh's ``data`` axis
    (replicated teacher/student state, batch-sharded data — XLA inserts the
    grad psum, exactly like ``parallel.shard_train_step``). Multi-process:
    ``batches`` must yield each rank's process-local slice of the global
    batch (``data.loader.batch_iterator`` does this automatically once
    ``jax.distributed`` is initialized); ``parallel.shard_batch`` assembles
    the global array.
    """
    # host-loaded checkpoints arrive as numpy; pin the teacher on device ONCE
    # (it is passed to every jitted step — as numpy it would re-upload the
    # whole tree per step, which over a remote-device tunnel dominates)
    teacher = jax.tree_util.tree_map(jnp.asarray, teacher_params)
    t_param = cfg.teacher_param
    use_mesh = mesh is not None and (jax.process_count() > 1
                                     or int(mesh.shape.get("data", 1)) > 1)
    if use_mesh:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from s1s2.parallel import shard_batch

        repl = NamedSharding(mesh, P())
        bsh = NamedSharding(mesh, P("data"))
    history = []
    for phase, s_steps in enumerate(cfg.phase_steps()):
        step_fn = make_distill_step(apply_fn, schedule, cfg, s_steps,
                                    teacher_param=t_param)
        if jit and use_mesh:
            step_fn = jax.jit(step_fn,
                              in_shardings=(repl, repl, (bsh,) * 3, repl),
                              out_shardings=(repl, repl),
                              donate_argnums=(0,))
        elif jit:
            step_fn = jax.jit(step_fn, donate_argnums=(0,))
        state = create_distill_state(teacher, cfg)
        key = jax.random.PRNGKey(1000 + phase)
        losses = []
        for epoch in range(1, cfg.epochs_per_phase + 1):
            running, n = 0.0, 0
            for batch in batches(phase, epoch):
                if use_mesh:
                    batch = shard_batch(batch, mesh)
                state, metrics = step_fn(state, teacher, batch, key)
                v = float(metrics["loss"])
                if np.isfinite(v):
                    running += v
                    n += 1
            losses.append(running / max(1, n))
            if progress:
                progress({"phase": phase, "student_steps": s_steps,
                          "epoch": epoch, "loss": losses[-1],
                          "skipped": int(state.skipped)})
        teacher = debiased_ema(state, teacher, cfg.ema_decay)
        t_param = "eps"  # all students have the ε head
        history.append({"student_steps": s_steps, "epoch_loss": losses})
    return {"params": teacher, "phase_history": history,
            "steps": cfg.phase_steps()[-1] if history else cfg.teacher_steps}
