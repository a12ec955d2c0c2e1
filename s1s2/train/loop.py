"""Jitted diffusion train step — the whole reference step body fused into one
XLA program with donated state.

Covers both reference trainers with one configurable step:
* ε-trainer (`Train_Orignal.py:218-336`): uniform t, plain masked MSE vs ε.
* v-trainer (`Train_v_Prediction.py:277-444`): pred_param ∈ {eps, v},
  t-sampler ∈ {uniform, high_only, mix_high}, p2/SNR reweighting (batch-mean,
  detached, `:385-386`), auxiliary x0 loss (`:389-401`).

TPU-first re-design vs the reference loop:
* One fused step: q_sample → target build → UNet fwd/bwd (bf16 on MXU) →
  masked loss (f32) → global-norm clip → AdamW → EMA lerp, all inside a
  single jit with ``donate_argnums`` on the state — zero host round-trips
  per step (the reference syncs per-step via ``loss.item()``,
  `Train_v_Prediction.py:417`).
* NaN handling stays ON-DEVICE: instead of the reference's host-side
  ``continue`` (`Train_Orignal.py:280-282,301-303`), non-finite batches or
  grads select a no-op update via ``jnp.where`` and bump a skipped counter
  carried in the state.
* No GradScaler: bf16 has f32-range exponents, so torch-AMP loss scaling is
  unnecessary on TPU (SURVEY.md §2.3).
* EMA is a pure pytree lerp inside the step (`Train_Orignal.py:195-213`
  class becomes three lines).
* Optional CFG conditioning dropout (per-sample cond zeroing) to train
  classifier-free-guidance models like the reference's ``cfg_v`` family,
  whose training script did not survive (SURVEY.md §0).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from s1s2.core.parametrize import (
    Parameterization,
    p2_weight,
    pred_to_x0_eps,
    q_sample,
    target_for,
)
from s1s2.core.schedule import Schedule
from s1s2.train.loss import masked_mse_per_channel


# ---------------------------------------------------------------------------
# timestep samplers (`Train_v_Prediction.py:245-272`)
# ---------------------------------------------------------------------------


def sample_timesteps(
    key: jax.Array,
    T: int,
    B: int,
    mode: str = "uniform",
    high_t_frac: float = 0.5,
    high_t_min_ratio: float = 0.6,
) -> jnp.ndarray:
    """uniform | high_only | mix_high — vectorized (no host branching)."""
    t_min = int(max(1, min(T - 1, round(high_t_min_ratio * T))))
    k1, k2, k3 = jax.random.split(key, 3)
    if mode == "uniform":
        return jax.random.randint(k1, (B,), 0, T)
    if mode == "high_only":
        return jax.random.randint(k1, (B,), t_min, T)
    if mode == "mix_high":
        hi = jax.random.uniform(k3, (B,)) < high_t_frac
        t_hi = jax.random.randint(k1, (B,), t_min, T)
        t_lo = jax.random.randint(k2, (B,), 0, T)
        return jnp.where(hi, t_hi, t_lo)
    raise ValueError(f"Unknown t_sampler: {mode}")


# ---------------------------------------------------------------------------
# config / state
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Static training hyperparameters (defaults = reference CLI defaults,
    `Train_Orignal.py:342-358` / `Train_v_Prediction.py:448-473`)."""

    T: int = 1000
    lr: float = 1e-4
    weight_decay: float = 1e-4
    grad_clip: float = 0.5
    ema_decay: float = 0.999
    pred_param: str = "v"  # 'eps' | 'v'
    t_sampler: str = "mix_high"  # 'uniform' | 'high_only' | 'mix_high'
    high_t_frac: float = 0.5
    high_t_min_ratio: float = 0.6
    use_p2: bool = True
    p2_gamma: float = 1.0
    p2_k: float = 1e-3
    aux_x0_loss_w: float = 0.02
    mask_as_weights: bool = False
    band_weights: Optional[Tuple[float, ...]] = None
    cfg_drop_prob: float = 0.0  # classifier-free-guidance cond dropout
    # optional LR schedule (s1s2 extension; reference uses constant lr):
    # 'constant' | 'warmup_cosine' (linear warmup → cosine decay to 0)
    lr_schedule: str = "constant"
    warmup_steps: int = 100
    total_steps: int = 10_000  # decay horizon for warmup_cosine

    @classmethod
    def eps_reference(cls, **kw) -> "TrainConfig":
        """The ε-trainer's fixed behavior (`Train_Orignal.py`): uniform t,
        no p2, no aux loss, lr 1e-5."""
        base = dict(
            lr=1e-5, pred_param="eps", t_sampler="uniform", use_p2=False,
            aux_x0_loss_w=0.0,
        )
        base.update(kw)
        return cls(**base)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any
    skipped: jnp.ndarray  # NaN-batch skip counter (`Train_Orignal.py:321`)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """clip-by-global-norm → AdamW, matching torch clip→AdamW(wd decoupled)
    (`Train_Orignal.py:262,307-310`). AdamW defaults (β=0.9/0.999, eps=1e-8)
    coincide between torch and optax."""
    txs = []
    if cfg.grad_clip and cfg.grad_clip > 0:
        txs.append(optax.clip_by_global_norm(cfg.grad_clip))
    if cfg.lr_schedule == "warmup_cosine":
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=cfg.lr,
            warmup_steps=cfg.warmup_steps,
            decay_steps=max(cfg.total_steps, cfg.warmup_steps + 1),
        )
    elif cfg.lr_schedule == "constant":
        lr = cfg.lr
    else:
        raise ValueError(f"unknown lr_schedule: {cfg.lr_schedule!r}")
    txs.append(optax.adamw(lr, weight_decay=cfg.weight_decay))
    return optax.chain(*txs)


def create_train_state(params, cfg: TrainConfig) -> TrainState:
    tx = make_optimizer(cfg)
    # copy params: the state is typically jitted with donate_argnums, which
    # would otherwise invalidate the caller's arrays
    params = jax.tree_util.tree_map(jnp.copy, params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        skipped=jnp.zeros((), jnp.int32),
    )


def guarded_update(
    state: TrainState,
    tx: optax.GradientTransformation,
    grads: Any,
    loss: jnp.ndarray,
    ema_decay: float,
    inputs_finite=True,
):
    """NaN-guarded optimizer + EMA state advance, shared by the train step
    and both distillation steps.

    Applies optimizer update and EMA lerp (`Train_Orignal.py:201-205`:
    shadow ← (1-d)·p + d·shadow) only when inputs/loss/grads are ALL finite;
    otherwise the step is an on-device no-op that bumps the skip counter
    (the reference's host-side NaN-batch `continue`, `Train_Orignal.py:321`,
    kept inside one compiled program). Returns ``(new_state, ok)``.
    """
    finite_g = jax.tree_util.tree_reduce(
        lambda a, g: a & jnp.isfinite(g).all(), grads, jnp.bool_(True)
    )
    ok = jnp.asarray(inputs_finite) & jnp.isfinite(loss) & finite_g

    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)

    sel = lambda a, b: jax.tree_util.tree_map(
        lambda x, y: jnp.where(ok, x, y), a, b
    )
    new_params = sel(new_params, state.params)
    new_opt_state = sel(new_opt_state, state.opt_state)
    new_ema = sel(
        jax.tree_util.tree_map(
            lambda p, e: (1.0 - ema_decay) * p + ema_decay * e,
            new_params,
            state.ema_params,
        ),
        state.ema_params,
    )
    new_state = TrainState(
        step=state.step + 1,
        params=new_params,
        opt_state=new_opt_state,
        ema_params=new_ema,
        skipped=state.skipped + jnp.where(ok, 0, 1).astype(jnp.int32),
    )
    return new_state, ok


# ---------------------------------------------------------------------------
# the train step
# ---------------------------------------------------------------------------


def make_train_step(
    apply_fn: Callable,
    schedule: Schedule,
    cfg: TrainConfig,
) -> Callable:
    """Build ``step(state, batch, key) -> (state, metrics)``.

    ``apply_fn(variables, x_and_cond, t) -> pred`` is the Flax apply;
    batch = (cond (B,H,W,Cc), x0 (B,H,W,Ct), mask (B,H,W) or None-shaped ones).
    The returned function is pure — jit/pjit it at the call site so sharding
    can be attached (s1s2.parallel).
    """
    tx = make_optimizer(cfg)
    param = Parameterization(cfg.pred_param)
    band_w = (
        jnp.asarray(cfg.band_weights, jnp.float32) if cfg.band_weights else None
    )

    def loss_fn(params, cond, x0, mask, t, noise):
        sab = schedule.sqrt_alpha_bar[t]
        s1mab = schedule.sqrt_one_minus_alpha_bar[t]
        x_t = q_sample(x0, noise, sab, s1mab)
        target = target_for(param, x0, noise, sab, s1mab)

        pred = apply_fn(
            {"params": params}, jnp.concatenate([x_t, cond], axis=-1), t
        )

        base_loss, ch_losses = masked_mse_per_channel(
            pred, target, mask, band_w, cfg.mask_as_weights
        )

        p2_w = jnp.float32(1.0)
        if cfg.use_p2:
            p2_w = jax.lax.stop_gradient(
                p2_weight(schedule.alpha_bar[t], cfg.p2_gamma, cfg.p2_k).mean()
            )
        loss = base_loss * p2_w

        if cfg.aux_x0_loss_w > 0.0:
            x0_pred, _ = pred_to_x0_eps(param, x_t, pred, sab, s1mab)
            aux_loss, _ = masked_mse_per_channel(
                x0_pred, x0, mask, band_w, cfg.mask_as_weights
            )
            loss = loss + cfg.aux_x0_loss_w * aux_loss

        return loss, (ch_losses, p2_w)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    decay = cfg.ema_decay

    def step(state: TrainState, batch, key: jax.Array):
        cond, x0, mask = batch
        B = x0.shape[0]
        k_t, k_noise, k_drop = jax.random.split(jax.random.fold_in(key, state.step), 3)

        t = sample_timesteps(
            k_t, cfg.T, B, cfg.t_sampler, cfg.high_t_frac, cfg.high_t_min_ratio
        )
        noise = jax.random.normal(k_noise, x0.shape, jnp.float32)

        if cfg.cfg_drop_prob > 0.0:
            keep = (
                jax.random.uniform(k_drop, (B, 1, 1, 1)) >= cfg.cfg_drop_prob
            ).astype(cond.dtype)
            cond = cond * keep

        (loss, (ch_losses, p2_w)), grads = grad_fn(
            state.params, cond, x0, mask, t, noise
        )

        finite_in = jnp.isfinite(cond).all() & jnp.isfinite(x0).all()
        new_state, ok = guarded_update(state, tx, grads, loss, decay,
                                       inputs_finite=finite_in)
        metrics = {
            "loss": jnp.where(ok, loss, jnp.nan),
            "ch_losses": ch_losses,
            "p2_w": p2_w,
            "skipped": new_state.skipped,
        }
        return new_state, metrics

    return step
