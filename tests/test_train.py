"""Train-step tests: loss decreases on a learnable synthetic task, EMA math,
NaN-batch skipping, t-samplers, reference-default configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s1s2.core import Schedule
from s1s2.models import UNetSmall
from s1s2.train import (
    TrainConfig,
    create_train_state,
    make_train_step,
    sample_timesteps,
)

T = 50
SCHED = Schedule.cosine(T)
B, H, W, CC, CT = 4, 16, 16, 4, 4


@pytest.fixture(scope="module")
def setup():
    model = UNetSmall(out_ch=CT, base_ch=4, compute_dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, CC + CT)), jnp.zeros((1,), jnp.int32)
    )
    return model, variables["params"]


def synthetic_batch(rng):
    cond = rng.uniform(-1, 1, (B, H, W, CC)).astype(np.float32)
    x0 = np.clip(cond[..., :CT] * 0.5 + 0.5, 0, 1).astype(np.float32)
    mask = np.ones((B, H, W), np.float32)
    return jnp.asarray(cond), jnp.asarray(x0), jnp.asarray(mask)


class TestTrainStep:
    @pytest.mark.parametrize("pred_param", ["eps", "v"])
    def test_loss_decreases(self, setup, rng, pred_param):
        model, params = setup
        cfg = TrainConfig(T=T, lr=3e-3, pred_param=pred_param, t_sampler="uniform")
        state = create_train_state(params, cfg)
        step = jax.jit(make_train_step(model.apply, SCHED, cfg))
        batch = synthetic_batch(rng)
        key = jax.random.PRNGKey(1)
        losses = []
        for i in range(30):
            state, m = step(state, batch, key)
            losses.append(float(m["loss"]))
        assert int(state.skipped) == 0
        assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.9, losses

    def test_nan_batch_skipped(self, setup, rng):
        model, params = setup
        cfg = TrainConfig(T=T, t_sampler="uniform")
        state = create_train_state(params, cfg)
        step = jax.jit(make_train_step(model.apply, SCHED, cfg))
        cond, x0, mask = synthetic_batch(rng)
        bad_cond = cond.at[0, 0, 0, 0].set(jnp.nan)
        p_before = state.params
        state, m = step(state, (bad_cond, x0, mask), jax.random.PRNGKey(0))
        assert int(state.skipped) == 1
        assert bool(jnp.isnan(m["loss"]))
        # params unchanged on skip
        chex_equal = jax.tree_util.tree_all(
            jax.tree_util.tree_map(
                lambda a, b: bool(jnp.array_equal(a, b)), state.params, p_before
            )
        )
        assert chex_equal
        # a good batch afterwards still works
        state, m = step(state, (cond, x0, mask), jax.random.PRNGKey(1))
        assert bool(jnp.isfinite(m["loss"])) and int(state.skipped) == 1

    def test_ema_lerp(self, setup, rng):
        model, params = setup
        cfg = TrainConfig(T=T, ema_decay=0.9, t_sampler="uniform", lr=1e-2)
        state = create_train_state(params, cfg)
        step = jax.jit(make_train_step(model.apply, SCHED, cfg))
        batch = synthetic_batch(rng)
        new_state, _ = step(state, batch, jax.random.PRNGKey(0))
        # shadow = 0.1·p_new + 0.9·p_old (since ema started == params)
        leaf = lambda tree: jax.tree_util.tree_leaves(tree)[0]
        expect = 0.1 * leaf(new_state.params) + 0.9 * leaf(state.params)
        np.testing.assert_allclose(
            np.asarray(leaf(new_state.ema_params)), np.asarray(expect), rtol=1e-5
        )

    def test_cfg_dropout_runs(self, setup, rng):
        model, params = setup
        cfg = TrainConfig(T=T, cfg_drop_prob=0.5, t_sampler="uniform")
        state = create_train_state(params, cfg)
        step = jax.jit(make_train_step(model.apply, SCHED, cfg))
        state, m = step(state, synthetic_batch(rng), jax.random.PRNGKey(0))
        assert bool(jnp.isfinite(m["loss"]))

    def test_warmup_cosine_schedule(self, setup, rng):
        """LR schedule option: step runs, and early-step updates are tiny
        (warmup from 0)."""
        model, params = setup
        cfg = TrainConfig(T=T, lr=1e-2, lr_schedule="warmup_cosine",
                          warmup_steps=50, total_steps=200, t_sampler="uniform")
        state = create_train_state(params, cfg)
        step = jax.jit(make_train_step(model.apply, SCHED, cfg))
        batch = synthetic_batch(rng)
        new_state, m = step(state, batch, jax.random.PRNGKey(0))
        assert bool(jnp.isfinite(m["loss"]))
        # first step lr ≈ lr/50 → param delta far below a constant-lr step
        leaf = lambda tr: jax.tree_util.tree_leaves(tr)[0]
        delta = float(jnp.abs(leaf(new_state.params) - leaf(state.params)).max())
        assert delta < 1e-3, delta
        with pytest.raises(ValueError):
            from s1s2.train.loop import make_optimizer

            make_optimizer(TrainConfig(lr_schedule="nope"))

    def test_eps_reference_config(self):
        cfg = TrainConfig.eps_reference(T=1000)
        assert cfg.lr == 1e-5 and cfg.pred_param == "eps"
        assert cfg.t_sampler == "uniform" and not cfg.use_p2
        assert cfg.aux_x0_loss_w == 0.0


class TestTSampler:
    def test_uniform_range(self):
        t = sample_timesteps(jax.random.PRNGKey(0), 1000, 10_000, "uniform")
        assert int(t.min()) >= 0 and int(t.max()) <= 999
        assert abs(float(t.mean()) - 500) < 20

    def test_high_only(self):
        t = sample_timesteps(jax.random.PRNGKey(0), 1000, 10_000, "high_only",
                             high_t_min_ratio=0.6)
        assert int(t.min()) >= 600

    def test_mix_high_fraction(self):
        t = np.asarray(
            sample_timesteps(
                jax.random.PRNGKey(3), 1000, 50_000, "mix_high",
                high_t_frac=0.5, high_t_min_ratio=0.6,
            )
        )
        frac_high = (t >= 600).mean()
        # 50% forced high + 40% of the uniform half → ≈0.7
        assert 0.65 < frac_high < 0.75

    def test_unknown_mode(self):
        with pytest.raises(ValueError):
            sample_timesteps(jax.random.PRNGKey(0), 10, 1, "bogus")
