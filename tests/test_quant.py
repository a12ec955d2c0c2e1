"""int8 inference path (models/quant.py): topology parity of the shared
forward skeleton vs UNetSmall, quantization error bounds, and sampler
integration."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s1s2.models import UNetSmall
from s1s2.models.quant import (
    QuantParams,
    _forward,
    calibrate,
    make_quant_denoise_fn,
    quant_apply,
    quantize_unet,
    quantize_weights,
)


@pytest.fixture(scope="module")
def setup():
    model = UNetSmall(out_ch=3, base_ch=8, compute_dtype=jnp.bfloat16)
    B, H, W, CIN = 2, 16, 16, 5  # x_t 3 + cond 2
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, CIN)), jnp.zeros((1,), jnp.int32)
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, CIN), jnp.float32)
    t = jnp.array([3, 7], jnp.int32)
    return model, variables, x, t


def test_calib_forward_matches_unetsmall(setup):
    """The shared skeleton in bf16-calibration mode IS the UNetSmall forward
    (same params, same topology) — outputs must agree to bf16 tolerance."""
    model, variables, x, t = setup
    want = model.apply(variables, x, t)
    qp = QuantParams(variables["params"], {}, {}, {}, out_ch=3, base_ch=8)
    rec = {}
    got = _forward(qp, x, t, mode="calib", records=rec)
    assert got.dtype == want.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=5e-2)
    assert len(rec) == 15  # 6 blocks x 2 convs + 3 transposed-conv inputs


def test_weight_quantization_bounds(setup):
    _, variables, _, _ = setup
    w8, _ = quantize_weights(variables["params"])
    for name, (q, sw) in w8.items():
        assert q.dtype == jnp.int8
        assert int(jnp.abs(q).max()) <= 127
        # per-out-channel scales: at least one channel saturates
        deq_max = np.abs(np.asarray(q, np.float32) * np.asarray(sw)).reshape(
            -1, q.shape[-1]).max(axis=0)
        w = np.abs(np.asarray(
            variables["params"][name.split("/")[0]][name.split("/")[1]]["kernel"]
        )).reshape(-1, q.shape[-1]).max(axis=0)
        np.testing.assert_allclose(deq_max, w, rtol=0.02)


def test_int8_forward_close_to_bf16(setup):
    model, variables, x, t = setup
    qp = quantize_unet(variables["params"], [(x, t)], out_ch=3, base_ch=8)
    want = np.asarray(model.apply(variables, x, t))
    got = np.asarray(quant_apply(qp, x, t))
    # random-init nets amplify; just bound the relative error sanely
    scale = np.abs(want).max() + 1e-6
    assert np.abs(got - want).max() / scale < 0.25
    assert np.abs(got - want).mean() / scale < 0.05


def test_int8_quant_up_forward_close_to_bf16(setup):
    """quant_up=True additionally runs the 2×2 transposed convs in int8;
    output must stay close to the bf16 forward (slightly looser tol)."""
    model, variables, x, t = setup
    want = np.asarray(model.apply(variables, x, t))
    qp = quantize_unet(variables["params"], [(x, t)], out_ch=3, base_ch=8,
                       quant_up=True)
    assert set(qp.w8) >= {"up1", "up2", "up3"}
    got = np.asarray(quant_apply(qp, x, t))
    scale = max(1.0, float(np.abs(want).max()))
    assert np.abs(got - want).max() / scale < 0.25
    assert np.abs(got - want).mean() / scale < 0.05


def test_quant_denoise_fn_in_sampler(setup):
    """The quantized net slots into the fused DDIM scan unchanged."""
    from s1s2.core import Schedule
    from s1s2.sampling import ddim_anchored

    model, variables, x, t = setup
    cond = x[..., 3:]
    gt = jnp.clip(x[..., :3] * 0.1 + 0.5, 0, 1)
    qp = quantize_unet(variables["params"], [(x, t)], out_ch=3, base_ch=8)
    schedule = Schedule.cosine(10)
    fn = make_quant_denoise_fn(qp, cond)
    out = jax.jit(
        lambda gt, k: ddim_anchored(fn, gt, k, schedule, 8, 3)
    )(gt, jax.random.PRNGKey(2))
    out = np.asarray(out)
    assert out.shape == gt.shape
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_calibration_uses_max_over_batches(setup):
    _, variables, x, t = setup
    small = calibrate(variables["params"], [(x * 0.1, t)], out_ch=3, base_ch=8)
    both = calibrate(variables["params"], [(x * 0.1, t), (x, t)],
                     out_ch=3, base_ch=8)
    big = calibrate(variables["params"], [(x, t)], out_ch=3, base_ch=8)
    for k in big:
        assert both[k] == pytest.approx(big[k])
        assert small[k] <= big[k] + 1e-9


def test_evaluate_cli_int8(tmp_path):
    """--int8 drives the full eval harness through the quantized path."""
    from s1s2.data.synthetic import make_synthetic_patches

    patches = str(tmp_path / "patches")
    make_synthetic_patches(patches, n=4, size=16, seed=3)
    from s1s2.cli.evaluate import main as eval_main

    eval_main([
        "--mode", "ddim", "--patch_dir", patches, "--ckpt", "@random",
        "--out_dir", str(tmp_path / "o"), "--T", "10", "--base_ch", "4",
        "--pred_param", "eps", "--batch_size", "2",
        "--t_start", "5", "--ddim_steps", "2", "--int8",
    ])
    assert (tmp_path / "o" / "ddim_metrics.csv").exists()


def test_quant_cfg_denoise_matches_rule(setup):
    """int8 CFG: pred == uncond + g*(cond - uncond) computed from two plain
    quant forwards."""
    import jax.numpy as jnp

    from s1s2.models.quant import make_quant_cfg_denoise_fn

    model, variables, x, t = setup
    cond = x[..., 3:]
    qp = quantize_unet(variables["params"], [(x, t)], out_ch=3, base_ch=8)
    x_t = x[..., :3]
    g = 2.5
    fn = make_quant_cfg_denoise_fn(qp, cond, g)
    got = np.asarray(fn(x_t, t))
    pc = np.asarray(make_quant_denoise_fn(qp, cond)(x_t, t))
    pu = np.asarray(make_quant_denoise_fn(qp, jnp.zeros_like(cond))(x_t, t))
    np.testing.assert_allclose(got, pu + g * (pc - pu), rtol=0, atol=1e-4)


@pytest.mark.slow  # CLI end-to-end; unit siblings cover the mechanism in the default tier
def test_evaluate_cli_int8_cfg(tmp_path):
    """--int8 together with --guidance_scale drives the CFG-quantized path."""
    from s1s2.data.synthetic import make_synthetic_patches

    patches = str(tmp_path / "patches")
    make_synthetic_patches(patches, n=2, size=16, seed=3)
    from s1s2.cli.evaluate import main as eval_main

    eval_main([
        "--mode", "ddim", "--patch_dir", patches, "--ckpt", "@random",
        "--out_dir", str(tmp_path / "o"), "--T", "10", "--base_ch", "4",
        "--pred_param", "eps", "--batch_size", "2",
        "--t_start", "5", "--ddim_steps", "2", "--int8",
        "--guidance_scale", "1.5",
    ])
    assert (tmp_path / "o" / "ddim_metrics.csv").exists()


def test_save_load_quant_roundtrip(setup, tmp_path):
    """Serialized quantized artifact reproduces the exact forward."""
    import jax.numpy as jnp

    from s1s2.models.quant import load_quant, save_quant

    model, variables, x, t = setup
    qp = quantize_unet(variables["params"], [(x, t)], out_ch=3, base_ch=8)
    path = str(tmp_path / "m.int8.msgpack")
    save_quant(qp, path)
    qp2 = load_quant(path)
    a = np.asarray(quant_apply(qp, x, t))
    b = np.asarray(quant_apply(qp2, x, t))
    np.testing.assert_array_equal(a, b)
    assert qp2.out_ch == 3 and qp2.base_ch == 8
    assert qp2.act_scale == pytest.approx(qp.act_scale)


@pytest.mark.slow  # CLI end-to-end; unit siblings cover the mechanism in the default tier
def test_quantize_cli_then_evaluate_int8_ckpt(tmp_path):
    """Full production flow: quantize offline, evaluate serves the artifact
    (no --ckpt needed, no recalibration)."""
    import jax
    import jax.numpy as jnp

    from s1s2.data.synthetic import make_synthetic_patches
    from s1s2.models import UNetSmall
    from s1s2.train.checkpoint import save_model

    patches = str(tmp_path / "patches")
    make_synthetic_patches(patches, n=4, size=16, seed=3)
    model = UNetSmall(out_ch=4, base_ch=4)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 8)),
                   jnp.zeros((1,), jnp.int32))
    ckpt = str(tmp_path / "m.msgpack")
    save_model(v["params"], ckpt)

    from s1s2.cli.quantize import main as quantize_main

    art = str(tmp_path / "m.int8.msgpack")
    quantize_main(["--ckpt", ckpt, "--patch_dir", patches, "--out", art,
                   "--T", "10", "--base_ch", "4", "--t_start", "5"])
    assert os.path.exists(art)

    from s1s2.cli.evaluate import main as eval_main

    eval_main([
        "--mode", "ddim", "--patch_dir", patches,
        "--out_dir", str(tmp_path / "o"), "--T", "10", "--base_ch", "4",
        "--pred_param", "eps", "--batch_size", "2",
        "--t_start", "5", "--ddim_steps", "2", "--int8_ckpt", art,
    ])
    assert (tmp_path / "o" / "ddim_metrics.csv").exists()


def test_make_sampler_calib_matches_inline_recipe():
    """make_sampler_calib is the single definition of the historical inline
    calibration loops (bench.py, score_distill_full, EvalContext._quantize);
    committed verified MAEs depend on it staying byte-exact."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from s1s2.core import Schedule
    from s1s2.core.parametrize import q_sample
    from s1s2.models.quant import make_sampler_calib

    ab = Schedule.cosine(100).alpha_bar_np()
    gt = jax.random.uniform(jax.random.PRNGKey(2), (10, 8, 8, 4))
    cond = jax.random.normal(jax.random.PRNGKey(3), (10, 8, 8, 4))

    # fresh-noise recipe (key split once per tval, PRNGKey(5), first-8)
    ref, key = [], jax.random.PRNGKey(5)
    for tval in (99, 50, 20):
        key, sub = jax.random.split(key)
        x_t = q_sample(gt[:8], jax.random.normal(sub, gt[:8].shape),
                       float(np.sqrt(ab[tval])), float(np.sqrt(1.0 - ab[tval])))
        ref.append((jnp.concatenate([x_t, cond[:8]], -1),
                    jnp.full((8,), tval, jnp.int32)))
    out = make_sampler_calib(gt, cond, ab, (99, 50, 20))
    assert len(out) == len(ref)
    for (a, t1), (b, t2) in zip(ref, out):
        assert (a == b).all() and (t1 == t2).all()

    # fixed-noise variant reuses the SAME noise at every tval and draws no key
    noise = jax.random.normal(jax.random.PRNGKey(7), gt.shape)
    out = make_sampler_calib(gt, cond, ab, (50, 20), noise=noise)
    for (a, _), tval in zip(out, (50, 20)):
        x_c = q_sample(gt[:8], noise[:8], float(np.sqrt(ab[tval])),
                       float(np.sqrt(1.0 - ab[tval])))
        assert (a == jnp.concatenate([x_c, cond[:8]], -1)).all()

    # null_cond interleaves a zeroed-cond twin after each tval
    out = make_sampler_calib(gt, cond, ab, (50,), n=6, null_cond=True)
    assert len(out) == 2
    assert (out[1][0][..., 4:] == 0).all()
    assert (out[0][0][..., :4] == out[1][0][..., :4]).all()


def test_perchannel_act_scales_improve_or_match(setup):
    """act_perchannel folds per-input-channel scales into the weights —
    exact algebra (r4: the int8+CFG mitigation #2, BENCH_NOTES). The
    quantized forward must stay close to bf16 and the artifact must
    roundtrip the flag + vector scales."""
    import tempfile

    from s1s2.models.quant import load_quant, save_quant

    model, variables, x, t = setup
    ref = model.apply(variables, x, t)
    calib = [(x, t)]
    qp_pt = quantize_unet(variables["params"], calib, out_ch=3, base_ch=8)
    qp_pc = quantize_unet(variables["params"], calib, out_ch=3, base_ch=8,
                          act_perchannel=True)
    assert qp_pc.act_perchannel and not qp_pt.act_perchannel
    # per-channel scales are vectors sized to each conv's input channels
    for name, s in qp_pc.act_scale.items():
        assert np.ndim(s) == 1, name
    err_pt = float(jnp.abs(quant_apply(qp_pt, x, t) - ref).mean())
    err_pc = float(jnp.abs(quant_apply(qp_pc, x, t) - ref).mean())
    assert err_pc <= err_pt * 1.25  # finer resolution: not meaningfully worse
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "q.msgpack")
        save_quant(qp_pc, p)
        qp2 = load_quant(p)
        assert qp2.act_perchannel
        assert (quant_apply(qp2, x, t) == quant_apply(qp_pc, x, t)).all()


def test_bf16_blocks_excluded_from_quantization(setup):
    """bf16_blocks keeps named double-conv blocks out of w8 and the int8
    forward falls back to the bf16 conv for them (r4 mitigation #3)."""
    model, variables, x, t = setup
    ref = model.apply(variables, x, t)
    qp = quantize_unet(variables["params"], [(x, t)], out_ch=3, base_ch=8,
                       bf16_blocks=("conv1",))
    assert not any(k.startswith("conv1/") for k in qp.w8)
    assert any(k.startswith("down1/") for k in qp.w8)
    out = quant_apply(qp, x, t)
    qp_full = quantize_unet(variables["params"], [(x, t)], out_ch=3,
                            base_ch=8)
    err_partial = float(jnp.abs(out - ref).mean())
    err_full = float(jnp.abs(quant_apply(qp_full, x, t) - ref).mean())
    assert err_partial <= err_full + 1e-6  # strictly less quantized


def test_cfg_rollout_calib_states(setup):
    """make_cfg_rollout_calib returns (x_t, t) pairs from the guided
    trajectory with null-cond twins, aligned with the sampler grid."""
    from s1s2.core import Schedule
    from s1s2.models.quant import make_cfg_rollout_calib
    from s1s2.sampling.grids import round_unique_grid

    model, variables, x, t = setup
    cond = x[..., 3:]
    sch = Schedule.cosine(40)
    grid = round_unique_grid(39, 3, 40)
    calib = make_cfg_rollout_calib(model.apply, variables, cond, sch, grid,
                                   2.0, param="eps", n=2, out_ch=3)
    # one (cond, null) pair per grid transition, descending t
    assert len(calib) == 2 * (len(grid) - 0)
    ts = [int(c[1][0]) for c in calib[::2]]
    assert ts == sorted(ts, reverse=True)
    for (xc, t1), (xn, t2) in zip(calib[::2], calib[1::2]):
        assert (t1 == t2).all()
        assert (xn[..., 3:] == 0).all()          # null twin
        assert (xc[..., :3] == xn[..., :3]).all()  # same trajectory state


def test_cfg_rollout_calib_eps_linspace_grid(setup):
    """eps_linspace=(t_start, steps): the ε-family calibration walks the
    REFERENCE linspace grid/update (`_ddim_linspace_scan`) — the exact
    trajectory the cfg_sweep ε branch samples with (ADVICE r4) — so the
    calib timesteps equal linspace_grid(t_start, steps)[:-1]."""
    from s1s2.core import Schedule
    from s1s2.models.quant import make_cfg_rollout_calib
    from s1s2.sampling.grids import linspace_grid, round_unique_grid

    model, variables, x, t = setup
    cond = x[..., 3:]
    sch = Schedule.cosine(40)
    grid = round_unique_grid(39, 3, 40)
    calib = make_cfg_rollout_calib(model.apply, variables, cond, sch, grid,
                                   2.0, param="eps", n=2, out_ch=3,
                                   eps_linspace=(39, 4))
    ts = [int(c[1][0]) for c in calib[::2]]
    assert ts == list(linspace_grid(39, 4, 40)[:-1])
    for (xc, t1), (xn, t2) in zip(calib[::2], calib[1::2]):
        assert (t1 == t2).all()
        assert (xn[..., 3:] == 0).all()
