"""Space-to-depth stem students (UNetSmall.stem_s2d, distill --student_s2d).

The s2d stem is a TPU throughput lever for narrow distilled students: the
full-resolution encoder/decoder stages of a width-N student are memory- and
lane-bound (N ≪ the 128-wide MXU lane dimension), so folding each s×s input
block onto the channel axis and running the whole body at (H/s, W/s) with a
sub-pixel head buys ~s× lane utilization and s² fewer VPU positions at
matched FLOPs. These tests pin the algebra (s2d/d2s inverses), the module
contract (shape, grads, quant path, checkpoint round-trip), and the CLI
plumbing end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s1s2.models import UNetSmall
from s1s2.ops.pixel_shuffle import depth_to_space, space_to_depth


def test_s2d_d2s_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 12, 3))
    for s in (2, 4):
        y = space_to_depth(x, s)
        assert y.shape == (2, 8 // s, 12 // s, s * s * 3)
        np.testing.assert_array_equal(np.asarray(depth_to_space(y, s)),
                                      np.asarray(x))


def test_s2d_block_ordering():
    """Block-major (di, dj, c) channel order: channel k of the s2d output at
    (i, j) is input channel k%C at pixel (s*i + (k//C)//s, s*j + (k//C)%s)."""
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 3))
    y = np.asarray(space_to_depth(x, 2))
    xn = np.asarray(x)
    for di in range(2):
        for dj in range(2):
            blk = y[0, :, :, (di * 2 + dj) * 3:(di * 2 + dj) * 3 + 3]
            np.testing.assert_array_equal(blk, xn[0, di::2, dj::2, :])


def test_unet_s2d_forward_shape_and_grads():
    model = UNetSmall(out_ch=4, base_ch=4, stem_s2d=2,
                      compute_dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 8))
    t = jnp.array([3, 7], jnp.int32)
    v = model.init(jax.random.PRNGKey(0), x, t)
    out = model.apply(v, x, t)
    assert out.shape == (2, 16, 16, 4)
    assert out.dtype == jnp.float32
    # inc consumes C·s² + 1 channels (one raw-t channel at body resolution);
    # outc emits out_ch·s²
    assert v["params"]["inc"]["kernel"].shape[2] == 8 * 4 + 1
    assert v["params"]["outc"]["kernel"].shape[3] == 4 * 4

    def loss(p):
        return jnp.mean(model.apply({"params": p}, x, t) ** 2)

    g = jax.grad(loss)(v["params"])
    gnorm = float(jax.tree_util.tree_reduce(
        lambda a, q: a + jnp.abs(q).sum(), g, jnp.float32(0.0)))
    assert np.isfinite(gnorm) and gnorm > 0


def test_unet_s2d_default_is_reference_topology():
    """stem_s2d=1 must leave the param tree bit-identical to the pre-knob
    module (converted .pth checkpoints stay drop-in)."""
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 8))
    t = jnp.zeros((1,), jnp.int32)
    a = UNetSmall(out_ch=4, base_ch=4, compute_dtype=jnp.float32)
    b = UNetSmall(out_ch=4, base_ch=4, stem_s2d=1, compute_dtype=jnp.float32)
    va = a.init(jax.random.PRNGKey(0), x, t)
    vb = b.init(jax.random.PRNGKey(0), x, t)
    jax.tree_util.tree_map(
        lambda p, q: np.testing.assert_array_equal(np.asarray(p),
                                                   np.asarray(q)), va, vb)
    np.testing.assert_array_equal(np.asarray(a.apply(va, x, t)),
                                  np.asarray(b.apply(vb, x, t)))


def test_quant_path_s2d(tmp_path):
    """calib-mode _forward mirrors the flax s2d module; int8 mode runs and
    save/load preserves stem_s2d."""
    from s1s2.models.quant import (load_quant, quant_apply, quantize_unet,
                                   save_quant)

    model = UNetSmall(out_ch=4, base_ch=4, stem_s2d=2)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 16, 8), jnp.float32)
    t = jnp.array([5, 9], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]

    qp = quantize_unet(params, [(x, t)], out_ch=4, base_ch=4, stem_s2d=2)
    ref = np.asarray(model.apply({"params": params}, x, t))
    out = np.asarray(quant_apply(qp, x, t))
    assert out.shape == ref.shape == (2, 16, 16, 4)
    # int8 vs bf16: same topology, quantization noise only
    assert float(np.abs(out - ref).mean()) < 0.25 * float(
        np.abs(ref).mean() + 1e-3)

    path = str(tmp_path / "q.msgpack")
    save_quant(qp, path)
    qp2 = load_quant(path)
    assert qp2.stem_s2d == 2
    np.testing.assert_allclose(np.asarray(quant_apply(qp2, x, t)), out,
                               atol=1e-6)


@pytest.mark.slow  # 30-90 s on the 1-CPU box; covered by faster siblings in the default tier
def test_distill_cli_student_s2d(tmp_path):
    """--student_s2d trains an s2d student end-to-end through the CLI; the
    saved checkpoint loads against the s2d template and evaluates."""
    from s1s2.cli import distill as cli_distill
    from s1s2.data.synthetic import make_synthetic_patches
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
        "--batch_size", "2", "--base_ch", "4", "--student_base_ch", "8",
        "--student_s2d", "2", "--compute_dtype", "float32",
        "--skip_progressive", "--endpoint_epochs", "1",
        "--endpoint_seeds", "1", "--endpoint_teacher_steps", "2",
    ]
    cli_distill.main(args)
    s2d = UNetSmall(out_ch=4, base_ch=8, stem_s2d=2,
                    compute_dtype=jnp.float32)
    template = s2d.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 8), jnp.float32),
        jnp.zeros((1,), jnp.int32))["params"]
    params = load_any_checkpoint(student_path, template=template)
    out = s2d.apply({"params": params},
                    jnp.zeros((1, 16, 16, 8), jnp.float32),
                    jnp.zeros((1,), jnp.int32))
    assert out.shape == (1, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()

    # arch change requires endpoint-only mode
    bad = [a for a in args if a != "--skip_progressive"]
    with pytest.raises(SystemExit):
        cli_distill.main(bad)


@pytest.mark.slow  # CLI end-to-end; unit siblings cover the mechanism in the default tier
def test_quantize_cli_s2d(tmp_path):
    """quantize --s2d writes an int8 artifact whose meta preserves the stem
    factor, and evaluate --int8_ckpt serves it without recalibration."""
    from s1s2.cli import quantize as cli_quant
    from s1s2.data.synthetic import make_synthetic_patches
    from s1s2.models.quant import load_quant, quant_apply
    from s1s2.train.checkpoint import save_model

    patches = str(tmp_path / "patches")
    make_synthetic_patches(patches, n=4, size=16, seed=0)
    model = UNetSmall(out_ch=4, base_ch=8, stem_s2d=2,
                      compute_dtype=jnp.float32)
    ckpt = str(tmp_path / "s2d.msgpack")
    save_model(model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 8), jnp.float32),
        jnp.zeros((1,), jnp.int32))["params"], ckpt)

    out = str(tmp_path / "s2d.int8.msgpack")
    cli_quant.main(["--ckpt", ckpt, "--patch_dir", patches, "--out", out,
                    "--base_ch", "8", "--s2d", "2", "--T", "50",
                    "--t_start", "25", "--n_calib", "2"])
    qp = load_quant(out)
    assert qp.stem_s2d == 2
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 16, 16, 8), jnp.float32)
    pred = np.asarray(quant_apply(qp, x, jnp.zeros((1,), jnp.int32)))
    assert pred.shape == (1, 16, 16, 4) and np.isfinite(pred).all()


@pytest.mark.slow  # CLI end-to-end; unit siblings cover the mechanism in the default tier
def test_infer_scene_cli_s2d(tmp_path):
    """infer_scene --s2d runs an s2d checkpoint over a tiled scene (int8
    calibration included) and writes a finite stitched prediction."""
    from s1s2.cli import infer_scene as cli_scene
    from s1s2.train.checkpoint import save_model

    model = UNetSmall(out_ch=4, base_ch=8, stem_s2d=2,
                      compute_dtype=jnp.float32)
    ckpt = str(tmp_path / "s2d.msgpack")
    save_model(model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 8), jnp.float32),
        jnp.zeros((1,), jnp.int32))["params"], ckpt)
    scene = np.random.default_rng(0).normal(
        size=(24, 24, 4)).astype(np.float32)
    np.save(str(tmp_path / "scene.npy"), scene)

    out_dir = str(tmp_path / "out")
    cli_scene.main([
        "--scene", str(tmp_path / "scene.npy"), "--ckpt", ckpt,
        "--out_dir", out_dir, "--base_ch", "8", "--s2d", "2", "--T", "50",
        "--t_start", "25", "--ddim_steps", "2", "--patch_size", "16",
        "--stride", "8", "--batch_size", "2", "--int8",
    ])
    pred = np.load(f"{out_dir}/scene_pred.npy")
    assert pred.shape == (4, 24, 24) and np.isfinite(pred).all()


@pytest.mark.slow  # CLI end-to-end; unit siblings cover the mechanism in the default tier
def test_evaluate_cli_s2d(tmp_path):
    """evaluate --s2d drives the harness (bf16-quant path included) on an
    s2d checkpoint."""
    from s1s2.cli import evaluate as cli_eval
    from s1s2.data.synthetic import make_synthetic_patches
    from s1s2.train.checkpoint import save_model

    patches = str(tmp_path / "patches")
    make_synthetic_patches(patches, n=4, size=16, seed=0)
    model = UNetSmall(out_ch=4, base_ch=8, stem_s2d=2,
                      compute_dtype=jnp.float32)
    ckpt = str(tmp_path / "s2d.msgpack")
    save_model(model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 8), jnp.float32),
        jnp.zeros((1,), jnp.int32))["params"], ckpt)

    out_dir = str(tmp_path / "out")
    cli_eval.main([
        "--patch_dir", patches, "--ckpt", ckpt, "--out_dir", out_dir,
        "--mode", "ddim", "--base_ch", "8", "--s2d", "2", "--T", "50",
        "--t_start", "25", "--ddim_steps", "2", "--batch_size", "2",
        "--compute_dtype", "float32", "--max_files", "2", "--int8",
        "--save_viz_n", "0",
    ])
    import csv
    import os

    csvs = [f for f in os.listdir(out_dir) if f.endswith(".csv")]
    assert csvs
    with open(os.path.join(out_dir, csvs[0])) as f:
        rows = list(csv.DictReader(f))
    assert rows and all(
        np.isfinite(float(r["MAE"])) for r in rows if "MAE" in r)
