"""int8 inference path for UNetSmall — post-training quantization (s1s2
EXTENSION; the reference has no quantization anywhere).

Why: the v5e MXU runs int8 at 2× the bf16 rate. Measured on-chip with the
fused-requant conv chain this path is built from: 362 TOP/s int8 vs
138 TFLOP/s bf16 at the UNet's hot shapes (tools/probe_pallas_int8.py,
2.6×). XLA fuses the whole requant epilogue (scale → bias → ReLU →
round/clip/cast) into the conv, so the quantized network stays MXU-bound.

Design (validated by the probe):
* **weights**: symmetric per-OUTPUT-channel int8; scales from |w|max/127.
* **activations**: symmetric per-tensor int8 with STATIC scales calibrated
  offline (absmax over calibration batches through the bf16 model), so the
  jitted graph has no data-dependent scale computation.
* only the hot 3×3 double-conv blocks run int8; `inc` (9→96, trivial
  FLOPs, carries the raw-integer t channel), the 2×2 transposed convs and
  the 1×1 `outc` head stay bf16 — they are a few % of the FLOPs and keep
  the quantization error off the skip/up paths' endpoints.
* same parameter tree as UNetSmall (models/unet.py): quantization is a
  pure function of a trained checkpoint — no retraining, any reference
  .pth converted by models/convert.py quantizes the same way.

Functional (not flax): the forward mirrors UNetSmall.__call__
(`Train_Orignal.py:110-147` topology) but takes a QuantParams pytree.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_BLOCKS = ("down1", "down2", "down3", "conv3", "conv2", "conv1")
_UPS = ("up3", "up2", "up1")


@dataclasses.dataclass
class QuantParams:
    """int8 weights + scales for the double-conv blocks; the untouched
    bf16/f32 params for everything else."""

    params: Any  # original UNetSmall param tree (inc/up*/outc read from it)
    w8: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]  # name -> (w8, sw_perco)
    bias: Dict[str, jnp.ndarray]
    act_scale: Dict[str, Any]  # conv input absmax/127: float, or (Ci,) array
    out_ch: int = 4
    base_ch: int = 96
    stem_s2d: int = 1  # space-to-depth stem factor (UNetSmall.stem_s2d)
    # per-INPUT-channel activation scales, folded into the weights before
    # weight quantization (x8 = round(x/sx_ci); w~ = w·sx_ci quantized
    # per-Co; dequant = acc·sw alone — exact algebra, finer resolution for
    # low-range channels). Default off: per-tensor matches every committed
    # evidence row.
    act_perchannel: bool = False


def _conv_names():
    for blk in _BLOCKS:
        for c in ("conv1", "conv2"):
            yield f"{blk}/{c}"


def quantize_weights(params, quant_up: bool = False,
                     act_scales=None,
                     bf16_blocks: Tuple[str, ...] = ()) -> Tuple[Dict, Dict]:
    """Per-output-channel symmetric int8 for every double-conv kernel
    (+ the 2×2 transposed-conv kernels when ``quant_up``).

    ``act_scales``: per-input-channel activation scales to FOLD into the
    kernels before quantization (act_perchannel mode): w̃ = w·sx_ci, so the
    int8 matmul of round(x/sx_ci) against round(w̃/sw) dequantizes with sw
    alone — exact per-channel algebra at zero runtime cost."""
    w8, bias = {}, {}
    names = [n for n in _conv_names()
             if n.split("/")[0] not in bf16_blocks]
    names += list(_UPS) if quant_up else []
    for name in names:
        if "/" in name:
            blk, c = name.split("/")
            p = params[blk][c]
        else:
            p = params[name]
        w = np.asarray(p["kernel"], np.float32)  # (3,3,Ci,Co) / (2,2,Ci,Co)
        if act_scales is not None:
            sx = np.asarray(act_scales[name], np.float32)  # (Ci,)
            w = w * sx[None, None, :, None]
        sw = np.abs(w).reshape(-1, w.shape[-1]).max(axis=0) / 127.0
        sw = np.maximum(sw, 1e-12)
        q = np.clip(np.round(w / sw), -127, 127).astype(np.int8)
        w8[name] = (jnp.asarray(q), jnp.asarray(sw.astype(np.float32)))
        bias[name] = jnp.asarray(np.asarray(p["bias"], np.float32))
    return w8, bias


# ---------------------------------------------------------------------------
# shared forward skeleton: one code path computes BOTH the calibration
# (bf16 convs, records conv-input absmax) and the quantized inference
# (int8 convs with static scales) so the topology cannot drift
# ---------------------------------------------------------------------------


def _conv_bf16(x, kernel, b, dt=jnp.bfloat16):
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x.astype(dt), kernel.astype(dt), (1, 1), "SAME",
        dimension_numbers=dn, preferred_element_type=dt)
    return y + b.astype(dt)


def _convt_2x2(x, kernel, b, dt=jnp.bfloat16):
    # flax ConvTranspose semantics: kernel (2,2,Ci,Co), stride 2, VALID
    y = jax.lax.conv_transpose(
        x.astype(dt), kernel.astype(dt), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=False, preferred_element_type=dt)
    return y + b.astype(dt)


def _pool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf if x.dtype != jnp.int8 else jnp.int8(-128), jax.lax.max,
        (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _forward(qp: QuantParams, x_and_cond, t_idx, *, mode: str,
             records=None):
    """mode='calib': bf16 blocks, append (name, absmax) to records.
    mode='int8': int8 blocks with static qp.act_scale."""
    params = qp.params
    dt = jnp.bfloat16
    s = qp.stem_s2d
    xf = x_and_cond.astype(jnp.float32)
    if s > 1:  # mirror UNetSmall's s2d stem (models/unet.py)
        from s1s2.ops.pixel_shuffle import space_to_depth

        xf = space_to_depth(xf, s)
    B, H, W, _ = xf.shape
    t_map = jnp.broadcast_to(
        t_idx.astype(jnp.float32).reshape(B, 1, 1, 1), (B, H, W, 1))
    x = jnp.concatenate([xf, t_map], -1).astype(dt)

    def block_conv(x, name):
        blk, c = name.split("/")
        if mode == "calib":
            ax = jnp.abs(x.astype(jnp.float32))
            records[name] = (jnp.max(ax, axis=(0, 1, 2))
                             if qp.act_perchannel else jnp.max(ax))
            p = params[blk][c]
            return jax.nn.relu(_conv_bf16(x, p["kernel"], p["bias"]))
        if name not in qp.w8:  # bf16_blocks escape hatch (CFG error budget)
            p = params[blk][c]
            return jax.nn.relu(_conv_bf16(x, p["kernel"], p["bias"]))
        w8, sw = qp.w8[name]
        sx = qp.act_scale[name]  # scalar, or (Ci,) broadcasting over NHWC
        x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127
                      ).astype(jnp.int8)
        dn = jax.lax.conv_dimension_numbers(x8.shape, w8.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        acc = jax.lax.conv_general_dilated(
            x8, w8, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        deq = sw if qp.act_perchannel else sx * sw  # sx folded into w8
        y = acc.astype(jnp.float32) * deq + qp.bias[name]
        return jax.nn.relu(y).astype(dt)

    def block(x, blk):
        x = block_conv(x, f"{blk}/conv1")
        return block_conv(x, f"{blk}/conv2")

    def up_conv(x, name):
        p = params[name]
        if mode == "calib":
            ax = jnp.abs(x.astype(jnp.float32))
            records[name] = (jnp.max(ax, axis=(0, 1, 2))
                             if qp.act_perchannel else jnp.max(ax))
            return _convt_2x2(x, p["kernel"], p["bias"])
        if name not in qp.w8:  # default: transposed convs stay bf16
            return _convt_2x2(x, p["kernel"], p["bias"])
        w8, sw = qp.w8[name]
        sx = qp.act_scale[name]
        x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127
                      ).astype(jnp.int8)
        acc = jax.lax.conv_transpose(
            x8, w8, (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=False, preferred_element_type=jnp.int32)
        deq = sw if qp.act_perchannel else sx * sw
        y = acc.astype(jnp.float32) * deq + qp.bias[name]
        return y.astype(dt)

    e1 = jax.nn.relu(_conv_bf16(x, params["inc"]["kernel"],
                                params["inc"]["bias"]))
    e2 = _pool(block(e1, "down1"))
    e3 = _pool(block(e2, "down2"))
    e4 = _pool(block(e3, "down3"))

    u3 = up_conv(e4, "up3")
    d3 = block(jnp.concatenate([u3, e3], -1), "conv3")
    u2 = up_conv(d3, "up2")
    d2 = block(jnp.concatenate([u2, e2], -1), "conv2")
    u1 = up_conv(d2, "up1")
    d1 = block(jnp.concatenate([u1, e1], -1), "conv1")

    out = _conv_bf16(d1, params["outc"]["kernel"], params["outc"]["bias"])
    if s > 1:  # sub-pixel head back to full resolution
        from s1s2.ops.pixel_shuffle import depth_to_space

        out = depth_to_space(out, s)
    return out.astype(jnp.float32)


def calibrate(params, batches, out_ch: int = 4, base_ch: int = 96,
              stem_s2d: int = 1, per_channel: bool = False):
    """absmax of every double-conv input over calibration batches —
    per-tensor scalars (default) or per-input-channel vectors.

    batches: iterable of (x_and_cond (B,H,W,Cc+Ct), t_idx (B,)) — use
    representative (cond, x_t, t) triples from the sampler's own range of
    timesteps for faithful activation ranges.
    """
    qp = QuantParams(params, {}, {}, {}, out_ch, base_ch, stem_s2d,
                     act_perchannel=per_channel)

    @jax.jit
    def one(x, t):
        rec: Dict[str, jnp.ndarray] = {}
        _forward(qp, x, t, mode="calib", records=rec)
        return rec

    mx: Dict[str, Any] = {}
    for x, t in batches:
        rec = one(jnp.asarray(x), jnp.asarray(t))
        for k, v in rec.items():
            v = np.asarray(v) if per_channel else float(v)
            mx[k] = v if k not in mx else np.maximum(mx[k], v)
    if per_channel:
        return {k: np.maximum(v, 1e-6).astype(np.float32) / 127.0
                for k, v in mx.items()}
    return {k: max(v, 1e-6) / 127.0 for k, v in mx.items()}


def make_sampler_calib(gt, cond, alpha_bar, tvals, *, key=None, n: int = 8,
                       noise=None, null_cond: bool = False):
    """Sampler-representative calibration batches for ``quantize_unet``.

    Builds ``(x_and_cond, t_idx)`` pairs where ``x_t = q_sample(gt)`` at each
    timestep in ``tvals`` — the tensors the denoiser actually sees inside a
    sampler loop. One definition for every bench/eval/scoring entry point so
    the quantization recipe can't drift between the throughput measurement
    and the quality evidence it cites.

    - ``key``: PRNG key split once per tval for the forward-noise draw
      (default ``PRNGKey(5)``, the historical recipe).
    - ``noise``: use this fixed (n,H,W,C) tensor at EVERY tval instead of
      drawing per-tval noise (bench_quality_matched's variant).
    - ``null_cond``: also emit a zeroed-cond twin per tval so CFG's
      unconditional pass is calibrated (`EvalContext.quantize`).
    """
    from s1s2.core.parametrize import q_sample

    gt, cond = gt[:n], cond[:n]
    if key is None:
        key = jax.random.PRNGKey(5)
    calib = []
    for tval in tvals:
        if noise is None:
            key, sub = jax.random.split(key)
            eps = jax.random.normal(sub, gt.shape)
        else:
            eps = noise[:n]
        x_t = q_sample(gt, eps, float(np.sqrt(alpha_bar[tval])),
                       float(np.sqrt(1.0 - alpha_bar[tval])))
        t_vec = jnp.full((gt.shape[0],), tval, jnp.int32)
        calib.append((jnp.concatenate([x_t, cond], -1), t_vec))
        if null_cond:
            calib.append((jnp.concatenate([x_t, jnp.zeros_like(cond)], -1),
                          t_vec))
    return calib


def make_cfg_rollout_calib(apply_fn, variables, cond, schedule, grid,
                           guidance_scale: float, *, param, key=None,
                           n: int = 8, eta: float = 0.0, out_ch: int = 4,
                           eps_linspace=None):
    """Guided-ROLLOUT calibration batches: the (x_t, t) states an actual
    bf16 CFG pure-generation trajectory visits, instead of teacher-forced
    ``q_sample(gt)`` states.

    Why: guidance extrapolates ``pu + g·(pc − pu)`` — at g≫1 the
    intermediate x_t leave the range spanned by forward-diffused GT, so
    q_sample-calibrated activation scales CLIP the guided trajectory and
    int8 MAE degrades monotonically with g (the r3 measured failure,
    examples/results_synthetic/CFG_Sweep/cfg_sweep_summary_int8.csv).
    Calibrating on the trajectory the quantized sampler will actually walk
    removes that mismatch. Scales are g-specific — re-calibrate per
    guidance scale (weight quantization is unchanged; only the 12 absmax
    scalars differ).

    Returns calib batches [(x_and_cond, t), (x_and_nullcond, t), …] for
    ``quantize_unet`` — null twins included since CFG runs both branches.

    ``eps_linspace=(t_start, steps)`` makes the ε-family rollout walk the
    REFERENCE linspace grid/update rule (`_ddim_linspace_scan` — what the
    cfg_sweep ε branch actually samples with) instead of the round-unique
    ``grid``; without it the ε calibration trajectory only approximates the
    sampled one (ADVICE r4). The v family always uses ``grid`` + ``eta``
    via ``ddim_grid_sample``, exactly the sweep's sampler.
    """
    from s1s2.core.parametrize import Parameterization
    from s1s2.sampling import ddim_grid_sample, make_cfg_denoise_fn
    from s1s2.sampling.samplers import _ddim_linspace_scan

    cond = jnp.asarray(cond)[:n]
    if key is None:
        key = jax.random.PRNGKey(5)
    param = Parameterization(param)
    ab = schedule.alpha_bar_np()
    K = int(np.asarray(grid)[-1])
    scale = 1.0 if param is Parameterization.EPS else float(
        np.sqrt(1.0 - ab[min(max(K, 1), schedule.T - 1)]))

    @jax.jit
    def rollout(cond_b, k):
        noise = jax.random.normal(
            k, cond_b.shape[:3] + (out_ch,), jnp.float32) * scale
        fn = make_cfg_denoise_fn(apply_fn, variables, cond_b,
                                 float(guidance_scale))
        if param is Parameterization.EPS and eps_linspace is not None:
            t_start, steps = eps_linspace
            _, (ts, traj) = _ddim_linspace_scan(
                fn, noise, schedule, int(t_start), int(steps), (0.0, 1.0),
                return_traj=True)
            return ts, traj
        _, (ts, traj) = ddim_grid_sample(
            fn, noise, jax.random.PRNGKey(0), schedule,
            grid, param, eta=eta, return_traj=True)
        return ts, traj

    ts, traj = rollout(cond, key)
    ts, traj = np.asarray(ts), np.asarray(traj)  # (S,), (S, n, H, W, C)
    calib = []
    zero = jnp.zeros_like(cond)
    for i in range(len(ts)):
        x_t = jnp.asarray(traj[i])
        t_vec = jnp.full((cond.shape[0],), int(ts[i]), jnp.int32)
        calib.append((jnp.concatenate([x_t, cond], -1), t_vec))
        calib.append((jnp.concatenate([x_t, zero], -1), t_vec))
    return calib


def quantize_unet(params, calib_batches, out_ch: int = 4,
                  base_ch: int = 96, quant_up: bool = False,
                  stem_s2d: int = 1,
                  act_perchannel: bool = False,
                  bf16_blocks: Tuple[str, ...] = ()) -> QuantParams:
    """One-call post-training quantization of a trained UNetSmall.

    ``quant_up`` additionally runs the 2×2 transposed convs in int8 (they
    are ~10% of the FLOPs and the int8↔bf16 dtype boundary); default off —
    measure the MAE delta before enabling (tools/bench_int8.py --quant_up).
    ``stem_s2d`` must match the checkpoint's UNetSmall.stem_s2d.
    ``act_perchannel`` folds per-input-channel activation scales into the
    weights (finer resolution; reduces per-branch quant noise under CFG).
    ``bf16_blocks``: double-conv block names (e.g. ``("conv1",)``) left in
    bf16 — the finest decoder block feeds the output head directly, so its
    quantization noise is unattenuated and g-amplified under CFG; running
    it bf16 trades ~1/3 of the int8 speedup for output-path fidelity.
    """
    scales = calibrate(params, calib_batches, out_ch, base_ch, stem_s2d,
                       per_channel=act_perchannel)
    # per-channel folding needs scales for EVERY quantized conv — the
    # _UPS entries exist in `scales` only if quant_up convs were calibrated
    # (they are: calib records up3/up2/up1 inputs too)
    w8, bias = quantize_weights(params, quant_up=quant_up,
                                act_scales=scales if act_perchannel else None,
                                bf16_blocks=tuple(bf16_blocks))
    return QuantParams(params, w8, bias, scales, out_ch, base_ch, stem_s2d,
                       act_perchannel=act_perchannel)


def quant_apply(qp: QuantParams, x_and_cond, t_idx):
    """Drop-in for UNetSmall.apply(variables, x, t) — same signature shape."""
    return _forward(qp, x_and_cond, t_idx, mode="int8")


def make_quant_denoise_fn(qp: QuantParams, cond):
    """Sampler-facing closure, mirroring sampling.make_denoise_fn."""

    def fn(x_t, t):
        return quant_apply(qp, jnp.concatenate(
            [x_t.astype(jnp.float32), cond.astype(jnp.float32)], -1), t)

    return fn


def save_quant(qp: QuantParams, path: str) -> None:
    """Serialize a quantized model (weights + scales + the bf16 residue of
    the param tree) to one msgpack artifact, so serving skips calibration."""
    from flax import serialization

    blob = {
        "params": jax.tree_util.tree_map(np.asarray, qp.params),
        "w8": {k: {"q": np.asarray(q), "s": np.asarray(s)}
               for k, (q, s) in qp.w8.items()},
        "bias": {k: np.asarray(v) for k, v in qp.bias.items()},
        "act_scale": {k: np.asarray(v, np.float32)
                      for k, v in qp.act_scale.items()},
        "meta": {"out_ch": np.int32(qp.out_ch),
                 "base_ch": np.int32(qp.base_ch),
                 "stem_s2d": np.int32(qp.stem_s2d),
                 "act_perchannel": np.int32(qp.act_perchannel)},
    }
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(blob))


def load_quant(path: str) -> QuantParams:
    from flax import serialization

    with open(path, "rb") as f:
        blob = serialization.msgpack_restore(f.read())
    return QuantParams(
        params=jax.tree_util.tree_map(jnp.asarray, blob["params"]),
        w8={k: (jnp.asarray(v["q"]), jnp.asarray(v["s"]))
            for k, v in blob["w8"].items()},
        bias={k: jnp.asarray(v) for k, v in blob["bias"].items()},
        act_scale={k: (float(v) if np.ndim(v) == 0 else jnp.asarray(v))
                   for k, v in blob["act_scale"].items()},
        out_ch=int(blob["meta"]["out_ch"]),
        base_ch=int(blob["meta"]["base_ch"]),
        stem_s2d=int(blob["meta"].get("stem_s2d", 1)),
        act_perchannel=bool(int(blob["meta"].get("act_perchannel", 0))),
    )


def make_quant_cfg_denoise_fn(qp: QuantParams, cond, guidance_scale: float,
                              null_cond=None):
    """Classifier-free guidance through the quantized net — same stacked
    one-forward formulation as sampling.make_cfg_denoise_fn (cond and
    null-cond batched together), so guidance costs one int8 forward."""
    if null_cond is None:
        null_cond = jnp.zeros_like(cond)
    both = jnp.concatenate([cond, null_cond], axis=0).astype(jnp.float32)
    g = float(guidance_scale)

    def fn(x_t, t):
        x2 = jnp.concatenate([x_t, x_t], axis=0).astype(jnp.float32)
        t2 = jnp.concatenate([t, t], axis=0)
        pred = quant_apply(qp, jnp.concatenate([x2, both], axis=-1), t2)
        pc, pu = jnp.split(pred, 2, axis=0)
        return pu + g * (pc - pu)

    return fn
