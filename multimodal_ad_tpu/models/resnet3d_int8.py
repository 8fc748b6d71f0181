"""Post-training int8 inference for the 3D ResNet family (all depths).

v5e's MXU runs int8 at 2x the bf16 rate (394 TOPS vs 197 TFLOP/s), and the
flagship's FLOPs concentrate in two dilated conv stages where the measured
int8 advantage is real (stage4 1.70x, stage3 1.43x —
benchmarks/int8_probe.py). This module converts a TRAINED fp ResNet3D
(reference models/resnet.py:40-264 architecture) into an int8 inference
graph:

- BatchNorm is folded into each conv: y = conv(x)*g + b with
  g = scale/sqrt(var+eps), b = bias - mean*g — inference-only, so running
  statistics are exact constants,
- weights quantize symmetrically PER OUTPUT CHANNEL (w_q = round(w/s_c),
  s_c = max|w[..., c]|/127): channel scales ride the existing dequant
  multiply, so finer weight granularity is free,
- activations quantize symmetrically PER TENSOR with STATIC scales
  calibrated offline (max|h| over calibration batches / 127): no dynamic
  range computation in the serving graph,
- the conv itself runs int8 x int8 -> int32 on the MXU
  (`preferred_element_type=int32`); dequant + folded-BN bias + relu fuse
  into the surrounding elementwise ops,
- the stem (3.4% of FLOPs, C_in=1) and the classifier head stay bf16 —
  the standard first/last-layer exemption, and the s2d stem path is reused
  unchanged,
- residual adds happen in float between blocks (the int8 tensors exist
  only across each conv).

Usage:
    variables = {"params": ..., "batch_stats": ...}   # trained fp model
    qp = export_int8(variables, depth=18, shortcut_type="B")
    scales = calibrate_int8(qp, calibration_batches)  # few real batches
    logits = resnet3d_int8_apply(qp, scales, x)       # jit-able

Accuracy/perf are measured on the real chip by benchmarks/int8_infer.py
(results in benchmarks/ROOFLINE.md).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .resnet3d import _STEM_S2D_IDX, DEPTH_BLOCKS, max_pool_3d

_DN = ("NDHWC", "DHWIO", "NDHWC")


def _fold_bn(kernel, bn_p, bn_s, eps=1e-5):
    """Fold inference-mode BatchNorm into the preceding bias-free conv."""
    g = bn_p["scale"] / np.sqrt(np.asarray(bn_s["var"]) + eps)
    b = bn_p["bias"] - bn_s["mean"] * g
    return np.asarray(kernel) * g, np.asarray(b, np.float32)


def _quant_weight(w):
    """Symmetric per-output-channel int8: returns (w_q int8, s (C,) f32)."""
    s = np.max(np.abs(w), axis=(0, 1, 2, 3)) / 127.0 + 1e-12
    wq = np.clip(np.rint(w / s), -127, 127).astype(np.int8)
    return wq, s.astype(np.float32)


def export_int8(variables, depth: int = 18, shortcut_type: str = "B"):
    """Fold BN + quantize every stage conv of a trained ResNet3D
    (BasicBlock depths 10/18/34 and Bottleneck depths 50/101/152/200).

    Returns a host pytree ("qparams"): int8 kernels + per-channel scales +
    folded biases per block conv, bf16-path stem/head weights, and the
    block geometry needed to rebuild the forward."""
    kind, layers = DEPTH_BLOCKS[depth]
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    qp = {
        "stem": {
            "kernel": params["Conv_0"]["kernel"],
            "bn": (params["BatchNorm_0"], stats["BatchNorm_0"]),
        },
        "blocks": [],
        "dense": params.get("Dense_0"),
        "shortcut_type": shortcut_type,
    }
    # stem BN is NOT folded (the stem conv has no bias parameter in the
    # bf16 path; folding is trivial but keeping BN explicit reuses the
    # exact fp stem). Precompute its inference-mode affine instead:
    bn_p, bn_s = qp["stem"]["bn"]
    g = bn_p["scale"] / np.sqrt(bn_s["var"] + 1e-5)
    qp["stem"]["g"] = g.astype(np.float32)
    qp["stem"]["b"] = (bn_p["bias"] - bn_s["mean"] * g).astype(np.float32)

    expansion = 1 if kind == "basic" else 4
    prefix = "BasicBlock" if kind == "basic" else "Bottleneck"
    stage_spec = [(64, 1, 1), (128, 2, 1), (256, 1, 2), (512, 1, 4)]
    bi_global = 0
    in_planes = 64
    for (planes, stride0, dilation), n_blocks in zip(stage_spec, layers):
        for bi in range(n_blocks):
            stride = stride0 if bi == 0 else 1
            bp = params[f"{prefix}_{bi_global}"]
            bs = stats[f"{prefix}_{bi_global}"]

            def folded_q(j):
                w, b = _fold_bn(bp[f"ConvBN_{j}"]["Conv_0"]["kernel"],
                                bp[f"ConvBN_{j}"]["BatchNorm_0"],
                                bs[f"ConvBN_{j}"]["BatchNorm_0"])
                wq, s = _quant_weight(w)
                return {"wq": wq, "s": s, "b": b,
                        "w_fp": w.astype(np.float32)}

            out_planes = planes * expansion
            block = {"kind": kind, "stride": stride, "dilation": dilation,
                     "planes": out_planes, "down": None,
                     "conv1": folded_q(0), "conv2": folded_q(1)}
            n_main = 2
            if kind == "bottleneck":
                block["conv3"] = folded_q(2)
                n_main = 3
            needs_down = stride != 1 or in_planes != out_planes
            if needs_down and shortcut_type == "B":
                block["down"] = folded_q(n_main)
            elif needs_down:  # shortcut A: parameter-free
                block["down"] = "A"
            qp["blocks"].append(block)
            bi_global += 1
            in_planes = out_planes
    return qp


def _conv_i8(xq, wq, stride, dilation, kernel):
    pad = dilation * (kernel - 1) // 2
    return jax.lax.conv_general_dilated(
        xq, wq, (stride,) * 3, ((pad, pad),) * 3,
        rhs_dilation=(dilation,) * 3,
        dimension_numbers=jax.lax.conv_dimension_numbers(
            xq.shape, wq.shape, _DN),
        preferred_element_type=jnp.int32)


def _conv_fp(x, w, stride, dilation, kernel):
    pad = dilation * (kernel - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride,) * 3, ((pad, pad),) * 3,
        rhs_dilation=(dilation,) * 3,
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, w.shape, _DN))


def _quantize(h, scale):
    q = jnp.round(h.astype(jnp.float32) / scale)
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def _stem_bf16(qp, x):
    """bf16 space-to-depth stem (same packing as StemConv) + folded BN
    affine + relu + maxpool."""
    k = jnp.asarray(qp["stem"]["kernel"], jnp.bfloat16)
    c_in = k.shape[3]
    feats = k.shape[4]
    idx = jnp.asarray(_STEM_S2D_IDX.reshape(-1))
    w_flat = k.reshape(343, c_in, feats)
    w2 = jnp.where((idx >= 0)[:, None, None],
                   jnp.take(w_flat, jnp.maximum(idx, 0), axis=0), 0)
    w2 = w2.reshape(4, 4, 4, 8 * c_in, feats)
    x = x.astype(jnp.bfloat16)
    b, D, H, W, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (0, D % 2), (0, H % 2), (0, W % 2), (0, 0)))
    Dp, Hp, Wp = xp.shape[1:4]
    xs = xp.reshape(b, Dp // 2, 2, Hp // 2, 2, Wp // 2, 2, c_in)
    xs = xs.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    xs = xs.reshape(b, Dp // 2, Hp // 2, Wp // 2, 8 * c_in)
    h = jax.lax.conv_general_dilated(
        xs, w2, (1, 1, 1), ((2, 1),) * 3,
        dimension_numbers=jax.lax.conv_dimension_numbers(
            xs.shape, w2.shape, _DN))
    h = h.astype(jnp.float32) * qp["stem"]["g"] + qp["stem"]["b"]
    h = jax.nn.relu(h).astype(jnp.bfloat16)
    return max_pool_3d(h, 3, 2, 1)


def _shortcut_a(x, planes, stride):
    # ShortcutA = window-1 strided avg pool (== strided slicing) + zero
    # channel pad (resnet3d.py::ShortcutA)
    if stride != 1:
        x = x[:, ::stride, ::stride, ::stride, :]
    pad = planes - x.shape[-1]
    if pad > 0:
        x = jnp.pad(x, ((0, 0),) * 4 + ((0, pad),))
    return x


def _block_scale_keys(qp):
    """Quant-point names per block, in the exact order _forward observes
    them: input, first mid; Bottleneck blocks add a second mid."""
    keys = []
    for i, blk in enumerate(qp["blocks"]):
        keys += [f"b{i}_in", f"b{i}_mid"]
        if blk.get("kind", "basic") == "bottleneck":
            keys.append(f"b{i}_mid2")
    return keys


def _forward(qp, scales, x, quantized: bool, observe: bool):
    """Shared folded forward. quantized=False runs the folded fp graph
    (used for calibration, observe=True collects per-point max|h|)."""
    h = _stem_bf16(qp, x)
    maxes = []

    def qconv(inp, kd, stride, dil, ksize, s_act):
        """One folded conv step -> fp pre-activation output.
        `inp` is (int8 tensor, scale) when quantized else an fp tensor."""
        if quantized:
            o = _conv_i8(inp, jnp.asarray(kd["wq"]), stride, dil, ksize)
            return o.astype(jnp.float32) * (s_act * kd["s"]) + kd["b"]
        return _conv_fp(inp.astype(jnp.bfloat16),
                        jnp.asarray(kd["w_fp"], jnp.bfloat16),
                        stride, dil, ksize).astype(jnp.float32) + kd["b"]

    for i, blk in enumerate(qp["blocks"]):
        stride, dil = blk["stride"], blk["dilation"]
        bneck = blk.get("kind", "basic") == "bottleneck"
        if observe:
            maxes.append(jnp.max(jnp.abs(h.astype(jnp.float32))))
        s_in = scales[f"b{i}_in"] if quantized else None
        hq = _quantize(h, s_in) if quantized else h
        # main path. BasicBlock: 3^3(stride,dil) -> relu -> 3^3(1,dil).
        # Bottleneck: 1^3 -> relu -> 3^3(stride,dil) -> relu -> 1^3.
        if bneck:
            a = jax.nn.relu(qconv(hq, blk["conv1"], 1, 1, 1, s_in))
        else:
            a = jax.nn.relu(qconv(hq, blk["conv1"], stride, dil, 3, s_in))
        if observe:
            maxes.append(jnp.max(jnp.abs(a)))
        s_mid = scales[f"b{i}_mid"] if quantized else None
        aq = _quantize(a, s_mid) if quantized else a
        if bneck:
            a2 = jax.nn.relu(qconv(aq, blk["conv2"], stride, dil, 3, s_mid))
            if observe:
                maxes.append(jnp.max(jnp.abs(a2)))
            s_mid2 = scales[f"b{i}_mid2"] if quantized else None
            a2q = _quantize(a2, s_mid2) if quantized else a2
            o = qconv(a2q, blk["conv3"], 1, 1, 1, s_mid2)
        else:
            o = qconv(aq, blk["conv2"], 1, dil, 3, s_mid)
        if blk["down"] is None:
            r = h.astype(jnp.float32)
        elif blk["down"] == "A":
            r = _shortcut_a(h.astype(jnp.float32), blk["planes"], stride)
        else:
            r = qconv(hq, blk["down"], stride, 1, 1, s_in)
        h = jax.nn.relu(o + r).astype(jnp.bfloat16)
    pooled = jnp.mean(h.astype(jnp.float32), axis=(1, 2, 3))
    if qp["dense"] is None:
        return pooled, maxes
    # jnp (not np) so qp array leaves may be tracers — the serving path
    # vmaps one compiled graph over stacked fold parameters
    logits = pooled @ jnp.asarray(qp["dense"]["kernel"], jnp.float32) \
        + jnp.asarray(qp["dense"]["bias"], jnp.float32)
    return logits, maxes


def calibrate_int8(qp, batches) -> dict:
    """Static activation scales from the folded FP graph: per quant point,
    max|h| over all calibration batches / 127."""
    fwd = jax.jit(partial(_forward, qp, None, quantized=False, observe=True))
    agg = None
    for x in batches:
        _, maxes = fwd(x=jnp.asarray(x))
        m = np.asarray(jax.device_get(maxes), np.float64)
        agg = m if agg is None else np.maximum(agg, m)
    if agg is None:
        raise ValueError("calibrate_int8 got no calibration batches — pass "
                         "at least one (n, X, Y, Z, C) array")
    return {k: float(v / 127.0 + 1e-12)
            for k, v in zip(_block_scale_keys(qp), agg)}


def observe_maxes(qp, x):
    """Traced-friendly calibration observer: folded-fp forward returning
    the per-quant-point max|h| vector (stackable, vmap-able over folds)."""
    _, maxes = _forward(qp, None, x, quantized=False, observe=True)
    return jnp.stack(maxes)


def strip_fp(qp):
    """Drop the fp shadow kernels (calibration-only) so serving-side
    stacking/upload carries just the int8 tensors + scales + biases."""
    def walk(o):
        if isinstance(o, dict):
            return {k: walk(v) for k, v in o.items() if k != "w_fp"}
        if isinstance(o, list):
            return [walk(v) for v in o]
        return o

    return walk(qp)


def split_arrays(qp):
    """(skeleton, array leaves) — every np.ndarray leaf becomes an indexed
    placeholder so fold-stacked arrays can be vmapped through ONE compiled
    graph (weights as traced args, not per-fold HLO constants)."""
    arrays = []

    def walk(o):
        if isinstance(o, np.ndarray):
            arrays.append(o)
            return ("__arr__", len(arrays) - 1)
        if isinstance(o, dict):
            return {k: walk(v) for k, v in o.items()}
        if isinstance(o, list):
            return [walk(v) for v in o]
        return o

    return walk(qp), arrays


def rehydrate(skeleton, arrays):
    """Inverse of split_arrays (arrays may be traced jnp values)."""
    def walk(o):
        if isinstance(o, tuple) and len(o) == 2 and o[0] == "__arr__":
            return arrays[o[1]]
        if isinstance(o, dict):
            return {k: walk(v) for k, v in o.items()}
        if isinstance(o, list):
            return [walk(v) for v in o]
        return o

    return walk(skeleton)


def resnet3d_int8_apply(qp, scales, x):
    """int8 inference forward -> (B, num_classes) fp32 logits (or pooled
    embeddings when the model had no classifier head)."""
    logits, _ = _forward(qp, scales, x, quantized=True, observe=False)
    return logits


def resnet3d_folded_apply(qp, x):
    """Folded fp forward (BN constants baked in, bf16 convs) — the
    quantization-free twin used to validate folding and by calibration."""
    logits, _ = _forward(qp, None, x, quantized=False, observe=False)
    return logits


def save_int8(path: str, qp, scales: dict) -> str:
    """Persist a quantized model (one .npz): int8 kernels, per-channel
    weight scales, folded biases, stem/head weights, block geometry, and
    the calibrated activation scales — so serving processes load the
    artifact instead of re-exporting + re-calibrating. The fp shadow
    kernels (`w_fp`, used only for calibration) are NOT saved: the int8
    artifact is ~4x smaller than the fp checkpoint."""
    import json

    arrays = {"stem_kernel": qp["stem"]["kernel"],
              "stem_g": qp["stem"]["g"], "stem_b": qp["stem"]["b"]}
    geom = {"shortcut_type": qp["shortcut_type"],
            "has_dense": qp["dense"] is not None,
            "scales": scales, "blocks": []}
    if qp["dense"] is not None:
        arrays["dense_kernel"] = np.asarray(qp["dense"]["kernel"])
        arrays["dense_bias"] = np.asarray(qp["dense"]["bias"])
    for i, blk in enumerate(qp["blocks"]):
        names = ["conv1", "conv2"] + (
            ["conv3"] if blk.get("kind", "basic") == "bottleneck" else [])
        down = blk["down"]
        if isinstance(down, dict):
            names.append("down")
        for name in names:
            kd = blk[name] if name != "down" else down
            arrays[f"b{i}_{name}_wq"] = kd["wq"]
            arrays[f"b{i}_{name}_s"] = kd["s"]
            arrays[f"b{i}_{name}_b"] = kd["b"]
        geom["blocks"].append({
            "kind": blk.get("kind", "basic"), "stride": blk["stride"],
            "dilation": blk["dilation"], "planes": blk["planes"],
            "down": ("conv" if isinstance(down, dict) else down)})
    np.savez_compressed(path, __geometry__=json.dumps(geom), **arrays)
    return path


def load_int8(path: str):
    """Load a `save_int8` artifact -> (qparams, activation scales).
    The returned qparams run `resnet3d_int8_apply` directly (no fp shadow
    kernels, so `resnet3d_folded_apply`/`calibrate_int8` need the original
    checkpoint instead)."""
    import json

    z = np.load(path, allow_pickle=False)
    geom = json.loads(str(z["__geometry__"]))
    qp = {"shortcut_type": geom["shortcut_type"],
          "stem": {"kernel": z["stem_kernel"], "g": z["stem_g"],
                   "b": z["stem_b"]},
          "dense": ({"kernel": z["dense_kernel"], "bias": z["dense_bias"]}
                    if geom["has_dense"] else None),
          "blocks": []}
    for i, g in enumerate(geom["blocks"]):
        blk = {"kind": g["kind"], "stride": g["stride"],
               "dilation": g["dilation"], "planes": g["planes"],
               "down": None}
        names = ["conv1", "conv2"] + (
            ["conv3"] if g["kind"] == "bottleneck" else [])
        if g["down"] == "conv":
            names.append("down")
        elif g["down"] == "A":
            blk["down"] = "A"
        for name in names:
            kd = {"wq": z[f"b{i}_{name}_wq"], "s": z[f"b{i}_{name}_s"],
                  "b": z[f"b{i}_{name}_b"]}
            if name == "down":
                blk["down"] = kd
            else:
                blk[name] = kd
        qp["blocks"].append(blk)
    return qp, dict(geom["scales"])
