"""Darknet config parsing + functional JAX inference + YOLO decoding.

TPU-native rebuild of the reference's Darknet stack
(reference: cpp/src/DO/Sara/NeuralNetworks/Darknet/Parser.hpp [cfg+weights
parsing], Network.hpp [forward], YoloUtilities.hpp [box decode + NMS];
python mirror at python/oddkiva/shakti/inference/darknet/network.py).

Design: the network is a list of parameter pytrees + a pure forward function
(NHWC, ``lax.conv_general_dilated`` -> MXU); YOLO box decoding and NMS are
fixed-capacity masked programs.
"""

from __future__ import annotations

import functools
from typing import Dict, List

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


# ---------------------------------------------------------------------------
# Config parsing (host).
# ---------------------------------------------------------------------------

def parse_darknet_cfg(path: str) -> List[Dict]:
    """Parse a .cfg into a list of {type, **options} dicts
    (reference: Darknet/Parser.hpp)."""
    sections = []
    cur = None
    with open(path) as f:
        for raw in f:
            line = raw.split("#")[0].strip()
            if not line:
                continue
            if line.startswith("["):
                cur = {"type": line.strip("[]")}
                sections.append(cur)
            elif "=" in line and cur is not None:
                k, v = line.split("=", 1)
                cur[k.strip()] = v.strip()
    return sections


def _get(sec, key, default=None, cast=str):
    v = sec.get(key)
    return default if v is None else cast(v)


def _int_list(s):
    return [int(x) for x in s.split(",") if x.strip() != ""]


# ---------------------------------------------------------------------------
# Parameter construction / weight loading.
# ---------------------------------------------------------------------------

def init_darknet_params(cfg: List[Dict], seed: int = 0):
    """Random-init parameters; returns (params list aligned with layer
    sections, output channel count per layer)."""
    rs = np.random.RandomState(seed)
    net = cfg[0]
    channels = int(net.get("channels", 3))
    params = []
    out_ch = []
    for sec in cfg[1:]:
        t = sec["type"]
        if t == "convolutional":
            f = int(sec["filters"])
            k = int(sec["size"])
            bn = int(sec.get("batch_normalize", 0))
            groups = int(sec.get("groups", 1))
            in_ch = channels // groups
            w = rs.normal(scale=0.05, size=(k, k, in_ch, f)).astype(np.float32)
            p = {"w": jnp.asarray(w)}
            if bn:
                p["gamma"] = jnp.ones((f,), jnp.float32)
                p["beta"] = jnp.zeros((f,), jnp.float32)
                p["mean"] = jnp.zeros((f,), jnp.float32)
                p["var"] = jnp.ones((f,), jnp.float32)
            else:
                p["bias"] = jnp.zeros((f,), jnp.float32)
            params.append(p)
            channels = f
        elif t == "route":
            layers = _int_list(sec["layers"])
            groups = int(sec.get("groups", 1))
            ch = 0
            for l in layers:
                idx = l if l >= 0 else len(out_ch) + l
                ch += out_ch[idx]
            channels = ch // groups
            params.append(None)
        elif t in ("shortcut", "maxpool", "upsample", "yolo"):
            params.append(None)
            # channels unchanged
        else:
            params.append(None)
        out_ch.append(channels)
    return params, out_ch


def load_darknet_weights(cfg: List[Dict], path: str):
    """Load the binary .weights format: 5 int32 header then float32 params
    in layer order (bn: beta, gamma, mean, var; else bias; then conv weights
    OIHW) (reference: Darknet/Parser.hpp load_weights)."""
    params, out_ch = init_darknet_params(cfg)
    with open(path, "rb") as f:
        header = np.fromfile(f, np.int32, 5)
        buf = np.fromfile(f, np.float32)
    pos = 0

    def take(n):
        nonlocal pos
        out = buf[pos: pos + n]
        pos += n
        return out

    channels = int(cfg[0].get("channels", 3))
    prev_ch = [channels]
    for i, sec in enumerate(cfg[1:]):
        t = sec["type"]
        in_ch_full = prev_ch[-1] if i == 0 else None
        if t == "convolutional":
            p = params[i]
            k, _, in_ch, fout = p["w"].shape
            if "gamma" in p:
                p["beta"] = jnp.asarray(take(fout))
                p["gamma"] = jnp.asarray(take(fout))
                p["mean"] = jnp.asarray(take(fout))
                p["var"] = jnp.asarray(take(fout))
            else:
                p["bias"] = jnp.asarray(take(fout))
            w = take(fout * in_ch * k * k).reshape(fout, in_ch, k, k)
            p["w"] = jnp.asarray(w.transpose(2, 3, 1, 0))  # OIHW -> HWIO
        prev_ch.append(None)
    assert pos == len(buf), f"weight file mismatch: used {pos}/{len(buf)}"
    return params, header


def save_darknet_weights(cfg: List[Dict], params, path: str,
                         header=(0, 2, 5, 0, 0)):
    """Write params in the binary Darknet .weights format (the exact
    inverse of :func:`load_darknet_weights`) — lets the round-trip be
    tested on the real yolov4-tiny architecture without shipping trained
    weights (none in-tree, no egress)."""
    chunks = [np.asarray(header, np.int32).tobytes()]
    for i, sec in enumerate(cfg[1:]):
        if sec["type"] != "convolutional":
            continue
        p = params[i]
        if "gamma" in p:
            for key in ("beta", "gamma", "mean", "var"):
                chunks.append(np.asarray(p[key], np.float32).tobytes())
        else:
            chunks.append(np.asarray(p["bias"], np.float32).tobytes())
        w = np.asarray(p["w"], np.float32).transpose(3, 2, 0, 1)  # HWIO->OIHW
        chunks.append(w.tobytes())
    with open(path, "wb") as f:
        f.write(b"".join(chunks))


# ---------------------------------------------------------------------------
# Forward pass.
# ---------------------------------------------------------------------------

def _activate(x, name):
    if name == "leaky":
        return jnp.where(x > 0, x, 0.1 * x)
    if name == "mish":
        return x * jnp.tanh(jax.nn.softplus(x))
    if name in ("linear", "logistic"):
        return jax.nn.sigmoid(x) if name == "logistic" else x
    return x


def darknet_forward(params, cfg: List[Dict], x: jnp.ndarray):
    """Run the network. x: (N, H, W, C) float. Returns list of YOLO head
    outputs (raw feature maps) and the list of all layer outputs."""
    outputs = []
    yolo_outs = []
    for i, sec in enumerate(cfg[1:]):
        t = sec["type"]
        if t == "convolutional":
            p = params[i]
            stride = int(sec.get("stride", 1))
            k = int(sec.get("size", 1))
            pad = (k - 1) // 2 if int(sec.get("pad", 0)) else 0
            groups = int(sec.get("groups", 1))
            y = lax.conv_general_dilated(
                x, p["w"], window_strides=(stride, stride),
                padding=[(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups)
            if "gamma" in p:
                y = (y - p["mean"]) / jnp.sqrt(p["var"] + 1e-5)
                y = y * p["gamma"] + p["beta"]
            else:
                y = y + p["bias"]
            y = _activate(y, sec.get("activation", "linear"))
        elif t == "route":
            layers = _int_list(sec["layers"])
            groups = int(sec.get("groups", 1))
            gid = int(sec.get("group_id", 0))
            parts = []
            for l in layers:
                idx = l if l >= 0 else len(outputs) + l
                parts.append(outputs[idx])
            y = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]
            if groups > 1:
                cs = y.shape[-1] // groups
                y = y[..., gid * cs:(gid + 1) * cs]
        elif t == "shortcut":
            frm = int(sec["from"])
            idx = frm if frm >= 0 else len(outputs) + frm
            y = outputs[-1] + outputs[idx]
            y = _activate(y, sec.get("activation", "linear"))
        elif t == "maxpool":
            k = int(sec.get("size", 2))
            stride = int(sec.get("stride", k))
            pad = (k - 1) // 2
            y = lax.reduce_window(
                x, -jnp.inf, lax.max, (1, k, k, 1), (1, stride, stride, 1),
                [(0, 0), (pad, pad), (pad, pad), (0, 0)])
        elif t == "upsample":
            s = int(sec.get("stride", 2))
            y = jnp.repeat(jnp.repeat(x, s, axis=1), s, axis=2)
        elif t == "yolo":
            y = x
            yolo_outs.append((i, x, sec))
        else:
            y = x
        outputs.append(y)
        x = y
    return yolo_outs, outputs


# ---------------------------------------------------------------------------
# YOLO decoding + NMS (reference: Darknet/YoloUtilities.hpp).
# ---------------------------------------------------------------------------

def yolo_decode(feat: jnp.ndarray, sec: Dict, img_w: int, img_h: int,
                conf_thres: float = 0.25):
    """Decode one YOLO head: (1, Hf, Wf, A*(5+C)) -> flat boxes.

    Returns dict with boxes (N, 4) as (cx, cy, w, h) in pixels, score (N,),
    cls (N,), mask (N,)."""
    anchors = _int_list(sec["anchors"])
    mask_idx = _int_list(sec["mask"])
    num_classes = int(sec["classes"])
    A = len(mask_idx)
    _, Hf, Wf, _ = feat.shape
    f = feat.reshape(Hf, Wf, A, 5 + num_classes)

    xs = jax.nn.sigmoid(f[..., 0])
    ys = jax.nn.sigmoid(f[..., 1])
    scale_xy = float(sec.get("scale_x_y", 1.0))
    if scale_xy != 1.0:
        xs = xs * scale_xy - 0.5 * (scale_xy - 1.0)
        ys = ys * scale_xy - 0.5 * (scale_xy - 1.0)
    gx = jnp.arange(Wf, dtype=jnp.float32)[None, :, None]
    gy = jnp.arange(Hf, dtype=jnp.float32)[:, None, None]
    cx = (xs + gx) / Wf * img_w
    cy = (ys + gy) / Hf * img_h
    aw = jnp.asarray([anchors[2 * m] for m in mask_idx], jnp.float32)
    ah = jnp.asarray([anchors[2 * m + 1] for m in mask_idx], jnp.float32)
    # Darknet anchors are in network-input pixels; rescale to image pixels.
    net_w = img_w
    net_h = img_h
    bw = jnp.exp(f[..., 2]) * aw[None, None, :] / net_w * img_w
    bh = jnp.exp(f[..., 3]) * ah[None, None, :] / net_h * img_h
    obj = jax.nn.sigmoid(f[..., 4])
    cls_prob = jax.nn.sigmoid(f[..., 5:])
    score = obj[..., None] * cls_prob
    best_cls = jnp.argmax(score, axis=-1)
    best_score = jnp.max(score, axis=-1)

    boxes = jnp.stack([cx, cy, bw, bh], axis=-1).reshape(-1, 4)
    return {
        "boxes": boxes,
        "score": best_score.reshape(-1),
        "cls": best_cls.reshape(-1).astype(jnp.int32),
        "mask": best_score.reshape(-1) >= conf_thres,
    }


@functools.partial(jax.jit, static_argnames=("max_out",))
def nms_boxes(boxes, scores, mask, iou_thres: float = 0.45, max_out: int = 64):
    """Greedy class-agnostic NMS over (cx, cy, w, h) boxes, fixed capacity.

    Returns (indices (max_out,), keep_mask (max_out,))."""
    x1 = boxes[:, 0] - boxes[:, 2] / 2
    y1 = boxes[:, 1] - boxes[:, 3] / 2
    x2 = boxes[:, 0] + boxes[:, 2] / 2
    y2 = boxes[:, 1] + boxes[:, 3] / 2
    area = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)

    def iou_with(i):
        xx1 = jnp.maximum(x1[i], x1)
        yy1 = jnp.maximum(y1[i], y1)
        xx2 = jnp.minimum(x2[i], x2)
        yy2 = jnp.minimum(y2[i], y2)
        inter = jnp.maximum(xx2 - xx1, 0) * jnp.maximum(yy2 - yy1, 0)
        return inter / jnp.maximum(area[i] + area - inter, 1e-9)

    s = jnp.where(mask, scores, -jnp.inf)

    def body(k, state):
        s, idx, keep = state
        i = jnp.argmax(s).astype(jnp.int32)
        ok = s[i] > -jnp.inf
        idx = idx.at[k].set(i)
        keep = keep.at[k].set(ok)
        suppress = (iou_with(i) > iou_thres) | (jnp.arange(len(s)) == i)
        s = jnp.where(suppress, -jnp.inf, s)
        return s, idx, keep

    idx0 = jnp.zeros((max_out,), jnp.int32)
    keep0 = jnp.zeros((max_out,), bool)
    _, idx, keep = jax.lax.fori_loop(0, max_out, body, (s, idx0, keep0))
    return idx, keep
