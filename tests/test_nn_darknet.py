"""Darknet/YOLO inference tests (cf. reference
cpp/test/Sara/NeuralNetworks and the bundled yolov4-tiny config)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from sara_tpu.nn import (
    parse_darknet_cfg, init_darknet_params, darknet_forward,
    yolo_decode, nms_boxes)

CFG = "/root/reference/trained_models/yolov4-tiny/yolov4-tiny.cfg"


def test_parse_cfg():
    cfg = parse_darknet_cfg(CFG)
    assert cfg[0]["type"] == "net"
    types = [s["type"] for s in cfg[1:]]
    assert "convolutional" in types
    assert "yolo" in types
    assert types.count("yolo") == 2  # v4-tiny has two heads


@pytest.mark.slow
def test_yolov4_tiny_forward_shapes():
    cfg = parse_darknet_cfg(CFG)
    params, out_ch = init_darknet_params(cfg)
    x = jnp.zeros((1, 416, 416, 3), jnp.float32)
    yolo_outs, outputs = darknet_forward(params, cfg, x)
    assert len(yolo_outs) == 2
    # Standard v4-tiny head shapes: 13x13 and 26x26 with 3*(5+80)=255 ch.
    shapes = sorted(tuple(o[1].shape[1:3]) for o in yolo_outs)
    assert shapes == [(13, 13), (26, 26)]
    for _, feat, sec in yolo_outs:
        assert feat.shape[-1] == 3 * (5 + int(sec["classes"]))


def test_yolo_decode_geometry():
    # Single-anchor synthetic head: logit 0 -> sigmoid 0.5 offsets.
    sec = {"anchors": "10,14", "mask": "0", "classes": "2"}
    Hf = Wf = 2
    feat = np.zeros((1, Hf, Wf, 1 * 7), np.float32)
    feat[0, 0, 0, 4] = 10.0   # high objectness at cell (0,0)
    feat[0, 0, 0, 5] = 10.0   # class 0
    out = yolo_decode(jnp.asarray(feat), sec, img_w=64, img_h=64,
                      conf_thres=0.5)
    m = np.asarray(out["mask"])
    assert m.sum() == 1
    box = np.asarray(out["boxes"])[m][0]
    # Cell (0,0) center offset sigmoid(0)=0.5 -> (0.5/2)*64 = 16.
    np.testing.assert_allclose(box[:2], [16.0, 16.0], atol=1e-4)
    np.testing.assert_allclose(box[2:], [10.0, 14.0], atol=1e-4)
    assert int(np.asarray(out["cls"])[m][0]) == 0


def test_nms_suppresses_overlaps():
    boxes = jnp.asarray([
        [10.0, 10, 8, 8],
        [11.0, 10, 8, 8],    # overlaps the first
        [40.0, 40, 8, 8],
    ])
    scores = jnp.asarray([0.9, 0.8, 0.7])
    mask = jnp.ones(3, bool)
    idx, keep = nms_boxes(boxes, scores, mask, iou_thres=0.45, max_out=4)
    idx, keep = np.asarray(idx), np.asarray(keep)
    kept = set(idx[keep].tolist())
    assert kept == {0, 2}


@pytest.mark.slow
def test_real_cfg_weights_roundtrip_and_torch_parity():
    """Real yolov4-tiny architecture e2e without trained weights:
    (1) binary .weights round-trip (save -> load == original);
    (2) forward parity against an independent torch executor of the same
        cfg — trained weights would add nothing numerically."""
    import tempfile

    import torch
    import torch.nn.functional as tF

    from sara_tpu.nn import save_darknet_weights
    from sara_tpu.nn.darknet import load_darknet_weights

    cfg = parse_darknet_cfg(CFG)
    params, _ = init_darknet_params(cfg, seed=3)

    with tempfile.NamedTemporaryFile(suffix=".weights") as f:
        save_darknet_weights(cfg, params, f.name)
        loaded, header = load_darknet_weights(cfg, f.name)
    for i, sec in enumerate(cfg[1:]):
        if sec["type"] != "convolutional":
            continue
        for k in params[i]:
            np.testing.assert_allclose(np.asarray(loaded[i][k]),
                                       np.asarray(params[i][k]), atol=0)

    # Torch executor for the v4-tiny layer set.
    rs = np.random.RandomState(0)
    x_np = rs.rand(1, 160, 160, 3).astype(np.float32)
    yolo_outs, outputs = darknet_forward(params, cfg, jnp.asarray(x_np))

    xt = torch.from_numpy(x_np.transpose(0, 3, 1, 2))
    outs_t = []
    cur = xt
    for i, sec in enumerate(cfg[1:]):
        t = sec["type"]
        if t == "convolutional":
            p = params[i]
            w = torch.from_numpy(
                np.asarray(p["w"], np.float32).transpose(3, 2, 0, 1))
            stride = int(sec.get("stride", 1))
            k = int(sec.get("size", 1))
            pad = (k - 1) // 2 if int(sec.get("pad", 0)) else 0
            y = tF.conv2d(cur, w, stride=stride, padding=pad,
                          groups=int(sec.get("groups", 1)))
            if "gamma" in p:
                mean = torch.from_numpy(np.asarray(p["mean"], np.float32))
                var = torch.from_numpy(np.asarray(p["var"], np.float32))
                gam = torch.from_numpy(np.asarray(p["gamma"], np.float32))
                bet = torch.from_numpy(np.asarray(p["beta"], np.float32))
                y = (y - mean[None, :, None, None]) / torch.sqrt(
                    var[None, :, None, None] + 1e-5)
                y = y * gam[None, :, None, None] + bet[None, :, None, None]
            else:
                y = y + torch.from_numpy(
                    np.asarray(p["bias"], np.float32))[None, :, None, None]
            if sec.get("activation") == "leaky":
                y = tF.leaky_relu(y, 0.1)
        elif t == "route":
            layers = [int(v) for v in sec["layers"].split(",")]
            parts = [outs_t[l if l >= 0 else len(outs_t) + l]
                     for l in layers]
            y = torch.cat(parts, dim=1) if len(parts) > 1 else parts[0]
            g = int(sec.get("groups", 1))
            if g > 1:
                gid = int(sec.get("group_id", 0))
                cs = y.shape[1] // g
                y = y[:, gid * cs:(gid + 1) * cs]
        elif t == "maxpool":
            k = int(sec.get("size", 2))
            stride = int(sec.get("stride", k))
            pad = (k - 1) // 2
            y = tF.max_pool2d(cur, k, stride=stride, padding=pad)
        elif t == "upsample":
            y = tF.interpolate(cur, scale_factor=int(sec.get("stride", 2)),
                               mode="nearest")
        elif t == "yolo":
            y = cur
        else:
            y = cur
        outs_t.append(y)
        cur = y

    for (idx, feat, _sec) in yolo_outs:
        ours = np.asarray(feat)                         # (1, H, W, C)
        theirs = outs_t[idx].numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=1e-3)
