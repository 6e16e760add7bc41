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
