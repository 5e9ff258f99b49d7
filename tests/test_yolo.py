"""YOLOv8 JAX port: parity vs torch reference (BN folding, full graph),
DFL decode, NMS, detector wrapper, detailer SEG integration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lightdiffusion_tpu.models import yolo as Y


@pytest.fixture(scope="module")
def torch_pair():
    torch = pytest.importorskip("torch")
    from tests.torch_ldm_ref import MiniYolo

    torch.manual_seed(0)
    model = MiniYolo(nc=2, seg=True).eval()
    # BN running stats need non-trivial values: run a forward in train mode
    with torch.no_grad():
        model.train()
        model(torch.randn(2, 3, 64, 64))
        model.eval()
    sd = {"model." + k: v.numpy() for k, v in model.state_dict().items()}
    params, cfg = Y.convert_yolov8(sd)
    return model, params, cfg


def test_config_detect(torch_pair):
    _, _, cfg = torch_pair
    assert cfg.nc == 2 and cfg.seg and cfg.width == 0.125


def test_yolo_parity(torch_pair):
    import torch

    model, params, cfg = torch_pair
    x = np.random.RandomState(0).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        (outs, protos, coeffs) = model(torch.from_numpy(x))
    out = Y.yolo_apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)), cfg)

    ref_boxes = np.concatenate(
        [o[0].permute(0, 2, 3, 1).reshape(1, -1, 4 * cfg.reg_max).numpy() for o in outs],
        axis=1,
    )
    ref_cls = np.concatenate(
        [o[1].permute(0, 2, 3, 1).reshape(1, -1, cfg.nc).numpy() for o in outs],
        axis=1,
    )
    np.testing.assert_allclose(
        np.asarray(out["boxes_raw"]), ref_boxes, atol=2e-4, rtol=2e-3
    )
    np.testing.assert_allclose(np.asarray(out["cls"]), ref_cls, atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out["protos"]),
        protos.permute(0, 2, 3, 1).numpy(), atol=2e-4, rtol=2e-3,
    )


def test_dfl_decode_math():
    # one anchor, deterministic logits: distance = softmax-expectation
    reg_max = 16
    logits = np.zeros((1, 1, 4 * reg_max), np.float32)
    logits[0, 0, 3] = 100.0  # l = 3
    logits[0, 0, reg_max + 1] = 100.0  # t = 1
    logits[0, 0, 2 * reg_max + 2] = 100.0  # r = 2
    logits[0, 0, 3 * reg_max + 4] = 100.0  # b = 4
    out = {
        "boxes_raw": logits,
        "anchors": np.array([[10.0, 20.0]], np.float32),
        "strides": np.array([8.0], np.float32),
    }
    boxes = Y.decode_boxes(out, reg_max)
    np.testing.assert_allclose(
        boxes[0, 0], [(10 - 3) * 8, (20 - 1) * 8, (10 + 2) * 8, (20 + 4) * 8],
        atol=1e-3,
    )


def test_nms():
    boxes = np.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], np.float32
    )
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = Y.nms(boxes, scores, iou_thresh=0.5)
    assert list(keep) == [0, 2]


def test_detector_wrapper_runs(torch_pair):
    _, params, cfg = torch_pair
    det = Y.YoloDetector(params, cfg, {0: "person", 1: "face"}, input_size=64)
    img = np.random.RandomState(0).rand(96, 80, 3).astype(np.float32)
    boxes, scores, labels, masks = det(img, conf=0.0)
    assert boxes.shape[1] == 4
    if len(boxes):
        assert boxes[:, 0].min() >= 0 and boxes[:, 2].max() <= 80
        assert boxes[:, 3].max() <= 96
        assert masks is None or masks.shape[1:] == (96, 80)


def test_segs_pipeline_integration(torch_pair):
    _, params, cfg = torch_pair
    from lightdiffusion_tpu.postprocess.detailer import bboxes_to_segs

    det = Y.YoloDetector(params, cfg, input_size=64)
    img = np.random.RandomState(1).rand(64, 64, 3).astype(np.float32)
    boxes, scores, labels, masks = det(img, conf=0.0)
    segs = bboxes_to_segs(img, boxes, scores, labels, threshold=0.0,
                          dilation=2, crop_factor=2.0, drop_size=1,
                          masks=masks)
    for s in segs:
        x1, y1, x2, y2 = s.crop_region
        assert s.cropped_mask.shape == (y2 - y1, x2 - x1)
        assert s.cropped_image.shape == (y2 - y1, x2 - x1, 3)
