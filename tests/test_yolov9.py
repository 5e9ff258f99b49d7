"""YOLOv9 (GELAN) port: parity vs torch reference incl. RepConvN fusion."""

import numpy as np
import jax.numpy as jnp
import pytest

from lightdiffusion_tpu.models import yolo as Y


@pytest.fixture(scope="module")
def torch_pair():
    torch = pytest.importorskip("torch")
    from tests.torch_ldm_ref import MiniYolo9

    torch.manual_seed(0)
    model = MiniYolo9(nc=2, c=16).eval()
    with torch.no_grad():
        model.train(); model(torch.randn(2, 3, 64, 64)); model.eval()
    sd = {"model." + k: v.numpy() for k, v in model.state_dict().items()}
    assert Y.is_yolov9_state_dict(sd)
    params, cfg = Y.convert_yolov9(sd)
    return model, params, cfg


def test_yolov9_parity(torch_pair):
    import torch

    model, params, cfg = torch_pair
    x = np.random.RandomState(0).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        outs = model(torch.from_numpy(x))
    out = Y.yolov9_apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)), cfg)
    ref_boxes = np.concatenate(
        [o[0].permute(0, 2, 3, 1).reshape(1, -1, 4 * cfg.reg_max).numpy() for o in outs],
        axis=1,
    )
    ref_cls = np.concatenate(
        [o[1].permute(0, 2, 3, 1).reshape(1, -1, cfg.nc).numpy() for o in outs],
        axis=1,
    )
    np.testing.assert_allclose(
        np.asarray(out["boxes_raw"]), ref_boxes, atol=5e-4, rtol=5e-3
    )
    np.testing.assert_allclose(np.asarray(out["cls"]), ref_cls, atol=5e-4, rtol=5e-3)


def test_yolov9_detector_wrapper(torch_pair):
    _, params, cfg = torch_pair
    det = Y.YoloDetector(params, cfg, {0: "hand", 1: "face"}, input_size=64,
                         apply_fn=Y.yolov9_apply)
    img = np.random.RandomState(1).rand(80, 96, 3).astype(np.float32)
    boxes, scores, labels, masks = det(img, conf=0.0)
    assert boxes.shape[1] == 4 and masks is None
    if len(boxes):
        assert boxes[:, 2].max() <= 96 and boxes[:, 3].max() <= 80
