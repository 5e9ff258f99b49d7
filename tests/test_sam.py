"""SAM port parity vs torch reference (encoder with windowed rel-pos
attention, prompt encoding, two-way mask decoder)."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from lightdiffusion_tpu.models import sam as S


MINI = S.SamConfig(
    img_size=64, patch=16, dim=32, depth=2, heads=4, global_blocks=(1,),
    window=2, out_dim=16, decoder_heads=2, num_mask_tokens=4,
)


@pytest.fixture(scope="module")
def torch_pair():
    torch = pytest.importorskip("torch")
    from tests.torch_ldm_ref import MiniSam

    torch.manual_seed(0)
    model = MiniSam().eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = S.convert_sam(sd, MINI)
    return model, params


def test_encoder_parity(torch_pair):
    import torch

    model, params = torch_pair
    x = np.random.RandomState(0).randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref = model.encode_image(torch.from_numpy(x)).numpy()
    out = S.sam_encode_image(params, jnp.asarray(x.transpose(0, 2, 3, 1)), MINI)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=2e-4, rtol=2e-3
    )


def test_prompt_and_decoder_parity(torch_pair):
    import torch

    model, params = torch_pair
    rng = np.random.RandomState(1)
    feats = rng.randn(1, 16, 4, 4).astype(np.float32)

    # prompts: one positive point + a box, in input coords
    pts = np.array([[20.0, 30.0]], np.float32)
    box = np.array([8.0, 8.0, 48.0, 56.0], np.float32)
    sparse, dense = S.encode_prompts(params, pts, [1], box, 64, grid=4)

    # torch reference sparse embedding
    with torch.no_grad():
        coords = torch.from_numpy((pts + 0.5) / 64)
        pe_pt = model._pe(coords) + model.prompt_encoder.point_embeddings[1].weight
        corners = torch.from_numpy((box.reshape(2, 2) + 0.5) / 64)
        pe_box = model._pe(corners)
        pe_box = pe_box + torch.cat(
            [model.prompt_encoder.point_embeddings[2].weight,
             model.prompt_encoder.point_embeddings[3].weight], 0
        )
        ref_sparse = torch.cat([pe_pt, pe_box], 0)[None].numpy()
    np.testing.assert_allclose(np.asarray(sparse), ref_sparse, atol=1e-5, rtol=1e-4)

    with torch.no_grad():
        dense_t = model.prompt_encoder.no_mask_embed.weight.reshape(1, 1, 1, -1)
        dense_t = dense_t.expand(1, 4, 4, -1)
        masks_ref, iou_ref = model.decode(
            torch.from_numpy(feats), torch.from_numpy(ref_sparse), dense_t
        )
    masks, iou = S.sam_decode_masks(
        params, jnp.asarray(feats.transpose(0, 2, 3, 1)), sparse, dense, MINI
    )
    np.testing.assert_allclose(
        np.asarray(masks), masks_ref.numpy(), atol=3e-4, rtol=3e-3
    )
    np.testing.assert_allclose(np.asarray(iou), iou_ref.numpy(), atol=3e-4, rtol=3e-3)


def test_predictor_end_to_end(torch_pair):
    _, params = torch_pair
    pred = S.SamPredictor(params, MINI)
    img = np.random.RandomState(2).rand(48, 40, 3).astype(np.float32)
    pred.set_image(img)
    masks, iou = pred.predict(points=[[20, 24]], labels=[1],
                              box=[5, 5, 35, 43])
    assert masks.shape == (4, 48, 40)
    assert masks.dtype == bool
    assert iou.shape == (4,)


def test_make_sam_mask(torch_pair):
    _, params = torch_pair
    from lightdiffusion_tpu.postprocess.detailer import SEG

    pred = S.SamPredictor(params, MINI)
    img = np.random.RandomState(3).rand(48, 48, 3).astype(np.float32)
    segs = [SEG(None, np.ones((16, 16), np.float32), 0.9, [8, 8, 24, 24],
                [10, 10, 22, 22], "face")]
    mask = S.make_sam_mask(pred, segs, img, threshold=0.0)
    assert mask.shape == (48, 48)
    assert mask.min() >= 0 and mask.max() <= 1
