"""Golden parity of the JAX Qwen2.5-VL encoder against the transformers torch
implementation (tiny random config — validates the full pipeline: smart
resize, patch flattening, window attention, M-RoPE, GQA, hidden-state
extraction)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from qflux_tpu.models.qwen import vl_encoder as vl
from qflux_tpu.models.qwen.porting import convert_vl_text, convert_vl_vision
from qflux_tpu.models.porting import load_torch_state_dict


def rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / (np.linalg.norm(a) + np.linalg.norm(b) + 1e-12)


@pytest.fixture(scope="module")
def hf_model():
    from transformers import Qwen2_5_VLConfig
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VLForConditionalGeneration,
    )

    torch.manual_seed(0)
    cfg = Qwen2_5_VLConfig(
        text_config=dict(
            hidden_size=48, num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, intermediate_size=96, vocab_size=512,
            rope_theta=1_000_000.0, max_position_embeddings=4096,
            rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]},
            rms_norm_eps=1e-6,
        ),
        vision_config=dict(
            depth=2, hidden_size=32, intermediate_size=64, num_heads=2,
            patch_size=14, temporal_patch_size=2, spatial_merge_size=2,
            window_size=28, fullatt_block_indexes=[1], out_hidden_size=48,
            in_channels=3,
        ),
        image_token_id=500, video_token_id=501,
        vision_start_token_id=502, vision_end_token_id=503,
        vocab_size=512,
    )
    model = Qwen2_5_VLForConditionalGeneration(cfg).eval()
    return model, cfg


@pytest.fixture(scope="module")
def jx(hf_model):
    model, cfg = hf_model
    sd = load_torch_state_dict(model.state_dict())
    vcfg = vl.VLVisionConfig(
        depth=2, hidden_size=32, intermediate_size=64, num_heads=2,
        window_size=28, fullatt_block_indexes=(1,), out_hidden_size=48)
    tcfg = vl.VLTextConfig(hidden_size=48, num_layers=2, num_heads=4,
                           num_kv_heads=2, intermediate_size=96, vocab_size=512,
                           mrope_section=(2, 2, 2))
    vparams = convert_vl_vision(sd, depth=2)
    tparams = convert_vl_text(sd, num_layers=2)
    toks = vl.VLSpecialTokens(image_token_id=500, vision_start_token_id=502,
                              vision_end_token_id=503)
    return vcfg, tcfg, vparams, tparams, toks


def test_preprocess_matches_hf(jx):
    vcfg = jx[0]
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (60, 90, 3), dtype=np.uint8)
    patches, grid = vl.preprocess_image(img, vcfg)
    t, h, w = grid
    assert t == 1 and h % 2 == 0 and w % 2 == 0
    assert patches.shape == (h * w, 3 * 2 * 14 * 14)

    try:
        from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
            Qwen2VLImageProcessor,
        )
    except ImportError:
        pytest.skip("HF image processor unavailable")
    proc = Qwen2VLImageProcessor(do_resize=True, patch_size=14, temporal_patch_size=2,
                                 merge_size=2)
    out = proc(images=[img], return_tensors="np")
    np.testing.assert_array_equal(out["image_grid_thw"][0], np.asarray(grid))
    np.testing.assert_allclose(patches, out["pixel_values"], atol=2e-2)


def test_vision_tower_parity(hf_model, jx):
    model, _ = hf_model
    vcfg, _, vparams, _, _ = jx
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (56, 84, 3), dtype=np.uint8)
    patches, grid = vl.preprocess_image(img, vcfg)

    with torch.no_grad():
        ref = model.model.visual(torch.from_numpy(patches),
                                 grid_thw=torch.tensor([list(grid)]))
    mine = vl.vision_forward(vparams, vcfg, jnp.asarray(patches), [grid])
    assert rel_err(mine, ref.numpy()) < 2e-5


def test_full_vl_encode_parity(hf_model, jx):
    """End-to-end: input_ids with an embedded image, compare the last decoder
    layer hidden states (what the Qwen trainer conditions on)."""
    model, cfg = hf_model
    vcfg, tcfg, vparams, tparams, toks = jx
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (56, 56, 3), dtype=np.uint8)
    patches, grid = vl.preprocess_image(img, vcfg)
    n_img_tokens = (grid[1] // 2) * (grid[2] // 2)

    prefix = [7, 8, 9, toks.vision_start_token_id]
    suffix = [toks.vision_end_token_id, 10, 11, 12, 13]
    ids = np.asarray([prefix + [toks.image_token_id] * n_img_tokens + suffix])

    with torch.no_grad():
        out = model(input_ids=torch.from_numpy(ids),
                    attention_mask=torch.ones_like(torch.from_numpy(ids)),
                    pixel_values=torch.from_numpy(patches),
                    image_grid_thw=torch.tensor([list(grid)]),
                    output_hidden_states=True)
    ref = out.hidden_states[-1].numpy()

    # mine
    vis = vl.vision_forward(vparams, vcfg, jnp.asarray(patches), [grid])
    embeds = jnp.asarray(tparams["embed_tokens"])[jnp.asarray(ids)]
    mask = np.asarray(ids == toks.image_token_id)
    embeds = embeds.at[jnp.asarray(mask)].set(vis.astype(embeds.dtype))
    pos = vl.get_rope_index(ids, [grid], vcfg.spatial_merge_size, toks)
    mine = vl.text_forward(tparams, tcfg, embeds, pos)
    assert rel_err(mine, ref) < 2e-5


def test_get_rope_index_matches_hf(hf_model, jx):
    model, cfg = hf_model
    vcfg, _, _, _, toks = jx
    grid = (1, 4, 6)
    n = (4 // 2) * (6 // 2)
    ids = np.asarray([[5, toks.vision_start_token_id] + [toks.image_token_id] * n
                      + [toks.vision_end_token_id, 6, 7]])
    ref_pos, _ = model.model.get_rope_index(
        torch.from_numpy(ids), image_grid_thw=torch.tensor([list(grid)]))
    mine = vl.get_rope_index(ids, [grid], vcfg.spatial_merge_size, toks)
    np.testing.assert_array_equal(mine, ref_pos.numpy())
