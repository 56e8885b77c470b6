"""Golden parity vs transformers' torch implementations (the test strategy of
reference tests/e2e/: relative error against a trusted oracle, reference
tests/e2e/test_flux_loss.py:62-76) — with random-init small configs so no
weight downloads are needed."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp


def rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / (np.linalg.norm(a) + np.linalg.norm(b) + 1e-12)


@pytest.fixture(scope="module")
def torch_seed():
    torch.manual_seed(0)


def test_clip_parity(torch_seed):
    from transformers import CLIPTextConfig as HFCfg, CLIPTextModel

    from qflux_tpu.models.flux.text_encoders import CLIPTextConfig, clip_encode
    from qflux_tpu.models.porting import convert_clip_text, load_torch_state_dict

    hf = CLIPTextModel(HFCfg(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, max_position_embeddings=16,
        eos_token_id=99, bos_token_id=98, hidden_act="quick_gelu",
    )).eval()
    cfg = CLIPTextConfig(vocab_size=100, hidden_size=32, num_layers=2, num_heads=2,
                         intermediate_size=64, max_position_embeddings=16, eos_token_id=99)
    params = convert_clip_text(load_torch_state_dict(hf.state_dict()), num_layers=2)

    ids = np.random.default_rng(0).integers(0, 98, size=(2, 12))
    ids[:, -1] = 99  # EOS
    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(ids))
    hidden, pooled = clip_encode(params, cfg, jnp.asarray(ids))
    assert rel_err(hidden, out.last_hidden_state.numpy()) < 1e-5
    assert rel_err(pooled, out.pooler_output.numpy()) < 1e-5


def test_t5_parity(torch_seed):
    from transformers import T5Config as HFT5Cfg, T5EncoderModel

    from qflux_tpu.models.flux.text_encoders import T5Config, t5_encode
    from qflux_tpu.models.porting import convert_t5_encoder, load_torch_state_dict

    hf = T5EncoderModel(HFT5Cfg(
        vocab_size=100, d_model=64, d_kv=16, d_ff=128, num_layers=2, num_heads=4,
        relative_attention_num_buckets=32, relative_attention_max_distance=128,
        feed_forward_proj="gated-gelu", dense_act_fn="gelu_new",
    )).eval()
    cfg = T5Config(vocab_size=100, d_model=64, d_kv=16, d_ff=128, num_layers=2, num_heads=4)
    params = convert_t5_encoder(load_torch_state_dict(hf.state_dict()), num_layers=2)

    rng = np.random.default_rng(1)
    ids = rng.integers(0, 100, size=(2, 20))
    mask = np.ones((2, 20), np.int64)
    mask[1, 15:] = 0
    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(mask)).last_hidden_state
    mine = t5_encode(params, cfg, jnp.asarray(ids), attention_mask=jnp.asarray(mask))
    # compare only non-masked positions (HF computes masked ones too but they
    # see the same masked attention; all positions should actually match)
    assert rel_err(mine, out.numpy()) < 1e-5
