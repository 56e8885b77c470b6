"""Qwen3 text encoder parity vs transformers (random tiny config)."""

import numpy as np
import torch

import jax.numpy as jnp

from qflux_tpu.models.flux2 import text_encoder as q3
from qflux_tpu.models.porting import load_torch_state_dict


def rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / (np.linalg.norm(a) + np.linalg.norm(b) + 1e-12)


def test_qwen3_hidden_states_parity():
    from transformers import Qwen3Config as HFCfg, Qwen3ForCausalLM

    torch.manual_seed(0)
    hf = Qwen3ForCausalLM(HFCfg(
        hidden_size=48, num_hidden_layers=4, num_attention_heads=4,
        num_key_value_heads=2, head_dim=12, intermediate_size=96,
        vocab_size=512, rope_theta=1_000_000.0, rms_norm_eps=1e-6,
        max_position_embeddings=2048, tie_word_embeddings=False,
    )).eval()
    cfg = q3.Qwen3Config.tiny()
    params = q3.convert_qwen3(load_torch_state_dict(hf.state_dict()), cfg.num_layers)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 512, size=(2, 10))
    mask = np.ones((2, 10), np.int64)
    mask[1, 7:] = 0
    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(mask),
                 output_hidden_states=True, use_cache=False)
    # stacked layers (1, 2, 3) channel-concat, like the Klein conditioning
    ref = torch.cat([out.hidden_states[k] for k in (1, 2, 3)], dim=-1).numpy()
    mine = q3.encode(params, cfg, jnp.asarray(ids), attention_mask=jnp.asarray(mask),
                     hidden_states_layers=(1, 2, 3))
    # padded positions attend causally to padded inputs in HF; compare valid only
    valid = mask.astype(bool)
    assert rel_err(np.asarray(mine)[valid], ref[valid]) < 1e-5
