"""DreamOmni2 VLM prompt enhancer: lm_head port, KV-cached greedy decode,
and the cache/predict wiring (round-1 gap: enhance_prompt was dead code)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qflux_tpu.config import Config
from qflux_tpu.trainer.dreamomni2 import DreamOmni2Adapter


def _cfg(enhancer=True) -> Config:
    return Config.model_validate({
        "trainer": "DreamOmni2Trainer",
        "model": {"variant": "test", "use_vlm_prompt_enhancer": enhancer},
        "train": {"weight_dtype": "float32"},
    })


@pytest.fixture(scope="module")
def loaded():
    return DreamOmni2Adapter.load(_cfg(), dtype=jnp.float32)


def test_vlm_stack_loaded(loaded):
    adapter, bundle = loaded
    assert adapter.use_vlm_prompt_enhancer
    assert "lm_head" in bundle.text_params
    assert "vision" in bundle.text_params and "vl" in bundle.tokenizers


def test_enhance_prompt_generates(loaded):
    adapter, bundle = loaded
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (56, 56, 3), dtype=np.uint8)
    out = adapter.enhance_prompt(bundle, "add a red hat", [img],
                                 max_new_tokens=6)
    assert isinstance(out, str) and out  # greedy loop ran and decoded


def test_kv_cache_decode_matches_full_forward():
    """Prefill + N cached decode steps must equal the uncached full forward
    logits at every position (same weights, same ids)."""
    from qflux_tpu.models.qwen import vl_encoder as vl

    tcfg = vl.VLTextConfig.tiny()
    params = vl.text_init(jax.random.PRNGKey(0), tcfg)
    ids = np.asarray([[3, 9, 4, 7, 5, 2]])
    s = ids.shape[1]
    embeds = jnp.asarray(np.asarray(jax.random.normal(
        jax.random.PRNGKey(1), (1, s, tcfg.hidden_size))))
    pos = np.broadcast_to(np.arange(s), (3, 1, s)).copy()

    full = vl.text_forward(params, tcfg, embeds, pos)

    split = 3
    cache = vl.make_kv_cache(tcfg, 1, s, embeds.dtype)
    h_pre, cache = vl.text_prefill(params, tcfg, embeds[:, :split],
                                   pos[:, :, :split], cache)
    np.testing.assert_allclose(np.asarray(h_pre), np.asarray(full[:, :split]),
                               rtol=2e-4, atol=2e-5)
    for i in range(split, s):
        h_i, cache = vl.text_decode_step(
            params, tcfg, embeds[:, i:i + 1], pos[:, :, i:i + 1], cache,
            jnp.asarray(i, jnp.int32))
        np.testing.assert_allclose(np.asarray(h_i), np.asarray(full[:, i]),
                                   rtol=2e-4, atol=2e-5)


def test_cache_pass_rewrites_prompts(loaded, rng):
    """cache_embeddings must run the enhancer: with the enhancer on, the
    prompt embeddings differ from the non-enhanced adapter's for the same
    batch (reference caches the rewritten prompt's embeddings)."""
    adapter_on, bundle = loaded
    adapter_off, bundle_off = DreamOmni2Adapter.load(_cfg(enhancer=False),
                                                     dtype=jnp.float32)
    batch = {
        "image": rng.integers(0, 255, (1, 32, 32, 3), dtype=np.uint8),
        "prompt": ["put the cat on the sofa"],
        "control": rng.integers(0, 255, (1, 56, 56, 3), dtype=np.uint8),
        "file_hashes": [{"main_hash": "x", "image_hash": "i", "control_hash": "c",
                         "prompt_hash": "p", "empty_prompt_hash": "e",
                         "control_prompt_hash": "cp",
                         "control_empty_prompt_hash": "ce"}],
    }
    rewritten = adapter_on._rewrite_batch_prompts(bundle, batch)
    assert rewritten["prompt"][0] != batch["prompt"][0]  # VLM actually ran

    arrays_on, _ = adapter_on.cache_embeddings(bundle, dict(batch))
    arrays_off, _ = adapter_off.cache_embeddings(bundle_off, dict(batch))
    assert not np.allclose(np.asarray(arrays_on["prompt_embeds"]),
                           np.asarray(arrays_off["prompt_embeds"]))


def test_rewrite_keeps_dropped_prompts_empty(loaded, rng):
    """An EMPTY prompt means conditioning dropout selected this sample — the
    enhancer must NOT replace it with a VLM caption (that would train the
    unconditional branch on a description of the controls)."""
    adapter, bundle = loaded
    batch = {
        "prompt": ["", "real instruction"],
        "control": rng.integers(0, 255, (2, 56, 56, 3), dtype=np.uint8),
    }
    out = adapter._rewrite_batch_prompts(bundle, batch)
    assert out["prompt"][0] == ""                      # dropout preserved
    assert out["prompt"][1] != "real instruction"      # real one rewritten
