"""T5 encoder tests, including golden parity against HF transformers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blade.models.t5 import T5_TINY, T5Config, T5Encoder


def test_forward_shapes_and_mask():
    model = T5Encoder(T5_TINY, dtype=jnp.float32)
    ids = jnp.array([[3, 5, 7, 1, 0, 0]])
    mask = jnp.array([[1, 1, 1, 1, 0, 0]])
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    out = model.apply(params, ids, mask)
    assert out.shape == (1, 6, T5_TINY.d_model)
    # masked positions zeroed
    np.testing.assert_allclose(np.asarray(out[0, 4:]), 0.0, atol=1e-6)


@pytest.mark.parametrize("per_layer_bias", [False, True])
def test_parity_with_hf_t5(per_layer_bias):
    """Random tiny HF T5/UMT5 encoder vs our Flax port (same weights)."""
    torch = pytest.importorskip("torch")
    import transformers

    hf_cls = transformers.UMT5EncoderModel if per_layer_bias else transformers.T5EncoderModel
    hf_cfg_cls = transformers.UMT5Config if per_layer_bias else transformers.T5Config
    hf_cfg = hf_cfg_cls(
        vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=0, num_heads=4, relative_attention_num_buckets=32,
        relative_attention_max_distance=128, feed_forward_proj="gated-gelu",
        is_encoder_decoder=False, use_cache=False, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = hf_cls(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    from blade.convert.t5_convert import convert_t5_encoder

    cfg = T5Config(vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                   num_heads=4, per_layer_bias=per_layer_bias)
    params = convert_t5_encoder(sd, cfg)
    model = T5Encoder(cfg, dtype=jnp.float32)

    ids = np.array([[5, 9, 23, 44, 2, 7, 1, 0]], dtype=np.int64)
    mask = np.array([[1, 1, 1, 1, 1, 1, 1, 0]], dtype=np.int64)
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    out = model.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    out = np.asarray(out)
    ref = ref * mask[..., None]
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-3)
