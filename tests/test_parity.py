"""Numerical parity oracles against the real substrate libraries.

The reference runs on transformers/diffusers; diffusers is absent here but
``transformers`` + CPU torch are baked in, so the text encoders can be
validated end to end: random-init a tiny HF module, convert its state_dict
through models/convert.py, and compare outputs (SURVEY §7 build-plan oracle:
"weight conversion fidelity ... validate at fp32").
"""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip('torch')
transformers = pytest.importorskip('transformers')

from diffusion_feature_tpu.models.convert import convert_torch_state


class TestCLIPParity:
    def test_matches_transformers_clip_text(self):
        from transformers import CLIPTextConfig as HFConfig
        from transformers import CLIPTextModel as HFModel
        from diffusion_feature_tpu.models.clip_text import (
            CLIPTextModel, tiny_clip_config,
        )
        hf_cfg = HFConfig(vocab_size=1000, hidden_size=32,
                          intermediate_size=128, num_hidden_layers=2,
                          num_attention_heads=2,
                          max_position_embeddings=77,
                          hidden_act='quick_gelu', eos_token_id=999,
                          bos_token_id=998, pad_token_id=0)
        torch.manual_seed(0)
        hf = HFModel(hf_cfg).eval()

        ours_cfg = tiny_clip_config(32)
        ours = CLIPTextModel(cfg=ours_cfg)
        ids = np.zeros((2, 77), np.int64)
        rng = np.random.RandomState(0)
        ids[:, 0] = 998
        ids[0, 1:5] = rng.randint(2, 990, 4)
        ids[0, 5] = 999
        ids[1, 1:9] = rng.randint(2, 990, 8)
        ids[1, 9] = 999

        import jax
        params0 = ours.init(jax.random.PRNGKey(0),
                            jnp.asarray(ids, jnp.int32))['params']
        state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
        params, _, unused = convert_torch_state(state, params0)
        # everything in the HF checkpoint should land somewhere
        assert not [u for u in unused if 'position_ids' not in u], unused

        with torch.no_grad():
            # HF CLIPText attends causally over the full padded length too
            out = hf(input_ids=torch.from_numpy(ids))
        last_hf = out.last_hidden_state.numpy()
        pooled_hf = out.pooler_output.numpy()

        last, pooled, hidden = ours.apply({'params': params},
                                          jnp.asarray(ids, jnp.int32))
        assert np.allclose(np.asarray(last), last_hf, rtol=2e-4, atol=2e-4)
        assert np.allclose(np.asarray(pooled), pooled_hf, rtol=2e-4, atol=2e-4)
        # penultimate hidden state (SDXL's clip_layer='penultimate')
        with torch.no_grad():
            out_h = hf(input_ids=torch.from_numpy(ids),
                       output_hidden_states=True)
        assert np.allclose(np.asarray(hidden[-2]),
                           out_h.hidden_states[-2].numpy(),
                           rtol=2e-4, atol=2e-4)


class TestT5Parity:
    def test_matches_transformers_t5_encoder(self):
        from transformers import T5Config as HFConfig
        from transformers import T5EncoderModel as HFModel
        from diffusion_feature_tpu.models.t5 import T5EncoderModel, tiny_t5_config
        hf_cfg = HFConfig(vocab_size=1000, d_model=32, d_kv=8, d_ff=64,
                          num_layers=2, num_heads=4,
                          relative_attention_num_buckets=32,
                          relative_attention_max_distance=128,
                          feed_forward_proj='gated-gelu', dropout_rate=0.0,
                          is_gated_act=True, dense_act_fn='gelu_new')
        torch.manual_seed(0)
        hf = HFModel(hf_cfg).eval()

        ours = T5EncoderModel(cfg=tiny_t5_config())
        rng = np.random.RandomState(1)
        ids = rng.randint(2, 990, (2, 16)).astype(np.int64)
        mask = np.ones((2, 16), np.int64)
        mask[1, 10:] = 0

        import jax
        params0 = ours.init(jax.random.PRNGKey(0),
                            jnp.asarray(ids, jnp.int32))['params']
        from diffusion_feature_tpu.models.convert import rename_t5_keys
        state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
        params, missing, _ = convert_torch_state(rename_t5_keys(state),
                                                 params0, strict=True)
        assert not missing

        with torch.no_grad():
            out = hf(input_ids=torch.from_numpy(ids),
                     attention_mask=torch.from_numpy(mask))
        ref = out.last_hidden_state.numpy()
        got = np.asarray(ours.apply({'params': params},
                                    jnp.asarray(ids, jnp.int32),
                                    jnp.asarray(mask, jnp.int32)))
        assert np.allclose(got, ref, rtol=5e-4, atol=5e-4), \
            np.abs(got - ref).max()


class TestBertParity:
    def test_matches_transformers_bert(self):
        from transformers import BertConfig as HFConfig
        from transformers import BertModel as HFModel
        from diffusion_feature_tpu.models.bert_text import (
            BertTextModel, tiny_bert_config,
        )
        hf_cfg = HFConfig(vocab_size=1000, hidden_size=32,
                          num_hidden_layers=2, num_attention_heads=2,
                          intermediate_size=64, max_position_embeddings=512,
                          hidden_dropout_prob=0.0,
                          attention_probs_dropout_prob=0.0)
        torch.manual_seed(0)
        hf = HFModel(hf_cfg, add_pooling_layer=False).eval()

        ours = BertTextModel(cfg=tiny_bert_config())
        rng = np.random.RandomState(2)
        ids = rng.randint(2, 990, (2, 12)).astype(np.int64)
        mask = np.ones((2, 12), np.int64)
        mask[0, 8:] = 0

        import jax
        params0 = ours.init(jax.random.PRNGKey(0),
                            jnp.asarray(ids, jnp.int32))['params']
        from diffusion_feature_tpu.models.convert import rename_bert_keys
        state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
        params, missing, _ = convert_torch_state(rename_bert_keys(state),
                                                 params0, strict=True)
        assert not missing

        with torch.no_grad():
            out = hf(input_ids=torch.from_numpy(ids),
                     attention_mask=torch.from_numpy(mask))
        ref = out.last_hidden_state.numpy()
        got = np.asarray(ours.apply({'params': params},
                                    jnp.asarray(ids, jnp.int32),
                                    jnp.asarray(mask, jnp.int32)))
        assert np.allclose(got, ref, rtol=5e-4, atol=5e-4), \
            np.abs(got - ref).max()
