"""Modality zoo: audio/video encoders, KosmosConditional gating, KosmosAny
detection + lazy embedders, multimodal tokenizer tags (SURVEY.md §2.5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kosmosx_tpu.core.config import (AudioConfig, MagnetoConfig,
                                     ResamplerConfig, VideoConfig,
                                     VisionConfig)
from kosmosx_tpu.data.tokenizer import KosmosTokenizer
from kosmosx_tpu.models.any_modality import KosmosAny, ModalityDetector
from kosmosx_tpu.models.conditional import KosmosConditional
from kosmosx_tpu.nn.audio import audio_encoder, init_audio_encoder
from kosmosx_tpu.nn.video import init_video_encoder, video_encoder

DEC = MagnetoConfig(vocab_size=512, embed_dim=64, ffn_dim=128, layers=2,
                    heads=4, max_positions=256, use_flash_attention=False,
                    multiway=False, dropout=0.0)
AUD = AudioConfig(hidden_dim=32, layers=1, heads=4, mlp_dim=64,
                  conv_widths=(16, 16))
VID = VideoConfig(hidden_dim=64, frame_size=32)
VIS = VisionConfig(image_size=28, patch_size=14, hidden_dim=32, layers=1,
                   heads=2, mlp_dim=64, use_flash_attention=False)
RES = ResamplerConfig(dim=32, depth=1, dim_head=8, heads=4, num_latents=4,
                      num_media_embeds=4)


@pytest.mark.slow
def test_audio_encoder_shapes():
    p = init_audio_encoder(jax.random.PRNGKey(0), AUD)
    wav = jax.random.normal(jax.random.PRNGKey(1), (2, 1024))
    out = audio_encoder(p, wav, AUD)
    assert out.shape == (2, 1024 // (8 * 4), 32)
    assert bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.slow
def test_video_encoder_shapes():
    p = init_video_encoder(jax.random.PRNGKey(0), VID)
    clip = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 4, 32, 32))
    out = video_encoder(p, clip, VID)
    assert out.shape == (2, 64)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_conditional_builds_only_requested_towers():
    m = KosmosConditional(modalities=("text", "audio"), decoder=DEC,
                          audio=AUD, seed=0)
    assert "audio_enc" in m.params and "clip" not in m.params
    with pytest.raises(AssertionError):
        m(jnp.ones((1, 8), jnp.int32), images=jnp.zeros((1, 3, 28, 28)))


@pytest.mark.slow
def test_conditional_forward_all_modalities():
    m = KosmosConditional(modalities=("text", "image", "audio", "video"),
                          decoder=DEC, vision=VIS, resampler=RES, audio=AUD,
                          video=VID, seed=0)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 4, 512)
    out = m(toks,
            images=jnp.zeros((2, 3, 28, 28)),
            audios=jax.random.normal(jax.random.PRNGKey(2), (2, 512)),
            videos=jax.random.normal(jax.random.PRNGKey(3), (2, 3, 4, 32, 32)))
    # 4 latents (image) + 1 audio + 1 video spliced after BOS
    assert out.shape == (2, 10 + 4 + 1 + 1, 512)
    # text-only forward also works on the same model
    out_text = m(toks)
    assert out_text.shape == (2, 10, 512)


def test_modality_detector():
    det = ModalityDetector()
    assert det.detect("hello") == "text"
    assert det.detect(np.zeros((1, 3, 32, 32))) == "image"
    assert det.detect(np.zeros((1, 3, 4, 32, 32))) == "video"
    assert det.detect(np.zeros((1, 1000))) == "audio"
    assert det.detect(None, path="x/cat.png") == "image"
    assert det.detect(None, path="a.wav") == "audio"
    assert det.detect(None, path="v.mp4") == "video"
    assert det.detect(np.zeros((1, 3, 32, 32)), user_modality="any") == "any"


@pytest.mark.slow
def test_kosmos_any_lazy_encoders():
    m = KosmosAny(decoder=DEC, seed=0)
    m.configs["image"] = (VIS, RES)
    m.configs["audio"] = AUD
    base_params = m.num_params
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 4, 512)
    out = m(toks)  # text-only: no encoders built
    assert out.shape == (1, 8, 512)
    assert m.num_params == base_params

    out = m(toks, media=[(None, np.zeros((1, 3, 28, 28), np.float32))])
    assert out.shape == (1, 8 + 4, 512)
    assert "image_enc" in m.params and m.num_params > base_params
    assert "audio_enc" not in m.params

    out = m(toks, media=[(None, np.zeros((1, 3, 28, 28), np.float32)),
                         ("audio", np.zeros((1, 512), np.float32))])
    assert out.shape == (1, 8 + 4 + 1, 512)
    assert "audio_enc" in m.params


def test_kosmos_any_pure_apply_jits_and_trains():
    """Regression (VERDICT r2 weak #6): KosmosAny.apply must be pure —
    encoders materialize at registration, forward never mutates params —
    so it jits and gradients flow to every tower."""
    m = KosmosAny(decoder=DEC, seed=0)
    m.configs["image"] = (VIS, RES)
    m.configs["audio"] = AUD
    toks = jnp.ones((1, 8), jnp.int32)
    prepared = m.prepare_media(
        [(None, np.zeros((1, 3, 28, 28), np.float32)),
         ("audio", np.zeros((1, 512), np.float32)),
         ("any", np.ones((1, 5, 7), np.float32))])
    params_before = jax.tree_util.tree_structure(m.params)

    # params AND rng as jit arguments (regression: an int stride leaf in the
    # audio params became a tracer and broke the static framing reshape)
    jitted = jax.jit(lambda p, t, r: m.apply(p, t, media=prepared, rng=r))
    out = jitted(m.params, toks, jax.random.PRNGKey(3))
    assert out.shape == (1, 8 + 4 + 1 + 1, 512)
    # forward did not create params mid-trace
    assert jax.tree_util.tree_structure(m.params) == params_before

    def loss(p):
        return jnp.mean(m.apply(p, toks, media=prepared) ** 2)

    grads = jax.grad(loss)(m.params)
    g_img = grads["image_proj"]["w"]
    g_any = grads["any_proj_35"]["w"]
    assert float(jnp.abs(g_img).max()) > 0
    assert float(jnp.abs(g_any).max()) > 0
    # unregistered modality raises instead of silently materializing
    with pytest.raises(KeyError):
        m.apply(m.params, toks, media=[("video", np.zeros((1, 3, 4, 32, 32)))])


def test_conditional_dropout_rng_decorrelated():
    """Regression (VERDICT r2 weak #5): embedding dropout and layer dropout
    must use distinct keys (one shared key correlates masks)."""
    cfg = MagnetoConfig(vocab_size=512, embed_dim=64, ffn_dim=128, layers=2,
                        heads=4, max_positions=256, use_flash_attention=False,
                        multiway=False, dropout=0.5, attention_dropout=0.0)
    m = KosmosConditional(modalities=("text",), decoder=cfg, seed=0)
    toks = jnp.ones((1, 16), jnp.int32)
    from kosmosx_tpu.nn import decoder as dec
    seen = []
    orig_fe, orig_rl = dec.forward_embedding, dec.run_layers

    def spy_fe(*a, rng=None, **kw):
        seen.append(("embed", None if rng is None else tuple(np.asarray(rng))))
        return orig_fe(*a, rng=rng, **kw)

    def spy_rl(*a, rng=None, **kw):
        seen.append(("layers", None if rng is None else tuple(np.asarray(rng))))
        return orig_rl(*a, rng=rng, **kw)

    dec.forward_embedding, dec.run_layers = spy_fe, spy_rl
    try:
        m(toks, rng=jax.random.PRNGKey(7))
    finally:
        dec.forward_embedding, dec.run_layers = orig_fe, orig_rl
    keys = dict(seen)
    assert keys["embed"] is not None and keys["layers"] is not None
    assert keys["embed"] != keys["layers"]


def test_tokenizer_multimodal_tags():
    tok = KosmosTokenizer(use_hf=False,
                          modalities=("image", "audio", "video", "any"))
    spliced, raw = tok.tokenize_texts(["hi"], modalities=("image", "audio"))
    assert spliced.shape[1] == raw.shape[1] + 4  # 2 tag pairs
    assert spliced[0, 0] == tok.bos_token_id
    assert spliced[0, 1] == tok._tag_ids["<image>"]
    assert spliced[0, 2] == tok._tag_ids["</image>"]
    assert spliced[0, 3] == tok._tag_ids["<audio>"]
    assert spliced[0, 4] == tok._tag_ids["</audio>"]


def test_tokenizer_sample_assembly_and_roundtrip():
    tok = KosmosTokenizer(use_hf=False, image_embed_len=8)
    sample = {"target_text": "a cat",
              "image": np.zeros((1, 3, 64, 64), np.uint8)}
    out = tok.tokenize(sample)
    b, l = out["text_tokens"].shape
    assert out["attention_mask"].shape == (b, l + 8)
    assert out["images"].shape == (1, 3, 224, 224)
    assert tok.decode(out["labels"][0]) == "a cat"


class TestUnifiedEncoder:
    """ImageBind-style shared trunk (nn/unified.py): every modality encodes
    through ONE transformer into a joint CLS space."""

    def _cfg(self):
        from kosmosx_tpu.nn.unified import UnifiedConfig
        return UnifiedConfig(hidden_dim=32, layers=2, heads=4, mlp_dim=64,
                             max_tokens=128, image_patch=14, audio_patch=64,
                             video_tube_t=2, video_tube_hw=16)

    @pytest.mark.slow
    def test_all_modalities_share_trunk(self, devices):
        import jax
        import jax.numpy as jnp
        from kosmosx_tpu.nn.unified import init_unified_encoder, unified_encode

        cfg = self._cfg()
        params = init_unified_encoder(jax.random.PRNGKey(0), cfg)
        outs = {
            "image": unified_encode(params, jnp.ones((2, 3, 28, 28)), "image", cfg),
            "audio": unified_encode(params, jnp.ones((2, 640)), "audio", cfg),
            "video": unified_encode(params, jnp.ones((2, 3, 4, 32, 32)), "video", cfg),
            "any": unified_encode(params, jnp.ones((2, 5, 7)), "any", cfg),
        }
        for m, z in outs.items():
            assert z.shape == (2, 1, cfg.hidden_dim), m
            assert bool(jnp.all(jnp.isfinite(z))), m
        # modality embedding differentiates outputs for identical-ish input stats
        import numpy as np
        assert not np.allclose(np.asarray(outs["audio"]), np.asarray(outs["any"]))

    @pytest.mark.slow
    def test_kosmos_any_unified_mode(self, devices):
        import jax.numpy as jnp
        from kosmosx_tpu.core.config import MagnetoConfig
        from kosmosx_tpu.models.any_modality import KosmosAny

        model = KosmosAny(
            decoder=MagnetoConfig(vocab_size=64, embed_dim=32, ffn_dim=64,
                                  layers=2, heads=4, max_positions=64,
                                  use_flash_attention=False, multiway=False,
                                  dropout=0.0, attention_dropout=0.0),
            unified=True, unified_config=self._cfg())
        toks = jnp.ones((2, 8), jnp.int32)
        logits = model(toks, media=[("audio", jnp.ones((2, 640))),
                                    ("video", jnp.ones((2, 3, 4, 32, 32)))])
        assert logits.shape == (2, 8 + 2, 64)
        # one shared trunk, not per-modality towers
        assert "unified_enc" in model.params
        assert "audio_enc" not in model.params
