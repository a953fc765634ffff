"""torch<->JAX conversion: round-trips and numerical equivalence via torch."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from imagecaptioner_tpu.core.config import (
    TeacherConfig, compact_student_config, full_student_config)
from imagecaptioner_tpu.models import student as SM
from imagecaptioner_tpu.models import teacher as TM
from imagecaptioner_tpu.utils import torch_convert as TC


def _assert_tree_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_teacher_roundtrip():
    cfg = TeacherConfig(vocab_size=50, embed_size=32, num_heads=4,
                        num_decoder_layers=2, encoder_dim=24, encoder_depth=2,
                        encoder_heads=3, image_size=32, patch_size=16)
    p = TM.teacher_init(jax.random.PRNGKey(0), cfg)
    sd = TC.teacher_to_torch(p, cfg)
    assert "encoder.blocks.1.attn.qkv.weight" in sd
    assert "decoder.layers.0.self_attn.in_proj_weight" in sd
    assert "encoder_projection.weight" in sd
    p2 = TC.teacher_from_torch(sd, cfg)
    _assert_tree_equal(p, p2)


def test_full_student_roundtrip():
    cfg = full_student_config(40, embed_size=16, hidden_size=24)
    p, s = SM.student_init(jax.random.PRNGKey(0), cfg)
    sd = TC.full_student_to_torch(p, s, cfg)
    assert "encoder.resnet.0.weight" in sd          # conv1
    assert "encoder.resnet.4.0.downsample.0.weight" in sd
    assert "encoder.resnet.7.2.bn3.running_mean" in sd
    assert "decoder.lstm.weight_ih_l1" in sd
    assert "attention_refinement.ffn.0.weight" in sd
    p2, s2 = TC.full_student_from_torch(sd, cfg)
    _assert_tree_equal(p, p2)
    _assert_tree_equal(s, s2)


def test_compact_student_roundtrip():
    cfg = compact_student_config(40, embed_size=16, hidden_size=16)
    p, s = SM.student_init(jax.random.PRNGKey(0), cfg)
    sd = TC.compact_student_to_torch(p, s, cfg)
    assert "encoder.backbone.0.0.weight" in sd      # stem conv
    assert "encoder.backbone.1.conv.0.0.weight" in sd  # t=1 block depthwise
    assert "encoder.backbone.2.conv.0.0.weight" in sd  # expand conv
    assert "encoder.backbone.18.0.weight" in sd     # head
    p2, s2 = TC.compact_student_from_torch(sd, cfg)
    _assert_tree_equal(p, p2)
    _assert_tree_equal(s, s2)


def test_decoder_conversion_numerically_exact():
    """Import weights from a torch module shaped like the reference decoder
    and check forward equality (the layouts really are torch layouts)."""
    import torch.nn as tnn

    from imagecaptioner_tpu.models import lstm as L

    V, E, H = 30, 16, 24
    cfg = full_student_config(V, embed_size=E, hidden_size=H, num_layers=2,
                              dropout=0.0)
    torch.manual_seed(0)

    class RefDecoder(tnn.Module):
        def __init__(self):
            super().__init__()
            self.embedding = tnn.Embedding(V, E)
            self.attention = tnn.Linear(H + E, E)
            self.attention_combine = tnn.Linear(2 * E, E)
            self.lstm = tnn.LSTM(E, H, 2, batch_first=True)
            self.output_projection = tnn.Sequential(
                tnn.Linear(H, E), tnn.ReLU(), tnn.Dropout(0.0),
                tnn.Linear(E, V))

    ref = RefDecoder()
    sd = {f"decoder.{k}": np.array(v.detach().numpy(), copy=True)
          for k, v in ref.state_dict().items()}
    pkm, _ = TC.full_student_keymap(cfg)
    dec_params = TC._apply_keymap(pkm["decoder"], sd)
    dec_params = jax.tree.map(jnp.asarray, dec_params)

    feats = np.random.default_rng(0).normal(size=(2, 7, E)).astype(np.float32)
    captions = np.random.default_rng(1).integers(0, V, (5, 2))
    logits, _, _ = L.full_decoder_apply(
        dec_params, jnp.asarray(feats), jnp.asarray(captions), cfg)

    # torch oracle forward (reference loop semantics)
    f = torch.from_numpy(feats)
    h = torch.zeros(2, 2, H)
    c = torch.zeros(2, 2, H)
    emb = ref.embedding(torch.from_numpy(captions)).permute(1, 0, 2)
    outs = []
    with torch.no_grad():
        for t in range(5):
            hid = h[-1].unsqueeze(1).expand(2, 7, H)
            scores = torch.tanh(ref.attention(
                torch.cat([hid, f], dim=2))).sum(2)
            w = torch.softmax(scores, dim=1)
            ctx = torch.bmm(w.unsqueeze(1), f).squeeze(1)
            x = ref.attention_combine(torch.cat([emb[:, t], ctx], dim=1))
            o, (h, c) = ref.lstm(x.unsqueeze(1), (h, c))
            outs.append(ref.output_projection(o.squeeze(1)))
    ref_logits = torch.stack(outs).numpy()
    np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=1e-4,
                               rtol=1e-4)


def test_enhanced_student_roundtrip():
    from imagecaptioner_tpu.core.config import enhanced_student_config

    cfg = enhanced_student_config(40)
    p, s = SM.student_init(jax.random.PRNGKey(0), cfg)
    sd = TC.enhanced_student_to_torch(p, s, cfg)
    # torchvision efficientnet_b3 naming under the reference wrapper
    assert "encoder.backbone.0.0.0.weight" in sd            # stem conv
    assert "encoder.backbone.0.1.0.block.0.0.weight" in sd  # stage1 depthwise
    assert "encoder.backbone.0.1.0.block.1.fc1.weight" in sd  # stage1 SE
    assert "encoder.backbone.0.2.0.block.0.0.weight" in sd  # stage2 expand
    assert "encoder.backbone.0.2.0.block.2.fc2.bias" in sd  # stage2 SE
    assert "encoder.backbone.0.8.1.running_mean" in sd      # head BN state
    assert "encoder.spatial_attention.0.weight" in sd
    assert "encoder.projection.4.weight" in sd              # LayerNorm
    assert "attention_refinement.attention_layers.1.in_proj_weight" in sd
    assert "attention_refinement.norm_layers.3.bias" in sd
    assert "attention_refinement.global_context.4.weight" in sd
    assert "decoder.lstm_layers.2.weight_hh" in sd
    assert "decoder.lstm_norms.0.weight" in sd
    assert "decoder.highway_gate.0.weight" in sd
    assert "decoder.output_projection.3.weight" in sd
    assert "feature_compressor.2.weight" in sd
    # the bug-fix projections must NOT be exported (no torch counterpart)
    assert not any("query_projection" in k for k in sd)
    assert not any("highway_context_projection" in k for k in sd)

    p2, s2 = TC.enhanced_student_from_torch(sd, cfg, key=jax.random.PRNGKey(7))
    _assert_tree_equal(s, s2)
    # params identical except the two fresh projections
    for extra in ("query_projection", "highway_context_projection"):
        assert extra in p2["decoder"]
        del p2["decoder"][extra]
    pref = dict(p["decoder"])
    del pref["query_projection"], pref["highway_context_projection"]
    _assert_tree_equal({**p, "decoder": pref}, {**p2, "decoder": p2["decoder"]})

    # param-count parity with torchvision efficientnet_b3.features: 10,696,232
    n_backbone = sum(int(np.asarray(x).size)
                     for x in jax.tree.leaves(p["encoder"]["backbone"]))
    assert n_backbone == 10_696_232
