"""Batched (vmapped) beam search equals per-image beam search."""

import jax
import jax.numpy as jnp
import numpy as np

from imagecaptioner_tpu.core.config import TeacherConfig
from imagecaptioner_tpu.models import teacher as TM
from imagecaptioner_tpu.ops import decode as D


def test_batched_beam_matches_per_image():
    cfg = TeacherConfig(vocab_size=40, embed_size=32, num_heads=4,
                        num_decoder_layers=2, dropout=0.0, encoder_dim=24,
                        encoder_depth=2, encoder_heads=3, image_size=32,
                        patch_size=16)
    p = TM.teacher_init(jax.random.PRNGKey(0), cfg)
    images = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 32, 32))
    memory = TM.encode_image(p, images, cfg)
    bs, bsc, bl = D.beam_search_teacher_batched(p, memory, cfg, max_length=8,
                                                beam_size=3)
    assert bs.shape == (3, 3, 9)
    for i in range(3):
        s, sc, l = D.beam_search_teacher(p, memory[i:i + 1], cfg,
                                         max_length=8, beam_size=3)
        np.testing.assert_array_equal(np.asarray(bs[i]), np.asarray(s))
        np.testing.assert_allclose(np.asarray(bsc[i]), np.asarray(sc),
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(bl[i]), np.asarray(l))
