#!/usr/bin/env python
"""Teacher-vs-student side-by-side demo (reference streamlit_app.py semantics).

Reference behaviors preserved:
  * the demo "student" is the TEACHER reused with temperature sampling —
    ``student_model = teacher_model`` (streamlit_app.py:71-75); the student
    column samples at temperature 1.1 (:360-363)
  * temperature == 1.0 -> beam-search caption; != 1.0 -> multinomial
    temperature sampling (:104-221) — both on-device here (KV-cached)
  * vocab loaded from the saved vocab.json instead of rebuilding the full
    dataset per process start (:35-41) — same tokens, none of the startup cost

streamlit is optional in this image; without it, ``demo_caption_image`` gives
the same functionality programmatically and ``python streamlit_app.py
<image>`` runs a one-shot CLI demo.
"""

from __future__ import annotations

import os
import sys
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from imagecaptioner_tpu.core.config import TeacherConfig
from imagecaptioner_tpu.data import transforms as T
from imagecaptioner_tpu.data.vocabulary import Vocabulary
from imagecaptioner_tpu.models import teacher as TM
from imagecaptioner_tpu.ops import decode as D
from imagecaptioner_tpu.utils import checkpoint as CKPT

DEFAULT_CKPT = "saved_models/best_teacher_model.npz"
DEFAULT_VOCAB = "saved_models/vocab.json"


def load_models_and_vocab(checkpoint_path: str = DEFAULT_CKPT,
                          vocab_path: str = DEFAULT_VOCAB):
    vocab = Vocabulary.load(vocab_path)
    ckpt = CKPT.load_checkpoint(checkpoint_path)
    cfg = TeacherConfig(vocab_size=int(ckpt["vocab_size"]),
                        **ckpt.get("model_config", {}))
    params = jax.tree.map(jnp.asarray, ckpt["model_state_dict"]["params"])
    teacher = (params, cfg)
    student = teacher  # the reference demo reuses the teacher (:71-75)
    return teacher, student, vocab


def preprocess_image(img: Image.Image, image_size: int = 224) -> jnp.ndarray:
    img = img.convert("RGB").resize((image_size, image_size), Image.BILINEAR)
    return T.normalize(jnp.asarray(np.asarray(img, np.uint8))[None])


def generate_caption_with_temperature(
    model, image_nchw: jnp.ndarray, vocab: Vocabulary, *,
    temperature: float = 1.0, max_length: int = 25,
    seed: int = 0,
) -> str:
    """T==1.0 -> beam search; else multinomial sampling (streamlit_app.py:104-221)."""
    params, cfg = model
    memory = TM.encode_image(params, image_nchw, cfg)
    if temperature == 1.0:
        seqs, scores, _ = D.beam_search_teacher(params, memory, cfg,
                                                max_length=max_length)
        outs = D.beam_result_to_captions(seqs, scores, vocab, 1)
        return outs[0] if outs else ""
    toks = D.greedy_decode_teacher(
        params, memory, cfg, max_length=max_length, temperature=temperature,
        sample=True, rng=jax.random.PRNGKey(seed))
    return D.tokens_to_caption(np.asarray(toks[0]), vocab)


def demo_caption_image(image_path: str, *, checkpoint_path: str = DEFAULT_CKPT,
                       vocab_path: str = DEFAULT_VOCAB, seed: int = 0):
    teacher, student, vocab = load_models_and_vocab(checkpoint_path, vocab_path)
    image = preprocess_image(Image.open(image_path),
                             image_size=teacher[1].image_size)
    return {
        "teacher": generate_caption_with_temperature(
            teacher, image, vocab, temperature=1.0),
        "student": generate_caption_with_temperature(
            student, image, vocab, temperature=1.1, seed=seed),
    }


# ---------------------------------------------------------------------------
# Streamlit UI (three columns + session-state machine, :223-433)
# ---------------------------------------------------------------------------


def streamlit_main():
    import streamlit as st

    st.set_page_config(page_title="Image Captioner — Teacher vs Student",
                       layout="wide")
    st.title("🖼️ Image Captioning: Teacher vs Student")

    @st.cache_resource
    def _load():
        return load_models_and_vocab()

    teacher, student, vocab = _load()
    col_upload, col_teacher, col_student = st.columns(3)

    with col_upload:
        st.header("Upload")
        uploaded = st.file_uploader("Choose an image",
                                    type=["jpg", "jpeg", "png"])
        if uploaded:
            st.image(uploaded, use_container_width=True)
            if st.button("Generate Both Captions"):
                st.session_state["stage"] = "generate_both"

    if uploaded and st.session_state.get("stage") == "generate_both":
        image = preprocess_image(Image.open(uploaded),
                                 image_size=teacher[1].image_size)
        with col_teacher:
            st.header("Teacher (ViT, beam search)")
            with st.spinner("Captioning..."):
                cap = generate_caption_with_temperature(
                    teacher, image, vocab, temperature=1.0)
            st.success(cap)
            st.caption(f"~{TM.count_parameters(teacher[0]) / 1e6:.0f}M params")
        with col_student:
            st.header("Student (temperature 1.1)")
            with st.spinner("Captioning..."):
                cap = generate_caption_with_temperature(
                    student, image, vocab, temperature=1.1)
            st.success(cap)
        st.session_state["stage"] = "done"


def main():
    if len(sys.argv) > 1 and os.path.exists(sys.argv[1]):
        out = demo_caption_image(sys.argv[1])
        print(f"Teacher (beam):        {out['teacher']}")
        print(f"Student (T=1.1 sample): {out['student']}")
        return
    try:
        streamlit_main()
    except ImportError:
        print("streamlit is not installed. Either install it and run\n"
              "  streamlit run streamlit_app.py\n"
              "or pass an image path for a one-shot CLI demo:\n"
              "  python streamlit_app.py path/to/image.jpg")
        sys.exit(1)


if __name__ == "__main__":
    main()
