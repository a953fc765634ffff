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

Beyond the reference: pass a REAL distilled student checkpoint (CLI
``--student-checkpoint`` / env ``IC_DEMO_STUDENT``) and the student column
runs the actual student (any variant, rebuilt from the checkpoint's
``model_type``) — beam/argmax at T=1.0, multinomial sampling otherwise.
The reference demo never does this ("in a real scenario you would load the
distilled student", streamlit_app.py:71-75); its teacher-as-student quirk
remains the default.
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


def _load_student(student_checkpoint: str):
    """Rebuild a trained student from its checkpoint (variant dispatch on
    model_type).  Returns (params, cfg, model_state)."""
    return CKPT.load_student_checkpoint(student_checkpoint)


def load_models_and_vocab(checkpoint_path: str = DEFAULT_CKPT,
                          vocab_path: str = DEFAULT_VOCAB,
                          student_checkpoint: Optional[str] = None):
    """``student_checkpoint`` (or env IC_DEMO_STUDENT): load a real distilled
    student for the student column; default preserves the reference's
    teacher-as-student demo quirk."""
    vocab = Vocabulary.load(vocab_path)
    ckpt = CKPT.load_checkpoint(checkpoint_path)
    cfg = TeacherConfig(vocab_size=int(ckpt["vocab_size"]),
                        **ckpt.get("model_config", {}))
    params = jax.tree.map(jnp.asarray, ckpt["model_state_dict"]["params"])
    teacher = (params, cfg)
    student_checkpoint = student_checkpoint or os.environ.get(
        "IC_DEMO_STUDENT") or None
    if student_checkpoint:
        student = _load_student(student_checkpoint)
    else:
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
    """T==1.0 -> beam search; else multinomial sampling (streamlit_app.py:104-221).

    A 3-tuple ``model`` is a real student (params, cfg, model_state): its
    native greedy path at T=1.0 (the student has no beam search —
    student_model.py:314), sampled decode otherwise."""
    if len(model) == 3:
        from imagecaptioner_tpu.models import student as SM

        params, cfg, mstate = model
        _, refined, _ = SM.encode_image(params, mstate, image_nchw, cfg,
                                        train=False)
        rng = (None if temperature == 1.0
               else jax.random.PRNGKey(seed))
        toks = D.greedy_decode_student(
            params, refined, cfg, max_length=max_length,
            temperature=temperature, rng=rng)
        return D.tokens_to_caption(np.asarray(toks[0]), vocab)
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
                       vocab_path: str = DEFAULT_VOCAB, seed: int = 0,
                       student_checkpoint: Optional[str] = None):
    teacher, student, vocab = load_models_and_vocab(
        checkpoint_path, vocab_path, student_checkpoint=student_checkpoint)
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


_SESSION_KEYS = ("generate_both", "student_done", "teacher_done",
                 "teacher_generating", "student_caption_result",
                 "teacher_caption_result")


def _model_info_lines(name: str, model) -> List[str]:
    params = model[0]
    if name == "teacher":
        return ["**Architecture:** Vision Transformer",
                f"**Parameters:** ~{TM.count_parameters(params) / 1e6:.0f}M",
                "**Encoder:** ViT-Small",
                "**Decoder:** 4-layer Transformer"]
    if len(model) == 3:  # real distilled student loaded
        cfg = model[1]
        enc = {"full": "ResNet-50", "compact": "MobileNetV2",
               "enhanced": "EfficientNet-B3"}[cfg.variant]
        return [f"**Architecture:** CNN-LSTM ({cfg.variant} student)",
                f"**Parameters:** ~{TM.count_parameters(params) / 1e6:.1f}M",
                f"**Encoder:** {enc}",
                f"**Decoder:** {cfg.num_layers}-layer LSTM"]
    return ["**Architecture:** CNN-LSTM (demo: teacher @ T=1.1)",
            "**Parameters:** ~8M (3x smaller)",
            "**Encoder:** ResNet-50",
            "**Decoder:** 2-layer LSTM",
            "**Speed:** ~2-3x faster"]


def streamlit_main():
    """Three-column session-state machine reproducing the reference UI flow
    (streamlit_app.py:223-433): generate_both/teacher_done/student_done keys,
    per-column spinners + st.rerun, caption + word count + Model Info
    expander, and a Clear button that resets the state machine."""
    import streamlit as st

    st.set_page_config(
        page_title="Image Caption Generator - Teacher vs Student",
        page_icon="📸", layout="wide")
    st.title("📸 Image Caption Generator - Teacher vs Student Models")
    st.markdown("Upload an image and compare captions from both the Teacher "
                "(ViT-Transformer) and Student (CNN-LSTM) models!")

    @st.cache_resource
    def _load():
        try:
            # module globals resolved at call time (tests repoint them)
            return load_models_and_vocab(DEFAULT_CKPT, DEFAULT_VOCAB)
        except Exception:
            return None, None, None

    with st.spinner("Loading AI models..."):
        teacher, student, vocab = _load()
    if teacher is None and student is None:
        st.error("Failed to load any models. Please check if the model "
                 "files exist.")
        st.info("Make sure you have:")
        st.code("- saved_models/best_teacher_model.npz\n"
                "- saved_models/vocab.json")
        return
    st.success(f"✅ Models loaded successfully! Running on: "
               f"{jax.devices()[0].platform}")

    col1, col2, col3 = st.columns([1, 1, 1])

    with col1:
        st.header("📷 Upload Image")
        uploaded = st.file_uploader(
            "Choose an image...", type=["jpg", "jpeg", "png", "bmp", "tiff"],
            help="Upload an image file (JPG, PNG, etc.)")
        if uploaded is not None:
            pil_img = Image.open(uploaded)
            st.image(pil_img, caption="Uploaded Image",
                     use_container_width=True)
            st.info(f"📊 Size: {pil_img.size[0]} x {pil_img.size[1]} px")
            if st.button("🔮 Generate Captions", type="primary",
                         use_container_width=True):
                st.session_state.generate_both = True
                st.session_state.student_done = False
                st.session_state.teacher_done = False
                st.rerun()

    def render_model_column(name: str, model, temperature: float):
        """One model column of the state machine: generate when pending,
        replay the cached result when done, hint otherwise."""
        done_key, result_key = f"{name}_done", f"{name}_caption_result"
        pending = (uploaded is not None
                   and st.session_state.get("generate_both", False)
                   and not st.session_state.get(done_key, False))

        def show(caption: str):
            st.success("✅ Caption Generated!")
            st.markdown("### 💬 Caption:")
            st.markdown(f'*"{caption}"*')
            st.info(f"📝 Words: {len(caption.split())}")
            with st.expander("📊 Model Info"):
                for line in _model_info_lines(name, model):
                    st.write(line)

        if pending:
            generated = False
            with st.spinner(f"{name.title()} generating..."):
                try:
                    image = preprocess_image(pil_img,
                                             image_size=model[1].image_size)
                    caption = generate_caption_with_temperature(
                        model, image, vocab, temperature=temperature,
                        max_length=25)
                    if caption.strip():
                        show(caption)
                        st.session_state[result_key] = caption
                        generated = True
                    else:
                        st.warning("empty caption")
                    st.session_state[done_key] = True
                except Exception as e:
                    st.error(f"{name.title()} error: {e}")
                    st.session_state[done_key] = True
            if generated:
                # outside the try: st.rerun raises a control-flow exception
                # that must not be swallowed by the error handler
                st.rerun()
        elif uploaded is not None and st.session_state.get(done_key, False):
            if result_key in st.session_state:
                show(st.session_state[result_key])
        elif st.session_state.get("generate_both", False):
            st.info(f"⏳ {name.title()} generating...")
        else:
            st.info("👈 Upload image and click generate")

    with col2:
        st.header("🎓 Teacher Model")
        st.markdown("**ViT-Transformer** "
                    f"(~{TM.count_parameters(teacher[0]) / 1e6:.0f}M params)")
        render_model_column("teacher", teacher, 1.0)

    with col3:
        st.header("🎒 Student Model")
        render_model_column("student", student, 1.1)

    if uploaded is not None:
        if st.button("🗑️ Clear Image"):
            for key in _SESSION_KEYS:
                st.session_state.pop(key, None)
            st.rerun()


def main():
    argv = list(sys.argv[1:])
    student_ckpt = None
    if "--student-checkpoint" in argv:
        i = argv.index("--student-checkpoint")
        if i + 1 >= len(argv):
            print("usage: streamlit_app.py [image] "
                  "[--student-checkpoint PATH]")
            sys.exit(2)
        student_ckpt = argv[i + 1]
        del argv[i:i + 2]
    if argv and os.path.exists(argv[0]):
        out = demo_caption_image(argv[0], student_checkpoint=student_ckpt)
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
