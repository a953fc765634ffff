"""Drive the streamlit session-state machine with a fake streamlit module.

streamlit isn't installed in this image, so this harness implements the
small API surface the app uses and checks the reference UI flow
(streamlit_app.py:223-433): generate_both -> both columns generate +
st.rerun -> results replayed from session state -> Clear resets the keys.
"""

import contextlib
import sys
import types

import jax
import pytest


class Rerun(Exception):
    pass


class SessionState(dict):
    """Attribute-style access like streamlit's SessionState."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


class FakeSt(types.ModuleType):
    def __init__(self, uploaded=None, clicks=()):
        super().__init__("streamlit")
        self.session_state = SessionState()
        self._uploaded = uploaded
        self._clicks = set(clicks)
        self.calls = []

    # -- layout / chrome ------------------------------------------------
    def set_page_config(self, **kw):
        self.calls.append(("set_page_config", kw))

    def title(self, *a):
        self.calls.append(("title", a))

    def markdown(self, *a):
        self.calls.append(("markdown", a))

    def header(self, *a):
        self.calls.append(("header", a))

    def image(self, *a, **k):
        self.calls.append(("image", a))

    def info(self, *a):
        self.calls.append(("info", a))

    def success(self, *a):
        self.calls.append(("success", a))

    def warning(self, *a):
        self.calls.append(("warning", a))

    def error(self, *a):
        self.calls.append(("error", a))

    def code(self, *a):
        self.calls.append(("code", a))

    def write(self, *a):
        self.calls.append(("write", a))

    @contextlib.contextmanager
    def _ctx(self, name):
        self.calls.append((name, ()))
        yield self

    def spinner(self, *a):
        return self._ctx("spinner")

    def expander(self, *a):
        return self._ctx("expander")

    def columns(self, spec):
        n = spec if isinstance(spec, int) else len(spec)
        return [self._ctx("column") for _ in range(n)]

    # -- widgets ----------------------------------------------------------
    def file_uploader(self, *a, **k):
        return self._uploaded

    def button(self, label, **k):
        return label in self._clicks

    def cache_resource(self, fn):
        return fn

    def rerun(self):
        raise Rerun()


@pytest.fixture()
def app(monkeypatch, tmp_path):
    """streamlit_app with a tiny random-init teacher checkpoint."""
    import jax.numpy as jnp

    from imagecaptioner_tpu.core.config import TeacherConfig
    from imagecaptioner_tpu.data.vocabulary import Vocabulary
    from imagecaptioner_tpu.models import teacher as TM
    from imagecaptioner_tpu.utils import checkpoint as CKPT

    vocab = Vocabulary(freq_threshold=1)
    vocab.build_vocabulary(["a dog runs fast", "a cat sits still"])
    vocab.save(str(tmp_path / "vocab.json"))
    cfg = dict(embed_size=32, num_heads=4, num_decoder_layers=2, dropout=0.0,
               encoder_dim=24, encoder_depth=2, encoder_heads=3,
               encoder_mlp_ratio=4.0, patch_size=16, image_size=32)
    t_cfg = TeacherConfig(vocab_size=len(vocab), **cfg)
    p = TM.teacher_init(jax.random.PRNGKey(0), t_cfg)
    CKPT.save_checkpoint(str(tmp_path / "teacher.npz"), dict(
        model_state_dict=dict(params=p, model_state={}),
        vocab_size=len(vocab), model_config=cfg))

    import streamlit_app as APP

    monkeypatch.setattr(APP, "DEFAULT_CKPT", str(tmp_path / "teacher.npz"))
    monkeypatch.setattr(APP, "DEFAULT_VOCAB", str(tmp_path / "vocab.json"))
    return APP


def _make_upload(tmp_path):
    import numpy as np
    from PIL import Image

    path = tmp_path / "up.png"
    Image.fromarray(np.full((32, 32, 3), 128, np.uint8)).save(path)
    return str(path)


def _run(APP, st):
    sys.modules["streamlit"] = st
    try:
        APP.streamlit_main()
        return None
    except Rerun:
        return "rerun"
    finally:
        sys.modules.pop("streamlit", None)


def test_state_machine_full_flow(app, tmp_path, monkeypatch):
    upload = _make_upload(tmp_path)
    # deterministic captions: this test drives the state machine, not the
    # model (the CLI demo test covers the real caption path)
    monkeypatch.setattr(
        app, "generate_caption_with_temperature",
        lambda model, img, vocab, temperature=1.0, **k:
            f"a caption at T={temperature}")

    # 1. click Generate: sets the state keys and reruns
    st = FakeSt(uploaded=upload, clicks={"🔮 Generate Captions"})
    assert _run(app, st) == "rerun"
    assert st.session_state["generate_both"] is True
    assert st.session_state["teacher_done"] is False

    # 2. teacher column generates, caches its result, reruns
    st2 = FakeSt(uploaded=upload)
    st2.session_state = SessionState(st.session_state)
    assert _run(app, st2) == "rerun"
    assert st2.session_state["teacher_done"] is True
    assert isinstance(st2.session_state["teacher_caption_result"], str)

    # 3. student column generates on the next pass
    st3 = FakeSt(uploaded=upload)
    st3.session_state = SessionState(st2.session_state)
    assert _run(app, st3) == "rerun"
    assert st3.session_state["student_done"] is True

    # 4. steady state: both results replayed, no rerun
    st4 = FakeSt(uploaded=upload)
    st4.session_state = SessionState(st3.session_state)
    assert _run(app, st4) is None
    shown = [a for name, a in st4.calls if name == "markdown"]
    joined = " ".join(str(x) for x in shown)
    assert st3.session_state["teacher_caption_result"] in joined
    assert st3.session_state["student_caption_result"] in joined

    # 5. Clear resets every state-machine key
    st5 = FakeSt(uploaded=upload, clicks={"🗑️ Clear Image"})
    st5.session_state = SessionState(st4.session_state)
    assert _run(app, st5) == "rerun"
    for key in ("generate_both", "teacher_done", "student_done",
                "teacher_caption_result", "student_caption_result"):
        assert key not in st5.session_state


def test_no_models_shows_error(app, monkeypatch):
    monkeypatch.setattr(app, "DEFAULT_CKPT", "/nonexistent.npz")
    st = FakeSt()
    assert _run(app, st) is None
    assert any(name == "error" for name, _ in st.calls)


def test_real_student_checkpoint_in_demo(app, tmp_path, monkeypatch):
    """Beyond-reference: IC_DEMO_STUDENT / --student-checkpoint puts the REAL
    distilled student in the student column (the reference demo always reuses
    the teacher, streamlit_app.py:71-75)."""
    import numpy as np
    import jax.numpy as jnp

    from imagecaptioner_tpu.core.config import compact_student_config
    from imagecaptioner_tpu.models import student as SM
    from imagecaptioner_tpu.utils import checkpoint as CKPT

    from imagecaptioner_tpu.data.vocabulary import Vocabulary

    vocab = Vocabulary.load(str(tmp_path / "vocab.json"))
    s_cfg = compact_student_config(len(vocab), image_size=32, dropout=0.0)
    sp, ss = SM.student_init(jax.random.PRNGKey(1), s_cfg)
    sckpt = str(tmp_path / "student.npz")
    CKPT.save_checkpoint(sckpt, dict(
        student_state_dict=dict(params=sp, model_state=ss),
        vocab_size=len(vocab),
        model_config=dict(embed_size=s_cfg.embed_size,
                          hidden_size=s_cfg.hidden_size,
                          num_layers=s_cfg.num_layers, dropout=0.0,
                          use_attention_refinement=False,
                          image_size=32, model_type="compact")))

    teacher, student, v = app.load_models_and_vocab(
        app.DEFAULT_CKPT, app.DEFAULT_VOCAB, student_checkpoint=sckpt)
    assert len(student) == 3 and student[1].variant == "compact"

    img = jnp.asarray(np.full((1, 3, 32, 32), 0.1, np.float32))
    cap_greedy = app.generate_caption_with_temperature(
        student, img, v, temperature=1.0, max_length=6)
    cap_sampled = app.generate_caption_with_temperature(
        student, img, v, temperature=1.1, max_length=6, seed=3)
    assert isinstance(cap_greedy, str) and isinstance(cap_sampled, str)

    # env-var path used by the streamlit _load()
    monkeypatch.setenv("IC_DEMO_STUDENT", sckpt)
    _, student2, _ = app.load_models_and_vocab(app.DEFAULT_CKPT,
                                               app.DEFAULT_VOCAB)
    assert len(student2) == 3
    # model-info lines describe the real student, not the demo quirk
    lines = app._model_info_lines("student", student2)
    assert any("compact student" in ln for ln in lines)
