"""Data layer: tokenizer, vocabulary ordering semantics, dataset, loader, transforms."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from imagecaptioner_tpu.data import tokenize, Vocabulary, CaptionDataset, get_loader
from imagecaptioner_tpu.data.loader import BatchLoader
from imagecaptioner_tpu.data.synthetic import make_synthetic_dataset
from imagecaptioner_tpu.data import transforms as T
from imagecaptioner_tpu.data.vocabulary import PAD, START, END, UNK


# -- tokenizer ---------------------------------------------------------------

@pytest.mark.parametrize("text,expected", [
    ("A dog runs .", ["a", "dog", "runs", "."]),
    ("A dog runs.", ["a", "dog", "runs", "."]),
    ("Two dogs, one ball!", ["two", "dogs", ",", "one", "ball", "!"]),
    ("don't stop", ["do", "n't", "stop"]),
    ("it's a man's hat", ["it", "'s", "a", "man", "'s", "hat"]),
    ("blue-eyed child", ["blue", "-", "eyed", "child"]),
    ('"hello" (world)', ['"', "hello", '"', "(", "world", ")"]),
    ("I'm running", ["i", "'m", "running"]),
    ("they'll we've you're he'd", ["they", "'ll", "we", "'ve", "you", "'re", "he", "'d"]),
    ("", []),
    ("   ", []),
])
def test_tokenize(text, expected):
    assert tokenize(text) == expected


def test_tokenize_nonstring():
    assert tokenize(123) == ["123"]  # reference does str(text)


# -- vocabulary --------------------------------------------------------------

def test_vocab_specials_fixed():
    v = Vocabulary(5)
    assert v.stoi == {"<PAD>": 0, "<START>": 1, "<END>": 2, "<UNK>": 3}
    assert len(v) == 4


def test_vocab_first_reached_threshold_order():
    # "b" reaches threshold 2 before "a" does -> b gets id 4, a gets id 5
    v = Vocabulary(2)
    v.build_vocabulary(["b b", "a c a", "c"])
    assert v.stoi["b"] == 4
    assert v.stoi["a"] == 5
    assert v.stoi["c"] == 6
    assert "d" not in v.stoi


def test_vocab_threshold_exactness():
    v = Vocabulary(3)
    v.build_vocabulary(["x x", "y y y"])
    assert "x" not in v.stoi  # only reached 2
    assert v.stoi["y"] == 4


def test_numericalize_oov():
    v = Vocabulary(1)
    v.build_vocabulary(["a dog"])
    assert v.numericalize("a cat") == [v.stoi["a"], UNK]


def test_encode_caption_framing():
    v = Vocabulary(1)
    v.build_vocabulary(["dog runs"])
    ids = v.encode_caption("dog runs")
    assert ids[0] == START and ids[-1] == END
    assert v.decode(ids) == ["dog", "runs"]


def test_vocab_json_roundtrip():
    v = Vocabulary(1)
    v.build_vocabulary(["a dog runs fast"])
    v2 = Vocabulary.from_json(v.to_json())
    assert v2.stoi == v.stoi and v2.itos == v.itos
    assert v2.freq_threshold == v.freq_threshold


# -- dataset + loader --------------------------------------------------------

@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("flickr_synth")
    make_synthetic_dataset(str(root), n_images=24, captions_per_image=2,
                           image_size=64, seed=0)
    return str(root)


def test_dataset_basic(synth_root):
    ds = CaptionDataset(synth_root, f"{synth_root}/captions_clean.csv",
                        freq_threshold=2, image_size=64)
    assert len(ds) == 48
    img, cap = ds[0]
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    assert cap[0] == START and cap[-1] == END
    assert len(ds.vocab) > 4


def test_dataset_missing_image_placeholder(synth_root, tmp_path):
    csv = tmp_path / "caps.csv"
    csv.write_text("image,caption\nmissing.jpg,a dog runs .\n")
    ds = CaptionDataset(synth_root, str(csv), image_size=64)
    img, _ = ds[0]
    assert img.shape == (64, 64, 3)
    assert img.sum() == 0  # black placeholder


def test_dataset_empty_csv_raises(tmp_path):
    csv = tmp_path / "empty.csv"
    csv.write_text("image,caption\n")
    with pytest.raises(ValueError):
        CaptionDataset(str(tmp_path), str(csv))


def test_loader_static_shapes_and_cap(synth_root):
    loader, ds = get_loader(synth_root, f"{synth_root}/captions_clean.csv",
                            batch_size=32, max_caption_len=20, image_size=64)
    assert loader.batch_size == 16  # silent cap (data_loader.py:120-121)
    batches = list(loader)
    assert len(batches) == 48 // 16  # drop_last
    for b in batches:
        assert b["images"].shape == (16, 64, 64, 3)
        assert b["captions"].shape == (20, 16)
        assert b["captions"].dtype == np.int32
        assert b["lengths"].shape == (16,)
    # time-major with PAD=0 tail
    b = batches[0]
    j = 0
    L = int(b["lengths"][j])
    assert b["captions"][0, j] == START
    assert (b["captions"][L:, j] == PAD).all()


def test_loader_abandoned_iterator_stops_producer(synth_root):
    """Breaking out of the loader mid-epoch (the reference's 50-batch
    validation cap, train_student_kd.py:29-86) must not leave the prefetch
    producer thread alive and blocked on the queue."""
    import threading
    import time as _time

    ds = CaptionDataset(synth_root, f"{synth_root}/captions_clean.csv",
                        image_size=64)
    loader = BatchLoader(ds, batch_size=8, max_caption_len=20, prefetch=1)
    before = {t.ident for t in threading.enumerate()}
    it = iter(loader)
    next(it)
    it.close()  # what an abandoned for-loop break triggers at GC
    deadline = _time.monotonic() + 5.0
    while _time.monotonic() < deadline:
        extra = [t for t in threading.enumerate()
                 if t.ident not in before and t.is_alive()
                 and not t.name.startswith("ic-decode")]
        if not extra:
            break
        _time.sleep(0.05)
    assert not extra, f"producer thread(s) leaked: {extra}"


def test_loader_shuffle_determinism(synth_root):
    mk = lambda seed: [b["captions"].copy() for b in BatchLoader(
        CaptionDataset(synth_root, f"{synth_root}/captions_clean.csv", image_size=64),
        batch_size=8, max_caption_len=20, seed=seed)]
    a, b, c = mk(1), mk(1), mk(2)
    assert all((x == y).all() for x, y in zip(a, b))
    assert any((x != y).any() for x, y in zip(a, c))


# -- transforms --------------------------------------------------------------

def test_normalize_matches_manual():
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (2, 8, 8, 3), dtype=np.uint8)
    out = T.normalize(jnp.asarray(u8))
    assert out.shape == (2, 3, 8, 8)
    manual = (u8.astype(np.float32) / 255.0 - np.array(T.IMAGENET_MEAN)) / np.array(T.IMAGENET_STD)
    np.testing.assert_allclose(np.asarray(out), manual.transpose(0, 3, 1, 2),
                               rtol=1e-5, atol=1e-6)


def test_augment_pipeline_shapes_and_determinism():
    rng = np.random.default_rng(1)
    u8 = jnp.asarray(rng.integers(0, 256, (4, 256, 256, 3), dtype=np.uint8))
    key = jax.random.PRNGKey(0)
    out1 = T.augment_and_normalize(key, u8, T.OPTIMIZED_KD_AUG)
    out2 = T.augment_and_normalize(key, u8, T.OPTIMIZED_KD_AUG)
    assert out1.shape == (4, 3, 224, 224)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3 = T.augment_and_normalize(jax.random.PRNGKey(1), u8, T.OPTIMIZED_KD_AUG)
    assert np.abs(np.asarray(out1) - np.asarray(out3)).max() > 0


def test_hflip_flips():
    x = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3)
    out = T.random_hflip(jax.random.PRNGKey(0), x, prob=1.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x[:, :, ::-1, :]))


def test_color_jitter_identity_when_zero():
    x = jnp.ones((2, 4, 4, 3)) * 0.5
    cfg = T.AugmentConfig()
    out = T.color_jitter(jax.random.PRNGKey(0), x, cfg)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_random_rotation_zero_angle_identity():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))
    out = T.random_rotation(jax.random.PRNGKey(0), x, max_deg=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_random_crop_bounds():
    x = jnp.arange(1 * 8 * 8 * 1, dtype=jnp.float32).reshape(1, 8, 8, 1)
    out = T.random_crop(jax.random.PRNGKey(3), x, 4)
    assert out.shape == (1, 4, 4, 1)


def test_loader_parallel_decode_equivalence(tmp_path):
    """Thread-pool decode must produce byte-identical batches to serial."""
    from imagecaptioner_tpu.data.loader import BatchLoader
    from imagecaptioner_tpu.data.synthetic import make_synthetic_dataset
    from imagecaptioner_tpu.data.dataset import CaptionDataset

    make_synthetic_dataset(str(tmp_path), n_images=20, captions_per_image=1,
                           image_size=32, seed=0)
    ds = CaptionDataset(str(tmp_path), str(tmp_path / "captions_clean.csv"),
                        freq_threshold=1, image_size=32)
    serial = BatchLoader(ds, batch_size=8, num_workers=1, shuffle=False)
    pooled = BatchLoader(ds, batch_size=8, num_workers=8, shuffle=False)
    for a, b in zip(serial, pooled):
        np.testing.assert_array_equal(a["images"], b["images"])
        np.testing.assert_array_equal(a["captions"], b["captions"])
        np.testing.assert_array_equal(a["lengths"], b["lengths"])


def test_decode_cache_and_fast_path(tmp_path):
    """Decoded-uint8 RAM cache (VERDICT r2 #9): epoch 2+ is a memcpy, the
    byte budget is honored, and name-keyed entries survive select()."""
    import numpy as np
    from PIL import Image

    from imagecaptioner_tpu.data.dataset import CaptionDataset

    img_dir = tmp_path / "Images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for k in range(4):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(img_dir / f"i{k}.jpg")
    csv = tmp_path / "caps.csv"
    csv.write_text("image,caption\n" + "".join(
        f"i{k}.jpg,a dog runs fast\n" for k in range(4)))

    ds = CaptionDataset(str(tmp_path), str(csv), image_size=32)
    a = ds.load_image(0)
    assert ds.cached_batch([0]) is not None          # hit after first load
    assert ds.cached_batch([0, 1]) is None           # 1 not yet decoded
    b = ds.load_image(0)
    np.testing.assert_array_equal(a, b)
    assert b is ds._cache["i0.jpg"]                   # served from cache
    for k in range(4):
        ds.load_image(k)
    batch = ds.cached_batch([3, 1])
    assert batch.shape == (2, 32, 32, 3)
    np.testing.assert_array_equal(batch[1], ds.load_image(1))

    # name-keyed: entries survive select() and serve the re-indexed rows
    ds.select([2, 3])
    np.testing.assert_array_equal(ds.cached_batch([0])[0],
                                  ds._cache["i2.jpg"])

    # zero budget disables caching entirely
    ds2 = CaptionDataset(str(tmp_path), str(csv), image_size=32,
                         decode_cache_bytes=0)
    ds2.load_image(0)
    assert ds2.cached_batch([0]) is None

    # budget bound: room for ~2 images only
    ds3 = CaptionDataset(str(tmp_path), str(csv), image_size=32,
                         decode_cache_bytes=2 * 32 * 32 * 3 + 1)
    for k in range(4):
        ds3.load_image(k)
    assert len(ds3._cache) == 2


def test_decode_cache_shared_across_caption_rows(tmp_path):
    """Flickr-style CSVs repeat each image for every caption row — one
    decode must serve all rows (cache keyed by image name, not row index)."""
    import numpy as np
    from PIL import Image

    from imagecaptioner_tpu.data.dataset import CaptionDataset

    img_dir = tmp_path / "Images"
    img_dir.mkdir()
    Image.fromarray(np.full((32, 32, 3), 7, np.uint8)).save(img_dir / "a.jpg")
    csv = tmp_path / "caps.csv"
    csv.write_text("image,caption\n" + "a.jpg,a dog runs fast\n" * 5)

    ds = CaptionDataset(str(tmp_path), str(csv), image_size=32)
    assert len(ds) == 5
    for i in range(5):
        ds.load_image(i)
    assert len(ds._cache) == 1                         # one entry, 5 rows
    assert ds._cache_bytes == 32 * 32 * 3
    assert ds.cached_batch([0, 4]).shape == (2, 32, 32, 3)
