"""Native C++ IO core vs PIL reference."""
import numpy as np
import pytest
from PIL import Image

from ragb_vae_tpu.data import native_io
from ragb_vae_tpu.data.image_io import load_rgba

pytestmark = pytest.mark.skipif(
    not native_io.available(), reason="native IO library not built"
)


@pytest.fixture()
def pngs(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    specs = [((32, 48), "RGBA"), ((64, 32), "RGB"), ((16, 16), "L")]
    for i, (size, mode) in enumerate(specs):
        w, h = size
        channels = {"RGBA": 4, "RGB": 3, "L": 1}[mode]
        arr = rng.integers(0, 256, (h, w, channels), dtype=np.uint8).squeeze()
        p = tmp_path / f"img{i}_{mode}.png"
        Image.fromarray(arr, mode).save(p)
        paths.append(p)
    return paths


def test_png_size(pngs):
    assert native_io.png_size(pngs[0]) == (32, 48)
    assert native_io.png_size(pngs[1]) == (64, 32)


def test_decode_matches_pil(pngs):
    for path in pngs:
        ours = native_io.decode_png(path)
        ref = load_rgba(path)  # PIL path -> (H, W, 4) float32 [0,1]
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_decode_with_padding(pngs):
    out = native_io.decode_png(pngs[0], max_h=64, max_w=64)
    assert out.shape == (64, 64, 4)
    ref = load_rgba(pngs[0])
    np.testing.assert_allclose(out[:48, :32], ref, atol=1e-6)
    assert np.all(out[48:] == 0.0) and np.all(out[:, 32:] == 0.0)


def test_decode_batch_threaded(pngs, tmp_path):
    # batch of identical-bucket images, padded to a common size
    out = native_io.decode_batch(pngs, 64, 64, num_threads=3)
    assert out.shape == (3, 64, 64, 4)
    for i, path in enumerate(pngs):
        ref = load_rgba(path)
        h, w = ref.shape[:2]
        np.testing.assert_allclose(out[i, :h, :w], ref, atol=1e-6)

    with pytest.raises(IOError, match="native decode failed"):
        native_io.decode_batch([tmp_path / "missing.png"], 8, 8)


def test_decode_too_small_buffer_raises(pngs):
    with pytest.raises(IOError):
        native_io.decode_png(pngs[1], max_h=8, max_w=8)


def test_native_encode_matches_pil(tmp_path):
    """encode_png pixels == the PIL save path's quantization, exactly."""
    from ragb_vae_tpu.data import native_io
    from ragb_vae_tpu.data.image_io import load_rgba

    if not native_io.available():
        import pytest

        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(0)
    img = rng.random((40, 24, 4)).astype(np.float32)
    img[0, 0] = [0.0, 1.0, 0.5, 2.0]  # clip + endpoints

    native_io.encode_png(tmp_path / "n.png", img)
    from PIL import Image

    arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    Image.fromarray(arr, mode="RGBA").save(tmp_path / "p.png")
    a = np.asarray(Image.open(tmp_path / "n.png"))
    b = np.asarray(Image.open(tmp_path / "p.png"))
    np.testing.assert_array_equal(a, b)

    # roundtrip through the repo loader
    back = load_rgba(tmp_path / "n.png")
    np.testing.assert_allclose(back, np.clip(img, 0, 1), atol=1 / 255 + 1e-6)


def test_native_encode_batch(tmp_path):
    import pytest

    from ragb_vae_tpu.data import native_io

    if not native_io.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(1)
    batch = rng.random((5, 16, 16, 4)).astype(np.float32)
    paths = [tmp_path / f"b{i}.png" for i in range(5)]
    native_io.encode_batch(paths, batch, num_threads=3)
    from PIL import Image

    for i, p in enumerate(paths):
        a = np.asarray(Image.open(p))
        np.testing.assert_array_equal(a, (batch[i] * 255).astype(np.uint8))

    with pytest.raises(ValueError, match="paths"):
        native_io.encode_batch(paths[:2], batch)
    with pytest.raises(ValueError, match="expects"):
        native_io.encode_batch(paths, batch[..., :3])
