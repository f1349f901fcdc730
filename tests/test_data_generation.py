"""Offline prep: grouping algorithm, bucket prep end-to-end, bucketer helpers."""
import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from ragb_vae_tpu.data_generation.hf_bucketers import (
    decode_image_or_passthrough,
    find_nonoverlap,
    laion_bucket_assignment,
    layer_to_full_canvas,
    process_prism_pro_sample,
    process_prism_real_sample,
    safe_image_id,
    shard_indices,
)
from ragb_vae_tpu.data_generation.rgba_buckets import (
    background_visible_ratio,
    build_component_masks,
    find_unoverlapped_indices,
    iterate_foreground_groups,
    make_sample_rng,
    pick_component_by_alpha,
    run_prepare,
)


def _layer(size, box, color=(255, 0, 0, 255)):
    """RGBA image with an opaque rectangle at `box`, transparent elsewhere."""
    img = Image.new("RGBA", size, (0, 0, 0, 0))
    px = Image.new("RGBA", (box[2] - box[0], box[3] - box[1]), color)
    img.paste(px, (box[0], box[1]))
    return img


def test_find_unoverlapped_back_to_front():
    size = (64, 64)
    # layer0 and layer2 overlap; layer1 is separate
    layers = [
        _layer(size, (0, 0, 32, 32)),
        _layer(size, (50, 50, 62, 62)),
        _layer(size, (16, 16, 48, 48)),
    ]
    masks = build_component_masks(layers)
    picks = find_unoverlapped_indices([0, 1, 2], masks)
    # scanned back-to-front: 2 picked first, 1 doesn't overlap it, 0 overlaps 2
    assert picks == [1, 2]


def test_iterate_foreground_groups_peels_stages():
    size = (64, 64)
    background = Image.new("RGBA", size, (0, 128, 0, 255))
    layers = [
        _layer(size, (0, 0, 32, 32)),
        _layer(size, (16, 16, 48, 48), (0, 0, 255, 255)),
    ]
    stages = list(
        iterate_foreground_groups(background, layers, erosion_iterations=1, max_groups=None)
    )
    assert [s[0] for s in stages] == [0, 1]
    assert stages[0][1] == [1]  # topmost wins stage 0
    assert stages[1][1] == [0]
    # stage 0 composite includes both remaining layers
    comp0 = np.asarray(stages[0][2])
    assert comp0[24, 24, 2] == 255  # blue layer visible at its center


def test_background_visible_ratio():
    size = (10, 10)
    full = _layer(size, (0, 0, 10, 10))
    masks = build_component_masks([full])
    assert background_visible_ratio(masks) == 0.0
    half = _layer(size, (0, 0, 10, 5))
    assert background_visible_ratio(build_component_masks([half])) == pytest.approx(0.5)
    assert background_visible_ratio({}) == 1.0


def test_sample_rng_deterministic():
    a = make_sample_rng("sample_001", 42).integers(0, 1 << 30)
    b = make_sample_rng("sample_001", 42).integers(0, 1 << 30)
    c = make_sample_rng("sample_002", 42).integers(0, 1 << 30)
    assert a == b and a != c


def test_pick_component_by_alpha_weighted():
    rng = make_sample_rng("x", 0)
    sums = {0: 0, 1: 100}
    picks = {pick_component_by_alpha([0, 1], sums, rng) for _ in range(10)}
    assert picks == {1}  # all weight on 1
    assert pick_component_by_alpha([], sums, rng) is None


@pytest.fixture()
def rendered_tree(tmp_path):
    """Two multilayer sample dirs >=384px so they pass the size filter."""
    root = tmp_path / "rendered"
    size = (448, 448)
    for name, n_layers in (("sample_a", 2), ("sample_b", 1)):
        d = root / name
        d.mkdir(parents=True)
        Image.new("RGBA", size, (10, 20, 30, 255)).save(d / "background.png")
        for j in range(n_layers):
            _layer(size, (j * 100, j * 100, j * 100 + 150, j * 100 + 150)).save(
                d / f"component_{j}.png"
            )
    return root


def test_run_prepare_end_to_end(rendered_tree, tmp_path):
    out = tmp_path / "buckets"
    val_list = tmp_path / "val.txt"
    val_list.write_text("sample_b\n")
    records = run_prepare(
        rendered_tree, out, validation_list=val_list, seed=1, num_workers=1
    )
    assert records
    manifest = json.loads((out / "metadata" / "manifest.json").read_text())
    assert len(manifest) == len(records)
    splits = {e["split"] for e in manifest}
    assert splits == {"train", "val"}
    for entry in manifest:
        assert (out / entry["component_path"]).exists()
        assert (out / entry["composite_path"]).exists()
        w, h = entry["bucket_dims"]
        assert w % 64 == 0 and h % 64 == 0
        with Image.open(out / entry["component_path"]) as img:
            assert img.size == (w, h)

    # idempotent resume: re-running produces no duplicate work
    records2 = run_prepare(
        rendered_tree, out, validation_list=val_list, seed=1, num_workers=1
    )
    assert records2 == []


def test_run_prepare_respects_counts(rendered_tree, tmp_path):
    out = tmp_path / "capped"
    records = run_prepare(rendered_tree, out, train_count=1, val_count=0, seed=1)
    train_samples = {e["source_sample"] for e in records if e["split"] == "train"}
    assert len(train_samples) <= 1


# ---------------------------------------------------------------------------
# HF bucketers (no network needed: PIL images passed directly)
# ---------------------------------------------------------------------------
def _prism_sample(size=(448, 448), n_layers=2):
    sample = {
        "id": "s0",
        "base_image": Image.new("RGBA", size, (1, 2, 3, 255)),
        "whole_image": Image.new("RGBA", size, (4, 5, 6, 255)),
        "layer_count": n_layers,
    }
    for i in range(n_layers):
        box = (i * 120, i * 120, i * 120 + 100, i * 120 + 100)
        sample[f"layer_{i:02}_image"] = Image.new("RGBA", (100, 100), (255, 0, 0, 255))
        sample[f"layer_{i:02}_box"] = list(box)
    return sample


def test_prism_real_bucketer(tmp_path):
    entry = process_prism_real_sample(_prism_sample(), 0, tmp_path, split="train")
    assert entry is not None
    assert (tmp_path / entry["base_path"]).exists()
    assert (tmp_path / entry["whole_path"]).exists()
    assert len(entry["layer_paths"]) == 2
    assert entry["bucket"].startswith("w") and "-h" in entry["bucket"]


def test_prism_pro_bucketer(tmp_path):
    rng = np.random.default_rng(0)
    entry = process_prism_pro_sample(_prism_sample(), 0, tmp_path, split="other", rng=rng)
    assert entry is not None
    # pro writes under train/ regardless of dataset split
    assert entry["base_path"].startswith("train/")
    assert (tmp_path / entry["fg_non_overlap_path"]).exists()
    assert entry["rep_path"] is not None
    assert entry["rep_layer_idx"] in entry["non_overlap_layer_indices"]


def test_layer_to_full_canvas_and_decode():
    img = Image.new("RGBA", (10, 10), (9, 9, 9, 255))
    canvas = layer_to_full_canvas(img, (5, 5, 15, 15), (32, 32))
    arr = np.asarray(canvas)
    assert arr[10, 10, 3] == 255 and arr[0, 0, 3] == 0
    assert layer_to_full_canvas(img, (5, 5, 5, 15), (32, 32)) is None
    assert decode_image_or_passthrough(None) is None
    # base64 data-URI round trip
    import base64
    import io

    buf = io.BytesIO()
    img.save(buf, format="PNG")
    uri = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()
    decoded = decode_image_or_passthrough(uri)
    np.testing.assert_array_equal(np.asarray(decoded), np.asarray(img))


def test_find_nonoverlap_matches_prepare_variant():
    size = (32, 32)
    layers = [
        _layer(size, (0, 0, 16, 16)),
        _layer(size, (20, 20, 30, 30)),
        _layer(size, (8, 8, 24, 24)),
    ]
    masks = build_component_masks(layers)
    assert find_nonoverlap([0, 1, 2], masks) == find_unoverlapped_indices([0, 1, 2], masks)


def test_laion_bucket_assignment_filters():
    assert laion_bucket_assignment((400, 400))[0] is None  # < 512
    assert laion_bucket_assignment((600, 1300))[0] is None  # AR >= 2.0
    assignment, reason = laion_bucket_assignment((1024, 768))
    assert reason is None
    key, dims = assignment
    assert dims[0] % 64 == 0 and dims[1] % 64 == 0


def test_shard_indices_modulo():
    assert shard_indices(10, 3, 0) == [0, 3, 6, 9]
    assert shard_indices(10, 3, 2) == [2, 5, 8]
    with pytest.raises(ValueError):
        shard_indices(10, 3, 3)
    with pytest.raises(ValueError):
        shard_indices(10, 0, 0)


def test_safe_image_id_stable():
    assert safe_image_id("http://x/y.png") == safe_image_id("http://x/y.png")
    assert len(safe_image_id("u")) == 64
